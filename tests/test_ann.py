"""ANN operators: brute-force exact baseline + IVF recall."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.ann import IvfIndex, brute_force_topk, ivf_topk


def _vectors(n=400, d=16, seed=5):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)).astype(np.float32)
    return m


def _ds(m):
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(m)), pa.int64()),
                "embedding": pa.array(list(m), pa.list_(pa.float32())),
            }
        )
    )


def test_brute_force_matches_numpy():
    m = _vectors()
    q = m[7]
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    exact = set(np.argsort(-(norm @ qn))[:10].tolist())
    out = brute_force_topk(_ds(m), q.reshape(1, -1), k=10).to_pandas()
    assert set(out["vec_id"]) == exact
    assert out["cos"].max() > 0.999  # itself


def test_ivf_high_recall_on_clustered_data():
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((4, 16)).astype(np.float32) * 5
    m = np.concatenate([c + rng.standard_normal((100, 16)).astype(np.float32) for c in centers])
    q = m[3]
    idx = IvfIndex(n_lists=8).train(m[rng.choice(len(m), 200, replace=False)])
    out = ivf_topk(_ds(m), idx, q, k=10, nprobe=4).to_pandas()
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    exact = set(np.argsort(-(norm @ qn))[:10].tolist())
    recall = len(set(out["vec_id"]) & exact) / 10
    assert recall >= 0.7  # clustered data, 4/8 lists probed


def test_ivf_store_and_pruned_search(tmp_path):
    from opentelemetry_collector_contrib_ray.stages.ann import (
        ivf_build_store,
        ivf_search_stored,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16)).astype(np.float32) * 5
    m = np.concatenate(
        [c + rng.standard_normal((80, 16)).astype(np.float32) for c in centers]
    )
    idx = IvfIndex(n_lists=8).train(m[rng.choice(len(m), 150, replace=False)])
    store = str(tmp_path / "ivf")
    ivf_build_store(_ds(m), idx, store)

    import os

    parts = [d for d in os.listdir(store) if d.startswith("list_id=")]
    assert len(parts) >= 4  # corpus spread across lists

    q = m[5]
    out = ivf_search_stored(store, q, k=10, nprobe=4).to_pandas()
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    exact = set(np.argsort(-(norm @ qn))[:10].tolist())
    recall = len(set(out["vec_id"]) & exact) / 10
    assert recall >= 0.7
