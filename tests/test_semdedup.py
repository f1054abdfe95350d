"""SemDeDup-style semantic dedup (stages/semdedup.py): clustering +
within-cluster cosine pruning contracts."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.stages.semdedup import (
    _prune_cluster,
    auto_clusters,
    semantic_dedup,
)


def _normed(m):
    return m / np.linalg.norm(m, axis=1, keepdims=True)


class TestPruneCluster:
    def test_exact_dup_min_id_survives(self):
        m = _normed(np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32))
        ids = np.array([7, 3, 9])
        mask = _prune_cluster(ids, m, 0.9, "min_id", None)
        # ids 3 and 7 are duplicates → 3 survives; 9 unrelated
        assert dict(zip(ids, mask)) == {3: True, 7: False, 9: True}

    def test_transitive_chain_keeps_non_linked(self):
        # a≈b (>τ), b≈c (>τ), a·c < τ: b drops against a; c's only
        # >τ link is to the DROPPED b → c stays (one-pass priority
        # sweep semantics)
        a = np.array([1.0, 0.0])
        b = np.array([np.cos(0.3), np.sin(0.3)])
        c = np.array([np.cos(0.6), np.sin(0.6)])
        m = _normed(np.stack([a, b, c]).astype(np.float32))
        tau = np.cos(0.45)  # a·b > τ, b·c > τ, a·c < τ
        mask = _prune_cluster(np.array([1, 2, 3]), m, tau, "min_id", None)
        assert list(mask) == [True, False, True]

    def test_far_from_centroid_priority(self):
        centroid = np.array([1.0, 0.0], np.float32)
        near = np.array([np.cos(0.05), np.sin(0.05)])
        far = np.array([np.cos(0.25), np.sin(0.25)])
        m = _normed(np.stack([near, far]).astype(np.float32))
        mask = _prune_cluster(
            np.array([1, 2]), m, 0.9, "far_from_centroid", centroid
        )
        # the member FARTHER from the centroid survives (paper rule)
        assert list(mask) == [False, True]

    def test_single_row(self):
        m = _normed(np.array([[1.0, 0.0]], np.float32))
        assert list(_prune_cluster(np.array([1]), m, 0.9, "min_id", None)) == [True]


class TestSemanticDedup:
    def test_injected_copies_dropped(self):
        rng = np.random.default_rng(5)
        base = rng.normal(size=(200, 16)).astype(np.float32)
        ids = np.arange(200)
        # exact copies of every 10th vector at id+10000
        dup_ids = ids[ids % 10 == 0] + 10_000
        dups = base[ids % 10 == 0]
        df = pd.DataFrame(
            {
                "vec_id": np.concatenate([ids, dup_ids]),
                "embedding": list(np.concatenate([base, dups])),
            }
        )
        ds = ray.data.from_pandas(df)
        out = semantic_dedup(
            ds, threshold=0.95, n_clusters=8, sample_size=128
        ).to_pandas()
        kept = set(out["vec_id"].astype(int))
        # all originals survive (random gaussians don't hit 0.95), all
        # injected copies drop (min-id keeps the original)
        assert set(ids) <= kept
        assert kept.isdisjoint(set(dup_ids))

    def test_no_dups_no_drops(self):
        rng = np.random.default_rng(6)
        base = rng.normal(size=(100, 16)).astype(np.float32)
        df = pd.DataFrame({"vec_id": np.arange(100), "embedding": list(base)})
        out = semantic_dedup(
            ray.data.from_pandas(df), threshold=0.95, n_clusters=4,
            sample_size=64,
        ).to_pandas()
        assert len(out) == 100

    def test_auto_clusters(self):
        assert auto_clusters(0) == 4
        assert auto_clusters(1_000_000) == 500
