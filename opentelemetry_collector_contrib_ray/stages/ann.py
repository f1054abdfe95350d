"""Approximate nearest-neighbor search over an embedding column.

Engine additions (no reference analogue). Two paths:

- ``brute_force_topk``: exact baseline — broadcast the (few) query
  vectors once via ray.put, per-batch normalized matmul + local top-k
  partials, one tiny final merge. Scales linearly; the shuffle carries
  only k rows per (batch, query).
- ``IvfIndex`` / ``ivf_topk``: the scale path — k-means-style coarse
  quantizer trained on a sample (driver-side, small), vectors assigned
  to their nearest centroid in a map_batches pass, search probes only
  ``nprobe`` inverted lists. The centroid table broadcasts; the
  assignment column doubles as a partition key for locality at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _mat(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch[emb_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.list_value_length(col).to_numpy()
    flat = np.asarray(col.flatten(), dtype=np.float32)
    if len(lens) and (lens == lens[0]).all():
        return flat.reshape(len(lens), -1)
    return np.stack([np.asarray(v, np.float32) for v in col.to_pylist()])


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(ds, queries: np.ndarray, k: int = 10, *, id_col="vec_id", emb_col="embedding", concurrency=(1, 8)):
    """Exact cosine top-k for each query row. Returns a Dataset with
    (query_idx, vec_id, cos), k rows per query."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float32))
    qref = ray.put(qn)

    class Partial:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _normalize(_mat(batch, emb_col))
            sims = mat @ self.q.T  # (n, nq)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            out_q, out_id, out_cos = [], [], []
            kk = min(k, sims.shape[0])
            for qi in range(sims.shape[1]):
                idx = np.argpartition(-sims[:, qi], kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(ids[idx])
                out_cos.extend(sims[idx, qi].astype(np.float64))
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int32()),
                    id_col: pa.array(out_id),
                    "cos": pa.array(out_cos),
                }
            )

    partials = ds.map_batches(Partial, batch_format="pyarrow", concurrency=concurrency)

    def merge(g):
        import pandas as pd

        return g.nlargest(k, "cos")

    return partials.groupby("query_idx").map_groups(merge, batch_format="pandas")


class IvfIndex:
    """Coarse quantizer for IVF search.

    train(): k-means (few iterations, deterministic seed) on a sampled
    matrix — runs on the driver over a SAMPLE only, never the corpus.
    assign(): map_batches stage adding a ``list_id`` column.
    """

    def __init__(self, n_lists: int = 16, iters: int = 10, seed: int = 11):
        self.n_lists, self.iters, self.seed = n_lists, iters, seed
        self.centroids: np.ndarray | None = None

    def train(self, sample: np.ndarray) -> "IvfIndex":
        x = _normalize(np.asarray(sample, dtype=np.float32))
        rng = np.random.default_rng(self.seed)
        init = x[rng.choice(len(x), size=min(self.n_lists, len(x)), replace=False)]
        c = init.copy()
        for _ in range(self.iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                members = x[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
            c = _normalize(c)
        self.centroids = c
        return self

    def assigner(self, emb_col: str = "embedding"):
        import ray

        cref = ray.put(self.centroids)

        class Assign:
            def __init__(self):
                self.c = ray.get(cref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                mat = _normalize(_mat(batch, emb_col))
                lid = np.argmax(mat @ self.c.T, axis=1).astype(np.int32)
                return batch.append_column("list_id", pa.array(lid))

        return Assign


def ivf_topk(ds, index: IvfIndex, query: np.ndarray, k: int = 10, nprobe: int = 4, *, id_col="vec_id", emb_col="embedding"):
    """Probe the nprobe nearest lists only; exact cosine within them.
    Recall < 1.0 by design — the scale path for 100 TB corpora
    (assign once, store partitioned by list_id, read only probed
    partitions)."""
    q = _normalize(np.asarray(query, dtype=np.float32).reshape(1, -1))[0]
    probes = np.argsort(-(index.centroids @ q))[:nprobe].tolist()
    assigned = ds.map_batches(
        index.assigner(emb_col), batch_format="pyarrow", concurrency=(1, 4)
    )
    probe_set = set(int(p) for p in probes)

    def filt(batch: pa.Table) -> pa.Table:
        lid = batch["list_id"].to_numpy()
        return batch.filter(pa.array(np.isin(lid, list(probe_set))))

    candidates = assigned.map_batches(filt, batch_format="pyarrow")
    return brute_force_topk(candidates, q.reshape(1, -1), k, id_col=id_col, emb_col=emb_col)
