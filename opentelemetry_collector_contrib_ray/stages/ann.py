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
    if isinstance(col.type, pa.ExtensionType):
        # Ray's ArrowTensorType (from_pandas path): to_numpy gives (n, d)
        m = col.to_numpy(zero_copy_only=False)
        if m.dtype == object:
            m = np.stack(m)
        return np.ascontiguousarray(m, dtype=np.float32)
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
        from .._util import table_from_pandas

        # arrow out: pandas blocks would re-acquire the unhashable
        # pandas schema blob at any downstream shuffle
        return table_from_pandas(g.nlargest(k, "cos"))

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

    def refine(self, ds, iters: int = 2, emb_col: str = "embedding") -> "IvfIndex":
        """Distributed Lloyd refinement of the sample-trained
        centroids over the FULL dataset: each iteration is one
        streaming pass where every batch computes per-centroid partial
        (sum-vector, count) against the broadcast centroid matrix, and
        the driver merges ``num_batches × n_lists`` tiny partials into
        the new centroids (k × dim floats — never the corpus). The
        standard scale recipe when the coarse quantizer must reflect
        the whole 100-TB distribution, not just the training sample;
        empty clusters keep their previous centroid."""
        import ray

        for _ in range(iters):
            c_ref = ray.put(self.centroids)
            n_lists = self.n_lists

            def partials(batch: pa.Table, c=c_ref) -> pa.Table:
                cm = ray.get(c) if isinstance(c, ray.ObjectRef) else c
                mat = _normalize(_mat(batch, emb_col))
                assign = np.argmax(mat @ cm.T, axis=1)
                dim = mat.shape[1]
                sums = np.zeros((n_lists, dim), np.float64)
                np.add.at(sums, assign, mat)
                counts = np.bincount(assign, minlength=n_lists).astype(np.int64)
                return pa.table(
                    {
                        "list_id": pa.array(np.arange(n_lists, dtype=np.int32)),
                        "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                        "cnt": pa.array(counts),
                    }
                )

            agg = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
            sums = np.zeros_like(self.centroids, dtype=np.float64)
            counts = np.zeros(self.n_lists, dtype=np.int64)
            for lid, grp in agg.groupby("list_id"):
                sums[lid] = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0)
                counts[lid] = grp["cnt"].sum()
            new_c = self.centroids.astype(np.float64).copy()
            nz = counts > 0
            new_c[nz] = sums[nz] / counts[nz, None]
            self.centroids = _normalize(new_c.astype(np.float32))
        return self

    def assigner(self, emb_col: str = "embedding"):
        """Returns a task-pool function; the centroid matrix is small
        (n_lists × dim) so it ships in the function closure."""
        c = self.centroids

        def assign(batch: pa.Table) -> pa.Table:
            mat = _normalize(_mat(batch, emb_col))
            lid = np.argmax(mat @ c.T, axis=1).astype(np.int32)
            return batch.append_column("list_id", pa.array(lid))

        return assign


def ivf_topk(ds, index: IvfIndex, query: np.ndarray, k: int = 10, nprobe: int = 4, *, id_col="vec_id", emb_col="embedding"):
    """Probe the nprobe nearest lists only; exact cosine within them.
    Recall < 1.0 by design — the scale path for 100 TB corpora
    (assign once, store partitioned by list_id, read only probed
    partitions)."""
    q = _normalize(np.asarray(query, dtype=np.float32).reshape(1, -1))[0]
    probes = np.argsort(-(index.centroids @ q))[:nprobe].tolist()
    assigned = ds.map_batches(index.assigner(emb_col), batch_format="pyarrow")
    probe_set = set(int(p) for p in probes)

    def filt(batch: pa.Table) -> pa.Table:
        lid = batch["list_id"].to_numpy()
        return batch.filter(pa.array(np.isin(lid, list(probe_set))))

    candidates = assigned.map_batches(filt, batch_format="pyarrow")
    return brute_force_topk(candidates, q.reshape(1, -1), k, id_col=id_col, emb_col=emb_col)


def ivf_build_store(ds, index: IvfIndex, path: str, *, emb_col: str = "embedding"):
    """Persist an IVF-partitioned copy of the corpus: assign each row
    its coarse list, write hive-partitioned by ``list_id``. Searches
    then read ONLY the probed partitions from storage — at 100 TB the
    I/O saving is nprobe/n_lists. Centroids are saved alongside."""
    import json
    import os

    assigned = ds.map_batches(index.assigner(emb_col), batch_format="pyarrow")
    assigned.write_parquet(path, partition_cols=["list_id"])
    meta = {
        "n_lists": index.n_lists,
        "centroids": index.centroids.tolist(),
    }
    with open(os.path.join(path, "ivf_index.json"), "w") as f:
        json.dump(meta, f)
    return path


def ivf_load_index(path: str) -> IvfIndex:
    import json
    import os

    with open(os.path.join(path, "ivf_index.json")) as f:
        meta = json.load(f)
    idx = IvfIndex(n_lists=meta["n_lists"])
    idx.centroids = np.asarray(meta["centroids"], dtype=np.float32)
    return idx


def ivf_search_stored(path: str, query: np.ndarray, k: int = 10, nprobe: int = 4, *, id_col="vec_id", emb_col="embedding"):
    """Search a stored IVF layout: pick the nprobe nearest lists from
    the saved centroids, ``read_parquet`` ONLY those partitions (the
    prune happens at the read — unprobed lists never leave storage),
    exact cosine within them."""
    import os

    import ray.data

    index = ivf_load_index(path)
    q = _normalize(np.asarray(query, dtype=np.float32).reshape(1, -1))[0]
    probes = np.argsort(-(index.centroids @ q))[:nprobe].tolist()
    import glob as _glob

    dirs = [os.path.join(path, f"list_id={int(p)}") for p in probes]
    files = [f for d in dirs for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))]
    if not files:
        import pyarrow as _pa

        return ray.data.from_arrow(
            _pa.table({id_col: _pa.array([], _pa.int64()), "cos": _pa.array([], _pa.float64())})
        )
    candidates = ray.data.read_parquet(files, columns=[id_col, emb_col])
    return brute_force_topk(candidates, q.reshape(1, -1), k, id_col=id_col, emb_col=emb_col)


# ------------------------------------------------- scalar int8 quantization


def embedding_quant_params(ds, emb_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """Global per-dimension (min, max) of an embedding column via one
    distributed partial pass — each batch ships two d-length vectors,
    the driver folds ``num_blocks`` tiny partials. Returns
    ``(mins, maxs)`` float32 arrays."""

    def partials(batch: pa.Table) -> pa.Table:
        m = _mat(batch, emb_col)
        return pa.table(
            {
                "mn": pa.array([m.min(axis=0).astype(np.float32).tobytes()], pa.binary()),
                "mx": pa.array([m.max(axis=0).astype(np.float32).tobytes()], pa.binary()),
            }
        )

    rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
    mins = np.min([np.frombuffer(r["mn"], np.float32) for r in rows], axis=0)
    maxs = np.max([np.frombuffer(r["mx"], np.float32) for r in rows], axis=0)
    return mins, maxs


class EmbeddingQuantizer:
    """Scalar (per-dimension, asymmetric) int8 quantization of an
    embedding column — the 4× memory/IO scale path for ANN stores
    (classic SQ8; constant-width dims need no codebook training).
    ``code = round((v - min) / scale)`` into uint8; reconstruction
    error per dim is ≤ scale/2 = (max-min)/510 by construction.

    Actor-pool stage: (mins, scale) broadcast once per actor; encode
    replaces the float list with ``codes`` (list<uint8>). ``decode``
    reverses for search/verification."""

    def __init__(self, mins: np.ndarray, maxs: np.ndarray, emb_col: str = "embedding"):
        self.mins = np.asarray(mins, np.float32)
        rng = np.asarray(maxs, np.float32) - self.mins
        self.scale = np.where(rng > 0, rng / 255.0, 1.0).astype(np.float32)
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _mat(batch, self.emb_col)
        codes = np.clip(
            np.round((m - self.mins[None, :]) / self.scale[None, :]), 0, 255
        ).astype(np.uint8)
        n, d = codes.shape
        la = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)),
            pa.array(codes.ravel(), pa.uint8()),
        )
        batch = batch.drop_columns([self.emb_col])
        return batch.append_column("codes", la)

    def decode(self, codes: np.ndarray) -> np.ndarray:
        return codes.astype(np.float32) * self.scale[None, :] + self.mins[None, :]


def quantized_topk(
    codes_ds, quant: "EmbeddingQuantizer", queries: np.ndarray, k: int = 10,
    *, id_col: str = "vec_id", concurrency=(1, 8),
):
    """Exact cosine top-k over the QUANTIZED store: each batch decodes
    its uint8 codes (vectorized) and runs the same matmul/argpartition
    as ``brute_force_topk`` — the IO/memory win is upstream (the store
    holds 1/4 the bytes); recall loss is bounded by the SQ8
    reconstruction error."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float32))
    qref = ray.put(qn)
    quant_ref = ray.put(quant)

    class Partial:
        def __init__(self):
            self.q = ray.get(qref)
            self.quant = ray.get(quant_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch["codes"]
            la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            offs = la.offsets.to_numpy().astype(np.int64)
            vals = la.values.to_numpy(zero_copy_only=False)
            d = int(offs[1] - offs[0]) if len(offs) > 1 else len(vals)
            codes = vals[offs[0]:].reshape(-1, d) if d else vals.reshape(0, 0)
            mat = _normalize(self.quant.decode(codes))
            sims = mat @ self.q.T
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

    partials = codes_ds.map_batches(Partial, batch_format="pyarrow", concurrency=concurrency)

    def merge(g):
        from .._util import table_from_pandas

        return table_from_pandas(g.nlargest(k, "cos"))

    return partials.groupby("query_idx").map_groups(merge, batch_format="pandas")
