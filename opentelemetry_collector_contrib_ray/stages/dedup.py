"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (SURVEY.md §2.8 — the ES exporter dedups
field keys only); these are first-class engine additions. All follow
the same scale shape: vectorized per-batch signature computation in
``map_batches``, then ONE shuffle on the signature key, then per-group
resolution. Nothing materializes the corpus on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._util import splitmix64

_MERSENNE = (1 << 61) - 1


def _text_hash64(texts: pd.Series) -> np.ndarray:
    """Vectorized 64-bit content hash of a string column."""
    return splitmix64(
        np.asarray(pd.util.hash_array(texts.to_numpy(dtype=object)), dtype=np.uint64)
    )


def add_content_hash(batch: pa.Table, text_col: str = "text", out: str = "content_hash") -> pa.Table:
    s = pd.Series(batch[text_col].to_numpy(zero_copy_only=False), dtype=object)
    return batch.append_column(out, pa.array(_text_hash64(s).astype(np.int64)))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup, first-wins by smallest id: hash-partition on the
    content hash, keep the min-id row per group. One shuffle over
    (hash, id) pairs only — full rows are NOT shuffled; survivors are
    selected via min-id per hash which equals min-id per text when the
    64-bit hash is collision-free (checked probabilistically fine at
    corpus scale; a byte-exact variant would verify within group).

    Returns a Dataset of surviving ids: columns (content_hash, doc_id).
    """
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col).select(["content_hash", id_col]),
        batch_format="pyarrow",
    )
    return hashed.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col))


# ---------------------------------------------------------------- MinHash-LSH


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Character-shingle 64-bit hashes via a rolling polynomial hash."""
    b = text.encode("utf-8", errors="replace")
    if len(b) < k:
        b = b + b"\x00" * (k - len(b))
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    # rolling hash: sum of byte * P^pos over window, vectorized via cumsum trick
    P = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        pw = np.empty(k, dtype=np.uint64)
        pw[0] = np.uint64(1)
        for i in range(1, k):
            pw[i] = pw[i - 1] * P
        win = np.lib.stride_tricks.sliding_window_view(arr, k)
        h = (win * pw[None, :]).sum(axis=1, dtype=np.uint64)
    return splitmix64(np.unique(h))


class MinHasher:
    """Per-batch MinHash signatures (k-shingles, n permutations).

    Actor-pool stage: permutation parameters generated once in
    __init__; per batch each doc's shingle set is min-hashed. Output
    adds ``minhash`` (list<uint64> length num_perm).
    """

    def __init__(self, text_col: str = "text", k: int = 5, num_perm: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.k = k
        self.num_perm = num_perm
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        with np.errstate(over="ignore"):
            # (a*x+b) mod Mersenne61 per permutation; min over shingles
            vals = (self.a[None, :] * sh[:, None] + self.b[None, :]) % np.uint64(_MERSENNE)
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = np.stack([self.signature(t or "") for t in texts])
        flat = pa.array(sigs.reshape(-1).astype(np.int64))
        offs = pa.array(np.arange(0, (len(texts) + 1) * self.num_perm, self.num_perm, dtype=np.int32))
        return batch.append_column("minhash", pa.ListArray.from_arrays(offs, flat))


def minhash_lsh_groups(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    concurrency: int | tuple = (2, 8),
):
    """MinHash+LSH near-dup candidate buckets.

    shingle→minhash per batch (actor pool) → explode to
    (band_id, band_hash, id) rows → groupby bucket → emit buckets with
    ≥2 members as candidate groups. Returns Dataset with columns
    (band_id, band_hash, ids list, n).

    Scale: the shuffle moves only (band, hash, id) triples, num_perm/bands
    per doc, not documents.
    """
    rows_per_band = num_perm // bands

    mh = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"text_col": text_col, "k": k, "num_perm": num_perm},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def explode(batch: pa.Table) -> pa.Table:
        sig = np.asarray(batch["minhash"].combine_chunks().flatten()).reshape(
            len(batch), num_perm
        )
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        band_hashes = np.empty((len(batch), bands), dtype=np.uint64)
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band].astype(np.uint64)
            h = np.zeros(len(batch), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for c in range(chunk.shape[1]):
                    h = splitmix64(h ^ chunk[:, c])
            band_hashes[:, b] = h
        n = len(batch)
        return pa.table(
            {
                "band_id": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(band_hashes.T.reshape(-1).astype(np.int64)),
                id_col: pa.array(np.tile(ids, bands)),
            }
        )

    exploded = mh.map_batches(explode, batch_format="pyarrow")

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return g.head(0).assign(ids=pd.Series(dtype=object), n=pd.Series(dtype=np.int64))[
                ["band_id", "band_hash", "ids", "n"]
            ]
        members = sorted(g[id_col].tolist())
        return pd.DataFrame(
            {
                "band_id": [g["band_id"].iloc[0]],
                "band_hash": [g["band_hash"].iloc[0]],
                "ids": [members],
                "n": [len(members)],
            }
        )

    return exploded.groupby(["band_id", "band_hash"]).map_groups(bucket, batch_format="pandas")


# -------------------------------------------------------------------- SimHash


class SimHasher:
    """64-bit SimHash over word 3-grams; adds ``simhash`` column.
    Near-dups share low Hamming distance; bucket by rotated prefixes."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.zeros(len(batch), dtype=np.uint64)
        for i, t in enumerate(batch[self.text_col].to_pylist()):
            words = (t or "").split()
            grams = [" ".join(words[j : j + 3]) for j in range(max(1, len(words) - 2))]
            hs = splitmix64(
                np.asarray(pd.util.hash_array(np.asarray(grams, dtype=object)), dtype=np.uint64)
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            out[i] = np.uint64(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        return batch.append_column("simhash", pa.array(out.astype(np.int64)))


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard similarity (candidate verification)."""
    aw, bw = a.split(), b.split()
    A = {tuple(aw[i : i + n]) for i in range(max(1, len(aw) - n + 1))}
    B = {tuple(bw[i : i + n]) for i in range(max(1, len(bw) - n + 1))}
    if not A and not B:
        return 1.0
    return len(A & B) / max(1, len(A | B))


# ------------------------------------------------------ embedding near-dup


def embedding_neardup_pairs(ds, *, id_col="vec_id", emb_col="embedding", threshold=0.95, nbits=12, seed=3):
    """Embedding-cosine near-dup: random-hyperplane LSH bucket (one
    shuffle of (bucket, id, vec)), then exact cosine within buckets.
    Returns pairs (id_a, id_b, cos) with cos ≥ threshold, id_a < id_b.
    """

    class Bucketer:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float32) for v in batch[emb_col].to_pylist()]
            )
            if self.planes is None:
                rng = np.random.default_rng(seed)
                self.planes = rng.standard_normal((vecs.shape[1], nbits)).astype(np.float32)
            proj = vecs @ self.planes
            bits = (proj > 0).astype(np.uint64)
            bucket = (bits << np.arange(nbits, dtype=np.uint64)[None, :]).sum(axis=1)
            norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            return pa.table(
                {
                    "bucket": pa.array(bucket.astype(np.int64)),
                    id_col: batch[id_col],
                    "vec": pa.array(list(norm), type=pa.list_(pa.float32())),
                }
            )

    bucketed = ds.map_batches(Bucketer, batch_format="pyarrow", concurrency=(1, 4))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        ids = g[id_col].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in g["vec"]])
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(g), k=1)
        m = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[ia[m]], ids[ib[m]]),
                "id_b": np.maximum(ids[ia[m]], ids[ib[m]]),
                "cos": sims[ia, ib][m].astype(np.float64),
            }
        )

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
