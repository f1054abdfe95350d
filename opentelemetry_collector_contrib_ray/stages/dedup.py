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

    # max shingles per (shingles × num_perm) matrix: bounds the temp
    # allocation to ~ _CHUNK × num_perm × 8B (≈128 MB at 256k × 64)
    _CHUNK = 256 * 1024

    def __call__(self, batch: pa.Table) -> pa.Table:
        # batched: (chunk_shingles × num_perm) passes with per-doc min
        # via minimum.reduceat — no per-doc Python, bounded temp memory
        texts = batch[self.text_col].to_pylist()
        shingle_sets = [_shingle_hashes(t or "", self.k) for t in texts]
        counts = np.array([len(s) for s in shingle_sets], dtype=np.int64)
        n = len(texts)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        lo = 0
        while lo < n:
            hi = lo
            total = 0
            while hi < n and (hi == lo or total + counts[hi] <= self._CHUNK):
                total += counts[hi]
                hi += 1
            flat_sh = np.concatenate(shingle_sets[lo:hi])
            with np.errstate(over="ignore"):
                vals = (
                    self.a[None, :] * flat_sh[:, None] + self.b[None, :]
                ) % np.uint64(_MERSENNE)
            starts = np.zeros(hi - lo, dtype=np.int64)
            np.cumsum(counts[lo:hi][:-1], out=starts[1:])
            sigs[lo:hi] = np.minimum.reduceat(vals, starts, axis=0)
            lo = hi
        flat = pa.array(sigs.reshape(-1).astype(np.int64))
        offs = pa.array(
            np.arange(0, (n + 1) * self.num_perm, self.num_perm, dtype=np.int32)
        )
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

    # instance-as-function → elastic task pool (the permutation params
    # are cheap to build; an actor pool would cap width and pay ramp-up)
    mh = ds.map_batches(
        MinHasher(text_col=text_col, k=k, num_perm=num_perm),
        batch_format="pyarrow",
        batch_size=512,  # minhash is compute-heavy: small batches → wide task pool
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

    # (band, hash, id) triples are tiny next to the documents; pin them
    # so the counts pass and the member-gather pass don't re-run the
    # minhash computation. (At extreme scale, write them to parquet and
    # re-read instead of materializing.)
    exploded = mh.map_batches(explode, batch_format="pyarrow").materialize()

    return _resolve_buckets(exploded, id_col)




def _resolve_buckets(exploded, id_col: str) -> pa.Table:
    """(band_id, band_hash, id) triples → multi-member buckets with
    sorted member lists, without per-group Python calls: (1) vectorized
    bucket-size counts (two-phase, no row shuffle), (2) broadcast the
    multi-member bucket keys — near-dup buckets are a tiny fraction —
    (3) semi-join filter, (4) one pandas agg over the filtered set."""
    from .aggregate import two_phase_agg

    counts = two_phase_agg(
        exploded, ["band_id", "band_hash"], {"*": ["count"]}, num_salts=1,
        driver_finalize=True,
    ).to_pandas()
    multi = counts[counts["count"] >= 2]
    hot = set(zip(multi["band_id"].tolist(), multi["band_hash"].tolist()))
    if not hot:
        return pa.table(
            {
                "band_id": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.int64()),
                "ids": pa.array([], pa.list_(pa.string())),
                "n": pa.array([], pa.int64()),
            }
        )
    import ray

    hot_ref = ray.put(hot)

    def keep_hot(batch: pa.Table) -> pa.Table:
        keys = ray.get(hot_ref)
        bid = batch["band_id"].to_numpy(zero_copy_only=False)
        bh = batch["band_hash"].to_numpy(zero_copy_only=False)
        mask = np.fromiter(
            ((int(b), int(h)) in keys for b, h in zip(bid, bh)), bool, len(batch)
        )
        return batch.filter(pa.array(mask))

    survivors = (
        exploded.map_batches(keep_hot, batch_format="pyarrow").to_pandas()
    )  # small: only multi-member buckets survive
    agg = (
        survivors.groupby(["band_id", "band_hash"])[id_col]
        .agg(ids=lambda s: sorted(s.tolist()), n="size")
        .reset_index()
    )
    return pa.Table.from_pandas(agg, preserve_index=False)


def simhash_buckets(ds, text_col: str = "text", id_col: str = "doc_id", *, bands: int = 4):
    """SimHash near-dup candidates: split each 64-bit simhash into
    ``bands`` equal bit-bands; docs within Hamming distance < bands
    share at least one identical band (pigeonhole) and land in a common
    bucket. Same triple-shuffle/bucket-resolution shape as MinHash-LSH.
    """
    width = 64 // bands
    band_mask = np.uint64((1 << width) - 1)

    sh = ds.map_batches(SimHasher(text_col=text_col), batch_format="pyarrow", batch_size=2048)

    def explode(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(batch)
        out_band, out_hash, out_id = [], [], []
        for b in range(bands):
            vals = (h >> np.uint64(b * width)) & band_mask
            out_band.append(np.full(n, b, dtype=np.int32))
            out_hash.append(vals.astype(np.int64))
            out_id.append(ids)
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(out_band)),
                "band_hash": pa.array(np.concatenate(out_hash)),
                id_col: pa.array(np.concatenate(out_id)),
            }
        )

    exploded = sh.map_batches(explode, batch_format="pyarrow").materialize()
    return _resolve_buckets(exploded, id_col)

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

    bucketed = ds.map_batches(Bucketer(), batch_format="pyarrow")

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


# ------------------------------------------------- end-to-end near-dedup


def candidate_pairs_from_buckets(buckets: pa.Table, id_col: str = "doc_id") -> list[tuple]:
    """LSH buckets (ids list per bucket) → unique unordered candidate
    pairs. Pair count is bounded by sum over buckets of C(n,2); LSH
    keeps buckets small by construction."""
    pairs = set()
    for ids in buckets["ids"].to_pylist():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return sorted(pairs)


def verify_pairs(ds, pairs: list[tuple], *, text_col="text", id_col="doc_id", n: int = 3, threshold: float = 0.8):
    """Verify candidate pairs with exact n-gram Jaccard.

    The texts needed are only those appearing in candidate pairs — a
    broadcast semi-join fetch (tiny vs corpus), then pairwise exact
    similarity. Returns [(a, b, jaccard)] for pairs ≥ threshold.
    """
    import ray

    needed = {x for p in pairs for x in p}
    ref = ray.put(needed)

    def fetch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = ray.get(ref)
        mask = np.fromiter((v in keep for v in ids), bool, len(ids))
        return batch.select([id_col, text_col]).filter(pa.array(mask))

    texts_tbl = pa.concat_tables(
        ds.map_batches(fetch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    texts = dict(zip(texts_tbl[id_col].to_pylist(), texts_tbl[text_col].to_pylist()))
    # distribute verification: pair chunks fan out as Ray tasks, the
    # candidate texts broadcast once — the driver only merges edges
    texts_ref = ray.put(texts)

    @ray.remote
    def verify_chunk(chunk):
        tx = ray.get(texts_ref)
        out = []
        for a, b in chunk:
            ta, tb = tx.get(a), tx.get(b)
            if ta is None or tb is None:
                continue
            j = ngram_jaccard(ta, tb, n)
            if j >= threshold:
                out.append((a, b, j))
        return out

    chunk_size = max(256, len(pairs) // 256)
    futures = [
        verify_chunk.remote(pairs[i : i + chunk_size])
        for i in range(0, len(pairs), chunk_size)
    ]
    return [e for chunk in ray.get(futures) for e in chunk]


def connected_components(edges: list[tuple]) -> dict:
    """Union-find over verified duplicate edges → {id: cluster_root}.

    Driver-side: the edge set is the VERIFIED near-duplicate graph,
    orders of magnitude smaller than the corpus; for corpora where even
    that is too large, run iterative min-label propagation with
    groupby rounds instead (documented trade-off)."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, *_ in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # smaller root wins → deterministic cluster ids
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {x: find(x) for x in parent}


def near_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
):
    """End-to-end near-duplicate removal:

    MinHash+LSH candidate buckets → exact n-gram-Jaccard verification →
    connected components → survivors = min id per duplicate cluster +
    all unclustered docs. Returns (survivor_ids_table, clusters dict).
    """
    buckets = minhash_lsh_groups(
        ds, text_col=text_col, id_col=id_col, k=k, num_perm=num_perm, bands=bands
    )
    pairs = candidate_pairs_from_buckets(buckets, id_col)
    verified = verify_pairs(
        ds, pairs, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    )
    clusters = connected_components(verified)
    drop = {x for x, root in clusters.items() if root != x}
    import ray

    drop_ref = ray.put(drop)

    def survivors(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        dropped = ray.get(drop_ref)
        mask = np.fromiter((v not in dropped for v in ids), bool, len(ids))
        return batch.select([id_col]).filter(pa.array(mask))

    surv = pa.concat_tables(
        ds.map_batches(survivors, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return surv, clusters
