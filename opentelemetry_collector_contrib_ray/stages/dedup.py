"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (SURVEY.md §2.8 — the ES exporter dedups
field keys only); these are first-class engine additions. All follow
the same scale shape: vectorized per-batch signature computation in
``map_batches``, then ONE shuffle on the signature key, then per-BUCKET
(not per-key) resolution. Nothing materializes the corpus — or any
O(corpus)-sized structure — on the driver:

- signature kernels (shingles, MinHash, SimHash) run one strided numpy
  pass over the batch's concatenated bytes — no per-document Python;
- LSH bucket resolution and candidate-pair generation happen inside a
  hash-bucketed ``groupby(_bucket).map_groups`` (64 Python calls total,
  each a vectorized pass), not via driver-side collection;
- pair verification is a distributed join of the pair list against the
  corpus texts (two bucketed shuffles of pairs+texts);
- connected components default to driver union-find over the VERIFIED
  edge set (orders smaller than the corpus) with a distributed
  min-label-propagation implementation for dup-heavy corpora.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._util import splitmix64

_MERSENNE = (1 << 61) - 1
_SHINGLE_P = np.uint64(1099511628211)


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
    from .aggregate import bucketed_aggregate

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col).select(["content_hash", id_col]),
        batch_format="pyarrow",
    )
    # group count ~ corpus size → bucketed merge, not Ray native agg
    return bucketed_aggregate(hashed, ["content_hash"], [(id_col, "min", id_col)])


# ------------------------------------------------------- shingle kernel


def _cumsum0(counts: np.ndarray) -> np.ndarray:
    out = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=out[1:])
    return out


def _shingle_hashes_flat(
    arr: pa.Array, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """ALL docs' k-byte-shingle hashes in one strided pass.

    Zero-copy from the Arrow string buffers: the batch's texts are one
    contiguous UTF-8 byte run; a single rolling polynomial-hash pass
    computes every window, and windows crossing document boundaries are
    excluded by construction. Docs shorter than ``k`` are zero-padded
    (identical to the per-doc reference kernel). Returns
    ``(flat_hashes uint64, per_doc_counts int64)`` — feed ``counts``
    boundaries to ``np.minimum.reduceat`` for per-doc minima.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    if arr.null_count:
        import pyarrow.compute as pc

        arr = pc.fill_null(arr, "")
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1].astype(
        np.int64
    )
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    lens = np.diff(off)
    pad = np.clip(k - lens, 0, None)
    out_lens = lens + pad
    out_off = _cumsum0(out_lens)
    in_flat = data[off[0] : off[-1]]
    if pad.any():
        # scatter each doc's bytes to its padded position (vectorized)
        out_buf = np.zeros(int(out_off[-1]), dtype=np.uint8)
        shift = np.repeat(out_off[:-1] - (off[:-1] - off[0]), lens)
        out_buf[np.arange(len(in_flat), dtype=np.int64) + shift] = in_flat
    else:
        out_buf = in_flat  # zero-copy: already contiguous and aligned
    total = int(out_off[-1])
    W = total - k + 1  # ≥ 1: every doc is ≥ k bytes after padding
    # rolling hash h[s] = Σ_j byte[s+j] · P^j  — k strided passes
    h = np.zeros(W, dtype=np.uint64)
    pw = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(k):
            h += out_buf[j : j + W].astype(np.uint64) * pw
            pw = pw * _SHINGLE_P
    counts = out_lens - k + 1
    starts = (
        np.arange(int(counts.sum()), dtype=np.int64)
        - np.repeat(_cumsum0(counts)[:-1], counts)
        + np.repeat(out_off[:-1], counts)
    )
    return splitmix64(h[starts]), counts


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Single-doc shingle hashes (unique'd) — thin wrapper over the
    batch kernel, kept for signature()/tests API compatibility."""
    flat, _ = _shingle_hashes_flat(pa.array([text or ""], pa.string()), k)
    return np.unique(flat)


class MinHasher:
    """Per-batch MinHash signatures (k-shingles, n permutations).

    Stateless task-pool stage: permutation parameters built in
    __init__; per batch ONE strided shingle pass over the concatenated
    texts, then chunked (shingles × num_perm) permutation passes with
    per-doc minima via ``minimum.reduceat`` — no per-document Python
    anywhere. Output adds ``minhash`` (list<uint64> length num_perm).
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

    # max shingles per (num_perm × shingles) matrix: bounds the temp
    # allocation to ~ num_perm × _CHUNK × 8B (≈128 MB at 128 × 128k)
    _CHUNK = 128 * 1024

    def _flat_hashes(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """Hash source hook: byte shingles over the text column.
        ``TokenMinHasher`` overrides with token-window hashes so the
        same signature/LSH machinery runs on pre-tokenized corpora."""
        return _shingle_hashes_flat(batch[self.text_col], self.k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat_sh, counts = self._flat_hashes(batch)
        n = len(batch)
        doc_off = _cumsum0(counts)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        lo = 0
        while lo < n:
            hi = int(np.searchsorted(doc_off, doc_off[lo] + self._CHUNK, side="right")) - 1
            hi = max(hi, lo + 1)
            hi = min(hi, n)
            chunk = flat_sh[doc_off[lo] : doc_off[hi]]
            # (perm, shingle) layout with per-permutation SCALAR ops:
            # numpy's uint64 BROADCAST multiply takes a ~70x-slower
            # non-SIMD inner loop (measured 13.5 s vs 0.19 s on 1.5M x
            # 64), while scalar-operand multiplies into a preallocated
            # row hit the fast path; values are bit-identical
            vals = np.empty((self.num_perm, len(chunk)), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(self.num_perm):
                    np.multiply(chunk, self.a[j], out=vals[j])
                    vals[j] += self.b[j]
                vals %= np.uint64(_MERSENNE)
            starts = (doc_off[lo:hi] - doc_off[lo]).astype(np.int64)
            sigs[lo:hi] = np.minimum.reduceat(vals, starts, axis=1).T
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
    num_buckets: int = 64,
    concurrency: int | tuple = (2, 8),
):
    """MinHash+LSH near-dup candidate buckets.

    shingle→minhash per batch → explode to (band_id, band_hash, id)
    rows → ONE shuffle on a hash bucket of the band key → per-bucket
    vectorized resolution emits only buckets with ≥2 members. Returns a
    Dataset with columns (band_id, band_hash, ids list, n).

    Scale: the shuffle moves only (band, hash, id) triples — bands per
    doc, not documents — and nothing is collected to the driver.
    """
    exploded = _lsh_explode(
        ds, text_col, id_col, k=k, num_perm=num_perm, bands=bands
    )
    return _resolve_buckets(exploded, id_col, num_buckets=num_buckets)


_POS_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _token_window_hashes_flat(
    t: pa.Table, tokens_col: str, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Every k-TOKEN window hash of a ``list<int32>`` column in one
    flat pass — the token-native analogue of ``_shingle_hashes_flat``
    (same output shape: flat uint64 hashes + per-doc counts, short
    docs zero-padded to one window). Zero-copy from the Arrow list
    buffers; the window hash is a k-step polynomial fold over the
    int64 token values (k vector ops total, no per-doc Python)."""
    from .llmdata import _flat_tokens

    vals, offs = _flat_tokens(t, tokens_col)
    lens = np.diff(offs)
    n = len(lens)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    pad = np.clip(k - lens, 0, None)
    if pad.any():
        out_off = _cumsum0(lens + pad)
        out = np.zeros(int(out_off[-1]), dtype=np.int64)
        pos = np.arange(len(vals), dtype=np.int64) - np.repeat(offs[:-1], lens)
        out[np.repeat(out_off[:-1], lens) + pos] = vals
        vals, offs = out, out_off
        lens = np.diff(offs)
    n_wins = lens - k + 1
    starts = np.repeat(offs[:-1], n_wins) + np.concatenate(
        [np.arange(w, dtype=np.int64) for w in n_wins]
    ) if n_wins.sum() else np.empty(0, np.int64)
    u = vals.astype(np.uint64)
    h = np.zeros(len(starts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = splitmix64(h * _POS_MIX + u[starts + j])
    return h, n_wins.astype(np.int64)


class TokenMinHasher(MinHasher):
    """MinHash signatures over a PRE-TOKENIZED ``list<int32>`` column
    — the corpus-native shape — by swapping the byte-shingle source
    for k-token window hashes; permutations, chunking and LSH banding
    are inherited unchanged from ``MinHasher``."""

    def __init__(self, tokens_col: str = "tokens", k: int = 8, num_perm: int = 64, seed: int = 7):
        super().__init__(text_col=tokens_col, k=k, num_perm=num_perm, seed=seed)

    def _flat_hashes(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        return _token_window_hashes_flat(batch, self.text_col, self.k)


def token_minhash_lsh_groups(
    ds,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    *,
    k: int = 8,
    num_perm: int = 64,
    bands: int = 16,
    num_buckets: int = 64,
):
    """``minhash_lsh_groups`` over the pre-tokenized corpus shape:
    identical shuffle plan ((band, hash, id) triples only), token
    windows instead of byte shingles."""
    exploded = _lsh_explode(
        ds, tokens_col, id_col, k=k, num_perm=num_perm, bands=bands,
        hasher=TokenMinHasher(tokens_col=tokens_col, k=k, num_perm=num_perm),
    )
    return _resolve_buckets(exploded, id_col, num_buckets=num_buckets)


def exact_dedup_tokens(ds, tokens_col: str = "tokens", id_col: str = "doc_id"):
    """Token-array exact dedup, first-wins by smallest id: an
    order-and-position-sensitive 64-bit hash of each document's token
    sequence (one splitmix pass over the flat values XOR their
    position mix, summed per doc via ``add.reduceat``), then the same
    (hash, min-id) bucketed merge as ``exact_dedup`` — the shuffle
    moves (hash, id) pairs, never token arrays. Hash equality equals
    sequence equality up to negligible 64-bit collisions (same
    contract as the text-hash path)."""
    from .aggregate import bucketed_aggregate
    from .llmdata import _flat_tokens

    def hash_rows(t: pa.Table) -> pa.Table:
        vals, offs = _flat_tokens(t, tokens_col)
        lens = np.diff(offs)
        pos = np.arange(len(vals), dtype=np.int64) - np.repeat(offs[:-1], lens)
        with np.errstate(over="ignore"):
            mixed = splitmix64(
                vals.astype(np.uint64) ^ (pos.astype(np.uint64) * _POS_MIX)
            )
        doc_h = np.zeros(len(lens), dtype=np.uint64)
        if len(mixed):
            if (lens > 0).all():
                doc_h = np.add.reduceat(mixed, offs[:-1])
            else:
                # zero-length docs break reduceat segment bounds —
                # unbuffered scatter-add is exact for any shape
                doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
                np.add.at(doc_h, doc_of, mixed)
        # fold the length in so prefix-sum ties can't collide with
        # different-length docs whose suffix sums to zero
        doc_h = splitmix64(doc_h ^ lens.astype(np.uint64))
        return pa.table(
            {
                "content_hash": pa.array(doc_h, pa.uint64()),
                id_col: t[id_col],
            }
        )

    hashed = ds.map_batches(hash_rows, batch_format="pyarrow")
    return bucketed_aggregate(hashed, ["content_hash"], [(id_col, "min", id_col)])


def _lsh_explode(ds, text_col, id_col, *, k, num_perm, bands, hasher=None):
    """minhash → (band_id, band_hash, id) triples Dataset."""
    rows_per_band = num_perm // bands

    # instance-as-function → elastic task pool (the permutation params
    # are cheap to build; an actor pool would cap width and pay ramp-up)
    mh = ds.map_batches(
        hasher or MinHasher(text_col=text_col, k=k, num_perm=num_perm),
        batch_format="pyarrow",
        # small batches → wide task pool: the kernel is vectorized, so
        # the only reason to batch bigger is amortizing dispatch — and
        # minhash is compute-heavy enough that parallelism wins
        batch_size=512,
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

    return mh.map_batches(explode, batch_format="pyarrow")


def _add_bucket_col(exploded, num_buckets: int):
    """_bucket = hash(band_id, band_hash) % B — the ONE shuffle key."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        bh = batch["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bid = batch["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(bh ^ (bid * np.uint64(0x9E3779B97F4A7C15)))
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("_bucket", pa.array(b))

    return exploded.map_batches(add_bucket, batch_format="pyarrow")


def _resolve_buckets(exploded, id_col: str, *, num_buckets: int = 64):
    """(band_id, band_hash, id) triples → multi-member buckets with
    sorted member lists — DISTRIBUTED: one shuffle on a hash bucket of
    the band key, then per-bucket vectorized resolution (filter groups
    of size ≥2, build the id lists directly as an Arrow ListArray). No
    driver-side bucket-count table, no per-row Python membership."""
    bucketed = _add_bucket_col(exploded, num_buckets)

    def per_bucket(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "band_id": g["band_id"].to_numpy(zero_copy_only=False),
                "band_hash": g["band_hash"].to_numpy(zero_copy_only=False),
                id_col: g[id_col].to_numpy(zero_copy_only=False),
            }
        )
        df = df.sort_values(["band_id", "band_hash", id_col], kind="stable")
        sizes = df.groupby(["band_id", "band_hash"], sort=False)[id_col].transform("size")
        df = df[sizes.to_numpy() >= 2]
        id_type = g.schema.field(id_col).type
        if df.empty:
            return pa.table(
                {
                    "band_id": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                    "ids": pa.array([], pa.list_(id_type)),
                    "n": pa.array([], pa.int64()),
                }
            )
        # group boundaries on the sorted frame → ListArray, zero loops
        key_change = (
            (df["band_id"].to_numpy()[1:] != df["band_id"].to_numpy()[:-1])
            | (df["band_hash"].to_numpy()[1:] != df["band_hash"].to_numpy()[:-1])
        )
        starts = np.concatenate([[0], np.flatnonzero(key_change) + 1])
        bounds = np.concatenate([starts, [len(df)]]).astype(np.int32)
        ids_arr = pa.array(df[id_col].to_numpy(), id_type)
        lists = pa.ListArray.from_arrays(pa.array(bounds, pa.int32()), ids_arr)
        return pa.table(
            {
                "band_id": pa.array(
                    df["band_id"].to_numpy()[starts].astype(np.int32)
                ),
                "band_hash": pa.array(df["band_hash"].to_numpy()[starts].astype(np.int64)),
                "ids": lists,
                "n": pa.array(np.diff(bounds).astype(np.int64)),
            }
        )

    return bucketed.groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def lsh_candidate_pairs(exploded, id_col: str, *, num_buckets: int = 64):
    """(band_id, band_hash, id) triples → globally-unique candidate
    pairs (id_a < id_b), fully distributed: pairs are generated inside
    the bucketed groupby (size-2 groups vectorized; larger groups —
    rare by LSH construction — via a bounded per-group expansion), then
    deduped across bands with one hash-bucketed shuffle of the pairs."""
    bucketed = _add_bucket_col(exploded, num_buckets)

    def per_bucket(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "band_id": g["band_id"].to_numpy(zero_copy_only=False),
                "band_hash": g["band_hash"].to_numpy(zero_copy_only=False),
                id_col: g[id_col].to_numpy(zero_copy_only=False),
            }
        )
        df = df.sort_values(["band_id", "band_hash", id_col], kind="stable")
        grp = df.groupby(["band_id", "band_hash"], sort=False)[id_col]
        sizes = grp.transform("size").to_numpy()
        ids = df[id_col].to_numpy()
        id_type = g.schema.field(id_col).type
        out_a, out_b = [], []
        # size-2 groups (the common case): consecutive rows, vectorized
        m2 = sizes == 2
        if m2.any():
            pos = np.flatnonzero(m2)
            first = pos[::2]  # sorted frame → the two members are adjacent
            out_a.append(ids[first])
            out_b.append(ids[first + 1])
        # larger groups: per-group triangular expansion (rare; bounded
        # by LSH bucket sizes — all inside this distributed task)
        mlarge = sizes > 2
        if mlarge.any():
            dfl = df[mlarge]
            for _, members in dfl.groupby(["band_id", "band_hash"], sort=False)[id_col]:
                vals = members.to_numpy()
                ia, ib = np.triu_indices(len(vals), k=1)
                out_a.append(vals[ia])
                out_b.append(vals[ib])
        if not out_a:
            return pa.table(
                {
                    "id_a": pa.array([], id_type),
                    "id_b": pa.array([], id_type),
                    "_pb": pa.array([], pa.int64()),
                }
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        # local dedupe first (same pair can recur within this bucket):
        # lexsort + neighbor equality — exact, and avoids the per-pair
        # np.char string concatenation (Python-level per element)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.ones(len(a), bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[keep], b[keep]
        from .._util import hash_str_u64

        with np.errstate(over="ignore"):
            ph = splitmix64(hash_str_u64(a) ^ splitmix64(hash_str_u64(b)))
        pb = (ph % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "id_a": pa.array(a, id_type),
                "id_b": pa.array(b, id_type),
                "_pb": pa.array(pb),
            }
        )

    pairs = bucketed.groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")

    # dedupe across bands: hash-bucket the pairs (single int key — far
    # cheaper to shuffle than a two-string-column sort aggregate), then
    # one vectorized drop_duplicates per pair bucket. Emit ARROW with
    # stripped metadata: a pandas block here re-acquires the unhashable
    # pandas schema blob at the downstream join shuffle (Ray's schema
    # dedup warning)
    from .._util import table_from_pandas

    def dedupe(df: pd.DataFrame) -> pa.Table:
        return table_from_pandas(df.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]])

    return pairs.groupby("_pb").map_groups(dedupe, batch_format="pandas")


def simhash_buckets(ds, text_col: str = "text", id_col: str = "doc_id", *, bands: int = 4, num_buckets: int = 64):
    """SimHash near-dup candidates: split each 64-bit simhash into
    ``bands`` equal bit-bands; docs within Hamming distance < bands
    share at least one identical band (pigeonhole) and land in a common
    bucket. Same triple-shuffle/bucketed-resolution shape as MinHash-LSH.
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

    exploded = sh.map_batches(explode, batch_format="pyarrow")
    return _resolve_buckets(exploded, id_col, num_buckets=num_buckets)

# -------------------------------------------------------------------- SimHash

_GRAM_SENT1 = np.uint64(0xC2B2AE3D27D4EB4F)
_GRAM_SENT2 = np.uint64(0x165667B19E3779F9)


class SimHasher:
    """64-bit SimHash over word 3-grams; adds ``simhash`` column.

    Fully batch-vectorized: words hashed once (pandas hash_array over
    the exploded word list), 3-gram hashes mixed from consecutive word
    hashes, bit counting via ``unpackbits`` + per-doc ``reduceat`` — no
    per-document Python loop. Near-dups share low Hamming distance.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return batch.append_column("simhash", pa.array([], pa.int64()))
        s = pd.Series(batch[self.text_col].to_numpy(zero_copy_only=False), dtype=object)
        words = s.fillna("").str.split()
        # explode: one row per word; empty docs yield one NaN row → ""
        flat = words.explode().fillna("").to_numpy(dtype=object)
        nw = np.maximum(words.str.len().to_numpy(dtype=np.int64), 1)
        word_h = splitmix64(np.asarray(pd.util.hash_array(flat), dtype=np.uint64))
        word_off = _cumsum0(nw)
        g_counts = np.maximum(nw - 2, 1)
        g_off = _cumsum0(g_counts)
        pos = (
            np.arange(int(g_counts.sum()), dtype=np.int64)
            - np.repeat(g_off[:-1], g_counts)
            + np.repeat(word_off[:-1], g_counts)
        )
        doc_end = np.repeat(word_off[1:], g_counts)
        h0 = word_h[pos]
        i1, i2 = pos + 1, pos + 2
        v1, v2 = i1 < doc_end, i2 < doc_end
        h1 = np.where(v1, word_h[np.minimum(i1, len(word_h) - 1)], _GRAM_SENT1)
        h2 = np.where(v2, word_h[np.minimum(i2, len(word_h) - 1)], _GRAM_SENT2)
        with np.errstate(over="ignore"):
            gh = splitmix64(h0 ^ splitmix64(h1 ^ splitmix64(h2)))
        # bit matrix (G × 64) via unpackbits on the little-endian bytes
        bits = np.unpackbits(
            gh.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int32)
        ones = np.add.reduceat(bits, g_off[:-1], axis=0)
        v = 2 * ones - g_counts[:, None]
        sim = ((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1
        )
        return batch.append_column("simhash", pa.array(sim.astype(np.int64)))


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard similarity (candidate verification)."""
    aw, bw = a.split(), b.split()
    A = {tuple(aw[i : i + n]) for i in range(max(1, len(aw) - n + 1))}
    B = {tuple(bw[i : i + n]) for i in range(max(1, len(bw) - n + 1))}
    if not A and not B:
        return 1.0
    return len(A & B) / max(1, len(A | B))


# ------------------------------------------------------ embedding near-dup


def _vec_matrix(col: pa.ChunkedArray | pa.Array, n: int) -> np.ndarray:
    """list<float> (or Ray tensor-extension) column → (n, d) float32
    matrix, zero-copy when the lists are contiguous and equal-length
    (the common Parquet case)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if hasattr(col, "flatten"):  # plain ListArray
        flat = np.asarray(col.flatten(), dtype=np.float32)
        if n and flat.size % n == 0:
            return flat.reshape(n, -1)
        return np.stack([np.asarray(v, dtype=np.float32) for v in col.to_pylist()])
    # ArrowTensorArray / other extension types: to_numpy gives (n, d)
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype == object:
        return np.stack([np.asarray(v, dtype=np.float32) for v in arr])
    return np.asarray(arr, dtype=np.float32).reshape(n, -1)


def normalized_vec_ds(ds, id_col="vec_id", emb_col="embedding", out_col="vec"):
    """(id, embedding) → (id, unit-norm vec) as a Dataset stage."""

    def norm_batch(t: pa.Table) -> pa.Table:
        m = _vec_matrix(t[emb_col], len(t))
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pa.table(
            {
                id_col: t[id_col],
                out_col: pa.array(list(m), type=pa.list_(pa.float32())),
            }
        )

    return ds.map_batches(norm_batch, batch_format="pyarrow")


def verify_cos_pairs_ds(
    ds,
    pairs_ds,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    num_buckets: int = 32,
):
    """Exact-cosine verification of candidate id pairs: join the pair
    list against the (normalized) embeddings — two distributed joins,
    nothing collected to the driver — then one vectorized dot per pair.
    Returns (id_a, id_b, cos) with cos ≥ threshold; the embedding-side
    twin of the text path's ``verify_pairs_ds``."""
    from .join import bucketed_hash_join

    vecs = normalized_vec_ds(ds, id_col=id_col, emb_col=emb_col)
    va = vecs.map_batches(
        lambda t: t.rename_columns(["id_a", "vec_a"]), batch_format="pyarrow"
    )
    vb = vecs.map_batches(
        lambda t: t.rename_columns(["id_b", "vec_b"]), batch_format="pyarrow"
    )
    # always the bucketed (pandas-merge) join: Arrow's acero hash join —
    # the engine under Dataset.join — rejects list<float> non-key fields
    j = bucketed_hash_join(pairs_ds, va, "id_a", num_buckets=num_buckets)
    j = bucketed_hash_join(j, vb, "id_b", num_buckets=num_buckets)

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "id_a": t["id_a"],
                    "id_b": t["id_b"],
                    "cos": pa.array([], pa.float64()),
                }
            )
        a = _vec_matrix(t["vec_a"], len(t))
        b = _vec_matrix(t["vec_b"], len(t))
        cos = np.einsum("ij,ij->i", a, b).astype(np.float64)
        out = pa.table({"id_a": t["id_a"], "id_b": t["id_b"], "cos": pa.array(cos)})
        return out.filter(pa.array(cos >= threshold))

    return j.map_batches(score, batch_format="pyarrow")


def embedding_neardup_pairs(
    ds,
    *,
    id_col="vec_id",
    emb_col="embedding",
    threshold=0.95,
    nbits=None,
    num_tables=8,
    seed=3,
    target_bucket=64,
):
    """Embedding-cosine near-dup: MULTI-TABLE random-hyperplane LSH.

    Recall for a pair at cosine c is ``1 − (1 − p^nbits)^num_tables``
    with ``p = 1 − acos(c)/π``; candidates are exact-cosine verified so
    the output NEVER contains false positives. Returns pairs
    (id_a, id_b, cos ≥ threshold, id_a < id_b).

    Scale shape (round-3 rework of the two round-2 watch-items):
    - the LSH shuffle moves (table, bucket, id) TRIPLES only — vectors
      are no longer replicated ×num_tables through the shuffle (256 B
      × 8 per vector at d=64 → 24 B × 8);
    - ``nbits`` auto-scales as ~log2(n / target_bucket) (clipped 4-24)
      so the expected bucket size — and with it the in-bucket pair
      expansion — stays CONSTANT as the corpus grows, instead of
      O(bucket²) at a fixed bit count;
    - pair generation + cross-table dedup reuse the MinHash path's
      distributed ``lsh_candidate_pairs`` (bucketed groupby, pairs
      deduped by single-int-key shuffle), and verification is the
      distributed pairs × vectors join ``verify_cos_pairs_ds`` — the
      same shapes already proven on the text near-dup path.
    """
    if nbits is None:
        n = ds.count()
        nbits = int(np.clip(round(np.log2(max(n, 2) / target_bucket)), 4, 24))

    class Bucketer:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _vec_matrix(batch[emb_col], len(batch))
            if self.planes is None:
                rng = np.random.default_rng(seed)
                self.planes = rng.standard_normal(
                    (num_tables, vecs.shape[1], nbits)
                ).astype(np.float32)
            n = len(vecs)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            tabs, buckets = [], []
            for t in range(num_tables):
                proj = vecs @ self.planes[t]
                bits = (proj > 0).astype(np.uint64)
                b = (bits << np.arange(nbits, dtype=np.uint64)[None, :]).sum(axis=1)
                tabs.append(np.full(n, t, dtype=np.int32))
                buckets.append(b.astype(np.int64))
            return pa.table(
                {
                    "band_id": pa.array(np.concatenate(tabs)),
                    "band_hash": pa.array(np.concatenate(buckets)),
                    id_col: pa.array(np.tile(ids, num_tables)),
                }
            )

    exploded = ds.map_batches(Bucketer(), batch_format="pyarrow")
    pairs = lsh_candidate_pairs(exploded, id_col)
    return verify_cos_pairs_ds(
        ds, pairs, id_col=id_col, emb_col=emb_col, threshold=threshold
    )


# ------------------------------------------------- end-to-end near-dedup


def candidate_pairs_from_buckets(buckets: pa.Table, id_col: str = "doc_id") -> list[tuple]:
    """LSH buckets (ids list per bucket) → unique unordered candidate
    pairs, on the driver. COMPAT/SMALL-SCALE ONLY: the distributed path
    is ``lsh_candidate_pairs`` (pairs generated inside the bucketed
    groupby), which ``near_dedup`` uses."""
    pairs = set()
    for ids in buckets["ids"].to_pylist():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return sorted(pairs)


def _jaccard_hash_sets(texts: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-text sorted unique word-n-gram hash sets, returned FLAT:
    ``(flat, offsets)`` where doc i's set is ``flat[offsets[i]:offsets[i+1]]``
    (sorted, unique). Flat layout keeps downstream pairwise work fully
    vectorized (gather + lexsort) with no per-doc Python objects."""
    s = pd.Series(texts, dtype=object)
    words = s.fillna("").str.split()
    flat = words.explode().fillna("").to_numpy(dtype=object)
    nw = np.maximum(words.str.len().to_numpy(dtype=np.int64), 1)
    word_h = splitmix64(np.asarray(pd.util.hash_array(flat), dtype=np.uint64))
    word_off = _cumsum0(nw)
    g_counts = np.maximum(nw - n + 1, 1)
    g_off = _cumsum0(g_counts)
    pos = (
        np.arange(int(g_counts.sum()), dtype=np.int64)
        - np.repeat(g_off[:-1], g_counts)
        + np.repeat(word_off[:-1], g_counts)
    )
    doc_end = np.repeat(word_off[1:], g_counts)
    gh = word_h[pos].copy()
    with np.errstate(over="ignore"):
        for j in range(1, n):
            ij = pos + j
            vj = ij < doc_end
            hj = np.where(vj, word_h[np.minimum(ij, len(word_h) - 1)], np.uint64(j) * _GRAM_SENT1)
            gh = splitmix64(gh ^ hj)
    # unique-per-doc without a per-doc Python loop: sort (doc, hash),
    # drop equal neighbors within a doc
    doc_of = np.repeat(np.arange(len(nw), dtype=np.int64), g_counts)
    order = np.lexsort((gh, doc_of))
    sd, sh = doc_of[order], gh[order]
    keep = np.ones(len(sh), dtype=bool)
    keep[1:] = (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])
    sd, sh = sd[keep], sh[keep]
    out_counts = np.bincount(sd, minlength=len(nw)).astype(np.int64)
    return sh, _cumsum0(out_counts)


def verify_pairs_ds(
    ds,
    pairs_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    num_buckets: int = 32,
):
    """Distributed candidate-pair verification: join the pair list
    against the corpus texts (two bucketed shuffles of pairs + texts —
    nothing collected to the driver), then exact n-gram Jaccard per
    pair (hash-set intersection; texts appear only inside the join).
    Returns a Dataset (id_a, id_b, jaccard) with jaccard ≥ threshold.

    The n-grams are compared as 64-bit hashes (collision probability
    negligible), equivalent to ``ngram_jaccard`` on tuple sets.
    """
    from .join import bucketed_hash_join, native_join

    texts = ds.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
    )
    ta = texts.map_batches(
        lambda t: t.rename_columns(["id_a", "text_a"]), batch_format="pyarrow"
    )
    tb = texts.map_batches(
        lambda t: t.rename_columns(["id_b", "text_b"]), batch_format="pyarrow"
    )
    # native hash-shuffle join (measured faster at full width); its
    # aggregator actors stall on tiny clusters, so partition count must
    # track the actual CPU budget and small sessions use the bucketed path
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    if cpus >= 8:
        j1 = native_join(pairs_ds, ta, "id_a")  # partitions derived from cluster
        j2 = native_join(j1, tb, "id_b")
    else:
        j1 = bucketed_hash_join(pairs_ds, ta, "id_a", num_buckets=num_buckets)
        j2 = bucketed_hash_join(j1, tb, "id_b", num_buckets=num_buckets)

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "id_a": batch["id_a"],
                    "id_b": batch["id_b"],
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        # each doc appears in many pairs — build its gram set ONCE per
        # batch (unique docs), then look pairs up by position
        ids = np.concatenate(
            [
                batch["id_a"].to_numpy(zero_copy_only=False),
                batch["id_b"].to_numpy(zero_copy_only=False),
            ]
        )
        txts = np.concatenate(
            [
                batch["text_a"].to_numpy(zero_copy_only=False),
                batch["text_b"].to_numpy(zero_copy_only=False),
            ]
        )
        uniq_ids, inv = np.unique(ids.astype(str), return_inverse=True)
        first = np.zeros(len(uniq_ids), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(ids) - 1, -1, -1)
        flat, offs = _jaccard_hash_sets(txts[first], n)
        doc_lens = np.diff(offs)
        m = len(batch)

        def gather(docidx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            lens = doc_lens[docidx]
            o = _cumsum0(lens)
            pos = (
                np.arange(int(lens.sum()), dtype=np.int64)
                - np.repeat(o[:-1], lens)
                + np.repeat(offs[docidx], lens)
            )
            return flat[pos], lens

        # batched intersection: tag each set element with its pair id,
        # lexsort the union of A- and B-elements, count equal neighbors
        # (sets are unique per side, so each shared hash appears exactly
        # twice per pair) — no per-pair Python work
        a_flat, lens_a = gather(inv[:m])
        b_flat, lens_b = gather(inv[m:])
        pid = np.concatenate(
            [
                np.repeat(np.arange(m, dtype=np.int64), lens_a),
                np.repeat(np.arange(m, dtype=np.int64), lens_b),
            ]
        )
        h = np.concatenate([a_flat, b_flat])
        order = np.lexsort((h, pid))
        sp, sh = pid[order], h[order]
        dup = (sp[1:] == sp[:-1]) & (sh[1:] == sh[:-1])
        inter = np.bincount(sp[1:][dup], minlength=m).astype(np.float64)
        union = np.maximum(lens_a + lens_b - inter, 1.0)
        jac = inter / union
        out = pa.table(
            {"id_a": batch["id_a"], "id_b": batch["id_b"], "jaccard": pa.array(jac)}
        )
        return out.filter(pa.array(jac >= threshold))

    return j2.map_batches(score, batch_format="pyarrow")


def verify_pairs(ds, pairs: list[tuple], *, text_col="text", id_col="doc_id", n: int = 3, threshold: float = 0.8):
    """Broadcast-based pair verification (COMPAT/SMALL-SCALE: the
    candidate-texts dict lives on the driver — use ``verify_pairs_ds``
    for dup-heavy corpora where candidates ~ corpus).
    """
    import ray

    needed = {x for p in pairs for x in p}
    ref = ray.put(needed)

    def fetch(batch: pa.Table) -> pa.Table:
        ids = pd.Series(batch[id_col].to_numpy(zero_copy_only=False))
        keep = ray.get(ref)
        mask = ids.isin(keep).to_numpy()
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
    orders of magnitude smaller than the corpus. For corpora where even
    that is too large, use ``connected_components_ds`` (distributed
    min-label propagation — same roots)."""
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


def connected_components_ds(edges_ds, *, max_iters: int = 20):
    """Distributed connected components over an edge Dataset
    (id_a, id_b) via iterative min-label propagation: each round every
    node takes the min of its own label and its neighbors' labels (two
    grouped merges over the edge list — no driver-side graph). Labels
    converge to the component's min id — identical roots to the
    union-find path. Iterations ≈ graph diameter; near-dup clusters
    are shallow, so a handful of rounds suffices.

    Returns a Dataset (id, root) covering every node that appears in
    an edge. Scale shape: each round shuffles |edges| label messages.
    """
    import pyarrow.compute as pc

    from .aggregate import bucketed_aggregate

    def _min_ew(a, b):
        # element-wise min that also works for string ids
        return pc.if_else(pc.less_equal(a, b), a, b)

    def to_msgs(batch: pa.Table) -> pa.Table:
        # seed: each endpoint proposes min(a, b) to both endpoints
        a, b = batch["id_a"].combine_chunks(), batch["id_b"].combine_chunks()
        lo = _min_ew(a, b)
        return pa.table(
            {
                "id": pa.concat_arrays([a, b]),
                "label": pa.concat_arrays([lo, lo]),
            }
        )

    # node count ~ dup-graph size → bucketed merge each round, not Ray
    # native agg (per-group Python at the sort boundary)
    labels = bucketed_aggregate(
        edges_ds.map_batches(to_msgs, batch_format="pyarrow"),
        ["id"],
        [("label", "min", "label")],
    ).materialize()
    edges = edges_ds.materialize()
    prev_sig = None
    for _ in range(max_iters):
        from .join import bucketed_hash_join  # labels can be large: bucketed join

        la = labels.map_batches(
            lambda t: t.rename_columns(["id_a", "label_a"]), batch_format="pyarrow"
        )
        j = bucketed_hash_join(edges, la, "id_a", num_buckets=16)
        lb = labels.map_batches(
            lambda t: t.rename_columns(["id_b", "label_b"]), batch_format="pyarrow"
        )
        j = bucketed_hash_join(j, lb, "id_b", num_buckets=16)

        def msgs(df: pd.DataFrame) -> pd.DataFrame:
            # every node appears in an incident edge, so emitting
            # min(label_a, label_b) to BOTH endpoints already includes
            # each node's own label — no union with `labels` needed
            m = np.minimum(df["label_a"].to_numpy(), df["label_b"].to_numpy())
            return pd.DataFrame(
                {
                    "id": np.concatenate([df["id_a"].to_numpy(), df["id_b"].to_numpy()]),
                    "label": np.concatenate([m, m]),
                }
            )

        new_labels = bucketed_aggregate(
            j.map_batches(msgs, batch_format="pandas"),
            ["id"],
            [("label", "min", "label")],
        ).materialize()
        # convergence: order-insensitive checksum of (id, label)
        def sig_batch(t: pa.Table) -> pa.Table:
            h = _text_hash64(
                pd.Series(t["id"].to_pylist(), dtype=object).astype(str)
                + "\x00"
                + pd.Series(t["label"].to_pylist(), dtype=object).astype(str)
            )
            return pa.table({"x": pa.array([int(np.bitwise_xor.reduce(h))], pa.uint64())})

        parts = new_labels.map_batches(sig_batch, batch_format="pyarrow").take_all()
        sig = 0
        for r in parts:
            sig ^= int(r["x"])
        labels = new_labels
        if sig == prev_sig:
            break
        prev_sig = sig
    return labels.map_batches(
        lambda t: t.rename_columns(["id", "root"]), batch_format="pyarrow"
    )


def near_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    num_buckets: int = 64,
    cc_mode: str = "auto",
    cc_edge_threshold: int = 100_000,
):
    """End-to-end near-duplicate removal, distributed at every step:

    MinHash+LSH candidate pairs (bucketed groupby — no driver bucket
    table) → exact n-gram-Jaccard verification (distributed join of
    pairs × texts) → connected components over the verified edges →
    survivors = min id per duplicate cluster + all unclustered docs.

    Default LSH shape is 16 bands × 8 rows (num_perm=128): at the 0.8
    default threshold a true pair collides with p ≈ 0.95 while the
    random-collision rate per band is J^8 — on corpora with templated
    boilerplate (baseline J ≈ 0.2-0.4) this keeps the candidate set
    ~linear in n, where 4-row bands degenerate toward all-pairs
    (measured 292k candidates from 5.2k docs). Candidate count, not
    hashing, is the scale cost: every candidate crosses the verify
    join. Lower ``bands`` (wider rows) further for higher thresholds;
    raise it for recall at low thresholds.

    ``cc_mode``: 'driver' = union-find over collected edges (O(edges)
    on the driver); 'distributed' = min-label propagation
    (``connected_components_ds``), driver holds only the O(dup-nodes)
    label map; 'auto' (default) counts the verified edges and switches
    to the distributed path past ``cc_edge_threshold`` — so a dup-heavy
    corpus never ships its edge set to the driver.
    Returns (survivor_ids_table, clusters dict {dup_id: root_id}).
    """
    clusters = near_dedup_clusters(
        ds,
        text_col=text_col,
        id_col=id_col,
        k=k,
        num_perm=num_perm,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        num_buckets=num_buckets,
        cc_mode=cc_mode,
        cc_edge_threshold=cc_edge_threshold,
    )
    drop = {x for x, root in clusters.items() if root != x}
    import ray

    drop_ref = ray.put(np.asarray(sorted(drop), dtype=object))

    def survivors(batch: pa.Table) -> pa.Table:
        ids = pd.Series(batch[id_col].to_numpy(zero_copy_only=False))
        dropped = ray.get(drop_ref)
        mask = ~ids.isin(dropped).to_numpy()  # vectorized membership
        return batch.select([id_col]).filter(pa.array(mask))

    surv = pa.concat_tables(
        ds.map_batches(survivors, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return surv, clusters


def near_dedup_clusters(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    num_buckets: int = 64,
    cc_mode: str = "auto",
    cc_edge_threshold: int = 100_000,
):
    """The discovery half of ``near_dedup``: LSH candidates → verified
    edges → connected components, returning only the cluster map
    ``{dup_id: root_id}`` (one entry per node touching a verified
    edge — O(duplicates), never O(corpus)). Callers that need the
    filtered corpus apply their own anti-filter so the text is not
    re-read (``pipelines/corpus_prep.py`` composes this)."""
    exploded = _lsh_explode(ds, text_col, id_col, k=k, num_perm=num_perm, bands=bands)
    pairs = lsh_candidate_pairs(exploded, id_col, num_buckets=num_buckets)
    edges_ds = verify_pairs_ds(
        ds, pairs, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    )
    if cc_mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"cc_mode must be auto|driver|distributed, got {cc_mode!r}")
    use_distributed = cc_mode == "distributed"
    if cc_mode == "auto":
        edges_ds = edges_ds.materialize()  # count + reuse without recompute
        use_distributed = edges_ds.count() > cc_edge_threshold
    if use_distributed:
        labels = connected_components_ds(
            edges_ds.map_batches(
                lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
            )
        )
        lab_batches = list(
            labels.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        clusters = {}
        for lb in lab_batches:  # one entry per dup-graph NODE (≪ edges)
            clusters.update(zip(lb["id"].to_pylist(), lb["root"].to_pylist()))
    else:
        edge_batches = list(
            edges_ds.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        if edge_batches:
            edges_tbl = pa.concat_tables(edge_batches, promote_options="permissive")
            edges = list(
                zip(
                    edges_tbl["id_a"].to_pylist(),
                    edges_tbl["id_b"].to_pylist(),
                    edges_tbl["jaccard"].to_pylist(),
                )
            )
        else:
            edges = []
        clusters = connected_components(edges)
    return clusters
