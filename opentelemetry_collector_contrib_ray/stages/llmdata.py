"""Training-data pipeline operators: PII redaction, Gopher-style
repetition/quality filters, sequence packing, C4-style line cleaning,
deterministic domain-mixture resampling, CCNet-style unigram LM
quality scoring, DSIR hashed-n-gram importance scoring, and
RefinedWeb-style corpus-wide exact line dedup.

These are engine additions beyond the reference's telemetry operators
(build mandate: "the operations a large-scale training-data pipeline
would need"). Public-knowledge semantics:

* PII redaction — the standard pre-training scrub (emails / IPv4s /
  phone numbers replaced by typed placeholder tokens), as popularized
  by public corpus pipelines (e.g. BigScience ROOTS, RefinedWeb).
  Pure vectorized regex over a text column; patterns are RE2-safe so a
  SQL oracle can mirror them with ``regexp_replace(..., 'g')``.
* Gopher repetition rules — the repetition/quality signals from the
  Gopher paper's data pipeline (Rae et al. 2021, table A1): duplicate
  word fraction, alphabetic-word fraction, symbol-to-word ratio, mean
  word length window, minimum word count. Computed per document with
  explode + hash-groupby kernels (no per-row Python).
* Sequence packing — GPT-style "concatenate documents and cut into
  fixed-length training sequences": within each ``group_col``
  partition, documents are concatenated in ``order_col`` order and the
  flat token stream is sliced into chunks of ``seq_len`` (the final
  partial chunk is kept). Distributed as ONE bucketed shuffle on the
  group key; each group's pack is a numpy concatenate + stride slice.
  Partitioning assumption: one group's tokens fit one task (bound
  seq_len × chunks per group; hot groups land in one bucket — salt
  upstream if a single source dominates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._util import table_from_pandas

# RE2-compatible (no lookaround/backrefs) so DuckDB regexp_replace
# mirrors them exactly.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[-.]\d{3}[-.]\d{4}", "<PHONE>"),
]


def redact_pii(batch: pa.Table, text_col: str = "text", out_col: str = "redacted") -> pa.Table:
    """Replace PII spans with typed placeholders; adds ``n_<kind>``
    count columns and the redacted text. Patterns apply in PII_PATTERNS
    order (email before ip before phone) — an oracle must chain its
    regexp_replace calls in the same order."""
    s = pd.Series(batch[text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
    for kind, pattern, repl in PII_PATTERNS:
        n = s.str.count(pattern).astype(np.int64)
        s = s.str.replace(pattern, repl, regex=True)
        batch = batch.append_column(f"n_{kind}", pa.array(n.to_numpy(), pa.int64()))
    return batch.append_column(out_col, pa.array(s.to_numpy(dtype=object), pa.string()))


def gopher_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition/quality signals per document:
    ``dup_word_frac`` (1 - distinct/total words), ``alpha_word_frac``
    (words containing a latin letter), ``symbol_word_ratio``
    (#/ellipsis occurrences per word), plus ``passes_gopher``
    combining them with the mean-word-length window [3, 10] and a
    minimum word count. Explode + groupby kernels, no per-row loops."""
    s = pd.Series(batch[text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
    words = s.str.split(" ")
    lens = words.str.len().fillna(0).astype(np.int64)
    n = len(s)
    flat = (
        np.concatenate([np.asarray(w, dtype=object) for w in words.to_numpy()])
        if n and lens.sum() > 0
        else np.array([], dtype=object)
    )
    ids = np.repeat(np.arange(n), lens.to_numpy())
    dfw = pd.DataFrame({"i": ids, "w": flat})
    g = dfw.groupby("i", sort=False)
    nuniq = g["w"].nunique().reindex(range(n), fill_value=0).to_numpy()
    alpha = (
        dfw.assign(a=dfw["w"].str.contains("[A-Za-z]", regex=True, na=False))
        .groupby("i", sort=False)["a"]
        .sum()
        .reindex(range(n), fill_value=0)
        .to_numpy()
    )
    n_words = lens.to_numpy()
    nz = np.maximum(n_words, 1)
    dup_word_frac = 1.0 - nuniq / nz
    alpha_word_frac = alpha / nz
    n_chars = s.str.len().astype(np.int64).to_numpy()
    mean_word_len = (n_chars - (n_words - 1)) / nz
    symbols = (s.str.count("#") + s.str.count(r"\.\.\.")).astype(np.int64).to_numpy()
    symbol_word_ratio = symbols / nz
    passes = (
        (n_words >= 5)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (dup_word_frac < 0.5)
        & (alpha_word_frac > 0.8)
        & (symbol_word_ratio < 0.1)
    )
    for name, arr, typ in [
        ("dup_word_frac", dup_word_frac, pa.float64()),
        ("alpha_word_frac", alpha_word_frac, pa.float64()),
        ("symbol_word_ratio", symbol_word_ratio, pa.float64()),
        ("passes_gopher", passes, pa.bool_()),
    ]:
        batch = batch.append_column(name, pa.array(arr, typ))
    return batch


def build_eval_grams(texts, n: int = 8) -> np.ndarray:
    """Hash every n-word window of the held-out texts (the small side
    of decontamination). Returns a SORTED uint64 array to broadcast
    with ray.put — the lookup side of the scan uses np.isin against
    it, so the eval set never re-ships per batch."""
    from .._util import hash_str_u64

    grams: list[np.ndarray] = []
    for t in texts:
        words = (t or "").split(" ")
        if len(words) < n:
            continue
        joined = np.array(
            [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)],
            dtype=object,
        )
        grams.append(hash_str_u64(joined))
    if not grams:
        return np.array([], dtype=np.uint64)
    return np.sort(np.unique(np.concatenate(grams)))


class NgramDecontaminator:
    """GPT-3-style test-set decontamination (Brown et al. 2020,
    appendix C): flag a training document when ANY of its n-word
    windows appears in the held-out set's n-gram table.

    Actor-pool stage: ``eval_grams`` (a sorted uint64 hash array,
    typically a ``ray.put`` handle resolved by Ray's argument
    de-reference) is held once per actor; ``__call__`` runs one strided
    window-hash pass per batch and an ``np.isin`` membership against
    the broadcast table. Adds a ``contaminated`` bool column."""

    def __init__(
        self,
        eval_grams: np.ndarray,
        n: int = 8,
        text_col: str = "text",
        backend: str = "sorted",
        bloom_bits: int = 1 << 22,
    ):
        """``backend='sorted'`` holds the exact sorted hash array
        (np.isin membership — exact, memory ∝ eval-set n-grams).
        ``backend='bloom'`` packs the hashes into a fixed-size Bloom
        filter instead — memory is ``bloom_bits/8`` regardless of
        eval-set size, no false negatives (every contaminated doc is
        still flagged), a bounded rate of extra flags. The scale
        choice when the held-out set itself is large."""
        self.n = n
        self.text_col = text_col
        self.backend = backend
        grams = np.asarray(eval_grams, dtype=np.uint64)
        if backend == "bloom":
            from .sketch import BloomFilter

            self.bloom = BloomFilter(bloom_bits, 5)
            if len(grams):
                self.bloom.add_hashes(grams)
            self.grams = np.empty(0, np.uint64) if len(grams) else grams
            self._any = bool(len(grams))
        elif backend == "sorted":
            self.grams = grams
            self._any = bool(len(grams))
        else:
            raise ValueError(f"backend must be sorted|bloom, got {backend!r}")

    def __call__(self, t: pa.Table) -> pa.Table:
        s = pd.Series(t[self.text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        flags = np.zeros(len(s), dtype=bool)
        if self._any:
            h, doc_of = _window_hashes(s, self.n)
            if self.backend == "bloom":
                hit = self.bloom.contains_hashes(h) if len(h) else np.zeros(0, bool)
            else:
                hit = np.isin(h, self.grams)
            np.add.at(flags, doc_of[hit], True)
        return t.append_column("contaminated", pa.array(flags, pa.bool_()))


def _window_hashes_full(
    s: pd.Series, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Hash every n-word window of every text in ``s`` in one flat
    pass. Returns ``(hashes uint64, doc_index int64, flat_start int64,
    flat_words object, word_lens int64)`` — the window render is
    positional string adds over the flat word array, the same
    joined-string hashing as ``build_eval_grams``; ``flat_start`` is
    each window's first-word index into ``flat_words`` (the
    concatenation of every doc's space-split words)."""
    from .._util import hash_str_u64

    words = s.str.split(" ")
    lens = words.str.len().to_numpy(dtype=np.int64) if len(s) else np.empty(0, np.int64)
    n_wins = np.maximum(lens - n + 1, 0)
    if n_wins.sum() == 0:
        flat = (
            np.concatenate([np.asarray(w, dtype=object) for w in words.to_numpy()])
            if len(s) and lens.sum()
            else np.empty(0, object)
        )
        return (
            np.empty(0, np.uint64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            flat,
            lens,
        )
    flat_words = np.concatenate(
        [np.asarray(w, dtype=object) for w in words.to_numpy()]
    )
    starts = np.repeat(np.cumsum(lens) - lens, n_wins) + np.concatenate(
        [np.arange(k, dtype=np.int64) for k in n_wins]
    )
    doc_of = np.repeat(np.arange(len(s), dtype=np.int64), n_wins)
    win = flat_words[starts].astype(object)
    for off in range(1, n):
        win = win + " " + flat_words[starts + off]
    return hash_str_u64(win.astype(object)), doc_of, starts, flat_words, lens


def _window_hashes(s: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    h, doc_of, _, _, _ = _window_hashes_full(s, n)
    return h, doc_of


def duplicate_passages(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    min_docs: int = 2,
    num_buckets: int | None = None,
):
    """Corpus-level repeated-passage detection — the hash-window
    approximation of ExactSubstr dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): find every
    ``window``-word span that occurs in at least ``min_docs`` DISTINCT
    documents (boilerplate, licence blocks, templated headers).

    Shuffle-light: each batch hashes its windows in one flat pass and
    PRE-AGGREGATES to (hash, distinct-docs-in-batch, min-id-in-batch)
    triples via lexsort + reduceat — a document's windows live in one
    batch, so per-batch distinct-doc counts sum exactly. One bucketed
    groupby on the hash merges partials; only triples move, never text.
    Returns a Dataset ``(gram_hash, n_docs, min_doc_id)`` filtered to
    ``n_docs >= min_docs``.
    """
    from .aggregate import bucketed_aggregate

    def partials(t: pa.Table) -> pa.Table:
        s = pd.Series(t[text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h, doc_of = _window_hashes(s, window)
        if not len(h):
            return pa.table(
                {
                    "gram_hash": pa.array([], pa.uint64()),
                    "n_docs": pa.array([], pa.int64()),
                    "min_doc_id": pa.array([], pa.int64()),
                }
            )
        # unique (hash, doc) pairs, then distinct-doc count per hash
        order = np.lexsort((doc_of, h))
        hs, ds_ = h[order], doc_of[order]
        keep = np.ones(len(hs), bool)
        keep[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        hs, ds_ = hs[keep], ds_[keep]
        bounds = np.ones(len(hs), bool)
        bounds[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(bounds)
        counts = np.diff(np.append(starts, len(hs)))
        did = ids[ds_].astype(np.int64)
        min_ids = np.minimum.reduceat(did, starts)
        return pa.table(
            {
                "gram_hash": pa.array(hs[starts], pa.uint64()),
                "n_docs": pa.array(counts.astype(np.int64)),
                "min_doc_id": pa.array(min_ids),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow")
    merged = bucketed_aggregate(
        parts,
        ["gram_hash"],
        [("n_docs", "sum", "n_docs"), ("min_doc_id", "min", "min_doc_id")],
        num_buckets=num_buckets,
    )
    import pyarrow.compute as pc

    return merged.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], min_docs)),
        batch_format="pyarrow",
    )


class PassageDeduper:
    """The REMOVAL half of ExactSubstr/passage dedup (Lee et al. 2021
    §4 remove all but one occurrence of every duplicated span): cut
    every WORD covered by a corpus-duplicated ``window``-word span
    whose first owner is another document; the owner document keeps
    its copy (first-owner-wins, the same convention as
    ``LineDeduper``).

    Actor-pool stage holding the broadcast ``duplicate_passages``
    output (sorted gram hashes + owner ids). Per batch: ONE flat
    window-hash pass, a ``searchsorted`` membership test, and a
    difference-array cumsum to turn flagged window starts into
    per-word coverage — windows never cross document boundaries, so
    the cumsum cannot bleed between docs. Adds ``n_words``,
    ``n_removed_words``, ``n_dup_windows`` and the rebuilt
    ``clean_text`` (Arrow ``binary_join``, no per-row Python)."""

    def __init__(
        self,
        dup_hashes,
        dup_owners,
        window: int = 32,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        order = np.argsort(np.asarray(dup_hashes, dtype=np.uint64))
        self.hashes = np.asarray(dup_hashes, dtype=np.uint64)[order]
        self.owners = np.asarray(dup_owners, dtype=np.int64)[order]
        self.window = window
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        s = pd.Series(t[self.text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(s)
        h, doc_of, starts, flat_words, lens = _window_hashes_full(s, self.window)
        total = len(flat_words)
        covered = np.zeros(total, dtype=bool)
        n_flagged = np.zeros(n, dtype=np.int64)
        if len(self.hashes) and len(h):
            pos = np.clip(np.searchsorted(self.hashes, h), 0, len(self.hashes) - 1)
            dup = self.hashes[pos] == h
            rm = dup & (self.owners[pos] != ids[doc_of])
            if rm.any():
                st = starts[rm]
                diff = np.zeros(total + 1, dtype=np.int64)
                np.add.at(diff, st, 1)
                np.add.at(diff, st + self.window, -1)
                covered = np.cumsum(diff[:-1]) > 0
                n_flagged = np.bincount(doc_of[rm], minlength=n).astype(np.int64)
        kept = ~covered
        word_doc = np.repeat(np.arange(n, dtype=np.int64), lens)
        kept_counts = np.bincount(word_doc[kept], minlength=n).astype(np.int64)
        offs = pa.array(np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32))
        joined = pa.compute.binary_join(
            pa.ListArray.from_arrays(
                offs, pa.array(flat_words[kept], pa.string())
            ),
            " ",
        )
        t = t.append_column("n_words", pa.array(lens, pa.int64()))
        t = t.append_column(
            "n_removed_words", pa.array((lens - kept_counts).astype(np.int64))
        )
        t = t.append_column("n_dup_windows", pa.array(n_flagged, pa.int64()))
        return t.append_column("clean_text", joined)


def pack_sequences(
    ds,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    emit_tokens: bool = False,
    num_buckets: int = 64,
):
    """Concat-and-chunk sequence packing per group (see module doc).

    Returns a Dataset of chunk rows: ``(group, chunk_id, chunk_len,
    first_tok, last_tok[, tokens])``. Tokens here are whitespace words
    of ``text_col`` (swap in a tokenizer stage upstream to pack real
    BPE ids — the packing kernel is token-type-agnostic)."""
    from .aggregate import bucketed_group_apply

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for grp, sub in df.groupby(group_col, sort=False):
            sub = sub.sort_values(order_col, kind="stable")
            words = sub[text_col].fillna("").str.split(" ")
            flat = np.concatenate(
                [np.asarray(w, dtype=object) for w in words.to_numpy()]
            ) if len(sub) else np.array([], dtype=object)
            total = len(flat)
            n_chunks = (total + seq_len - 1) // seq_len
            starts = np.arange(n_chunks, dtype=np.int64) * seq_len
            ends = np.minimum(starts + seq_len, total)
            rec = {
                group_col: grp,
                "chunk_id": np.arange(n_chunks, dtype=np.int64),
                "chunk_len": (ends - starts).astype(np.int64),
                "first_tok": flat[starts] if n_chunks else np.array([], dtype=object),
                "last_tok": flat[ends - 1] if n_chunks else np.array([], dtype=object),
            }
            if emit_tokens:
                rec["tokens"] = [flat[a:b].tolist() for a, b in zip(starts, ends)]
            out.append(pd.DataFrame(rec))
        if out:
            return pd.concat(out, ignore_index=True)
        # TYPED empty table — an untyped empty DataFrame emits an
        # empty-schema block and Ray warns per RefBundle
        cols = {
            group_col: pa.array([], pa.string()),
            "chunk_id": pa.array([], pa.int64()),
            "chunk_len": pa.array([], pa.int64()),
            "first_tok": pa.array([], pa.string()),
            "last_tok": pa.array([], pa.string()),
        }
        if emit_tokens:
            cols["tokens"] = pa.array([], pa.list_(pa.string()))
        return pa.table(cols)

    return bucketed_group_apply(ds, group_col, per_bucket, num_buckets=num_buckets)


def pack_token_sequences(
    ds,
    group_col: str = "source",
    order_col: str = "doc_id",
    tokens_col: str = "tokens",
    seq_len: int = 2048,
    emit_tokens: bool = False,
    num_buckets: int = 64,
):
    """Token-array-native concat-and-chunk packing: the same semantics
    as ``pack_sequences`` but over a pre-tokenized ``list<int32>``
    column (the training-corpus input shape) instead of whitespace
    words — documents are concatenated per group in ``order_col``
    order and the flat int32 token stream is sliced into ``seq_len``
    chunks, final partial kept. One bucketed shuffle on the group key;
    per group one numpy concatenate + stride slice. Returns chunk rows
    ``(group, chunk_id, chunk_len, first_tok, last_tok[, tokens])``
    with int64 first/last token ids."""
    from .aggregate import bucketed_group_apply

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for grp, sub in df.groupby(group_col, sort=False):
            sub = sub.sort_values(order_col, kind="stable")
            arrs = [np.asarray(a, dtype=np.int64) for a in sub[tokens_col].to_numpy()]
            flat = np.concatenate(arrs) if arrs else np.empty(0, np.int64)
            total = len(flat)
            n_chunks = (total + seq_len - 1) // seq_len
            starts = np.arange(n_chunks, dtype=np.int64) * seq_len
            ends = np.minimum(starts + seq_len, total)
            rec = {
                group_col: grp,
                "chunk_id": np.arange(n_chunks, dtype=np.int64),
                "chunk_len": (ends - starts).astype(np.int64),
                "first_tok": flat[starts] if n_chunks else np.empty(0, np.int64),
                "last_tok": flat[ends - 1] if n_chunks else np.empty(0, np.int64),
            }
            if emit_tokens:
                rec["tokens"] = [flat[a:b].astype(np.int32).tolist() for a, b in zip(starts, ends)]
            out.append(pd.DataFrame(rec))
        if out:
            return pd.concat(out, ignore_index=True)
        cols = {
            group_col: pa.array([], pa.string()),
            "chunk_id": pa.array([], pa.int64()),
            "chunk_len": pa.array([], pa.int64()),
            "first_tok": pa.array([], pa.int64()),
            "last_tok": pa.array([], pa.int64()),
        }
        if emit_tokens:
            cols["tokens"] = pa.array([], pa.list_(pa.int32()))
        return pa.table(cols)

    return bucketed_group_apply(ds, group_col, per_bucket, num_buckets=num_buckets)


# --------------------------------------------------------------- C4 cleaning

# C4-style line filters (Raffel et al. 2020 §2.2, public rules): a line
# survives iff it ends in terminal punctuation, has >= min_words words,
# and contains none of the bad substrings; a document survives iff it
# retains >= min_lines lines. Substring checks are case-insensitive
# except the brace (C4 drops any page with "{" — here applied per line
# so the cleaner is also usable as a line filter).
C4_TERMINAL = ('.', '!', '?', '"')
C4_BAD_LOWER = ("javascript", "lorem ipsum")
C4_BAD_RAW = ("{",)


def c4_clean(
    batch: pa.Table,
    text_col: str = "text",
    out_col: str = "clean_text",
    min_words: int = 3,
    min_lines: int = 3,
) -> pa.Table:
    """C4-style line-level cleaning, fully vectorized: one explode of
    the newline-split lines (Arrow list offsets), pandas str kernels
    for every predicate over the FLAT line array, and an Arrow
    ``binary_join`` to reassemble kept lines per document — no per-row
    Python. Adds ``out_col`` (cleaned text), ``n_lines_kept`` and
    ``kept`` (doc-level gate)."""
    s = pd.Series(batch[text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
    n = len(s)
    lines = s.str.split("\n")
    counts = lines.str.len().to_numpy().astype(np.int64) if n else np.empty(0, np.int64)
    flat = pd.Series(
        np.concatenate(lines.to_numpy()) if n else np.empty(0, object), dtype=object
    )
    ok = flat.str.endswith(C4_TERMINAL).to_numpy(dtype=bool)
    # word count = runs of non-space chars (mirrors SQL list_filter of
    # non-empty tokens after a split on ' ')
    ok &= (flat.str.count(r"[^ ]+") >= min_words).to_numpy(dtype=bool)
    low = flat.str.lower()
    for bad in C4_BAD_LOWER:
        ok &= ~low.str.contains(bad, regex=False).to_numpy(dtype=bool)
    for bad in C4_BAD_RAW:
        ok &= ~flat.str.contains(bad, regex=False).to_numpy(dtype=bool)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    kept_counts = np.bincount(doc_idx[ok], minlength=n).astype(np.int64)
    kept_lines = pa.array(flat.to_numpy()[ok], pa.string())
    offs = pa.array(np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32))
    joined = pa.compute.binary_join(
        pa.ListArray.from_arrays(offs, kept_lines), "\n"
    )
    batch = batch.append_column(out_col, joined)
    batch = batch.append_column("n_lines_kept", pa.array(kept_counts, pa.int64()))
    return batch.append_column("kept", pa.array(kept_counts >= min_lines))


# ------------------------------------------------------- mixture resampling


def corpus_word_counts(ds, text_col: str = "text", num_buckets: int | None = None):
    """Corpus-wide word-frequency table as a Dataset ``(word, c)``.

    The unigram-count half of CCNet-style LM quality scoring (Wenzek
    et al. 2020 build KenLM perplexity buckets; the distributed shape
    is identical for any unigram model). Tokens are the NON-EMPTY
    whitespace words. Per-batch pre-aggregation (np.unique counts) so
    the shuffle moves (word, partial-count) pairs, never text; one
    bucketed hash groupby merges partials."""
    from .aggregate import bucketed_aggregate

    def partials(t: pa.Table) -> pa.Table:
        s = pd.Series(t[text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        words = s.str.split(" ")
        flat = (
            np.concatenate([np.asarray(w, dtype=object) for w in words.to_numpy()])
            if len(s)
            else np.array([], dtype=object)
        )
        flat = flat[flat != ""]
        uniq, counts = np.unique(flat.astype(str), return_counts=True)
        return pa.table(
            {
                "word": pa.array(uniq.astype(object), pa.string()),
                "c": pa.array(counts.astype(np.int64)),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow")
    return bucketed_aggregate(parts, ["word"], [("c", "sum", "c")], num_buckets=num_buckets)


def top_vocab(counts_ds, v: int) -> pd.DataFrame:
    """Top-``v`` vocabulary by (count DESC, word ASC) from a
    ``corpus_word_counts`` Dataset. Distributed top-k: each block
    contributes its own top-``v`` partial (a block's non-top-v words
    can never reach the global top-v), the driver merges only
    ``num_blocks × v`` rows — never the full vocabulary."""

    def block_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["c", "word"], ascending=[False, True], kind="stable"
        )
        return table_from_pandas(df.head(v))

    merged = counts_ds.map_batches(block_top, batch_format="pyarrow").to_pandas()
    return (
        merged.sort_values(["c", "word"], ascending=[False, True], kind="stable")
        .head(v)
        .reset_index(drop=True)
    )


class UnigramScorer:
    """CCNet-style unigram LM scoring as an actor-pool stage: the
    top-V vocabulary (word → corpus count) is broadcast once per actor
    (pass a ``ray.put`` handle; Ray de-references it in ``__init__``),
    each batch explodes its words and scores them with one
    ``searchsorted`` membership pass. Adds per-document columns:

    * ``n_in_vocab`` / ``n_oov`` — word OCCURRENCES in/out of vocab;
    * ``sum_freq`` — int64 sum of the corpus counts of in-vocab
      occurrences (an exactly-SQL-mirrorable integer quality signal);
    * ``mean_logprob`` — add-1-smoothed mean unigram log-probability
      (the float score CCNet thresholds into head/middle/tail).
    """

    def __init__(self, vocab_words, vocab_counts, total_words: int, text_col: str = "text"):
        order = np.argsort(np.asarray(vocab_words, dtype=object))
        self.words = np.asarray(vocab_words, dtype=object)[order]
        self.counts = np.asarray(vocab_counts, dtype=np.int64)[order]
        self.total = int(total_words)
        self.text_col = text_col
        v = len(self.words)
        self.logp = np.log((self.counts + 1.0) / (self.total + v + 1.0))
        self.logp_oov = float(np.log(1.0 / (self.total + v + 1.0)))

    def __call__(self, t: pa.Table) -> pa.Table:
        s = pd.Series(t[self.text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        words = s.str.split(" ")
        lens = words.str.len().to_numpy(dtype=np.int64) if len(s) else np.empty(0, np.int64)
        flat = (
            np.concatenate([np.asarray(w, dtype=object) for w in words.to_numpy()])
            if len(s)
            else np.array([], dtype=object)
        )
        nonempty = flat != ""
        doc_of = np.repeat(np.arange(len(s), dtype=np.int64), lens)[nonempty]
        flat = flat[nonempty]
        pos = np.searchsorted(self.words, flat)
        pos_c = np.clip(pos, 0, max(len(self.words) - 1, 0))
        hit = (
            (self.words[pos_c] == flat)
            if len(self.words)
            else np.zeros(len(flat), dtype=bool)
        )
        n = len(s)
        n_in = np.bincount(doc_of[hit], minlength=n).astype(np.int64)
        n_tok = np.bincount(doc_of, minlength=n).astype(np.int64)
        sum_freq = np.zeros(n, dtype=np.int64)
        np.add.at(sum_freq, doc_of[hit], self.counts[pos_c[hit]])
        logsum = np.full(n, 0.0)
        np.add.at(logsum, doc_of[hit], self.logp[pos_c[hit]])
        np.add.at(logsum, doc_of[~hit], self.logp_oov)
        mean_lp = logsum / np.maximum(n_tok, 1)
        for name, arr, typ in [
            ("n_in_vocab", n_in, pa.int64()),
            ("n_oov", (n_tok - n_in), pa.int64()),
            ("sum_freq", sum_freq, pa.int64()),
            ("mean_logprob", mean_lp, pa.float64()),
        ]:
            t = t.append_column(name, pa.array(arr, typ))
        return t


class VocabEncoder:
    """Vocabulary tokenizer: encode a text column into ``list<int32>``
    token ids — the bridge from raw documents to the pre-tokenized
    training-corpus shape. Token id = rank in the (count DESC, word
    ASC) vocabulary order (i.e. positional index of ``top_vocab``'s
    output); out-of-vocabulary words map to id ``V`` (one past the
    vocabulary), the classic UNK slot.

    Actor-pool stage: the vocab broadcasts once per actor; each batch
    runs one flat searchsorted pass over the exploded words and one
    Arrow ``ListArray.from_arrays`` to rebuild per-doc token lists.
    Adds ``tokens`` (list<int32>), ``n_tok`` and ``n_oov``."""

    def __init__(self, vocab_words, text_col: str = "text", out_col: str = "tokens"):
        words = np.asarray(vocab_words, dtype=object)
        order = np.argsort(words)
        self.sorted_words = words[order]
        self.ids = np.arange(len(words), dtype=np.int32)[order]
        self.oov_id = np.int32(len(words))
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        s = pd.Series(t[self.text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        words = s.str.split(" ")
        lens = words.str.len().to_numpy(dtype=np.int64) if len(s) else np.empty(0, np.int64)
        flat = (
            np.concatenate([np.asarray(w, dtype=object) for w in words.to_numpy()])
            if len(s) and lens.sum()
            else np.array([], dtype=object)
        )
        nonempty = flat != ""
        doc_of = np.repeat(np.arange(len(s), dtype=np.int64), lens)[nonempty]
        flat = flat[nonempty]
        if len(self.sorted_words) and len(flat):
            pos = np.clip(
                np.searchsorted(self.sorted_words, flat), 0, len(self.sorted_words) - 1
            )
            hit = self.sorted_words[pos] == flat
            toks = np.where(hit, self.ids[pos], self.oov_id).astype(np.int32)
        else:
            hit = np.zeros(len(flat), dtype=bool)
            toks = np.full(len(flat), self.oov_id, np.int32)
        n = len(s)
        n_tok = np.bincount(doc_of, minlength=n).astype(np.int32)
        n_oov = np.bincount(doc_of[~hit], minlength=n).astype(np.int32)
        offs = pa.array(np.concatenate([[0], np.cumsum(n_tok)]).astype(np.int32))
        t = t.append_column(
            self.out_col, pa.ListArray.from_arrays(offs, pa.array(toks, pa.int32()))
        )
        t = t.append_column("n_tok", pa.array(n_tok, pa.int32()))
        return t.append_column("n_oov", pa.array(n_oov, pa.int32()))


# ------------------------------------------------------------------ DSIR

DSIR_NUM_BUCKETS = 64


def _dsir_bigram_buckets(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Hashed word-bigram features per document (DSIR, Xie et al.
    2023: importance resampling on hashed n-gram counts). Returns
    ``(bucket int64, doc_index int64)`` for every consecutive
    non-empty-word pair. The hash is a cheap SQL-expressible mix of
    the two words' first code points and lengths so a DuckDB oracle
    can recompute buckets exactly; swap in ``hash_str_u64`` for
    production corpora (same downstream shape)."""
    words = s.str.split(" ")
    raw_lens = words.str.len().to_numpy(dtype=np.int64) if len(s) else np.empty(0, np.int64)
    if raw_lens.sum() == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    flat_all = np.concatenate([np.asarray(w, dtype=object) for w in words.to_numpy()])
    doc_all = np.repeat(np.arange(len(s), dtype=np.int64), raw_lens)
    keep = flat_all != ""  # drop empty tokens at the FLAT level (no per-row lambda)
    flat = flat_all[keep]
    doc_flat = doc_all[keep]
    # consecutive kept words within the same doc form the bigrams
    pair = doc_flat[1:] == doc_flat[:-1] if len(doc_flat) else np.empty(0, bool)
    if not pair.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    starts = np.flatnonzero(pair)
    doc_of = doc_flat[starts]
    first_cp = np.array(
        pd.Series(flat).str.slice(0, 1).tolist(), dtype="U1"
    ).view(np.uint32).astype(np.int64)
    wlen = pd.Series(flat).str.len().to_numpy(dtype=np.int64)
    b = (
        first_cp[starts] * 31
        + first_cp[starts + 1] * 7
        + wlen[starts] * 3
        + wlen[starts + 1]
    ) % DSIR_NUM_BUCKETS
    return b, doc_of


def dsir_bucket_counts(ds, text_col: str = "text", target_col: str = "is_target"):
    """Raw- and target-distribution hashed-bigram bucket counts over
    the corpus: per-batch ``bincount`` into ``DSIR_NUM_BUCKETS``
    buckets (so the shuffle moves two tiny count vectors per batch),
    one bucketed groupby to merge. ``target_col`` is a bool column
    marking the target-domain rows. Returns a small pandas frame
    ``(bucket, raw_c, tgt_c)`` for broadcasting to ``DsirScorer``."""
    from .aggregate import bucketed_aggregate

    def partials(t: pa.Table) -> pa.Table:
        s = pd.Series(t[text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        tgt = t[target_col].to_numpy(zero_copy_only=False).astype(bool)
        b, doc_of = _dsir_bigram_buckets(s)
        raw = np.bincount(b, minlength=DSIR_NUM_BUCKETS).astype(np.int64)
        tgt_c = np.bincount(
            b[tgt[doc_of]], minlength=DSIR_NUM_BUCKETS
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(np.arange(DSIR_NUM_BUCKETS, dtype=np.int64)),
                "raw_c": pa.array(raw),
                "tgt_c": pa.array(tgt_c),
            }
        )

    merged = bucketed_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["bucket"],
        [("raw_c", "sum", "raw_c"), ("tgt_c", "sum", "tgt_c")],
    ).to_pandas()
    return merged.sort_values("bucket").reset_index(drop=True)


class DsirScorer:
    """DSIR importance scoring as an actor-pool stage: the two bucket
    count vectors are broadcast once per actor; each batch runs one
    flat bigram-bucket pass and two per-doc scatter-adds. Adds:

    * ``dsir_score`` — int64 Σ over the doc's bigrams of
      ``tgt_c[b]·N_raw − raw_c[b]·N_tgt`` (the sign of the
      probability-difference per bucket; exact integer arithmetic so
      an SQL oracle matches bit-for-bit — fine while
      ``count × corpus_total`` fits int64, i.e. test scale);
    * ``dsir_weight`` — the float add-1-smoothed log importance
      weight ``Σ log(p̂_tgt(b)/p̂_raw(b))`` the paper resamples with;
    * ``dsir_keep`` — ``dsir_score > 0`` (target-leaning).
    """

    def __init__(self, raw_c, tgt_c, text_col: str = "text"):
        self.raw_c = np.asarray(raw_c, dtype=np.int64)
        self.tgt_c = np.asarray(tgt_c, dtype=np.int64)
        self.n_raw = int(self.raw_c.sum())
        self.n_tgt = int(self.tgt_c.sum())
        self.text_col = text_col
        b = DSIR_NUM_BUCKETS
        self.int_val = self.tgt_c * self.n_raw - self.raw_c * self.n_tgt
        self.log_val = np.log((self.tgt_c + 1.0) / (self.n_tgt + b)) - np.log(
            (self.raw_c + 1.0) / (self.n_raw + b)
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        s = pd.Series(t[self.text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        b, doc_of = _dsir_bigram_buckets(s)
        n = len(s)
        score = np.zeros(n, dtype=np.int64)
        np.add.at(score, doc_of, self.int_val[b])
        weight = np.zeros(n, dtype=np.float64)
        np.add.at(weight, doc_of, self.log_val[b])
        n_big = np.bincount(doc_of, minlength=n).astype(np.int64)
        t = t.append_column("dsir_score", pa.array(score, pa.int64()))
        t = t.append_column("dsir_weight", pa.array(weight, pa.float64()))
        t = t.append_column("n_bigrams", pa.array(n_big, pa.int64()))
        return t.append_column("dsir_keep", pa.array(score > 0))


# ------------------------------------------------------- exact line dedup


def duplicate_lines(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    num_buckets: int | None = None,
):
    """Corpus-wide duplicated-LINE table — the discovery half of
    RefinedWeb/MassiveText exact line dedup (Penedo et al. 2023 §3.3
    remove lines duplicated across documents; boilerplate headers,
    nav bars, licence lines). Same shuffle-light shape as
    ``duplicate_passages``: per batch, hash the newline-split lines
    and pre-aggregate to (hash, distinct-docs, min-doc) triples; ONE
    bucketed hash groupby merges partials. Returns a Dataset
    ``(line_hash uint64, n_docs, min_doc_id)`` of lines seen in
    ``>= min_docs`` distinct documents — ``min_doc_id`` is the
    occurrence that survives dedup (first-owner-wins)."""
    from .._util import hash_str_u64
    from .aggregate import bucketed_aggregate
    import pyarrow.compute as pc

    def partials(t: pa.Table) -> pa.Table:
        s = pd.Series(t[text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lines = s.str.split("\n")
        counts = lines.str.len().to_numpy(dtype=np.int64) if len(s) else np.empty(0, np.int64)
        if counts.sum() == 0:
            return pa.table(
                {
                    "line_hash": pa.array([], pa.uint64()),
                    "n_docs": pa.array([], pa.int64()),
                    "min_doc_id": pa.array([], pa.int64()),
                }
            )
        flat = np.concatenate(lines.to_numpy())
        doc_of = np.repeat(np.arange(len(s), dtype=np.int64), counts)
        h = hash_str_u64(flat.astype(object))
        order = np.lexsort((doc_of, h))
        hs, ds_ = h[order], doc_of[order]
        keep = np.ones(len(hs), bool)
        keep[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        hs, ds_ = hs[keep], ds_[keep]
        bounds = np.ones(len(hs), bool)
        bounds[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(bounds)
        return pa.table(
            {
                "line_hash": pa.array(hs[starts], pa.uint64()),
                "n_docs": pa.array(np.diff(np.append(starts, len(hs))).astype(np.int64)),
                "min_doc_id": pa.array(np.minimum.reduceat(ids[ds_], starts)),
            }
        )

    merged = bucketed_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["line_hash"],
        [("n_docs", "sum", "n_docs"), ("min_doc_id", "min", "min_doc_id")],
        num_buckets=num_buckets,
    )
    return merged.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], min_docs)),
        batch_format="pyarrow",
    )


class LineDeduper:
    """The removal half of exact line dedup: an actor-pool stage
    holding the broadcast duplicated-line table (sorted hashes +
    first-owner doc ids — pass ``ray.put`` handles). A line occurrence
    is removed iff its line is corpus-duplicated AND this document is
    not the first owner; the owner keeps every occurrence. Adds
    ``n_lines``, ``n_removed`` and the reassembled ``clean_text``
    (Arrow ``binary_join``, no per-row Python).

    Partitioning note: broadcast is right while the duplicated-line
    table fits a worker heap (it holds only lines seen in ≥2 docs).
    For corpora where it does not, run the same decision as a
    bucketed join of exploded (line_hash, doc_id, line_idx) against
    ``duplicate_lines`` output on the hash — the stage's semantics
    are unchanged."""

    def __init__(self, dup_hashes, dup_owners, text_col: str = "text", id_col: str = "doc_id"):
        order = np.argsort(np.asarray(dup_hashes, dtype=np.uint64))
        self.hashes = np.asarray(dup_hashes, dtype=np.uint64)[order]
        self.owners = np.asarray(dup_owners, dtype=np.int64)[order]
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from .._util import hash_str_u64

        s = pd.Series(t[self.text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(s)
        lines = s.str.split("\n")
        counts = lines.str.len().to_numpy(dtype=np.int64) if n else np.empty(0, np.int64)
        flat = (
            np.concatenate(lines.to_numpy()) if counts.sum() else np.empty(0, object)
        )
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        if len(self.hashes) and len(flat):
            h = hash_str_u64(flat.astype(object))
            pos = np.clip(np.searchsorted(self.hashes, h), 0, len(self.hashes) - 1)
            dup = self.hashes[pos] == h
            removed = dup & (self.owners[pos] != ids[doc_of])
        else:
            removed = np.zeros(len(flat), dtype=bool)
        kept = ~removed
        kept_counts = np.bincount(doc_of[kept], minlength=n).astype(np.int64)
        offs = pa.array(np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32))
        joined = pa.compute.binary_join(
            pa.ListArray.from_arrays(offs, pa.array(flat[kept], pa.string())), "\n"
        )
        t = t.append_column("n_lines", pa.array(counts, pa.int64()))
        t = t.append_column(
            "n_removed", pa.array(np.bincount(doc_of[removed], minlength=n).astype(np.int64))
        )
        return t.append_column("clean_text", joined)


def line_dedup_joined(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    num_buckets: int = 64,
):
    """Exact line dedup WITHOUT the broadcast: the scale path for
    corpora whose duplicated-line table outgrows a worker heap.

    Plan: explode docs to (doc_id, line_idx, line, line_hash) rows,
    bucketed hash join against the ``duplicate_lines`` table on the
    hash (the dup table is shuffled, never collected), decide
    first-owner-wins removal per occurrence, then ONE bucketed
    group-apply on the doc id reassembles surviving lines in order.
    Line text moves through two shuffles — that is the honest cost of
    join-based dedup; prefer the broadcast ``LineDeduper`` whenever
    the dup table fits in memory. Returns ``(doc_id, n_lines,
    n_removed, clean_text)`` — identical decisions to LineDeduper."""
    from .._util import hash_str_u64
    from .aggregate import bucketed_group_apply
    from .join import bucketed_hash_join

    dup = duplicate_lines(
        ds, text_col=text_col, id_col=id_col, min_docs=min_docs
    )

    def explode(t: pa.Table) -> pa.Table:
        s = pd.Series(t[text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lines = s.str.split("\n")
        counts = lines.str.len().to_numpy(dtype=np.int64) if len(s) else np.empty(0, np.int64)
        flat = (
            np.concatenate(lines.to_numpy()) if counts.sum() else np.empty(0, object)
        )
        doc_of = np.repeat(np.arange(len(s), dtype=np.int64), counts)
        line_idx = (
            np.concatenate([np.arange(k, dtype=np.int64) for k in counts])
            if counts.sum()
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                id_col: pa.array(ids[doc_of]),
                "line_idx": pa.array(line_idx),
                "line": pa.array(flat, pa.string()),
                "line_hash": pa.array(hash_str_u64(flat.astype(object)), pa.uint64()),
            }
        )

    lines_ds = ds.map_batches(explode, batch_format="pyarrow")
    joined = bucketed_hash_join(
        lines_ds,
        dup.select_columns(["line_hash", "min_doc_id"]),
        "line_hash",
        how="left",
        num_buckets=num_buckets,
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "line_idx"], kind="stable").reset_index(drop=True)
        owner = df["min_doc_id"]
        rm = (owner.notna() & (owner.fillna(-1).astype(np.int64) != df[id_col])).to_numpy(
            dtype=bool
        )
        ids = df[id_col].to_numpy(dtype=np.int64)
        # ids are sorted, so per-doc segments are contiguous
        bounds = np.ones(len(ids), dtype=bool)
        bounds[1:] = ids[1:] != ids[:-1]
        seg_starts = np.flatnonzero(bounds)
        seg_ids = ids[seg_starts]
        seg_sizes = np.diff(np.append(seg_starts, len(ids)))
        seg_of = np.repeat(np.arange(len(seg_starts)), seg_sizes)
        n_removed = np.zeros(len(seg_starts), np.int64)
        np.add.at(n_removed, seg_of, rm.astype(np.int64))
        kept = ~rm
        kept_counts = np.zeros(len(seg_starts), np.int64)
        np.add.at(kept_counts, seg_of, kept.astype(np.int64))
        offs = pa.array(np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32))
        joined_txt = pa.compute.binary_join(
            pa.ListArray.from_arrays(
                offs, pa.array(df["line"].to_numpy()[kept], pa.string())
            ),
            "\n",
        ).to_pandas()
        return pd.DataFrame(
            {
                id_col: seg_ids,
                "n_lines": seg_sizes.astype(np.int64),
                "n_removed": n_removed,
                "clean_text": joined_txt.to_numpy(dtype=object),
            }
        )

    return bucketed_group_apply(joined, id_col, per_bucket, num_buckets=num_buckets)


def resample_mixture(
    ds,
    weights: dict[str, float],
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    mod: int = 1000,
):
    """Deterministic epoch-style domain-mixture resampling (the
    up/down-sampling step of public LLM data recipes — e.g. The Pile's
    per-set epochs, LLaMA's sampling proportions): a row with weight
    ``w = weights[source]`` (missing source → 1.0) is emitted
    ``floor(w)`` times, plus one more iff ``id % mod < round(mod *
    frac(w))`` — so expected multiplicity equals ``w`` with a
    deterministic, SQL-mirrorable residual instead of RNG. Weight 0
    drops a source; fractional weight < 1 downsamples. Stateless
    ``map_batches`` (np.repeat on row indices, Arrow ``take``) — no
    shuffle, order preserved within blocks."""

    def rep(t: pa.Table) -> pa.Table:
        src = pd.Series(t[source_col].to_numpy(zero_copy_only=False), dtype=object)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = src.map(weights).astype(float).fillna(1.0).to_numpy()
        fl = np.floor(w)
        extra = (ids % mod) < np.round(mod * (w - fl))
        reps = (fl + extra).astype(np.int64)
        return t.take(pa.array(np.repeat(np.arange(len(t), dtype=np.int64), reps)))

    return ds.map_batches(rep, batch_format="pyarrow")


# --- deterministic held-out split + per-domain caps -----------------
#
# Two standard corpus-assembly steps public pipelines apply after
# filtering/dedup: (1) carving a reproducible train/valid/test split,
# and (2) capping each domain's contribution (RefinedWeb/LLaMA-style
# per-source budgets). Both use the same multiplicative integer hash
# so they are exactly SQL-mirrorable (all arithmetic stays < 2^63:
# the id is reduced mod SPLIT_MOD < 2^30 before the multiply).

SPLIT_MOD = 1_000_000_007
SPLIT_MULT = 2_654_435_761  # Knuth's multiplicative constant


def quality_buckets(ds, score_col: str, *, n_buckets: int = 3, labels=None, k: int = 256):
    """CCNet-style quality bucketing (Wenzek et al. 2020 split the
    corpus into head/middle/tail by LM perplexity terciles): global
    APPROXIMATE quantile boundaries from ONE mergeable-sketch pass —
    never a global sort, the classic scale trap for this op — then a
    stateless labeling pass (``searchsorted`` against the broadcast
    boundary array). Buckets ascend with score: for perplexity
    (lower = better) bucket 0 is CCNet's 'head'; for a
    higher-is-better score pass reversed ``labels``. Returns
    ``(labeled_ds, boundaries)`` — the Dataset gains ``bucket`` (int8)
    and ``bucket_label``. A value equal to a boundary belongs to the
    LOWER bucket (P(X <= q_{1/3}) >= 1/3, the usual quantile closure).
    Boundary rank error follows the sketch
    (≈ ≤5% CDF rank at k=256), so each bucket's mass is within ~2×
    that of 1/n_buckets."""
    from .sketch import quantiles

    qs = tuple(i / n_buckets for i in range(1, n_buckets))
    bounds_map = quantiles(ds, score_col, qs=qs, k=k)
    bounds = np.array([bounds_map[q] for q in qs], np.float64)
    lab_arr = np.asarray(
        list(labels) if labels is not None else [f"b{i}" for i in range(n_buckets)],
        dtype=object,
    )
    if len(lab_arr) != n_buckets:
        raise ValueError(f"need {n_buckets} labels, got {len(lab_arr)}")

    def label(t: pa.Table) -> pa.Table:
        v = t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(bounds, v, side="left").astype(np.int8)
        t = t.append_column("bucket", pa.array(b, pa.int8()))
        return t.append_column("bucket_label", pa.array(lab_arr[b], pa.string()))

    return ds.map_batches(label, batch_format="pyarrow"), bounds


def split_hash(ids: np.ndarray) -> np.ndarray:
    """((id % p) * K) % p over int64 — deterministic, overflow-free in
    both numpy int64 and SQL BIGINT (max intermediate ~2.65e18)."""
    return ((ids.astype(np.int64) % SPLIT_MOD) * SPLIT_MULT) % SPLIT_MOD


def assign_split(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    out_col: str = "split",
    test_frac: float = 0.05,
    valid_frac: float = 0.05,
) -> pa.Table:
    """Deterministic train/valid/test assignment by integer-hash rank:
    ``r = split_hash(id) % 10000``; the first ``test_frac`` slice of
    rank space is 'test', the next ``valid_frac`` 'valid', the rest
    'train'. Stateless and shuffle-free — every worker labels its rows
    identically at any cluster size, and the split is stable across
    reruns / added data (a doc's label never depends on other rows)."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    r = split_hash(ids) % 10_000
    test_cut = int(round(test_frac * 10_000))
    valid_cut = test_cut + int(round(valid_frac * 10_000))
    lab = np.where(r < test_cut, "test", np.where(r < valid_cut, "valid", "train"))
    return batch.append_column(out_col, pa.array(lab, pa.string()))


def stratified_sample(
    ds,
    n: int,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
):
    """Deterministic per-group cap: keep the ``n`` rows of each group
    with the smallest ``(split_hash(id), id)`` — a uniform-without-
    replacement sample that any SQL engine reproduces with ROW_NUMBER
    over the same hash order.

    Distributed as partial-top-n: every batch keeps at most ``n``
    candidate rows per group it sees (vectorized lexsort + within-
    group rank, no Python per group), so the single shuffle moves
    ≤ n × groups × batches candidate (group, id, hash) triples — never
    the corpus — and one bucketed group-apply takes the global head.
    Returns a Dataset of ``(group_col, id_col, rank)`` (rank 0-based
    in hash order); join/broadcast against the corpus to materialize
    sampled rows. Partitioning assumption: n × (groups in one bucket)
    rows fit one task."""
    from .aggregate import bucketed_group_apply

    def partials(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = split_hash(ids)
        # lexsort: primary group, then hash, then id
        order = np.lexsort((ids, h, g))
        gs = g[order]
        new = np.empty(len(gs), dtype=bool)
        if len(gs):
            new[0] = True
            new[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(new)
        rank = np.arange(len(gs), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(gs)))
        )
        keep = order[rank < n]
        return pa.table(
            {
                group_col: pa.array(g[keep]),
                id_col: pa.array(ids[keep]),
                "_h": pa.array(h[keep]),
            }
        )

    cand = ds.map_batches(partials, batch_format="pyarrow")

    def head_n(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_h", id_col], kind="mergesort")
        out = df.groupby(group_col, sort=False).head(n).copy()
        out["rank"] = out.groupby(group_col, sort=False).cumcount().astype(np.int64)
        return out[[group_col, id_col, "rank"]]

    kwargs = {"num_buckets": num_buckets} if num_buckets else {}
    return bucketed_group_apply(cand, group_col, head_n, **kwargs)


def _flat_tokens(t: pa.Table, tokens_col: str):
    """Zero-copy flat view of a list<int32> column: (values, offsets).
    Also unwraps Ray's variable-shaped tensor extension (whose storage
    holds the same list child) so in-memory test datasets behave like
    parquet-read ones."""
    la = t[tokens_col]
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    if not (pa.types.is_list(la.type) or pa.types.is_large_list(la.type)):
        st = getattr(la, "storage", None)
        if st is not None:
            la = st.field(0) if pa.types.is_struct(st.type) else st
    offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = la.values.to_numpy(zero_copy_only=False).astype(np.int64)
    # a sliced ListArray's offsets don't start at 0 — rebase
    return vals[offs[0] : offs[-1]], offs - offs[0]


def token_corpus_stats(
    ds,
    *,
    tokens_col: str = "tokens",
    group_col: str = "source",
    vocab_size: int,
):
    """Token-native corpus analytics over the pre-tokenized input shape
    (``tokens: list<int32>``): per group — document count, token count,
    max token id, DISTINCT token ids, and DISTINCT adjacent-token
    bigrams (bigram key = ``a * vocab_size + b``, exact for ids <
    vocab_size).

    Every kernel runs on the flat Arrow list values/offsets buffers
    (zero-copy, no per-doc Python). Shuffle discipline: sums/max move
    as per-batch partials; distincts move as per-batch PRE-DEDUPED
    (group, key) pairs through one bucketed distinct each — bounded by
    true cardinality, never the token stream. Distincts are exact;
    at extreme cardinalities swap the pair legs for the mergeable HLL
    in ``stages/sketch``. Returns a small pandas frame."""
    from .aggregate import bucketed_aggregate

    def sums(t: pa.Table) -> pa.Table:
        vals, offs = _flat_tokens(t, tokens_col)
        src = pd.Series(t[group_col].to_numpy(zero_copy_only=False), dtype=object)
        codes, uniq = pd.factorize(src)
        k = len(uniq)
        lens = np.diff(offs)
        n_docs = np.bincount(codes, minlength=k).astype(np.int64)
        n_tokens = np.bincount(codes, weights=lens, minlength=k).astype(np.int64)
        code_flat = codes[np.repeat(np.arange(len(src), dtype=np.int64), lens)]
        max_tok = (
            pd.Series(vals)
            .groupby(code_flat)
            .max()
            .reindex(range(k), fill_value=-1)
            .to_numpy()
            .astype(np.int64)
        )
        return pa.table(
            {
                group_col: pa.array(uniq.to_numpy(dtype=object), pa.string()),
                "n_docs": pa.array(n_docs),
                "n_tokens": pa.array(n_tokens),
                "max_tok": pa.array(max_tok),
            }
        )

    base = bucketed_aggregate(
        ds.map_batches(sums, batch_format="pyarrow"),
        [group_col],
        [
            ("n_docs", "sum", "n_docs"),
            ("n_tokens", "sum", "n_tokens"),
            ("max_tok", "max", "max_tok"),
        ],
    ).to_pandas()

    def pair_emitter(bigram: bool):
        def pairs(t: pa.Table) -> pa.Table:
            vals, offs = _flat_tokens(t, tokens_col)
            src = pd.Series(
                t[group_col].to_numpy(zero_copy_only=False), dtype=object
            )
            codes, uniq = pd.factorize(src)
            lens = np.diff(offs)
            doc_of = np.repeat(np.arange(len(src), dtype=np.int64), lens)
            if bigram:
                same = doc_of[1:] == doc_of[:-1] if len(doc_of) else np.empty(0, bool)
                key = vals[:-1][same] * np.int64(vocab_size) + vals[1:][same]
                code_of = codes[doc_of[:-1][same]]
            else:
                key = vals
                code_of = codes[doc_of]
            # pre-dedup inside the batch before anything shuffles
            # (bigram keys < vocab_size² < 2^33 for GPT-2-sized vocabs)
            u = np.unique((code_of.astype(np.int64) << np.int64(33)) | key)
            return pa.table(
                {
                    group_col: pa.array(
                        uniq.to_numpy(dtype=object)[(u >> 33).astype(np.int64)],
                        pa.string(),
                    ),
                    "key": pa.array(u & np.int64((1 << 33) - 1)),
                }
            )

        return pairs

    def distinct_count(bigram: bool, out: str) -> pd.DataFrame:
        uniq = bucketed_aggregate(
            ds.map_batches(pair_emitter(bigram), batch_format="pyarrow"),
            [group_col, "key"],
            [],
        )
        return (
            bucketed_aggregate(uniq, [group_col], [("key", "count", out)])
            .to_pandas()
            .set_index(group_col)[out]
        )

    base = base.set_index(group_col)
    base["n_distinct_tokens"] = distinct_count(False, "n_distinct_tokens")
    base["n_distinct_bigrams"] = distinct_count(True, "n_distinct_bigrams")
    return base.reset_index()


# --- bigram LM quality scoring (the CCNet n-gram upgrade) ------------

_PAIR_SEP = "\x1f"  # NUL-safe composite-key joiner (engine convention)


def _adjacent_pairs(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Flat '<w1>\\x1f<w2>' strings for every adjacent non-empty word
    pair, plus each pair's doc index. Empty tokens are dropped at the
    flat level BEFORE pairing (same rule as the DSIR bigrams and the
    SQL list_filter mirror)."""
    words = s.str.split(" ")
    lens = words.str.len().to_numpy(dtype=np.int64) if len(s) else np.empty(0, np.int64)
    if lens.sum() == 0:
        return np.empty(0, object), np.empty(0, np.int64)
    flat_all = np.concatenate([np.asarray(w, dtype=object) for w in words.to_numpy()])
    doc_all = np.repeat(np.arange(len(s), dtype=np.int64), lens)
    keep = flat_all != ""
    flat, doc_flat = flat_all[keep], doc_all[keep]
    same = doc_flat[1:] == doc_flat[:-1] if len(doc_flat) else np.empty(0, bool)
    if not same.any():
        return np.empty(0, object), np.empty(0, np.int64)
    starts = np.flatnonzero(same)
    pairs = (
        pd.Series(flat[starts]).astype(str)
        + _PAIR_SEP
        + pd.Series(flat[starts + 1]).astype(str)
    ).to_numpy(dtype=object)
    return pairs, doc_flat[starts]


def corpus_bigram_counts(ds, text_col: str = "text", num_buckets: int | None = None):
    """Corpus-wide adjacent-word-bigram frequency table as a Dataset
    ``(pair, c)`` with pair = ``w1\\x1fw2``. Same shuffle discipline as
    ``corpus_word_counts``: per-batch ``np.unique`` pre-aggregation so
    (pair, partial-count) rows move, never text; one bucketed hash
    groupby merges."""
    from .aggregate import bucketed_aggregate

    def partials(t: pa.Table) -> pa.Table:
        s = pd.Series(t[text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        pairs, _ = _adjacent_pairs(s)
        uniq, counts = np.unique(pairs.astype(str), return_counts=True)
        return pa.table(
            {
                "pair": pa.array(uniq.astype(object), pa.string()),
                "c": pa.array(counts.astype(np.int64)),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow")
    return bucketed_aggregate(parts, ["pair"], [("c", "sum", "c")], num_buckets=num_buckets)


def top_bigrams(counts_ds, b: int) -> pd.DataFrame:
    """Top-``b`` bigrams by (count DESC, pair ASC) — distributed
    partial top-k exactly like ``top_vocab`` (each block's non-top-b
    pairs can never reach the global top-b)."""

    def block_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["c", "pair"], ascending=[False, True], kind="stable"
        )
        return table_from_pandas(df.head(b))

    merged = counts_ds.map_batches(block_top, batch_format="pyarrow").to_pandas()
    return (
        merged.sort_values(["c", "pair"], ascending=[False, True], kind="stable")
        .head(b)
        .reset_index(drop=True)
    )


class BigramScorer:
    """Interpolated bigram LM scoring as an actor-pool stage — the
    bigram upgrade of ``UnigramScorer`` (CCNet uses a KenLM n-gram
    model; this is the same shape with an in-table bigram MLE
    interpolated against the add-1 unigram):

    ``p(w2|w1) = lam * c(w1,w2)/c(w1) + (1-lam) * p_uni(w2)`` with the
    bigram term 0 when the pair (or w1) is outside the broadcast
    tables. Per-document outputs: ``n_pairs`` (adjacent non-empty word
    pairs), ``n_big_hits`` / ``sum_big_freq`` (occurrences and summed
    corpus counts of pairs found in the top-B table — exact integer
    contracts), ``mean_bigram_logprob`` (the float score). Both tables
    broadcast once per actor (pass ray.put handles)."""

    def __init__(
        self,
        bigram_pairs,
        bigram_counts,
        vocab_words,
        vocab_counts,
        total_words: int,
        *,
        lam: float = 0.7,
        text_col: str = "text",
    ):
        order = np.argsort(np.asarray(bigram_pairs, dtype=object))
        self.pairs = np.asarray(bigram_pairs, dtype=object)[order]
        self.pair_c = np.asarray(bigram_counts, dtype=np.int64)[order]
        worder = np.argsort(np.asarray(vocab_words, dtype=object))
        self.words = np.asarray(vocab_words, dtype=object)[worder]
        self.word_c = np.asarray(vocab_counts, dtype=np.int64)[worder]
        self.total = int(total_words)
        self.lam = float(lam)
        self.text_col = text_col

    def _lookup(self, table: np.ndarray, values: np.ndarray, keys: np.ndarray):
        pos = np.searchsorted(table, keys)
        pos_c = np.clip(pos, 0, max(len(table) - 1, 0))
        hit = (table[pos_c] == keys) if len(table) else np.zeros(len(keys), bool)
        out = np.zeros(len(keys), np.int64)
        out[hit] = values[pos_c[hit]]
        return out, hit

    def __call__(self, t: pa.Table) -> pa.Table:
        s = pd.Series(t[self.text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        pairs, doc_of = _adjacent_pairs(s)
        n = len(s)
        bc, bhit = self._lookup(self.pairs, self.pair_c, pairs)
        w1 = (
            pd.Series(pairs).str.split(_PAIR_SEP).str[0].to_numpy(dtype=object)
            if len(pairs)
            else np.empty(0, object)
        )
        w2 = (
            pd.Series(pairs).str.split(_PAIR_SEP).str[1].to_numpy(dtype=object)
            if len(pairs)
            else np.empty(0, object)
        )
        c1, h1 = self._lookup(self.words, self.word_c, w1)
        c2, _ = self._lookup(self.words, self.word_c, w2)
        v = len(self.words)
        p_uni = (c2 + 1.0) / (self.total + v + 1.0)
        p_bi = np.where(bhit & h1 & (c1 > 0), bc / np.maximum(c1, 1), 0.0)
        p = self.lam * p_bi + (1.0 - self.lam) * p_uni
        lp = np.log(np.maximum(p, 1e-300))
        n_pairs = np.bincount(doc_of, minlength=n).astype(np.int64)
        n_hits = np.bincount(doc_of[bhit], minlength=n).astype(np.int64)
        sum_freq = np.zeros(n, np.int64)
        np.add.at(sum_freq, doc_of[bhit], bc[bhit])
        logsum = np.zeros(n)
        np.add.at(logsum, doc_of, lp)
        mean_lp = logsum / np.maximum(n_pairs, 1)
        for name, arr, typ in [
            ("n_pairs", n_pairs, pa.int64()),
            ("n_big_hits", n_hits, pa.int64()),
            ("sum_big_freq", sum_freq, pa.int64()),
            ("mean_bigram_logprob", mean_lp, pa.float64()),
        ]:
            t = t.append_column(name, pa.array(arr, typ))
        return t


def token_repetition_stats(
    ds,
    *,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    vocab_size: int,
):
    """Gopher-style repetition signals computed TOKEN-natively over the
    pre-tokenized ``list<int32>`` corpus shape (Rae et al. 2021 §A1.1
    measure repetition on words/lines; on a tokenized corpus the same
    signals come straight off the token stream, no detokenization):
    per doc — token count, distinct token ids, adjacent-bigram count,
    distinct adjacent bigrams (key ``a * vocab_size + b``, exact for
    ids < vocab_size), and the longest run of one repeated token id
    (``max_run``; catches pathological pad/newline floods).

    Purely row-local → one ``map_batches`` pass on the flat Arrow list
    buffers; distinct-per-doc via one lexsort over (doc, value) pairs
    and run detection via change-point indices — no per-doc Python.
    Returns a Dataset with the five stat columns appended."""

    def stats(t: pa.Table) -> pa.Table:
        vals, offs = _flat_tokens(t, tokens_col)
        lens = np.diff(offs)
        n = len(lens)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        # distinct token ids per doc: sort (doc, val) pairs, count group
        # changes per doc
        if len(vals):
            order = np.lexsort((vals, doc_of))
            dv, vv = doc_of[order], vals[order]
            new = np.ones(len(vv), bool)
            new[1:] = (dv[1:] != dv[:-1]) | (vv[1:] != vv[:-1])
            n_distinct = np.bincount(dv[new], minlength=n).astype(np.int64)
        else:
            n_distinct = np.zeros(n, np.int64)
        # adjacent bigrams: positions whose successor is in the same doc
        last_pos = offs[1:] - 1  # last flat index of each non-empty doc
        valid = np.ones(len(vals), bool)
        valid[last_pos[lens > 0]] = False
        if valid.any():
            # pair (i, i+1) is in-doc when position i is not a doc-last
            pair_mask = valid[:-1] if len(vals) > 1 else np.empty(0, bool)
            keys = vals[:-1][pair_mask] * vocab_size + vals[1:][pair_mask]
            pdoc = doc_of[:-1][pair_mask]
            order = np.lexsort((keys, pdoc))
            dk, kk = pdoc[order], keys[order]
            new = np.ones(len(kk), bool)
            new[1:] = (dk[1:] != dk[:-1]) | (kk[1:] != kk[:-1])
            n_dis_big = np.bincount(dk[new], minlength=n).astype(np.int64)
        else:
            n_dis_big = np.zeros(n, np.int64)
        n_bigrams = np.maximum(lens - 1, 0)
        # longest run of a single token id per doc: change points at doc
        # boundaries or value changes → run lengths via diff of starts
        if len(vals):
            change = np.ones(len(vals), bool)
            change[1:] = (vals[1:] != vals[:-1]) | (doc_of[1:] != doc_of[:-1])
            starts = np.flatnonzero(change)
            run_len = np.diff(np.append(starts, len(vals)))
            run_doc = doc_of[starts]
            # runs are doc-contiguous → reduceat over per-doc run spans
            first_run = np.ones(len(starts), bool)
            first_run[1:] = run_doc[1:] != run_doc[:-1]
            span_starts = np.flatnonzero(first_run)
            max_per_present = np.maximum.reduceat(run_len, span_starts)
            max_run = np.zeros(n, np.int64)
            max_run[run_doc[span_starts]] = max_per_present
        else:
            max_run = np.zeros(n, np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tok": pa.array(lens),
                "n_distinct_tok": pa.array(n_distinct),
                "n_bigrams": pa.array(n_bigrams),
                "n_distinct_bigrams": pa.array(n_dis_big),
                "max_run": pa.array(max_run),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def build_eval_token_grams(token_lists, n: int = 8) -> np.ndarray:
    """Token-native analogue of ``build_eval_grams``: hash every
    n-TOKEN window of the held-out token sequences with the SAME
    polynomial window kernel the train-side scan uses
    (``stages/dedup._token_window_hashes_flat``), so membership is
    exact by construction. Sequences shorter than ``n`` contribute
    nothing. Returns a sorted unique uint64 array to broadcast with
    ``ray.put``."""
    from .dedup import _token_window_hashes_flat  # lazy: avoid cycle

    keep = [np.asarray(t, dtype=np.int32) for t in token_lists
            if len(t) >= n]
    if not keep:
        return np.array([], dtype=np.uint64)
    offs = np.zeros(len(keep) + 1, np.int32)
    np.cumsum([len(t) for t in keep], out=offs[1:])
    tbl = pa.table(
        {
            "tokens": pa.ListArray.from_arrays(
                pa.array(offs), pa.array(np.concatenate(keep), pa.int32())
            )
        }
    )
    h, _ = _token_window_hashes_flat(tbl, "tokens", n)
    return np.sort(np.unique(h))


class TokenDecontaminator:
    """GPT-3-style test-set decontamination over the PRE-TOKENIZED
    corpus shape (Brown et al. 2020 appendix C, on token ids instead
    of words): flag a training document when ANY of its n-token
    windows appears in the held-out set's window table.

    Actor-pool stage: the sorted uint64 window-hash table is held once
    per actor (pass a ``ray.put`` handle); ``__call__`` runs one
    strided window-hash pass per batch (the shared
    ``_token_window_hashes_flat`` kernel) and an ``np.isin``
    membership. Adds ``contaminated`` (bool), ``n_contam_windows`` and
    ``n_windows`` (= max(len - n + 1, 0); docs shorter than ``n`` have
    zero windows and are never flagged)."""

    def __init__(self, eval_grams: np.ndarray, n: int = 8, tokens_col: str = "tokens"):
        self.grams = np.asarray(eval_grams, dtype=np.uint64)
        self.n = n
        self.tokens_col = tokens_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from .dedup import _token_window_hashes_flat  # lazy: avoid cycle

        h, n_wins = _token_window_hashes_flat(t, self.tokens_col, self.n)
        vals_lens = _flat_tokens(t, self.tokens_col)[1]
        lens = np.diff(vals_lens)
        real = np.maximum(lens - self.n + 1, 0)
        if len(h) and len(self.grams):
            hit = np.isin(h, self.grams)
            win_offs = np.zeros(len(n_wins) + 1, np.int64)
            np.cumsum(n_wins, out=win_offs[1:])
            hits = np.add.reduceat(hit, win_offs[:-1]) if len(hit) else np.zeros(
                len(n_wins), np.int64
            )
            hits = np.where(n_wins > 0, hits, 0)
        else:
            hits = np.zeros(len(lens), np.int64)
        # the kernel zero-pads short docs to one window — those windows
        # are synthetic; a doc with no REAL window is never contaminated
        hits = np.where(real > 0, hits, 0).astype(np.int64)
        t = t.append_column("contaminated", pa.array(hits > 0))
        t = t.append_column("n_contam_windows", pa.array(hits))
        return t.append_column("n_windows", pa.array(real.astype(np.int64)))


def shard_hash(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded shuffle rank: ``(((id + seed) % p) * K) % p`` over int64 —
    uniform pseudo-random, deterministic, overflow-free in both numpy
    int64 and SQL BIGINT (same closed form as ``split_hash``)."""
    return (((ids + np.int64(seed)) % SPLIT_MOD) * SPLIT_MULT) % SPLIT_MOD


def shuffle_shards(ds, id_col: str = "doc_id", *, n_shards: int = 64, seed: int = 0):
    """Deterministic seeded GLOBAL SHUFFLE into training shards — the
    last stage of a training-data pipeline. Every row gets
    ``shuffle_rank`` (a pseudo-random but closed-form function of its
    id + seed) and ``shard = shuffle_rank % n_shards``; reading shards
    in order, each sorted by rank, is a uniform permutation of the
    corpus for any seed.

    Scale shape: ``ds.random_shuffle()`` materializes a random
    permutation of every block through one giant all-to-all; this is
    ONE stateless labeling pass — the only exchange is the bucketed
    write keyed on shard (``write_training_shards``), and re-shuffling
    for a new epoch is just a new seed, no data movement. Numeric ids
    use the SQL-expressible multiplicative hash; string ids fall back
    to the 64-bit string hash."""

    def lab(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if np.issubdtype(ids.dtype, np.number):
            r = shard_hash(ids.astype(np.int64), seed)
        else:
            from .._util import hash_str_u64, splitmix64

            r = (
                splitmix64(hash_str_u64(ids) + np.uint64(seed))
                >> np.uint64(1)
            ).astype(np.int64)
        t = t.append_column("shard", pa.array((r % n_shards).astype(np.int32)))
        return t.append_column("shuffle_rank", pa.array(r))

    return ds.map_batches(lab, batch_format="pyarrow")


def write_training_shards(
    ds, out_dir: str, id_col: str = "doc_id", *, n_shards: int = 64, seed: int = 0
):
    """Shuffle (``shuffle_shards``) and write one Parquet file per
    shard, rows sorted by (shuffle_rank, id) — the resumable training
    layout: a failed run re-runs only shards whose final file is
    missing (writes are tmp + atomic rename, so no partial final file
    ever exists). Per-shard ``map_groups`` here IS the bucketed
    pattern — key cardinality equals the shard count, which is sized
    like a bucket count (≳ cluster cores; each shard ≈ N/n_shards rows
    must fit a worker). Returns the manifest as pandas: shard, n_rows,
    id_sum (numeric ids), first/last id in read order, skipped,
    on_disk_rows.

    Resume safety (ADVICE r3): the run config (seed, n_shards, id_col)
    is stamped into ``_shards_meta.json`` before any shard writes; a
    resume against a directory stamped with a DIFFERENT config raises
    instead of silently keeping stale shards. Skipped shards also
    report the EXISTING file's row count (``on_disk_rows``, parquet
    metadata only — no data read) so drift from the recomputed
    ``n_rows`` is detectable in the manifest."""
    import json
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "_shards_meta.json")
    config = {"seed": int(seed), "n_shards": int(n_shards), "id_col": id_col}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            existing = json.load(f)
        if existing != config:
            raise ValueError(
                f"{out_dir} holds shards written with config {existing}; "
                f"current run uses {config} — existing shard files would "
                "be stale. Use a fresh directory or delete the old shards."
            )
    else:
        tmp_meta = meta_path + f".tmp-{os.getpid()}"
        with open(tmp_meta, "w") as f:
            json.dump(config, f)
        os.replace(tmp_meta, meta_path)
    labeled = shuffle_shards(ds, id_col, n_shards=n_shards, seed=seed)

    def write_one(g: pd.DataFrame) -> pd.DataFrame:
        sh = int(g["shard"].iloc[0])
        g = g.sort_values(["shuffle_rank", id_col], kind="mergesort")
        body = g.drop(columns=["shard"])
        path = os.path.join(out_dir, f"shard-{sh:05d}.parquet")
        skipped = os.path.exists(path)
        if not skipped:
            tmp = path + f".tmp-{os.getpid()}"
            pq.write_table(
                pa.Table.from_pandas(body, preserve_index=False), tmp
            )
            os.replace(tmp, path)
        # metadata-only read: skipped-shard drift is detectable
        on_disk = pq.read_metadata(path).num_rows
        ids = g[id_col]
        numeric = pd.api.types.is_numeric_dtype(ids)
        return pd.DataFrame(
            {
                "shard": [sh],
                "n_rows": [len(g)],
                "id_sum": [int(ids.sum()) if numeric else 0],
                "first_id": [str(ids.iloc[0])],
                "last_id": [str(ids.iloc[-1])],
                "skipped": [skipped],
                "on_disk_rows": [int(on_disk)],
            }
        )

    return labeled.groupby("shard").map_groups(write_one).to_pandas()


QUALITY_CLF_BUCKETS = 64


def _unigram_buckets(s: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hashed unigram features per document: ``(bucket, doc_index,
    n_words)`` for every non-empty word. Same SQL-expressible mix
    family as ``_dsir_bigram_buckets`` (first/last code point +
    length, so a DuckDB oracle recomputes buckets exactly); swap in
    ``hash_str_u64`` for production corpora."""
    words = s.str.split(" ")
    raw_lens = (
        words.str.len().to_numpy(dtype=np.int64) if len(s) else np.empty(0, np.int64)
    )
    n_docs = len(s)
    if raw_lens.sum() == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.zeros(n_docs, np.int64),
        )
    flat_all = np.concatenate([np.asarray(w, dtype=object) for w in words.to_numpy()])
    doc_all = np.repeat(np.arange(n_docs, dtype=np.int64), raw_lens)
    keep = flat_all != ""
    flat, doc_of = flat_all[keep], doc_all[keep]
    n_words = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
    fs = pd.Series(flat)
    first_cp = np.array(fs.str.slice(0, 1).tolist(), dtype="U1").view(np.uint32).astype(np.int64)
    last_cp = np.array(fs.str.slice(-1).tolist(), dtype="U1").view(np.uint32).astype(np.int64)
    wlen = fs.str.len().to_numpy(dtype=np.int64)
    b = (first_cp * 31 + wlen * 3 + last_cp) % QUALITY_CLF_BUCKETS
    return b, doc_of, n_words


def default_clf_weights() -> np.ndarray:
    """Deterministic stand-in weight vector (``((j*37) % 21) - 10`` per
    bucket — ints in [-10, 10], SQL closed form). A real deployment
    broadcasts learned weights instead; the pipeline shape is
    identical."""
    j = np.arange(QUALITY_CLF_BUCKETS, dtype=np.int64)
    return (j * 37) % 21 - 10


class HashedQualityClassifier:
    """Model-based quality filtering as a linear classifier over
    hashed bag-of-words features — the fastText/logistic-regression
    quality gate of the GPT-3 / CCNet / FineWeb pipelines (Brown et
    al. 2020 appendix A filter docs by a trained LR over hashed
    features; CCNet uses a fastText linear model). The WEIGHT VECTOR
    broadcasts once per actor (``ray.put`` handle or constructor arg);
    each batch runs one flat bucket pass + one scatter-add per doc.

    Adds ``clf_score`` (Σ weights[bucket(word)] — int64 when the
    weights are integer, so an SQL oracle matches exactly),
    ``clf_prob`` (sigmoid of the length-normalized score) and
    ``clf_keep`` (score > 0)."""

    def __init__(self, weights: np.ndarray, *, bias: float = 0.0, text_col: str = "text"):
        w = np.asarray(weights)
        if len(w) != QUALITY_CLF_BUCKETS:
            raise ValueError(f"need {QUALITY_CLF_BUCKETS} weights, got {len(w)}")
        self.w = w
        self.bias = bias
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        s = pd.Series(t[self.text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        b, doc_of, n_words = _unigram_buckets(s)
        integral = np.issubdtype(self.w.dtype, np.integer)
        score = np.zeros(len(s), np.int64 if integral else np.float64)
        if len(b):
            np.add.at(score, doc_of, self.w[b])
        z = score / np.maximum(n_words, 1) + self.bias
        prob = 1.0 / (1.0 + np.exp(-z))
        t = t.append_column("clf_score", pa.array(score))
        t = t.append_column("clf_prob", pa.array(prob, pa.float64()))
        t = t.append_column("clf_keep", pa.array(score > 0))
        return t.append_column("n_words", pa.array(n_words))


def iter_training_batches(
    shards_dir: str,
    batch_size: int,
    *,
    columns=None,
    rank: int = 0,
    world_size: int = 1,
    drop_last: bool = False,
):
    """Consumption side of ``write_training_shards``: stream the shard
    files in filename order (each file is internally shuffle-rank
    sorted, so this IS the shuffled epoch order) and yield fixed-size
    ``pyarrow.Table`` batches that span shard boundaries. For
    data-parallel training each host passes its ``(rank, world_size)``
    and reads only shards ``rank, rank+world, ...`` — disjoint
    coverage with no coordination, one sequential Parquet scan per
    shard, never more than one shard + one batch in memory."""
    import os

    import pyarrow.parquet as pq

    if not 0 <= rank < world_size:
        raise ValueError(f"rank {rank} outside world of {world_size}")
    files = sorted(
        f for f in os.listdir(shards_dir)
        if f.startswith("shard-") and f.endswith(".parquet")
    )
    carry: pa.Table | None = None
    for f in files[rank::world_size]:
        t = pq.read_table(os.path.join(shards_dir, f), columns=columns)
        t = t if carry is None else pa.concat_tables([carry, t], promote_options="default")
        off = 0
        while off + batch_size <= len(t):
            yield t.slice(off, batch_size)
            off += batch_size
        carry = t.slice(off) if off < len(t) else None
    if carry is not None and len(carry) and not drop_last:
        yield carry
