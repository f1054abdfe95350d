"""Training-data pipeline operators: PII redaction, Gopher-style
repetition/quality filters, sequence packing, C4-style line cleaning,
and deterministic domain-mixture resampling.

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

    def __init__(self, eval_grams: np.ndarray, n: int = 8, text_col: str = "text"):
        self.grams = np.asarray(eval_grams, dtype=np.uint64)
        self.n = n
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        s = pd.Series(t[self.text_col].to_numpy(zero_copy_only=False), dtype=object).fillna("")
        flags = np.zeros(len(s), dtype=bool)
        if len(self.grams):
            h, doc_of = _window_hashes(s, self.n)
            hit = np.isin(h, self.grams)
            np.add.at(flags, doc_of[hit], True)
        return t.append_column("contaminated", pa.array(flags, pa.bool_()))


def _window_hashes(s: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Hash every n-word window of every text in ``s`` in one flat
    pass. Returns ``(hashes uint64, doc_index int64)`` — the window
    render is positional string adds over the flat word array, the
    same joined-string hashing as ``build_eval_grams``."""
    from .._util import hash_str_u64

    words = s.str.split(" ")
    lens = words.str.len().to_numpy(dtype=np.int64) if len(s) else np.empty(0, np.int64)
    n_wins = np.maximum(lens - n + 1, 0)
    if n_wins.sum() == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
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
    return hash_str_u64(win.astype(object)), doc_of


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
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                columns=[group_col, "chunk_id", "chunk_len", "first_tok", "last_tok"]
            )
        )

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
