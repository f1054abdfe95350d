"""End-to-end training-corpus preparation pipeline.

Composes the engine's LLM-data stages (``stages/llmdata.py``,
``stages/dedup.py``, ``stages/textstats.py``) into the canonical
public-pipeline order (C4 / Gopher / CCNet / RefinedWeb / GPT-3
describe the same skeleton):

    clean (C4 line rules) → quality gate (Gopher) → language filter
    → PII redaction → exact dedup → corpus-wide line dedup
    → MinHash near-dedup → test-set decontamination
    → train/valid/test split → tokenize (top-V vocab)
    → sequence packing → partitioned Parquet write
    → seeded global shuffle into training shards (optional)

Every stage is optional and independently configurable so the same
composition serves both a full prep run and the SQL-mirrorable subset
the driver oracle checks (``__ray_entry__._q_llm_ops`` 'prep' leg).

Execution shape (designed for the 100 TB case):

* All row-local stages (clean / quality / lang / PII / split) FUSE
  into one streaming ``map_batches`` pass — one read of the raw text.
* The filtered corpus is materialized ONCE (object store, spills to
  disk) because at least two corpus-wide consumers re-read it (dedup
  discovery + vocabulary build + the encode pass); re-running the
  regex-heavy filter chain per consumer would cost more than the
  cached blocks.  Disable via ``materialize_intermediate=False`` when
  only one consumer runs (e.g. pure filtering, ``tokenize=0``).
* Each dedup stage shuffles skinny key tables only — (hash, id)
  pairs for exact dedup, (band, hash, id) triples for MinHash,
  (line_hash, id) for line dedup — never document text.  Removal is
  an anti-filter: the duplicate id set (bounded by the duplicate
  count, NOT the corpus) broadcasts via ``ray.put`` when small, and
  falls back to a distributed bucketed anti-join past
  ``drop_broadcast_max`` ids.
* Outputs are partitioned Parquet — documents by ``split``, packed
  sequences by pack group — so a failed run resumes by skipping
  completed partition directories (``_done.json`` marker).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from .._util import table_from_pandas


@dataclass
class PrepConfig:
    """Stage toggles + knobs for ``prepare_corpus``.

    The default configuration is the full pipeline; the driver-oracle
    leg runs the SQL-expressible subset (near/line dedup off)."""

    text_col: str = "text"
    id_col: str = "doc_id"
    source_col: str = "source"
    # --- row-local filters (one fused pass)
    c4: bool = False                  # line-level C4 cleaning
    c4_min_lines: int = 3
    quality: bool = True              # Gopher gate (passes_gopher)
    lang: str | None = None           # keep docs whose LangId == lang
    pii: bool = True                  # text := redacted
    # --- dedup
    exact_dedup: bool = True          # first-wins by min id per text hash
    line_dedup: bool = False          # corpus-duplicated-line removal
    line_min_docs: int = 2
    passage_dedup: bool = False       # ExactSubstr-style span removal
    passage_window: int = 32
    passage_min_docs: int = 2
    near_dedup: bool = False          # MinHash+LSH near-dup removal
    near_k: int = 5
    near_num_perm: int = 128
    near_bands: int = 16
    near_threshold: float = 0.8
    # --- decontamination (n-gram hash set of held-out eval text)
    decontaminate_grams: Any = None   # np.ndarray from build_eval_grams
    decontaminate_n: int = 8
    # --- split / tokenize / pack
    split: bool = True
    test_frac: float = 0.05
    valid_frac: float = 0.05
    vocab_size: int = 50_000          # 0 disables tokenize+pack
    seq_len: int = 2048
    pack: bool = True                 # pack per (source, split)
    pack_emit_tokens: bool = True     # False → chunk STATS only
    # --- training-shard shuffle (writes out_dir/shards; needs out_dir)
    shard_shuffle: bool = False       # seeded global shuffle of packed chunks
    n_shards: int = 64
    shuffle_seed: int = 0
    # --- execution
    drop_broadcast_max: int = 5_000_000
    materialize_intermediate: bool = True
    num_buckets: int | None = None    # dedup shuffle width (None=derived)


@dataclass
class PrepResult:
    documents: Any                    # Dataset: surviving docs (+tokens,+split)
    packed: Any | None                # Dataset of packed chunks (or None)
    vocab: pd.DataFrame | None        # top-V (word, c) in id order
    stats: dict = field(default_factory=dict)
    out_dir: str | None = None
    shards: pd.DataFrame | None = None  # shard-writer manifest (shard_shuffle)


PACK_GROUP_SEP = "\x1f"  # NUL-free (pandas StringHashTable truncates at NUL)


def _anti_filter_ids(ds, drop_ids, id_col: str, *, broadcast_max: int, num_buckets=None):
    """Remove rows whose ``id_col`` is in ``drop_ids``.

    ``drop_ids`` is a sorted int64 numpy array (the duplicate set —
    bounded by duplicate COUNT).  Small sets broadcast once via
    ``ray.put`` and filter with a vectorized ``searchsorted`` — zero
    shuffle.  Past ``broadcast_max`` the filter becomes a distributed
    bucketed anti-join on hashed id so no O(duplicates) object ships
    to every task (the corpus shuffles by id hash once — the standard
    co-partition; duplicate-majority corpora pay it, everyone else
    takes the broadcast path)."""
    import ray

    drop_ids = np.asarray(drop_ids, dtype=np.int64)
    drop_ids.sort()
    if len(drop_ids) == 0:
        return ds
    if len(drop_ids) <= broadcast_max:
        ref = ray.put(drop_ids)

        def anti(batch: pa.Table) -> pa.Table:
            dropped = ray.get(ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(dropped, ids)
            pos = np.clip(pos, 0, len(dropped) - 1)
            keep = dropped[pos] != ids
            return batch.filter(pa.array(keep))

        return ds.map_batches(anti, batch_format="pyarrow")

    # distributed path: bucketed anti-join on id
    from ..stages.aggregate import bucketed_group_apply

    drop_tbl = pa.table({id_col: pa.array(drop_ids), "_drop": pa.array(np.ones(len(drop_ids), np.int8))})
    drop_ds = _ds_from_table(drop_tbl)

    def pad_drop(batch: pa.Table) -> pa.Table:
        return batch.append_column("_drop", pa.array(np.zeros(len(batch), np.int8)))

    padded = ds.map_batches(pad_drop, batch_format="pyarrow")
    # align schemas: the drop side has only (id, _drop); pad the rest
    # with TYPED nulls so the union's schemas match exactly
    schema = padded.schema()
    names = list(schema.names)
    types = {
        n: (t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t))
        for n, t in zip(schema.names, schema.types)
    }

    def widen(batch: pa.Table) -> pa.Table:
        out = {}
        for n in names:
            if n in batch.column_names:
                out[n] = batch[n].cast(types[n])
            else:
                out[n] = pa.nulls(len(batch), types[n])
        return pa.table(out)

    sides = padded.select_columns(names).union(
        drop_ds.map_batches(widen, batch_format="pyarrow")
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        dropped = set(df.loc[df["_drop"] == 1, id_col].to_numpy())
        keep = df[(df["_drop"] == 0) & ~df[id_col].isin(dropped)]
        return keep.drop(columns=["_drop"])

    kwargs = {"num_buckets": num_buckets} if num_buckets else {}
    return bucketed_group_apply(sides, id_col, per_bucket, **kwargs)


def _ds_from_table(tbl: pa.Table):
    import ray.data

    return ray.data.from_arrow(tbl)


def amplify_documents(docs_path: str, target_docs: int):
    """Deterministic amplification of the sf documents table to
    ``>= target_docs`` rows for benchmark and durability runs: each
    replica re-ids its rows (doc_id + r*10M) and uniquifies the text
    with a replica prefix ('r{r} ') so dedup, vocab and pack do real
    work at the full doc count. SHARED by bench.py and
    tools/prep_resume_proof.py so the kill-resume proof measures
    exactly the benchmark workload. Returns ``(Dataset, n_docs)``."""
    import ray.data as rd

    base_docs = rd.read_parquet(docs_path).count()
    reps = max(1, -(-target_docs // base_docs))

    def _amplify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for r in range(reps):
            parts.append(
                pa.table(
                    {
                        "doc_id": pc.add(t["doc_id"], r * 10_000_000),
                        "text": pc.binary_join_element_wise(
                            f"r{r} ", t["text"], ""
                        ),
                        "source": t["source"],
                    }
                )
            )
        return pa.concat_tables(parts)

    ds = rd.read_parquet(docs_path, columns=["doc_id", "text", "source"]).map_batches(
        _amplify, batch_format="pyarrow"
    )
    return ds, base_docs * reps


def _exact_drop_ids(ds, text_col: str, id_col: str) -> np.ndarray:
    """Duplicate ids under exact dedup (everything but the min-id row
    per content hash).  One shuffle of (hash, id) pairs: per batch the
    pairs pre-sort, the bucketed merge computes per-hash (min, ids...)
    and emits the non-winners.  Returns the sorted drop-id array —
    O(duplicate count) on the driver, same bound as ``near_dedup``."""
    from ..stages.aggregate import bucketed_group_apply
    from ..stages.dedup import add_content_hash

    pairs = ds.map_batches(
        lambda b: add_content_hash(b, text_col).select(["content_hash", id_col]),
        batch_format="pyarrow",
    )

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("content_hash", sort=False)[id_col].transform("min")
        out = df.loc[df[id_col] != m, [id_col]]
        return out

    drops = bucketed_group_apply(pairs, "content_hash", losers)
    batches = list(drops.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return np.empty(0, np.int64)
    return (
        pa.concat_tables(batches)[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    )


def prepare_corpus(ds, cfg: PrepConfig | None = None, out_dir: str | None = None) -> PrepResult:
    """Run the corpus-prep composition over a documents Dataset.

    ``ds`` must carry ``cfg.text_col``, ``cfg.id_col`` and
    ``cfg.source_col``.  Returns lazily-consumable Datasets; when
    ``out_dir`` is given, writes partitioned Parquet (documents by
    split, packed by pack group) plus ``vocab.parquet`` and a
    ``_done.json`` marker, and SKIPS the whole run when the marker
    already exists (artifact-level resume)."""
    import json
    import os

    import ray

    cfg = cfg or PrepConfig()
    stats: dict = {}

    if out_dir and os.path.exists(os.path.join(out_dir, "_done.json")):
        with open(os.path.join(out_dir, "_done.json")) as f:
            stats = json.load(f)
        import ray.data as rd

        docs = rd.read_parquet(os.path.join(out_dir, "documents"))
        packed = (
            rd.read_parquet(os.path.join(out_dir, "packed"))
            if os.path.isdir(os.path.join(out_dir, "packed"))
            else None
        )
        vocab = (
            pd.read_parquet(os.path.join(out_dir, "vocab.parquet"))
            if os.path.exists(os.path.join(out_dir, "vocab.parquet"))
            else None
        )
        stats["resumed"] = True
        return PrepResult(docs, packed, vocab, stats, out_dir)

    text_col, id_col, source_col = cfg.text_col, cfg.id_col, cfg.source_col

    # ---- stage 1: fused row-local filter chain (ONE pass over raw text)
    from ..stages.llmdata import assign_split, c4_clean, gopher_stats, redact_pii

    def row_local(batch: pa.Table) -> pa.Table:
        if cfg.c4:
            batch = c4_clean(batch, text_col=text_col, min_lines=cfg.c4_min_lines)
            batch = batch.filter(batch["kept"])
            idx = batch.column_names.index(text_col)
            batch = batch.set_column(idx, text_col, batch["clean_text"])
            batch = batch.drop_columns(["clean_text", "n_lines_kept", "kept"])
        if cfg.quality:
            batch = gopher_stats(batch, text_col=text_col)
            batch = batch.filter(batch["passes_gopher"])
            batch = batch.drop_columns(
                ["dup_word_frac", "alpha_word_frac", "symbol_word_ratio", "passes_gopher"]
            )
        if cfg.pii:
            batch = redact_pii(batch, text_col=text_col)
            idx = batch.column_names.index(text_col)
            batch = batch.set_column(idx, text_col, batch["redacted"])
            batch = batch.drop_columns(["redacted", "n_email", "n_ip", "n_phone"])
        if cfg.split:
            batch = assign_split(
                batch, id_col=id_col, test_frac=cfg.test_frac, valid_frac=cfg.valid_frac
            )
        return batch

    docs = ds.map_batches(row_local, batch_format="pyarrow")
    if cfg.lang:
        from ..stages.textstats import LangId

        docs = docs.map_batches(LangId(text_col=text_col), batch_format="pyarrow")
        target = cfg.lang

        def keep_lang(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.equal(batch["lang_pred"], target)).drop_columns(
                ["lang_pred"]
            )

        docs = docs.map_batches(keep_lang, batch_format="pyarrow")

    if cfg.materialize_intermediate:
        docs = docs.materialize()

    # ---- stage 2: exact dedup (anti-filter by duplicate ids)
    if cfg.exact_dedup:
        drop = _exact_drop_ids(docs, text_col, id_col)
        stats["exact_dropped"] = int(len(drop))
        docs = _anti_filter_ids(
            docs, drop, id_col,
            broadcast_max=cfg.drop_broadcast_max, num_buckets=cfg.num_buckets,
        )

    # ---- stage 3: corpus-wide line dedup (rewrites text)
    if cfg.line_dedup:
        from ..stages.llmdata import LineDeduper, duplicate_lines

        dup = duplicate_lines(
            docs, text_col=text_col, id_col=id_col,
            min_docs=cfg.line_min_docs, num_buckets=cfg.num_buckets,
        )
        batches = list(dup.iter_batches(batch_format="pyarrow", batch_size=None))
        dup_tbl = (
            pa.concat_tables(batches)
            if batches
            else pa.table(
                {"line_hash": pa.array([], pa.uint64()),
                 "n_docs": pa.array([], pa.int64()),
                 "min_doc_id": pa.array([], pa.int64())}
            )
        )
        stats["dup_lines"] = int(len(dup_tbl))
        # constructor args serialize ONCE PER ACTOR (the broadcast):
        # each pool member holds one sorted copy of the dup-line table
        docs = docs.map_batches(
            LineDeduper, batch_format="pyarrow",
            fn_constructor_args=(
                dup_tbl["line_hash"].to_numpy(zero_copy_only=False),
                dup_tbl["min_doc_id"].to_numpy(zero_copy_only=False),
            ),
            fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
            concurrency=(1, 8),
        )
        idx_fn_cols = ["clean_text", "n_lines", "n_removed"]

        def fold_clean(batch: pa.Table) -> pa.Table:
            idx = batch.column_names.index(text_col)
            batch = batch.set_column(idx, text_col, batch["clean_text"])
            return batch.drop_columns(idx_fn_cols)

        docs = docs.map_batches(fold_clean, batch_format="pyarrow")

    # ---- stage 3b: ExactSubstr-style duplicated-passage removal
    if cfg.passage_dedup:
        from ..stages.llmdata import PassageDeduper, duplicate_passages

        dupp = duplicate_passages(
            docs, text_col=text_col, id_col=id_col,
            window=cfg.passage_window, min_docs=cfg.passage_min_docs,
            num_buckets=cfg.num_buckets,
        )
        batches = list(dupp.iter_batches(batch_format="pyarrow", batch_size=None))
        dupp_tbl = (
            pa.concat_tables(batches)
            if batches
            else pa.table(
                {"gram_hash": pa.array([], pa.uint64()),
                 "n_docs": pa.array([], pa.int64()),
                 "min_doc_id": pa.array([], pa.int64())}
            )
        )
        stats["dup_passages"] = int(len(dupp_tbl))
        docs = docs.map_batches(
            PassageDeduper, batch_format="pyarrow",
            fn_constructor_args=(
                dupp_tbl["gram_hash"].to_numpy(zero_copy_only=False),
                dupp_tbl["min_doc_id"].to_numpy(zero_copy_only=False),
            ),
            fn_constructor_kwargs={
                "window": cfg.passage_window,
                "text_col": text_col,
                "id_col": id_col,
            },
            concurrency=(1, 8),
        )

        def fold_passage(batch: pa.Table) -> pa.Table:
            idx = batch.column_names.index(text_col)
            batch = batch.set_column(idx, text_col, batch["clean_text"])
            return batch.drop_columns(
                ["clean_text", "n_words", "n_removed_words", "n_dup_windows"]
            )

        docs = docs.map_batches(fold_passage, batch_format="pyarrow")

    # ---- stage 4: MinHash near-dedup (anti-filter by cluster non-roots)
    if cfg.near_dedup:
        from ..stages.dedup import near_dedup_clusters

        clusters = near_dedup_clusters(
            docs, text_col=text_col, id_col=id_col,
            k=cfg.near_k, num_perm=cfg.near_num_perm, bands=cfg.near_bands,
            jaccard_threshold=cfg.near_threshold,
        )
        drop = np.asarray(
            sorted(x for x, root in clusters.items() if root != x), dtype=np.int64
        )
        stats["near_dropped"] = int(len(drop))
        docs = _anti_filter_ids(
            docs, drop, id_col,
            broadcast_max=cfg.drop_broadcast_max, num_buckets=cfg.num_buckets,
        )

    # ---- stage 5: decontamination (drop docs containing eval n-grams)
    if cfg.decontaminate_grams is not None:
        from ..stages.llmdata import NgramDecontaminator

        docs = docs.map_batches(
            NgramDecontaminator,
            batch_format="pyarrow",
            fn_constructor_args=(cfg.decontaminate_grams,),
            fn_constructor_kwargs={"n": cfg.decontaminate_n, "text_col": text_col},
            concurrency=(1, 8),
        )

        def drop_contaminated(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.invert(batch["contaminated"])).drop_columns(
                ["contaminated"]
            )

        docs = docs.map_batches(drop_contaminated, batch_format="pyarrow")

    # the dedup/decon anti-filters are row-local over the cached blocks;
    # materialize the final doc set once when tokenize+pack re-read it
    if cfg.materialize_intermediate and cfg.vocab_size:
        docs = docs.materialize()

    # ---- stage 6: tokenize (vocab over the SURVIVING corpus) + pack
    vocab = None
    packed = None
    if cfg.vocab_size:
        from ..stages.llmdata import (
            VocabEncoder,
            corpus_word_counts,
            pack_token_sequences,
            top_vocab,
        )

        counts = corpus_word_counts(docs, text_col=text_col, num_buckets=cfg.num_buckets)
        vocab = top_vocab(counts, cfg.vocab_size)
        docs = docs.map_batches(
            VocabEncoder,
            batch_format="pyarrow",
            fn_constructor_args=(vocab["word"].to_numpy(),),
            fn_constructor_kwargs={"text_col": text_col},
            concurrency=(1, 8),
        )
        if cfg.pack:
            group_cols = [source_col] + (["split"] if cfg.split else [])

            def add_pack_group(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                key = pc.cast(batch[group_cols[0]], pa.string())
                for c in group_cols[1:]:
                    key = pc.binary_join_element_wise(
                        key, pc.cast(batch[c], pa.string()), PACK_GROUP_SEP
                    )
                return batch.append_column("pack_group", key)

            if cfg.materialize_intermediate:
                docs = docs.materialize()  # encode once; pack + write both consume
            packed = pack_token_sequences(
                docs.map_batches(add_pack_group, batch_format="pyarrow"),
                group_col="pack_group",
                order_col=id_col,
                tokens_col="tokens",
                seq_len=cfg.seq_len,
                emit_tokens=cfg.pack_emit_tokens,
                num_buckets=cfg.num_buckets or 64,
            )

    # ---- stage 7: partitioned, resumable write
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        # A prior run died before stamping _done.json: any partial
        # documents/packed/vocab files it left would be DOUBLED by this
        # run's re-write (Ray parquet filenames are per-execution), so
        # clear them. shards/ stays untouched — its files are written
        # atomically (tmp + rename) and individually skipped on resume.
        import shutil

        for sub in ("documents", "packed"):
            p = os.path.join(out_dir, sub)
            if os.path.isdir(p):
                shutil.rmtree(p)
        vp = os.path.join(out_dir, "vocab.parquet")
        if os.path.exists(vp):
            os.remove(vp)
        doc_cols = [c for c in docs.schema().names]
        part_cols = ["split"] if cfg.split and "split" in doc_cols else None
        docs.write_parquet(
            os.path.join(out_dir, "documents"),
            partition_cols=part_cols,
        )
        if packed is not None:
            def split_pack_key(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                parts = pc.split_pattern(batch["pack_group"], PACK_GROUP_SEP)
                batch = batch.append_column("pack_source", pc.list_element(parts, 0))
                if cfg.split:
                    batch = batch.append_column("pack_split", pc.list_element(parts, 1))
                return batch

            packed = packed.map_batches(split_pack_key, batch_format="pyarrow")
            packed.write_parquet(
                os.path.join(out_dir, "packed"),
                partition_cols=(["pack_split"] if cfg.split else ["pack_source"]),
            )
        if vocab is not None:
            vocab.to_parquet(os.path.join(out_dir, "vocab.parquet"))

    # ---- stage 8: seeded global shuffle of packed chunks into
    # training shards (the training-layout last mile; per-shard files
    # are themselves resumable independently of the _done marker)
    shards = None
    if cfg.shard_shuffle and packed is not None:
        if not out_dir:
            raise ValueError("shard_shuffle requires out_dir")
        from ..stages.llmdata import write_training_shards

        def add_chunk_uid(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            uid = pc.binary_join_element_wise(
                pc.cast(batch["pack_group"], pa.string()),
                pc.cast(batch["chunk_id"], pa.string()),
                ":",
            )
            return batch.append_column("_chunk_uid", uid)

        shards = write_training_shards(
            packed.map_batches(add_chunk_uid, batch_format="pyarrow"),
            os.path.join(out_dir, "shards"),
            id_col="_chunk_uid",
            n_shards=cfg.n_shards,
            seed=cfg.shuffle_seed,
        )
        stats["shard_rows"] = int(shards["n_rows"].sum())
        stats["shards_skipped"] = int(shards["skipped"].sum())

    if out_dir:
        with open(os.path.join(out_dir, "_done.json"), "w") as f:
            json.dump(stats, f)

    return PrepResult(docs, packed, vocab, stats, out_dir, shards)
