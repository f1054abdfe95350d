"""Parquet sources with column pruning and predicate pushdown.

The engine's "receiver" for batch workloads (SURVEY.md §2.1): every
pipeline reads only the columns it needs so a 2-column transform never
ships the whole table out of storage.
"""

from __future__ import annotations

import os


def _strip_meta(t):
    # Parquet files written via pandas carry a schema-metadata blob;
    # pa.Schema with metadata is unhashable, which makes Ray's shuffle
    # schema-dedup log "Failed to hash the schemas" per aggregator.
    # Dropping it is zero-copy and fuses with the read task.
    return t.replace_schema_metadata(None)


def _clean_schema(path: str, columns: list[str] | None):
    """Metadata-free Arrow schema from the first footer under ``path``.

    Passed to ``read_parquet`` so the READ operator itself emits
    metadata-free blocks — Ray hashes block schemas for dedup inside
    the read task, before any downstream ``_strip_meta`` runs, and a
    pandas-metadata dict there logs one "Failed to hash the schemas"
    warning per split.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    first = path
    while os.path.isdir(first):
        entries = sorted(os.listdir(first))
        if any("=" in e for e in entries):
            # hive-partitioned layout: the partition column lives in the
            # directory names, not the footers — let Ray infer the schema
            return None
        pqs = [e for e in entries if e.endswith(".parquet")]
        sub = pqs or [e for e in entries if not e.startswith("_")]
        if not sub:
            return None
        first = os.path.join(first, sub[0])
    sch = pq.read_schema(first).remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kw):
    """Read one named testdata table (e.g. 'events') with pruned columns."""
    import ray.data

    path = os.path.join(sf_dir, f"{name}.parquet")
    if "schema" not in kw:
        kw["schema"] = _clean_schema(path, columns)
    return ray.data.read_parquet(path, columns=columns, **kw).map_batches(
        _strip_meta, batch_format="pyarrow"
    )


def read_corpus(path: str, columns: list[str] | None = None, **kw):
    """Read a synthetic token corpus directory written by synth.write_synth_corpus."""
    import ray.data

    if "schema" not in kw:
        kw["schema"] = _clean_schema(path, columns)
    return ray.data.read_parquet(path, columns=columns, **kw).map_batches(
        _strip_meta, batch_format="pyarrow"
    )
