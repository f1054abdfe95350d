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


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kw):
    """Read one named testdata table (e.g. 'events') with pruned columns."""
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns, **kw
    ).map_batches(_strip_meta, batch_format="pyarrow")


def read_corpus(path: str, columns: list[str] | None = None, **kw):
    """Read a synthetic token corpus directory written by synth.write_synth_corpus."""
    import ray.data

    return ray.data.read_parquet(path, columns=columns, **kw).map_batches(
        _strip_meta, batch_format="pyarrow"
    )
