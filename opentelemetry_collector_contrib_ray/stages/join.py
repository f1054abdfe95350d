"""Joins: broadcast small-side and partitioned large-large hash join.

The reference has NO relational join operator (SURVEY.md §2.7) — its
"joins" are broadcast lookups against in-process caches (k8s pod cache,
detected resource). This module supplies the engine's general-purpose
relational capability:

- ``broadcast_join``: small side (dimension table) shipped once via
  ray.put, pandas merge per batch — no shuffle. The scale default for
  enrichment-shaped joins.
- ``bucketed_hash_join``: both sides large — hash-bucket both on the
  key, co-locate each bucket with ONE shuffle (union + groupby), merge
  per bucket with vectorized pandas. Skewed hot keys are bounded by the
  bucket of the hottest key; salt upstream if one key alone exceeds a
  worker's memory.
- ``native_join``: thin wrapper over ``Dataset.join`` (hash shuffle
  join in Ray >= 2.46) — preferred when available; the bucketed path is
  the portable fallback and the explicitly-partitioned variant.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .._util import table_from_pandas


def broadcast_join(ds, small: pa.Table, on: str | Sequence[str], how: str = "left", suffix: str = "_r"):
    """Merge each batch against a broadcast small table (pandas merge).
    ``small`` is put in the object store once; every task reads it
    zero-copy on the node."""
    import ray

    on = [on] if isinstance(on, str) else list(on)
    ref = ray.put(small)

    def merge(batch: pa.Table) -> pa.Table:
        sm = ray.get(ref).to_pandas()
        df = batch.to_pandas()
        out = df.merge(sm, on=on, how=how, suffixes=("", suffix))
        return table_from_pandas(out)

    return ds.map_batches(merge, batch_format="pyarrow")


def bucketed_hash_join(
    left,
    right,
    on: str | Sequence[str],
    *,
    how: str = "inner",
    num_buckets: int = 64,
    left_suffix: str = "",
    right_suffix: str = "_r",
):
    """Partitioned hash join of two Datasets on ``on``.

    Plan: tag each side, add ``_bucket = hash(key) % B`` (vectorized),
    union (zero-copy concat of block lists), groupby(_bucket) — the one
    all-to-all — then pandas-merge the two sides inside each bucket.
    Wall-clock scales with the largest bucket; B should be ≳ cluster
    cores. Rows with null keys are dropped (SQL inner-join semantics)
    or kept on the left for how='left'.
    """
    from .._util import hash_str_u64, splitmix64

    on = [on] if isinstance(on, str) else list(on)

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            key = batch[on[0]].to_numpy(zero_copy_only=False)
            if np.issubdtype(key.dtype, np.number):
                h = splitmix64(key.astype(np.uint64))
            else:
                h = hash_str_u64(key)
            b = (h % np.uint64(num_buckets)).astype(np.int64)
            batch = batch.append_column("_bucket", pa.array(b))
            return batch.append_column(
                "_side", pa.array(np.full(len(batch), side, dtype=np.int8))
            )

        return f

    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt = right.map_batches(tag(1), batch_format="pyarrow")
    # union of differing schemas: null-fill via pandas at merge time;
    # Ray union requires compatible schemas → pad both sides first
    lcols = set(left.schema().names)
    rcols = set(right.schema().names)

    def pad(missing_cols, types):
        def f(batch: pa.Table) -> pa.Table:
            for c, t in zip(missing_cols, types):
                batch = batch.append_column(c, pa.nulls(len(batch), t))
            return batch

        return f

    def _arrow_schema(ds) -> dict:
        s = ds.schema()
        out = {}
        for name, typ in zip(s.names, s.types):
            if not isinstance(typ, pa.DataType):
                try:
                    typ = pa.from_numpy_dtype(typ)
                except pa.ArrowNotImplementedError:
                    typ = pa.string()  # object dtype → string
            out[name] = typ
        return out

    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    l_missing = [c for c in rschema if c not in lcols]
    r_missing = [c for c in lschema if c not in rcols]
    lt = lt.map_batches(pad(l_missing, [rschema[c] for c in l_missing]), batch_format="pyarrow")
    rt = rt.map_batches(pad(r_missing, [lschema[c] for c in r_missing]), batch_format="pyarrow")
    all_cols = ["_bucket", "_side"] + sorted(set(lschema) | set(rschema))
    lt = lt.select_columns(all_cols)
    rt = rt.select_columns(all_cols)
    both = lt.union(rt)

    l_out = [c for c in lschema]
    r_out = [c for c in rschema if c not in on]

    def merge_bucket(g: pd.DataFrame) -> pa.Table:
        lhs = g[g["_side"] == 0][l_out]
        rhs = g[g["_side"] == 1][[*on, *r_out]]
        out = lhs.merge(rhs, on=on, how=how, suffixes=(left_suffix or "", right_suffix))
        # emit ARROW (metadata-free): pandas blocks re-acquire the
        # unhashable pandas schema blob on the next pyarrow conversion,
        # which makes every downstream shuffle warn per aggregator; and
        # arrow blocks union cleanly with the rest of the pipeline
        return table_from_pandas(out)

    return both.groupby("_bucket").map_groups(merge_bucket, batch_format="pandas")


def derived_num_partitions(cap: int = 512) -> int:
    """Shuffle partition count sized to the actual cluster: ~CPU/2
    aggregators (more swamps a small node, fewer starves a big
    cluster), capped so a 10k-core cluster doesn't make 5k tiny
    partitions. Callers use this instead of hard-coding counts."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(4, min(cap, cpus // 2))


def native_join(left, right, on, how: str = "inner", num_partitions: int | None = None, **kw):
    """Ray-native hash-shuffle join (Dataset.join, Ray ≥ 2.46).
    ``num_partitions`` defaults to ``derived_num_partitions()`` so the
    same code funnels through 16 aggregators on a laptop and hundreds
    on a cluster."""
    if num_partitions is None:
        num_partitions = derived_num_partitions()
    on = (on,) if isinstance(on, str) else tuple(on)
    return left.join(right, join_type=how, num_partitions=num_partitions, on=on, **kw)
