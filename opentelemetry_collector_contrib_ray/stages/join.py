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


# --------------------------------------------------- as-of / range joins


def _tag_pad_union(left, right, lkey: str, rkey: str, num_buckets: int):
    """Shared skeleton for the time/interval joins: hash-bucket each
    side on its key column, pad to a common schema, union. Returns
    ``(both, l_cols, r_cols)`` — the one all-to-all is the
    groupby(_bucket) the caller runs."""
    from .._util import hash_str_u64, splitmix64

    def tag(side: int, keycol: str):
        def f(batch: pa.Table) -> pa.Table:
            key = batch[keycol].to_numpy(zero_copy_only=False)
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

    def _schema(ds) -> dict:
        s = ds.schema()
        out = {}
        for name, typ in zip(s.names, s.types):
            if not isinstance(typ, pa.DataType):
                try:
                    typ = pa.from_numpy_dtype(typ)
                except pa.ArrowNotImplementedError:
                    typ = pa.string()
            out[name] = typ
        return out

    lschema, rschema = _schema(left), _schema(right)
    overlap = set(lschema) & set(rschema)
    if overlap:
        raise ValueError(
            f"asof/range join sides must not share column names: {sorted(overlap)}"
        )

    def pad(missing: dict):
        def f(batch: pa.Table) -> pa.Table:
            for c, t in missing.items():
                batch = batch.append_column(c, pa.nulls(len(batch), t))
            return batch

        return f

    lt = left.map_batches(tag(0, lkey), batch_format="pyarrow").map_batches(
        pad(rschema), batch_format="pyarrow"
    )
    rt = right.map_batches(tag(1, rkey), batch_format="pyarrow").map_batches(
        pad(lschema), batch_format="pyarrow"
    )
    all_cols = ["_bucket", "_side"] + sorted(set(lschema) | set(rschema))
    both = lt.select_columns(all_cols).union(rt.select_columns(all_cols))
    return both, lschema, rschema


def _cast_to_fields(df: pd.DataFrame, fields: list[tuple[str, "pa.DataType"]]) -> pa.Table:
    """Build an Arrow table with a CANONICAL per-bucket schema: every
    merge_bucket output is cast to the precomputed (name, type) list so
    all-unmatched buckets (pandas pd.NA → Arrow null type) and
    partially-matched buckets (int64 + NaN → float64) emit the SAME
    schema as fully-matched ones — left dtypes preserved, right attach
    columns nullable at their original types. Without this, downstream
    schema-dependent consumers (write_parquet, native ops) see mixed
    per-block schemas (Ray logs 'RefBundle with a different schema')."""
    arrays = []
    n = len(df)
    for name, typ in fields:
        if name not in df.columns:
            arrays.append(pa.nulls(n, typ))
            continue
        s = df[name]
        try:
            arrays.append(pa.array(s, type=typ, from_pandas=True))
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
            arrays.append(pa.array(s, from_pandas=True).cast(typ, safe=False))
    return pa.Table.from_arrays(arrays, names=[f[0] for f in fields])


def asof_join(
    left,
    right,
    *,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    num_buckets: int = 32,
):
    """Distributed AS-OF join: for each left row, attach the single
    right row with the nearest ``right_on`` at-or-before (backward) /
    at-or-after (forward) / closest (nearest) its ``left_on``
    (``allow_exact_matches=False`` makes the bound strict — SQL's
    ``ON l.t > r.t``), within the same ``by`` key — SQL's ``ASOF JOIN``, the standard way to
    align events to rates/quotes/config epochs.

    Plan (the partitioning assumption this op relies on): co-partition
    BOTH sides by hash(by-key) — one bucketed exchange — then inside
    each bucket sort each side by the time column and run ONE
    vectorized ``pandas.merge_asof`` (``by=`` handles per-key fencing;
    a key's rows always land in one bucket). Left-join semantics:
    unmatched left rows keep nulls. Rows with a null time column are
    dropped (they can never match). Sides must not share column names
    (rename before joining)."""
    both, lschema, rschema = _tag_pad_union(left, right, left_by, right_by, num_buckets)
    l_cols, r_cols = list(lschema), list(rschema)
    # the union's null padding degrades int/time columns to float64 in
    # buckets where one side is empty — pin key dtypes from the left
    # schema so merge_asof always sees matching types
    on_dtype = np.dtype(lschema[left_on].to_pandas_dtype())
    by_dtype = np.dtype(lschema[left_by].to_pandas_dtype())
    # canonical output schema: left dtypes + nullable right columns
    out_fields = [(c, lschema[c]) for c in l_cols] + [(c, rschema[c]) for c in r_cols]

    def merge_bucket(g: pd.DataFrame) -> pa.Table:
        lhs = g[g["_side"] == 0][l_cols].dropna(subset=[left_on, left_by])
        rhs = g[g["_side"] == 1][r_cols].dropna(subset=[right_on, right_by])
        lhs = lhs.astype({left_on: on_dtype, left_by: by_dtype})
        rhs = rhs.astype({right_on: on_dtype, right_by: by_dtype})
        lhs = lhs.sort_values(left_on, kind="mergesort")
        rhs = rhs.sort_values(right_on, kind="mergesort")
        out = pd.merge_asof(
            lhs,
            rhs,
            left_on=left_on,
            right_on=right_on,
            left_by=left_by,
            right_by=right_by,
            direction=direction,
            allow_exact_matches=allow_exact_matches,
        )
        return _cast_to_fields(out, out_fields)

    return both.groupby("_bucket").map_groups(merge_bucket, batch_format="pandas")


def range_join(
    left,
    right,
    *,
    value_col: str,
    lower_col: str,
    upper_col: str,
    left_by: str,
    right_by: str,
    how: str = "inner",
    num_buckets: int = 32,
):
    """Distributed interval (range) join: match each left row to the
    right interval with ``lower <= value < upper`` under the same
    ``by`` key — rate tables, bracket tables, config epochs.

    ASSUMES the intervals are NON-OVERLAPPING per key (each left row
    matches at most one interval): inside each co-partitioned bucket
    the intervals sort once per key and every left value resolves with
    one ``searchsorted`` + one upper-bound check — no per-row Python
    and no cartesian blowup. Overlapping-interval workloads need the
    general theta-join (not this operator). ``how='left'`` keeps
    unmatched left rows with null interval columns."""
    both, lschema, rschema = _tag_pad_union(left, right, left_by, right_by, num_buckets)
    l_cols, r_cols = list(lschema), list(rschema)
    by_dtype = np.dtype(lschema[left_by].to_pandas_dtype())
    r_attach = [c for c in r_cols if c != right_by]
    # canonical output schema: left dtypes + nullable right attach
    # columns — all-unmatched buckets (pd.NA → null type) and
    # NaN-degraded int columns cast back to one stable schema
    out_fields = [(c, lschema[c]) for c in l_cols] + [(c, rschema[c]) for c in r_attach]

    def merge_bucket(g: pd.DataFrame) -> pa.Table:
        lhs = g[g["_side"] == 0][l_cols].dropna(subset=[left_by])
        rhs = g[g["_side"] == 1][r_cols].dropna(subset=[right_by])
        lhs = lhs.astype({left_by: by_dtype})
        rhs = rhs.astype({right_by: by_dtype})
        rhs_by = {k: sub for k, sub in rhs.groupby(right_by, sort=False)}
        outs = []
        for k, lsub in lhs.groupby(left_by, sort=False):
            rsub = rhs_by.get(k)
            lsub = lsub.reset_index(drop=True)
            if rsub is None:
                if how == "left":
                    outs.append(lsub)  # attach columns null-filled at cast
                continue
            lo = rsub[lower_col].to_numpy(np.float64)
            order = np.argsort(lo, kind="stable")
            lo = lo[order]
            hi = rsub[upper_col].to_numpy(np.float64)[order]
            v = lsub[value_col].to_numpy(np.float64)
            pos = np.searchsorted(lo, v, side="right") - 1
            ok = pos >= 0
            ok[ok] &= v[ok] < hi[pos[ok]]
            matched = lsub[ok].reset_index(drop=True)
            r_rows = rsub.iloc[order[pos[ok]]][r_attach].reset_index(drop=True)
            outs.append(pd.concat([matched, r_rows], axis=1))
            if how == "left" and (~ok).any():
                outs.append(lsub[~ok])  # attach columns null-filled at cast
        if not outs:
            return _cast_to_fields(pd.DataFrame(columns=[f[0] for f in out_fields]), out_fields)
        return _cast_to_fields(pd.concat(outs, ignore_index=True), out_fields)

    return both.groupby("_bucket").map_groups(merge_bucket, batch_format="pandas")
