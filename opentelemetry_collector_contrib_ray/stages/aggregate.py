"""Aggregate stage: salted two-phase grouped aggregation.

Re-expresses the reference's aggregation semantics on Ray Data:

- **groupbyattrsprocessor** (processor.go:70-133): records grouped by
  the exact values of a configured key list; records with the key
  absent fall into the base (non-grouped) group; per-group record
  counts are the observable output our tests assert
  (processor_test.go:119-290) plus the num_grouped/num_non_grouped
  metrics (metrics.go).
- **statsdreceiver** (protocol/statsd_parser.go:138-222): counters sum,
  gauges last-write, timers collect→summary.
- **spanmetricsprocessor** (processor.go:279-333): per-dimension-tuple
  call count + latency sum + explicit-bucket histogram.
- **metricstransformprocessor aggregate_labels**
  (datapoint_aggregation.go:34-175): group by retained label set,
  merge with sum/mean/min/max.

Scale design: a bare ``groupby().aggregate()`` shuffles every row.
Every aggregation here is TWO-PHASE: phase 1 combines inside
``map_batches`` (one partial row per key per batch — the only rows
that enter the shuffle), phase 2 is a small ``groupby`` over the
partials. Skew note: per-batch combining already bounds the phase-2
input for ANY key (hot or not) to ≤ #blocks partial rows, so no salt
column is needed — an earlier design carried ``_salt`` but it only
multiplied partial rows without spreading phase-2 load (each key's
partials still converge on one reducer); it was removed.

Determinism: float partial sums merged by Ray's ``Sum`` arrive in
nondeterministic order, so the final double can differ between runs
(and from DuckDB) by ~1 ulp — enough to flip a ROUND() at a rounding
boundary. For columns with fixed decimal precision pass
``exact_sums={col: scale}``: values are scaled to int64
(``rint(v * scale)``) in phase 1 and summed exactly in integer
arithmetic — order-independent, bit-reproducible, and equal to a SQL
``SUM(CAST(col AS DECIMAL))`` oracle.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .._util import table_from_pandas

_AGG_FUNCS = {"count", "sum", "min", "max", "mean"}


def bucketed_aggregate(ds, keys, plan, *, num_buckets: int | None = None):
    """Grouped aggregation for HIGH-cardinality key sets.

    Ray's native sort-based ``groupby().aggregate()`` walks group
    boundaries in per-group Python — measured 56 s for 111k groups of
    120k rows vs <1 s for 20 groups — so group count, not row count,
    is its cost. This helper hash-buckets the key tuple into
    ~cluster-width buckets (the shuffle key has only ``num_buckets``
    distinct values) and merges each bucket with ONE C++-vectorized
    Arrow ``TableGroupBy`` — O(1) Python per bucket, not per key.

    ``plan``: ``[(src_col, arrow_op, dst_col)]`` with ``arrow_op`` a
    pyarrow group-aggregate function name (``sum/min/max/count/mean``).
    An EMPTY plan returns the distinct key tuples. Every row of a key
    lands in one bucket, so distributive merges are exact; output
    column order is ``keys`` then the plan's dst names.
    """
    from .._util import hash_str_u64, splitmix64
    from .join import derived_num_partitions

    keys = list(keys)
    P = num_buckets or derived_num_partitions()

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = np.zeros(len(batch), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for kcol in keys:
                vals = batch[kcol].to_numpy(zero_copy_only=False)
                if np.issubdtype(vals.dtype, np.number):
                    if vals.dtype.kind == "f":  # nulls arrive as NaN
                        vals = np.nan_to_num(vals, nan=-1.0)
                    ch = splitmix64(vals.astype(np.uint64))
                else:
                    ch = hash_str_u64(vals)
                h = splitmix64(h ^ ch)
        b = (h % np.uint64(P)).astype(np.int64)
        return batch.append_column("_gb", pa.array(b))

    def merge_bucket(t: pa.Table) -> pa.Table:
        # Arrow-native grouped merge: type-preserving (incl. all-null
        # key columns, which pandas would retype) and C++-vectorized
        g = pa.TableGroupBy(t.drop_columns(["_gb"]), keys)
        # dedupe (src, op): e.g. sum+mean share one partial column
        merged = g.aggregate(sorted({(src, op) for src, op, _ in plan}))
        cols = {k: merged[k] for k in keys}
        for src, op, dst in plan:
            cols[dst] = merged[f"{src}_{op}"]
        return pa.table(cols)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_gb")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def _partial_stage(keys, aggs, exact_sums):
    """Build the per-batch combiner: batch → one row per key tuple."""
    exact_sums = exact_sums or {}

    def combine(batch: pa.Table) -> pa.Table:
        df_cols = {k: batch[k].to_numpy(zero_copy_only=False) for k in keys}
        for col, fns in aggs.items():
            if col != "*":
                df_cols[col] = batch[col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(df_cols)
        for col, scale in exact_sums.items():
            v = df[col].to_numpy(dtype=np.float64, copy=True)
            v[np.isnan(v)] = 0.0  # skipna-sum semantics: nulls contribute 0
            df[f"_int_{col}"] = np.rint(v * scale).astype(np.int64)
        g = df.groupby(list(keys), dropna=False, sort=False, observed=True)
        out = g.size().rename("_count").to_frame()
        for col, fns in aggs.items():
            if col == "*":
                continue
            for fn in fns:
                if fn == "count":
                    out[f"{col}__count"] = g[col].count()
                elif fn in ("sum", "mean"):
                    if col in exact_sums:
                        out[f"{col}__isum"] = g[f"_int_{col}"].sum()
                    else:
                        # float64 ALWAYS: an all-int block would emit an
                        # int64 partial while a block with nulls emits
                        # float64, giving per-block schema flapping (Ray
                        # warns on every RefBundle) and a dtype decided
                        # by data placement instead of the plan
                        out[f"{col}__sum"] = g[col].sum().astype(np.float64)
                elif fn == "min":
                    out[f"{col}__min"] = g[col].min()
                elif fn == "max":
                    out[f"{col}__max"] = g[col].max()
        out = out.reset_index()
        return table_from_pandas(out)

    return combine


def two_phase_agg(
    ds,
    keys: Sequence[str],
    aggs: dict[str, Sequence[str]],
    *,
    num_salts: int = 16,  # accepted for API compat; no-op (see module doc)
    salt_on: str | None = None,  # accepted for API compat; no-op
    batch_size: int = 64 * 1024,
    driver_finalize: bool = False,
    exact_sums: dict[str, int] | None = None,
):
    """Grouped aggregation with per-batch combining.

    aggs: {column: [fn,...]} with fn in {count,sum,min,max,mean};
    use {"*": ["count"]} for plain row counts. Output columns are
    ``<col>_<fn>`` plus ``count`` for the row count.

    ``exact_sums={col: scale}`` makes that column's sum (and mean)
    bit-deterministic: values are int64-scaled per batch and summed in
    integer arithmetic, so the merge order cannot perturb the result
    (module doc). Use for fixed-decimal inputs (scale=100 for cents).

    Returns a Ray Dataset with one row per distinct key tuple — or,
    with ``driver_finalize=True``, a pyarrow.Table merged on the
    driver: the combine phase stays fully distributed and the driver
    only merges the per-batch partials (≤ groups × blocks rows). Use
    it when the group count is small — it replaces the all-to-all
    groupby shuffle with one tiny collect.
    """
    keys = list(keys)
    exact_sums = exact_sums or {}
    partial = ds.map_batches(
        _partial_stage(keys, aggs, exact_sums),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def _sum_part(col: str) -> str:
        return f"{col}__isum" if col in exact_sums else f"{col}__sum"

    if driver_finalize:
        parts = pa.concat_tables(
            partial.iter_batches(batch_format="pyarrow", batch_size=None),
            promote_options="permissive",
        )
        df = parts.to_pandas()
        g = df.groupby(keys, dropna=False, sort=False, observed=True)
        out = g["_count"].sum().rename("count").to_frame()
        for col, fns in aggs.items():
            if col == "*":
                continue
            for fn in fns:
                if fn == "count":
                    out[f"{col}_count"] = g[f"{col}__count"].sum()
                elif fn == "sum":
                    s = g[_sum_part(col)].sum()
                    out[f"{col}_sum"] = s / exact_sums[col] if col in exact_sums else s
                elif fn == "mean":
                    s = g[_sum_part(col)].sum()
                    if col in exact_sums:
                        s = s / exact_sums[col]
                    out[f"{col}_mean"] = s / out["count"]
                elif fn == "min":
                    out[f"{col}_min"] = g[f"{col}__min"].min()
                elif fn == "max":
                    out[f"{col}_max"] = g[f"{col}__max"].max()
        return table_from_pandas(out.reset_index())
    # phase 2: merge partials (≤ groups × blocks rows). NOT Ray's native
    # groupby().aggregate(): its sort-based aggregate walks group
    # boundaries in per-group Python — measured 56 s for 111k groups of
    # 120k rows vs <1 s for 20 groups. Instead hash-bucket the key
    # tuple into ~cluster-width buckets (a shuffle whose groupby key
    # has only P distinct values) and merge each bucket with ONE
    # vectorized pandas groupby — all merge fns are distributive, and
    # every partial of a key lands in the same bucket by construction.
    merge_plan = [("_count", "sum", "count")]
    finalize_mean = []
    finalize_scale = []
    for col, fns in aggs.items():
        if col == "*":
            continue
        for fn in fns:
            if fn == "count":
                merge_plan.append((f"{col}__count", "sum", f"{col}_count"))
            elif fn == "sum":
                if col in exact_sums:
                    merge_plan.append((f"{col}__isum", "sum", f"{col}__isum_total"))
                    finalize_scale.append(col)
                else:
                    merge_plan.append((f"{col}__sum", "sum", f"{col}_sum"))
            elif fn == "mean":
                if col not in (exact_sums.keys() & {c for c, f in aggs.items() if "sum" in f}):
                    # avoid double-adding the same partial when sum+mean both requested
                    merge_plan.append((_sum_part(col), "sum", f"{col}__msum"))
                finalize_mean.append(col)
            elif fn == "min":
                merge_plan.append((f"{col}__min", "min", f"{col}_min"))
            elif fn == "max":
                merge_plan.append((f"{col}__max", "max", f"{col}_max"))

    out = bucketed_aggregate(partial, keys, merge_plan)
    if finalize_mean or finalize_scale:

        def _fin(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            for col in finalize_scale:
                total = pc.divide(
                    pc.cast(t[f"{col}__isum_total"], pa.float64()),
                    pa.scalar(float(exact_sums[col])),
                )
                t = t.append_column(f"{col}_sum", total)
            for col in finalize_mean:
                if f"{col}__msum" in t.column_names:
                    msum = pc.cast(t[f"{col}__msum"], pa.float64())
                    if col in exact_sums:
                        msum = pc.divide(msum, pa.scalar(float(exact_sums[col])))
                else:  # sum+mean with exact scaling share one partial
                    msum = t[f"{col}_sum"]
                mean = pc.divide(msum, pc.cast(t["count"], pa.float64()))
                t = t.append_column(f"{col}_mean", mean)
            drop = [f"{c}__isum_total" for c in finalize_scale] + [
                f"{c}__msum" for c in finalize_mean if f"{c}__msum" in t.column_names
            ]
            return t.drop_columns(drop)

        out = out.map_batches(_fin, batch_format="pyarrow")
    return out


def group_by_attrs_compact(
    ds,
    keys: Sequence[str],
    *,
    resource_cols: Sequence[str] = (),
    num_salts: int = 16,
):
    """Full groupbyattrsprocessor semantics in columnar form
    (processor.go:70-133, attribute_groups.go:104-169):

    - output GROUPS = distinct (base resource attrs ⊎ grouped key
      values) with per-group record counts — group identity is exact
      attr-map equality, which for fixed columns is the value tuple;
    - grouped keys are REMOVED from record-level attributes (they live
      on the group/resource now) — the returned ``records`` Dataset
      drops the key columns and carries the remaining record attrs.

    Returns (groups_ds, records_ds). Records with all keys null belong
    to the base (non-grouped) resource group (processor.go:83-97).
    """
    cols = list(resource_cols) + list(keys)
    groups = groupby_attrs_counts(ds, cols, num_salts=num_salts, grouped_keys=list(keys))
    keep = [c for c in ds.schema().names if c not in keys]
    if keep:
        records = ds.select_columns(keep)
    else:
        # every column was a grouped key: records remain (empty attr
        # maps in the reference) — keep row identity via a marker
        def _marker(t: pa.Table) -> pa.Table:
            return pa.table({"_record": pa.nulls(len(t), pa.null())})

        records = ds.map_batches(_marker, batch_format="pyarrow")
    return groups, records


def groupby_attrs_counts(
    ds, keys: Sequence[str], *, num_salts: int = 16, grouped_keys: Sequence[str] | None = None
):
    """groupbyattrsprocessor observable output: per-group record counts.

    Rows where ALL key columns are null form the base (non-grouped)
    group, flagged ``grouped=False`` (processor.go:83-97: records
    matching no key go to a base-resource group). Group identity is the
    exact tuple of key values (attribute_groups.go:104-154 full-map
    equality — in columnar form the key tuple IS the identity).
    """
    import pyarrow.compute as pc

    keys = list(keys)
    flag_keys = list(grouped_keys) if grouped_keys is not None else keys
    counted = two_phase_agg(ds, keys, {"*": ["count"]}, num_salts=num_salts)

    def _flag(t: pa.Table) -> pa.Table:
        grouped = None
        for k in flag_keys:
            v = pc.is_valid(t[k])
            grouped = v if grouped is None else pc.or_(grouped, v)
        return t.append_column("grouped", grouped)

    return counted.map_batches(_flag, batch_format="pyarrow")


def histogram_agg(
    ds,
    keys: Sequence[str],
    value_col: str,
    bounds: Sequence[float],
    *,
    num_salts: int = 8,  # accepted for API compat; no-op (see module doc)
    batch_size: int = 64 * 1024,
    value_scale: int | None = None,
):
    """spanmetrics-style explicit-bucket histogram per key tuple
    (processor.go:305-333): per group emit ``call_count``,
    ``<value>_sum`` and ``bucket_0..bucket_len(bounds)`` counts
    (bucket_i = count of values ≤ bounds[i]; last bucket = overflow).
    Two-phase: per-batch searchsorted+bincount partials, Sum merge.

    ``value_scale`` (e.g. 100 for cent-precision values) switches the
    sum to exact int64 arithmetic so the merged double is independent
    of Ray's partial-merge order (module doc: determinism).
    """
    keys = list(keys)
    bounds_arr = np.asarray(list(bounds), dtype=np.float64)
    nb = len(bounds_arr) + 1

    def combine(batch: pa.Table) -> pa.Table:
        vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        bucket = np.searchsorted(bounds_arr, vals, side="left")
        df = pd.DataFrame({k: batch[k].to_numpy(zero_copy_only=False) for k in keys})
        if value_scale is not None:
            df["_v"] = np.rint(vals * value_scale).astype(np.int64)
        else:
            df["_v"] = vals
        g = df.groupby(keys, dropna=False, sort=False, observed=True)
        out = g["_v"].agg(call_count="count", vsum="sum").reset_index()
        # bucket count matrix per group
        codes = g.ngroup().to_numpy()
        mat = np.zeros((out.shape[0], nb), dtype=np.int64)
        np.add.at(mat, (codes, bucket), 1)
        for b in range(nb):
            out[f"bucket_{b}"] = mat[:, b]
        return table_from_pandas(out)

    partial = ds.map_batches(combine, batch_format="pyarrow", batch_size=batch_size)
    plan = [
        ("call_count", "sum", "call_count"),
        ("vsum", "sum", "vsum"),
    ] + [(f"bucket_{b}", "sum", f"bucket_{b}") for b in range(nb)]
    merged = bucketed_aggregate(partial, keys, plan)

    def _fin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.cast(t["vsum"], pa.float64())
        if value_scale is not None:
            v = pc.divide(v, pa.scalar(float(value_scale)))
        i = t.column_names.index("vsum")
        return t.set_column(i, f"{value_col}_sum", v)

    return merged.map_batches(_fin, batch_format="pyarrow")


def statsd_agg(
    ds,
    keys: Sequence[str],
    value_col: str,
    *,
    num_salts: int = 16,
    value_scale: int | None = None,
):
    """statsd counter/gauge/timer rollup per key
    (statsd_parser.go:138-222): count, sum, min, max, mean over the
    value column — the batch-engine equivalent of one flush interval.
    ``value_scale`` → exact int64 sums (see two_phase_agg)."""
    return two_phase_agg(
        ds,
        keys,
        {value_col: ["count", "sum", "min", "max", "mean"]},
        num_salts=num_salts,
        exact_sums={value_col: value_scale} if value_scale else None,
    )


def timer_summary(
    ds,
    keys: Sequence[str],
    value_col: str,
    *,
    percentiles: Sequence[float] = (0, 10, 50, 90, 95, 100),
    num_buckets: int = 64,
    exact_scale: int | None = None,
):
    """statsd TIMER → Summary datapoint (metric_translator.go:63-88):
    per key emit count, sum and NEAREST-RANK percentiles (the
    reference's stats.PercentileNearestRank: sorted[ceil(n·p/100)−1],
    p=0 → min, p=100 → max) at the reference's default quantile set.

    EXACT and distributed: one bucketed shuffle co-locates each key's
    full value multiset (statsd metric names are low-cardinality by
    design — a single key's values must fit one bucket task), then one
    vectorized sort + gather per bucket. Output columns: keys, count,
    ``<value>_sum``, ``p<P>`` per percentile.
    """
    keys = list(keys)
    pcts = list(percentiles)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + [value_col], kind="stable").reset_index(drop=True)
        g = df.groupby(keys, sort=False, observed=True)
        n = g[value_col].transform("size").to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], (g.ngroup().to_numpy()[1:] != g.ngroup().to_numpy()[:-1])])
        )
        sizes = n[starts]
        out = df.iloc[starts][keys].reset_index(drop=True)
        out["count"] = sizes.astype(np.int64)
        if exact_scale:  # fixed-decimal input → exact int64 sum (module doc)
            ints = np.rint(df[value_col].to_numpy() * exact_scale).astype(np.int64)
            isum = np.add.reduceat(ints, starts)
            out[f"{value_col}_sum"] = isum / float(exact_scale)
        else:
            out[f"{value_col}_sum"] = g[value_col].sum().to_numpy()
        vals = df[value_col].to_numpy()
        for p in pcts:
            # nearest rank: ceil(n·p/100) clamped to [1, n], minus 1
            idx = np.maximum(1, np.ceil(sizes * p / 100.0).astype(np.int64)) - 1
            out[f"p{int(p)}"] = vals[starts + np.minimum(idx, sizes - 1)]
        return out

    return bucketed_group_apply(
        ds.select_columns(keys + [value_col]) if hasattr(ds, "select_columns") else ds,
        keys[0],
        per_bucket,
        num_buckets=num_buckets,
    )


def sorted_group_apply(ds, key: str, order_by: str, fn, batch_format: str = "pandas", num_buckets: int = 64):
    """Per-key ordered window: each key's rows, sorted by ``order_by``,
    are passed to ``fn`` as one DataFrame.

    Used for last-write-wins gauges, cumulative→delta conversion
    (datadogexporter metrics_translator.go:106-134) and recombine.

    SCALE: routed through ``bucketed_group_apply`` — ONE shuffle on
    ``hash(key) % num_buckets`` co-locates every key, and Ray schedules
    ``num_buckets`` tasks instead of one per key. ``fn`` still runs
    once per key (that is this API's contract); when the per-key work
    is expressible as a vectorized pandas groupby, call
    ``bucketed_group_apply`` directly instead.
    """

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, order_by], kind="stable")
        outs = [fn(g) for _, g in df.groupby(key, sort=False)]
        return pd.concat(outs, ignore_index=True) if outs else df.iloc[0:0]

    return bucketed_group_apply(ds, key, per_bucket, num_buckets=num_buckets)


def bucketed_group_apply(ds, key: str, fn, *, num_buckets: int = 64):
    """Keyed apply with per-BUCKET Python instead of per-KEY Python.

    Adds ``_bucket = hash(key) % num_buckets``, shuffles on the bucket
    (co-locating every row of each key), and calls ``fn(bucket_df)``
    once per bucket; ``fn`` is expected to run a vectorized pandas
    ``groupby(key)`` itself. Turns millions of per-key calls into
    ``num_buckets`` calls — the scale path for sessionize / delta /
    last-write per user at 10^9-key cardinality. Size num_buckets ≳
    cluster cores; skewed single keys are bounded by the largest key's
    row count (a single key always lands in one bucket).
    """
    from .._util import hash_str_u64, splitmix64

    def add_bucket(batch: pa.Table) -> pa.Table:
        vals = batch[key].to_numpy(zero_copy_only=False)
        if np.issubdtype(vals.dtype, np.number):
            h = splitmix64(vals.astype(np.uint64))  # vectorized for int keys
        else:
            h = hash_str_u64(vals)
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("_bucket", pa.array(b))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame):
        out = fn(g.drop(columns=["_bucket"]))
        if isinstance(out, pd.DataFrame):
            # emit ARROW blocks (metadata-free): pandas blocks re-acquire
            # the unhashable pandas schema blob at the next pyarrow
            # conversion (per-aggregator shuffle warnings) and don't
            # union with arrow datasets; fall back for exotic dtypes
            try:
                return table_from_pandas(out)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                return out
        return out

    return bucketed.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
