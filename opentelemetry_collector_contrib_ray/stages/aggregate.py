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
``map_batches`` (one partial row per (key, salt) per batch — the only
rows that enter the shuffle), phase 2 is a small ``groupby`` over the
partials. Skewed keys (70% app-a in the synthetic corpus) are salted:
partials carry ``_salt = row_hash % num_salts`` so phase 2a spreads a
hot key over ``num_salts`` reducers before the tiny phase 2b merge.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .._util import hash_u64

_AGG_FUNCS = {"count", "sum", "min", "max", "mean"}


def _partial_stage(keys, aggs, num_salts, salt_on):
    """Build the per-batch combiner: batch → one row per (keys, salt)."""

    def combine(batch: pa.Table) -> pa.Table:
        df_cols = {k: batch[k].to_numpy(zero_copy_only=False) for k in keys}
        n = len(batch)
        if num_salts > 1:
            if salt_on and salt_on in batch.column_names:
                ids = hash_u64(
                    np.asarray(
                        pd.util.hash_array(
                            pd.Series(batch[salt_on].to_numpy(zero_copy_only=False)).to_numpy()
                        ),
                        dtype=np.uint64,
                    )
                )
            else:
                ids = hash_u64(np.arange(n, dtype=np.uint64), salt=17)
            df_cols["_salt"] = (ids % np.uint64(num_salts)).astype(np.int64)
        for col, fns in aggs.items():
            if col != "*":
                df_cols[col] = batch[col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(df_cols)
        gkeys = list(keys) + (["_salt"] if num_salts > 1 else [])
        g = df.groupby(gkeys, dropna=False, sort=False, observed=True)
        out = g.size().rename("_count").to_frame()
        for col, fns in aggs.items():
            if col == "*":
                continue
            for fn in fns:
                if fn == "count":
                    out[f"{col}__count"] = g[col].count()
                elif fn in ("sum", "mean"):
                    out[f"{col}__sum"] = g[col].sum()
                elif fn == "min":
                    out[f"{col}__min"] = g[col].min()
                elif fn == "max":
                    out[f"{col}__max"] = g[col].max()
        out = out.reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    return combine


def two_phase_agg(
    ds,
    keys: Sequence[str],
    aggs: dict[str, Sequence[str]],
    *,
    num_salts: int = 16,
    salt_on: str | None = None,
    batch_size: int = 64 * 1024,
    driver_finalize: bool = False,
):
    """Grouped aggregation with per-batch combining and key salting.

    aggs: {column: [fn,...]} with fn in {count,sum,min,max,mean};
    use {"*": ["count"]} for plain row counts. Output columns are
    ``<col>_<fn>`` plus ``count`` for the row count.

    Returns a Ray Dataset with one row per distinct key tuple — or,
    with ``driver_finalize=True``, a pyarrow.Table merged on the
    driver: the combine phase stays fully distributed and the driver
    only merges the per-batch partials (≤ groups × salts × blocks
    rows). Use it when the group count is small — it replaces the
    all-to-all groupby shuffle with one tiny collect.
    """
    from ray.data.aggregate import Max, Min, Sum

    keys = list(keys)
    partial = ds.map_batches(
        _partial_stage(keys, aggs, num_salts, salt_on),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
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
                    out[f"{col}_sum"] = g[f"{col}__sum"].sum()
                elif fn == "mean":
                    out[f"{col}_mean"] = g[f"{col}__sum"].sum() / out["count"]
                elif fn == "min":
                    out[f"{col}_min"] = g[f"{col}__min"].min()
                elif fn == "max":
                    out[f"{col}_max"] = g[f"{col}__max"].max()
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)
    # phase 2: merge partials. With salting the partial key space is
    # (keys × salt); we merge straight to `keys` — Ray hash-partitions on
    # the full key tuple, so pre-salted partials already spread hot keys
    # across batches; the final groupby input is tiny (≤ groups×salts×blocks).
    ray_aggs = [Sum("_count", alias_name="count")]
    finalize_mean = []
    for col, fns in aggs.items():
        if col == "*":
            continue
        for fn in fns:
            if fn == "count":
                ray_aggs.append(Sum(f"{col}__count", alias_name=f"{col}_count"))
            elif fn == "sum":
                ray_aggs.append(Sum(f"{col}__sum", alias_name=f"{col}_sum"))
            elif fn == "mean":
                ray_aggs.append(Sum(f"{col}__sum", alias_name=f"{col}__msum"))
                finalize_mean.append(col)
            elif fn == "min":
                ray_aggs.append(Min(f"{col}__min", alias_name=f"{col}_min"))
            elif fn == "max":
                ray_aggs.append(Max(f"{col}__max", alias_name=f"{col}_max"))
    out = partial.groupby(keys).aggregate(*ray_aggs)
    if finalize_mean:

        def _fin(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            for col in finalize_mean:
                mean = pc.divide(
                    pc.cast(t[f"{col}__msum"], pa.float64()),
                    pc.cast(t["count"], pa.float64()),
                )
                t = t.append_column(f"{col}_mean", mean)
                t = t.drop_columns([f"{col}__msum"])
            return t

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
    num_salts: int = 8,
    batch_size: int = 64 * 1024,
):
    """spanmetrics-style explicit-bucket histogram per key tuple
    (processor.go:305-333): per group emit ``call_count``,
    ``<value>_sum`` and ``bucket_0..bucket_len(bounds)`` counts
    (bucket_i = count of values ≤ bounds[i]; last bucket = overflow).
    Two-phase: per-batch searchsorted+bincount partials, Sum merge.
    """
    from ray.data.aggregate import Sum

    keys = list(keys)
    bounds_arr = np.asarray(list(bounds), dtype=np.float64)
    nb = len(bounds_arr) + 1

    def combine(batch: pa.Table) -> pa.Table:
        vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        bucket = np.searchsorted(bounds_arr, vals, side="left")
        df = pd.DataFrame({k: batch[k].to_numpy(zero_copy_only=False) for k in keys})
        df["_salt"] = (
            hash_u64(np.arange(len(batch), dtype=np.uint64), 23) % np.uint64(num_salts)
        ).astype(np.int64)
        df["_v"] = vals
        df["_b"] = bucket
        g = df.groupby(keys + ["_salt"], dropna=False, sort=False, observed=True)
        out = g["_v"].agg(call_count="count", vsum="sum").reset_index()
        # bucket count matrix per group
        codes = g.ngroup().to_numpy()
        mat = np.zeros((out.shape[0], nb), dtype=np.int64)
        np.add.at(mat, (codes, bucket), 1)
        for b in range(nb):
            out[f"bucket_{b}"] = mat[:, b]
        return pa.Table.from_pandas(out.drop(columns=["_salt"]), preserve_index=False)

    partial = ds.map_batches(combine, batch_format="pyarrow", batch_size=batch_size)
    aggs = [
        Sum("call_count", alias_name="call_count"),
        Sum("vsum", alias_name=f"{value_col}_sum"),
    ] + [Sum(f"bucket_{b}", alias_name=f"bucket_{b}") for b in range(nb)]
    return partial.groupby(keys).aggregate(*aggs)


def statsd_agg(ds, keys: Sequence[str], value_col: str, *, num_salts: int = 16):
    """statsd counter/gauge/timer rollup per key
    (statsd_parser.go:138-222): count, sum, min, max, mean over the
    value column — the batch-engine equivalent of one flush interval."""
    return two_phase_agg(
        ds, keys, {value_col: ["count", "sum", "min", "max", "mean"]}, num_salts=num_salts
    )


def sorted_group_apply(ds, key: str, order_by: str, fn, batch_format: str = "pandas"):
    """Per-key ordered window: ``groupby(key).map_groups(sorted fn)``.

    Used for last-write-wins gauges, cumulative→delta conversion
    (datadogexporter metrics_translator.go:106-134) and recombine.
    The shuffle co-locates each key; ``fn`` sees the group sorted by
    ``order_by``.

    SCALE NOTE: map_groups makes one Python call per key. For
    high-cardinality keys use ``bucketed_group_apply`` — same shuffle
    semantics, but the per-key work happens in a vectorized pandas
    groupby inside each of B buckets.
    """

    def wrapped(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.sort_values(order_by, kind="stable"))

    return ds.groupby(key).map_groups(wrapped, batch_format=batch_format)


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

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=["_bucket"]))

    return bucketed.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
