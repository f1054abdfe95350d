"""alibabacloudlogserviceexporter translations, vectorized.

Re-expresses `exporter/alibabacloudlogserviceexporter/` — the log /
span / metric → Alibaba SLS Log translations — as map_batches stages.
Semantics (file:line under /root/reference):

Logs (logsdata_to_logservice.go:46-185):
* a record with a NULL body is dropped (:126-129).
* every record carries the resource contents ``host`` (host.name,
  "" when absent), ``service`` (service.name, "" when absent) and
  ``resource`` = JSON of the REMAINING resource attributes
  (:70-113), plus ``otlp.name``/``otlp.version`` from the
  instrumentation library (:115-123).
* record fields: timeUnixNano, severityNumber (decimal string),
  severityText, name, attribute (JSON of attrs), content (the body
  as string), flags as lowercase HEX (:137-180).

Spans (tracedata_to_logservice.go:47-160): per span one SLS log at
Time = end-time seconds (now if unset), with fields traceID/spanID/
parentSpanID (hex, "" when invalid), kind (lowercase OpenTracing
short string, "unspecified" default), name, links/logs as JSON
arrays, traceState, start/end/duration in MICROseconds (ns/1000),
attribute JSON, statusCode ("UNSET"/"OK"/"ERROR"), statusMessage.

Metrics (metricsdata_to_logservice.go:29-357): every datapoint
becomes an SLS log with exactly __name__ / __labels__ /
__time_nano__ / __value__:
* __name__ via formatMetricName: bytes outside [a-zA-Z0-9_:] → '_'
  (:101-122).
* __labels__ = "key#$#value|key#$#value" in SORTED key order; keys
  sanitized per sanitize.go: non-alphanumeric runes → '_', a leading
  digit prefixes "key_", a leading '_' prefixes "key" (:84-99).
* __value__ via Go strconv.FormatFloat(v, 'g', -1, 64) — shortest
  round-trip digits, scientific form only when the decimal exponent
  is < -4 or >= 21, two-digit exponent (``format_go_g`` mirrors this
  bug-for-bug).
* gauge/sum datapoints → one log of the value; histograms → _sum,
  _count, and per-bucket ``_bucket`` logs with an ``le`` label
  (last bound "+Inf"); summaries → _sum, _count, and per-quantile
  logs named WITHOUT a suffix carrying a ``quantile`` label
  (:205-336).
"""

from __future__ import annotations

import math
import re
from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .sinks import _json_escape

_NAME_BAD = re.compile(r"[^a-zA-Z0-9_:]")
_KEY_BAD = re.compile(r"[^0-9A-Za-z]")

_KIND_SHORT = {
    "internal": "internal", "client": "client", "server": "server",
    "producer": "producer", "consumer": "consumer",
}
_STATUS_SHORT = {1: "OK", 2: "ERROR"}


def format_metric_name(name: str) -> str:
    return _NAME_BAD.sub("_", name)  # metricsdata_to_logservice.go:101-122


def sanitize_key(k: str) -> str:
    """sanitize.go:26-53 (non-alnum → '_', digit/underscore prefixes)."""
    if not k:
        return k
    s = _KEY_BAD.sub("_", k)
    if s[0].isdigit():
        s = "key_" + s
    if s[0] == "_":
        s = "key" + s
    return s


def format_go_g(v: float) -> str:
    """Go strconv.FormatFloat(v, 'g', -1, 64): shortest round-trip
    digits; %e form iff decimal exponent < -4 or >= 21; exponent
    always signed with ≥2 digits."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == 0:
        return "-0" if math.copysign(1.0, v) < 0 else "0"
    sign = "-" if v < 0 else ""
    r = repr(abs(float(v)))  # shortest round-trip decimal
    if "e" in r:
        mant, _, es = r.partition("e")
        exp = int(es)
    else:
        mant, exp = r, 0
    ip, _, fp = mant.partition(".")
    digits = (ip + fp).lstrip("0")
    if ip.lstrip("0"):
        lead = len(ip.lstrip("0")) - 1 + exp
    else:
        nz = len(fp) - len(fp.lstrip("0"))
        lead = -nz - 1 + exp
    digits = digits.rstrip("0") or "0"
    if -4 <= lead < 21:
        if lead >= len(digits) - 1:
            out = digits + "0" * (lead - (len(digits) - 1))
        elif lead >= 0:
            out = digits[: lead + 1] + "." + digits[lead + 1 :]
        else:
            out = "0." + "0" * (-lead - 1) + digits
        return sign + out
    mant_out = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
    return f"{sign}{mant_out}e{'+' if lead >= 0 else '-'}{abs(lead):02d}"


def _opt(df: pd.DataFrame, col: str, default=None) -> pd.Series:
    if col in df.columns:
        return df[col].reset_index(drop=True)
    return pd.Series([default] * len(df), dtype=object)


def _num(df: pd.DataFrame, col: str) -> pd.Series:
    if col in df.columns:
        return (
            pd.to_numeric(df[col], errors="coerce")
            .fillna(0)
            .astype(np.int64)
            .reset_index(drop=True)
        )
    return pd.Series(np.zeros(len(df), np.int64))


def _attrs_json(df: pd.DataFrame, attr_cols: Sequence[str]) -> pd.Series:
    """Vectorized Go json.Marshal(map[string]string): sorted keys,
    '{"k":"v",...}', NULL attrs absent."""
    n = len(df)
    combined = pd.Series([None] * n, dtype=object)
    for c in sorted(attr_cols):
        if c not in df.columns:
            continue
        v = df[c].reset_index(drop=True)
        esc = _json_escape(v.dropna().astype(str))
        frag = pd.Series([None] * n, dtype=object)
        frag[esc.index] = '"' + c + '":"' + esc + '"'
        both = combined.notna() & frag.notna()
        combined = combined.where(~both, combined + "," + frag)
        combined = combined.where(combined.notna(), frag)
    return "{" + combined.fillna("") + "}"


class SlsLogTranslator:
    """Callable map_batches stage: log rows → SLS content rows.

    Input columns: ts_ns, severity_number, severity_text, log_name,
    body (NULL → row dropped), flags, plus ``attr_cols``. Resource
    attrs and the instrumentation library are constants."""

    def __init__(
        self,
        resource_attrs: Mapping[str, str] | None = None,
        instrumentation: tuple[str, str] = ("", ""),
        attr_cols: Sequence[str] = (),
    ):
        res = dict(resource_attrs or {})
        self.host = str(res.pop("host.name", ""))
        self.service = str(res.pop("service.name", ""))
        import json as _json

        self.resource_json = _json.dumps(
            {k: str(v) for k, v in res.items()}, sort_keys=True,
            separators=(",", ":"),
        )
        self.otlp_name, self.otlp_version = instrumentation
        self.attr_cols = list(attr_cols)

    def __call__(self, t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        body = _opt(df, "body")
        keep = body.notna().to_numpy()
        n_dropped = int((~keep).sum())
        df = df[keep].reset_index(drop=True)
        n = len(df)
        ts = _num(df, "ts_ns")
        sev_num = _num(df, "severity_number")
        flags = _num(df, "flags")
        attr_json = _attrs_json(df, self.attr_cols)
        return pa.table(
            {
                "time_sec": pa.array((ts // 1_000_000_000).to_numpy(), pa.int64()),
                "host": pa.array([self.host] * n, pa.string()),
                "service": pa.array([self.service] * n, pa.string()),
                "resource": pa.array([self.resource_json] * n, pa.string()),
                "otlp_name": pa.array([self.otlp_name] * n, pa.string()),
                "otlp_version": pa.array([self.otlp_version] * n, pa.string()),
                "timeUnixNano": pa.array(ts.astype(str).to_numpy(dtype=object), pa.string()),
                "severityNumber": pa.array(
                    sev_num.astype(str).to_numpy(dtype=object), pa.string()
                ),
                "severityText": pa.array(
                    _opt(df, "severity_text").fillna("").to_numpy(dtype=object),
                    pa.string(),
                ),
                "name": pa.array(
                    _opt(df, "log_name").fillna("").to_numpy(dtype=object), pa.string()
                ),
                "attribute": pa.array(attr_json.to_numpy(dtype=object), pa.string()),
                "content": pa.array(
                    body[keep].reset_index(drop=True).astype(str).to_numpy(dtype=object),
                    pa.string(),
                ),
                "flags": pa.array(
                    flags.apply(lambda x: format(x, "x")).to_numpy(dtype=object),
                    pa.string(),
                ),
                "n_dropped": pa.array(
                    [n_dropped] + [0] * max(0, n - 1) if n else [], pa.int64()
                ),
            }
        )


class SlsSpanTranslator:
    """Callable map_batches stage: span rows → SLS span-log rows
    (tracedata_to_logservice.go:47-160)."""

    def __init__(self, attr_cols: Sequence[str] = ()):
        self.attr_cols = list(attr_cols)

    def __call__(self, t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = len(df)
        tid = _opt(df, "trace_id").fillna("").astype(str).str.lower()
        sid = _opt(df, "span_id").fillna("").astype(str).str.lower()
        pid = _opt(df, "parent_span_id").fillna("").astype(str).str.lower()
        # HexString() returns "" for invalid/zero ids — "compatible for
        # log service" (:100-104)
        pid_ok = pid.str.fullmatch(r"[0-9a-f]{16}").fillna(False) & (pid != "0" * 16)
        kind = _opt(df, "kind").fillna("").str.lower()
        kind_short = kind.map(_KIND_SHORT).fillna("unspecified")
        start = _num(df, "start_ns")
        end = _num(df, "end_ns")
        code = _num(df, "status_code")
        status = pd.Series(
            np.select([code == 1, code == 2], ["OK", "ERROR"], default="UNSET"),
            dtype=object,
        )
        n_links = _num(df, "n_links")
        n_events = _num(df, "n_events")
        attr_json = _attrs_json(df, self.attr_cols)
        return pa.table(
            {
                "time_sec": pa.array((end // 1_000_000_000).to_numpy(), pa.int64()),
                "traceID": pa.array(tid.to_numpy(dtype=object), pa.string()),
                "spanID": pa.array(sid.to_numpy(dtype=object), pa.string()),
                "parentSpanID": pa.array(
                    pid.where(pid_ok, "").to_numpy(dtype=object), pa.string()
                ),
                "kind": pa.array(kind_short.to_numpy(dtype=object), pa.string()),
                "name": pa.array(
                    _opt(df, "name").fillna("").to_numpy(dtype=object), pa.string()
                ),
                "traceState": pa.array(
                    _opt(df, "trace_state").fillna("").to_numpy(dtype=object),
                    pa.string(),
                ),
                "start": pa.array(
                    (start // 1_000).astype(str).to_numpy(dtype=object), pa.string()
                ),
                "end": pa.array(
                    (end // 1_000).astype(str).to_numpy(dtype=object), pa.string()
                ),
                "duration": pa.array(
                    ((end - start) // 1_000).astype(str).to_numpy(dtype=object),
                    pa.string(),
                ),
                "attribute": pa.array(attr_json.to_numpy(dtype=object), pa.string()),
                "statusCode": pa.array(status.to_numpy(dtype=object), pa.string()),
                "statusMessage": pa.array(
                    _opt(df, "status_message").fillna("").to_numpy(dtype=object),
                    pa.string(),
                ),
                "n_links": pa.array(n_links.to_numpy(), pa.int64()),
                "n_logs": pa.array(n_events.to_numpy(), pa.int64()),
            }
        )


def sls_metric_logs(df: pd.DataFrame, label_cols: Sequence[str] = ()) -> pd.DataFrame:
    """Metric datapoint rows → SLS metric logs
    (metricsdata_to_logservice.go:124-357). Input columns: name,
    dtype (gauge|sum|histogram|summary), value, ts_ns; histograms add
    ``bounds`` + ``bucket_counts`` (lists), ``sum``/``count``;
    summaries add ``quantiles``/``qvalues`` + ``sum``/``count``.
    Emits __name__/__labels__/__time_nano__/__value__ rows."""
    out_name, out_labels, out_ts, out_val = [], [], [], []

    def render(kvs: list[tuple[str, str]]) -> str:
        return "|".join(f"{k}#$#{v}" for k, v in sorted(kvs))

    def emit(name: str, kvs, ts: int, value: float):
        out_name.append(format_metric_name(name))
        out_labels.append(render(kvs))
        out_ts.append(str(ts))
        out_val.append(format_go_g(float(value)))

    for d in df.to_dict("records"):
        kvs = [
            (sanitize_key(c), str(d[c]))
            for c in label_cols
            if d.get(c) is not None
        ]
        name = d["name"]
        ts = int(d.get("ts_ns") or 0)
        dtype = d.get("dtype", "gauge")
        if dtype in ("gauge", "sum"):
            emit(name, kvs, ts, d.get("value", 0.0))
        elif dtype == "histogram":
            emit(name + "_sum", kvs, ts, d.get("sum", 0.0))
            emit(name + "_count", kvs, ts, d.get("count", 0))
            bounds = list(d.get("bounds") or [])
            counts = list(d.get("bucket_counts") or [])
            bounds_str = [format_go_g(b) for b in bounds] + ["+Inf"]
            for i in range(min(len(bounds_str), len(counts))):
                emit(
                    name + "_bucket",
                    kvs + [("le", bounds_str[i])],
                    ts,
                    counts[i],
                )
        elif dtype == "summary":
            emit(name + "_sum", kvs, ts, d.get("sum", 0.0))
            emit(name + "_count", kvs, ts, d.get("count", 0))
            qs = list(d.get("quantiles") or [])
            qvs = list(d.get("qvalues") or [])
            for q, qv in zip(qs, qvs):
                emit(name, kvs + [("quantile", format_go_g(q))], ts, qv)
    return pd.DataFrame(
        {
            "__name__": out_name,
            "__labels__": out_labels,
            "__time_nano__": out_ts,
            "__value__": out_val,
        }
    )
