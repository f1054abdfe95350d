"""humioexporter + uptraceexporter span translations, vectorized.

Humio (exporter/humioexporter/traces_exporter.go:118-260 +
tag_strategy.go):
* a resource WITHOUT service.name drops ALL its spans with an error
  (:127-131,147-158) — surfaced as a per-batch dropped count.
* per span one structured event: Timestamp = start time; attributes
  are span attrs merged over resource attrs, PLUS
  instrumentation.library.name/version when non-empty, MINUS
  service.name (hoisted into the event's ServiceName field,
  :163-180).
* span fields: hex ids (invalid → ""), enum-name kind
  ("SPAN_KIND_SERVER") and status ("STATUS_CODE_OK"), ns timestamps,
  links as (trace_id, span_id, trace_state) triples (:180-211).
* tagging strategies (tag_strategy.go:20-100): events group into
  payloads keyed by "" (none), the trace id, or the service name;
  the non-empty tag renders as {strategy: tag}.

Uptrace (exporter/uptraceexporter/exporter.go:41-82 +
translator.go:27-52):
* span/parent ids are LITTLE-endian uint64 of the 8 id bytes
  (translator.go:27-29) — unlike jaeger's big-endian signed read.
* kind lowercased with "internal" default; status code lowercase
  unset/ok/error; ns timestamps; tracer name/version from the
  instrumentation library.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

_KIND_ENUM = {
    "unspecified": "SPAN_KIND_UNSPECIFIED",
    "internal": "SPAN_KIND_INTERNAL",
    "server": "SPAN_KIND_SERVER",
    "client": "SPAN_KIND_CLIENT",
    "producer": "SPAN_KIND_PRODUCER",
    "consumer": "SPAN_KIND_CONSUMER",
}
_STATUS_ENUM = {0: "STATUS_CODE_UNSET", 1: "STATUS_CODE_OK", 2: "STATUS_CODE_ERROR"}

_UPTRACE_KINDS = {"client", "server", "producer", "consumer"}
_UPTRACE_STATUS = {1: "ok", 2: "error"}


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


def _hex_id(df: pd.DataFrame, col: str, width: int) -> pd.Series:
    """HexString(): "" for invalid or all-zero ids."""
    s = _opt(df, col).fillna("").astype(str).str.lower()
    ok = s.str.fullmatch(rf"[0-9a-f]{{{width}}}").fillna(False) & (
        s != "0" * width
    )
    return s.where(ok, "")


class HumioSpanEvents:
    """Callable map_batches stage: span rows → Humio structured-event
    rows. ``resource_attrs`` is the constant resource (no service.name
    → every row drops, counted); ``tag_strategy``: none | trace_id |
    service_name."""

    def __init__(
        self,
        resource_attrs: Mapping[str, str] | None = None,
        instrumentation: tuple[str, str] = ("", ""),
        tag_strategy: str = "none",
        attr_cols: Sequence[str] = (),
    ):
        self.resource_attrs = dict(resource_attrs or {})
        self.instrumentation = instrumentation
        self.tag_strategy = tag_strategy
        self.attr_cols = list(attr_cols)
        self.service_name = str(self.resource_attrs.get("service.name", ""))
        self.has_service = "service.name" in self.resource_attrs

    def __call__(self, t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = len(df)
        if not self.has_service:
            # the whole resource is dropped (:127-131); one sentinel
            # row carries the per-batch dropped count
            return pa.table(
                {
                    "tag": pa.array(["__dropped__"], pa.string()),
                    "timestamp_ns": pa.array([0], pa.int64()),
                    "trace_id": pa.array([""], pa.string()),
                    "span_id": pa.array([""], pa.string()),
                    "parent_span_id": pa.array([""], pa.string()),
                    "name": pa.array([""], pa.string()),
                    "kind": pa.array([""], pa.string()),
                    "status_code": pa.array([""], pa.string()),
                    "status_description": pa.array([""], pa.string()),
                    "service_name": pa.array([""], pa.string()),
                    "attrs": pa.array([""], pa.string()),
                    "n_links": pa.array([0], pa.int64()),
                    "n_dropped": pa.array([n], pa.int64()),
                }
            )

        tid = _hex_id(df, "trace_id", 32)
        sid = _hex_id(df, "span_id", 16)
        pid = _hex_id(df, "parent_span_id", 16)
        start = _num(df, "start_ns")
        kind = _opt(df, "kind").fillna("unspecified").str.lower()
        kind_enum = kind.map(_KIND_ENUM).fillna("SPAN_KIND_UNSPECIFIED")
        code = _num(df, "status_code")
        status = code.map(_STATUS_ENUM).fillna("STATUS_CODE_UNSET")

        # attributes: span attrs over resource attrs, minus
        # service.name, plus instrumentation fields — rendered
        # canonically as "k=v;..." in sorted key order
        tags: dict[str, pd.Series] = {}
        for k, v in self.resource_attrs.items():
            if k == "service.name":
                continue
            tags[k] = pd.Series([str(v)] * n)
        for c in self.attr_cols:
            if c in df.columns:
                v = df[c].reset_index(drop=True)
                prev = tags.get(c)
                tags[c] = v.where(v.notna(), prev)
        iname, iver = self.instrumentation
        if iname:
            tags["instrumentation.library.name"] = pd.Series([iname] * n)
            if iver:
                tags["instrumentation.library.version"] = pd.Series([iver] * n)
        rendered = pd.Series([""] * n)
        for k in sorted(tags):
            v = tags[k].reset_index(drop=True)
            frag = pd.Series(
                np.where(v.notna().to_numpy(), k + "=" + v.fillna("").astype(str), ""),
                dtype=object,
            )
            sep = np.where((rendered != "") & (frag != ""), ";", "")
            rendered = rendered + pd.Series(sep) + frag

        if self.tag_strategy == "trace_id":
            tag = tid
        elif self.tag_strategy == "service_name":
            tag = pd.Series([self.service_name] * n)
        else:
            tag = pd.Series([""] * n)

        return pa.table(
            {
                "tag": pa.array(tag.to_numpy(dtype=object), pa.string()),
                "timestamp_ns": pa.array(start.to_numpy(), pa.int64()),
                "trace_id": pa.array(tid.to_numpy(dtype=object), pa.string()),
                "span_id": pa.array(sid.to_numpy(dtype=object), pa.string()),
                "parent_span_id": pa.array(pid.to_numpy(dtype=object), pa.string()),
                "name": pa.array(
                    _opt(df, "name").fillna("").to_numpy(dtype=object), pa.string()
                ),
                "kind": pa.array(kind_enum.to_numpy(dtype=object), pa.string()),
                "status_code": pa.array(status.to_numpy(dtype=object), pa.string()),
                "status_description": pa.array(
                    _opt(df, "status_message").fillna("").to_numpy(dtype=object),
                    pa.string(),
                ),
                "service_name": pa.array([self.service_name] * n, pa.string()),
                "attrs": pa.array(rendered.to_numpy(dtype=object), pa.string()),
                "n_links": pa.array(_num(df, "n_links").to_numpy(), pa.int64()),
                "n_dropped": pa.array(
                    [0] * n, pa.int64()
                ),
            }
        )


def uptrace_id_u64(hex16: str) -> int:
    """Little-endian uint64 of the 8 id bytes (translator.go:27-29);
    missing/invalid ids read as zero bytes → 0."""
    if len(hex16) != 16:
        return 0
    try:
        return int.from_bytes(bytes.fromhex(hex16), "little")
    except ValueError:
        return 0


class UptraceSpanTransformer:
    """Callable map_batches stage: span rows → uptrace span rows
    (exporter.go:41-82)."""

    def __init__(self, instrumentation: tuple[str, str] = ("", "")):
        self.instrumentation = instrumentation

    def __call__(self, t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = len(df)
        sid_hex = _opt(df, "span_id").fillna("").astype(str).str.lower()
        pid_hex = _opt(df, "parent_span_id").fillna("").astype(str).str.lower()
        # vectorized LE u64: decode the concatenated hex, view as <u8
        ids = np.zeros(n, np.uint64)
        for out, hexes in ((ids, sid_hex),):
            ok = hexes.str.fullmatch(r"[0-9a-f]{16}").fillna(False).to_numpy()
            if ok.any():
                blob = bytes.fromhex("".join(hexes[ok]))
                out[ok] = np.frombuffer(blob, dtype="<u8")
        pids = np.zeros(n, np.uint64)
        okp = pid_hex.str.fullmatch(r"[0-9a-f]{16}").fillna(False).to_numpy()
        if okp.any():
            blob = bytes.fromhex("".join(pid_hex[okp]))
            pids[okp] = np.frombuffer(blob, dtype="<u8")

        kind = _opt(df, "kind").fillna("").str.lower()
        kind = kind.where(kind.isin(_UPTRACE_KINDS), "internal")
        code = _num(df, "status_code")
        status = code.map(_UPTRACE_STATUS).fillna("unset")
        iname, iver = self.instrumentation
        return pa.table(
            {
                "id": pa.array(ids, pa.uint64()),
                "parent_id": pa.array(pids, pa.uint64()),
                "trace_id": pa.array(
                    _opt(df, "trace_id").fillna("").to_numpy(dtype=object),
                    pa.string(),
                ),
                "name": pa.array(
                    _opt(df, "name").fillna("").to_numpy(dtype=object), pa.string()
                ),
                "kind": pa.array(kind.to_numpy(dtype=object), pa.string()),
                "start_ns": pa.array(_num(df, "start_ns").to_numpy(), pa.int64()),
                "end_ns": pa.array(_num(df, "end_ns").to_numpy(), pa.int64()),
                "status_code": pa.array(status.to_numpy(dtype=object), pa.string()),
                "status_message": pa.array(
                    _opt(df, "status_message").fillna("").to_numpy(dtype=object),
                    pa.string(),
                ),
                "tracer_name": pa.array([iname] * n, pa.string()),
                "tracer_version": pa.array([iver] * n, pa.string()),
                "n_events": pa.array(_num(df, "n_events").to_numpy(), pa.int64()),
                "n_links": pa.array(_num(df, "n_links").to_numpy(), pa.int64()),
            }
        )
