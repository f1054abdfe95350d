"""tanzuobservabilityexporter span translation, vectorized.

Re-expresses `exporter/tanzuobservabilityexporter/transformer.go` as a
`map_batches` stage over span rows: OTLP-shaped spans → Wavefront
span records. Semantics (file:line under /root/reference):

* trace/span IDs → UUIDs: trace id = its 16 bytes as a UUID
  (transformer.go:192-198); span/parent id = 8 bytes left-padded to 16
  (:200-219); empty/invalid trace or span id drops the span
  (:58-66); empty parent → the nil UUID (:208-214).
* times: start ms = start_ns/1e6, duration = end-start in ms, and an
  unset end timestamp yields duration 0 (:145-154).
* tags: resource attrs then span attrs (later overwrite, :156-170);
  required tags (:116-128): missing ``service`` falls back to the
  ``service.name`` attr (which is then removed) else
  ``defaultService``; missing ``application`` → ``defaultApp``.
* ``span.kind`` tag from the kind enum (:97-114; unknown → "unknown").
* status (:172-190): always ``status.code=<int>``; code==ERROR adds
  ``error=true`` and ``status.message`` truncated to
  255-len("status.message=") = 240 chars when non-empty.
* non-empty trace state → ``w3c.tracestate`` tag (:81-83).
* span events become SpanLogs (:130-143) — surfaced here as the
  ``n_logs`` count (the batch engine keeps event payloads upstream).

Output tags are rendered as one canonical string ("k=v" joined by
";" in sorted key order) so grouped comparisons are deterministic.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

_KINDS = {"client", "server", "producer", "consumer", "internal", "unspecified"}
_NIL_UUID = "00000000-0000-0000-0000-000000000000"
_MAX_MSG = 255 - len("status.message=")  # transformer.go:183-187


def _uuid_from_hex32(h: pd.Series) -> pd.Series:
    return (
        h.str[0:8] + "-" + h.str[8:12] + "-" + h.str[12:16] + "-"
        + h.str[16:20] + "-" + h.str[20:32]
    )


def _uuid_from_hex16(h: pd.Series) -> pd.Series:
    # 8 bytes left-padded into the last 8 bytes of a UUID (:217-219)
    return "00000000-0000-0000-" + h.str[0:4] + "-" + h.str[4:16]


class TanzuSpanTransformer:
    """Callable map_batches stage: span rows → Wavefront span rows.

    ``resource_attrs``: constant resource attributes (detected once,
    broadcast); ``attr_cols``: span-attribute columns of the input
    table that become tags (NULL = attribute absent on that span)."""

    def __init__(
        self,
        resource_attrs: Mapping[str, str] | None = None,
        attr_cols: Sequence[str] = (),
    ):
        self.resource_attrs = dict(resource_attrs or {})
        self.attr_cols = list(attr_cols)

    def __call__(self, t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = len(df)

        tid = df["trace_id"].fillna("").str.lower()
        sid = df["span_id"].fillna("").str.lower()
        valid = (
            tid.str.fullmatch(r"[0-9a-f]{32}").fillna(False)
            & (tid != "0" * 32)
            & sid.str.fullmatch(r"[0-9a-f]{16}").fillna(False)
            & (sid != "0" * 16)
        )
        df = df[valid].reset_index(drop=True)
        tid, sid = tid[valid.to_numpy()].reset_index(drop=True), sid[valid.to_numpy()].reset_index(drop=True)

        pid = df.get("parent_span_id", pd.Series([None] * len(df))).fillna("").str.lower()
        has_parent = pid.str.fullmatch(r"[0-9a-f]{16}").fillna(False) & (pid != "0" * 16)

        start_ms = (df["start_ns"].fillna(0).astype(np.int64) // 1_000_000)
        end_ns = df["end_ns"].fillna(0).astype(np.int64)
        dur_ms = (end_ns // 1_000_000) - start_ms
        dur_ms = dur_ms.where(end_ns != 0, 0)

        # ---- tag assembly (resource first, span attrs overwrite) ----
        tags: dict[str, pd.Series] = {}
        for k, v in self.resource_attrs.items():
            tags[k] = pd.Series([str(v)] * len(df))
        for c in self.attr_cols:
            if c in df.columns:
                vals = df[c]
                prev = tags.get(c)
                if prev is not None:
                    tags[c] = vals.where(vals.notna(), prev)
                else:
                    tags[c] = vals.where(vals.notna(), None)

        # required tags (:116-128), per row: a missing ``service``
        # consumes ``service.name`` (removing it) else defaults; a
        # present ``service`` leaves ``service.name`` untouched
        svc = tags.get("service", pd.Series([None] * len(df), dtype=object))
        svc_name = tags.pop("service.name", None)
        fallback = pd.Series(["defaultService"] * len(df))
        if svc_name is not None:
            fallback = svc_name.where(svc_name.notna(), fallback)
            tags["service.name"] = svc_name.where(svc.notna(), None)
        tags["service"] = svc.where(svc.notna(), fallback)
        app = tags.get("application")
        if app is None:
            tags["application"] = pd.Series(["defaultApp"] * len(df))
        else:
            tags["application"] = app.where(app.notna(), "defaultApp")

        kind = df.get("kind", pd.Series([None] * len(df))).fillna("unspecified")
        tags["span.kind"] = kind.where(kind.isin(_KINDS), "unknown")

        code = df.get("status_code", pd.Series([0] * len(df))).fillna(0).astype(np.int64)
        tags["status.code"] = code.astype(str)
        is_err = code == 2
        tags["error"] = pd.Series(np.where(is_err, "true", None), dtype=object)
        msg = df.get("status_message", pd.Series([None] * len(df)))
        msg = msg.where(msg.notna() & (msg != "") & is_err, None)
        tags["status.message"] = msg.str.slice(0, _MAX_MSG)

        ts = df.get("trace_state", pd.Series([None] * len(df)))
        tags["w3c.tracestate"] = ts.where(ts.notna() & (ts != ""), None)

        rendered = pd.Series([""] * len(df))
        for k in sorted(tags):
            v = tags[k].reset_index(drop=True)
            frag = pd.Series(
                np.where(v.notna().to_numpy(), k + "=" + v.fillna("").astype(str), ""),
                dtype=object,
            )
            sep = np.where((rendered != "") & (frag != ""), ";", "")
            rendered = rendered + pd.Series(sep) + frag

        n_logs = df.get("n_events", pd.Series([0] * len(df))).fillna(0).astype(np.int64)

        return pa.table(
            {
                "name": pa.array(df["name"].to_numpy(dtype=object), pa.string()),
                "trace_uuid": pa.array(_uuid_from_hex32(tid).to_numpy(dtype=object), pa.string()),
                "span_uuid": pa.array(_uuid_from_hex16(sid).to_numpy(dtype=object), pa.string()),
                "parent_uuid": pa.array(
                    _uuid_from_hex16(pid).where(has_parent, _NIL_UUID).to_numpy(dtype=object),
                    pa.string(),
                ),
                "start_ms": pa.array(start_ms.to_numpy(), pa.int64()),
                "duration_ms": pa.array(dur_ms.to_numpy(), pa.int64()),
                "tags": pa.array(rendered.to_numpy(dtype=object), pa.string()),
                "n_logs": pa.array(n_logs.to_numpy(), pa.int64()),
            }
        )
