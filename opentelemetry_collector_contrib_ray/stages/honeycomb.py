"""honeycombexporter span → libhoney event rows, vectorized.

Re-expresses `exporter/honeycombexporter/honeycomb.go` (+translator.go)
as a `map_batches` stage. Per span, ONE main event carrying resource
attrs + library.name/version + span attrs + ids + duration_ms
((end-start)/1ms as float, honeycomb.go:139-148) + span_kind
(:177-196) + status.code int and status.message (the status message,
else the status-code enum name — translator.go getStatusMessage; this
engine renders the proto enum names STATUS_CODE_{UNSET,OK,ERROR}).
Span links become separate events with annotation_type "link"
(:198-224); span events become annotation_type "span_event" rows that
carry the parent span's name (:226-262). A configured
``sample_rate_attribute`` copies an INT attribute into the event's
sample rate (non-int values ignored, :290-301); default rate is 1
(libhoney default).

The batch engine carries link/event payloads upstream; here their
multiplicity arrives as ``n_links`` / ``n_events`` count columns and
the stage emits one typed row per link/event (np.repeat) with the
span's identifiers — the exporter's per-item fan-out shape.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

_STATUS_NAME = {0: "STATUS_CODE_UNSET", 1: "STATUS_CODE_OK", 2: "STATUS_CODE_ERROR"}
_KINDS = {"client", "server", "producer", "consumer", "internal"}


class HoneycombEvents:
    def __init__(
        self,
        resource_attrs: Mapping[str, str] | None = None,
        attr_cols: Sequence[str] = (),
        sample_rate_attribute: str | None = None,
    ):
        self.resource_attrs = dict(resource_attrs or {})
        self.attr_cols = list(attr_cols)
        self.sample_rate_attribute = sample_rate_attribute

    def __call__(self, t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = len(df)

        start = df["start_ns"].fillna(0).astype(np.int64)
        end = df["end_ns"].fillna(0).astype(np.int64)
        dur_ms = (end - start).astype(np.float64) / 1e6

        kind = df.get("kind", pd.Series([None] * n)).fillna("unspecified")
        kind = kind.where(kind.isin(_KINDS), "unspecified")

        code = df.get("status_code", pd.Series([0] * n)).fillna(0).astype(np.int64)
        msg = df.get("status_message", pd.Series([None] * n))
        msg = msg.where(msg.notna() & (msg != ""), code.map(lambda c: _STATUS_NAME.get(int(c), str(c))))

        rate = np.ones(n, dtype=np.int64)
        sra = self.sample_rate_attribute
        if sra and sra in df.columns:
            v = pd.to_numeric(df[sra], errors="coerce")
            # only int-typed attribute values apply (:294-299)
            is_int = v.notna() & (v == v.round())
            rate = np.where(is_int, v.fillna(1).astype(np.int64), 1)

        main = pd.DataFrame(
            {
                "annotation_type": "span",
                "trace_id": df["trace_id"],
                "id": df["span_id"],
                "parent_id": df.get("parent_span_id", pd.Series([None] * n)).fillna(""),
                "name": df["name"],
                "parent_name": None,
                "duration_ms": dur_ms,
                "span_kind": kind,
                "status_code": code,
                "status_message": msg,
                "sample_rate": rate,
            }
        )
        frames = [main]

        for col, ann in (("n_links", "link"), ("n_events", "span_event")):
            cnt = df.get(col, pd.Series([0] * n)).fillna(0).astype(np.int64).to_numpy()
            if cnt.sum() == 0:
                continue
            idx = np.repeat(np.arange(n), cnt)
            sub = df.iloc[idx]
            frames.append(
                pd.DataFrame(
                    {
                        "annotation_type": ann,
                        "trace_id": sub["trace_id"].to_numpy(),
                        "id": "",
                        # link/span_event rows parent to the SPAN (:205-212, :250-257)
                        "parent_id": sub["span_id"].to_numpy(),
                        "name": "" if ann == "link" else sub["name"].to_numpy(),
                        "parent_name": None if ann == "link" else sub["name"].to_numpy(),
                        "duration_ms": 0.0,
                        "span_kind": None,
                        "status_code": 0,
                        "status_message": None,
                        "sample_rate": rate[idx],
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        return pa.table(
            {
                "annotation_type": pa.array(out["annotation_type"].to_numpy(dtype=object), pa.string()),
                "trace_id": pa.array(out["trace_id"].to_numpy(dtype=object), pa.string()),
                "id": pa.array(out["id"].to_numpy(dtype=object), pa.string()),
                "parent_id": pa.array(out["parent_id"].to_numpy(dtype=object), pa.string()),
                "name": pa.array(out["name"].where(out["name"].notna(), None).to_numpy(dtype=object), pa.string()),
                "parent_name": pa.array(out["parent_name"].where(out["parent_name"].notna(), None).to_numpy(dtype=object), pa.string()),
                "duration_ms": pa.array(out["duration_ms"].astype(np.float64), pa.float64()),
                "span_kind": pa.array(out["span_kind"].where(out["span_kind"].notna(), None).to_numpy(dtype=object), pa.string()),
                "status_code": pa.array(out["status_code"].astype(np.int64), pa.int64()),
                "status_message": pa.array(out["status_message"].where(out["status_message"].notna(), None).to_numpy(dtype=object), pa.string()),
                "sample_rate": pa.array(out["sample_rate"].astype(np.int64), pa.int64()),
            }
        )
