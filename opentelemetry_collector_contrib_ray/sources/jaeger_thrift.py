"""jaegerthrifthttpexporter wire codec + span translation.

Re-expresses `exporter/jaegerthrifthttpexporter/` — the translation of
span rows into Jaeger Thrift `Batch` structs and their Apache Thrift
**TBinaryProtocol** serialization (exporter.go:129-136 uses
thrift.TBinaryProtocol over a memory buffer) — from the public Thrift
binary-protocol spec and the public jaeger.thrift IDL. Semantics
(file:line under /root/reference):

Translation (protospan_to_jaegerthrift.go):
* trace id = 16 bytes → (TraceIdHigh, TraceIdLow) signed big-endian
  int64 pair (:493-500); an all-zero trace id or span id is an error
  (:198-211) — the row is dropped and counted.
* ParentSpanId only when present (:212-219); times are epoch
  MICROseconds, duration = end - start (:220-230,443-448).
* attribute tags: string / long / bool / double by value type
  (:450-491).
* a ``span.kind`` tag is appended from the span kind ONLY when the
  attributes don't already carry one, and only client/server kinds
  produce a value (:235-238,313-334).
* ``status.code`` (LONG) + non-empty ``status.message`` (STRING) tags
  are appended only when NEITHER key exists in the attributes
  (:239-243,290-311).
* links → SpanRefs: PARENT_LINKED_SPAN → CHILD_OF, everything else
  FOLLOWS_FROM (:250-288).
* the Process carries serviceName + resource label tags; with no
  node info at all the "unknown-service-name" process is used
  (:31,66-184).

Wire format (Apache Thrift binary protocol, public spec): each field
is [type:u8][field-id:i16 BE][value]; struct ends with STOP (0);
strings/binary are [len:i32 BE][bytes]; lists are [elem-type:u8]
[count:i32 BE][elems]; i16/i32/i64/double big-endian; bool one byte.

jaeger.thrift field ids (public IDL):
  Batch{1:process STRUCT, 2:spans LIST<STRUCT>}
  Process{1:serviceName STRING, 2:tags LIST<STRUCT>}
  Tag{1:key STRING, 2:vType I32, 3:vStr STRING, 4:vDouble DOUBLE,
      5:vBool BOOL, 6:vLong I64, 7:vBinary STRING}
  Log{1:timestamp I64, 2:fields LIST<STRUCT>}
  SpanRef{1:refType I32, 2:traceIdLow I64, 3:traceIdHigh I64,
          4:spanId I64}
  Span{1:traceIdLow I64, 2:traceIdHigh I64, 3:spanId I64,
       4:parentSpanId I64, 5:operationName STRING,
       6:references LIST<STRUCT>, 7:flags I32, 8:startTime I64,
       9:duration I64, 10:tags LIST<STRUCT>, 11:logs LIST<STRUCT>}
"""

from __future__ import annotations

import struct

# Thrift binary-protocol type codes
T_STOP, T_BOOL, T_BYTE, T_DOUBLE = 0, 2, 3, 4
T_I16, T_I32, T_I64, T_STRING = 6, 8, 10, 11
T_STRUCT, T_MAP, T_SET, T_LIST = 12, 13, 14, 15

TAG_STRING, TAG_DOUBLE, TAG_BOOL, TAG_LONG, TAG_BINARY = 0, 1, 2, 3, 4
REF_CHILD_OF, REF_FOLLOWS_FROM = 0, 1

UNKNOWN_SERVICE = "unknown-service-name"  # protospan_to_jaegerthrift.go:31


class ThriftWriter:
    def __init__(self):
        self.buf = bytearray()

    def field(self, ftype: int, fid: int):
        self.buf += struct.pack(">bh", ftype, fid)

    def stop(self):
        self.buf.append(T_STOP)

    def i32(self, v: int):
        self.buf += struct.pack(">i", v)

    def i64(self, v: int):
        self.buf += struct.pack(">q", v)

    def double(self, v: float):
        self.buf += struct.pack(">d", v)

    def boolean(self, v: bool):
        self.buf.append(1 if v else 0)

    def string(self, s: str | bytes):
        b = s.encode("utf-8") if isinstance(s, str) else s
        self.i32(len(b))
        self.buf += b

    def list_header(self, elem_type: int, count: int):
        self.buf += struct.pack(">bi", elem_type, count)


class ThriftReader:
    def __init__(self, data: bytes):
        self.data = data
        self.i = 0

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.data):
            raise ValueError("thrift: unexpected end of buffer")
        b = self.data[self.i : self.i + n]
        self.i += n
        return b

    def u8(self) -> int:
        return self.take(1)[0]

    def i16(self) -> int:
        return struct.unpack(">h", self.take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def double(self) -> float:
        return struct.unpack(">d", self.take(8))[0]

    def boolean(self) -> bool:
        return self.u8() != 0

    def string(self) -> str:
        return self.take(self.i32()).decode("utf-8")

    def field(self) -> tuple[int, int]:
        ftype = self.u8()
        if ftype == T_STOP:
            return T_STOP, 0
        return ftype, self.i16()

    def list_header(self) -> tuple[int, int]:
        return self.u8(), self.i32()

    def skip(self, ftype: int):
        if ftype == T_BOOL or ftype == T_BYTE:
            self.take(1)
        elif ftype == T_DOUBLE or ftype == T_I64:
            self.take(8)
        elif ftype == T_I16:
            self.take(2)
        elif ftype == T_I32:
            self.take(4)
        elif ftype == T_STRING:
            self.take(self.i32())
        elif ftype == T_STRUCT:
            while True:
                ft, _ = self.field()
                if ft == T_STOP:
                    return
                self.skip(ft)
        elif ftype == T_LIST or ftype == T_SET:
            et, n = self.list_header()
            for _ in range(n):
                self.skip(et)
        else:
            raise ValueError(f"thrift: cannot skip type {ftype}")


# ---------------------------------------------------------------------------
# jaeger.thrift encode
# ---------------------------------------------------------------------------


def _enc_tag(w: ThriftWriter, tag: dict):
    w.field(T_STRING, 1)
    w.string(tag["key"])
    w.field(T_I32, 2)
    w.i32(tag["vtype"])
    vt = tag["vtype"]
    if vt == TAG_STRING:
        w.field(T_STRING, 3)
        w.string(tag["value"])
    elif vt == TAG_DOUBLE:
        w.field(T_DOUBLE, 4)
        w.double(float(tag["value"]))
    elif vt == TAG_BOOL:
        w.field(T_BOOL, 5)
        w.boolean(bool(tag["value"]))
    elif vt == TAG_LONG:
        w.field(T_I64, 6)
        w.i64(int(tag["value"]))
    elif vt == TAG_BINARY:
        w.field(T_STRING, 7)
        w.string(tag["value"])
    w.stop()


def _enc_tag_list(w: ThriftWriter, fid: int, tags: list):
    if not tags:
        return
    w.field(T_LIST, fid)
    w.list_header(T_STRUCT, len(tags))
    for t in tags:
        _enc_tag(w, t)


def encode_batch(process: dict | None, spans: list[dict]) -> bytes:
    """Batch{1:process, 2:spans} in TBinaryProtocol."""
    w = ThriftWriter()
    if process is not None:
        w.field(T_STRUCT, 1)
        w.field(T_STRING, 1)
        w.string(process.get("service_name", ""))
        _enc_tag_list(w, 2, process.get("tags", []))
        w.stop()
    w.field(T_LIST, 2)
    w.list_header(T_STRUCT, len(spans))
    for s in spans:
        w.field(T_I64, 1)
        w.i64(s["trace_id_low"])
        w.field(T_I64, 2)
        w.i64(s["trace_id_high"])
        w.field(T_I64, 3)
        w.i64(s["span_id"])
        w.field(T_I64, 4)
        w.i64(s.get("parent_span_id", 0))
        w.field(T_STRING, 5)
        w.string(s.get("operation_name", ""))
        refs = s.get("references", [])
        if refs:
            w.field(T_LIST, 6)
            w.list_header(T_STRUCT, len(refs))
            for r in refs:
                w.field(T_I32, 1)
                w.i32(r["ref_type"])
                w.field(T_I64, 2)
                w.i64(r["trace_id_low"])
                w.field(T_I64, 3)
                w.i64(r["trace_id_high"])
                w.field(T_I64, 4)
                w.i64(r["span_id"])
                w.stop()
        w.field(T_I32, 7)
        w.i32(s.get("flags", 0))
        w.field(T_I64, 8)
        w.i64(s["start_time_us"])
        w.field(T_I64, 9)
        w.i64(s["duration_us"])
        _enc_tag_list(w, 10, s.get("tags", []))
        logs = s.get("logs", [])
        if logs:
            w.field(T_LIST, 11)
            w.list_header(T_STRUCT, len(logs))
            for lg in logs:
                w.field(T_I64, 1)
                w.i64(lg["timestamp_us"])
                _enc_tag_list(w, 2, lg.get("fields", []))
                w.stop()
        w.stop()
    w.stop()
    return bytes(w.buf)


# ---------------------------------------------------------------------------
# jaeger.thrift decode
# ---------------------------------------------------------------------------


def _dec_tag(r: ThriftReader) -> dict:
    tag: dict = {"key": "", "vtype": TAG_STRING, "value": None}
    while True:
        ft, fid = r.field()
        if ft == T_STOP:
            return tag
        if fid == 1 and ft == T_STRING:
            tag["key"] = r.string()
        elif fid == 2 and ft == T_I32:
            tag["vtype"] = r.i32()
        elif fid == 3 and ft == T_STRING:
            tag["value"] = r.string()
        elif fid == 4 and ft == T_DOUBLE:
            tag["value"] = r.double()
        elif fid == 5 and ft == T_BOOL:
            tag["value"] = r.boolean()
        elif fid == 6 and ft == T_I64:
            tag["value"] = r.i64()
        elif fid == 7 and ft == T_STRING:
            tag["value"] = r.string()
        else:
            r.skip(ft)


def _dec_tag_list(r: ThriftReader) -> list:
    _, n = r.list_header()
    return [_dec_tag(r) for _ in range(n)]


def decode_batch(data: bytes) -> dict:
    """TBinaryProtocol bytes → {process, spans} (inverse of
    encode_batch; unknown fields are skipped per Thrift rules)."""
    r = ThriftReader(data)
    out: dict = {"process": None, "spans": []}
    while True:
        ft, fid = r.field()
        if ft == T_STOP:
            return out
        if fid == 1 and ft == T_STRUCT:
            proc: dict = {"service_name": "", "tags": []}
            while True:
                pft, pfid = r.field()
                if pft == T_STOP:
                    break
                if pfid == 1 and pft == T_STRING:
                    proc["service_name"] = r.string()
                elif pfid == 2 and pft == T_LIST:
                    proc["tags"] = _dec_tag_list(r)
                else:
                    r.skip(pft)
            out["process"] = proc
        elif fid == 2 and ft == T_LIST:
            _, n = r.list_header()
            for _ in range(n):
                s: dict = {
                    "trace_id_low": 0, "trace_id_high": 0, "span_id": 0,
                    "parent_span_id": 0, "operation_name": "", "flags": 0,
                    "start_time_us": 0, "duration_us": 0,
                    "references": [], "tags": [], "logs": [],
                }
                while True:
                    sft, sfid = r.field()
                    if sft == T_STOP:
                        break
                    if sfid == 1:
                        s["trace_id_low"] = r.i64()
                    elif sfid == 2:
                        s["trace_id_high"] = r.i64()
                    elif sfid == 3:
                        s["span_id"] = r.i64()
                    elif sfid == 4:
                        s["parent_span_id"] = r.i64()
                    elif sfid == 5:
                        s["operation_name"] = r.string()
                    elif sfid == 6 and sft == T_LIST:
                        _, rn = r.list_header()
                        for _ in range(rn):
                            ref = {"ref_type": 0, "trace_id_low": 0,
                                   "trace_id_high": 0, "span_id": 0}
                            while True:
                                rft, rfid = r.field()
                                if rft == T_STOP:
                                    break
                                if rfid == 1:
                                    ref["ref_type"] = r.i32()
                                elif rfid == 2:
                                    ref["trace_id_low"] = r.i64()
                                elif rfid == 3:
                                    ref["trace_id_high"] = r.i64()
                                elif rfid == 4:
                                    ref["span_id"] = r.i64()
                                else:
                                    r.skip(rft)
                            s["references"].append(ref)
                    elif sfid == 7:
                        s["flags"] = r.i32()
                    elif sfid == 8:
                        s["start_time_us"] = r.i64()
                    elif sfid == 9:
                        s["duration_us"] = r.i64()
                    elif sfid == 10 and sft == T_LIST:
                        s["tags"] = _dec_tag_list(r)
                    elif sfid == 11 and sft == T_LIST:
                        _, ln = r.list_header()
                        for _ in range(ln):
                            lg = {"timestamp_us": 0, "fields": []}
                            while True:
                                lft, lfid = r.field()
                                if lft == T_STOP:
                                    break
                                if lfid == 1:
                                    lg["timestamp_us"] = r.i64()
                                elif lfid == 2 and lft == T_LIST:
                                    lg["fields"] = _dec_tag_list(r)
                                else:
                                    r.skip(lft)
                            s["logs"].append(lg)
                    else:
                        r.skip(sft)
                out["spans"].append(s)
        else:
            r.skip(ft)


# ---------------------------------------------------------------------------
# span-row translation (protospan_to_jaegerthrift.go)
# ---------------------------------------------------------------------------


def _hex_to_i64(h: str) -> int:
    v = int(h, 16)
    return v - (1 << 64) if v >= (1 << 63) else v


def trace_id_to_pair(trace_id_hex: str) -> tuple[int, int]:
    """32-hex trace id → (high, low) signed int64 (:493-500)."""
    if len(trace_id_hex) != 32:
        raise ValueError("invalid trace ID")
    return _hex_to_i64(trace_id_hex[:16]), _hex_to_i64(trace_id_hex[16:])


def span_rows_to_thrift_spans(rows: list[dict]) -> tuple[list[dict], int]:
    """Span dicts (hex ids, ns times, attrs, status, kind, links) →
    jaeger thrift span dicts + dropped-row count. Per
    protospan_to_jaegerthrift.go:186-248."""
    spans = []
    dropped = 0
    for row in rows:
        try:
            hi, lo = trace_id_to_pair(row.get("trace_id", ""))
            if hi == 0 and lo == 0:
                raise ValueError("zero trace id")  # :198-200
            sid = _hex_to_i64(row.get("span_id", ""))
            if len(row.get("span_id", "")) != 16 or sid == 0:
                raise ValueError("bad span id")  # :205-211
        except ValueError:
            dropped += 1
            continue
        parent = 0
        pid_hex = row.get("parent_span_id") or ""
        if pid_hex:
            parent = _hex_to_i64(pid_hex)
        start_us = row.get("start_ns", 0) // 1_000
        dur_us = row.get("end_ns", 0) // 1_000 - start_us

        attrs = row.get("attrs", {})
        tags = []
        for k, v in attrs.items():
            if isinstance(v, bool):
                tags.append({"key": k, "vtype": TAG_BOOL, "value": v})
            elif isinstance(v, int):
                tags.append({"key": k, "vtype": TAG_LONG, "value": v})
            elif isinstance(v, float):
                tags.append({"key": k, "vtype": TAG_DOUBLE, "value": v})
            else:
                tags.append({"key": k, "vtype": TAG_STRING, "value": str(v)})
        # span.kind only when absent from attrs; client/server only
        if "span.kind" not in attrs:
            kind = (row.get("kind") or "").lower()
            if kind in ("client", "server"):
                tags.append(
                    {"key": "span.kind", "vtype": TAG_STRING, "value": kind}
                )
        # status tags only when neither key set (:239-243)
        if "status.code" not in attrs and "status.message" not in attrs:
            code = row.get("status_code")
            if code is not None:
                tags.append(
                    {"key": "status.code", "vtype": TAG_LONG, "value": int(code)}
                )
                msg = row.get("status_message") or ""
                if msg:
                    tags.append(
                        {"key": "status.message", "vtype": TAG_STRING,
                         "value": msg}
                    )

        refs = []
        for link in row.get("links", ()):
            lhi, llo = trace_id_to_pair(link["trace_id"])
            refs.append(
                {
                    "ref_type": REF_CHILD_OF
                    if link.get("type") == "parent"
                    else REF_FOLLOWS_FROM,
                    "trace_id_high": lhi,
                    "trace_id_low": llo,
                    "span_id": _hex_to_i64(link["span_id"]),
                }
            )

        logs = []
        for ev in row.get("events", ()):
            fields = [
                {"key": k, "vtype": TAG_STRING, "value": str(v)}
                for k, v in ev.get("attrs", {}).items()
            ]
            desc = ev.get("description") or ""
            if desc:
                fields.append(
                    {"key": "description", "vtype": TAG_STRING, "value": desc}
                )
            logs.append(
                {"timestamp_us": ev.get("ts_ns", 0) // 1_000, "fields": fields}
            )

        spans.append(
            {
                "trace_id_high": hi,
                "trace_id_low": lo,
                "span_id": sid,
                "parent_span_id": parent,
                "operation_name": row.get("name", ""),
                "references": refs,
                "flags": 0,
                "start_time_us": start_us,
                "duration_us": dur_us,
                "tags": tags,
                "logs": logs,
            }
        )
    return spans, dropped


def make_process(service_name: str, resource_labels: dict | None = None) -> dict:
    """Process from service name + resource labels (:147-184); with
    nothing at all the unknown-service process applies (:31,66-70)."""
    tags = [
        {"key": k, "vtype": TAG_STRING, "value": str(v)}
        for k, v in (resource_labels or {}).items()
    ]
    if not service_name and not tags:
        return {"service_name": UNKNOWN_SERVICE, "tags": []}
    return {"service_name": service_name, "tags": tags}
