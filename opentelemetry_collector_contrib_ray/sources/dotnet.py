"""dotnetdiagnosticsreceiver EventPipe (nettrace) decoder.

Re-expresses `receiver/dotnetdiagnosticsreceiver/dotnet/` — the IPC +
nettrace FastSerialization binary protocol that carries .NET
EventCounters — as a pure-Python codec plus a map_batches stage over
blob payloads. Semantics (file:line under /root/reference):

* IPC response header (ipc_parser.go:30-93): 14-byte magic
  "DOTNET_IPC_V1\\0", uint16 size, commandSet, responseID (0xFF =
  error response → reject), uint16 reserved, int64 sessionID.
* nettrace magic (nettrace_parser.go:23-73): "Nettrace" then a
  length-prefixed "!FastSerialization.1".
* every block (parser.go:77-125): beginPrivateObject tag (5), a
  serialization-type object [tag 5, null-ref tag 1, version int32,
  minReaderVersion int32, length-prefixed ASCII name, end tag 6],
  the block payload, end tag 6. Unknown type names are an error.
* Trace object (trace_parser.go:25-71): 16-byte date skipped, then
  syncTimeQPC/qpcFreq int64 + 4 int32s.
* MetadataBlock (metadata_parser.go:60-215): payload-size int32 with
  endpos computed BEFORE the 4-byte Align, 20-byte header (headerSize
  int16 = 20, flags int16, 16 skipped), then per-entry: a compressed
  event header, metadataID int32, provider UTF16z, eventHeaderID
  int32, eventName UTF16z, keyword uint64, version int32, level
  int32, and a field tree — per field a System.TypeCode int32
  (Object=1 recurses into child fields BEFORE the field name;
  Int32=9, Single=13, Double=14, String=18), then the UTF16z name.
* EventBlock (event_parser.go:27-80): payload-size int32 with endpos
  computed AFTER the Align (unlike MetadataBlock), 20-byte header,
  then events: compressed event header (event_header.go:55-131 —
  flag bits 0x01 metadataID, 0x02 capture thread+sequence, 0x04
  threadID, 0x08 stackID, 0x10/0x20 activity GUIDs skipped, 0x80
  payloadSize; timestampDelta ALWAYS present), then the payload
  decoded by the correlated metadata's field tree; an event whose
  metadataID has no registered metadata yields no key-values and is
  dropped (event_parser.go:70-76).
* StackBlock (stack_parser.go:25-65): endpos computed before Align,
  firstStackID/countStackIDs, then length-prefixed stacks, skipped.
* SequencePointBlock (sequence_parser.go:24-62): Align, timestamp
  int64, threadcount int32, (threadID int64, seq int32) pairs; the
  reader's byte counter RESETS afterwards (parser.go:113-119) which
  changes subsequent 4-byte alignment.
* metric conversion (metrics/converter.go:40-77): name prefixed
  "dotnet.", description = DisplayName, unit mapped ("B" → "By",
  others pass through); CounterType "Mean" → a double gauge of Mean
  stamped now; "Sum" → a DELTA double sum of Increment over
  [startTime, now].

Compressed uints are 7-bit little-endian groups with a continuation
high bit (network/reader.go:98-140).
"""

from __future__ import annotations

import struct
from typing import Sequence

import numpy as np
import pyarrow as pa

IPC_MAGIC = b"DOTNET_IPC_V1\x00"  # request.go:78
NETTRACE_NAME = b"Nettrace"
NETTRACE_SERIALIZATION = b"!FastSerialization.1"

_TAG_NULL = 1
_TAG_BEGIN_PRIVATE = 5
_TAG_END = 6

TC_OBJECT, TC_INT32, TC_SINGLE, TC_DOUBLE, TC_STRING = 1, 9, 13, 14, 18

_F_METADATA_ID = 0x01
_F_CAPTURE_SEQ = 0x02
_F_THREAD_ID = 0x04
_F_STACK_ID = 0x08
_F_ACTIVITY = 0x10
_F_RELATED = 0x20
_F_DATA_LEN = 0x80


class _Cursor:
    """Positional little-endian reader mirroring network.MultiReader:
    Pos() counts bytes since creation (or the last SPBlock reset) and
    drives 4-byte alignment."""

    def __init__(self, data: bytes):
        self.data = data
        self.i = 0
        self._base = 0

    def pos(self) -> int:
        return self.i - self._base

    def reset(self):  # parser.go:113-119
        self._base = self.i

    def eof(self) -> bool:
        return self.i >= len(self.data)

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.data):
            raise ValueError("unexpected end of stream")
        b = self.data[self.i : self.i + n]
        self.i += n
        return b

    def seek(self, n: int):
        self.take(n)

    def align(self):
        mod = self.pos() % 4
        if mod:
            self.seek(4 - mod)

    def u8(self) -> int:
        return self.take(1)[0]

    def i16(self) -> int:
        return struct.unpack("<h", self.take(2))[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.take(2))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack("<q", self.take(8))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def f32(self) -> float:
        return struct.unpack("<f", self.take(4))[0]

    def f64(self) -> float:
        return struct.unpack("<d", self.take(8))[0]

    def cuint(self, max_len: int = 5) -> int:
        out = 0
        for i in range(max_len + 2):
            if i > max_len:
                raise ValueError("compressed int too long")
            b = self.u8()
            out |= (b & 0x7F) << (i * 7)
            if not b & 0x80:
                return out
        raise ValueError("unreachable")

    def cuint64(self) -> int:
        return self.cuint(max_len=10)

    def utf16z(self) -> str:
        chars = []
        while True:
            c = self.u16()
            if c == 0:
                break
            chars.append(c)
        return "".join(map(chr, chars))  # BMP-only synthetic payloads

    def ascii(self, n: int) -> str:
        return self.take(n).decode("ascii")

    def expect_byte(self, want: int):
        got = self.u8()
        if got != want:
            raise ValueError(f"expected tag {want}, got {got}")


def parse_ipc(c: _Cursor) -> int:
    """IPC response header → sessionID (ipc_parser.go:46-93)."""
    magic = c.take(14)
    if magic[:13] != IPC_MAGIC[:13]:
        raise ValueError(f"ipc header: bad magic {magic!r}")
    c.u16()  # size
    c.u8()  # commandSet
    response_id = c.u8()
    c.u16()  # reserved
    session = c.i64()
    if response_id == 0xFF:
        raise ValueError("ipc header: got error response")
    return session


def parse_nettrace(c: _Cursor):
    name = c.ascii(len(NETTRACE_NAME))
    if name != "Nettrace":
        raise ValueError(f"header name: expected Nettrace got {name!r}")
    strlen = c.i32()
    ser = c.ascii(strlen)
    if ser != "!FastSerialization.1":
        raise ValueError(f"serialization type: {ser!r}")


def _parse_serialization_type(c: _Cursor) -> tuple[int, int, str]:
    c.expect_byte(_TAG_BEGIN_PRIVATE)
    c.expect_byte(_TAG_NULL)
    version = c.i32()
    min_reader = c.i32()
    strlen = c.i32()
    name = c.ascii(strlen)
    c.expect_byte(_TAG_END)
    return version, min_reader, name


def _parse_event_header(c: _Cursor) -> tuple[int, int]:
    """→ (metadataID, payloadSize) per event_header.go:55-131."""
    f = c.u8()
    metadata_id = 0
    payload_size = 0
    if f & _F_METADATA_ID:
        metadata_id = c.cuint()
    if f & _F_CAPTURE_SEQ:
        c.cuint()  # sequence
        c.cuint64()  # captureThreadID
        c.cuint()  # captureProcNumber
    if f & _F_THREAD_ID:
        c.cuint64()
    if f & _F_STACK_ID:
        c.cuint()
    c.cuint64()  # timestampDelta — always present
    if f & _F_ACTIVITY:
        c.seek(16)
    if f & _F_RELATED:
        c.seek(16)
    if f & _F_DATA_LEN:
        payload_size = c.cuint()
    return metadata_id, payload_size


def _parse_fields(c: _Cursor) -> list:
    num = c.i32()
    fields = []
    for _ in range(num):
        f = _parse_field(c)
        f["name"] = c.utf16z()
        fields.append(f)
    return fields


def _parse_field(c: _Cursor) -> dict:
    tc = c.i32()
    f: dict = {"type": tc, "fields": []}
    if tc == TC_OBJECT:
        f["fields"] = _parse_fields(c)
    return f


def _parse_metadata_block(c: _Cursor, fmm: dict):
    offset = c.i32()
    endpos = c.pos() + offset  # BEFORE Align (metadata_parser.go:67-73)
    c.align()
    c.i16()  # headerSize
    c.i16()  # flags
    c.seek(16)
    while c.pos() < endpos:
        _parse_event_header(c)
        metadata_id = c.i32()
        provider = c.utf16z()
        c.i32()  # eventHeaderID
        event_name = c.utf16z()
        c.u64()  # keyword
        c.i32()  # version
        c.i32()  # level
        fields = _parse_fields(c)
        fmm[metadata_id] = {
            "provider": provider,
            "event_name": event_name,
            "fields": fields,
        }


def _parse_field_values(fields: list, c: _Cursor, m: dict):
    for f in fields:
        tc = f["type"]
        if tc == TC_OBJECT:
            _parse_field_values(f["fields"], c, m)
        elif tc == TC_STRING:
            m[f["name"]] = c.utf16z()
        elif tc == TC_DOUBLE:
            m[f["name"]] = c.f64()
        elif tc == TC_SINGLE:
            m[f["name"]] = c.f32()
        elif tc == TC_INT32:
            m[f["name"]] = c.i32()


def _parse_event_block(c: _Cursor, fmm: dict) -> list[dict]:
    offset = c.i32()
    c.align()
    endpos = c.pos() + offset  # AFTER Align (event_parser.go:28-40)
    header_size = c.u16()
    c.u16()  # flags
    c.seek(header_size - 4)
    metrics = []
    while c.pos() < endpos:
        metadata_id, _ = _parse_event_header(c)
        m: dict = {}
        meta = fmm.get(metadata_id, {"fields": []})
        _parse_field_values(meta["fields"], c, m)
        if m:
            metrics.append(m)
    return metrics


def _parse_stack_block(c: _Cursor):
    offset = c.i32()
    endpos = c.pos() + offset  # before Align (stack_parser.go:26-34)
    c.align()
    c.i32()  # firstStackID
    c.i32()  # countStackIDs
    while c.pos() < endpos:
        size = c.i32()
        c.seek(size)


def _parse_sp_block(c: _Cursor):
    c.i32()  # offset (unused, sequence_parser.go:26-33)
    c.align()
    c.i64()  # timestamp
    threads = c.i32()
    for _ in range(threads):
        c.i64()
        c.i32()


def parse_stream(data: bytes) -> list[dict]:
    """Full IPC + nettrace + block stream → raw counter dicts
    (parser.go:45-125)."""
    c = _Cursor(data)
    parse_ipc(c)
    parse_nettrace(c)
    fmm: dict = {}
    metrics: list[dict] = []
    while not c.eof():
        c.expect_byte(_TAG_BEGIN_PRIVATE)
        _, _, name = _parse_serialization_type(c)
        if name == "Trace":
            c.seek(16)  # date
            c.i64()  # syncTimeQPC
            c.i64()  # qpcFreq
            c.i32()
            c.i32()
            c.i32()
            c.i32()
        elif name == "MetadataBlock":
            _parse_metadata_block(c, fmm)
        elif name == "StackBlock":
            _parse_stack_block(c)
        elif name == "EventBlock":
            metrics.extend(_parse_event_block(c, fmm))
        elif name == "SPBlock":
            _parse_sp_block(c)
            c.expect_byte(_TAG_END)
            c.reset()  # parser.go:113-119
            continue
        else:
            raise ValueError(f"unknown serialization type: {name}")
        c.expect_byte(_TAG_END)
    return metrics


def map_units(units: str) -> str:
    return "By" if units == "B" else units  # converter.go:66-77


def raw_metric_rows(metrics: list[dict]) -> list[dict]:
    """Raw counter dicts → metric rows (converter.go:40-64): Mean →
    double gauge; Sum → delta double sum of Increment. Unknown counter
    types yield no datapoint."""
    rows = []
    for m in metrics:
        ct = m.get("CounterType", "")
        if ct == "Mean":
            value, mtype = float(m.get("Mean", 0.0)), "gauge"
        elif ct == "Sum":
            value, mtype = float(m.get("Increment", 0.0)), "sum_delta"
        else:
            continue
        rows.append(
            {
                "name": "dotnet." + m.get("Name", ""),
                "mtype": mtype,
                "value": value,
                "unit": map_units(m.get("DisplayUnits", "")),
                "description": m.get("DisplayName", ""),
                "count": int(m.get("Count", 0)),
            }
        )
    return rows


# ---------------------------------------------------------------------------
# Encoder — renders deterministic, spec-faithful streams for tests and
# the driver oracle (round-trip: encode → parse_stream must invert).
# ---------------------------------------------------------------------------


class _Writer:
    def __init__(self):
        self.buf = bytearray()
        self._base = 0

    def pos(self) -> int:
        return len(self.buf) - self._base

    def reset(self):
        self._base = len(self.buf)

    def raw(self, b: bytes):
        self.buf += b

    def u8(self, v: int):
        self.buf.append(v & 0xFF)

    def i16(self, v: int):
        self.buf += struct.pack("<h", v)

    def u16(self, v: int):
        self.buf += struct.pack("<H", v)

    def i32(self, v: int):
        self.buf += struct.pack("<i", v)

    def i64(self, v: int):
        self.buf += struct.pack("<q", v)

    def u64(self, v: int):
        self.buf += struct.pack("<Q", v)

    def f32(self, v: float):
        self.buf += struct.pack("<f", v)

    def f64(self, v: float):
        self.buf += struct.pack("<d", v)

    def cuint(self, v: int):
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.u8(b | 0x80)
            else:
                self.u8(b)
                return

    def utf16z(self, s: str):
        self.buf += s.encode("utf-16-le") + b"\x00\x00"

    def align(self):
        while self.pos() % 4:
            self.u8(0)


def _enc_event_header(w: _Writer, metadata_id: int, payload_size: int):
    w.u8(_F_METADATA_ID | _F_DATA_LEN)
    w.cuint(metadata_id)
    w.cuint(1)  # timestampDelta
    w.cuint(payload_size)


def _enc_fields(w: _Writer, fields: Sequence[tuple]):
    """fields: (name, typecode | nested list) tuples."""
    w.i32(len(fields))
    for name, tc in fields:
        if isinstance(tc, (list, tuple)):
            w.i32(TC_OBJECT)
            _enc_fields(w, tc)
        else:
            w.i32(tc)
        w.utf16z(name)


def _enc_envelope_open(w: _Writer, name: str):
    """Block envelope prefix: begin tag + serialization-type object
    (parser.go:77-95). The body and end tag follow inline because the
    4-byte alignment inside blocks depends on absolute position."""
    w.u8(_TAG_BEGIN_PRIVATE)
    w.u8(_TAG_BEGIN_PRIVATE)
    w.u8(_TAG_NULL)
    w.i32(2)  # version
    w.i32(0)  # minReaderVersion
    w.i32(len(name))
    w.raw(name.encode("ascii"))
    w.u8(_TAG_END)


# EventCounters payload shapes (System.Diagnostics.Tracing):
MEAN_FIELDS = [
    (
        "Payload",
        [
            ("Name", TC_STRING),
            ("DisplayName", TC_STRING),
            ("Mean", TC_DOUBLE),
            ("StandardDeviation", TC_DOUBLE),
            ("Count", TC_INT32),
            ("Min", TC_DOUBLE),
            ("Max", TC_DOUBLE),
            ("IntervalSec", TC_SINGLE),
            ("Series", TC_STRING),
            ("CounterType", TC_STRING),
            ("DisplayUnits", TC_STRING),
        ],
    )
]
SUM_FIELDS = [
    (
        "Payload",
        [
            ("Name", TC_STRING),
            ("DisplayName", TC_STRING),
            ("DisplayRateTimeScale", TC_STRING),
            ("Increment", TC_DOUBLE),
            ("IntervalSec", TC_SINGLE),
            ("Series", TC_STRING),
            ("CounterType", TC_STRING),
            ("DisplayUnits", TC_STRING),
        ],
    )
]


def _enc_counter_payload(cfg: dict) -> bytes:
    b = _Writer()
    if cfg["counter_type"] == "Mean":
        b.utf16z(cfg["name"])
        b.utf16z(cfg.get("display", cfg["name"]))
        b.f64(cfg.get("mean", 0.0))
        b.f64(cfg.get("stddev", 0.0))
        b.i32(cfg.get("count", 0))
        b.f64(cfg.get("min", 0.0))
        b.f64(cfg.get("max", 0.0))
        b.f32(cfg.get("interval_sec", 1.0))
        b.utf16z(cfg.get("series", "Interval=1000"))
        b.utf16z("Mean")
        b.utf16z(cfg.get("units", ""))
    else:
        b.utf16z(cfg["name"])
        b.utf16z(cfg.get("display", cfg["name"]))
        b.utf16z("1")
        b.f64(cfg.get("increment", 0.0))
        b.f32(cfg.get("interval_sec", 1.0))
        b.utf16z(cfg.get("series", "Interval=1000"))
        b.utf16z("Sum")
        b.utf16z(cfg.get("units", ""))
    return bytes(b.buf)


def encode_counter_stream(
    counters: list[dict],
    with_stack_block: bool = True,
    with_sp_block: bool = True,
    unknown_event: bool = False,
    post_sp_event: bool = False,
) -> bytes:
    """Render a complete IPC+nettrace stream carrying the given
    EventCounters. Each counter dict: {name, display, counter_type
    ('Mean'|'Sum'), mean, stddev, count, min, max, increment,
    interval_sec, series, units}. ``unknown_event`` appends an event
    with an unregistered metadataID (dropped by the parser)."""
    w = _Writer()
    # IPC response header (success)
    w.raw(IPC_MAGIC)
    w.u16(28)
    w.u8(0xFF)  # commandSet: server response set
    w.u8(0x00)  # responseID: OK (0xFF would be an error response)
    w.u16(0)
    w.i64(1234)  # sessionID
    # nettrace magic
    w.raw(NETTRACE_NAME)
    w.i32(len(NETTRACE_SERIALIZATION))
    w.raw(NETTRACE_SERIALIZATION)

    # ---- Trace object ----
    _enc_envelope_open(w, "Trace")
    w.raw(b"\x00" * 16)  # date
    w.i64(1_000_000)  # syncTimeQPC
    w.i64(10_000_000)  # qpcFreq
    w.i32(8)  # pointerSize
    w.i32(4321)  # processID
    w.i32(4)  # numProcessors
    w.i32(0)  # expectedCPUSamplingRate
    w.u8(_TAG_END)

    # ---- MetadataBlock ----
    mb = _Writer()
    for i, cfg in enumerate(counters):
        _enc_event_header(mb, 0, 0)
        mb.i32(i + 1)  # metadataID
        mb.utf16z("System.Runtime")
        mb.i32(0)  # eventHeaderID
        mb.utf16z("EventCounters")
        mb.u64(0)  # keyword
        mb.i32(0)  # version
        mb.i32(4)  # level
        _enc_fields(
            mb, MEAN_FIELDS if cfg["counter_type"] == "Mean" else SUM_FIELDS
        )
    _enc_envelope_open(w, "MetadataBlock")
    pos_after_offset = w.pos() + 4
    pad = (4 - pos_after_offset % 4) % 4
    # endpos counted BEFORE Align (metadata_parser.go:67-73), so the
    # offset covers pad + header + entries
    w.i32(pad + 20 + len(mb.buf))
    w.raw(b"\x00" * pad)
    w.i16(20)  # headerSize (incl. these 4 bytes)
    w.i16(0)  # flags
    w.raw(b"\x00" * 16)
    w.raw(bytes(mb.buf))
    w.u8(_TAG_END)

    # ---- EventBlock ----
    eb = _Writer()
    for i, cfg in enumerate(counters):
        payload = _enc_counter_payload(cfg)
        _enc_event_header(eb, i + 1, len(payload))
        eb.raw(payload)
    if unknown_event:
        _enc_event_header(eb, 9999, 0)  # unregistered metadataID
    _enc_envelope_open(w, "EventBlock")
    pos_after_offset = w.pos() + 4
    pad = (4 - pos_after_offset % 4) % 4
    # endpos counted AFTER Align (event_parser.go:28-40): offset
    # excludes the pad
    w.i32(20 + len(eb.buf))
    w.raw(b"\x00" * pad)
    w.u16(20)  # headerSize
    w.u16(0)  # flags
    w.raw(b"\x00" * 16)
    w.raw(bytes(eb.buf))
    w.u8(_TAG_END)

    # ---- StackBlock (contents skipped by the parser) ----
    if with_stack_block:
        sb = _Writer()
        sb.i32(1)  # firstStackID
        sb.i32(1)  # countStackIDs
        sb.i32(8)
        sb.raw(b"\xAA" * 8)
        _enc_envelope_open(w, "StackBlock")
        pos_after_offset = w.pos() + 4
        pad = (4 - pos_after_offset % 4) % 4
        w.i32(pad + len(sb.buf))  # endpos counted before Align
        w.raw(b"\x00" * pad)
        w.raw(bytes(sb.buf))
        w.u8(_TAG_END)

    # ---- SequencePointBlock (resets the byte counter) ----
    if with_sp_block:
        _enc_envelope_open(w, "SPBlock")
        pos_after_offset = w.pos() + 4
        pad = (4 - pos_after_offset % 4) % 4
        w.i32(pad + 20)
        w.raw(b"\x00" * pad)
        w.i64(1_000_001)  # timestamp
        w.i32(1)  # threadcount
        w.i64(77)  # captureThreadID
        w.i32(5)  # sequenceNumber
        w.u8(_TAG_END)
        w.reset()

    # a second EventBlock AFTER the sequence point: its 4-byte
    # alignment is relative to the RESET counter, proving the
    # parser.go:113-119 reset behavior end to end
    if post_sp_event and counters:
        eb = _Writer()
        payload = _enc_counter_payload(counters[0])
        _enc_event_header(eb, 1, len(payload))
        eb.raw(payload)
        _enc_envelope_open(w, "EventBlock")
        pos_after_offset = w.pos() + 4
        pad = (4 - pos_after_offset % 4) % 4
        w.i32(20 + len(eb.buf))
        w.raw(b"\x00" * pad)
        w.u16(20)
        w.u16(0)
        w.raw(b"\x00" * 16)
        w.raw(bytes(eb.buf))
        w.u8(_TAG_END)

    return bytes(w.buf)


def parse_dotnet_counters(t: pa.Table) -> pa.Table:
    """map_batches stage: blob payloads → metric rows in the shared
    scraper output schema (name / label_key / label_value / value_int /
    value_double). One stream per input row; per-row decode of an
    opaque binary protocol is the inherent cost."""
    ids = t["server_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    payloads = t["payload"].to_pylist()
    sid, names, lk, lv, vi, vd = [], [], [], [], [], []
    for i, blob in zip(ids, payloads):
        for row in raw_metric_rows(parse_stream(blob)):
            sid.append(i)
            names.append(row["name"] + "." + row["mtype"])
            lk.append("unit")
            lv.append(row["unit"])
            vi.append(row["count"])
            vd.append(row["value"])
    return pa.table(
        {
            "server_id": pa.array(sid, pa.int64()),
            "name": pa.array(names, pa.string()),
            "label_key": pa.array(lk, pa.string()),
            "label_value": pa.array(lv, pa.string()),
            "value_int": pa.array(vi, pa.int64()),
            "value_double": pa.array(vd, pa.float64()),
        }
    )
