"""Fluent Forward decode modes (fluentforwardreceiver/conversion.go:
Message :191, Forward :265, PackedForward :339, gzip :399)."""

import gzip

import pyarrow as pa

from opentelemetry_collector_contrib_ray.sources.fluentforward import (
    FluentForwardDecoder,
    decode_event,
    pack,
)


def test_message_mode():
    payload = pack(["tag.a", 1600000000, {"log": "hello", "n": 5}])
    rows = decode_event(payload)
    assert rows == [{"tag": "tag.a", "time": 1600000000.0, "log": "hello", "n": 5}]


def test_forward_mode():
    payload = pack(["tag.b", [[1, {"log": "x"}], [2, {"log": "y"}]]])
    rows = decode_event(payload)
    assert [r["log"] for r in rows] == ["x", "y"]
    assert [r["time"] for r in rows] == [1.0, 2.0]


def test_packed_forward_mode_with_gzip():
    entries = pack([1, {"log": "p1"}]) + pack([2, {"log": "p2"}])
    for blob in (entries, gzip.compress(entries)):
        rows = decode_event(pack(["tag.c", blob]))
        assert [r["log"] for r in rows] == ["p1", "p2"]


def test_decoder_stage_explodes_rows():
    payloads = [
        pack(["t1", 1, {"log": "a"}]),
        pack(["t2", [[2, {"log": "b"}], [3, {"log": "c"}]]]),
        b"\xff garbage",
    ]
    t = pa.table({"payload": pa.array(payloads, pa.binary())})
    out = FluentForwardDecoder()(t)
    assert len(out) == 3  # 1 + 2, garbage skipped
    assert sorted(out["log"].to_pylist()) == ["a", "b", "c"]
