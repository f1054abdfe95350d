"""jaegerthrifthttpexporter codec + translation semantics, ported from
exporter/jaegerthrifthttpexporter/protospan_to_jaegerthrift_test.go and
the public Thrift binary-protocol spec."""

import pytest

from opentelemetry_collector_contrib_ray.sources.jaeger_thrift import (
    REF_CHILD_OF,
    REF_FOLLOWS_FROM,
    TAG_BOOL,
    TAG_DOUBLE,
    TAG_LONG,
    TAG_STRING,
    UNKNOWN_SERVICE,
    decode_batch,
    encode_batch,
    make_process,
    span_rows_to_thrift_spans,
    trace_id_to_pair,
)


def _row(**kw):
    base = dict(
        trace_id="0102030405060708090a0b0c0d0e0f10",
        span_id="1112131415161718",
        name="op",
        start_ns=2_000_000_000,
        end_ns=3_500_000_000,
        attrs={},
    )
    base.update(kw)
    return base


class TestIdConversion:
    def test_trace_id_pair_signed_bigendian(self):
        hi, lo = trace_id_to_pair("0102030405060708090a0b0c0d0e0f10")
        assert hi == 0x0102030405060708
        assert lo == 0x090A0B0C0D0E0F10

    def test_high_bit_wraps_negative(self):
        hi, lo = trace_id_to_pair("f" * 32)
        assert hi == -1 and lo == -1

    def test_invalid_length_raises(self):
        with pytest.raises(ValueError):
            trace_id_to_pair("abcd")


class TestTranslation:
    def test_basic_span(self):
        spans, dropped = span_rows_to_thrift_spans([_row()])
        assert dropped == 0
        s = spans[0]
        assert s["operation_name"] == "op"
        # epoch microseconds (:443-448)
        assert s["start_time_us"] == 2_000_000
        assert s["duration_us"] == 1_500_000
        assert s["parent_span_id"] == 0

    def test_zero_ids_dropped(self):
        spans, dropped = span_rows_to_thrift_spans(
            [_row(trace_id="0" * 32), _row(span_id="0" * 16), _row()]
        )
        assert dropped == 2
        assert len(spans) == 1

    def test_attr_tag_types(self):
        spans, _ = span_rows_to_thrift_spans(
            [_row(attrs={"s": "v", "i": 7, "b": True, "d": 1.5})]
        )
        by_key = {t["key"]: t for t in spans[0]["tags"]}
        assert by_key["s"]["vtype"] == TAG_STRING
        assert by_key["i"]["vtype"] == TAG_LONG
        assert by_key["b"]["vtype"] == TAG_BOOL
        assert by_key["d"]["vtype"] == TAG_DOUBLE

    def test_span_kind_only_when_absent(self):
        # :235-238 — an existing span.kind attr wins
        spans, _ = span_rows_to_thrift_spans(
            [
                _row(kind="server"),
                _row(kind="client", attrs={"span.kind": "consumer"}),
                _row(kind="internal"),  # not client/server → no tag
            ]
        )
        k0 = {t["key"]: t["value"] for t in spans[0]["tags"]}
        assert k0["span.kind"] == "server"
        k1 = {t["key"]: t["value"] for t in spans[1]["tags"]}
        assert k1["span.kind"] == "consumer"
        assert "span.kind" not in {t["key"] for t in spans[2]["tags"]}

    def test_status_tags_only_when_absent(self):
        # :239-243,290-311
        spans, _ = span_rows_to_thrift_spans(
            [
                _row(status_code=2, status_message="boom"),
                _row(status_code=2, attrs={"status.code": 5}),
                _row(status_code=0, status_message=""),
            ]
        )
        t0 = {t["key"]: t for t in spans[0]["tags"]}
        assert t0["status.code"]["value"] == 2
        assert t0["status.code"]["vtype"] == TAG_LONG
        assert t0["status.message"]["value"] == "boom"
        t1 = {t["key"]: t for t in spans[1]["tags"]}
        assert t1["status.code"]["value"] == 5  # the attr, untouched
        assert "status.message" not in t1
        t2 = {t["key"]: t for t in spans[2]["tags"]}
        assert t2["status.code"]["value"] == 0  # code 0 still tagged
        assert "status.message" not in t2

    def test_links_to_references(self):
        spans, _ = span_rows_to_thrift_spans(
            [
                _row(
                    links=[
                        dict(trace_id="0" * 31 + "1", span_id="0" * 15 + "2",
                             type="parent"),
                        dict(trace_id="0" * 31 + "3", span_id="0" * 15 + "4",
                             type="other"),
                    ]
                )
            ]
        )
        refs = spans[0]["references"]
        assert refs[0]["ref_type"] == REF_CHILD_OF
        assert refs[1]["ref_type"] == REF_FOLLOWS_FROM
        assert refs[0]["span_id"] == 2

    def test_process(self):
        assert make_process("", None)["service_name"] == UNKNOWN_SERVICE
        p = make_process("svc", {"env": "prod"})
        assert p["service_name"] == "svc"
        assert p["tags"][0] == {"key": "env", "vtype": TAG_STRING, "value": "prod"}


class TestWireRoundTrip:
    def test_full_batch_round_trip(self):
        rows = [
            _row(
                kind="server",
                status_code=2,
                status_message="bad",
                attrs={"s": "v", "i": 7, "b": False, "d": 2.25},
                parent_span_id="00000000000000aa",
                links=[dict(trace_id="0" * 31 + "1", span_id="0" * 15 + "2",
                            type="parent")],
                events=[dict(ts_ns=2_500_000_000, attrs={"k": "v"},
                             description="desc")],
            ),
            _row(span_id="2122232425262728", name="op2"),
        ]
        spans, dropped = span_rows_to_thrift_spans(rows)
        assert dropped == 0
        proc = make_process("svc", {"host": "h1"})
        data = encode_batch(proc, spans)
        back = decode_batch(data)
        assert back["process"]["service_name"] == "svc"
        assert back["process"]["tags"][0]["key"] == "host"
        assert len(back["spans"]) == 2
        s0 = back["spans"][0]
        assert s0["operation_name"] == "op"
        assert s0["start_time_us"] == 2_000_000
        assert s0["duration_us"] == 1_500_000
        assert s0["parent_span_id"] == 0xAA
        tags = {t["key"]: t for t in s0["tags"]}
        assert tags["i"]["value"] == 7
        assert tags["d"]["value"] == 2.25
        assert tags["b"]["value"] is False
        assert tags["span.kind"]["value"] == "server"
        assert tags["status.code"]["value"] == 2
        assert s0["references"][0]["ref_type"] == REF_CHILD_OF
        assert s0["logs"][0]["timestamp_us"] == 2_500_000
        fields = {f["key"]: f["value"] for f in s0["logs"][0]["fields"]}
        assert fields == {"k": "v", "description": "desc"}
        s1 = back["spans"][1]
        assert s1["operation_name"] == "op2"
        assert s1["references"] == [] and s1["logs"] == []

    def test_unknown_fields_skipped(self):
        # Thrift readers must skip unknown field ids; splice an extra
        # I64 field (id 99) into a Process struct
        from opentelemetry_collector_contrib_ray.sources.jaeger_thrift import (
            ThriftWriter,
        )

        w = ThriftWriter()
        w.field(12, 1)  # process STRUCT
        w.field(11, 1)
        w.string("svc")
        w.field(10, 99)  # unknown i64 field
        w.i64(12345)
        w.stop()
        w.field(15, 2)  # spans LIST
        w.list_header(12, 0)
        w.stop()
        out = decode_batch(bytes(w.buf))
        assert out["process"]["service_name"] == "svc"
        assert out["spans"] == []

    def test_negative_ids_survive(self):
        spans, _ = span_rows_to_thrift_spans([_row(trace_id="f" * 32,
                                                   span_id="f" * 16)])
        data = encode_batch(None, spans)
        back = decode_batch(data)
        assert back["spans"][0]["trace_id_high"] == -1
        assert back["spans"][0]["trace_id_low"] == -1
        assert back["spans"][0]["span_id"] == -1
