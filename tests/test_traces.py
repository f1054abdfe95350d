import json

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.sources.traces import (
    SFX_COUNTER,
    SFX_CUMULATIVE_COUNTER,
    SFX_ENUM,
    SFX_GAUGE,
    SignalFxDecoder,
    XRaySegmentDecoder,
    decode_datapoint_upload,
    decode_xray_span_id,
    decode_xray_trace_id,
    encode_datapoint,
    encode_datapoint_upload,
    sfx_datapoints_to_rows,
    xray_segment_to_spans,
)


def test_xray_trace_id_decode():
    # translator.go:232-247 example
    assert (
        decode_xray_trace_id("1-5f84c7a1-e7d1852db8c4fd35d88bf49a")
        == "5f84c7a1e7d1852db8c4fd35d88bf49a"
    )
    with pytest.raises(ValueError):
        decode_xray_trace_id(None)
    with pytest.raises(ValueError):
        decode_xray_trace_id("1-short")
    assert decode_xray_span_id("5f84c7a1e7d1852d") == "5f84c7a1e7d1852d"
    with pytest.raises(ValueError):
        decode_xray_span_id("abc")


def _seg(**kw):
    base = {
        "name": "svc",
        "id": "0000000000000001",
        "trace_id": "1-5f84c7a1-e7d1852db8c4fd35d88bf49a",
        "start_time": 1600000000.0,
        "end_time": 1600000001.5,
    }
    base.update(kw)
    return base


def test_xray_root_segment_is_server_kind():
    spans = xray_segment_to_spans(_seg())
    assert len(spans) == 1
    s = spans[0]
    # no parent → server (translator.go:176-181)
    assert s["kind"] == "server"
    assert s["parent_span_id"] is None
    assert s["trace_id"] == "5f84c7a1e7d1852db8c4fd35d88bf49a"
    assert s["start_ns"] == int(1600000000.0 * 1e9)
    assert s["end_ns"] == int(1600000001.5 * 1e9)
    assert s["status_code"] == "unset"


def test_xray_subsegment_kinds_and_aws_namespace():
    seg = _seg(
        subsegments=[
            {
                "name": "DynamoDB",
                "id": "0000000000000002",
                "start_time": 1600000000.1,
                "end_time": 1600000000.2,
                "namespace": "aws",
            },
            {
                "name": "local-work",
                "id": "0000000000000003",
                "start_time": 1600000000.3,
            },
        ]
    )
    spans = xray_segment_to_spans(seg)
    assert [s["name"] for s in spans] == ["svc", "DynamoDB", "local-work"]
    dyn = spans[1]
    # namespace → client + aws.service attr (name.go:54-62)
    assert dyn["kind"] == "client"
    assert json.loads(dyn["attrs"])["aws.service"] == "DynamoDB"
    assert dyn["parent_span_id"] == "0000000000000001"
    assert dyn["trace_id"] == spans[0]["trace_id"]  # root trace id propagated
    # no namespace, parent present → internal (name.go:43-47)
    assert spans[2]["kind"] == "internal"
    assert spans[2]["end_ns"] is None  # optional end time


def test_xray_unexpected_namespace_rejected():
    with pytest.raises(ValueError):
        xray_segment_to_spans(_seg(namespace="bogus"))


def test_xray_http_status_mapping():
    ok = xray_segment_to_spans(
        _seg(http={"response": {"status": 398}})
    )[0]
    assert ok["status_code"] == "unset"
    assert json.loads(ok["attrs"])["http.status_code"] == 398
    err = xray_segment_to_spans(_seg(http={"response": {"status": 399}}))[0]
    assert err["status_code"] == "error"  # StatusCodeFromHTTP boundary
    # client_ip → server kind + attr (name.go:34-41, http.go:35-40)
    srv = xray_segment_to_spans(
        _seg(
            http={"request": {"client_ip": "1.2.3.4", "method": "GET"}},
            namespace=None,
        )
    )[0]
    assert srv["kind"] == "server"
    a = json.loads(srv["attrs"])
    assert a["http.client_ip"] == "1.2.3.4" and a["http.method"] == "GET"


def test_xray_cause_exceptions_and_stacktrace():
    seg = _seg(
        cause={
            "exceptions": [
                {
                    "id": "abcdefabcdefabcd",
                    "message": "boom",
                    "type": "ValueError",
                    "stack": [
                        {"label": "f", "path": "/app/x.py", "line": 12},
                        {"label": "g", "path": "/app/y.py", "line": 7},
                    ],
                }
            ]
        }
    )
    s = xray_segment_to_spans(seg)[0]
    assert s["status_code"] == "error"  # cause → error (cause.go:39-43)
    assert s["n_exceptions"] == 1
    # cause.go:86-110 render
    assert s["stack_trace"] == (
        "ValueError: boom\n\tat f(/app/x.py: 12)\n\tat g(/app/y.py: 7)\n"
    )
    # bare exception-id cause → status message fallback (cause.go:45-53)
    s2 = xray_segment_to_spans(_seg(cause="abcdefabcdefabcd"))[0]
    assert s2["status_message"] == "abcdefabcdefabcd"
    assert s2["status_code"] == "error"


def test_xray_decoder_stage_drops_invalid():
    good = json.dumps(_seg())
    bad = "{not json"
    missing = json.dumps({"name": "x"})  # no id/start_time
    t = pa.table({"raw": [good, bad, missing]})
    out = XRaySegmentDecoder()(t)
    assert len(out) == 1
    assert out["_batch_dropped"][0].as_py() == 2


def test_sfx_round_trip_types_and_drops():
    dps = [
        encode_datapoint("m.int.gauge", 7, timestamp_ms=1000, metric_type=SFX_GAUGE),
        encode_datapoint("m.double.gauge", 2.5, metric_type=SFX_GAUGE),
        encode_datapoint("m.counter", 3, metric_type=SFX_COUNTER),
        encode_datapoint("m.cumulative", 4.5, metric_type=SFX_CUMULATIVE_COUNTER),
        encode_datapoint("m.enum", 1, metric_type=SFX_ENUM),  # dropped
        encode_datapoint("m.str", "nope", metric_type=SFX_GAUGE),  # dropped
        encode_datapoint("m.neg", -5, metric_type=SFX_GAUGE),
    ]
    blob = encode_datapoint_upload(dps)
    decoded = decode_datapoint_upload(blob)
    assert len(decoded) == 7
    rows, dropped = sfx_datapoints_to_rows(decoded)
    assert dropped == 2
    by = {r["metric"]: r for r in rows}
    assert by["m.int.gauge"]["dtype"] == "int_gauge"
    assert by["m.int.gauge"]["ts_ns"] == 1_000_000_000  # ms → ns
    assert by["m.int.gauge"]["value_int"] == 7
    assert by["m.double.gauge"]["dtype"] == "double_gauge"
    assert by["m.double.gauge"]["value_double"] == 2.5
    assert by["m.counter"]["dtype"] == "int_sum_delta" and by["m.counter"]["monotonic"]
    assert by["m.cumulative"]["dtype"] == "double_sum_cumulative"
    assert by["m.neg"]["value_int"] == -5  # two's-complement varint


def test_sfx_dimension_insert_first_wins():
    dp = encode_datapoint(
        "m",
        1,
        dimensions=[("k", "first"), ("k", "second"), ("h", "x")],
    )
    rows, _ = sfx_datapoints_to_rows(decode_datapoint_upload(encode_datapoint_upload([dp])))
    assert json.loads(rows[0]["labels"]) == {"k": "first", "h": "x"}


def test_trace_decoder_stages_on_dataset():
    segs = [json.dumps(_seg(id=f"{i:016x}")) for i in range(50)]
    ds = ray.data.from_pandas(pd.DataFrame({"raw": segs}))
    out = ds.map_batches(XRaySegmentDecoder(), batch_format="pyarrow").to_pandas()
    assert len(out) == 50
    assert (out["kind"] == "server").all()

    blobs = [
        encode_datapoint_upload(
            [encode_datapoint(f"m{i}", i, metric_type=SFX_COUNTER)]
        )
        for i in range(50)
    ]
    ds2 = ray.data.from_pandas(pd.DataFrame({"payload": blobs}))
    out2 = ds2.map_batches(SignalFxDecoder(), batch_format="pyarrow").to_pandas()
    assert len(out2) == 50
    assert set(out2["dtype"]) == {"int_sum_delta"}


# ---------------------------------------------------------------- SAPM

from opentelemetry_collector_contrib_ray.sources.traces import (  # noqa: E402
    JAEGER_REF_CHILD_OF,
    JAEGER_REF_FOLLOWS_FROM,
    SapmDecoder,
    decode_sapm,
    encode_jaeger_batch,
    encode_jaeger_span,
    encode_sapm,
    jaeger_batches_to_rows,
)

_TID = bytes(range(16))
_SID = b"\x01" * 8
_PSID = b"\x02" * 8


def _sample_batch() -> bytes:
    sp1 = encode_jaeger_span(
        _TID,
        _SID,
        "op-a",
        1_600_000_000_000_000_000,
        2_500_000_000,
        tags=[
            ("span.kind", "client"),
            ("http.status_code", 200),
            ("error", True),
            ("pi", 3.5),
            ("blob", b"\x00\xff"),
        ],
        references=[
            (_TID, _PSID, JAEGER_REF_CHILD_OF),
            (b"\x09" * 16, b"\x03" * 8, JAEGER_REF_FOLLOWS_FROM),
        ],
        logs=[(1_600_000_000_100_000_000, [("event", "retry"), ("attempt", 2)])],
    )
    sp2 = encode_jaeger_span(
        _TID,
        b"\x04" * 8,
        "op-b",
        1_600_000_000_000_000_000,
        1,
        tags=[
            ("otel.status_code", "ERROR"),
            ("otel.status_description", "boom"),
            ("neg", -5),
        ],
    )
    return encode_jaeger_batch(
        "svc-x", [sp1, sp2], process_tags=[("host", "h1"), ("num", 7)]
    )


@pytest.mark.parametrize("compress", [True, False])
def test_sapm_round_trip_gzip_and_raw(compress):
    rows = jaeger_batches_to_rows(
        decode_sapm(encode_sapm([_sample_batch()], compress=compress))
    )
    assert len(rows) == 2
    r1, r2 = rows
    # CHILD_OF ref -> parent, FOLLOWS_FROM -> link; span.kind tag -> kind
    assert r1["trace_id"] == _TID.hex()
    assert r1["parent_span_id"] == _PSID.hex()
    assert r1["kind"] == "client"
    assert r1["n_links"] == 1 and r1["n_events"] == 1
    # "error" bool tag promotes status, is removed from attrs;
    # binary tag renders as base64; int/float survive typed
    assert r1["status_code"] == "error"
    assert json.loads(r1["attrs"]) == {
        "http.status_code": 200,
        "pi": 3.5,
        "blob": "AP8=",
    }
    assert r1["end_ns"] == 1_600_000_002_500_000_000
    # Process -> resource attrs on every span of the batch
    assert json.loads(r1["resource_attrs"]) == {
        "service.name": "svc-x",
        "host": "h1",
        "num": 7,
    }
    # otel.status_code/-description tags take precedence and are removed
    assert r2["status_code"] == "error" and r2["status_message"] == "boom"
    assert json.loads(r2["attrs"]) == {"neg": -5}
    assert r2["parent_span_id"] is None and r2["kind"] == "unspecified"


def test_sapm_decoder_stage_drops_bad_payloads():
    dec = SapmDecoder()
    out = dec(
        pa.table(
            {
                "payload": pa.array(
                    [encode_sapm([_sample_batch()]), b"\x1f\x8bgarbage", b"\xff\xff"],
                    pa.binary(),
                )
            }
        )
    )
    assert out.num_rows == 2
    assert out["_batch_dropped"][0].as_py() == 2
