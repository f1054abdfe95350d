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
