"""Wavefront / InfluxDB / collectd decoders + k8s path metadata +
trace parser goldens."""

import json

import pyarrow as pa

from opentelemetry_collector_contrib_ray.sources.lines import (
    parse_collectd_json,
    parse_influx_line,
    parse_wavefront,
)
from opentelemetry_collector_contrib_ray.stages.parse import K8sPathMetadata, TraceParser


def test_wavefront():
    t = pa.table(
        {
            "raw": [
                "sys.cpu.loadavg 0.7 1600000000 source=web01 env=prod",
                '"quoted.name" 42 source=db01',  # timestamp omitted (:99-103)
                "garbage",
            ]
        }
    )
    out = parse_wavefront(t)
    rows = out.to_pylist()
    assert rows[0]["metric_name"] == "sys.cpu.loadavg"
    assert rows[0]["value"] == 0.7
    assert rows[0]["source"] == "web01" and rows[0]["tags"] == "env=prod"
    assert rows[0]["timestamp"].year == 2020
    assert rows[1]["metric_name"] == "quoted.name" and rows[1]["timestamp"] is None
    assert rows[2]["metric_name"] is None


def test_influx_line():
    t = pa.table(
        {
            "raw": [
                "cpu,host=h1,region=us usage=0.5,idle=99i 1600000000000000000",
                "mem free=1024",
                "bad",
            ]
        }
    )
    out = parse_influx_line(t)
    rows = out.to_pylist()
    assert len(rows) == 3  # 2 fields + 1 field
    assert rows[0]["measurement"] == "cpu" and rows[0]["field_key"] == "usage"
    assert rows[0]["field_value"] == 0.5 and rows[0]["tags"] == "host=h1,region=us"
    assert rows[1]["field_key"] == "idle" and rows[1]["field_value"] == 99.0
    assert rows[2]["measurement"] == "mem" and rows[2]["ts_ns"] is None


def test_collectd_json():
    payload = json.dumps(
        [
            {
                "host": "h1",
                "plugin": "cpu",
                "plugin_instance": "0",
                "type": "percent",
                "type_instance": "user",
                "dsnames": ["value"],
                "dstypes": ["gauge"],
                "values": [12.5],
                "time": 1600000000.0,
            }
        ]
    )
    out = parse_collectd_json(pa.table({"raw": [payload, "junk"]}))
    rows = out.to_pylist()
    assert len(rows) == 1
    assert rows[0]["metric_name"] == "cpu.0.percent.user"
    assert rows[0]["value"] == 12.5 and rows[0]["host"] == "h1"


def test_k8s_path_metadata():
    path = (
        "/var/log/pods/prod_api-7f9_0a1b2c3d-1111-2222-3333-444455556666/app/3.log"
    )
    out = K8sPathMetadata()(pa.table({"file_path": [path, "not-a-pod-path"]}))
    rows = out.to_pylist()
    assert rows[0]["k8s.namespace.name"] == "prod"
    assert rows[0]["k8s.pod.name"] == "api-7f9"
    assert rows[0]["k8s.pod.uid"] == "0a1b2c3d-1111-2222-3333-444455556666"
    assert rows[0]["k8s.container.name"] == "app"
    assert rows[0]["run_id"] == "3"
    assert rows[1]["k8s.pod.name"] is None


def test_trace_parser():
    t = pa.table(
        {
            "trace_id_hex": ["0af7651916cd43dd8448eb211c80319c", "zz", None],
            "span_id_hex": ["b7ad6b7169203331", "00", None],
            "trace_flags_hex": ["01", "ff", None],
        }
    )
    out = TraceParser()(t).to_pylist()
    assert out[0]["trace_id"] == bytes.fromhex("0af7651916cd43dd8448eb211c80319c")
    assert out[0]["span_id"] == bytes.fromhex("b7ad6b7169203331")
    assert out[0]["trace_flags"] == 1
    assert out[1]["trace_id"] is None  # invalid hex
    assert out[1]["span_id"] is None  # wrong length
    assert out[1]["trace_flags"] == 255
    assert out[2]["trace_id"] is None


def test_decode_bytes_encodings():
    import pytest

    from opentelemetry_collector_contrib_ray.functions.encodings import decode_bytes

    t = pa.table(
        {
            "payload": pa.array(
                ["héllo".encode("utf-8"), "wörld".encode("utf-16le"), None],
                pa.binary(),
            )
        }
    )
    out = decode_bytes(t, encoding="utf-8")
    assert out["raw"].to_pylist()[0] == "héllo"
    assert out["raw"].to_pylist()[2] is None
    out16 = decode_bytes(t.slice(1, 1), encoding="utf-16le")
    assert out16["raw"].to_pylist() == ["wörld"]
    with pytest.raises(ValueError):
        decode_bytes(t, encoding="klingon")
