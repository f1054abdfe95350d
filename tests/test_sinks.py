"""Sink-side transform semantics (lokiexporter label allow-list +
drop counting, elasticsearch objmodel dedup/dedot, splunk HEC outbound
mapping, loadbalancing consistent-hash fan-out)."""

import json

import pandas as pd
import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.sinks import (
    EsDocModel,
    LokiLabeler,
    consistent_hash_partition,
    dedup_dedot_keys,
    loki_streams,
    splunk_hec_fields,
)


def test_loki_labeler_drops_unmatched():
    t = pa.table(
        {
            "severity_text": ["Error", None, "Info"],
            "other": ["a", "b", "c"],
        }
    )
    out = LokiLabeler({"severity_text": "severity"})(t)
    # row with null severity has NO matching label → dropped (exporter.go:132-136)
    assert len(out) == 2
    assert json.loads(out["labels"].to_pylist()[0]) == {"severity": "Error"}
    assert out["_batch_dropped"].to_pylist() == [1, 1]


def test_loki_streams_group_by_labelset():
    df = pd.DataFrame(
        {"app": ["x", "x", "y"], "env": ["p", "p", "p"], "msg": ["1", "2", "3"]}
    )
    out = (
        loki_streams(ray.data.from_pandas(df), {"app": "app", "env": "env"})
        .to_pandas()
        .sort_values("labels")
        .reset_index(drop=True)
    )
    assert out["count"].tolist() == [2, 1]


def test_dedup_dedot():
    # objmodel.go:187-233: sorted keys, dotted keys expand to nesting
    obj = {"a.b": 1, "a.c": 2, "z": 3}
    assert dedup_dedot_keys(obj) == {"a": {"b": 1, "c": 2}, "z": 3}


def test_es_doc_model():
    t = pa.table({"a.b": [1], "z": ["v"]})
    out = EsDocModel(["a.b", "z"])(t)
    assert json.loads(out["doc"].to_pylist()[0]) == {"a": {"b": 1}, "z": "v"}


def test_splunk_outbound():
    t = pa.table(
        {
            "host.name": ["h"],
            "com.splunk.index": ["main"],
            "msg": ["hello"],
            "ts": pa.array([1_600_000_000_000_000_000], pa.timestamp("ns")),
        }
    )
    out = splunk_hec_fields(t).to_pylist()[0]
    assert out["host"] == "h" and out["index"] == "main"
    assert out["event"] == "hello"
    assert out["time"] == 1.6e9  # ns → fractional seconds (:130)


def test_consistent_hash_partition_stable():
    df = pd.DataFrame({"trace_id": [f"t{i}" for i in range(500)]})
    a = consistent_hash_partition(ray.data.from_pandas(df), "trace_id", 4).to_pandas()
    b = consistent_hash_partition(ray.data.from_pandas(df), "trace_id", 4).to_pandas()
    assert a.sort_values("trace_id")["backend"].tolist() == b.sort_values("trace_id")["backend"].tolist()
    assert a["backend"].nunique() == 4


def test_render_carbon_roundtrip():
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.sources.lines import parse_carbon_plaintext
    from opentelemetry_collector_contrib_ray.stages.sinks import render_carbon_lines

    t = pa.table(
        {
            "metric_name": ["sys.load"],
            "value": [7.0],
            "timestamp": pa.array([1_600_000_000_000_000], pa.timestamp("us")),
        }
    )
    rendered = render_carbon_lines(t)
    back = parse_carbon_plaintext(rendered.select(["line"]).rename_columns(["raw"]))
    assert back["metric_name"].to_pylist() == ["sys.load"]
    assert back["value"].to_pylist() == [7.0]


def test_render_influx_roundtrip():
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.sources.lines import parse_influx_line
    from opentelemetry_collector_contrib_ray.stages.sinks import render_influx_lines

    t = pa.table(
        {
            "measurement": ["cpu", "mem"],
            "tags": ["host=h1", None],
            "field_key": ["usage", "free"],
            "field_value": [0.5, 1024.0],
            "ts_ns": pa.array([1_600_000_000_000_000_000, None], pa.int64()),
        }
    )
    rendered = render_influx_lines(t)
    back = parse_influx_line(rendered.select(["line"]).rename_columns(["raw"]))
    assert back["measurement"].to_pylist() == ["cpu", "mem"]
    assert back["field_value"].to_pylist() == [0.5, 1024.0]
    assert back["tags"].to_pylist() == ["host=h1", None]


class TestCloudWatchLogs:
    def test_render_matches_go_marshal_semantics(self):
        import json

        from opentelemetry_collector_contrib_ray.stages.sinks import (
            render_cloudwatch_logs,
        )

        t = pa.table(
            {
                "name": ["n1", ""],
                "body": ['he <b> & "q"\n', "b2"],
                "sev": [0, 9],
                "sevt": ["", "WARN"],
                "drop": [2, 0],
                "flags": [0, 1],
                "tid": ["ab" * 16, ""],
                "sid": ["", "cd" * 8],
                "et": ["click", ""],
                "uid": [7, 0],
                "host": ["h1", "h2"],
                "ts": [1_500_000_000_500_000_000, 2_000_000_123_000_000_000],
            }
        )
        out = render_cloudwatch_logs(
            t,
            ts_ns_col="ts",
            name_col="name",
            body_col="body",
            severity_number_col="sev",
            severity_text_col="sevt",
            dropped_count_col="drop",
            flags_col="flags",
            trace_id_col="tid",
            span_id_col="sid",
            attr_cols={"event_type": "et", "user_id": "uid"},
            resource_cols={"host.name": "host"},
        )
        msgs = out["cw_message"].to_pylist()
        # timestamp is ns // 1e6 (exporter.go:190)
        assert out["cw_timestamp"].to_pylist() == [1_500_000_000_500, 2_000_000_123_000]
        # row 0: zero severity/flags omitted, empty sevt/span omitted;
        # Go HTML-safe escaping on < > &
        m0 = msgs[0]
        assert m0.startswith('{"name":"n1","body":"he \\u003cb\\u003e \\u0026 \\"q\\"\\n"')
        assert '"severity_number"' not in m0 and '"flags"' not in m0
        assert '"dropped_attributes_count":2' in m0
        assert '"trace_id":"' + "ab" * 16 + '"' in m0
        assert '"span_id"' not in m0
        # struct-member ORDER is Go's declaration order
        o0 = json.loads(m0)
        assert list(o0) == [
            "name", "body", "dropped_attributes_count", "trace_id",
            "attributes", "resource",
        ]
        assert o0["attributes"] == {"event_type": "click", "user_id": 7}
        assert o0["resource"] == {"host.name": "h1"}
        # row 1: empty name omitted; zero-int ATTRIBUTE kept (omitempty
        # applies to struct members, not map entries)
        o1 = json.loads(msgs[1])
        assert "name" not in o1
        assert o1["severity_number"] == 9 and o1["severity_text"] == "WARN"
        assert o1["attributes"] == {"user_id": 0}
        assert o1["span_id"] == "cd" * 8

    def test_empty_maps_omitted(self):
        from opentelemetry_collector_contrib_ray.stages.sinks import (
            render_cloudwatch_logs,
        )

        t = pa.table({"body": ["x"], "et": [""], "ts": [10**18]})
        out = render_cloudwatch_logs(
            t, ts_ns_col="ts", body_col="body", attr_cols={"event_type": "et"}
        )
        assert out["cw_message"].to_pylist() == ['{"body":"x"}']
