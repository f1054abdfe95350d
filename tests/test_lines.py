"""Line-protocol decoder goldens, ported from the reference parsers'
own test tables (carbon plaintext_parser_test.go:26, statsd parser
cases, splunk_to_logdata.go mapping)."""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.sources.lines import (
    CarbonRegexParser,
    SplunkHecParser,
    parse_carbon_plaintext,
    parse_rfc5424,
    parse_statsd,
)


def test_carbon_plaintext():
    t = pa.table(
        {"raw": ["sys.cpu.load 0.7 1620000000", "a.b;tag1=v1;tag2=v2 42 1620000001", "garbage"]}
    )
    out = parse_carbon_plaintext(t)
    assert out["metric_name"].to_pylist() == ["sys.cpu.load", "a.b", None]
    assert out["value"].to_pylist() == [0.7, 42.0, None]
    assert out["tags"].to_pylist()[1] == "tag1=v1;tag2=v2"
    assert out["timestamp"].to_pylist()[0].year == 2021


def test_carbon_regex_rules():
    """key_/name_ capture groups → labels/metric name
    (protocol/regex_parser.go:42-96,118-160)."""
    rules = [
        {
            "regexp": r"(?P<key_svc>[^.]+)\.cpu\.(?P<name_0>\w+)",
            "name_prefix": "cpu.",
            "labels": {"env": "prod"},
            "metric_type": "cumulative",
        }
    ]
    p = CarbonRegexParser(rules)
    t = pa.table({"raw": ["web01.cpu.seconds 1.5 1620000000"]})
    out = p(t)
    row = out.to_pylist()[0]
    assert row["metric_name"] == "cpu.seconds"
    assert '"svc": "web01"' in row["labels"] and '"env": "prod"' in row["labels"]
    assert row["metric_type"] == "cumulative"


def test_statsd_lines():
    t = pa.table(
        {
            "raw": [
                "page.views:1|c",
                "load:0.5|g",
                "latency:320|ms|@0.1",
                "gauge.delta:+3|g",
                "bad line",
            ]
        }
    )
    out = parse_statsd(t)
    rows = out.to_pylist()
    assert rows[0]["name"] == "page.views" and rows[0]["mtype"] == "c" and rows[0]["value"] == 1.0
    assert rows[1]["value"] == 0.5
    # counter sample-rate upscale applies only to counters; timers keep raw value
    assert rows[2]["value"] == 320.0 and rows[2]["rate"] == 0.1
    assert rows[3]["is_delta"] is True and rows[3]["value"] == 3.0
    assert rows[4]["name"] is None


def test_statsd_counter_rate_upscale():
    t = pa.table({"raw": ["hits:2|c|@0.25"]})
    out = parse_statsd(t)
    assert out["value"].to_pylist() == [8.0]  # statsd_parser.go:296-314


def test_splunk_hec():
    import json

    ev = {
        "time": 1600000000.5,
        "event": "hello",
        "host": "h1",
        "source": "s1",
        "sourcetype": "st",
        "index": "main",
        "fields": {"b": 2, "a": 1},
    }
    t = pa.table({"raw": [json.dumps(ev)]})
    out = SplunkHecParser()(t).to_pylist()[0]
    assert out["body"] == "hello"
    assert out["ts_ns"] == int(1600000000.5 * 1e9)
    assert out["host.name"] == "h1"
    assert out["com.splunk.index"] == "main"
    assert out["fields"] == '{"a": 1, "b": 2}'  # keys sorted (:67-71)


def test_rfc5424():
    line = '<165>1 2021-03-01T12:00:00Z host app 1234 ID47 [x a="b"] hello 5424'
    out = parse_rfc5424(pa.table({"raw": [line]})).to_pylist()[0]
    assert out["pri"] == "165" and out["hostname"] == "host"
    assert out["appname"] == "app" and out["message"] == "hello 5424"


def test_split_packet_lines():
    from opentelemetry_collector_contrib_ray.sources.lines import split_packet_lines

    t = pa.table(
        {
            "src": ["udp-1", "udp-2"],
            "raw": ["a:1|c\nb:2|g\n", "c:3|ms"],
        }
    )
    out = split_packet_lines(t)
    assert out["raw"].to_pylist() == ["a:1|c", "b:2|g", "c:3|ms"]
    assert out["src"].to_pylist() == ["udp-1", "udp-1", "udp-2"]
    parsed = parse_statsd(out)
    assert parsed["name"].to_pylist() == ["a", "b", "c"]
