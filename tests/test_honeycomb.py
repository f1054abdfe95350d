"""Tests for stages/honeycomb.py (honeycomb.go / translator.go)."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.honeycomb import HoneycombEvents


def run(rows, **kw):
    cols = {}
    keys = set().union(*(r.keys() for r in rows))
    defaults = {
        "trace_id": "t1", "span_id": "s1", "name": "op",
        "start_ns": 1_000_000_000, "end_ns": 1_002_500_000,
    }
    for k in keys | set(defaults):
        cols[k] = [r.get(k, defaults.get(k)) for r in rows]
    return HoneycombEvents(**kw)(pa.table(cols)).to_pylist()


def test_main_event_fields():
    out = run([{"kind": "server", "status_code": 2, "status_message": "boom"}])
    assert len(out) == 1
    r = out[0]
    assert r["annotation_type"] == "span"
    assert r["duration_ms"] == 2.5  # (end-start)/1ms as float
    assert r["span_kind"] == "server"
    assert r["status_code"] == 2 and r["status_message"] == "boom"
    assert r["sample_rate"] == 1


def test_status_message_defaults_to_enum_name():
    out = run([{"status_code": 0}, {"status_code": 1}])
    assert out[0]["status_message"] == "STATUS_CODE_UNSET"
    assert out[1]["status_message"] == "STATUS_CODE_OK"


def test_unknown_kind_is_unspecified():
    assert run([{"kind": "weird"}])[0]["span_kind"] == "unspecified"
    assert run([{}])[0]["span_kind"] == "unspecified"


def test_links_and_events_fan_out():
    out = run([{"n_links": 2, "n_events": 1}])
    by = {}
    for r in out:
        by.setdefault(r["annotation_type"], []).append(r)
    assert len(by["span"]) == 1
    assert len(by["link"]) == 2
    assert len(by["span_event"]) == 1
    # links/events parent to the span (:205-212, :250-257)
    assert all(r["parent_id"] == "s1" for r in by["link"] + by["span_event"])
    assert by["span_event"][0]["parent_name"] == "op"


def test_sample_rate_attribute_int_only():
    out = run(
        [{"sr": 4}, {"sr": 2.5}, {}],
        sample_rate_attribute="sr",
    )
    spans = [r for r in out if r["annotation_type"] == "span"]
    assert [r["sample_rate"] for r in spans] == [4, 1, 1]  # non-int ignored
