"""awsemfexporter semantics tests (metric_translator.go,
metric_declaration.go, util.go golden behaviors)."""

import json

import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.stages.emf import (
    SINGLE_DIMENSION_ROLLUP_ONLY,
    ZERO_AND_SINGLE_DIMENSION_ROLLUP,
    EmfRenderer,
    LabelMatcher,
    MetricDeclaration,
    dedup_dimensions,
    dimension_rollup,
    render_emf_event,
    translate_unit,
)


def test_dimension_rollup_zero_and_single():
    # util.go:119-152: zero dim + sorted single-label sets
    labels = {"b": "1", "a": "2"}
    rollup = dimension_rollup(ZERO_AND_SINGLE_DIMENSION_ROLLUP, labels)
    assert rollup == [[], ["b"], ["a"]] or rollup == [[], ["a"], ["b"]]
    assert [] in rollup and ["a"] in rollup and ["b"] in rollup


def test_dimension_rollup_otellib_joins_every_set():
    labels = {"OTelLib": "lib", "x": "1"}
    rollup = dimension_rollup(ZERO_AND_SINGLE_DIMENSION_ROLLUP, labels)
    assert rollup == [["OTelLib"], ["OTelLib", "x"]]
    # single-only skips the zero dimension
    assert dimension_rollup(SINGLE_DIMENSION_ROLLUP_ONLY, labels) == [
        ["OTelLib", "x"]
    ]


def test_dimension_rollup_no_labels_no_zero():
    # :133-135 zero-rollup only when there are original labels
    assert dimension_rollup(ZERO_AND_SINGLE_DIMENSION_ROLLUP, {}) == []


def test_dedup_dimensions_order_preserving():
    assert dedup_dimensions([["a"], ["b"], ["a"], ["a", "b"]]) == [
        ["a"],
        ["b"],
        ["a", "b"],
    ]


def test_translate_unit_table_and_descriptor():
    assert translate_unit("ms", "m") == "Milliseconds"
    assert translate_unit("By", "m") == "Bytes"
    assert translate_unit("weird", "m") == "weird"
    # descriptor fills empty unit; overwrite replaces a set unit
    d = {"m": {"unit": "Count", "overwrite": False}}
    assert translate_unit("", "m", d) == "Count"
    assert translate_unit("s", "m", d) == "Seconds"
    d2 = {"m": {"unit": "Count", "overwrite": True}}
    assert translate_unit("s", "m", d2) == "Count"


def _emf(labels, metrics, **kw):
    return json.loads(
        render_emf_event(labels, metrics, "ns", 1234, **kw)
    )


def test_emf_no_declarations_full_dimset_plus_rollup():
    doc = _emf({"a": "1", "b": "2"}, {"m": (5, "Count")})
    aws = doc["_aws"]
    assert aws["Timestamp"] == 1234
    (meas,) = aws["CloudWatchMetrics"]
    assert meas["Namespace"] == "ns"
    assert meas["Metrics"] == [{"Name": "m", "Unit": "Count"}]
    # full dimSet + zero + singles
    assert ["a", "b"] in meas["Dimensions"] or ["b", "a"] in meas["Dimensions"]
    assert [] in meas["Dimensions"]
    assert ["a"] in meas["Dimensions"] and ["b"] in meas["Dimensions"]
    assert doc["a"] == "1" and doc["m"] == 5


def test_emf_single_label_dedup_edge():
    # metric_translator.go:201-211: single label + single-dim rollup →
    # the full dimSet is dropped (it would duplicate the rollup set)
    doc = _emf({"a": "1"}, {"m": (5, "")})
    (meas,) = doc["_aws"]["CloudWatchMetrics"]
    assert meas["Dimensions"] == [[], ["a"]]
    # no Unit key when unit is empty
    assert meas["Metrics"] == [{"Name": "m"}]


def test_emf_declarations_filter_names_and_extract_dims():
    decls = [
        MetricDeclaration(["^m1$"], dimensions=[["a"], ["a", "missing"]]),
        MetricDeclaration(["^m2"], dimensions=[["b"]]),
    ]
    doc = _emf(
        {"a": "1", "b": "2"},
        {"m1": (1, ""), "m2": (2, ""), "nomatch": (3, "")},
        declarations=decls,
        rollup_option="",
    )
    meas = doc["_aws"]["CloudWatchMetrics"]
    assert len(meas) == 2
    by_metric = {m["Metrics"][0]["Name"]: m for m in meas}
    # ["a","missing"] dropped (label absent); rollup disabled
    assert by_metric["m1"]["Dimensions"] == [["a"]]
    assert by_metric["m2"]["Dimensions"] == [["b"]]
    # the unmatched metric is still a FIELD, just not a measurement
    assert doc["nomatch"] == 3


def test_emf_declarations_label_matcher_gates_batch():
    decls = [
        MetricDeclaration(
            ["m"],
            dimensions=[["a"]],
            label_matchers=[LabelMatcher(["a", "b"], "^1;9$")],
        )
    ]
    # labels join as "1;2" which does not match → no measurements → no _aws
    doc = _emf({"a": "1", "b": "2"}, {"m": (5, "")}, declarations=decls)
    assert "_aws" not in doc and doc["m"] == 5
    # matching labels produce the block
    doc2 = _emf({"a": "1", "b": "9"}, {"m": (5, "")}, declarations=decls)
    assert "_aws" in doc2


def test_emf_parse_json_encoded_attrs():
    doc = _emf(
        {"kubernetes": '{"pod":"p1"}', "bad": "{not json"},
        {"m": (1, "")},
        parse_json_attrs=("kubernetes", "bad"),
    )
    assert doc["kubernetes"] == {"pod": "p1"}
    assert doc["bad"] == "{not json"  # unparsable left as-is (:352-361)


def test_emf_renderer_groups_and_first_wins():
    batch = pa.table(
        {
            "svc": ["a", "a", "b"],
            "cpu": [1.5, 99.0, 3.0],
            "mem": [None, 7, 8],
            "ts_ms": [1000, 1000, 1000],
        }
    )
    r = EmfRenderer(
        ["svc"], {"cpu": "", "mem": "By"}, namespace="ns", timestamp_col="ts_ms"
    )
    out = r(batch)
    assert out.num_rows == 2
    docs = {json.loads(m)["svc"]: json.loads(m) for m in out["message"].to_pylist()}
    # first datapoint wins per group; None metric skipped entirely
    assert docs["a"]["cpu"] == 1.5 and "mem" not in docs["a"]
    assert docs["b"]["mem"] == 8
    (meas,) = docs["b"]["_aws"]["CloudWatchMetrics"]
    assert {"Name": "mem", "Unit": "Bytes"} in meas["Metrics"]


def test_emf_renderer_on_dataset():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "svc": ["x"] * 10,
                "lat": list(range(10)),
                "ts_ms": [2000] * 10,
            }
        )
    )
    out = ds.map_batches(
        EmfRenderer(["svc"], {"lat": "ms"}, timestamp_col="ts_ms"),
        batch_format="pyarrow",
    ).take_all()
    assert len(out) == 1
    doc = json.loads(out[0]["message"])
    assert doc["lat"] == 0 and doc["_aws"]["Timestamp"] == 2000
