"""Routing semantics ported from processor/routingprocessor/routing_test.go:36-113
(default fallback, missing attribute, registered routes) and
routing.go:54-69 (config validation), :153-162 (multi-exporter fan-out)."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.route import BatchPerKey, RoutingTable


def _t(vals):
    return pa.table({"attr": pa.array(vals, pa.string()), "v": list(range(len(vals)))})


def test_registered_route():
    rt = RoutingTable("attr", {"acme": ["s1"]}, ["s0"])
    out = rt(_t(["acme", "other", None]))
    got = sorted(zip(out["sink"].to_pylist(), out["v"].to_pylist()))
    # acme → s1; no-match and missing → default s0
    assert got == [("s0", 1), ("s0", 2), ("s1", 0)]


def test_missing_attribute_column_goes_default():
    rt = RoutingTable("nope", {"acme": ["s1"]}, ["s0"])
    out = rt(_t(["acme"]))
    assert out["sink"].to_pylist() == ["s0"]


def test_multi_exporter_fanout():
    rt = RoutingTable("attr", {"acme": ["s1", "s2"]}, ["s0"])
    out = rt(_t(["acme"]))
    assert sorted(out["sink"].to_pylist()) == ["s1", "s2"]
    assert out["v"].to_pylist() == [0, 0]  # row duplicated per exporter


def test_validation():
    with pytest.raises(ValueError):
        RoutingTable("attr", {}, ["s0"])
    with pytest.raises(ValueError):
        RoutingTable("", {"a": ["s"]}, ["s0"])
    with pytest.raises(ValueError):
        RoutingTable("attr", {"a": []}, ["s0"])


def test_batch_per_key():
    t = pa.table({"tok": ["a", "b", "a"], "v": [1, 2, 3]})
    parts = BatchPerKey("tok")(t)
    sizes = sorted(len(p) for p in parts)
    assert sizes == [1, 2]
