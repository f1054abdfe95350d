"""Enrich-stage semantics: association-rule chain + insert-if-absent
(processor/k8sprocessor/pod_association.go:31-87, processor.go:102-116;
resourcedetectionprocessor internal/resourcedetection.go:108-192)."""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.enrich import (
    ApplyResource,
    LookupEnrich,
    detect_resource,
)


def test_association_order_first_hit_wins():
    cache = {"ip-1": {"pod": "p1"}, "host-a": {"pod": "p2"}}
    e = LookupEnrich(cache, association=["ip", "host"])
    t = pa.table(
        {
            "ip": ["ip-1", "ip-miss", None],
            "host": ["host-a", "host-a", "host-a"],
        }
    )
    out = e(t)
    # row0: ip hits first; row1: ip misses cache → host used; row2: null ip → host
    assert out["pod"].to_pylist() == ["p1", "p2", "p2"]


def test_insert_if_absent():
    cache = {"k": {"team": "cached"}}
    e = LookupEnrich(cache, association=["src"])
    t = pa.table({"src": ["k", "k"], "team": ["existing", None]})
    out = e(t)
    # InsertString semantics: existing value NOT overwritten; null filled
    assert out["team"].to_pylist() == ["existing", "cached"]


def test_detect_resource_first_wins_and_apply():
    r = detect_resource([{"a": "1", "b": "x"}, {"b": "y", "c": "2"}])
    assert r == {"a": "1", "b": "x", "c": "2"}
    t = pa.table({"a": ["keep"]})
    out = ApplyResource(r)(t)
    assert out["a"].to_pylist() == ["keep"]  # insert, not upsert
    assert out["b"].to_pylist() == ["x"]
    out2 = ApplyResource(r, override=True)(t)
    assert out2["a"].to_pylist() == ["1"]


def test_extraction_rules():
    from opentelemetry_collector_contrib_ray.stages.enrich import (
        DEPLOYMENT_REGEX,
        apply_extraction_rules,
    )

    cache = {
        "p1": {"pod": "api-7f9d4-x2x1z", "label.team": "core"},
        "p2": {"pod": "singleword"},
    }
    rules = [
        {"from": "pod", "name": "deployment", "regex": DEPLOYMENT_REGEX},
        {"from": "label.team", "name": "team"},
    ]
    out = apply_extraction_rules(cache, rules)
    # kube/client.go:226-232: name-rsrand-podrand → deployment name
    assert out["p1"]["deployment"] == "api"
    assert out["p1"]["team"] == "core"
    # no regex match → empty string (extractField :259-271)
    assert out["p2"]["deployment"] == ""
    assert "team" not in out["p2"]  # missing source attr → skipped
    assert cache["p1"].get("deployment") is None  # original untouched


def test_env_detector(monkeypatch):
    monkeypatch.setenv("OTEL_RESOURCE", "k1=v1, k2 = v2")
    r = detect_resource()
    assert r["k1"] == "v1" and r["k2"] == "v2"
