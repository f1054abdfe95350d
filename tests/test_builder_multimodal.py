"""Config-driven pipeline builder + multimodal plumbing stubs."""

import numpy as np
import pytest

from opentelemetry_collector_contrib_ray.pipelines.builder import build, register_stage
from opentelemetry_collector_contrib_ray.stages.multimodal import (
    DeterministicFakeDecoder,
    PillowImageDecoder,
    frame_sample,
    synth_image_table,
)


def test_builder_synth_to_parquet(tmp_path):
    out = str(tmp_path / "out")
    cfg = {
        "source": {"kind": "synth", "rows": 500, "blocks": 2},
        "stages": [
            {"op": "regex_parser", "pattern": r"^(?P<time>\S+) (?P<sev>[A-Z]*)", "parse_from": "raw"},
            {"op": "severity_parser", "parse_from": "sev"},
            {"op": "metadata", "attributes": {"env": "prod"}},
        ],
        "sink": {"path": out},
    }
    ds = build(cfg)
    import ray.data

    back = ray.data.read_parquet(out)
    assert back.count() == 500
    cols = set(back.schema().names)
    assert {"severity_text", "env", "tokens"} <= cols


def test_builder_unknown_op():
    with pytest.raises(ValueError, match="unknown stage op"):
        build({"source": {"kind": "synth", "rows": 10}, "stages": [{"op": "nope"}]})


def test_builder_custom_registered_stage():
    @register_stage("upper_source")
    def _factory(**kw):
        import pyarrow.compute as pc

        def f(batch):
            return batch.set_column(
                batch.column_names.index("source"), "source", pc.utf8_upper(batch["source"])
            )

        return f

    ds = build({"source": {"kind": "synth", "rows": 50}, "stages": [{"op": "upper_source"}]})
    assert ds.take(1)[0]["source"].isupper()


def test_fake_decoder_deterministic():
    t = synth_image_table(8)
    d = DeterministicFakeDecoder(feature_dim=8)
    out1, out2 = d(t), d(t)
    assert out1["features"].to_pylist() == out2["features"].to_pylist()
    assert len(out1["features"].to_pylist()[0]) == 8
    assert all(0 <= m <= 255 for m in out1["byte_mean"].to_pylist())


def test_pillow_decoder_stubbed():
    d = PillowImageDecoder()
    if not d._pil:
        with pytest.raises(NotImplementedError):
            d(synth_image_table(1))


def test_frame_sample():
    t = synth_image_table(20)
    assert len(frame_sample(t, every_n=5)) == 4


def test_builder_full_dag():
    """Declarative end-to-end: synth → parse → enrich → route → aggregate."""
    cfg = {
        "source": {"kind": "synth", "rows": 800, "blocks": 2},
        "stages": [
            {"op": "regex_parser", "pattern": r"^(?P<time>\S+) (?P<sev>[A-Z]*)", "parse_from": "raw"},
            {"op": "severity_parser", "parse_from": "sev"},
        ],
        "enrich": {
            "table": {"app-a": {"team": "core"}, "syslog": {"team": "infra"}},
            "association": ["source"],
            "prefix": "meta.",
        },
        "routing": {
            "from_attribute": "severity_text",
            "table": {"Error": ["err"], "Info": ["std"]},
            "default": ["other"],
        },
        "aggregate": {"keys": ["sink"], "driver_finalize": True},
    }
    out = build(cfg)
    import pyarrow as pa

    assert isinstance(out, pa.Table)
    counts = dict(zip(out["sink"].to_pylist(), out["count"].to_pylist()))
    assert sum(counts.values()) == 800
    assert set(counts) <= {"err", "std", "other"}


def test_cli_main(tmp_path):
    """python -m opentelemetry_collector_contrib_ray <config> runs a
    pipeline end-to-end in a fresh process (the app.Run() analogue)."""
    import json
    import subprocess
    import sys

    cfg = {
        "source": {"kind": "synth", "rows": 300, "blocks": 1},
        "routing": {
            "from_attribute": "source",
            "table": {"app-a": ["a"]},
            "default": ["rest"],
        },
        "aggregate": {"keys": ["sink"], "driver_finalize": True},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    out = subprocess.run(
        [sys.executable, "-m", "opentelemetry_collector_contrib_ray", str(p), "--num-cpus", "2"],
        capture_output=True,
        text=True,
        check=True,
        cwd="/root/repo",
        timeout=180,
    ).stdout
    res = json.loads(out.strip().splitlines()[-1])
    assert sum(s["count"] for s in res["sample"]) == 300
