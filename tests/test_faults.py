"""Fault tolerance: Ray task retries produce correct, non-duplicated
results; checkpoint runs recover from a crash between sink write and
manifest commit (exporterhelper retry analogue, SURVEY §4)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data


def test_task_retry_no_duplication():
    """A map task that fails once per worker process still yields exact
    results — Ray re-executes the task; block outputs are not
    duplicated."""

    def flaky(batch: pa.Table) -> pa.Table:
        import os

        # fail each batch's FIRST attempt (marker keyed by content so
        # the retry succeeds regardless of which worker reruns it)
        marker = f"/tmp/_flaky_{batch['x'][0].as_py()}"
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("injected failure (first attempt for this batch)")
        return batch

    import glob

    for f in glob.glob("/tmp/_flaky_*"):
        os.remove(f)
    df = pd.DataFrame({"x": np.arange(10_000)})
    ds = ray.data.from_pandas(df).repartition(8)
    # application-level exceptions need retry_exceptions (system
    # failures retry by default) — the engine's transient-error config
    out = ds.map_batches(
        flaky,
        batch_format="pyarrow",
        retry_exceptions=True,
        max_retries=3,
    ).to_pandas()
    assert sorted(out["x"]) == list(range(10_000))
    for f in glob.glob("/tmp/_flaky_*"):
        os.remove(f)


def test_checkpoint_crash_between_write_and_manifest(tmp_path, monkeypatch):
    """Crash after sink write but before manifest commit → rerun redoes
    the shard atomically (no duplicate rows, identical metrics)."""
    from opentelemetry_collector_contrib_ray.pipelines import log_pipeline as lp
    from opentelemetry_collector_contrib_ray.sources.synth import write_synth_corpus
    from opentelemetry_collector_contrib_ray.state.checkpoint import CheckpointManifest

    corpus = str(tmp_path / "corpus")
    run_dir = str(tmp_path / "run")
    write_synth_corpus(corpus, 1500, num_files=3)

    real_mark = CheckpointManifest.mark_complete
    calls = {"n": 0}

    def crashing_mark(self, shard_id, record):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash before manifest commit")
        return real_mark(self, shard_id, record)

    monkeypatch.setattr(CheckpointManifest, "mark_complete", crashing_mark)
    with pytest.raises(RuntimeError, match="injected crash"):
        lp.run_checkpointed(corpus, run_dir)
    monkeypatch.setattr(CheckpointManifest, "mark_complete", real_mark)

    # shard 2's sinks were written but not committed → rerun redoes it
    m = CheckpointManifest(run_dir)
    assert len(m.completed_shards()) == 1
    s = lp.run_checkpointed(corpus, run_dir)
    assert s["shards_skipped"] == 1 and s["shards_run"] == 2
    assert s["metrics"]["rows_in"] == 1500
    # no duplicated sink rows: routed total equals an independent run
    fresh = lp.run_checkpointed(corpus, str(tmp_path / "run2"))
    assert s["metrics"] == fresh["metrics"]


def test_recombine_lines_predicates():
    from opentelemetry_collector_contrib_ray.stages.parse import RecombineLines

    lines = [
        "2021-03-01 ERROR boom",
        "  at foo.Bar(file.go:12)",
        "  at baz.Qux(file.go:34)",
        "2021-03-01 INFO ok",
        "2021-03-01 WARN hmm",
        "  detail line",
    ]
    t = pa.table({"raw": lines})
    out = RecombineLines(is_first_entry=r"^\d{4}-\d{2}-\d{2}")(t)
    joined = out["raw"].to_pylist()
    assert len(joined) == 3
    assert joined[0].count("\n") == 2 and "at baz" in joined[0]
    assert joined[1] == "2021-03-01 INFO ok"
    assert joined[2].endswith("detail line")
    # is_last_entry mode: entries end at lines ending with ';'
    t2 = pa.table({"raw": ["a", "b;", "c", "d;"]})
    out2 = RecombineLines(is_last_entry=r";$")(t2)
    assert out2["raw"].to_pylist() == ["a\nb;", "c\nd;"]
    with pytest.raises(ValueError):
        RecombineLines()


def test_recombine_lines_grouped_spanning_blocks():
    """Entries spanning input blocks reassemble correctly when lines
    are co-located per file and re-ordered (recombine_lines_grouped)."""
    import pandas as pd
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.parse import recombine_lines_grouped

    rows = []
    for f in ("a.log", "b.log"):
        lines = [
            "2021-03-01 ERROR boom",
            "  at One()",
            "  at Two()",
            "2021-03-01 INFO fine",
        ]
        for i, l in enumerate(lines):
            rows.append({"file": f, "seq": i, "raw": l})
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=7)  # scrambled
    ds = ray.data.from_pandas(df).repartition(4)  # entries span blocks
    out = recombine_lines_grouped(
        ds, "file", "seq", is_first_entry=r"^\d{4}-\d{2}-\d{2}"
    ).to_pandas()
    assert len(out) == 4  # 2 entries × 2 files
    for f in ("a.log", "b.log"):
        sub = out[out["file"] == f].sort_values("seq")
        assert sub["raw"].iloc[0].count("\n") == 2
        assert sub["raw"].iloc[1] == "2021-03-01 INFO fine"
