"""Corpus-prep kill-resume durability proof (SURVEY §12 capstone).

Runs `prepare_corpus` over an amplified documents corpus (default 400k
docs, the round-4 benchmark scale) three ways:

  1. reference run to completion   → REF_DIR
  2. a second run that the parent  → KILL_DIR
     SIGKILLs mid shard-write
  3. restart of (2), same KILL_DIR — must skip finished shards and
     rebuild the pre-marker artifacts without doubling them

then verifies the resumed output is IDENTICAL to the reference run:
per-split document counts, packed chunk counts, per-shard row counts
and content fingerprints (order-sensitive hash of each shard's
_chunk_uid sequence — the training read order).

Usage:
  python tools/prep_resume_proof.py             # parent (orchestrates)
  python tools/prep_resume_proof.py --child OUT # one prep run (internal)

Writes the result JSON to docs/prep_resume_r5.json.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET_DOCS = int(os.environ.get("OTELRAY_PREP_DOCS", "400000"))
N_SHARDS = 64
REF_DIR = "/tmp/prep_proof_ref"
KILL_DIR = "/tmp/prep_proof_kill"


def _amplified_docs():
    """The benchmark's amplification recipe, imported so the proof
    measures exactly the bench workload (one shared definition)."""
    from opentelemetry_collector_contrib_ray.pipelines.corpus_prep import (
        amplify_documents,
    )

    return amplify_documents(os.path.join(SF_DIR, "documents.parquet"), TARGET_DOCS)


def run_child(out_dir: str) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from opentelemetry_collector_contrib_ray.pipelines.corpus_prep import (
        PrepConfig,
        prepare_corpus,
    )

    ds, n_docs = _amplified_docs()
    cfg = PrepConfig(
        vocab_size=50_000,
        seq_len=2048,
        pack_emit_tokens=False,
        shard_shuffle=True,
        n_shards=N_SHARDS,
    )
    t0 = time.perf_counter()
    res = prepare_corpus(ds, cfg, out_dir=out_dir)
    out = {
        "docs_in": n_docs,
        "seconds": round(time.perf_counter() - t0, 3),
        "stats": res.stats,
        "shards_skipped": (
            int(res.shards["skipped"].sum()) if res.shards is not None else None
        ),
        "shard_rows": (
            int(res.shards["n_rows"].sum()) if res.shards is not None else None
        ),
    }
    print("CHILD_RESULT " + json.dumps(out))
    ray.shutdown()


def summarize(out_dir: str) -> dict:
    """Content summary of a finished prep dir: per-split doc counts,
    packed chunk count, per-shard (rows, read-order uid fingerprint)."""
    import hashlib

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    docs = pads.dataset(os.path.join(out_dir, "documents"), partitioning="hive")
    tbl = docs.to_table(columns=["split"])
    split_counts = tbl.group_by("split").aggregate([("split", "count")]).to_pydict()
    splits = dict(
        zip(
            [str(s) for s in split_counts["split"]],
            split_counts["split_count"],
        )
    )
    packed_rows = pads.dataset(os.path.join(out_dir, "packed"), partitioning="hive").count_rows()
    shards = {}
    sdir = os.path.join(out_dir, "shards")
    for f in sorted(os.listdir(sdir)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(sdir, f), columns=["_chunk_uid"])
        h = hashlib.sha256("\n".join(t["_chunk_uid"].to_pylist()).encode()).hexdigest()[:16]
        shards[f] = {"rows": t.num_rows, "uid_fp": h}
    return {"split_counts": splits, "packed_rows": packed_rows, "shards": shards}


def spawn(out_dir: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", out_dir],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )


def parent() -> None:
    import shutil

    for d in (REF_DIR, KILL_DIR):
        shutil.rmtree(d, ignore_errors=True)

    # 1. reference run
    p = spawn(REF_DIR)
    out_ref, _ = p.communicate()
    assert p.returncode == 0, f"reference run failed rc={p.returncode}"
    ref_child = json.loads(out_ref.strip().splitlines()[-1].split("CHILD_RESULT ")[1])

    # 2. kill run: SIGKILL as soon as a few shard files are final
    p = spawn(KILL_DIR)
    sdir = os.path.join(KILL_DIR, "shards")
    killed_at_shards = None
    while p.poll() is None:
        n = (
            len([f for f in os.listdir(sdir) if f.endswith(".parquet")])
            if os.path.isdir(sdir)
            else 0
        )
        if 4 <= n < N_SHARDS:
            os.kill(p.pid, signal.SIGKILL)
            killed_at_shards = n
            break
        time.sleep(0.05)
    p.wait()
    assert killed_at_shards is not None, (
        "child finished before the kill landed — raise OTELRAY_PREP_DOCS"
    )
    assert not os.path.exists(os.path.join(KILL_DIR, "_done.json"))

    # 3. restart — must skip the finished shards and complete
    p = spawn(KILL_DIR)
    out_resume, _ = p.communicate()
    assert p.returncode == 0, f"resume run failed rc={p.returncode}"
    resume_child = json.loads(
        out_resume.strip().splitlines()[-1].split("CHILD_RESULT ")[1]
    )

    ref, resumed = summarize(REF_DIR), summarize(KILL_DIR)
    result = {
        "docs_in": ref_child["docs_in"],
        "n_shards": N_SHARDS,
        "killed_at_shards": killed_at_shards,
        "resume_shards_skipped": resume_child["shards_skipped"],
        "ref_seconds": ref_child["seconds"],
        "resume_seconds": resume_child["seconds"],
        "split_counts_match": ref["split_counts"] == resumed["split_counts"],
        "packed_rows_match": ref["packed_rows"] == resumed["packed_rows"],
        "shard_manifests_match": ref["shards"] == resumed["shards"],
        "split_counts": ref["split_counts"],
        "packed_rows": ref["packed_rows"],
        "shard_rows_total": sum(s["rows"] for s in ref["shards"].values()),
    }
    ok = (
        result["split_counts_match"]
        and result["packed_rows_match"]
        and result["shard_manifests_match"]
        and result["resume_shards_skipped"] >= killed_at_shards
    )
    result["ok"] = ok
    os.makedirs("docs", exist_ok=True)
    with open("docs/prep_resume_r5.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    for d in (REF_DIR, KILL_DIR):
        shutil.rmtree(d, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if "--child" in sys.argv:
        run_child(sys.argv[sys.argv.index("--child") + 1])
    else:
        parent()
