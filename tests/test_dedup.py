import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.dedup import (
    MinHasher,
    SimHasher,
    exact_dedup,
    minhash_lsh_groups,
    ngram_jaccard,
)


def _docs():
    base = "the quick brown fox jumps over the lazy dog again and again today"
    return pd.DataFrame(
        {
            "doc_id": ["d0", "d1", "d2", "d3"],
            "text": [
                base,
                base,  # exact dup of d0
                base.replace("today", "tomorrow"),  # near dup
                "completely different content about ray data pipelines running at scale",
            ],
        }
    )


def test_exact_dedup_first_wins():
    ds = ray.data.from_pandas(_docs())
    out = exact_dedup(ds).to_pandas()
    assert sorted(out["doc_id"]) == ["d0", "d2", "d3"]  # d1 deduped, min-id kept


def test_minhash_similarity_reflects_jaccard():
    mh = MinHasher(num_perm=128)
    docs = _docs()
    s0 = mh.signature(docs["text"][0])
    s1 = mh.signature(docs["text"][1])
    s2 = mh.signature(docs["text"][2])
    s3 = mh.signature(docs["text"][3])
    assert (s0 == s1).mean() == 1.0
    assert (s0 == s2).mean() > 0.5  # near dup
    assert (s0 == s3).mean() < 0.3  # unrelated


def test_minhash_lsh_buckets_near_dups_together():
    ds = ray.data.from_pandas(_docs())
    groups = minhash_lsh_groups(ds, bands=32, num_perm=64).to_pandas()
    multi = groups[groups["n"] >= 2]
    assert len(multi) > 0
    joint = set()
    for ids in multi["ids"]:
        joint.add(tuple(ids))
    assert any({"d0", "d1"} <= set(ids) for ids in joint)
    assert any({"d0", "d2"} <= set(ids) or {"d1", "d2"} <= set(ids) for ids in joint)
    # unrelated doc never shares a bucket with the dup cluster
    assert not any("d3" in ids and len(ids) > 1 for ids in joint)


def test_simhash_hamming():
    t = pa.table({"text": _docs()["text"].tolist()})
    out = SimHasher()(t)
    h = [np.uint64(x) for x in out["simhash"].to_pylist()]
    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")
    assert ham(h[0], h[1]) == 0
    assert ham(h[0], h[2]) < ham(h[0], h[3])


def test_ngram_jaccard():
    d = _docs()
    assert ngram_jaccard(d["text"][0], d["text"][1]) == 1.0
    assert 0 < ngram_jaccard(d["text"][0], d["text"][2]) < 1.0
    assert ngram_jaccard(d["text"][0], d["text"][3]) < 0.1


def test_near_dedup_end_to_end():
    """MinHash buckets → Jaccard verify → components → survivors."""
    base = (
        "the quick brown fox jumps over the lazy dog again and again today "
        "while the sun shines bright over the green hills of the valley"
    )
    docs = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(6)],
            "text": [
                base,
                base.replace("today", "tomorrow"),      # near dup of d0
                base.replace("valley", "canyon"),        # near dup of d0/d1
                "completely different text about distributed data processing engines at scale",
                "another unrelated document describing benchmark methodology in detail",
                base.replace("quick", "swift").replace("today", "tonight"),  # near dup
            ],
        }
    )
    from opentelemetry_collector_contrib_ray.stages.dedup import near_dedup

    ds = ray.data.from_pandas(docs)
    survivors, clusters = near_dedup(ds, jaccard_threshold=0.5, bands=32)
    surv = set(survivors["doc_id"].to_pylist())
    # d0/d1/d2/d5 form one duplicate cluster → only min id d0 survives
    assert "d0" in surv
    assert {"d1", "d2", "d5"} & surv == set()
    assert {"d3", "d4"} <= surv  # unrelated docs untouched
    roots = {clusters[k] for k in ("d1", "d2", "d5")}
    assert roots == {"d0"}


def test_simhash_buckets_near_dups():
    from opentelemetry_collector_contrib_ray.stages.dedup import simhash_buckets

    ds = ray.data.from_pandas(_docs())
    out = simhash_buckets(ds, bands=4)
    joint = [set(ids) for ids in out["ids"].to_pylist()]
    # exact dup pair d0/d1 shares every band; unrelated d3 never joins them
    assert any({"d0", "d1"} <= s for s in joint)
    assert not any("d3" in s and len(s) > 1 for s in joint)
