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
    out = simhash_buckets(ds, bands=4).to_pandas()
    joint = [set(ids) for ids in out["ids"]]
    # exact dup pair d0/d1 shares every band; unrelated d3 never joins them
    assert any({"d0", "d1"} <= s for s in joint)
    assert not any("d3" in s and len(s) > 1 for s in joint)


def test_lsh_candidate_pairs_distributed():
    """Pairs generated inside the bucketed groupby match the driver-side
    bucket→pairs path, deduped across bands."""
    from opentelemetry_collector_contrib_ray.stages.dedup import (
        _lsh_explode,
        candidate_pairs_from_buckets,
        lsh_candidate_pairs,
    )

    docs = _docs()
    ds = ray.data.from_pandas(docs)
    exploded = _lsh_explode(ds, "text", "doc_id", k=5, num_perm=64, bands=32).materialize()
    pairs_ds = lsh_candidate_pairs(exploded, "doc_id").to_pandas()
    got = sorted(zip(pairs_ds["id_a"], pairs_ds["id_b"]))
    from opentelemetry_collector_contrib_ray.stages.dedup import _resolve_buckets

    buckets = pa.Table.from_pandas(_resolve_buckets(exploded, "doc_id").to_pandas())
    want = candidate_pairs_from_buckets(buckets)
    assert got == sorted(want)
    assert all(a < b for a, b in got)


def test_verify_pairs_ds_matches_broadcast():
    from opentelemetry_collector_contrib_ray.stages.dedup import (
        verify_pairs,
        verify_pairs_ds,
    )

    docs = _docs()
    pairs = [("d0", "d1"), ("d0", "d2"), ("d0", "d3")]
    bcast = verify_pairs(ray.data.from_pandas(docs), pairs, threshold=0.3)
    pairs_ds = ray.data.from_pandas(
        pd.DataFrame({"id_a": [p[0] for p in pairs], "id_b": [p[1] for p in pairs]})
    )
    dist = verify_pairs_ds(
        ray.data.from_pandas(docs), pairs_ds, threshold=0.3
    ).to_pandas()
    got = {(a, b): j for a, b, j in zip(dist["id_a"], dist["id_b"], dist["jaccard"])}
    want = {(a, b): j for a, b, j in bcast}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12  # hash-set Jaccard == tuple-set Jaccard


def test_connected_components_ds_matches_union_find():
    from opentelemetry_collector_contrib_ray.stages.dedup import (
        connected_components,
        connected_components_ds,
    )

    edges = [("b", "c", 1.0), ("a", "b", 1.0), ("x", "y", 1.0), ("c", "d", 1.0)]
    uf = connected_components(edges)
    eds = ray.data.from_pandas(
        pd.DataFrame({"id_a": [e[0] for e in edges], "id_b": [e[1] for e in edges]})
    )
    lp = connected_components_ds(eds).to_pandas()
    got = dict(zip(lp["id"], lp["root"]))
    # label propagation converges to the component min id — same as
    # union-find smaller-root-wins
    assert got == {k: uf[k] for k in got}
    assert got["d"] == "a" and got["y"] == "x"


def test_embedding_neardup_multitable_recall():
    """Multi-table LSH (8×8-bit) finds planted cosine-0.97 pairs that a
    single table would likely miss, and never emits false positives."""
    from opentelemetry_collector_contrib_ray.stages.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 32)).astype(np.float32)
    # plant 10 near-dup partners at high cosine
    partners = base[:10] + 0.12 * rng.standard_normal((10, 32)).astype(np.float32)
    vecs = np.concatenate([base, partners])
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    ia, ib = np.triu_indices(len(vecs), k=1)
    true_pairs = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(ia[sims[ia, ib] >= 0.9], ib[sims[ia, ib] >= 0.9])
    }
    assert len(true_pairs) >= 8  # the plant worked
    df = pd.DataFrame({"vec_id": np.arange(len(vecs)), "embedding": list(vecs)})
    out = embedding_neardup_pairs(
        ray.data.from_pandas(df), threshold=0.9
    ).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}
    assert got <= true_pairs  # exact verification → no false positives
    assert len(got & true_pairs) / len(true_pairs) >= 0.8  # multi-table recall


def test_near_dedup_distributed_cc_matches_driver_cc():
    """Dup-heavy corpus (>50% duplicates): the distributed label-prop CC
    path (cc_mode='distributed') must produce identical survivors and
    cluster roots to the driver union-find path."""
    from opentelemetry_collector_contrib_ray.stages.dedup import near_dedup

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(200)]
    bases = [
        " ".join(rng.choice(words, size=40, replace=True)) for _ in range(12)
    ]
    rows = []
    for i, b in enumerate(bases):
        rows.append((f"d{i:03d}_0", b))
        # 2 near-dup variants per base → ~2/3 of the corpus is duplicate
        toks = b.split()
        for v in range(1, 3):
            t = list(toks)
            t[v] = f"alt{v}"
            rows.append((f"d{i:03d}_{v}", " ".join(t)))
    docs = pd.DataFrame(rows, columns=["doc_id", "text"])

    ds = ray.data.from_pandas(docs)
    surv_drv, clus_drv = near_dedup(ds, jaccard_threshold=0.5, cc_mode="driver")
    surv_dst, clus_dst = near_dedup(ds, jaccard_threshold=0.5, cc_mode="distributed")
    assert sorted(surv_drv["doc_id"].to_pylist()) == sorted(
        surv_dst["doc_id"].to_pylist()
    )
    assert clus_drv == clus_dst
    # every base's variants collapsed onto the min id
    surv = set(surv_dst["doc_id"].to_pylist())
    assert all(f"d{i:03d}_0" in surv for i in range(12))
    assert not any(f"d{i:03d}_{v}" in surv for i in range(12) for v in (1, 2))


class TestTokenDedup:
    """Token-native dedup over the pre-tokenized list<int32> shape."""

    def _ds(self):
        import ray.data

        rows = []
        for i in range(60):
            if i % 10 == 0:
                toks = [7, 8, 9, 10, 11, 12, 13, 14]  # exact-dup group
            else:
                toks = [int(x) for x in np.arange(20) * 3 + i]
            rows.append({"doc_id": i, "tokens": toks})
        import pandas as pd

        return ray.data.from_pandas(pd.DataFrame(rows))

    def test_exact_dedup_tokens(self):
        from opentelemetry_collector_contrib_ray.stages.dedup import exact_dedup_tokens

        surv = exact_dedup_tokens(self._ds()).to_pandas()
        ids = set(surv["doc_id"])
        # the six injected copies collapse to doc 0
        assert 0 in ids
        assert not ids & {10, 20, 30, 40, 50}
        assert len(ids) == 60 - 5

    def test_exact_dedup_tokens_order_and_length_sensitive(self):
        import ray.data
        import pandas as pd

        from opentelemetry_collector_contrib_ray.stages.dedup import exact_dedup_tokens

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "tokens": [[1, 2, 3], [3, 2, 1], [1, 2], [1, 2, 3, 0]],
            }
        )
        surv = exact_dedup_tokens(ray.data.from_pandas(df)).to_pandas()
        assert len(surv) == 4  # permutation / prefix / zero-pad all distinct

    def test_token_minhash_groups_find_near_pair(self):
        import ray.data
        import pandas as pd

        from opentelemetry_collector_contrib_ray.stages.dedup import (
            token_minhash_lsh_groups,
        )

        base = (np.arange(64) * 5 + 11).astype(int).tolist()
        near = list(base)
        near[30] = 9999  # one token changed
        far = (np.arange(64) * 7 + 3000).astype(int).tolist()
        df = pd.DataFrame(
            {"doc_id": [1, 2, 3], "tokens": [base, near, far]}
        )
        groups = token_minhash_lsh_groups(
            ray.data.from_pandas(df), k=8, num_perm=64, bands=16
        ).to_pandas()
        together = any(
            set([1, 2]) <= set(g) for g in groups["ids"] if len(g) >= 2
        )
        assert together
        assert not any(3 in set(g) and len(set(g)) > 1 for g in groups["ids"])
