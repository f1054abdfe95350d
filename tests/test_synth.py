import numpy as np
import pyarrow as pa

from opentelemetry_collector_contrib_ray.sources.synth import (
    SOURCES,
    gen_batch,
    write_synth_corpus,
)


def test_schema():
    t = gen_batch(np.arange(10, dtype=np.uint64))
    assert t.column_names == ["doc_id", "tokens", "n_tok", "source", "raw"]
    assert t.schema.field("tokens").type == pa.list_(pa.int32())
    assert t.schema.field("n_tok").type == pa.int32()


def test_partition_independence():
    whole = gen_batch(np.arange(0, 50, dtype=np.uint64))
    parts = pa.concat_tables(
        [
            gen_batch(np.arange(0, 13, dtype=np.uint64)),
            gen_batch(np.arange(13, 50, dtype=np.uint64)),
        ]
    ).combine_chunks()
    assert whole.equals(parts)


def test_skew_and_formats():
    t = gen_batch(np.arange(20000, dtype=np.uint64))
    src = t["source"].to_numpy(zero_copy_only=False)
    frac_a = (src == "app-a").mean()
    assert 0.65 < frac_a < 0.75  # FIXTURES F1: ~70% app-a
    raw = t["raw"].to_numpy(zero_copy_only=False)
    assert any(r.startswith("{") for r in raw)  # docker json
    assert any(r.startswith("<") for r in raw)  # syslog
    assert any("Z stdout" in r or "Z stderr" in r for r in raw)  # containerd


def test_write_corpus_idempotent(tmp_path):
    p = str(tmp_path / "corpus")
    write_synth_corpus(p, 1000, num_files=2)
    import pyarrow.parquet as pq
    import os

    files = sorted(os.listdir(p))
    assert files == ["shard-00000.parquet", "shard-00001.parquet"]
    rows1 = pq.read_table(p + "/shard-00000.parquet")
    write_synth_corpus(p, 1000, num_files=2)  # no-op rerun
    assert pq.read_table(p + "/shard-00000.parquet").equals(rows1)
