"""kafkametricsreceiver scrape math, vectorized.

Re-expresses `receiver/kafkametricsreceiver/` — the topic / consumer /
broker scrapers' metric derivations — as vectorized transforms over a
cluster-state table (one row per (group, topic, partition) with the
offsets a Kafka admin client would report). The reference's sarama
client plumbing is out of scope; the LOGIC under test (file:line under
/root/reference):

Topic scraper (topic_scraper.go:63-126):
* topics filtered by the ``topic_match`` regex (:78-83).
* per topic one ``kafka.topic.partitions`` gauge (count);
  per partition ``kafka.partition.current_offset`` (newest),
  ``kafka.partition.oldest_offset``, ``kafka.partition.replicas``,
  ``kafka.partition.replicas_in_sync`` gauges (:84-118).

Consumer scraper (consumer_scraper.go:73-174):
* groups filtered by ``group_match``, topics by ``topic_match``
  (:86-102).
* per group one ``kafka.consumer_group.members`` gauge (:130-132).
* a (group, topic) is "consumed" iff ANY partition block carries an
  offset != -1 (:139-146); a NON-consumed topic emits NO datapoints
  at all (the whole partition loop is inside the isConsumed branch).
* per consumed partition: ``kafka.consumer_group.offset`` (the raw
  block offset, including -1) and ``kafka.consumer_group.lag`` =
  newest partition offset - consumer offset, or **-1 when the
  consumer offset is -1** (:147-163).
* per consumed topic: ``kafka.consumer_group.offset_sum`` = sum of
  raw offsets INCLUDING the -1s (:151-153), and
  ``kafka.consumer_group.lag_sum`` = sum of only the MEASURED lags
  (:158-161,164-165).

Broker scraper (broker_scraper.go:60-70): one ``kafka.brokers`` gauge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_OUT_COLS = ["name", "group", "topic", "partition", "value"]


def _out(frames: list[pd.DataFrame]) -> pa.Table:
    df = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(columns=_OUT_COLS)
    )
    return pa.table(
        {
            "name": pa.array(df["name"].tolist(), pa.string()),
            "group": pa.array(df["group"].fillna("").tolist(), pa.string()),
            "topic": pa.array(df["topic"].fillna("").tolist(), pa.string()),
            "partition": pa.array(
                df["partition"].fillna(-1).astype(np.int64).tolist(), pa.int64()
            ),
            "value": pa.array(df["value"].astype(np.int64).tolist(), pa.int64()),
        }
    )


def _re_mask(s: pd.Series, pattern: str) -> np.ndarray:
    """Vectorized regex-search filter (Go regexp.MatchString semantics)
    via Arrow's re2 kernel — no per-row Python regex calls."""
    import pyarrow.compute as pc

    return (
        pc.match_substring_regex(
            pa.array(s.to_numpy(dtype=object), pa.string(), from_pandas=True), pattern
        )
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )


def kafka_topic_metrics(t: pa.Table, topic_match: str = ".*") -> pa.Table:
    """Cluster-state rows → topic-scraper gauges. Input columns:
    topic, partition, partition_offset, oldest_offset, replicas,
    in_sync (one row per topic-partition; group-related columns are
    ignored — the topic scraper sees every partition once)."""
    df = t.to_pandas().drop_duplicates(subset=["topic", "partition"])
    df = df[_re_mask(df["topic"], topic_match)]
    frames = []
    parts = (
        df.groupby("topic", sort=False)["partition"].size().reset_index(name="value")
    )
    parts["name"] = "kafka.topic.partitions"
    parts["group"] = ""
    parts["partition"] = -1
    frames.append(parts[_OUT_COLS])
    for name, col in (
        ("kafka.partition.current_offset", "partition_offset"),
        ("kafka.partition.oldest_offset", "oldest_offset"),
        ("kafka.partition.replicas", "replicas"),
        ("kafka.partition.replicas_in_sync", "in_sync"),
    ):
        p = df[["topic", "partition", col]].rename(columns={col: "value"}).copy()
        p["name"] = name
        p["group"] = ""
        frames.append(p[_OUT_COLS])
    return _out(frames)


def kafka_consumer_metrics(
    t: pa.Table, group_match: str = ".*", topic_match: str = ".*"
) -> pa.Table:
    """Cluster-state rows → consumer-scraper gauges. Input columns:
    group, topic, partition, consumer_offset (-1 = none),
    partition_offset, group_members (constant per group)."""
    df = t.to_pandas()
    df = df[_re_mask(df["group"], group_match)]
    df = df[_re_mask(df["topic"], topic_match)]
    frames = []

    members = (
        df.drop_duplicates(subset=["group"])[["group", "group_members"]]
        .rename(columns={"group_members": "value"})
        .copy()
    )
    members["name"] = "kafka.consumer_group.members"
    members["topic"] = ""
    members["partition"] = -1
    frames.append(members[_OUT_COLS])

    co = df["consumer_offset"].astype(np.int64)
    # consumed iff ANY partition block has offset != -1 (:139-146)
    consumed = (co != -1).groupby([df["group"], df["topic"]]).transform("any")
    d = df[consumed.to_numpy()].copy()
    if len(d):
        dco = d["consumer_offset"].astype(np.int64)
        off = d[["group", "topic", "partition"]].copy()
        off["value"] = dco.to_numpy()
        off["name"] = "kafka.consumer_group.offset"
        frames.append(off[_OUT_COLS])

        lag = d[["group", "topic", "partition"]].copy()
        measured = (dco != -1).to_numpy()
        lag["value"] = np.where(
            measured,
            d["partition_offset"].astype(np.int64).to_numpy() - dco.to_numpy(),
            -1,  # "-1 to indicate no lag measured" (:155-156)
        )
        lag["name"] = "kafka.consumer_group.lag"
        frames.append(lag[_OUT_COLS])

        osum = (
            d.assign(value=dco.to_numpy())
            .groupby(["group", "topic"], sort=False)["value"]
            .sum()
            .reset_index()
        )
        osum["name"] = "kafka.consumer_group.offset_sum"
        osum["partition"] = -1
        frames.append(osum[_OUT_COLS])

        lsum = (
            d.assign(value=np.where(measured, lag["value"].to_numpy(), 0))
            .groupby(["group", "topic"], sort=False)["value"]
            .sum()
            .reset_index()
        )
        lsum["name"] = "kafka.consumer_group.lag_sum"
        lsum["partition"] = -1
        frames.append(lsum[_OUT_COLS])
    return _out(frames)


def kafka_broker_metrics(n_brokers: int) -> pa.Table:
    return _out(
        [
            pd.DataFrame(
                [{"name": "kafka.brokers", "group": "", "topic": "",
                  "partition": -1, "value": int(n_brokers)}]
            )
        ]
    )
