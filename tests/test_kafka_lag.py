"""kafkametricsreceiver scrape-math semantics, ported from
receiver/kafkametricsreceiver/{topic,consumer,broker}_scraper_test.go."""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.sources.kafka_lag import (
    kafka_broker_metrics,
    kafka_consumer_metrics,
    kafka_topic_metrics,
)


def _state(rows):
    keys = sorted({k for r in rows for k in r})
    return pa.table({k: [r.get(k) for r in rows] for k in keys})


STATE = _state(
    [
        dict(group="g1", topic="t1", partition=0, consumer_offset=90,
             partition_offset=100, oldest_offset=10, replicas=3, in_sync=2,
             group_members=4),
        dict(group="g1", topic="t1", partition=1, consumer_offset=-1,
             partition_offset=50, oldest_offset=5, replicas=3, in_sync=3,
             group_members=4),
        # fully unconsumed topic → NO consumer datapoints at all
        dict(group="g1", topic="t_idle", partition=0, consumer_offset=-1,
             partition_offset=7, oldest_offset=0, replicas=1, in_sync=1,
             group_members=4),
        dict(group="g2", topic="t1", partition=0, consumer_offset=100,
             partition_offset=100, oldest_offset=10, replicas=3, in_sync=2,
             group_members=1),
        dict(group="skipg", topic="t1", partition=0, consumer_offset=1,
             partition_offset=2, oldest_offset=0, replicas=1, in_sync=1,
             group_members=9),
    ]
)


def _rows(t, name):
    df = t.to_pandas()
    return df[df["name"] == name]


class TestTopicScraper:
    def test_partitions_and_offsets(self):
        out = kafka_topic_metrics(STATE, topic_match="^t")
        parts = _rows(out, "kafka.topic.partitions").set_index("topic")["value"]
        assert parts["t1"] == 2
        assert parts["t_idle"] == 1
        cur = _rows(out, "kafka.partition.current_offset")
        assert len(cur) == 3  # dedup across groups
        assert set(zip(cur["topic"], cur["partition"], cur["value"])) == {
            ("t1", 0, 100), ("t1", 1, 50), ("t_idle", 0, 7),
        }
        isr = _rows(out, "kafka.partition.replicas_in_sync")
        assert set(zip(isr["topic"], isr["partition"], isr["value"])) == {
            ("t1", 0, 2), ("t1", 1, 3), ("t_idle", 0, 1),
        }

    def test_topic_filter(self):
        out = kafka_topic_metrics(STATE, topic_match="^t1$")
        assert set(out.to_pandas()["topic"]) == {"t1"}


class TestConsumerScraper:
    def test_lag_and_sums(self):
        out = kafka_consumer_metrics(STATE, group_match="^g")
        members = _rows(out, "kafka.consumer_group.members").set_index("group")
        assert members.loc["g1", "value"] == 4
        assert members.loc["g2", "value"] == 1
        assert "skipg" not in members.index

        off = _rows(out, "kafka.consumer_group.offset")
        g1 = off[off["group"] == "g1"].set_index("partition")["value"]
        # raw offsets, including the -1 block
        assert g1[0] == 90 and g1[1] == -1

        lag = _rows(out, "kafka.consumer_group.lag")
        l1 = lag[lag["group"] == "g1"].set_index("partition")["value"]
        assert l1[0] == 10  # 100 - 90
        assert l1[1] == -1  # unmeasured → -1 (consumer_scraper.go:155)

        osum = _rows(out, "kafka.consumer_group.offset_sum")
        s1 = osum[osum["group"] == "g1"].iloc[0]
        assert s1["value"] == 89  # 90 + (-1): raw sum INCLUDES -1
        lsum = _rows(out, "kafka.consumer_group.lag_sum")
        ls1 = lsum[lsum["group"] == "g1"].iloc[0]
        assert ls1["value"] == 10  # only measured lags

        # the fully-unconsumed topic contributes nothing
        assert not (off["topic"] == "t_idle").any()
        assert not (osum["topic"] == "t_idle").any()

    def test_zero_lag_group(self):
        out = kafka_consumer_metrics(STATE, group_match="^g2$")
        lag = _rows(out, "kafka.consumer_group.lag")
        assert list(lag["value"]) == [0]


class TestBroker:
    def test_brokers(self):
        out = kafka_broker_metrics(5).to_pandas()
        assert out.iloc[0]["name"] == "kafka.brokers"
        assert out.iloc[0]["value"] == 5
