"""Kafka column/option contract, executable WITHOUT the connector jar.

No broker or spark-sql-kafka jar exists in this container, so the
consumer/producer cannot run end-to-end here. What CAN be locked down
— and is the part a real deployment would otherwise debug live — is:

* the wire schema the connector emits (key/value binary, headers as
  array<struct<key:string,value:binary>>, partition/offset/timestamp)
  normalizes through ``from_kafka`` into the envelope byte-for-byte;
* ``to_kafka`` emits exactly the columns + types the producer sink
  validates at runtime (a wrong headers element type fails per-batch
  on a cluster; here it fails in CI);
* the reference-config -> reader/writer option mappings
  (kafka.hpp:801-925 consumer, kafka.hpp:557-792 producer);
* when the jar IS on the classpath, the gated test at the bottom
  assembles the real reader too.

Reference: kafka.hpp:557-925, interfaces.hpp:105-161 ("primary
use-case is Kafka", doc/user-guide.adoc:67).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dsp_spark.message import MESSAGE_COLUMNS, from_kafka, to_kafka
from dsp_spark.sinks.multicast import kafka_writer_options
from dsp_spark.sources.factory import kafka_reader_options

# exactly what spark-sql-kafka emits with includeHeaders=true
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType(), True),
                        T.StructField("value", T.BinaryType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

# what the producer sink requires (topic optional if writer option set)
SINK_COLUMN_TYPES = {
    "key": "binary",
    "topic": "string",
    "value": "binary",
    "headers": "array<struct<key:string,value:binary>>",
}


def _wire_rows():
    import datetime as dt

    ts = dt.datetime(2026, 1, 1, 12, 0, 0)
    return [
        Row(
            key=b"k1",
            value=b"payload-1",
            topic="dev-test",
            partition=0,
            offset=10,
            timestamp=ts,
            timestampType=0,
            headers=[Row(key="type", value=b"click"), Row(key="u8", value="héllo".encode())],
        ),
        # null key, empty headers: both legal on the wire
        Row(
            key=None,
            value=b"payload-2",
            topic="dev-test",
            partition=1,
            offset=11,
            timestamp=ts,
            timestampType=0,
            headers=[],
        ),
        # null headers column (includeHeaders=false shape still parses)
        Row(
            key=b"k3",
            value=b"",
            topic="other",
            partition=0,
            offset=12,
            timestamp=None,
            timestampType=0,
            headers=None,
        ),
    ]


@pytest.fixture(scope="module")
def wire(spark):
    return spark.createDataFrame(_wire_rows(), KAFKA_WIRE_SCHEMA)


def test_from_kafka_normalizes_envelope(wire):
    env = from_kafka(wire)
    assert env.columns == MESSAGE_COLUMNS
    rows = {r["offset"]: r for r in env.collect()}
    assert rows[10]["key"] == bytearray(b"k1")
    assert rows[10]["value"] == bytearray(b"payload-1")
    assert rows[10]["topic"] == "dev-test"
    # header bytes decode to the properties map, multi-byte UTF-8 intact
    assert rows[10]["properties"] == {"type": "click", "u8": "héllo"}
    assert rows[11]["key"] is None
    assert rows[11]["properties"] == {}
    assert rows[12]["properties"] is None


def test_to_kafka_sink_column_contract(wire):
    out = to_kafka(from_kafka(wire))
    assert dict(out.dtypes) == SINK_COLUMN_TYPES


def test_headers_round_trip_bytes(wire):
    """envelope -> sink shape re-encodes headers byte-for-byte."""
    out = to_kafka(from_kafka(wire))
    rows = sorted(out.collect(), key=lambda r: (r["topic"], r["value"]))
    hdr = {h["key"]: bytes(h["value"]) for h in rows[0]["headers"]}
    assert hdr == {"type": b"click", "u8": "héllo".encode()}
    assert rows[1]["headers"] == []


def test_reader_option_mapping():
    opts = {
        "kafka": {
            "bootstrap": "broker-1:9092,broker-2:9092",
            "topics": ["t1", "t2"],
            "offset": "earliest",
            "batchSize": 50_000,
            "groupid": "dsp-consumers",
        }
    }
    assert kafka_reader_options(opts) == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "t1,t2",
        "startingOffsets": "earliest",
        "includeHeaders": "true",
        "maxOffsetsPerTrigger": "50000",
        "kafka.group.id": "dsp-consumers",
    }


def test_reader_option_defaults():
    assert kafka_reader_options({}) == {
        "kafka.bootstrap.servers": "localhost:9092",
        "subscribe": "",
        "startingOffsets": "latest",
        "includeHeaders": "true",
    }


def test_writer_option_mapping():
    assert kafka_writer_options("b:9092", "fallback-topic") == {
        "kafka.bootstrap.servers": "b:9092",
        "includeHeaders": "true",
        "topic": "fallback-topic",
    }
    assert "topic" not in kafka_writer_options("b:9092")


def _kafka_jar_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_real_reader_assembly_when_jar_present(spark):
    """End-to-end reader assembly; runs for real when the connector is
    on the classpath (local[-] recipe: pyspark --packages
    org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2), otherwise
    asserts the failure is the missing provider, not our config."""
    from dsp_spark.config import SourceConfig
    from dsp_spark.sources.factory import build_stream

    cfg = SourceConfig(type="kafka", options={"kafka": {"topics": ["t"]}})
    if _kafka_jar_present(spark):
        df = build_stream(spark, cfg)
        assert df.columns == MESSAGE_COLUMNS
        assert df.isStreaming
    else:
        with pytest.raises(Exception, match="[Kk]afka"):
            build_stream(spark, cfg)
