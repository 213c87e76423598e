"""The canonical message envelope.

Re-expression of the reference's universal record `dsp::message`
(reference: libdsp/libdsp/cache.hpp:31-36 — key/subject/properties/
payload) as a Spark schema. It deliberately matches Spark's Kafka
source shape so `spark.readStream.format("kafka")` rows normalize into
it with one `select` (SURVEY.md §1.1):

    key        <- message.key            (binary, nullable)
    topic      <- message.subject        (string; Kafka topic at sinks)
    properties <- message.properties     (map<string,string>; headers)
    value      <- message.payload        (binary)
    partition/offset/timestamp           (consume-side provenance,
                                          kafka.hpp:124-132)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("value", T.BinaryType(), False),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)

MESSAGE_COLUMNS = [f.name for f in MESSAGE_SCHEMA.fields]


def headers_to_properties(headers: Column) -> Column:
    """Kafka's array<struct<key,value:binary>> headers -> map<string,string>."""
    return F.map_from_entries(
        F.transform(
            headers,
            lambda h: F.struct(
                h["key"].alias("key"), h["value"].cast("string").alias("value")
            ),
        )
    )


def properties_to_headers(properties: Column) -> Column:
    """map<string,string> -> Kafka sink header shape array<struct<key,value:binary>>."""
    return F.transform(
        F.map_entries(properties),
        lambda e: F.struct(
            e["key"].alias("key"), e["value"].cast("binary").alias("value")
        ),
    )


def from_kafka(df: DataFrame) -> DataFrame:
    """Normalize a Kafka source DataFrame into the message envelope."""
    return df.select(
        F.col("key"),
        F.col("topic"),
        headers_to_properties(F.col("headers")).alias("properties"),
        F.col("value"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp"),
    )


def to_kafka(df: DataFrame) -> DataFrame:
    """Project the envelope onto Spark's Kafka sink columns
    (key/topic/value/headers; per-row dynamic topic supported)."""
    return df.select(
        F.col("key"),
        F.col("topic"),
        F.col("value"),
        properties_to_headers(F.col("properties")).alias("headers"),
    )


def make_message(
    *,
    key: Column | None = None,
    topic: Column | None = None,
    properties: Column | None = None,
    value: Column,
) -> list[Column]:
    """Column list building an envelope row (provenance fields null)."""
    return [
        (key if key is not None else F.lit(None).cast("binary")).alias("key"),
        (topic if topic is not None else F.lit(None).cast("string")).alias("topic"),
        (
            properties
            if properties is not None
            else F.lit(None).cast("map<string,string>")
        ).alias("properties"),
        value.cast("binary").alias("value"),
        F.lit(None).cast("int").alias("partition"),
        F.lit(None).cast("long").alias("offset"),
        F.lit(None).cast("timestamp").alias("timestamp"),
    ]
