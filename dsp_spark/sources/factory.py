"""Config-driven source construction.

Maps the reference's southbound types (tcp | kafka | custom,
dsp.hpp:200-228) onto Spark readers, plus file/rate sources that the
reference lists only as aspirations. Every source yields the canonical
message envelope columns (dsp_spark.message.MESSAGE_SCHEMA subset) so
the downstream pipeline is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dsp_spark.config import SourceConfig
from dsp_spark.message import from_kafka


def build_stream(spark: SparkSession, cfg: SourceConfig) -> DataFrame:
    if cfg.type == "kafka":
        return _kafka_stream(spark, cfg.options)
    if cfg.type == "rate":
        return simulator_stream(spark, **cfg.options)
    if cfg.type == "file":
        return _file_stream(spark, cfg.options)
    if cfg.type == "tcp":
        from dsp_spark.sources.tcp import register_tcp_source

        register_tcp_source(spark)
        o = cfg.options.get("net", cfg.options)
        return (
            spark.readStream.format("dsp_tcp")
            .option("host", o.get("host", "127.0.0.1"))
            .option("port", int(o["port"]))
            .load()
        )
    raise ValueError(f"unknown southbound type {cfg.type!r}")


def kafka_reader_options(opts: dict) -> dict[str, str]:
    """Reference consumer config -> spark-sql-kafka reader options
    (kafka.hpp:801-925 bootstrap/topics/offset/batchSize/groupid).

    Pure mapping so the contract is testable without the connector jar
    or a broker: tests/test_kafka_contract.py locks every key/value
    down; a rename here fails CI before a deployment ever sees it.
    """
    k = opts.get("kafka", opts)
    out = {
        "kafka.bootstrap.servers": k.get("bootstrap", "localhost:9092"),
        "subscribe": ",".join(k.get("topics", [])),
        "startingOffsets": k.get("offset", "latest"),
        # headers ride along so properties (the envelope map) survive
        "includeHeaders": "true",
    }
    if "batchSize" in k:
        out["maxOffsetsPerTrigger"] = str(int(k["batchSize"]))
    if "groupid" in k:
        out["kafka.group.id"] = k["groupid"]
    return out


def _kafka_stream(spark: SparkSession, opts: dict) -> DataFrame:
    """Kafka consumer source (reference: kafka.hpp:801-925).

    batchSize -> maxOffsetsPerTrigger; the spark-sql-kafka connector jar
    must be on the classpath (not in the test container — config is
    validated here, connection fails lazily like any Spark source).
    """
    reader = spark.readStream.format("kafka")
    for key, val in kafka_reader_options(opts).items():
        reader = reader.option(key, val)
    return from_kafka(reader.load())


def _file_stream(spark: SparkSession, opts: dict) -> DataFrame:
    fmt = opts.get("format", "parquet")
    reader = spark.readStream.format(fmt)
    if "schema" in opts:
        reader = reader.schema(opts["schema"])
    for key, val in opts.get("options", {}).items():
        reader = reader.option(key, val)
    return reader.load(opts["path"])


def simulator_stream(
    spark: SparkSession, rows_per_second: int = 1, n_clients: int = 1, **_: object
) -> DataFrame:
    """Heartbeat simulator (reference: svc/sim.cpp:72-97 — 1 hb/s with
    incrementing sequence) over the built-in rate source."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return rate.select(
        (F.col("value") % n_clients).alias("client_id"),
        (F.col("value") / n_clients).cast("long").alias("sequence"),
        F.unix_micros("timestamp").alias("ts"),
        F.col("timestamp"),
    )
