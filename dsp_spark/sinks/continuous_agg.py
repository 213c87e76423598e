"""Incrementally-maintained aggregate view (continuous aggregate).

The hypertable/materialized-view pattern at lake scale: a streaming
query keeps a parquet "view" of a grouped aggregate up to date by
rewriting ONLY the partitions each micro-batch touches
(``partitionOverwriteMode=dynamic``), never the whole table.

Exactly-once without a transaction log: the rewrite of a partition is
computed from running state (complete-mode agg), so replaying a batch
after a crash rewrites the same partitions with the same content —
idempotent by construction. This is the foreachBatch upsert recipe the
Structured Streaming guide recommends when a transactional table
format isn't available; with one, the write becomes a MERGE on the
same keys.

At 100 TB: the aggregate state is bounded by the group-key cardinality
(hours x event types, not events), each batch rewrites a handful of
hour partitions, and readers always see complete hours — the
continuous-aggregate contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ContinuousHourlyRollup:
    """Maintain ``path`` as the parquet materialization of
    ``SELECT hour_start, event_type, count, sum_value FROM events``.

    Drive it with ``writeStream.foreachBatch(rollup)`` over a
    complete-mode windowed aggregate, or call :meth:`apply` directly
    from tests. ``touched`` tracks rewritten partitions for metrics.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.touched: list[int] = []

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        self.apply(batch, epoch_id)

    def apply(self, batch: DataFrame, epoch_id: int) -> None:
        # dynamic mode: only partitions present in `batch` are replaced;
        # untouched hours keep their files (no full-table rewrite)
        (
            batch.withColumn("hour_part", F.unix_timestamp("hour_start"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("hour_part")
            .parquet(self.path)
        )
        self.touched.append(int(epoch_id))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path).drop("hour_part")


def hourly_rollup_agg(events: DataFrame) -> DataFrame:
    """The aggregate the view materializes (complete-mode friendly:
    group keys are (hour, type), state bounded by their cardinality)."""
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
