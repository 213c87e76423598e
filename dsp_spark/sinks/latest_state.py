"""Streaming CDC apply: maintain a keyed latest-state snapshot.

The other half of the CDC story next to `queries/cdc.py` (batch MERGE)
and `ContinuousHourlyRollup` (aggregate view): a change stream folds
into a "current state per key" parquet table via foreachBatch — what a
`MERGE INTO ... WHEN MATCHED UPDATE` does on a transactional lakehouse,
expressed engine-checkably as union + per-key argmax.

Versioned snapshots give idempotent replay without a transaction log:
epoch N's snapshot is a pure function of snapshot N-1 and batch N, so
re-running a crashed epoch rewrites byte-identical content instead of
double-applying. Readers always open the highest complete version
(version dirs are written atomically by Spark's job commit).

At 100 TB the union+argmax is one co-partitioned shuffle of
(key, newest-row) pairs — batch side pre-collapsed to one row per key
map-side — and old versions are vacuumed after a retention window, the
same lifecycle a Delta/Iceberg table runs.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LatestStateUpsert:
    """Maintain ``path`` as the newest row per ``key_cols``, ordered by
    ``order_cols`` (lexicographic struct order, so ties break on the
    later columns — pass an id column last for determinism).

    Drive with ``writeStream.foreachBatch(upsert)`` or call
    :meth:`apply` directly from tests.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        order_cols: list[str],
        value_cols: list[str],
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.value_cols = list(value_cols)
        self.applied: list[int] = []

    # -- snapshot bookkeeping ------------------------------------------
    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for name in os.listdir(self.path):
            m = re.fullmatch(r"v=(\d+)", name)
            if m and os.path.exists(os.path.join(self.path, name, "_SUCCESS")):
                out.append(int(m.group(1)))
        return sorted(out)

    def read(self) -> DataFrame:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no snapshot under {self.path}")
        return self.spark.read.parquet(
            os.path.join(self.path, f"v={vs[-1]}")
        )

    # -- the CDC apply --------------------------------------------------
    def _collapse(self, df: DataFrame) -> DataFrame:
        """Newest row per key: ONE aggregate via struct argmax (ties
        resolved by the last order column), no window sort."""
        payload = F.struct(*self.order_cols, *self.value_cols)
        agg = df.groupBy(*self.key_cols).agg(F.max(payload).alias("b"))
        return agg.select(
            *self.key_cols,
            *[
                F.col(f"b.{c}").alias(c)
                for c in (*self.order_cols, *self.value_cols)
            ],
        )

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        self.apply(batch, epoch_id)

    def apply(self, batch: DataFrame, epoch_id: int) -> None:
        cols = [*self.key_cols, *self.order_cols, *self.value_cols]
        delta = self._collapse(batch.select(*cols))
        target = int(epoch_id)
        # replay safety: epoch N is a pure function of the newest
        # version STRICTLY BELOW N and batch N — recomputing a crashed
        # or duplicated epoch must not fold the snapshot it itself
        # wrote (or any newer one) back in
        prev = [v for v in self._versions() if v < target]
        if prev:
            merged = self._collapse(
                self.spark.read.parquet(
                    os.path.join(self.path, f"v={prev[-1]}")
                )
                .select(*cols)
                .unionByName(delta)
            )
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(
            os.path.join(self.path, f"v={target}")
        )
        self.applied.append(target)

    # -- lifecycle ------------------------------------------------------
    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshot versions
        (the Delta/Iceberg VACUUM analogue — replay only needs the
        version below the one being recomputed, so 2 is the safe
        floor). Returns the removed version numbers."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self._versions()
        drop = vs[:-keep_last] if keep_last < len(vs) else []
        for v in drop:
            shutil.rmtree(os.path.join(self.path, f"v={v}"), ignore_errors=True)
        return drop
