"""State-store provider selection for stateful streaming queries.

The default HDFS-backed state store keeps every key's state on the
executor HEAP plus a .delta file per commit — fine for tests, but a
100 TB cluster runs stateful queries over key spaces that do not fit
in executor memory. The production deployment is RocksDB: state lives
off-heap/on-disk per partition, snapshots + changelogs go to the
checkpoint location, and memory stays bounded regardless of key count
(reference deploys its stateful services the same way: local state,
durable log — kafka.hpp's consumer group offsets are the analogue).

Spark bundles the RocksDB JNI jar, so this is a pure config toggle:
the provider conf is read PER QUERY at start, making a runtime
``spark.conf.set`` sufficient — no session rebuild.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
# changelog checkpointing ships per-commit deltas instead of full
# snapshots — the recommended production mode (bounds per-commit upload
# to what changed, like a WAL)
CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def enable_rocksdb_state(spark: SparkSession, *, changelog: bool = True) -> None:
    """Route every subsequently STARTED stateful query to RocksDB."""
    spark.conf.set(PROVIDER_CONF, ROCKSDB_PROVIDER)
    spark.conf.set(CHANGELOG_CONF, "true" if changelog else "false")


@contextmanager
def rocksdb_state(spark: SparkSession, *, changelog: bool = True):
    """Scoped RocksDB state store: restores the prior provider on exit.

    Only queries *started* inside the scope are affected (the conf is
    captured at query start); already-running queries keep their
    provider.
    """
    prior = spark.conf.get(PROVIDER_CONF, None)
    prior_cl = spark.conf.get(CHANGELOG_CONF, None)
    enable_rocksdb_state(spark, changelog=changelog)
    try:
        yield spark
    finally:
        for key, val in ((PROVIDER_CONF, prior), (CHANGELOG_CONF, prior_cl)):
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)
