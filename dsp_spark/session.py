"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]``; the same settings (AQE, skew-join
handling, partition-size caps, Arrow) are the ones you want on a
1000-executor cluster — only ``shuffle.partitions`` is sized per
deployment (cores locally; ~2-3x total cores, or AQE-coalesced from a
high initial value, on a real cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_session(
    app_name: str = "dsp_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    Defaults favor the 100 TB design point: AQE on (runtime coalescing +
    skew-join splitting), 128 MB scan partitions, Arrow for any
    Python<->JVM exchange, UTC session time so results are comparable
    against the DuckDB oracle.
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces by BYTES; compute-dense shuffles (pairwise dedup /
        # similarity: tiny ids+vectors in, heavy per-row math out) would
        # collapse to 1 task under the 1MB default floor. 64kb keeps them
        # parallel; at production scale partitions are >64MB so no effect.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64kb")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # write µs timestamps, not legacy INT96: INT96 chunks carry no
        # min/max statistics, so time-range scans can't skip row groups
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # testdata events.parquet stores timestamp[ns]; Spark rejects NANOS
        # unless read as long (we convert to µs — same truncation DuckDB does)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Load the synthetic star-schema tables and register temp views.

    Returns ``{name: DataFrame}``. Views let every operator also be
    driven through ``spark.sql``.
    """
    all_names = (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    out = {}
    for name in names or all_names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def spread(df, *cols: str):
    """Ensure CPU-heavy per-row compute runs on all cores.

    A small single-file parquet scan yields one partition, serializing
    everything downstream on local runs. Repartition (round-robin, or
    hash on `cols`) up to the default parallelism. On a real cluster a
    100 TB scan already has thousands of input splits, so this becomes
    a no-op (partition count check) — it never *reduces* parallelism.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one synthetic table, normalizing types.

    ``events.ts`` is parquet INT64 timestamp (isAdjustedToUTC=false), so
    Spark infers TIMESTAMP_NTZ while DuckDB treats it as a plain (naive)
    timestamp. We pin the session to UTC and cast NTZ -> TIMESTAMP: under
    UTC the cast is value-preserving, every timestamp function
    (``unix_micros``, ``window``, ``date_trunc``) works, and wall-clock
    results line up with the DuckDB oracle. Older generators emitted
    timestamp[ns], which Spark reads only via ``nanosAsLong``; both
    legacy shapes normalize to the same µs TIMESTAMP column.

    Analyzed reads are memoized per (session, sf_dir, table): re-reading
    parquet footers costs ~0.1 s per call on local runs, which dominates
    short queries when a catalog sweep reads the same 10 tables hundreds
    of times. The cache holds lazy *plans* (no data is pinned), keyed on
    the session object itself, so a driver-provided bare session and a
    tuned test session never share entries. Test data is immutable
    within a round, so staleness is not a concern; a caller reading a
    path it is actively rewriting should bypass with
    ``spark.read.parquet`` directly.

    .. warning:: SIDE EFFECT: reading ``events`` sets
       ``spark.sql.session.timeZone=UTC`` (and the nanos fallback) on the
       *caller's* session, and the setting persists after this call.
       This is deliberate — the correctness driver hands us a bare
       session, and the lazily-evaluated DataFrame must still resolve
       the NTZ cast under UTC whenever the caller executes it (a
       save/restore here would un-pin the conf before the action runs).
       Callers that need a non-UTC session zone alongside events data
       should use a separate session (``spark.newSession()``).
    """
    from pyspark.sql import functions as F

    if name == "events":
        # Defensive: a caller-provided session (the correctness driver
        # builds its own) may have a non-UTC zone or lack the nanos
        # fallback. Both confs are runtime-settable. This re-pin runs
        # on EVERY call — including cache hits below — because the
        # cached plan is lazy: it resolves the NTZ cast under whatever
        # zone the session has at EXECUTION time, and a caller may have
        # flipped the zone since the plan was first analyzed.
        for k, v in (
            ("spark.sql.session.timeZone", "UTC"),
            ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ):
            try:
                spark.conf.set(k, v)
            except Exception:
                pass

    cache = getattr(spark, "_dsp_read_cache", None)
    if cache is None:
        cache = {}
        try:
            spark._dsp_read_cache = cache
        except AttributeError:  # exotic session proxy; skip memoization
            cache = None
    key = (os.path.abspath(sf_dir), name)
    if cache is not None and key in cache:
        return cache[key]
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # nanosAsLong legacy path
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if cache is not None:
        cache[key] = df
    return df
