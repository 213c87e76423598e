"""The sketch quartet must run — and agree with its default-provider
results — under the RocksDB state store, the provider a 100 TB
cluster actually deploys (bounded executor memory on unbounded key
spaces). Spark bundles the RocksDB JNI jar, so this exercises the
real native store, not a mock."""

from __future__ import annotations

import glob

import pandas as pd

from dsp_spark.streaming.stateful import (
    bloom_first_seen_stream,
    heavy_hitters_stream,
)
from dsp_spark.streaming.statestore import (
    PROVIDER_CONF,
    ROCKSDB_PROVIDER,
    rocksdb_state,
)


def _write_src(tmp_path, pdf, n_files):
    src = tmp_path / "src"
    src.mkdir(parents=True)
    step = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(src / f"f{i}.parquet")
    return src


def _run(spark, tmp_path, pdf, build, mode, n_files=3):
    src = _write_src(tmp_path, pdf, n_files)
    schema = spark.createDataFrame(pdf.head(2)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"rdb_{abs(hash(str(tmp_path))) % 10**9}"
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not terminate in 120s"
    return spark.table(name).toPandas(), tmp_path / "ck"


def _final_hh(res: pd.DataFrame):
    """Final per-shard summary from update-mode re-emissions (the
    max-decrement emission is the last; counts only grow within it)."""
    final = {}
    for shard, grp in res.groupby("shard"):
        g = grp[grp["decrements"] == grp["decrements"].max()]
        final[shard] = (
            g.groupby("item")["est_count"].max().to_dict(),
            int(g["decrements"].max()),
        )
    return final


def test_heavy_hitters_identical_under_rocksdb(spark, tmp_path):
    import random

    rng = random.Random(7)
    items = [
        "hot" if rng.random() < 0.3 else f"tail_{rng.randrange(400)}"
        for _ in range(3000)
    ]
    pdf = pd.DataFrame({"event_id": range(len(items)), "item": items})

    build = lambda s: heavy_hitters_stream(s, item_col="item")  # noqa: E731
    default_res, default_ck = _run(
        spark, tmp_path / "default", pdf, build, "update"
    )
    with rocksdb_state(spark):
        assert spark.conf.get(PROVIDER_CONF) == ROCKSDB_PROVIDER
        rocks_res, rocks_ck = _run(
            spark, tmp_path / "rocks", pdf, build, "update"
        )
    # provider restored after the scope
    assert spark.conf.get(PROVIDER_CONF, None) != ROCKSDB_PROVIDER

    # bit-identical final summaries: the provider stores state, it must
    # never change it
    assert _final_hh(rocks_res) == _final_hh(default_res)

    # and the checkpoint proves WHICH store ran: RocksDB commits
    # .zip snapshots / .changelog deltas, the HDFS provider .delta files
    rocks_files = {
        f.rsplit(".", 1)[-1]
        for f in glob.glob(str(rocks_ck / "state" / "**" / "*.*"), recursive=True)
    }
    default_files = {
        f.rsplit(".", 1)[-1]
        for f in glob.glob(str(default_ck / "state" / "**" / "*.*"), recursive=True)
    }
    assert "delta" in default_files
    assert "delta" not in rocks_files
    assert rocks_files & {"zip", "changelog"}


def test_bloom_first_seen_identical_under_rocksdb(spark, tmp_path):
    ids = [f"doc_{i % 500}" for i in range(2000)]
    pdf = pd.DataFrame({"event_id": range(len(ids)), "item": ids})

    build = lambda s: bloom_first_seen_stream(s, item_col="item")  # noqa: E731
    default_res, _ = _run(spark, tmp_path / "default", pdf, build, "append")
    with rocksdb_state(spark):
        rocks_res, _ = _run(spark, tmp_path / "rocks", pdf, build, "append")

    key = list(rocks_res.columns)
    a = rocks_res.sort_values(key).reset_index(drop=True)
    b = default_res.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
