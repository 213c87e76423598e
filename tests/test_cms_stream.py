"""Streaming Count-Min sketch: shard-merged final counters must equal
the batch counter matrix (cellwise), across micro-batch splits."""

from __future__ import annotations

import pandas as pd


def _frames(n_files):
    import random

    rng = random.Random(61)
    rows = [(rng.randrange(40),) for _ in range(900)]
    step = -(-len(rows) // n_files)
    return [
        pd.DataFrame(rows[i * step : (i + 1) * step], columns=["user_id"])
        for i in range(n_files)
        if rows[i * step : (i + 1) * step]
    ]


def _batch_counters(pdf):
    """Reference matrix straight from the shared bucket definition."""
    from dsp_spark.streaming.stateful import CMS_D, _cms_bucket

    out = {}
    for k in pdf["user_id"]:
        for j in range(CMS_D):
            cell = (j, _cms_bucket(j, str(k)))
            out[cell] = out.get(cell, 0) + 1
    return out


def _stream_counters(spark, tmp_path, frames):
    from dsp_spark.streaming.stateful import cms_stream

    src = tmp_path / "src"
    src.mkdir(parents=True)
    for i, pdf in enumerate(frames):
        pdf.to_parquet(src / f"f{i}.parquet")
    schema = spark.createDataFrame(frames[0]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"cms_{abs(hash(str(tmp_path))) % 10**9}"
    q = (
        cms_stream(stream, key_col="user_id")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    # final per-shard cell value = the LAST emission (largest c wins:
    # counters only grow)
    final = {}
    for r in spark.table(name).collect():
        cell = (r.shard, r.j, r.bucket)
        final[cell] = max(final.get(cell, 0), r.c)
    merged = {}
    for (_s, j, b), c in final.items():
        merged[(j, b)] = merged.get((j, b), 0) + c
    return merged


def test_cms_stream_matches_batch_matrix(spark, tmp_path):
    frames = _frames(3)
    got = _stream_counters(spark, tmp_path, frames)
    want = _batch_counters(pd.concat(frames, ignore_index=True))
    assert got == want


def test_cms_stream_invariant_under_split(spark, tmp_path):
    whole = _stream_counters(spark, tmp_path / "a", _frames(1))
    split = _stream_counters(spark, tmp_path / "b", _frames(5))
    assert whole == split


def test_cms_bucket_matches_catalog_entry_hash(spark, duck):
    """The stream's python bucket fn and the catalog entry's md5 SQL
    derivation agree cell-for-cell."""
    from dsp_spark.streaming.stateful import CMS_W, _cms_bucket

    rows = duck.execute(
        f"""SELECT j, user_id,
                   ('0x' || substr(md5(j || ':' || user_id), 1, 8))::BIGINT
                     % {CMS_W} AS bucket
            FROM (SELECT DISTINCT user_id FROM events LIMIT 50)
            CROSS JOIN (VALUES (0),(1),(2),(3)) AS r(j)"""
    ).fetchall()
    assert rows
    for j, uid, bucket in rows:
        assert _cms_bucket(j, str(uid)) == bucket
