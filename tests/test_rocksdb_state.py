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


# --- full bounded-state family under RocksDB (round 6) -------------------
# One parametrized pass over every remaining applyInPandasWithState
# sketch (HLL distinct, log-histogram quantiles, LSH near-dup ingest,
# event-time session close): identical file sequence under the default
# and RocksDB providers must produce bit-identical accumulated output.
# (Misra-Gries + Bloom are covered with provider-evidence checks above.)

import pytest

from dsp_spark.streaming.stateful import (
    SESSION_GAP_S,
    ams_f2_stream,
    approx_distinct_stream,
    attribution_linear_stream,
    benford_digit_stream,
    bottomk_sample_stream,
    cdc_net_effect_stream,
    cms_stream,
    cusum_stream,
    ewma_stream,
    funnel_stream,
    k_anonymity_stream,
    mann_kendall_stream,
    near_dup_candidates_stream,
    psi_stream,
    quantile_histogram_stream,
    session_close_stream,
    span_witness_stream,
)


def _kv_frames():
    import random

    rng = random.Random(13)
    frames = []
    for f in range(3):
        rows = [
            (f"k{rng.randrange(4)}", f"item_{rng.randrange(300)}")
            for _ in range(800)
        ]
        frames.append(pd.DataFrame(rows, columns=["k", "item"]))
    return frames


def _val_frames():
    import random

    rng = random.Random(29)
    frames = []
    for f in range(3):
        rows = [
            (f"k{rng.randrange(3)}", round(rng.random() * 500 + 0.01, 2))
            for _ in range(600)
        ]
        frames.append(pd.DataFrame(rows, columns=["k", "v"]))
    return frames


def _doc_frames():
    import random

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(40)]
    base = [" ".join(rng.choice(vocab) for _ in range(30)) for _ in range(40)]
    rows = []
    for i in range(240):  # doc_id-ordered arrival (the parity contract)
        src = base[i % 40]
        text = src if i % 3 else src + " tail" + str(i % 7)
        rows.append((i, text))
    frames = [
        pd.DataFrame(rows[i * 80 : (i + 1) * 80], columns=["doc_id", "text"])
        for i in range(3)
    ]
    return frames


def _session_frames():
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    gap = pd.Timedelta(seconds=SESSION_GAP_S)
    raw = [
        [(t0, 1, 10.00), (t0 + pd.Timedelta(minutes=5), 1, 2.50), (t0, 2, 7.00)],
        [(t0 + gap * 3, 3, 1.00)],
        [(t0 + gap * 6, 4, 0.50)],
        [(t0 + gap * 9, 5, 0.25)],
    ]
    frames = []
    for rows in raw:
        pdf = pd.DataFrame(rows, columns=["ts", "user_id", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        frames.append(pdf)
    return frames


def _ewma_frames():
    import random

    rng = random.Random(53)
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for eid in range(300):
        rows.append(
            (
                eid,
                t0 + pd.Timedelta(minutes=eid),
                rng.randrange(5),
                round(rng.uniform(0, 400), 2),
            )
        )
    frames = [
        pd.DataFrame(
            rows[i * 100 : (i + 1) * 100],
            columns=["event_id", "ts", "user_id", "value"],
        )
        for i in range(3)
    ]
    return frames


def _cdc_frames_rdb():
    import random

    rng = random.Random(31)
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for eid in range(240):
        rows.append(
            (
                eid,
                t0 + pd.Timedelta(minutes=eid),
                rng.randrange(6),
                rng.choice(["I", "U", "U", "D"]),
                round(rng.uniform(0, 200), 2),
            )
        )
    return [
        pd.DataFrame(
            rows[i * 80 : (i + 1) * 80],
            columns=["event_id", "ts", "user_id", "op", "value"],
        )
        for i in range(3)
    ]


def _attr_frames_rdb():
    import random

    rng = random.Random(67)
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for eid in range(300):
        rows.append(
            (
                eid,
                t0 + pd.Timedelta(minutes=eid),
                rng.randrange(5),
                rng.choice(
                    ["click", "view", "view", "cart", "purchase", "purchase"]
                ),
            )
        )
    return [
        pd.DataFrame(
            rows[i * 100 : (i + 1) * 100],
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        for i in range(3)
    ]


def _cusum_frames_rdb():
    import random

    rng = random.Random(71)
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for eid in range(240):
        rows.append(
            (
                eid,
                t0 + pd.Timedelta(minutes=3 * eid),
                rng.choice(["a", "b", "c"]),
                round(rng.uniform(0, 120), 2),
            )
        )
    return [
        pd.DataFrame(
            rows[i * 80 : (i + 1) * 80],
            columns=["event_id", "ts", "event_type", "value"],
        )
        for i in range(3)
    ]


def _mk_frames_rdb():
    import random

    rng = random.Random(79)
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for eid in range(240):
        rows.append(
            (
                eid,
                # ~2 events/day over ~4 months: enough calendar days
                # for the n_days >= 2 emission gate on every key
                t0 + pd.Timedelta(hours=12 * eid),
                rng.choice(["a", "b", "c"]),
                round(rng.uniform(0, 120), 2),
            )
        )
    return [
        pd.DataFrame(
            rows[i * 80 : (i + 1) * 80],
            columns=["event_id", "ts", "event_type", "value"],
        )
        for i in range(3)
    ]


# fixed calibration inputs for the monitor twins (batch calibrates,
# stream monitors): per-type hourly cent targets / reference buckets
_CUSUM_TARGETS = {"a": 120000, "b": 150000, "c": 90000}
_PSI_REF = {
    "a": [40, 35, 30, 25, 20, 15, 10, 8, 5, 2],
    "b": [5, 10, 20, 40, 40, 20, 10, 5, 3, 2],
}


_FAMILIES = {
    "ams_f2": (
        _kv_frames,
        lambda s: ams_f2_stream(s, key_col="k", item_col="item"),
        "update",
    ),
    "attribution_linear": (
        _attr_frames_rdb,
        attribution_linear_stream,
        "append",
    ),
    "benford_digits": (
        _val_frames,
        lambda s: benford_digit_stream(s, key_col="k", value_col="v"),
        "update",
    ),
    "bottomk_sample": (
        _kv_frames,
        lambda s: bottomk_sample_stream(s, key_col="k", item_col="item"),
        "update",
    ),
    "cusum_monitor": (
        _cusum_frames_rdb,
        lambda s: cusum_stream(s, _CUSUM_TARGETS, threshold=100000),
        "append",
    ),
    "mann_kendall": (
        _mk_frames_rdb,
        mann_kendall_stream,
        "append",
    ),
    "psi_drift": (
        _cusum_frames_rdb,
        lambda s: psi_stream(s, _PSI_REF, threshold=0.2),
        "append",
    ),
    "funnel_progression": (
        _attr_frames_rdb,
        funnel_stream,
        "update",
    ),
    "cdc_net_effect": (
        _cdc_frames_rdb,
        cdc_net_effect_stream,
        "update",
    ),
    "k_anonymity": (
        _kv_frames,
        lambda s: k_anonymity_stream(s, ["k", "item"]),
        "update",
    ),
    "cms_counters": (
        _kv_frames,
        lambda s: cms_stream(s, key_col="item"),
        "update",
    ),
    "ewma_last16": (
        _ewma_frames,
        ewma_stream,
        "append",
    ),
    "hll_distinct": (
        _kv_frames,
        lambda s: approx_distinct_stream(s, key_col="k", item_col="item"),
        "update",
    ),
    "log_quantiles": (
        _val_frames,
        lambda s: quantile_histogram_stream(s, key_col="k", value_col="v"),
        "update",
    ),
    "lsh_near_dup": (
        _doc_frames,
        lambda s: near_dup_candidates_stream(s, id_col="doc_id", text_col="text"),
        "append",
    ),
    "span_witness": (
        _doc_frames,
        lambda s: span_witness_stream(s, id_col="doc_id", text_col="text"),
        "append",
    ),
    "session_close": (
        _session_frames,
        lambda s: session_close_stream(s.withWatermark("ts", "0 seconds")),
        "append",
    ),
}


def _run_frames(spark, tmp_path, frames, build, mode):
    src = tmp_path / "src"
    src.mkdir(parents=True)
    for i, pdf in enumerate(frames):
        pdf.to_parquet(src / f"f{i}.parquet", coerce_timestamps="us")
    schema = spark.createDataFrame(frames[0]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"fam_{abs(hash(str(tmp_path))) % 10**9}"
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


@pytest.mark.parametrize("family", sorted(_FAMILIES))
def test_sketch_family_identical_under_rocksdb(spark, tmp_path, family):
    make_frames, build, mode = _FAMILIES[family]
    frames = make_frames()
    default_res, _ = _run_frames(
        spark, tmp_path / "default", frames, build, mode
    )
    with rocksdb_state(spark):
        assert spark.conf.get(PROVIDER_CONF) == ROCKSDB_PROVIDER
        rocks_res, rocks_ck = _run_frames(
            spark, tmp_path / "rocks", frames, build, mode
        )

    assert len(default_res) > 0, f"{family}: empty output proves nothing"
    key = list(default_res.columns)
    a = default_res.sort_values(key).reset_index(drop=True)
    b = rocks_res.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # the RocksDB run must actually have used RocksDB (state format
    # compatibility is only covered if the native store really ran)
    exts = {
        f.rsplit(".", 1)[-1]
        for f in glob.glob(str(rocks_ck / "state" / "**" / "*.*"), recursive=True)
    }
    assert "delta" not in exts and exts & {"zip", "changelog"}, exts
