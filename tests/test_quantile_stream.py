"""Streaming log-histogram quantiles: relative-error bound vs the
exact batch percentiles, and micro-batch-split state invariance."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from dsp_spark.streaming.stateful import quantile_histogram_stream


@pytest.fixture(scope="module")
def priced_rows():
    rng = random.Random(31)
    rows = []
    # lognormal-ish price streams with very different scales per key
    for _ in range(3000):
        rows.append(("api_ms", round(rng.lognormvariate(3.0, 0.8), 2)))
    for _ in range(1500):
        rows.append(("order_usd", round(rng.lognormvariate(6.0, 1.2), 2)))
    rng.shuffle(rows)
    return rows


def _run(spark, tmp_path, rows, n_files):
    pdf = pd.DataFrame(rows, columns=["key", "value"])
    pdf["event_id"] = range(len(pdf))
    src = tmp_path / "src"
    src.mkdir(parents=True)
    step = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(src / f"f{i}.parquet")
    batch_df = spark.createDataFrame(pdf)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"qh_{abs(hash(str(tmp_path))) % 10**9}"
    q = (
        quantile_histogram_stream(stream, key_col="key", value_col="value")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.table(name).toPandas()
    final = {}
    for key, grp in res.groupby("key"):
        # n is monotone across emissions; the final row has the max n
        final[key] = grp.sort_values("n").iloc[-1].to_dict()
    return final, batch_df


def test_quantiles_within_log_bin_error(spark, tmp_path, priced_rows):
    final, batch_df = _run(spark, tmp_path, priced_rows, n_files=3)
    exact = {
        r.key: (r.p50, r.p90, r.p99, r.mx, r.n)
        for r in batch_df.groupBy("key")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.9).alias("p90"),
            F.percentile("value", 0.99).alias("p99"),
            F.max("value").alias("mx"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(final) == set(exact)
    for key, (p50, p90, p99, mx, n) in exact.items():
        got = final[key]
        assert got["n"] == n
        assert got["max_v"] == pytest.approx(mx)
        # log2 bins: estimates within a factor of 2 of the truth
        for est, true in ((got["p50"], p50), (got["p90"], p90), (got["p99"], p99)):
            assert true / 2 <= est <= true * 2, (key, est, true)


def test_state_identical_across_microbatch_splits(spark, tmp_path, priced_rows):
    one, _ = _run(spark, tmp_path / "one", priced_rows, n_files=1)
    three, _ = _run(spark, tmp_path / "three", priced_rows, n_files=3)
    assert one == three


def test_negative_values_rejected_loudly():
    from dsp_spark.streaming.stateful import _qh_bin

    with pytest.raises(ValueError, match="non-negative"):
        _qh_bin(-500)
    assert _qh_bin(0) == 0


def test_batch_twin_entry_matches_streaming_model(spark, sf_dir):
    """quantiles_loghist_by_key must produce EXACTLY what the streaming
    sketch's _qh_bin/_qh_quantile compute on the same per-key values —
    the sketch algebra is shared, so the batch twin's driver-oracle
    evidence covers the streaming operator's math."""
    from collections import defaultdict
    from decimal import Decimal

    from dsp_spark.queries.sketches import quantiles_loghist_by_key
    from dsp_spark.session import read_table
    from dsp_spark.streaming.stateful import QH_BINS, _qh_bin, _qh_quantile

    rows = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    bins: dict[str, list[int]] = defaultdict(lambda: [0] * QH_BINS)
    n: dict[str, int] = defaultdict(int)
    mx: dict[str, int] = defaultdict(int)
    for r in rows:
        # same quantization as the entry: decimal(18,2) cents
        c = int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
        k = r.event_type
        bins[k][_qh_bin(c)] += 1
        n[k] += 1
        mx[k] = max(mx[k], c)

    got = {
        r.key: (r.n, r.p50, r.p90, r.p99, r.max_v)
        for r in quantiles_loghist_by_key(spark, sf_dir).collect()
    }
    assert set(got) == set(bins)
    for k in bins:
        want = (
            n[k],
            _qh_quantile(bins[k], n[k], 0.5),
            _qh_quantile(bins[k], n[k], 0.9),
            _qh_quantile(bins[k], n[k], 0.99),
            mx[k] / 100.0,
        )
        assert got[k] == pytest.approx(want, abs=1e-12), (k, got[k], want)
