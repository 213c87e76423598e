"""read_table memoization: analyzed plans are reused within a session,
never across sessions, and never across sf dirs."""

from __future__ import annotations

from dsp_spark.session import read_table


def test_same_session_same_table_is_cached(spark, sf_dir):
    a = read_table(spark, sf_dir, "region")
    b = read_table(spark, sf_dir, "region")
    assert a is b


def test_cache_keys_on_sf_dir(spark, sf_dir):
    # a DIFFERENT sf dir than the suite's (the suite may itself run at
    # sf0.01 via DSP_TEST_SF_DIR — same path must be a cache HIT)
    other_dir = (
        "/root/testdata/sf0.001"
        if sf_dir.rstrip("/").endswith("sf0.01")
        else "/root/testdata/sf0.01"
    )
    a = read_table(spark, sf_dir, "region")
    b = read_table(spark, other_dir, "region")
    assert a is not b
    assert read_table(spark, sf_dir, "region") is a


def test_cache_not_shared_across_sessions(spark, sf_dir):
    a = read_table(spark, sf_dir, "region")
    other = spark.newSession()
    b = read_table(other, sf_dir, "region")
    assert a is not b
    # and the cached plan still evaluates on its own session
    assert b.count() == a.count()


def test_cache_hit_repins_session_zone(spark, sf_dir):
    """The cached events plan is lazy — it resolves the NTZ cast under
    the session zone at EXECUTION time, so every read_table call must
    re-pin UTC even when returning a cached plan."""
    read_table(spark, sf_dir, "events")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        read_table(spark, sf_dir, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_cached_events_read_still_normalized(spark, sf_dir):
    # second (cached) read keeps the ts normalization applied on first read
    a = read_table(spark, sf_dir, "events")
    b = read_table(spark, sf_dir, "events")
    assert dict(b.dtypes)["ts"] == "timestamp"
    assert a is b
