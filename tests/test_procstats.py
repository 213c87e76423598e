"""A4 /proc scrape parity (reference: sys.hpp:113-175)."""

from __future__ import annotations

import os
import time

from dsp_spark.streaming.procstats import ProcessStats, SystemInfo, parse_stat_file

# a real-shaped stat line whose comm contains spaces AND parens — the
# case that forces splitting on the LAST ')' (reference does the same
# via find_last_of, sys.hpp:133)
STAT_LINE = (
    "1234 (weird (name) x) S 1 1234 1234 0 -1 4194304 "
    "500 0 0 0 777 88 0 0 20 0 33 0 9999 123456789 2048 "
    "18446744073709551615 1 1 0 0 0 0 0 0 0 0 0 0 17 3 0 0 0 0 0"
)


def test_parse_stat_file_raw_fields():
    s = parse_stat_file(STAT_LINE)
    assert s.user_time == 777.0  # field 13 in proc(5), 12 after comm
    assert s.sys_time == 88.0
    assert s.rss == 2048.0  # pages, raw
    assert s.cpu == 0.0


def test_refresh_normalizes_units():
    info = SystemInfo()
    info.refresh()
    s = info.stats()
    assert s.user_time > 0  # this test process has burned CPU
    assert s.rss > 10  # python + JVM-adjacent process: >10 MB resident
    assert isinstance(s, ProcessStats)


def test_cpu_percent_is_delta_based():
    info = SystemInfo()
    info.refresh()
    # FIRST refresh must report 0, not cumulative-CPU-since-start x100
    assert info.stats().cpu == 0.0
    # burn some CPU so the second refresh sees a positive delta
    t0 = time.time()
    while time.time() - t0 < 0.15:
        _ = sum(i * i for i in range(1000))
    info.refresh()
    # wall-time normalized: one busy thread ~100%, bounded by core count
    import os

    assert 0.0 <= info.stats().cpu <= 100.0 * (os.cpu_count() or 1) + 50


def test_export_prometheus_idempotent():
    """Repeat export (or a second instance) must not raise on duplicate
    gauge registration when prometheus_client is installed."""
    a, b = SystemInfo(), SystemInfo()
    a.export_prometheus()
    a.export_prometheus()
    b.export_prometheus()
    a.publish()
    b.publish()


def test_publish_without_prometheus_is_noop():
    info = SystemInfo()
    info.export_prometheus()
    info.publish()  # must not raise regardless of prometheus presence
    assert info.stats().rss > 0


def test_tracks_this_pid():
    assert SystemInfo().pid == os.getpid()
