"""Driver-process stats from /proc: the reference's A4 component.

Re-expression of ``dsp::system_info`` (reference: sys.hpp:113-175 —
``parse_stat_file`` 126-141, ``refresh`` 149-162): CPU%, user/sys time
and RSS parsed from ``/proc/<pid>/stat``, normalized by the kernel
clock-tick rate and page size, with CPU% derived from the user+sys
delta between refreshes.

Scope note: this instruments the DRIVER process (same scope as the
reference, which is single-process). Executor-side resource metrics on
a real cluster come from Spark's own metrics system / the Prometheus
servlet sink — re-scraping /proc per executor would duplicate what the
platform already exports. Gauges feed the same optional
prometheus_client export path as :mod:`dsp_spark.streaming.metrics`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class ProcessStats:
    """reference: sys.hpp process_stats (113-118)."""

    cpu: float = 0.0  # percent, user+sys delta between refreshes
    user_time: float = 0.0  # seconds
    sys_time: float = 0.0  # seconds
    rss: float = 0.0  # MiB


# field positions AFTER the ')' that ends comm, counted like the
# reference's stat_index (sys.hpp:120-124): the raw stat line is
# "pid (comm) state ppid ..." and comm may itself contain spaces or
# parens, so parsing must split on the LAST ')'.
_USER_TIME = 12
_SYS_TIME = 13
_RSS = 22

# process-wide gauge singletons (prometheus registries are global)
_PROM_GAUGES: dict | None = None


def parse_stat_file(data: str) -> ProcessStats:
    """Parse a raw /proc/<pid>/stat line (reference: sys.hpp:126-141).

    Returns RAW values (clock ticks / pages); ``SystemInfo.refresh``
    applies the unit normalization, mirroring the reference split of
    responsibilities.
    """
    parts = data[data.rfind(")") :].split()
    return ProcessStats(
        cpu=0.0,
        user_time=float(int(parts[_USER_TIME])),
        sys_time=float(int(parts[_SYS_TIME])),
        rss=float(int(parts[_RSS])),
    )


@dataclass
class SystemInfo:
    """reference: sys.hpp system_info (143-175).

    Unlike the reference (whose stat loop runs on a fixed 1 s tick, so
    the raw CPU-seconds delta IS a percentage), refresh() here can be
    called at any cadence — CPU%% is therefore normalized by the
    monotonic wall time elapsed since the previous refresh. The first
    refresh reports 0 (no interval to average over)."""

    pid: int = field(default_factory=os.getpid)
    clock_ticks: int = field(default_factory=lambda: os.sysconf("SC_CLK_TCK"))
    page_size: int = field(default_factory=lambda: os.sysconf("SC_PAGE_SIZE"))

    def __post_init__(self) -> None:
        self._stats = ProcessStats()
        self._prev = None
        self._prev_at = None

    def refresh(self) -> None:
        import time

        with open(f"/proc/{self.pid}/stat") as f:
            raw = parse_stat_file(f.read())
        now = time.monotonic()
        raw.user_time /= self.clock_ticks
        raw.sys_time /= self.clock_ticks
        raw.rss *= self.page_size / 1e6  # MByte, like the reference
        if self._prev is not None and now > self._prev_at:
            cpu_prev = self._prev.user_time + self._prev.sys_time
            cpu_now = raw.user_time + raw.sys_time
            raw.cpu = (cpu_now - cpu_prev) / (now - self._prev_at) * 100.0
        else:
            raw.cpu = 0.0
        self._prev = raw
        self._prev_at = now
        self._stats = raw

    def stats(self) -> ProcessStats:
        return self._stats

    def export_prometheus(self) -> None:
        """Register process gauges with prometheus_client when present
        (reference exposes them on the same scrape endpoint as the
        message counters, interfaces.hpp:205-216). Gauges are created
        once per process and shared — prometheus_client's default
        registry rejects duplicate timeseries, so a second SystemInfo
        (or a re-export after restart) must reuse them, not re-create."""
        try:
            import prometheus_client as prom
        except ImportError:  # container has no prometheus_client: no-op
            self._prom = None
            return
        global _PROM_GAUGES
        if _PROM_GAUGES is None:
            _PROM_GAUGES = {
                name: prom.Gauge(f"dsp_process_{name}", f"dsp_spark process {name}")
                for name in ("cpu", "user_time", "sys_time", "rss_mb")
            }
        self._prom = _PROM_GAUGES

    def publish(self) -> None:
        """refresh + push into the registered gauges (if any)."""
        self.refresh()
        prom = getattr(self, "_prom", None)
        if prom:
            s = self._stats
            prom["cpu"].set(s.cpu)
            prom["user_time"].set(s.user_time)
            prom["sys_time"].set(s.sys_time)
            prom["rss_mb"].set(s.rss)
