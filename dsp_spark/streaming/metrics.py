"""Streaming metrics: the reference's Prometheus surface on Spark events.

The reference maintains counters/gauges named receive_*/process_*/
sent_*/drop_*_total plus throughput stats refreshed every second
(reference: metrics.hpp:28-97, stat.hpp:23-99, summary stat.hpp:71-84).

Spark equivalent: a StreamingQueryListener accumulates the same
counter names from QueryProgressEvent (rates come free:
inputRowsPerSecond / processedRowsPerSecond), and `df.observe` feeds
per-batch observed aggregates (bytes, per-label counts) without extra
actions. If prometheus_client is installed, counters are exported on a
scrape port (reference: interfaces.hpp:205-216, port 9555); otherwise
they stay in-process (tests read them directly).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observed(df: DataFrame, name: str = "stats") -> DataFrame:
    """Attach A1-style running totals: message count + payload bytes."""
    cols: list[Column] = [F.count(F.lit(1)).alias("messages")]
    if "value" in df.columns:
        cols.append(F.sum(F.length("value")).alias("bytes"))
    return df.observe(name, *cols)


@dataclass
class Stats:
    """Running totals + summary, mirroring dsp::statistics (stat.hpp)."""

    messages: int = 0
    bytes: int = 0
    started_at: float = field(default_factory=time.time)

    def summary(self) -> str:
        """reference: stat.hpp:71-84 — the line the perf suite greps."""
        dur = max(time.time() - self.started_at, 1e-9)
        mbps = self.bytes / 1e6 / dur
        kmps = self.messages / 1e3 / dur
        return (
            f"Summary: {mbps:.3f} MBps and {kmps:.2f}k MPS "
            f"(total: {self.bytes} bytes, {self.messages} messages, {dur:.1f}s)"
        )


class MetricsListener(StreamingQueryListener):
    """Accumulates reference-named counters from query progress."""

    def __init__(self) -> None:
        self.counters: dict[str, float] = {
            "receive_messages_total": 0,
            "receive_bytes_total": 0,
            "process_messages_total": 0,
            "sent_messages_total": 0,
            "drop_messages_total": 0,
        }
        self.stats = Stats()
        self.last_progress: dict | None = None
        self._prom = None
        # (query id, batchId) pairs already counted — progress reaches the
        # Python listener asynchronously, so sync() may see a batch first
        self._seen: set[tuple[str, int]] = set()

    def export_prometheus(self, port: int) -> None:
        try:
            import prometheus_client as prom
        except ImportError:  # container has no prometheus_client: no-op
            return
        self._prom = {
            name: prom.Gauge(name, f"dsp_spark {name}")
            for name in self.counters
        }
        prom.start_http_server(port)

    # --- StreamingQueryListener hooks -------------------------------------
    def onQueryStarted(self, event) -> None:
        self.stats = Stats()

    def onQueryProgress(self, event) -> None:
        self.ingest(event.progress)

    def ingest(self, p) -> None:
        """Fold one StreamingQueryProgress into the counters (idempotent
        per (query id, batchId) so async listener events and sync() don't
        double-count)."""
        key = (str(p.id), p.batchId)
        if key in self._seen:
            return
        self._seen.add(key)
        self.last_progress = {
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "batchId": p.batchId,
        }
        self.counters["receive_messages_total"] += p.numInputRows or 0
        self.counters["process_messages_total"] += p.numInputRows or 0
        self.stats.messages += p.numInputRows or 0
        obs = p.observedMetrics.get("stats") if p.observedMetrics else None
        if obs is not None:
            row = obs.asDict()
            if row.get("bytes") is not None:
                self.counters["receive_bytes_total"] += row["bytes"]
                self.stats.bytes += row["bytes"]
        if p.sink is not None and p.sink.numOutputRows is not None:
            if p.sink.numOutputRows >= 0:
                self.counters["sent_messages_total"] += p.sink.numOutputRows
        if self._prom:
            for name, gauge in self._prom.items():
                gauge.set(self.counters[name])

    def sync(self, query) -> None:
        """Reconcile from query.recentProgress on the driver — listener
        events arrive asynchronously, so callers that need up-to-date
        counters right after awaitTermination() call this."""
        if query is None:
            return
        for p in query.recentProgress:
            self.ingest(p)

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass
