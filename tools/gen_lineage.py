#!/usr/bin/env python
"""Generate LINEAGE.md: SURVEY §2 component -> implementation -> test,
plus the full catalog registry (entry -> module:line, oracle kind).

    python tools/gen_lineage.py [--check]

The §2 table is a declarative map below, but every row is VERIFIED at
generation time: the implementation file must exist and define the
named symbol (the line number in the doc is re-derived by grep, never
hand-maintained), and the listed test file must exist. The catalog
section is introspected from the live registry (dsp_spark.catalog),
so a new entry appears on the next regeneration and a renamed one
fails the build instead of rotting. --check regenerates to a temp
string and exits 1 if LINEAGE.md is stale.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (survey_id, component, impl_file, symbol, test_file, note)
SURVEY2 = [
    ("S1", "TCP server source", "dsp_spark/sources/tcp.py", "TcpStreamReader",
     "tests/test_tcp_source.py", "Python DataSource stream reader; chunked frame reassembly"),
    ("S2", "Kafka consumer source", "dsp_spark/sources/factory.py", "kafka_reader_options",
     "tests/test_kafka_contract.py", "contract-locked option map; jar-gated real assembly"),
    ("S3", "Partition-EOF stop", "dsp_spark/engine.py", "Pipeline",
     "tests/test_streaming.py", "Trigger.AvailableNow replaces EOF-driven shutdown"),
    ("S4", "TCP client", "dsp_spark/tools.py", "tcp_send",
     "tests/test_tcp_source.py", "test/tooling path"),
    ("S5", "Simulator source", "dsp_spark/sources/factory.py", "simulator_stream",
     "tests/test_streaming.py", "rate source shaped to heartbeats"),
    ("K1", "Kafka producer sink", "dsp_spark/sinks/multicast.py", "kafka_writer_options",
     "tests/test_kafka_contract.py", "per-row topic + headers; jar-gated"),
    ("K2", "Kafka northbound adapter", "dsp_spark/sinks/multicast.py", "kafka_sink",
     "tests/test_kafka_contract.py", ""),
    ("K3", "Custom/stdout sink", "dsp_spark/engine.py", "build_sink",
     "tests/test_streaming.py", ""),
    ("K4", "Cache multicast", "dsp_spark/sinks/multicast.py", "Multicast",
     "tests/test_streaming.py", "one consume, N deliveries via persist-once"),
    ("K5", "Delivery accounting", "dsp_spark/streaming/metrics.py", "MetricsListener",
     "tests/test_streaming.py", "batch-level acks; per-record deviation documented SURVEY §7.4"),
    ("K6", "File sinks (parquet/csv/json)", "dsp_spark/sinks/multicast.py", "file_sink",
     "tests/test_streaming.py", ""),
    ("T1", "Frame decode", "dsp_spark/operators/telemetry.py", "parse_telemetry",
     "tests/test_telemetry.py", "native LE parse + chunked deframe"),
    ("T2", "Type dispatch", "dsp_spark/operators/telemetry.py", "parse_telemetry",
     "tests/test_telemetry.py", "bad records -> error column"),
    ("T3", "Heartbeat projection", "dsp_spark/operators/telemetry.py", "project_heartbeat",
     "tests/test_telemetry.py", ""),
    ("T4", "Passthrough projection", "dsp_spark/operators/telemetry.py", "project_passthrough",
     "tests/test_telemetry.py", ""),
    ("T5", "Router", "dsp_spark/operators/router.py", "route",
     "tests/test_router.py", "single-pass explode, config-driven priority rules"),
    ("T6", "K2K relay", "dsp_spark/message.py", "from_kafka",
     "tests/test_kafka_contract.py", ""),
    ("T7", "Load shedding", "dsp_spark/sinks/multicast.py", "load_shed",
     "tests/test_streaming.py", "deterministic hash, retry-safe, opt-in"),
    ("T8", "Drop accounting", "dsp_spark/operators/router.py", "route_with_drops",
     "tests/test_router.py", ""),
    ("T9", "Batch echo (test gen)", "dsp_spark/tools.py", "gen_frames",
     "tests/test_tcp_source.py", ""),
    ("A1", "Running stats", "dsp_spark/streaming/metrics.py", "observed",
     "tests/test_streaming.py", "df.observe + listener"),
    ("A2", "Summary line", "dsp_spark/streaming/metrics.py", "Stats",
     "tests/test_streaming.py", "reference grep format"),
    ("A3", "Prometheus counters", "dsp_spark/streaming/metrics.py", "MetricsListener",
     "tests/test_streaming.py", "reference metric names"),
    ("A4", "/proc scrape", "dsp_spark/streaming/procstats.py", "parse_stat_file",
     "tests/test_procstats.py", "sys.hpp parity"),
]


def _symbol_line(path: str, symbol: str) -> int:
    """Line of `def symbol` / `class symbol` — fails loudly if absent."""
    pat = re.compile(rf"^(def|class)\s+{re.escape(symbol)}\b")
    with open(os.path.join(ROOT, path)) as f:
        for i, line in enumerate(f, 1):
            if pat.match(line):
                return i
    raise SystemExit(f"LINEAGE rot: {symbol} not found in {path}")


def _require(path: str) -> None:
    if not os.path.exists(os.path.join(ROOT, path)):
        raise SystemExit(f"LINEAGE rot: missing file {path}")


def _catalog_rows():
    import inspect

    from dsp_spark import catalog

    rows = []
    for name, entry in sorted(catalog.entries().items()):
        fn = inspect.unwrap(entry.fn)
        path = os.path.relpath(inspect.getsourcefile(fn), ROOT)
        line = inspect.getsourcelines(fn)[1]
        rows.append((name, f"{path}:{line}", entry.oracle is not None))
    return rows


def generate() -> str:
    out = [
        "# LINEAGE — generated by tools/gen_lineage.py; do not hand-edit",
        "",
        "Regenerate with `python tools/gen_lineage.py`; CI-check with",
        "`python tools/gen_lineage.py --check` (exits 1 when stale).",
        "",
        "## SURVEY §2 operator inventory -> implementation -> test",
        "",
        "| # | Component | Implementation | Test | Notes |",
        "|---|---|---|---|---|",
    ]
    for sid, comp, path, symbol, test, note in SURVEY2:
        _require(path)
        _require(test)
        line = _symbol_line(path, symbol)
        out.append(
            f"| {sid} | {comp} | `{path}:{line}` (`{symbol}`) | `{test}` | {note} |"
        )

    rows = _catalog_rows()
    n_oracle = sum(1 for _, _, has in rows if has)
    out += [
        "",
        f"## Catalog registry — {len(rows)} entries, "
        f"{n_oracle} with DuckDB oracles, {len(rows) - n_oracle} rows-only",
        "",
        "Driver-checked via `__spark_entry__.py` `queries()` / `oracle_sql()`;",
        "local replay: `python tools/driver_sim.py --all`.",
        "",
        "| Entry | Implementation | Oracle |",
        "|---|---|---|",
    ]
    for name, where, has_oracle in rows:
        out.append(
            f"| {name} | `{where}` | {'DuckDB SQL' if has_oracle else 'rows-only'} |"
        )
    out.append("")
    return "\n".join(out)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    text = generate()
    target = os.path.join(ROOT, "LINEAGE.md")
    if "--check" in argv:
        current = open(target).read() if os.path.exists(target) else ""
        if current != text:
            print("LINEAGE.md is stale — run python tools/gen_lineage.py", file=sys.stderr)
            return 1
        print("LINEAGE.md up to date")
        return 0
    with open(target, "w") as f:
        f.write(text)
    print(f"wrote {target} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
