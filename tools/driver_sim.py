#!/usr/bin/env python
"""Simulate the round driver's correctness gate locally.

The driver: builds its OWN bare SparkSession (no tuned confs), iterates
``__spark_entry__.queries()`` in order, checks AT MOST the first ~50
entries against ``oracle_sql()`` via DuckDB at sf0.01 (row count +
column-name-sorted schema + stringified value hash), and aborts after
~10 consecutive errors. Run this before every round ends.

Usage: python tools/driver_sim.py [--limit 50] [--all] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--limit", type=int, default=50)
    p.add_argument("--all", action="store_true", help="check every entry, not just the window")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument(
        "--only",
        default=None,
        help="comma-separated entry names to check (overrides --limit/--all)",
    )
    args = p.parse_args()

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from tests._compare import normalize

    # bare session, like the driver: NO get_session tuning
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName("driver-sim")
        .getOrCreate()
    )
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{args.sf_dir}/{name}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in names if n not in qs]
        if unknown:
            p.error(f"unknown entries: {unknown}")
    else:
        names = list(qs) if args.all else list(qs)[: args.limit]

    results: dict[str, dict] = {}
    n_fail = 0
    for i, name in enumerate(names):
        rec: dict = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            spark_pdf = qs[name](spark, args.sf_dir).toPandas()
            if name in oracles:
                duck_pdf = con.execute(oracles[name]).fetchdf()
                a, b = normalize(spark_pdf), normalize(duck_pdf)
                rec["rows_match"] = len(a) == len(b)
                rec["schema_match"] = list(a.columns) == list(b.columns)
                # driver-style: stringify values then hash; ints vs floats differ
                ha = pd.util.hash_pandas_object(a.astype(str), index=False).sum()
                hb = pd.util.hash_pandas_object(b.astype(str), index=False).sum()
                rec["hash_match"] = bool(
                    rec["rows_match"] and rec["schema_match"] and ha == hb
                )
            else:
                rec["rows_match"] = len(spark_pdf) >= 0
                rec["hash_match"] = "rows-only"
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        results[name] = rec
        ok = rec["err"] is None and rec["hash_match"] in (True, "rows-only")
        if not ok:
            n_fail += 1
        status = "ok" if ok else "FAIL"
        print(f"[{i + 1:3d}/{len(names)}] {status:4s} {name}", flush=True)
        if not ok:
            print(f"      {json.dumps(rec)}", flush=True)

    print(f"\n{len(names) - n_fail}/{len(names)} green, {n_fail} failures")
    if args.only:
        # a targeted debug run must not clobber the committed full-window
        # artifact — it would replace the 50-entry gate record with a
        # partial (possibly 1-entry) one
        print("(--only run: driver_sim_last.json NOT rewritten)")
    else:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "driver_sim_last.json"), "w") as f:
            json.dump(results, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
