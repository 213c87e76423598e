#!/usr/bin/env python
"""Per-entry profiling harness for optimization rounds.

For each named catalog entry (or the top-N from bench_full.json), report:

* build_sec  — Python-side DataFrame construction time (plan building,
  includes any .rdd/getNumPartitions driver work in operators)
* exec_sec   — best-of-N noop-sink execution of the built plan
* first_sec  — first (cold-ish) execution, for C2/AQE ramp visibility
* n_jobs     — Spark jobs launched by one execution (sequential-job
  counting: localCheckpoints, AQE stage materialization, count()s)

Usage: python tools/profile_entries.py entry1,entry2 [reps]
       python tools/profile_entries.py --top 25 [reps]

Prints one JSON line per entry to stdout; human summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 3

    from dsp_spark import catalog
    from dsp_spark.session import get_session

    qs = catalog.queries()
    args = sys.argv[1:]
    if args and args[0] == "--top":
        n = int(args[1]) if len(args) > 1 else 25
        if len(args) > 2:
            reps = int(args[2])
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "bench_full.json")) as f:
            full = json.load(f)
        names = [
            k
            for k, _ in sorted(
                full["queries"].items(), key=lambda kv: -kv[1]
            )[:n]
        ]
    else:
        names = [x.strip() for x in args[0].split(",") if x.strip()]
        if len(args) > 1:
            reps = int(args[1])
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        sys.exit(2)

    spark = get_session(
        "dsp_profile", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def all_job_ids():
        # ids of every job submitted so far (no group filter)
        return set(tracker.getJobIdsForGroup(None) or [])

    # session warm-up: probe-style job + tiny-sf pass of the first entry
    from pyspark.sql import functions as F

    for _ in range(3):
        (
            spark.range(5_000_000)
            .select((F.col("id") % 997).alias("k"))
            .groupBy("k")
            .count()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    for name in names:
        # tiny-sf warmup (untimed): codegen/C2 for the plan family
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
        rec: dict = {"entry": name}
        try:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            rec["build_sec"] = round(time.perf_counter() - t0, 4)

            before = all_job_ids()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            rec["first_sec"] = round(time.perf_counter() - t0, 4)
            rec["n_jobs"] = len(all_job_ids() - before)

            best = float("inf")
            rebuild_best = float("inf")
            for _ in range(reps):
                sc._jvm.System.gc()
                t0 = time.perf_counter()
                df2 = qs[name](spark, sf_dir)
                df2.write.format("noop").mode("overwrite").save()
                rebuild_best = min(
                    rebuild_best, time.perf_counter() - t0
                )
                best = min(best, rebuild_best)
            rec["exec_sec"] = round(best, 4)
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps(rec), flush=True)
        print(
            f"{name:42s} build={rec.get('build_sec', '?'):>7} "
            f"first={rec.get('first_sec', '?'):>7} "
            f"best={rec.get('exec_sec', '?'):>7} "
            f"jobs={rec.get('n_jobs', '?')}",
            file=sys.stderr,
        )
        # drain persisted blocks like bench.py does
        try:
            for rdd in sc._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
            spark.catalog.clearCache()
        except Exception:
            pass


if __name__ == "__main__":
    main()
