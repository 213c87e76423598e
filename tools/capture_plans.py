"""Capture `.explain("formatted")` plans for named catalog entries.

Writes plans/<outdir>/<name>_<suffix>.txt for each entry — the judged
before/after evidence for optimization rounds.

Usage: python tools/capture_plans.py --names a,b,c --suffix after \
           [--outdir plans/r13] [--sf-dir /root/testdata/sf0.1]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--outdir", default="plans/r13")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from dsp_spark import plans
    from dsp_spark.catalog import queries
    from dsp_spark.session import get_session

    spark = get_session("capture_plans")
    qs = queries()
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.names.split(","):
        name = name.strip()
        df = qs[name](spark, args.sf_dir)
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plans.formatted(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
