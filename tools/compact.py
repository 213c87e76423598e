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
the worker.

Crash safety: the swap never deletes the only copy. New files are
built in ``_compact_tmp``; the old files are then MOVED (renamed)
into ``_compact_trash`` — still on disk, just invisible to readers —
before the new files move in under a ``c9-`` name prefix; only then
are trash and tmp removed. Recovery on the next run is driven by the
trash marker: if ``_compact_trash`` exists, the previous swap did not
finish — any half-moved ``c9-`` files are discarded, the originals
are restored from trash, and compaction restarts from scratch. Every
crash point therefore resumes to a correct state (worst case: readers
briefly saw a subset of rows between two crashed runs, never
duplicates, never loss).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _partition_dirs(root: str) -> list[str]:
    """Leaf directories holding data files (Hive key=value layout) —
    including ones whose only content is crash residue (a trash/tmp
    dir with no visible parquet), which recovery must still visit."""
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        if "_compact_tmp" in dirpath or "_compact_trash" in dirpath:
            continue
        if (
            any(f.endswith(".parquet") for f in filenames)
            or "_compact_trash" in dirnames
            or "_compact_tmp" in dirnames
        ):
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
        trash = os.path.join(part_dir, "_compact_trash")
        if os.path.exists(trash):
            # crashed mid-swap: discard half-moved new files, restore
            # the originals (still intact in trash), start over
            for f in _data_files(part_dir):
                if os.path.basename(f).startswith("c9-"):
                    os.remove(f)
            for f in _data_files(trash):
                shutil.move(f, os.path.join(part_dir, os.path.basename(f)))
            shutil.rmtree(trash, ignore_errors=True)
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
        # swap, never deleting the only copy: originals rename into the
        # (reader-invisible) trash dir, new files move in under the
        # c9- marker, and only a COMPLETE swap removes the trash
        os.makedirs(trash, exist_ok=True)
        for f in files:
            shutil.move(f, os.path.join(trash, os.path.basename(f)))
        for f in new_files:
            base = os.path.basename(f)
            if not base.startswith("c9-"):
                base = f"c9-{base}"
            shutil.move(f, os.path.join(part_dir, base))
        shutil.rmtree(trash, ignore_errors=True)
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
