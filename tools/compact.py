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

Crash safety: the swap never deletes the only copy, and recovery
never guesses. Before any original moves, its file NAME is recorded
in ``_compact_trash/_originals.json`` — so "which data files in the
partition dir are half-moved new files vs not-yet-moved originals"
is always answerable exactly, regardless of naming conventions or
how many compactions ran before. The sequence per partition:

1. write new files into ``_compact_tmp``;
2. mkdir ``_compact_trash``, record the originals manifest, move the
   originals in (reader-invisible, still on disk);
3. move new files from tmp into the partition dir;
4. touch the ``_compact_commit`` marker, then delete trash and tmp,
   then the marker.

Recovery on the next run: a commit marker means the swap COMPLETED
— trash/tmp are deletable garbage. Trash without a marker means the
swap did not finish — every data file NOT in the originals manifest
is a partial new file (discard), every manifest entry is restored
from trash (or was never moved and is still in place), and the
rewrite restarts. Tmp alone means the swap never began — originals
untouched. Every crash point resumes to exactly-once data: never
duplicates, never loss (worst case, readers briefly saw a subset
between two crashed runs).
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
        commit = os.path.join(part_dir, "_compact_commit")
        manifest = os.path.join(trash, "_originals.json")
        if os.path.exists(commit):
            # swap completed; cleanup was interrupted — finish it
            shutil.rmtree(trash, ignore_errors=True)
            shutil.rmtree(tmp, ignore_errors=True)
            os.remove(commit)
        elif os.path.exists(trash):
            # swap did not finish. The manifest says exactly which
            # names are originals; everything else in the partition
            # dir is a partial new copy — discard it, restore the
            # originals (from trash, or still in place if the crash
            # hit before their move), and start over. No manifest ⇒
            # the crash landed between mkdir and the manifest write,
            # so nothing was ever moved: the trash is empty garbage
            # and every file in the dir is an untouched original.
            if os.path.exists(manifest):
                with open(manifest) as f:
                    originals = set(json.load(f))
                for f_ in _data_files(part_dir):
                    if os.path.basename(f_) not in originals:
                        os.remove(f_)
                for f_ in _data_files(trash):
                    shutil.move(
                        f_, os.path.join(part_dir, os.path.basename(f_))
                    )
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
        # swap: manifest first (recovery's ground truth), originals
        # into reader-invisible trash, news in, THEN the commit marker
        os.makedirs(trash, exist_ok=True)
        with open(manifest, "w") as f:
            json.dump([os.path.basename(p) for p in files], f)
        for f_ in files:
            shutil.move(f_, os.path.join(trash, os.path.basename(f_)))
        for f_ in new_files:
            shutil.move(f_, os.path.join(part_dir, os.path.basename(f_)))
        with open(commit, "w"):
            pass
        shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        os.remove(commit)
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
