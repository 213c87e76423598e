"""Persisted IVF index: identical answers to the in-memory composition,
partition pruning actually fires, and incremental adds land in cells."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dsp_spark import plans
from dsp_spark.operators import similarity as sim
from dsp_spark.operators.ann_index import build_ivf_index, query_ivf_index
from dsp_spark.session import read_table


def _setup(spark, sf_dir, tmp_path):
    e = read_table(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") % 100 == 0)
    queries = e.filter(F.col("vec_id") < 5)
    idx = str(tmp_path / "ivf_idx")
    manifest = build_ivf_index(e, cent, idx)
    return e, cent, queries, idx, manifest


def test_index_query_equals_in_memory_ivf(spark, sf_dir, tmp_path):
    e, cent, queries, idx, manifest = _setup(spark, sf_dir, tmp_path)
    assert manifest["n_vectors"] == e.count()
    want = {
        (r.query_id, r.vec_id, r.rank, r.sim)
        for r in sim.ivf_topk(e, queries, cent, nprobe=2, k=10).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.rank, r.sim)
        for r in query_ivf_index(spark, idx, queries, nprobe=2, k=10).collect()
    }
    assert got == want


def test_index_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    _, _, queries, idx, _ = _setup(spark, sf_dir, tmp_path)
    df = query_ivf_index(spark, idx, queries, nprobe=2, k=10)
    plan = plans.formatted(df)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "cell" in pf  # the cell filter reached the scan's listing
    # and the layout really is one directory per cell
    cell_dirs = [
        d for d in os.listdir(os.path.join(idx, "cells")) if d.startswith("cell=")
    ]
    with open(os.path.join(idx, "manifest.json")) as f:
        m = json.load(f)
    assert 0 < len(cell_dirs) <= m["n_cells"]


def test_catalog_entry_matches_scan_composed_ivf(spark, sf_dir):
    """The `ann_index_persisted_topk` catalog entry (build once per
    process into spark-warehouse/ann_index, query the on-disk layout)
    must return exactly what the scan-composed `ann_ivf_topk` entry
    returns — same codebook, nprobe, shared scorer — and its scan must
    stay partition-pruned in the catalog context too."""
    from dsp_spark.queries.similarity import (
        ann_index_persisted_topk,
        ann_ivf_topk,
    )

    want = {
        tuple(r) for r in ann_ivf_topk(spark, sf_dir).collect()
    }
    df = ann_index_persisted_topk(spark, sf_dir)
    got = {tuple(r) for r in df.collect()}
    assert got == want
    plan = plans.formatted(df)
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_incremental_add_lands_in_cells(spark, sf_dir, tmp_path):
    e, cent, queries, idx, manifest = _setup(spark, sf_dir, tmp_path)
    # new vectors arrive: assign against the SAME codebook and append
    new = e.filter(F.col("vec_id") < 3).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    from dsp_spark.operators.similarity import ivf_assign

    ivf_assign(new, cent, nprobe=1).write.mode("append").partitionBy(
        "cell"
    ).parquet(os.path.join(idx, "cells"))
    back = spark.read.parquet(os.path.join(idx, "cells"))
    assert back.count() == manifest["n_vectors"] + 3
    # the appended twins of query vectors score sim=1.0 for them
    res = query_ivf_index(spark, idx, queries, nprobe=2, k=10)
    top = {
        r.query_id: r.vec_id
        for r in res.filter(F.col("rank") == 1).collect()
        if r.query_id < 3
    }
    assert all(v == q + 1_000_000 for q, v in top.items())


def test_persisted_index_trusted_across_processes(spark, sf_dir):
    """The index commit-marker manifest lets a FRESH process reuse an
    on-disk index built from the same input (fingerprint match), while
    a regenerated input or corrupted marker forces a rebuild."""
    import json
    import time

    from dsp_spark.queries import similarity as simq

    # first build (or reuse) in this process
    path = simq._ivf_index_path(spark, sf_dir)
    marker = os.path.join(path, "_index_manifest.json")
    assert os.path.exists(marker)
    built_at = os.path.getmtime(marker)

    # simulate a fresh process: clear the in-memory cache; a matching
    # marker must be trusted (no rebuild -> marker mtime unchanged)
    simq._IVF_INDEX_BUILT.clear()
    assert simq._ivf_index_path(spark, sf_dir) == path
    assert os.path.getmtime(marker) == built_at
    assert simq._IVF_INDEX_BUILT  # cache re-primed

    # a marker whose fingerprint does not match the input must NOT be
    # trusted: poison it and expect a rebuild (marker rewritten)
    simq._IVF_INDEX_BUILT.clear()
    with open(marker, "w") as f:
        json.dump({"fingerprint": "stale"}, f)
    time.sleep(0.02)
    assert simq._ivf_index_path(spark, sf_dir) == path
    with open(marker) as f:
        assert json.load(f)["fingerprint"] == simq._ivf_fingerprint(
            os.path.abspath(os.path.normpath(sf_dir))
        )
