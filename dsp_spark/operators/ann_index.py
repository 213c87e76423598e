"""Persisted IVF index: the ANN index lifecycle as parquet layout.

The catalog's `ann_ivf_topk` composes assignment + probe + score in
one query — right for a one-shot scan, wrong for a served index that
answers many query batches: re-assigning billions of vectors per
lookup is the cost the index exists to amortize. Here the index IS a
partition layout:

* ``build_ivf_index`` assigns every corpus vector to its nearest
  centroid once and writes ``cells/`` partitioned BY CELL (plus the
  centroid codebook and a JSON manifest). One job, run at ingest.
* ``query_ivf_index`` assigns the query batch to its ``nprobe``
  cells, collects that tiny cell-id list (queries x nprobe ints — a
  driver action on the QUERY side only, never the corpus), and reads
  the cell directories through a partition filter: the scan lists and
  decodes ONLY nprobe/n_cells of the corpus — the IO shape that makes
  IVF an index instead of a scan strategy. Scoring is the same exact
  cosine + per-query top-k as the in-memory operator, so results are
  identical (asserted in tests).

Vector norms are precomputed into the index, so query-time work per
candidate is one dot product. Rebuilds are atomic-ish per directory
(overwrite mode); incremental adds append new files into the
assigned cell's partition directory.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dsp_spark.operators.similarity import ivf_assign, score_probed_cells


def build_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Assign once, write cell-partitioned; returns the manifest."""
    cells = ivf_assign(
        corpus, centroids, id_col=id_col, vec_col=vec_col, nprobe=1
    )
    cells.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "cells")
    )
    centroids.write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )
    spark = corpus.sparkSession
    n_vec = spark.read.parquet(os.path.join(path, "cells")).count()
    n_cells = centroids.count()
    manifest = {
        "id_col": id_col,
        "vec_col": vec_col,
        "n_vectors": n_vec,
        "n_cells": n_cells,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def query_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    nprobe: int = 2,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k inside the query batch's probed cells only."""
    with open(os.path.join(path, "manifest.json")) as f:
        m = json.load(f)
    id_col, vec_col = m["id_col"], m["vec_col"]
    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    probes = (
        ivf_assign(
            queries, centroids, id_col=id_col, vec_col=vec_col, nprobe=nprobe
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col("nrm").alias("q_nrm"),
            "cell",
        )
        # materialize the (tiny) query-side assignment once: it feeds
        # both the cell-id collect below and the candidate join —
        # without this the centroid crossJoin + rank window runs twice
        .localCheckpoint()
    )
    # the ONLY driver-side materialization of VALUES is the probed
    # cell-id list: |queries| x nprobe small ints, corpus-independent
    cell_ids = [r.cell for r in probes.select("cell").distinct().collect()]
    cells = spark.read.parquet(os.path.join(path, "cells")).where(
        F.col("cell").isin(cell_ids)
    )
    # scoring is the shared definition in operators/similarity.py —
    # index results can't drift from the in-memory operator
    return score_probed_cells(
        cells, probes, id_col=id_col, vec_col=vec_col, k=k
    )
