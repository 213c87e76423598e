"""Round-10 advisor findings fixed in round 11, each pinned:

1. (medium) adamic_adar's capped flag OR-ed was_capped over
   CONTRIBUTING centers only — a capped hub that dropped endpoint a
   emits no wedge row for (a, b), so a pair it undercounts could read
   capped=false via an uncapped center. Fixed with the SOUND flag
   (either endpoint in a truncated hub's rn>cap dropped tail; a missed
   wedge requires a dropped endpoint, so capped=false now guarantees
   exactness). Main pin: tests/test_graph_cap.py::
   test_adamic_adar_sound_capped_flag; here the catalog-entry oracle
   carries the same semantics (swept by test_oracle_parity).
2. (low) tools/dedup_state.py had no layout-version guard: ingest on a
   pre-shard state died with KeyError('n_buckets') / a parquet
   partition-discovery error. Now _meta.json pins layout=2 and every
   command fails with an explicit 'layout too old' message.
3. (low) a crash between parquet write and rename left
   bands/ingest=N._tmp, which spark.read.parquet partition-DISCOVERS
   (name starts with neither '_' nor '.'), feeding partial/duplicate
   rows to read_bands/read_edges. Tmp dirs are now dot-prefixed
   (.tmp-ingest=N — invisible to discovery) and every command sweeps
   strays (both forms) before reading.
4. (low) local_clustering with cap < 2 zeroes kd*(kd-1) for every node
   -> NaN/Infinity clustering_coeff, and graph_scores.py accepted any
   --cap. Both now validate cap >= 2.
"""

from __future__ import annotations

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dedup_state import (
    DEFAULTS,
    LAYOUT_VERSION,
    _clean_stray_tmps,
    _next_generation,
    cmd_init,
    cmd_stats,
    read_bands,
)


@pytest.fixture()
def tiny_state(spark, sf_dir, tmp_path):
    """A small init'd dedup state over a slice of documents."""
    from dsp_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs_path = str(tmp_path / "docs")
    docs.where(F.col("doc_id") % 8 == 0).write.parquet(docs_path)
    state = str(tmp_path / "state")
    cmd_init(spark, docs_path, state, dict(DEFAULTS))
    return state


# -- finding 2: layout-version guard ---------------------------------------


def test_init_pins_layout_version(tiny_state):
    with open(os.path.join(tiny_state, "_meta.json")) as f:
        meta = json.load(f)
    assert meta["layout"] == LAYOUT_VERSION


@pytest.mark.parametrize("stale_meta", [
    {"n_hashes": 8, "bands": 2, "k": 5},          # pre-shard: no n_buckets
    {**DEFAULTS, "layout": 1},                     # explicit older layout
])
def test_commands_reject_old_layout(spark, tiny_state, stale_meta):
    with open(os.path.join(tiny_state, "_meta.json"), "w") as f:
        json.dump(stale_meta, f)
    from tools.dedup_state import cmd_ingest

    with pytest.raises(SystemExit, match="layout too old"):
        cmd_stats(spark, tiny_state)
    with pytest.raises(SystemExit, match="layout too old"):
        cmd_ingest(spark, "/nonexistent", tiny_state)


def test_non_state_dir_rejected_explicitly(spark, tmp_path):
    with pytest.raises(SystemExit, match="not a dedup_state directory"):
        cmd_stats(spark, str(tmp_path / "nowhere"))


def test_truncated_meta_rejected_explicitly(spark, tiny_state):
    """A torn _meta.json (crash mid-dump with the pre-r11 in-place
    write) must fail with a named message, not a raw JSONDecodeError —
    and the current writer is atomic (tmp + rename), so no new state
    can produce one."""
    with open(os.path.join(tiny_state, "_meta.json"), "w") as f:
        f.write('{"n_hashes": 8, "ban')  # torn mid-dump
    with pytest.raises(SystemExit, match="corrupt _meta.json"):
        cmd_stats(spark, tiny_state)
    assert not os.path.exists(
        os.path.join(tiny_state, "_meta.json.tmp")
    )  # the atomic writer never leaves its tmp behind


# -- finding 3: crash-safe tmp naming + stray sweep -------------------------


def test_stray_tmp_dirs_are_invisible_and_swept(spark, tiny_state):
    bands_root = os.path.join(tiny_state, "bands")
    n_before = read_bands(spark, tiny_state).count()
    gen_before = _next_generation(bands_root)

    junk = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band_idx"),
        F.col("id").alias("band_hash"),
    )

    # the NEW dot-prefixed tmp name is invisible to partition discovery:
    # a crash mid-write can no longer corrupt reads (the legacy
    # `*._tmp` name was discovered and broke/polluted them — which is
    # exactly why the sweep below also removes that form)
    junk.write.parquet(os.path.join(bands_root, ".tmp-ingest=98"))
    assert read_bands(spark, tiny_state).count() == n_before
    assert _next_generation(bands_root) == gen_before

    # and every command sweeps strays of BOTH forms off disk first
    junk.write.parquet(os.path.join(bands_root, "legacy._tmp"))
    assert _next_generation(bands_root) == gen_before
    _clean_stray_tmps(tiny_state)
    leftover = [
        d for d in os.listdir(bands_root)
        if d.startswith(".tmp-") or d.endswith("._tmp")
    ]
    assert leftover == []
    assert read_bands(spark, tiny_state).count() == n_before


# -- finding 4: cap validation ----------------------------------------------


def test_wedge_cap_below_two_rejected(spark):
    from dsp_spark.operators.graph import (
        adamic_adar,
        capped_neighbors,
        local_clustering,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a bigint, id_b bigint"
    )
    for fn in (capped_neighbors, adamic_adar, local_clustering):
        with pytest.raises(ValueError, match="cap must be >= 2"):
            fn(pairs, cap=1)


def test_graph_scores_cli_validates_cap(tmp_path):
    from tools.graph_scores import main

    with pytest.raises(SystemExit):
        main([
            "clustering", "--state", str(tmp_path), "--out",
            str(tmp_path / "o"), "--cap", "1",
        ])


# -- finding 1: sound capped flag (catalog-level sanity) ---------------------


def test_catalog_adamic_adar_capped_false_rows_are_exact(spark, sf_dir):
    """At catalog scale nothing caps (bounded-degree LSH graph), so the
    sound flag must read all-false AND the scores must equal the
    uncapped enumeration — the guardrail changes nothing on healthy
    graphs. The undercount scenario itself is pinned in
    test_graph_cap.py::test_adamic_adar_sound_capped_flag."""
    from dsp_spark import catalog

    rows = (
        catalog.entries()["graph_adamic_adar_pairs"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert rows and not any(r.capped for r in rows)
