"""Layout operator: range clustering must produce files whose min/max
ranges actually support data skipping — verified from parquet footers,
not just the plan."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from dsp_spark import plans
from dsp_spark.operators.layout import optimize_layout
from dsp_spark.session import read_table


def test_layout_plan_is_range_exchange_plus_local_sort(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    out = optimize_layout(ev, range_cols=["ts"], target_partitions=8)
    plan = plans.formatted(out)
    assert "rangepartitioning" in plan.lower().replace(" ", "")
    # local sort only: the Sort node must sit above the exchange and be
    # non-global (no second global ordering pass)
    assert "Sort" in plan


def test_layout_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    out = str(tmp_path / "clustered")
    optimize_layout(ev, range_cols=["ts"], target_partitions=8).write.parquet(out)
    spans = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "ts"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    assert len(spans) >= 4
    # consecutive files may touch at a sampled boundary but never nest:
    # a time-range predicate prunes to a contiguous file run
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {hi1} > {lo2}"
