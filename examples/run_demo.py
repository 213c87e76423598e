#!/usr/bin/env python
"""End-to-end demo of the pipeline façade on the file-based config:

    python examples/run_demo.py [n_messages]

Generates heartbeat frames, runs parse -> router -> multicast with
Trigger.AvailableNow (the reference's EOF-then-stop pattern), prints
the reference-format throughput summary and the routed output counts.
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F


def main(n: int = 100_000) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dsp_spark.config import PipelineConfig
    from dsp_spark.engine import Pipeline
    from dsp_spark.operators.telemetry import heartbeat_frame, parse_telemetry, project_heartbeat
    from dsp_spark.session import get_session, spread

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = PipelineConfig.from_yaml(os.path.join(here, "file_router_demo.yaml"))
    shutil.rmtree("/tmp/dsp_demo", ignore_errors=True)

    spark = get_session("dsp-demo")
    # southbound load: binary heartbeat frames (client_id, sequence, ts)
    frames = spread(spark.range(n)).select(
        heartbeat_frame(
            F.col("id") % 1000, F.col("id"), F.lit(1_700_000_000_000_000) + F.col("id")
        ).alias("value")
    )
    frames.write.mode("overwrite").parquet(cfg.source.options["path"])

    def transform(df):
        return project_heartbeat(parse_telemetry(df), topic=cfg.app_topic)

    pipe = Pipeline(spark, cfg, transform=transform)
    pipe.start(checkpoint="/tmp/dsp_demo/ckpt", available_now=True)
    pipe.await_termination()
    print(pipe.summary())
    routed = spark.read.parquet("/tmp/dsp_demo/out/heartbeats")
    # reference cache semantics (cache.hpp:65-76): every routed copy goes
    # to every attached northbound -> n messages x 2 matching rules
    by_topic = {
        r["topic"]: r["n"]
        for r in routed.groupBy("topic").agg(F.count("*").alias("n")).collect()
    }
    print(f"main-nb received {routed.count()} routed copies: {by_topic}")
    pipe.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000))
