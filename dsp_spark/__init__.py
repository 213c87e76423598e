"""dsp_spark — a PySpark-native analytics & stream-processing engine.

A from-scratch re-expression of the capabilities of the reference system
(ystre/dsp: byte-stream source -> handler parse -> rule router -> multicast
sinks, see /root/reference) as an idiomatic Apache Spark engine:

* the message model maps onto the Kafka-source DataFrame schema
  (reference: libdsp/libdsp/cache.hpp:31-36),
* routing/multicast is a config-driven DataFrame transform
  (reference: libdsp/libdsp/router.hpp:18-120),
* all relational / windowed / stateful analytics are native Spark
  (Catalyst optimizes; we never hand-schedule),
* plus a large-scale training-data operator library (dedup, similarity
  search, text analysis, multimodal columns) designed for 100 TB inputs.

Everything is DataFrame-first: each operator is a pure
``DataFrame -> DataFrame`` function usable identically in batch and
Structured Streaming.
"""

__version__ = "0.1.0"

__all__ = [
    "catalog",
    "get_session",
    "read_table",
    "load_tables",
    "Pipeline",
    "PipelineConfig",
]


def __getattr__(name):
    # lazy re-exports: importing dsp_spark must not start a JVM or pull
    # pyspark until an engine symbol is actually touched. import_module
    # (not `from ... import`) avoids re-entering this hook mid-import.
    import importlib

    if name == "catalog":
        return importlib.import_module("dsp_spark.catalog")
    if name in ("get_session", "read_table", "load_tables"):
        return getattr(importlib.import_module("dsp_spark.session"), name)
    if name == "Pipeline":
        return importlib.import_module("dsp_spark.engine").Pipeline
    if name == "PipelineConfig":
        return importlib.import_module("dsp_spark.config").PipelineConfig
    raise AttributeError(f"module 'dsp_spark' has no attribute {name!r}")
