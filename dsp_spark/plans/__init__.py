from dsp_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    count_scans,
    formatted,
    has_broadcast_join,
    has_reused_exchange,
    pushed_filters,
    read_schema_columns,
    unpartitioned_windows,
    whole_stage_codegen_ids,
)
