"""User-defined extension surface: the engine's answer to the
reference's subclass hooks (SURVEY.md §2.5 — TCP/Kafka handlers,
northbound plugins, the aspirational Lua scripting).

On Spark the extension points are function-shaped, not class-shaped:

* scalar  — Arrow-batched ``pandas_udf`` (vectorized per-row logic)
* UDAF    — grouped-agg ``pandas_udf`` (a whole group in, one value out)
* UDTF    — Python user-defined *table* function (0..N rows out per row,
  the message-handler shape: one record in, many routed records out —
  svc/handler.cpp:97-120's do_process returning multiple frames)
* grouped map / mapInPandas — see operators/multimodal.py and
  streaming/stateful.py for the production uses

Everything here is Arrow-batched; nothing is row-at-a-time Python.
Built-ins always win when they can express the logic (these exist for
the cases they can't, and as the documented plugin surface). UDF
construction is lazy: decorating needs a live SparkSession, so modules
can be imported session-free.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column

_MEDIAN = None
_NROWS = None


def median_udaf(col) -> Column:
    """Grouped-aggregate pandas UDF: exact median of a numeric column.

    Median of integers is engine-deterministic (the even-count case
    averages two ints — an exact .0/.5 double), so unlike most Python
    aggregates this one is fully oracle-checkable. At scale the group's
    values stream to one executor as Arrow batches — fine for bounded
    groups (per-source stats), wrong for unbounded ones (use
    percentile_approx instead).
    """
    global _MEDIAN
    if _MEDIAN is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _median(v: pd.Series) -> float:
            return float(v.median())

        _MEDIAN = _median
    return _MEDIAN(col)


def nrows_udaf(col) -> Column:
    """Grouped-agg pandas UDF counting group rows; exists because Spark
    refuses to mix pandas and JVM aggregates in one agg() call
    (INVALID_PANDAS_UDF_PLACEMENT), so UDAF-based entries count with a
    UDAF as well."""
    global _NROWS
    if _NROWS is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _nrows(v: pd.Series) -> int:
            return int(len(v))

        _NROWS = _nrows
    return _NROWS(col)


class BigramUDTF:
    """UDTF emitting one row per word-2-gram of the input text — the
    one-in/N-out handler shape. Registered via ``register_udtfs`` for
    SQL ``LATERAL`` use; prefer the built-in explode/transform pipeline
    (queries/text.py) in hot paths — this is the *extension* surface
    for logic HOFs can't express.
    """

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = text.split()
        for i in range(len(toks) - 1):
            yield i, toks[i] + " " + toks[i + 1]


def register_udtfs(spark) -> None:
    """Register the UDTF surface for spark.sql LATERAL queries."""
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "bigrams", udtf(BigramUDTF, returnType="gram_no int, gram string")
    )


__all__ = ["median_udaf", "nrows_udaf", "BigramUDTF", "register_udtfs"]
