"""Query catalog: named (Spark builder, DuckDB oracle SQL) pairs.

Every operator the engine claims is registered here with

* a Spark implementation ``(spark, sf_dir) -> DataFrame``, and
* (where SQL-expressible) an equivalent ANSI-SQL string the DuckDB
  oracle runs on the same parquet tables.

The driver compares the two at sf=0.01 (row count + schema + value
hash, column-name sorted) — so Spark aliases and SQL aliases MUST
agree exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query to the catalog."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog entry: {name}")
        _REGISTRY[name] = CatalogEntry(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: e.fn for name, e in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: e.oracle for name, e in _REGISTRY.items() if e.oracle is not None}


def entries() -> dict[str, CatalogEntry]:
    _load_all()
    return dict(_REGISTRY)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers catalog entries."""
    global _LOADED
    if _LOADED:
        return
    # Imported for their registration side effects.
    from dsp_spark.queries import (  # noqa: F401
        relational,
        tpch_extra,
        windows,
        dedup,
        similarity,
        sampling,
        chunking,
        text,
        streaming_parity,
    )

    _LOADED = True
