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


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """SQL entry point: register the synthetic tables as temp views and
    run an arbitrary query through ``spark.sql``.

    Every catalog oracle is written in portable ANSI SQL; the subset
    that avoids DuckDB-only functions runs unchanged here (parity-
    tested in tests/test_sql_surface.py), so users can drive the engine
    with SQL strings instead of the DataFrame builders.
    """
    from dsp_spark.session import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(sql)


def main(argv: list[str] | None = None) -> int:
    """CLI: ``python -m dsp_spark.catalog [name] [--sf-dir DIR] [-n N]``.

    Without a name, lists every registered entry with its doc line.
    With a name, runs the query and prints the first N rows.
    """
    import argparse

    p = argparse.ArgumentParser(description="dsp_spark query catalog")
    p.add_argument("name", nargs="?", help="catalog entry to run")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("-n", "--rows", type=int, default=20)
    p.add_argument("--explain", action="store_true", help="print the formatted plan")
    p.add_argument("--sql", action="store_true", help="run the oracle SQL via spark.sql instead of the DataFrame builder")
    args = p.parse_args(argv)

    es = entries()
    if not args.name:
        for name, e in sorted(es.items()):
            doc = (e.doc or "").split(". ")[0][:90]
            mark = " " if e.oracle else "*"  # * = rows-only (no oracle)
            print(f"{mark} {name:42s} {doc}")
        return 0
    if args.name not in es:
        print(f"unknown entry {args.name!r}; run with no args to list")
        return 2

    from dsp_spark.session import get_session

    spark = get_session("dsp-catalog-cli")
    e = es[args.name]
    if args.sql:
        if e.oracle is None:
            print(f"{args.name} has no SQL oracle (rows-only entry)")
            return 2
        df = run_sql(spark, args.sf_dir, e.oracle)
    else:
        df = e.fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    import sys

    # under `python -m dsp_spark.catalog` this file runs as __main__ with
    # its own (empty) registry; delegate to the canonical module object
    # that the query modules actually register into
    from dsp_spark.catalog import main as _canonical_main

    sys.exit(_canonical_main())
