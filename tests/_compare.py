"""Spark-vs-DuckDB result comparison mirroring the driver's check:
row count + column names + order-insensitive exact values."""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    # stable column order by name (the driver sorts columns before hashing)
    df = df[sorted(df.columns)]
    import datetime

    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # decimals and bytes -> canonical forms
            df[c] = df[c].map(lambda v: float(v) if hasattr(v, "as_tuple") else v)
            # Spark DATE comes back as datetime.date objects while DuckDB
            # fetchdf gives datetime64 — the driver's stringified hash
            # treats both as '1995-01-01' (midnight timestamps stringify
            # without the time), so the strict comparator must unify them
            # too, not fail on the representation
            if df[c].map(lambda v: isinstance(v, datetime.date) or pd.isna(v)).all() and not df[c].isna().all():
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, na_position="first", kind="mergesort").reset_index(
        drop=True
    )
    return df


def assert_results_equal(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = ""):
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        a_num = np.issubdtype(av.dtype, np.number)
        b_num = np.issubdtype(bv.dtype, np.number)
        if a_num and b_num:
            # the driver's value-hash stringifies, so int 900 vs float 900.0
            # is a MISMATCH there — catch kind drift here, not in CI
            a_f = np.issubdtype(av.dtype, np.floating)
            b_f = np.issubdtype(bv.dtype, np.floating)
            assert a_f == b_f, (
                f"{name}: column {c!r} numeric kind differs: "
                f"spark={av.dtype} duck={bv.dtype} (int-vs-float hashes differently)"
            )
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = pd.isna(av) & pd.isna(bv)
            eq = (av == bv) | both_nan
        else:
            eq = np.array(
                [x == y or (pd.isna(x) and pd.isna(y)) for x, y in zip(av, bv)]
            )
        if not eq.all():
            idx = int(np.argmin(eq))
            raise AssertionError(
                f"{name}: column {c!r} mismatch at sorted row {idx}: "
                f"spark={av[idx]!r} duck={bv[idx]!r} "
                f"({int((~eq).sum())}/{len(eq)} rows differ)"
            )
