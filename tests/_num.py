"""Engine-faithful integer helpers for pure-python model tests.

The catalog's cross-engine determinism contract quantizes doubles with
HALF_UP rounding (Spark F.round / DuckDB round: ties away from zero)
and divides integers with SQL ``div`` (truncation toward zero). The
obvious python stand-ins are BOTH wrong on negatives:

* ``math.floor(x + 0.5)`` rounds ties toward +inf (floor(-2.5+0.5) =
  -2, HALF_UP gives -3);
* ``a // b`` floors toward -inf (-7 // 2 = -4, SQL div gives -3).

Every model in tests/ uses these helpers so the tests stay correct if
a signed value column ever lands (ADVICE r9 item 4)."""

from __future__ import annotations

import math


def half_up(x: float) -> int:
    """Round half away from zero — Spark F.round / DuckDB round on
    doubles (ties at exact .5 go AWAY from zero for both signs).

    NOT ``floor(x + 0.5)``: above 2^52 the ``+ 0.5`` is unrepresentable
    and rounds-to-even BUMPS integral doubles to the next integer
    (half_up(4503599627370497.0) must be 4503599627370497, the naive
    form gives ...498 — found by hypothesis, tests/test_props_r10.py).
    ``x - floor(x)`` is exact in IEEE (same-scale subtraction), so the
    fractional compare below is never subject to rounding."""
    if x >= 0:
        f = math.floor(x)
        return int(f) + (1 if x - f >= 0.5 else 0)
    c = math.ceil(x)
    return int(c) - (1 if c - x >= 0.5 else 0)


def trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — Spark ``div`` and
    DuckDB ``//`` on integers (python ``//`` floors instead)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q
