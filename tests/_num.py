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
    doubles (ties at exact .5 go AWAY from zero for both signs)."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — Spark ``div`` and
    DuckDB ``//`` on integers (python ``//`` floors instead)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q
