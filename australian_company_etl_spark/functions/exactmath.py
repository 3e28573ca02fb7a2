"""Exact integer money arithmetic — dual-dialect (Spark Column + DuckDB SQL).

2-dp money stored in a double column is re-integerized by round(x * 100):
an exact cent count (the derived-partsupp idiom, plans/tpch_full.py).
Products of cent counts are exact BIGINT in 1e-4/1e-6 units; sums run as
DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so accumulation order cannot flip
a rounded output cent at ANY scale. Float sum(price * (1 - disc)) drifts
with row count and partition layout — at the replicated sf1 it flipped
TPC-H q5's 2-dp rounding by one cent between engines. Floats appear only
in the final same-integer-to-double casts and divisions, which are
correctly rounded identically on both sides.

Same exact-moments discipline as the z-score/Pearson/rollup operators
(J10/J16/L8 in SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

D38 = "decimal(38,0)"


def cents(col: Column | str) -> Column:
    """Exact cent count of a 2-dp money double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def cents_sql(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def money(sum_col: Column, scale: int, ndp: int = 2) -> Column:
    """Exact integer-unit sum → currency double, rounded to ndp."""
    return F.round(sum_col.cast("double") / F.lit(float(10**scale)), ndp)


def money_sql(sum_expr: str, scale: int, ndp: int = 2) -> str:
    return f"round(({sum_expr})::DOUBLE / {float(10 ** scale)}, {ndp})"


def sum_cents(col: Column | str) -> Column:
    """round(sum(money), 2) twin that cannot drift: exact cent sum, then
    one integer→double cast and division."""
    return money(F.sum(cents(col).cast(D38)), 2)


def sum_cents_sql(expr: str) -> str:
    return money_sql(f"sum({cents_sql(expr)})", 2)
