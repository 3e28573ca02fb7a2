"""Exact integer money arithmetic — dual-dialect (Spark Column + DuckDB SQL).

2-dp money stored in a double column is re-integerized by round(x * 100):
an exact cent count (the derived-partsupp idiom, plans/tpch_full.py).
Products of cent counts are exact BIGINT in 1e-4/1e-6 units; sums run as
DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so accumulation order cannot flip
a rounded output cent at ANY scale. Float sum(price * (1 - disc)) drifts
with row count and partition layout — at the replicated sf1 it flipped
TPC-H q5's 2-dp rounding by one cent between engines. Floats appear only
in the final same-integer-to-double casts and divisions. One engine
asymmetry hides there (round-9 extreme-value sweep): DuckDB's
HUGEINT→DOUBLE cast is NOT correctly rounded past 2^53 (a measured
exact-tie cent sum went to the truncated neighbor where Spark's
Decimal→double rounds half-even), so money_sql routes the integer sum
through BIGINT — whose →DOUBLE conversion IS correctly rounded,
bit-matching Spark at any magnitude — and sums beyond BIGINT
(>9.2e18 integer units) fail loudly in the oracle instead of drifting.

Same exact-moments discipline as the z-score/Pearson/rollup operators
(J10/J16/L8 in SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

D38 = "decimal(38,0)"
BIGINT_MAX = 9223372036854775807


def cents(col: Column | str) -> Column:
    """Exact cent count of a 2-dp money double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def cents_sql(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def money(sum_col: Column, scale: int, ndp: int = 2) -> Column:
    """Exact integer-unit sum → currency double, rounded to ndp.

    The scale→ndp reduction rounds in INTEGER units first (half away from
    zero on the exact integer), THEN performs the single division: dividing
    the e-4 integer by 10^4 before rounding puts the tie exactly on a
    non-representable decimal (…X.XX50), where Spark (BigDecimal
    shortest-repr HALF_UP: up) and DuckDB (raw-double: whichever side the
    nearest double landed) disagree — the replicated sf1 corpus makes …50
    endings 10× likelier (every replicated sum gains a trailing zero) and
    flipped 5 of 1000 Pareto revenues by one cent between engines. With the
    tie resolved on the exact integer, both engines derive the SAME
    reduced integer and the final cast/divide is the identical operation
    on identical inputs."""
    if scale > ndp:
        unit = 10 ** (scale - ndp)
        half = unit // 2
        mag = F.floor((F.abs(sum_col) + F.lit(half)) / F.lit(unit))
        sum_col = F.when(sum_col < 0, -mag).otherwise(mag)
        scale = ndp  # the reduced integer is now in 10^-ndp units
    # scale <= ndp: the value has at most `scale` decimals, exactly — no
    # tie exists and the single division is the full answer.
    # Matched BIGINT envelope guard (ADVICE r09): money_sql routes the
    # reduced integer through ::BIGINT, whose →DOUBLE cast is correctly
    # rounded — past 9.2e18 integer units DuckDB would raise a raw
    # ConversionException while an unguarded Spark Decimal→double would
    # silently keep returning values. Both engines now refuse with the
    # 'envelope' marker, like every other exactness envelope in the tree.
    over = F.abs(sum_col.cast(D38)) > F.lit(BIGINT_MAX).cast(D38)
    return F.when(
        over,
        F.raise_error(
            F.lit(
                "money: exact-integer envelope exceeded (|sum| > 9.2e18 "
                "integer units, past BIGINT's correctly-rounded →DOUBLE "
                "range) — rescale the unit before summing"
            )
        ).cast("double"),
    ).otherwise(F.round(sum_col.cast("double") / F.lit(float(10**scale)), ndp))


def money_sql(sum_expr: str, scale: int, ndp: int = 2) -> str:
    # the integer sum is cast through BIGINT before DOUBLE: DuckDB's
    # HUGEINT→DOUBLE conversion is not correctly rounded (measured in the
    # round-9 extreme-value sweep: the exact cent sum -200000000000002672
    # — a tie between adjacent doubles — went to the truncated neighbor
    # where Spark's Decimal→double and C's int64→double round half-even),
    # so sums past 2^53 cents diverged by an ulp. int64→double IS
    # correctly rounded, matching Spark exactly; sums past BIGINT range
    # (9.2e18 integer units) now fail loudly in the oracle instead of
    # silently drifting — the same envelope discipline as everywhere else.
    if scale > ndp:
        unit = 10 ** (scale - ndp)
        half = unit // 2
        mag = f"((abs({sum_expr}) + {half}) // {unit})"
        red = f"(CASE WHEN ({sum_expr}) < 0 THEN -{mag} ELSE {mag} END)"
        scale = ndp
    else:
        red = f"({sum_expr})"
    # matched 'envelope' refusal past BIGINT, mirroring money() above — a
    # raw ::BIGINT ConversionException would read as an unmatched failure
    # in the regime sweeps instead of an ok-declined parity
    return (
        f"(CASE WHEN abs({red}) > {BIGINT_MAX}::HUGEINT "
        f"THEN error('money: exact-integer envelope exceeded (|sum| > 9.2e18 "
        f"integer units, past BIGINT''s correctly-rounded ->DOUBLE range) - "
        f"rescale the unit before summing')::DOUBLE "
        f"ELSE round(({red}::BIGINT)::DOUBLE / {float(10 ** scale)}, {ndp}) END)"
    )


def sum_cents(col: Column | str) -> Column:
    """round(sum(money), 2) twin that cannot drift: exact cent sum, then
    one integer→double cast and division."""
    return money(F.sum(cents(col).cast(D38)), 2)


def sum_cents_sql(expr: str) -> str:
    return money_sql(f"sum({cents_sql(expr)})", 2)
