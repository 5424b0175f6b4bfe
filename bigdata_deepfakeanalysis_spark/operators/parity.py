"""Oracle-parity helpers.

The driver compares Spark results against DuckDB with an exact value
hash. Double aggregation order differs between engines (partial/final
hash agg in Spark vs DuckDB's own order), so plain SUM(double) is not
bit-stable. We route money/measure sums through DECIMAL — exact
arithmetic, order-independent — then cast back to DOUBLE at the end.
Both engines convert the identical decimal to the identical double.

These helpers return Spark Column expressions; the matching DuckDB SQL
fragments are spelled identically in the oracle strings (same CAST
chain), which is what guarantees bit-equality.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(expr: str, alias: str, scale: int = 4) -> Column:
    """Order-independent SUM of a double expression via DECIMAL(18,scale)."""
    return F.expr(
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"
    ).alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def davg(expr: str, alias: str, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum / count, in double."""
    return F.expr(
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    ).alias(alias)


def davg_sql(expr: str, alias: str, scale: int = 4) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def dmul2_sum(a: str, b: str, alias: str, scale: int = 4) -> Column:
    """SUM(a*b) with both factors snapped to DECIMAL first (exact product)."""
    return F.expr(
        f"CAST(SUM(CAST(({a}) AS DECIMAL(18,{scale})) *"
        f" CAST(({b}) AS DECIMAL(18,{scale}))) AS DOUBLE)"
    ).alias(alias)


def dmul2_sum_sql(a: str, b: str, alias: str, scale: int = 4) -> str:
    return (
        f"CAST(SUM(CAST(({a}) AS DECIMAL(18,{scale})) *"
        f" CAST(({b}) AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"
    )


def stddev_expr(expr: str, alias: str, scale: int = 4) -> Column:
    """Sample stddev via the explicit decimal-exact sum/sumsq formula so
    both engines compute sqrt() of the identical double.

    DECIMAL(12,scale): small enough that the squared term stays within
    DuckDB's physical int64/int128 multiply (DECIMAL(18)^2 overflows)."""
    d = f"CAST(({expr}) AS DECIMAL(12,{scale}))"
    return F.expr(
        f"SQRT((CAST(SUM({d}*{d}) AS DOUBLE) - "
        f"CAST(SUM({d}) AS DOUBLE)*CAST(SUM({d}) AS DOUBLE)/COUNT({expr}))"
        f" / (COUNT({expr}) - 1))"
    ).alias(alias)


def stddev_sql(expr: str, alias: str, scale: int = 4) -> str:
    d = f"CAST(({expr}) AS DECIMAL(12,{scale}))"
    return (
        f"SQRT((CAST(SUM({d}*{d}) AS DOUBLE) - "
        f"CAST(SUM({d}) AS DOUBLE)*CAST(SUM({d}) AS DOUBLE)/COUNT({expr}))"
        f" / (COUNT({expr}) - 1)) AS {alias}"
    )


# Seeded deterministic ordering (SURVEY A7): rank over md5 of (seed, key).
# md5 hex is identical in Spark and DuckDB, so rank order matches exactly.
def md5_order(key_expr: str, seed: int = 42) -> Column:
    return F.md5(F.concat_ws("|", F.lit(str(seed)), F.expr(f"CAST(({key_expr}) AS STRING)")))


def md5_order_sql(key_expr: str, seed: int = 42) -> str:
    return f"md5(concat('{seed}', '|', CAST(({key_expr}) AS VARCHAR)))"
