"""Exact decimal arithmetic for money expressions.

Why: the fixtures' money columns are 2-decimal doubles. A product like
``l_extendedprice * (1 - l_discount)`` has an exact 4-decimal value, so
``ROUND(x, 2)`` lands on a ``.xx50`` tie for ~1% of rows — and Spark
(BigDecimal of the exact binary double, HALF_UP) and DuckDB (scaled
multiply + C rounding) disagree on those ties. Casting to DECIMAL first
makes the arithmetic exact and the HALF_UP rounding identical on both
engines at any data scale — this is the engine's convention for every
money *product*; plain 2-decimal sums are already tie-free at scale 2.

Spark-side helpers here; the oracle SQL mirrors them with
``CAST(x AS DECIMAL(p,s))`` and ``ROUND(...)::DOUBLE``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(col: Column | str, precision: int = 12) -> Column:
    """Cast a 2-decimal money double to an exact DECIMAL(precision, 2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},2)")


def disc_price(price="l_extendedprice", discount="l_discount") -> Column:
    """Exact l_extendedprice * (1 - l_discount) as DECIMAL(17,4)."""
    return dec2(price) * (F.lit(1).cast("decimal(4,2)") - dec2(discount, 4))


def charged_price(price="l_extendedprice", discount="l_discount", tax="l_tax") -> Column:
    """Exact price * (1-discount) * (1+tax) as DECIMAL(22,6)."""
    return disc_price(price, discount) * (F.lit(1).cast("decimal(4,2)") + dec2(tax, 4))


def round2_dbl(c: Column) -> Column:
    """ROUND(decimal, 2) → double (HALF_UP on the exact value)."""
    return F.round(c, 2).cast("double")


# DuckDB SQL fragments mirroring the helpers above.
SQL_DISC_PRICE = "(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))))"
SQL_CHARGED = (
    "(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
    " * (1 + CAST(l_tax AS DECIMAL(4,2))))"
)
