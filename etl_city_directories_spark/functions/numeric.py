"""Cross-engine numeric determinism helpers.

The driver hash-compares Spark results against a DuckDB oracle, so
every aggregate must be bit-identical across engines. Policy:

- money/quantity math runs in DECIMAL (exact, order-independent sums),
  cast to DOUBLE only at the output boundary;
- ratios/averages divide exact decimal-derived doubles and round to 4
  decimal places;
- counts stay BIGINT (DuckDB SUM() widens to HUGEINT — oracles must
  cast back).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(col: str | Column) -> Column:
    """Exact 2-dp decimal view of a double column (prices, discounts)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def money_sum(col: Column, alias: str) -> Column:
    """Order-independent exact sum of a decimal expression → double."""
    return F.sum(col).cast("double").alias(alias)


def ratio(num: Column, den: Column, alias: str, scale: int = 4) -> Column:
    """Deterministic average/ratio: exact operands, one double divide."""
    return F.round(num.cast("double") / den.cast("double"), scale).alias(alias)
