"""Cross-engine-stable decimal rounding.

Spark's `round()` converts the double to exact BigDecimal then HALF_UP;
DuckDB multiplies by 10^d and uses C rounding. For values that sit on a
decimal midpoint *created by division* (avg over 2 rows, price/quantity),
the two disagree by one ulp of output (e.g. 97601.585 → .58 vs .59).

`r2`/`r4` sidestep this by using the identical IEEE operation sequence on
both engines: floor(x * 10^d + 0.5) / 10^d. Same inputs, same ops, same
bits. The SQL oracle must use the literal `floor(x * 100 + 0.5) / 100`
form (valid for non-negative x; for possibly-negative x the caller must
shift or use plain round and accept midpoint risk).

Plain `F.round` remains fine (and is used everywhere else) for sums of
fixed-2-decimal inputs, where true midpoints can't occur.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r2(col: Column) -> Column:
    """floor(x*100 + 0.5)/100 — engine-stable 2-decimal rounding (x >= 0)."""
    return F.floor(col * 100 + F.lit(0.5)) / 100


def r4(col: Column) -> Column:
    """floor(x*10000 + 0.5)/10000 — engine-stable 4-decimal rounding (x >= 0)."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000
