"""Cross-engine-stable decimal rounding.

Spark's `round()` converts the double to exact BigDecimal then HALF_UP;
DuckDB multiplies by 10^d and uses C rounding. For values that sit on a
decimal midpoint *created by division* (avg over 2 rows, price/quantity),
the two disagree by one ulp of output (e.g. 97601.585 → .58 vs .59).

`r2`/`r4` sidestep this by using the identical IEEE operation sequence on
both engines: floor(x * 10^d + 0.5) / 10^d. Same inputs, same ops, same
bits. The SQL oracle must use the literal `floor(x * 100 + 0.5) / 100`
form.

Signed inputs ARE sanctioned (skewness, A/B lift, zipf slope all round
possibly-negative values through r2/r4): the contract is CROSS-ENGINE
EQUALITY, not IEEE half-away-from-zero. For negative x the floor formula
rounds midpoints half-toward-+inf (-0.125 → -0.12, not -0.13); both
engines run the identical float ops so parity holds regardless of sign.
Do NOT "fix" signed callers to plain round() — that reintroduces the
midpoint divergence this module exists to remove.

Plain `F.round` remains fine (and is used everywhere else) for sums of
fixed-2-decimal inputs, where true midpoints can't occur.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r2(col: Column) -> Column:
    """floor(x*100 + 0.5)/100 — engine-stable 2-decimal rounding.

    Signed inputs allowed: negative midpoints round half-toward-+inf
    (see module docstring — cross-engine equality is the contract).
    """
    return F.floor(col * 100 + F.lit(0.5)) / 100


def r4(col: Column) -> Column:
    """floor(x*10000 + 0.5)/10000 — engine-stable 4-decimal rounding.

    Signed inputs allowed: negative midpoints round half-toward-+inf
    (see module docstring — cross-engine equality is the contract).
    """
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


def r6(col: Column) -> Column:
    """floor(x*1e6 + 0.5)/1e6 — engine-stable 6-decimal rounding.

    Used where a shuffled float aggregate feeds a certified contract
    whose oracle folds sequentially (k-means centroid updates quantize
    through this at every iteration boundary). Signed inputs allowed;
    the SQL oracle must use the literal floor(x * 1000000 + 0.5) /
    1000000 form.
    """
    return F.floor(col * 1000000 + F.lit(0.5)) / 1000000
