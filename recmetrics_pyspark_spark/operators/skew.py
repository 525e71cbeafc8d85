"""Skew mitigation for hot-key joins: explicit salting.

AQE's skew-join splitting (on in our session factory) handles most
cases at runtime; explicit salting is the deterministic fallback for
power-law keys known in advance (the long-tail item distribution the
reference itself plots is exactly this shape). The salt changes only
physical distribution — join results are identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: salt the big side into
    ``n_salts`` sub-keys (deterministic spread via xxhash64 of the whole
    row) and replicate the small side once per salt, so one hot key
    fans out over n_salts shuffle partitions instead of one straggler.

    The replicated small side costs n_salts× its size — use for
    dimension-scale right sides only (same rule as broadcasting)."""
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts))
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_salted, [on, "_salt"], how).drop("_salt")
