"""Cross-engine-deterministic curve fitting helpers.

One home for the centered-OLS slope used by every log-log fit
(heaps_law_points, degree_distribution): the raw closed form
nΣxy − ΣxΣy subtracts near-equal DECIMAL products that overflow the
38-digit precision cap and truncate differently per engine
(catastrophic cancellation — observed as 5th-decimal slope drift on
tight-spread points). Centering first keeps every product small and
exactly representable after the 9-decimal pre-round, so the one final
double division is computed from identical values on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def centered_ols_slope(pts_xy: DataFrame, alias: str) -> DataFrame:
    """One-row OLS slope of ``y`` on ``x`` over a points frame whose
    ``x``/``y`` columns are DECIMAL(18,9) (pre-rounded by the caller):

        slope = Σ(x−x̄)(y−ȳ) / Σ(x−x̄)²

    Means come from exact DECIMAL sums (one double division each);
    centered products are pre-rounded to DECIMAL(18,9) and summed
    exactly; the slope is NULL (try_divide) when all x coincide.
    Constant-size work — intended for fit tables of tens of points."""
    means = pts_xy.agg(
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mx"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("my"),
    )
    centered = pts_xy.crossJoin(F.broadcast(means)).select(
        F.expr(
            "CAST(round((CAST(x AS DOUBLE) - mx)"
            " * (CAST(y AS DOUBLE) - my), 9) AS DECIMAL(18,9))"
        ).alias("cxy"),
        F.expr(
            "CAST(round((CAST(x AS DOUBLE) - mx)"
            " * (CAST(x AS DOUBLE) - mx), 9) AS DECIMAL(18,9))"
        ).alias("cxx"),
    )
    return centered.agg(
        F.round(
            F.try_divide(
                F.sum("cxy").cast("double"),
                F.sum("cxx").cast("double"),
            ),
            6,
        ).alias(alias)
    )
