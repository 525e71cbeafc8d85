"""Data-quality constraint checking — the dbt-test / Deequ-style gate a
pipeline runs before promoting a table.

Column constraints (null-rate, range, set membership) compile into ONE
aggregate pass over the table: each check is a conditional-sum column,
so 20 checks cost the same scan as one. Referential checks are
left-anti joins that only shuffle the child table's key column. Output
is one row per check: (check, n_violations, n_rows, pass) — small
enough to broadcast into a gate decision or alert sink at any input
size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_columns(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """Run named violation predicates in one scan. ``checks`` maps
    check name → a Column that is TRUE when the ROW VIOLATES the
    constraint. Names are data, never SQL: the aggregates use internal
    aliases and the unpivot is explode(map(lit(name), ...)), so any
    name (quotes, backticks, spaces, leading digits) is safe."""
    if not checks:
        raise ValueError("check_columns: checks must be non-empty")
    items = list(checks.items())
    total = F.count(F.lit(1))
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"__c{i}")
        for i, (_, cond) in enumerate(items)
    ]
    row = df.agg(total.cast("bigint").alias("__n"), *aggs)
    kv: list[Column] = []
    for i, (name, _) in enumerate(items):
        kv.extend([F.lit(name), F.col(f"__c{i}")])
    return row.select(
        F.explode(F.create_map(*kv)).alias("check", "n_violations"),
        F.col("__n").alias("n_rows"),
    ).select(
        "check",
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("pass"),
    )


def check_unique(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Uniqueness constraint: number of rows beyond the first per key
    (0 = unique). One keyed aggregate, key-scale output."""
    dup = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("c"))
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    viol = dup.agg(
        F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0))
        .cast("bigint")
        .alias("n_violations")
    )
    return viol.crossJoin(F.broadcast(total)).select(
        F.lit(name).alias("check"),
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("pass"),
    )


def check_foreign_key(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Referential integrity: child keys with no parent row. The anti
    join shuffles only the key columns; the parent side prunes to its
    key column at the scan."""
    c = child.select(F.col(child_key).alias("k"))
    p = parent.select(F.col(parent_key).alias("k")).distinct()
    orphans = c.join(p, "k", "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_violations")
    )
    total = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    return orphans.crossJoin(F.broadcast(total)).select(
        F.lit(name).alias("check"),
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("pass"),
    )


def run_checks(parts: list[DataFrame]) -> DataFrame:
    """Union per-check result frames into the one gate table."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def equi_width_bin(
    value: Column, v_lo: Column, v_hi: Column, n_bins: int
) -> Column:
    """Equi-width bin index over [v_lo, v_hi], clamped to
    [0, n_bins-1], with EXPLICIT degenerate-range semantics: when the
    observed range collapses (v_hi == v_lo — a constant feed), values
    AT the constant land in bin 1 while values above/below land in the
    top/bottom edge bins, so a drift comparison against a constant
    baseline still SEPARATES shifted mass (alerting) instead of
    crashing (ANSI divide-by-zero) or silently sharing one bin with
    the baseline (a blind monitor). The ONE place the binning rule
    lives — batch PSI and both streaming drift twins share it; the
    DuckDB oracles mirror the same CASE. Note least()/greatest() SKIP
    NULL operands on both engines, so a NULL-from-division can never
    be patched up after the fact — the zero-width case must branch
    BEFORE the division, as here — and for the same reason a NULL
    *value* would silently land in the top edge bin through the
    greatest/least clamp (registering missing measurements as shifted
    mass): the leading isNull arm pins NULL → NULL in BOTH branches.
    The constant slot is ``least(1, n_bins-1)`` so n_bins ∈ {1, 2}
    degrades to valid indices; the separation guarantee (constant bin
    distinct from both edge bins) needs n_bins ≥ 3, asserted at the
    drift-monitor call sites that rely on it."""
    width = (v_hi - v_lo) / n_bins
    normal = F.greatest(
        F.least(
            F.floor(F.try_divide(value - v_lo, width)),
            F.lit(n_bins - 1),
        ),
        F.lit(0),
    )
    return (
        F.when(value.isNull(), F.lit(None))
        .when(
            v_hi == v_lo,
            F.when(value < v_lo, F.lit(0))
            .when(value == v_lo, F.least(F.lit(1), F.lit(n_bins - 1)))
            .otherwise(F.lit(n_bins - 1)),
        )
        .otherwise(normal)
        .cast("int")
    )


def psi_drift(
    df: DataFrame,
    col_group: str = "event_type",
    col_value: str = "value",
    col_ts: str = "ts",
    n_bins: int = 10,
    alert_at: float = 0.2,
) -> DataFrame:
    """Population Stability Index between the first and second half of
    the table's time range, per group — the standard drift monitor a
    pipeline runs before trusting a refreshed feed:

        PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)

    < 0.1 is stable, 0.1–0.2 drifting, > ``alert_at`` alerts. Shares
    are Laplace-smoothed ((n + 0.5) / (N + 0.5·n_bins)) so empty bins
    never produce ln(0); bins are global equi-width over the observed
    value range (one tiny min/max aggregate broadcast back — the same
    floor-arithmetic binning as feature_binning, deterministic in any
    IEEE-double engine).

    Scale: one stats broadcast + one (group, side, bin) aggregate —
    the shuffle carries group×bin rows, never the input. The split
    point is data-derived (midpoint of min/max ts), so re-running on a
    grown table moves the comparison window with the data."""
    if n_bins < 3:
        raise ValueError(
            "psi_drift needs n_bins >= 3: the constant-feed slot (bin "
            "1) must be distinct from both edge bins for shifted mass "
            "to separate from a constant baseline"
        )
    # integer epoch-MICROSECONDS via pure ntz arithmetic (no tz, no
    # double truncation — the same engine-portability rule as the
    # as-of join's tolerance edge), so the midpoint compare 2·t <
    # lo+hi is exact in int64 on any engine
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
        f" `{col_ts}`)"
    )
    stats = df.agg(
        F.min(us).alias("ts_lo"),
        F.max(us).alias("ts_hi"),
        F.min(col_value).alias("v_lo"),
        F.max(col_value).alias("v_hi"),
    )
    binned = (
        df.select(col_group, col_value, us.alias("tsd"))
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(col_group).alias("grp"),
            F.when(
                2 * F.col("tsd") < F.col("ts_lo") + F.col("ts_hi"), "ref"
            ).otherwise("cur").alias("side"),
            equi_width_bin(
                F.col(col_value), F.col("v_lo"), F.col("v_hi"), n_bins
            ).alias("bin"),
        )
    )
    # NULL bins (NULL measurements) are excluded from counts AND
    # totals: a half with more missing values must not register as
    # uniformly-shifted mass across every bin — missingness is a
    # different monitor. n_ref/n_cur therefore count MEASURED rows.
    counts = (
        binned.filter(F.col("bin").isNotNull())
        .groupBy("grp", "side", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.groupBy("grp", "side").agg(F.sum("n").alias("tot"))
    # densify: every (grp, side, bin) slot, so empty bins contribute
    # their smoothed share on both sides
    slots = (
        totals.select("grp", "side", "tot")
        .crossJoin(
            F.broadcast(
                counts.sparkSession.range(n_bins).select(
                    F.col("id").cast("int").alias("bin")
                )
            )
        )
    )
    shares = (
        slots.join(counts, ["grp", "side", "bin"], "left")
        .select(
            "grp",
            "side",
            "bin",
            (
                (F.coalesce(F.col("n"), F.lit(0)) + 0.5)
                / (F.col("tot") + 0.5 * n_bins)
            ).alias("p"),
        )
    )
    ref = shares.filter(F.col("side") == "ref").select(
        "grp", "bin", F.col("p").alias("p_ref")
    )
    cur = shares.filter(F.col("side") == "cur").select(
        "grp", "bin", F.col("p").alias("p_cur")
    )
    psi = (
        ref.join(cur, ["grp", "bin"])
        .groupBy("grp")
        .agg(
            F.round(
                F.sum(
                    (F.col("p_cur") - F.col("p_ref"))
                    * F.log(F.col("p_cur") / F.col("p_ref"))
                ),
                6,
            ).alias("psi")
        )
    )
    n_sides = totals.groupBy("grp").pivot("side", ["ref", "cur"]).sum("tot")
    return (
        psi.join(n_sides, "grp")
        .select(
            F.col("grp").alias(col_group),
            F.col("ref").alias("n_ref"),
            F.col("cur").alias("n_cur"),
            "psi",
            (F.col("psi") > alert_at).alias("drift_alert"),
        )
        .orderBy(col_group)
    )


def benford_deviation(
    df: DataFrame,
    col_amount: str,
) -> DataFrame:
    """Benford's-law audit of a monetary/measure column: observed
    first-significant-digit shares vs the Benford expectation
    log10(1 + 1/d) — the classic anomaly screen for fabricated or
    systematically-generated amounts (synthetic uniform data fails it
    loudly, which is itself the signal here).

    The first significant digit is extracted from the value's STRING
    form (first [1-9] character) — never via log10/floor arithmetic,
    whose 1-ulp boundary behavior differs across engines for values at
    powers of ten. Expected shares are transcendental constants,
    pre-rounded to 9 decimals. Output: 9 rows (digit, n, obs_share,
    exp_share, abs_dev).

    Scale shape: one scan-side string projection, one 9-row aggregate,
    shares via a window over the 9-row frame — corpus-scale work is
    exactly one aggregate."""
    from pyspark.sql.window import Window

    digits = df.select(
        F.regexp_extract(
            F.col(col_amount).cast("string"), "[1-9]", 0
        ).alias("dgt")
    ).filter(F.col("dgt") != "")
    w_all = Window.partitionBy(F.lit(1))
    exp_share = F.round(
        F.log10(1.0 + 1.0 / F.col("digit")), 9
    )
    return (
        digits.groupBy(F.col("dgt").cast("int").alias("digit"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("n_tot", F.sum("n").over(w_all))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("n_tot").cast("double"), 6).alias(
                "obs_share"
            ),
            F.round(exp_share, 6).alias("exp_share"),
            F.round(
                F.abs(
                    F.round(F.col("n") / F.col("n_tot").cast("double"), 6)
                    - F.round(exp_share, 6)
                ),
                6,
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: one
    summary row with the smallest equivalence-class size (``k_min`` —
    the dataset's actual anonymity level), class count, and how many
    rows sit in classes below ``k`` (re-identifiable under the
    k-anonymity model) — the privacy gate that runs BEFORE a
    quasi-identifier projection is released, complementing the
    row-level scrubbing of redact_pii and the deletion cascade of
    user_erasure_audit.

    Scale shape: ONE groupBy on the quasi-identifier tuple, then a
    one-row reduction over class sizes; nothing wider than the input
    shuffles, and a popular class is one reducer's count."""
    g = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("cls")
    )
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("cls").cast("bigint").alias("n_rows"),
        F.min("cls").cast("bigint").alias("k_min"),
        F.sum(F.when(F.col("cls") < k, F.col("cls")).otherwise(0))
        .cast("bigint")
        .alias("n_at_risk"),
        F.round(
            F.sum(
                F.when(F.col("cls") < k, F.col("cls")).otherwise(0)
            ).cast("double")
            / F.sum("cls"),
            6,
        ).alias("risk_fraction"),
    ).select(
        F.lit(k).cast("int").alias("k"),
        "n_classes",
        "n_rows",
        "k_min",
        "n_at_risk",
        "risk_fraction",
    )
