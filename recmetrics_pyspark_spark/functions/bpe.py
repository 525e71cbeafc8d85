"""Distributed byte-pair-encoding (BPE) merge training — the
tokenizer-training step of an LLM data pipeline, run entirely as
DataFrame plans.

Classic BPE (Sennrich et al. 2016) trains on the WORD-FREQUENCY table,
not the corpus: the corpus shuffles once (word counts), then every
merge round is vocabulary-scale — pair counting is an explode+groupBy
over the symbolized vocabulary weighted by word count, the winning
pair is a one-row broadcast, and the merge application is a pure
array expression (greedy leftmost non-overlapping, the real BPE scan,
via a match/run-parity/emit construction — no sequential fold, no
Python). That cost model is exactly what makes BPE trainable over
100 TB: rounds never touch the corpus again.

The greedy-scan selection is computed positionally: a matched pair at
position i is merged iff the run of consecutive matches ending at i
has odd length (equivalent to scanning left-to-right and skipping the
symbol consumed by the previous merge). The DuckDB oracle replays the
identical expressions with list_* functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# match mask over adjacent symbol pairs (empty for 1-symbol words)
_M_EXPR = """
CASE WHEN size(syms) < 2 THEN array() ELSE
  transform(sequence(0, size(syms) - 2), i ->
    element_at(syms, i + 1) = pa AND element_at(syms, i + 2) = pb)
END
"""

# greedy non-overlap selection: matched AND trailing-match-run parity
# is odd (run start found via the last unmatched position before i)
_SEL_EXPR = """
CASE WHEN size(syms) < 2 THEN array() ELSE
  transform(sequence(0, size(syms) - 2), i ->
    element_at(m, i + 1) AND
    ((i - (CASE WHEN i = 0 THEN -1 ELSE
       coalesce(array_max(filter(sequence(0, i - 1),
         j -> NOT element_at(m, j + 1))), -1) END)) % 2 = 1))
END
"""

# emit: merged token where selected, nothing where consumed by the
# previous position's merge, the original symbol otherwise
_MERGE_EXPR = """
CASE WHEN size(syms) < 2 THEN syms ELSE
  flatten(transform(sequence(0, size(syms) - 1), i ->
    CASE
      WHEN i <= size(syms) - 2
           AND element_at(sel, i + 1) THEN array(concat(pa, pb))
      WHEN i >= 1 AND element_at(sel, i) THEN array()
      ELSE array(element_at(syms, i + 1))
    END))
END
"""


def bpe_train(
    df: DataFrame,
    col_text: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a text corpus. Returns the
    merge table (round, pair_a, pair_b, pair_count) — the artifact a
    tokenizer ships.

    Per round: one vocabulary-scale pair aggregate, a deterministic
    argmax (count desc, then lexicographic pair), one broadcast, one
    scan-local merge application. ``localCheckpoint`` truncates the
    per-round lineage (the iterative-operator rule; plans otherwise
    nest a crossJoin + three array projections per round). If the
    vocabulary runs out of adjacent pairs early, later rounds emit no
    row — callers read the actual rounds learned from the output."""
    words = (
        df.select(F.explode(F.split(F.col(col_text), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    syms = words.select(
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("syms"),
        "cnt",
    ).localCheckpoint(eager=True)
    picks = []
    for r in range(1, n_merges + 1):
        pairs = (
            syms.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2), i ->"
                        " struct(element_at(syms, i + 1) AS a,"
                        "        element_at(syms, i + 2) AS b))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").cast("bigint").alias("pair_count"))
        )
        best = (
            pairs.orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select(
                F.col("a").alias("pa"),
                F.col("b").alias("pb"),
                "pair_count",
            )
            .localCheckpoint(eager=True)
        )
        picks.append(
            best.select(
                F.lit(r).cast("int").alias("round"),
                F.col("pa").alias("pair_a"),
                F.col("pb").alias("pair_b"),
                "pair_count",
            )
        )
        syms = (
            syms.crossJoin(F.broadcast(best.select("pa", "pb")))
            .withColumn("m", F.expr(_M_EXPR))
            .withColumn("sel", F.expr(_SEL_EXPR))
            .select(F.expr(_MERGE_EXPR).alias("syms"), "cnt")
            .localCheckpoint(eager=True)
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def bpe_apply(
    df: DataFrame,
    merges: DataFrame,
    col_id: str = "doc_id",
    col_text: str = "text",
) -> DataFrame:
    """Tokenize text with a learned merge table: re-run the merge
    applications in round order over each document's words (merges
    never cross word boundaries — the standard BPE contract). The
    merge table is tiny (n_merges rows) — it collects to the driver
    once and unrolls into n_merges scan-local projections, so
    tokenization shuffles NOTHING beyond the one word re-group: a
    pure map over the corpus plus one doc-keyed aggregate.

    Output: (id, tokens array, n_tokens) per input row."""
    ordered = [
        (r["pair_a"], r["pair_b"])
        for r in sorted(merges.collect(), key=lambda x: x["round"])
    ]
    cur = (
        df.select(
            F.col(col_id).alias("__id"),
            F.posexplode(F.split(F.col(col_text), " ")).alias(
                "__pos", "w"
            ),
        )
        .filter(F.length("w") > 0)
        .select(
            "__id",
            "__pos",
            F.expr(
                "transform(sequence(1, length(w)),"
                " i -> substring(w, i, 1))"
            ).alias("syms"),
        )
    )
    for pa, pb in ordered:
        cur = (
            cur.withColumn("pa", F.lit(pa))
            .withColumn("pb", F.lit(pb))
            .withColumn("m", F.expr(_M_EXPR))
            .withColumn("sel", F.expr(_SEL_EXPR))
            .select("__id", "__pos", F.expr(_MERGE_EXPR).alias("syms"))
        )
    return (
        cur.groupBy("__id")
        .agg(
            F.flatten(
                F.expr("transform(sort_array(collect_list("
                       "struct(__pos, syms))), p -> p.syms)")
            ).alias("tokens")
        )
        .select(
            F.col("__id").alias(col_id),
            "tokens",
            F.size("tokens").cast("bigint").alias("n_tokens"),
        )
    )
