"""Triple-set evaluation: precision / recall / F1 vs gold (SURVEY.md A16).

The reference's evaluator computed per-label P/R/F1 on held-out annotated
documents (SURVEY.md §2C step 7, [R-MEM]); lifted here to set-based P/R over
emitted (subj, pred, obj, conv_id, turn_idx) triples against planted gold
(BASELINE.json: P/R >= 0.95).

Pure semi/anti joins + counts — one pass each, no collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["subj", "pred", "obj", "conv_id", "turn_idx"]


def evaluate_triples(pred: DataFrame, gold: DataFrame,
                     keys: list[str] | None = None) -> dict[str, float]:
    keys = keys or KEY
    p = pred.select(*keys).dropDuplicates().withColumn("in_p", F.lit(1))
    g = gold.select(*keys).dropDuplicates().withColumn("in_g", F.lit(1))
    # ONE full-outer join + one agg instead of three separate
    # semi/anti-join count() jobs (same rewrite as setops_customer_years:
    # tp/fp/fn are presence-flag sums over a single shuffle)
    row = (
        p.join(g, keys, "full_outer")
        .agg(
            F.sum(F.when(F.col("in_p").isNotNull()
                         & F.col("in_g").isNotNull(), 1).otherwise(0))
            .alias("tp"),
            F.sum(F.when(F.col("in_p").isNotNull()
                         & F.col("in_g").isNull(), 1).otherwise(0))
            .alias("fp"),
            F.sum(F.when(F.col("in_p").isNull()
                         & F.col("in_g").isNotNull(), 1).otherwise(0))
            .alias("fn"),
        )
        .collect()[0]
    )
    tp = int(row["tp"] or 0)
    fp = int(row["fp"] or 0)
    fn = int(row["fn"] or 0)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1}


SPAN_KEY = ["conv_id", "turn_idx", "span_start", "span_end", "ent_type"]


def _flag_eval(pred: DataFrame, gold: DataFrame, keys: list[str],
               group_col: str) -> DataFrame:
    """Shared per-group P/R template: full-outer join of the two deduped
    keysets with presence flags, tp/fp/fn as flag sums per ``group_col``.
    One shuffle, no driver collect."""
    p = pred.select(*keys).dropDuplicates().withColumn("in_p", F.lit(1))
    g = gold.select(*keys).dropDuplicates().withColumn("in_g", F.lit(1))
    return (
        p.join(g, keys, "full")
        .groupBy(group_col)
        .agg(
            F.sum(F.when(F.col("in_p").isNotNull()
                         & F.col("in_g").isNotNull(), 1).otherwise(0))
            .alias("tp"),
            F.sum(F.when(F.col("in_p").isNotNull()
                         & F.col("in_g").isNull(), 1).otherwise(0))
            .alias("fp"),
            F.sum(F.when(F.col("in_p").isNull()
                         & F.col("in_g").isNotNull(), 1).otherwise(0))
            .alias("fn"),
        )
        .withColumn("precision", F.col("tp") / (F.col("tp") + F.col("fp")))
        .withColumn("recall", F.col("tp") / (F.col("tp") + F.col("fn")))
    )


def per_class_span_eval(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Per-entity-class SPAN-level P/R (the reference's per-label tag
    report, SURVEY.md §2C step 7): exact-span match on
    (conv, turn, start, end, class). ``pred``/``gold`` are mentions-shaped
    DataFrames (extract_mentions output or any table carrying SPAN_KEY)."""
    return _flag_eval(pred, gold, SPAN_KEY, "ent_type")


def per_predicate_eval(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Per-predicate P/R as a DataFrame (mirrors the reference's per-label
    report)."""
    return _flag_eval(pred, gold, KEY, "pred")
