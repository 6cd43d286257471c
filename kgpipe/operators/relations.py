"""Relation / triple extraction per turn-window (SURVEY.md A8/A9).

The reference emitted structured fields per document by pairing labeled
spans with pattern phrases (SURVEY.md §2C step 6); lifted to triples per
BASELINE.json. The graft expresses the whole stage with **window functions
and broadcast joins — zero Python** in the hot path:

* intra-turn: consecutive linked mentions (ordered by span_start) whose
  between-text normalizes to a predicate phrase -> (prev_entity, pred, entity)
* cross-turn (the turn-window case): a turn that OPENS with a predicate
  phrase followed by a mention has a dangling subject; it resolves to the
  most recent mention in the preceding ``window`` turns of the same
  conversation (Window.orderBy(turn_idx).rangeBetween(-window, -1)).

Ordering is always explicit on (conv_id, turn_idx, span_start) — never
partition/task order (BASELINE.json per-row invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgpipe.fixtures.generator import PRED_PHRASES


def predicates_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(phrase, pred) for phrase, pred in PRED_PHRASES.items()],
        "phrase string, pred string",
    )


def _norm(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def extract_triples(spark: SparkSession, linked: DataFrame,
                    window: int = 3) -> DataFrame:
    """linked mentions (with text col) -> raw triples.

    Returns (subj, pred, obj, conv_id, turn_idx, conf). Entity ids are
    pre-canonicalization (may include ``~v1`` variants).
    """
    preds = predicates_df(spark)

    w_turn = Window.partitionBy("conv_id", "turn_idx").orderBy(
        "span_start", "span_end")
    m = linked.select("conv_id", "turn_idx", "span_start", "span_end",
                      "entity_id", "text")
    m = (
        m.withColumn("prev_end", F.lag("span_end").over(w_turn))
        .withColumn("prev_ent", F.lag("entity_id").over(w_turn))
    )

    # intra-turn: text strictly between the previous mention and this one
    between = F.col("text").substr(
        F.col("prev_end") + 1, F.col("span_start") - F.col("prev_end"))
    intra = (
        m.filter(F.col("prev_end").isNotNull())
        .withColumn("phrase_norm", _norm(between))
        .join(F.broadcast(preds), F.col("phrase_norm") == preds["phrase"], "inner")
        .select(
            F.col("prev_ent").alias("subj"),
            F.col("pred"),
            F.col("entity_id").alias("obj"),
            "conv_id",
            "turn_idx",
            F.lit(1.0).cast("float").alias("conf"),
        )
    )

    # cross-turn: first mention of a turn whose prefix IS a predicate phrase
    dangling = (
        m.filter(F.col("prev_end").isNull())
        .withColumn("prefix_norm",
                    _norm(F.col("text").substr(F.lit(1), F.col("span_start"))))
        .join(F.broadcast(preds), F.col("prefix_norm") == preds["phrase"], "inner")
        .select("conv_id", "turn_idx", "pred",
                F.col("entity_id").alias("obj"))
    )

    # subject = entity of the last mention in the preceding `window` turns.
    # Shuffles once on conv_id; the range frame rides the same sort.
    turn_last = linked.groupBy("conv_id", "turn_idx").agg(
        F.max_by("entity_id", F.struct("span_start", "span_end")).alias("last_ent")
    )
    w_conv = (
        Window.partitionBy("conv_id").orderBy("turn_idx")
        .rangeBetween(-window, -1)
    )
    turn_ctx = turn_last.withColumn(
        "win_subj", F.last("last_ent", ignorenulls=True).over(w_conv)
    ).select("conv_id", "turn_idx", "win_subj")

    cross = (
        dangling.join(turn_ctx, ["conv_id", "turn_idx"], "inner")
        .filter(F.col("win_subj").isNotNull())
        .select(
            F.col("win_subj").alias("subj"),
            "pred",
            "obj",
            "conv_id",
            "turn_idx",
            F.lit(0.9).cast("float").alias("conf"),
        )
    )

    return intra.unionByName(cross)
