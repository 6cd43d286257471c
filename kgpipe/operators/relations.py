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

    Single-pass plan: ONE window (per-conversation lag over the explicit
    total order (turn_idx, span_start, span_end)) yields both cases —

    * intra-turn (prev mention in the SAME turn): the text strictly between
      the previous mention and this one is a predicate phrase
      -> (prev_entity, pred, entity), conf 1.0
    * cross-turn (this row is its turn's FIRST mention): the turn's prefix
      is a predicate phrase and the nearest preceding mention-bearing turn
      is within `window` -> that turn's last entity becomes the subject,
      conf 0.9 — lag(entity) at a turn's first mention IS exactly "last
      mention of the nearest prior turn", so no groupBy/self-join is needed

    — so the whole stage is one shuffle on conv_id plus one broadcast join,
    replacing the previous three-branch union (two window shuffles + a
    groupBy + a join) whose repeated subtrees also forced the caller to
    persist `linked`. Semantics are pinned by the planted-gold e2e tests
    and the streaming-parity test (the keyed-state op mirrors this logic).
    """
    preds = predicates_df(spark)

    w = Window.partitionBy("conv_id").orderBy(
        "turn_idx", "span_start", "span_end")
    m = (
        linked.select("conv_id", "turn_idx", "span_start", "span_end",
                      "entity_id", "text")
        .withColumn("prev_turn", F.lag("turn_idx").over(w))
        .withColumn("prev_end", F.lag("span_end").over(w))
        .withColumn("prev_ent", F.lag("entity_id").over(w))
    )

    intra_case = F.col("prev_turn") == F.col("turn_idx")
    cross_case = (
        F.col("prev_turn").isNotNull()
        & (F.col("prev_turn") < F.col("turn_idx"))
        & (F.col("prev_turn") >= F.col("turn_idx") - window)
    )
    between = F.col("text").substr(
        F.col("prev_end") + 1, F.col("span_start") - F.col("prev_end"))
    prefix = F.col("text").substr(F.lit(1), F.col("span_start"))

    phrased = (
        m.withColumn(
            "phrase_norm",
            F.when(intra_case, _norm(between))
             .when(cross_case, _norm(prefix)))
        .filter(F.col("phrase_norm").isNotNull())
    )
    return (
        phrased.join(F.broadcast(preds),
                     F.col("phrase_norm") == preds["phrase"], "inner")
        .select(
            F.col("prev_ent").alias("subj"),
            F.col("pred"),
            F.col("entity_id").alias("obj"),
            "conv_id",
            "turn_idx",
            F.when(intra_case, F.lit(1.0)).otherwise(F.lit(0.9))
             .cast("float").alias("conf"),
        )
    )
