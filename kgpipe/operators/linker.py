"""Entity linking: batched scoring against a broadcast candidate dictionary
(SURVEY.md A7; BASELINE.json: "batched entity-link scoring against a
broadcast candidate dictionary").

The dictionary is small by construction (a closed alias registry), so the
join is a map-side broadcast hash join — zero shuffle on the mentions side.
Top-k ranking uses a window with a TOTAL order (score desc, entity_id asc) so
results are deterministic across partitionings (SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgpipe.schemas import CANDIDATE_DICT


def norm_surface(col: Column) -> Column:
    """lower + trim + collapse whitespace — must match dictionary-side
    normalization in the fixture generator."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def dict_to_df(spark: SparkSession, candidate_dict: pd.DataFrame) -> DataFrame:
    return spark.createDataFrame(candidate_dict, schema=CANDIDATE_DICT)


def link_entities(mentions: DataFrame, dict_df: DataFrame, k: int = 1,
                  ranked: bool = True) -> DataFrame:
    """mentions -> links: one row per (mention, candidate) with rank <= k.

    Inner join: mentions whose surface is not a known alias are dropped here
    (they carry no linkable entity). Class must agree between the labeler's
    span type and the dictionary entry.

    ``ranked=False`` skips the top-k ranking window on the MENTIONS side
    (for streaming inputs, where ranking windows are unsupported). The
    dictionary side is deduped here to one candidate per (alias, class)
    with the same total order as the ranking window — callers passing an
    already-top1 dictionary pay nothing extra (the window runs over the
    broadcast-sized dim, not the fact side, and is legal on the static side
    of a stream-static join), and a non-deduped dictionary can no longer
    silently emit duplicate top-rank links.
    """
    cand = dict_df.select(
        F.col("alias"),
        F.col("entity_id"),
        F.col("prior").cast("float").alias("prior"),
        F.col("ent_class"),
    )
    if not ranked:
        dw = Window.partitionBy("alias", "ent_class").orderBy(
            F.col("prior").desc(), F.col("entity_id").asc()
        )
        cand = (cand.withColumn("_r", F.row_number().over(dw))
                .filter(F.col("_r") == 1).drop("_r"))
    m = mentions.withColumn("norm_surface", norm_surface(F.col("surface")))
    j = m.join(
        F.broadcast(cand),
        (m["norm_surface"] == cand["alias"])
        & (m["ent_type"] == cand["ent_class"]),
        "inner",
    )
    # exact alias match -> string-sim 1.0; link score = prior * 1.0
    j = j.withColumn("link_score", F.col("prior"))
    if not ranked:
        return j.withColumn("rank", F.lit(1)).drop("alias", "ent_class", "prior")
    w = Window.partitionBy("mention_id").orderBy(
        F.col("link_score").desc(), F.col("entity_id").asc()
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("alias", "ent_class", "prior")
    )


def top1_dict(candidate_dict: pd.DataFrame) -> pd.DataFrame:
    """Dedupe the candidate dictionary to its best candidate per
    (alias, ent_class) using the SAME total order as the ranking window
    (score desc, entity_id asc).

    With a top-1-deduped dictionary, k=1 linking needs no ranking window at
    all — the broadcast join is map-side and the mentions side never
    shuffles. This is the difference between a full shuffle of every
    mention row (with its text payload) and zero shuffle, which is what
    makes the linking stage scale linearly with cores; the ranked path
    remains for k>1.
    """
    return (candidate_dict
            .sort_values(["prior", "entity_id"], ascending=[False, True],
                         kind="mergesort")
            .drop_duplicates(["alias", "ent_class"], keep="first")
            .reset_index(drop=True))
