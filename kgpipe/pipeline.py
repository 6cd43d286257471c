"""End-to-end KG-construction pipeline (BASELINE.json north_rule).

scan -> stable order -> CRF-style labeling (Arrow UDF) -> mention explode ->
broadcast entity linking -> turn-window triple extraction (window functions)
-> similarity-join + connected-components canonicalization -> triples.

Every stage is a DataFrame-in/DataFrame-out function so stages can be
checkpointed and resumed independently (operators/checkpoint.py).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgpipe.operators.canon import build_canon_map, canonicalize
from kgpipe.operators.labeler import label_transcripts
from kgpipe.operators.linker import dict_to_df, link_entities
from kgpipe.operators.mentions import extract_mentions
from kgpipe.operators.relations import extract_triples
from kgpipe.schemas import TRANSCRIPTS


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """A1 scan: schema-enforced read; column pruning/pushdown via Catalyst."""
    return spark.read.schema(TRANSCRIPTS).parquet(path)


def salt(df: DataFrame, n_salts: int = 8) -> DataFrame:
    """A2: split hot conversations across tasks for grouped stages
    (BASELINE.json: "salted by conv_id to tame skew")."""
    return df.withColumn(
        "salt", F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n_salts))
    )


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    candidate_dict: pd.DataFrame,
    window: int = 3,
    cc_algo: str = "two_phase",
) -> dict[str, DataFrame]:
    """Run all stages; returns the intermediate + final DataFrames (lazy)."""
    labeled = label_transcripts(spark, transcripts, candidate_dict)
    mentions = extract_mentions(labeled)
    dict_df = dict_to_df(spark, candidate_dict)
    linked = link_entities(mentions, dict_df, k=1)
    raw_triples = extract_triples(spark, linked, window=window)
    canon_map = build_canon_map(dict_df, algo=cc_algo)
    triples = canonicalize(raw_triples, canon_map)
    return {
        "labeled": labeled,
        "mentions": mentions,
        "linked": linked,
        "raw_triples": raw_triples,
        "canon_map": canon_map,
        "triples": triples,
    }


def run_from_dir(spark: SparkSession, fixture_dir: str,
                 window: int = 3) -> dict[str, DataFrame]:
    """Run the pipeline over a fixture directory (transcripts.parquet +
    candidate_dict.parquet [+ gold_triples.parquet])."""
    transcripts = read_transcripts(
        spark, os.path.join(fixture_dir, "transcripts.parquet"))
    candidate_dict = pd.read_parquet(
        os.path.join(fixture_dir, "candidate_dict.parquet"))
    out = run_pipeline(spark, transcripts, candidate_dict, window=window)
    gold_path = os.path.join(fixture_dir, "gold_triples.parquet")
    if os.path.exists(gold_path):
        out["gold"] = spark.read.parquet(gold_path)
    return out
