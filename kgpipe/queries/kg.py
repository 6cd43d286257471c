"""KG-pipeline queries for the driver surface (rows-only checks: the full
extraction pipeline — Viterbi labeling, linking, canonicalization — is not
SQL-expressible; its correctness gate is the planted-gold P/R pytest suite
plus these deterministic row-level outputs).

The transcripts fixture is generated deterministically per scale and cached;
``sf_dir`` maps onto the matching fixture scale so the driver's sf0.01 run
uses the sf0.01-sized corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgpipe.fixtures.generator import materialize
from kgpipe.queries.registry import register

_CACHE: dict[tuple[str, str], DataFrame] = {}


def _scale_for(sf_dir: str) -> str:
    for s in ("sf0.001", "sf0.01", "sf0.1"):
        if s in sf_dir:
            return s
    return "unit"


def _triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark), _scale_for(sf_dir))
    if key not in _CACHE:
        from kgpipe.pipeline import run_from_dir

        fixture = materialize(_scale_for(sf_dir))
        out = run_from_dir(spark, fixture)
        _CACHE[key] = out["triples"].cache()
        _CACHE[(id(spark), _scale_for(sf_dir), "gold")] = out["gold"]
        # cache mentions too: without it kg_mentions_by_class re-runs the
        # full Arrow-UDF labeling pass (measured 5.6s vs 0.26s at sf0.1)
        _CACHE[(id(spark), _scale_for(sf_dir), "mentions")] = (
            out["mentions"].cache()
        )
    return _CACHE[key]


@register("kg_triples")
def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _triples(spark, sf_dir).select(
        "subj", "pred", "obj", "conv_id", "turn_idx")


@register("kg_top_predicates")
def kg_top_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _triples(spark, sf_dir)
        .groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.countDistinct("subj").alias("n_subjects"),
            F.countDistinct("obj").alias("n_objects"),
        )
    )


@register("kg_mentions_by_class")
def kg_mentions_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    _triples(spark, sf_dir)  # ensure cache populated
    m = _CACHE[(id(spark), _scale_for(sf_dir), "mentions")]
    return m.groupBy("ent_type").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct("surface").alias("n_surfaces"),
    )


@register("kg_span_eval_per_class")
def kg_span_eval_per_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity-class span-level P/R of the TRAINED labeler (averaged
    structured perceptron, operators/train.py) against the dictionary
    auto-annotations, on the fixture corpus. Rows-only in the driver check
    (model inference is not SQL-expressible); the >=0.95 bar itself is
    pinned by tests/test_train.py."""
    import os

    import pandas as pd

    from kgpipe.operators.evaluate import per_class_span_eval
    from kgpipe.operators.mentions import extract_mentions
    from kgpipe.operators.train import (
        fit_perceptron,
        label_transcripts_trained,
        sample_texts,
    )
    from kgpipe.pipeline import read_transcripts

    fixture = materialize(_scale_for(sf_dir))
    cd = pd.read_parquet(os.path.join(fixture, "candidate_dict.parquet"))
    tpath = os.path.join(fixture, "transcripts.parquet")
    t = read_transcripts(spark, tpath)
    key = (id(spark), _scale_for(sf_dir), "model")
    if key not in _CACHE:
        # fit driver-side on a bounded sample (training cost must not grow
        # with corpus size); weights broadcast for cluster-wide inference
        _CACHE[key] = fit_perceptron(sample_texts(tpath, 2000), cd)
    model = _CACHE[key]
    pred_m = extract_mentions(label_transcripts_trained(spark, t, model, cd))
    # the silver side IS the pipeline's cached mentions (same fixture, same
    # gazetteer labeler) — reuse it instead of a second labeling pass
    _triples(spark, sf_dir)
    gold_m = _CACHE[(id(spark), _scale_for(sf_dir), "mentions")]
    return per_class_span_eval(pred_m, gold_m).select(
        "ent_type", "tp", "fp", "fn",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
    )


@register("kg_eval_metrics")
def kg_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kgpipe.operators.evaluate import evaluate_triples

    t = _triples(spark, sf_dir)
    g = _CACHE[(id(spark), _scale_for(sf_dir), "gold")]
    m = evaluate_triples(t, g)
    return spark.createDataFrame(
        [(m["tp"], m["fp"], m["fn"],
          round(m["precision"], 6), round(m["recall"], 6))],
        "tp long, fp long, fn long, precision double, recall double",
    )
