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
from kgpipe.queries.vectorops import (
    N_QUERY,
    ann_multitable_topk,
    ann_single_table_topk,
)


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
    got = _pairs(ann_multitable_topk(spark, planted_dir))
    assert truth
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, recall


def test_multitable_beats_single_table(spark, planted_dir):
    truth = _pairs(QUERIES["cosine_topk_bruteforce"](spark, planted_dir))
    multi = len(truth & _pairs(
        ann_multitable_topk(spark, planted_dir))) / len(truth)
    single = len(truth & _pairs(
        ann_single_table_topk(spark, planted_dir))) / len(truth)
    assert multi >= single
    assert multi >= 0.9


@pytest.fixture(scope="module")
def hotbucket_dir(tmp_path_factory):
    """A pathological corpus: 300 vectors forced positive on every
    single-table / table-0 LSH dimension, funneling them all into ONE
    bucket (size 301 with the query > ANN_BUCKET_CAP=256). Query 0 sits in
    that bucket; everything else is kept out of it by forcing dim 0
    negative."""
    rng = np.random.default_rng(11)
    dim = 64
    t0_dims = [0, 8, 16, 24, 32, 40, 48, 56]  # 0-based _LSH_TABLES[0]

    def vec(hot: bool):
        v = rng.standard_normal(dim).astype(np.float32)
        if hot:
            v[t0_dims] = np.abs(v[t0_dims]) + 0.1
        else:
            v[0] = -abs(v[0]) - 0.1
        return v

    rows = [(0, vec(hot=True))]
    rows += [(i, vec(hot=False)) for i in range(1, 10)]
    rows += [(10 + i, vec(hot=False)) for i in range(400)]
    rows += [(10000 + i, vec(hot=True)) for i in range(300)]
    df = pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1].tolist() for r in rows],
         "label": ["x"] * len(rows)})
    d = tmp_path_factory.mktemp("hotbucket")
    df.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


def test_single_table_drops_hot_bucket(spark, hotbucket_dir):
    """The over-full bucket contributes zero candidates: query 0 (inside
    it) gets no results, and no planted vector surfaces anywhere."""
    out = ann_single_table_topk(spark, hotbucket_dir).collect()
    assert out  # other queries still served
    assert all(r.vec_id < 10000 for r in out)
    assert all(r.query_id != 0 for r in out)


def test_multitable_caps_per_table_but_keeps_other_tables(
        spark, hotbucket_dir):
    """Per-table cap: the 301-member table-0 bucket is excluded, so the
    planted set reaches query 0 only via chance collisions in tables 1/2
    (expected ~300*2/256 ≈ 2) instead of wholesale; without the cap every
    one of the 300 planted vectors would be a candidate."""
    from pyspark.sql import functions as F

    from kgpipe.queries.registry import load
    from kgpipe.queries.vectorops import _mt_candidates

    cands = _mt_candidates(load(spark, hotbucket_dir, "embeddings"))
    planted = cands.filter(
        (F.col("query_id") == 0) & (F.col("vec_id") >= 10000)).count()
    assert planted < 50, planted


def test_candidate_generation_is_narrow(spark, planted_dir):
    # the 3-way candidate union must not carry the 64-float vectors:
    # only the final re-rank joins them back
    df = ann_multitable_topk(spark, planted_dir)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN + Lloyd trainer


def test_ivf_recall_on_planted(spark, planted_dir):
    """Seed-centroid IVF (NPROBE=4 of 16 cells) must recover most planted
    near-duplicate neighbors: a dup sits ~next to its query, so both land
    in (or near) the same cell and the probe set covers it."""
    truth = _pairs(QUERIES["cosine_topk_bruteforce"](spark, planted_dir))
    got = _pairs(QUERIES["ann_ivf_topk"](spark, planted_dir))
    assert truth
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, recall


def test_ivf_assignment_is_narrow(spark, planted_dir):
    """Cell assignment must be literal-centroid arithmetic — no join, no
    shuffle — over the corpus scan (the FAISS shape)."""
    from pyspark.sql import functions as F

    from kgpipe.queries.registry import load
    from kgpipe.queries.vectorops import (
        _collect_seed_centroids, _ivf_assign)

    e = load(spark, planted_dir, "embeddings")
    cents = _collect_seed_centroids(e)
    assigned = e.select(
        F.array_min(_ivf_assign(cents)).getField("cell").alias("cell"))
    plan = assigned._jdf.queryExecution().explainString(
        assigned._sc._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "Join" not in plan
    assert "Exchange" not in plan


@pytest.fixture(scope="module")
def blobs_dir(tmp_path_factory):
    """4 well-separated gaussian blobs (cosine structure: orthogonal-ish
    means, tight noise) — Lloyd iterations from deliberately bad seeds
    must recover one centroid per blob."""
    rng = np.random.default_rng(23)
    dim, per = 64, 120
    means = np.zeros((4, dim), dtype=np.float64)
    for b in range(4):
        means[b, b * 16:(b + 1) * 16] = 5.0  # disjoint support -> orthogonal
    rows = []
    for b in range(4):
        for i in range(per):
            v = means[b] + 0.3 * rng.standard_normal(dim)
            rows.append((10 + b * per + i, v.astype(np.float32), b))
    df = pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1].tolist() for r in rows],
         "label": [r[2] for r in rows]})
    d = tmp_path_factory.mktemp("blobs")
    df.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


def test_ivf_lloyd_recovers_blobs(spark, blobs_dir):
    """Train 4 centroids from the 4 lowest-id vectors (all in blob 0 — a
    bad init) and verify Lloyd moves them onto distinct blobs: after
    training, nearest-centroid assignment must agree with blob labels for
    >= 95% of vectors, i.e. the trainer genuinely relocates centroids."""
    from pyspark.sql import functions as F

    from kgpipe.queries.registry import load
    from kgpipe.queries.vectorops import _ivf_assign, ivf_train_centroids

    e = load(spark, blobs_dir, "embeddings")
    seed_rows = e.orderBy("vec_id").limit(4).collect()
    seeds = [(int(r.vec_id), [float(x) for x in r.embedding])
             for r in seed_rows]
    trained = ivf_train_centroids(e, seeds, iters=8)

    assigned = e.select(
        "label",
        F.array_min(_ivf_assign(trained)).getField("cell").alias("cell"),
    ).toPandas()
    # each blob label must map to exactly one dominant cell, all distinct
    top_cell = assigned.groupby("label")["cell"].agg(
        lambda s: s.value_counts().index[0])
    assert len(set(top_cell)) == 4, top_cell
    purity = (
        assigned.groupby("label")["cell"]
        .agg(lambda s: s.value_counts().iloc[0] / len(s)).min())
    assert purity >= 0.95, purity


# --------------------------------------------------------------------------
# embedding-cosine near-dup pairs


def test_cosine_near_dups_recovers_exactly_planted(spark):
    """On the driver table the output must be EXACTLY the planted pairs
    (i, i+1000000): every original meets its scaled copy (guaranteed
    same-bucket, cosine >= 0.9996) and no near-uniform random pair crosses
    the 0.99 threshold."""
    sf = "/root/testdata/sf0.001"
    out = QUERIES["cosine_near_dups"](spark, sf).collect()
    n = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert len(out) == n
    assert all(r.vec_b == r.vec_a + 1000000 for r in out)
    assert all(r.cosine >= 0.999 for r in out)
