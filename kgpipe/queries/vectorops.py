"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

* ``cosine_topk_bruteforce`` — the exact baseline: broadcast the (small)
  query set against all vectors, dot products via higher-order functions
  (zip_with + aggregate) — JVM-side, whole-stage-codegen'd, no Python.
* ``ann_lsh_topk`` — the scale path: sign-LSH bucket from fixed dimensions
  (a deterministic random-hyperplane surrogate), equi-join on bucket, rank
  within bucket. At 100 TB the bucket join replaces the O(N*Q) cross
  product with O(N) bucketing + per-bucket candidates.
* ``embedding_norm_stats`` — array-function surface over vectors.

Floats: cosine is rounded to 6 dp on BOTH engines before ranking, and ties
break on vec_id, so rank sets match despite summation-order ULP noise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgpipe.queries.registry import load, register

N_QUERY = 10  # vec_id < 10 are the query vectors
TOP_K = 3


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


@register(
    "embedding_norm_stats",
    oracle="""
    SELECT label,
           count(*) AS n,
           CAST(min(len(embedding)) AS INT) AS min_dim,
           round(avg(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
               AS avg_l2_norm
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size("embedding")).cast("int").alias("min_dim"),
        F.round(F.avg(_norm(F.col("embedding"))), 4).alias("avg_l2_norm"),
    )


def _dot_sql(a: str, b: str) -> str:
    """Dot product with explicit per-element DOUBLE casts (DuckDB's
    list_dot_product would accumulate float32 on FLOAT lists; Spark
    accumulates double — must match)."""
    return (
        f"list_sum(list_transform(range(1, len({a}.embedding) + 1), "
        f"i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE)))"
    )


_COS_SQL = f"""
    round({_dot_sql("q", "v")}
          / (sqrt({_dot_sql("q", "q")}) * sqrt({_dot_sql("v", "v")})), 6)
"""


@register(
    "cosine_topk_bruteforce",
    oracle=f"""
    SELECT query_id, vec_id, cosine FROM (
      SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
             {_COS_SQL} AS cosine,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_COS_SQL} DESC, v.vec_id ASC) AS rn
      FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERY}) q
      JOIN embeddings v ON v.vec_id != q.vec_id) t
    WHERE rn <= {TOP_K}
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    v = e.select("vec_id", "embedding")
    cos = F.round(
        _dot(F.col("q_emb"), F.col("embedding"))
        / (_norm(F.col("q_emb")) * _norm(F.col("embedding"))),
        6,
    )
    j = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", cos)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", "cosine")
    )


# sign-LSH bucket: parity pattern of 8 fixed, spread dimensions
_LSH_DIMS = [1, 9, 17, 25, 33, 41, 49, 57]  # 1-indexed

# Drop corpus vectors from buckets holding more than this many members
# (per table): a degenerate embedding distribution (all-positive region,
# zero-padded vectors) can funnel a large corpus fraction into ONE bucket,
# making the per-bucket candidate set unbounded — the ANN analogue of
# textops.LSH_BUCKET_CAP. In the multi-table variant the cap is per table,
# so a vector hot in one table can still be found through the others
# (standard multi-probe practice). Far above any bucket the test tables
# produce (max 15 at sf0.1), so results there are unchanged — the cap only
# bounds the worst case at scale. Enforced in plan AND oracle.
ANN_BUCKET_CAP = 256

# multi-table sign-LSH: 3 tables over DISJOINT dimension sets. One 8-bit
# table keeps only ~N/256 of the corpus per bucket and misses any neighbor
# that differs in a single signed dimension; a candidate survives if it
# collides in ANY table, so miss probability multiplies across tables
# (recall control — add tables to raise recall, bits to cut candidates).
_LSH_TABLES = [
    [1, 9, 17, 25, 33, 41, 49, 57],
    [2, 10, 18, 26, 34, 42, 50, 58],
    [5, 13, 21, 29, 37, 45, 53, 61],
]


def _bucket_spark(emb: Column, dims: list[int] | None = None) -> Column:
    bucket = F.lit(0)
    for i, d in enumerate(dims or _LSH_DIMS):
        bucket = bucket + F.when(
            F.element_at(emb, d) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return bucket.cast("int")


def _bucket_sql(alias: str, dims: list[int] | None = None) -> str:
    parts = [
        f"(CASE WHEN {alias}.embedding[{d}] > 0 THEN {1 << i} ELSE 0 END)"
        for i, d in enumerate(dims or _LSH_DIMS)
    ]
    return "CAST(" + " + ".join(parts) + " AS INT)"


@register(
    "ann_lsh_topk",
    oracle=f"""
    WITH v AS (
      SELECT e.*,
             count(*) OVER (PARTITION BY {_bucket_sql("e")}) AS bsz
      FROM embeddings e
    )
    SELECT query_id, vec_id, cosine FROM (
      SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
             {_COS_SQL} AS cosine,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_COS_SQL} DESC, v.vec_id ASC) AS rn
      FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERY}) q
      JOIN v
        ON {_bucket_sql("q")} = {_bucket_sql("v")} AND v.vec_id != q.vec_id
       AND v.bsz <= {ANN_BUCKET_CAP}) t
    WHERE rn <= {TOP_K}
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").withColumn(
        "bucket", _bucket_spark(F.col("embedding"))
    )
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket"),
    )
    # hot-bucket cap via broadcast anti-join: the bucket-size table is at
    # most 2^8 rows (bucket domain), so the corpus side never shuffles —
    # a window count here would shuffle the full wide vectors on bucket.
    hot = (e.groupBy("bucket").agg(F.count(F.lit(1)).alias("bsz"))
           .filter(F.col("bsz") > ANN_BUCKET_CAP).select("bucket"))
    v = (e.select("vec_id", "embedding", "bucket")
         .join(F.broadcast(hot), "bucket", "left_anti"))
    cos = F.round(
        _dot(F.col("q_emb"), F.col("embedding"))
        / (_norm(F.col("q_emb")) * _norm(F.col("embedding"))),
        6,
    )
    j = (
        v.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", cos)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", "cosine")
    )


_MT_MATCH = " OR ".join(
    f"({_bucket_sql('q', dims)} = {_bucket_sql('v', dims)}"
    f" AND v.bsz{t} <= {ANN_BUCKET_CAP})"
    for t, dims in enumerate(_LSH_TABLES)
)

_MT_SIZES = ", ".join(
    f"count(*) OVER (PARTITION BY {_bucket_sql('e', dims)}) AS bsz{t}"
    for t, dims in enumerate(_LSH_TABLES)
)


def _mt_candidates(e: DataFrame) -> DataFrame:
    """(query_id, vec_id) candidate pairs: per-table sign-LSH bucket
    collisions, unioned and deduped, with over-full buckets dropped PER
    TABLE (``ANN_BUCKET_CAP``). Per-table bucket sizes come from one
    explode-and-count pass over the narrow projection — (table, bucket)
    partials only, at most ``tables × 2^bits`` groups — and are applied as
    broadcast anti-joins, so the corpus side stays shuffle-free."""
    narrow = e.select(
        "vec_id",
        *[
            _bucket_spark(F.col("embedding"), dims).alias(f"b{t}")
            for t, dims in enumerate(_LSH_TABLES)
        ],
    )
    hot = (
        narrow.select(F.explode(F.array(*[
            F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("b"))
            for t in range(len(_LSH_TABLES))])).alias("tb"))
        .groupBy(F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") > ANN_BUCKET_CAP)
        .select("t", "b")
    )
    qn = narrow.filter(F.col("vec_id") < N_QUERY)
    cands = None
    for t in range(len(_LSH_TABLES)):
        probe = qn.select(
            F.col("vec_id").alias("query_id"), F.col(f"b{t}").alias("qb")
        )
        hot_t = hot.filter(F.col("t") == t).select(F.col("b").alias(f"b{t}"))
        c = (
            narrow.join(F.broadcast(hot_t), f"b{t}", "left_anti")
            .join(F.broadcast(probe), F.col(f"b{t}") == F.col("qb"))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id")
        )
        cands = c if cands is None else cands.unionByName(c)
    return cands.distinct()


@register(
    "ann_multitable_topk",
    oracle=f"""
    WITH v AS (
      SELECT e.*, {_MT_SIZES}
      FROM embeddings e
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, v.vec_id AS vec_id
      FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERY}) q
      JOIN v
        ON ({_MT_MATCH}) AND v.vec_id != q.vec_id
    )
    SELECT query_id, vec_id, cosine FROM (
      SELECT c.query_id, c.vec_id,
             {_COS_SQL} AS cosine,
             row_number() OVER (PARTITION BY c.query_id
                                ORDER BY {_COS_SQL} DESC, c.vec_id ASC) AS rn
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings v ON v.vec_id = c.vec_id) t
    WHERE rn <= {TOP_K}
    """,
)

def ann_multitable_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table sign-LSH ANN: candidate generation over 3 disjoint-dim
    hash tables (union of bucket collisions), then exact-cosine re-rank of
    the deduped candidate set — the 100-TB-credible shape:

    * candidate stage touches only a NARROW (vec_id, bucket x3) projection —
      the 64-float vectors never enter the 3-way union;
    * per table the probe set is broadcast, so candidate generation is
      shuffle-free map-side joins over the corpus scan;
    * only the surviving candidate ids shuffle (one distinct), and only
      their vectors are re-read for the exact re-rank — at scale that is
      |candidates| vector fetches instead of |corpus| dot products.

    Recall vs cosine_topk_bruteforce is pinned >= 0.9 by
    tests/test_vectorops.py; single-table ann_lsh_topk stays as the
    cheaper/lower-recall variant.
    """
    e = load(spark, sf_dir, "embeddings")
    cands = _mt_candidates(e)

    q_emb = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    j = (
        cands.join(e, "vec_id")
        .join(F.broadcast(q_emb), "query_id")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (_norm(F.col("q_emb")) * _norm(F.col("embedding"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", "cosine")
    )
