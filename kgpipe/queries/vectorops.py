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

import math

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


_ANN1_SQL = f"""
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
"""


def ann_single_table_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
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


_ANN3_SQL = f"""
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
"""


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
    tests/test_vectorops.py; single-table ann_single_table_topk stays as
    the cheaper/lower-recall variant. Both ship to the driver as the one
    registered ``ann_lsh_topk`` query (method column), so each keeps a
    full value-hash oracle inside the 50-row report window.
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


@register(
    "ann_lsh_topk",
    oracle=f"""
    SELECT 'lsh1' AS method, query_id, vec_id, cosine FROM ({_ANN1_SQL}) a
    UNION ALL
    SELECT 'lsh3' AS method, query_id, vec_id, cosine FROM ({_ANN3_SQL}) b
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both LSH ANN variants in one driver-reported result (round 4: the
    harness reports the first 50 registered queries, so same-family rows
    are consolidated): ``method='lsh1'`` = single-table sign-LSH bucket
    join, ``method='lsh3'`` = 3-table candidate union + exact re-rank.
    Each variant keeps its own full value-hash oracle branch; the recall
    and hot-bucket-cap gates drive the underlying functions directly
    (tests/test_vectorops.py)."""
    single = ann_single_table_topk(spark, sf_dir).select(
        F.lit("lsh1").alias("method"), "query_id", "vec_id", "cosine")
    multi = ann_multitable_topk(spark, sf_dir).select(
        F.lit("lsh3").alias("method"), "query_id", "vec_id", "cosine")
    return single.unionByName(multi)


# --------------------------------------------------------------------------
# embedding-cosine NEAR-DUP pairs (task brief: "embedding-cosine near-dup"
# in the dedup family). Same two-stage shape as the text near-dup pipeline
# (textops.py): sign-LSH buckets generate candidates, exact cosine
# verifies. The driver's embeddings are near-uniform (no natural near-dups
# at the 0.99 level), so — like textops._dup_corpus_spark — the corpus
# plants known near-duplicates: a copy of every vector with dimension 1
# scaled by 1.05 (id + 1000000). A pure positive scaling of one dimension
# keeps every sign bucket identical (guaranteed candidate collision) and
# cos(orig, copy) >= 0.9996 for ANY vector (minimized at
# (1+0.05t)/sqrt(1+0.1025t), t = dim-1's share of the squared norm), so
# the 0.99 threshold always recovers the planted pair and near-uniform
# random pairs (cos well under 0.9) never cross it.

COS_DUP_THRESH = 0.99

_VEC_DUP_CORPUS_SQL = """
    (SELECT vec_id, embedding FROM (
        SELECT vec_id,
               list_transform(range(1, len(embedding) + 1),
                 i -> CASE WHEN i = 1
                           THEN CAST(embedding[i] AS DOUBLE) * CAST(1.05 AS DOUBLE)
                           ELSE CAST(embedding[i] AS DOUBLE) END) AS embedding
        FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
        FROM embeddings) u)
"""


def _vec_dup_corpus_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    perturbed = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x.cast("double") * F.lit(1.05))
            .otherwise(x.cast("double")),
        ).alias("embedding"),
    )
    clean = e.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    return perturbed.unionByName(clean)


@register(
    "cosine_near_dups",
    oracle=f"""
    WITH corpus AS (SELECT * FROM {_VEC_DUP_CORPUS_SQL} c),
    b AS (
      SELECT corpus.*,
             {_bucket_sql("corpus")} AS bucket,
             count(*) OVER (PARTITION BY {_bucket_sql("corpus")}) AS bsz
      FROM corpus
    )
    SELECT q.vec_id AS vec_a, v.vec_id AS vec_b,
           {_COS_SQL} AS cosine
    FROM b q JOIN b v
      ON q.bucket = v.bucket AND q.vec_id < v.vec_id
     AND q.bsz <= {ANN_BUCKET_CAP} AND v.bsz <= {ANN_BUCKET_CAP}
    WHERE {_COS_SQL} >= {COS_DUP_THRESH}
    """,
)
def cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH bucket join (capped
    hot buckets, broadcast anti-join — corpus never shuffles for the cap),
    exact cosine >= 0.99 verify, (vec_a < vec_b) canonical pair order.

    Scale shape: identical to minhash_lsh_pairs — O(N) bucketing replaces
    the O(N^2) cross product; within-bucket pairing is bounded by
    ANN_BUCKET_CAP; the only shuffle is the bucket equi-join."""
    c = _vec_dup_corpus_spark(spark, sf_dir).withColumn(
        "bucket", _bucket_spark(F.col("embedding"))
    )
    hot = (
        c.groupBy("bucket").agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") > ANN_BUCKET_CAP).select("bucket")
    )
    c = c.join(F.broadcast(hot), "bucket", "left_anti")
    a = c.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        "bucket",
    )
    b = c.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        "bucket",
    )
    cos = F.round(
        _dot(F.col("emb_a"), F.col("emb_b"))
        / (_norm(F.col("emb_a")) * _norm(F.col("emb_b"))),
        6,
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= COS_DUP_THRESH)
        .select("vec_a", "vec_b", "cosine")
    )


# --------------------------------------------------------------------------
# IVF ANN (task brief: "an IVF or LSH-bucketed variant as the scale path").
# The LSH-bucketed variants above cover the hashing family; this is the
# inverted-file family: a coarse quantizer assigns every vector to its
# nearest of K_CELLS centroids (the inverted lists), a query probes only
# its NPROBE nearest cells, and the survivors get an exact re-rank.
#
# Centroid choice: the K lowest-id corpus vectors (deterministic "k-means
# with zero Lloyd iterations") so the oracle can replay the SEARCH
# machinery — assignment, cell pruning, probing, re-rank — exactly.
# Centroid TRAINING is the pluggable upstream step: ivf_train_centroids
# below runs distributed Lloyd iterations Spark-side and is gated by a
# separable-blobs recovery test (tests/test_vectorops.py), but its output
# feeds the same search path.

K_CELLS = 16
NPROBE = 4


def _py_norm(vec: list[float]) -> float:
    """Same operation order as _norm (left-to-right sum of squared
    doubles, then sqrt), so baking a centroid's norm as a literal is
    bit-identical to evaluating _norm over its literal array."""
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _ivf_assign(cents: list[tuple[int, list[float]]],
                nrm: Column | None = None):
    """Nearest-centroid cell id as a NARROW map over the corpus scan: the
    K centroids are literal arrays baked into the expression (the FAISS
    model — centroids are cluster-wide replicated metadata), so assignment
    is shuffle-free whole-stage-codegen'd arithmetic, never a join. Ties
    on the 6-dp rounded cosine break toward the lowest cell id via
    lexicographic struct-min over (-cos, cell).

    Two hand-hoists matter here because higher-order-function aggregates
    are interpreted (CodegenFallback) and Catalyst does not CSE across
    expressions:

    * per-row work — centroid norms are Python-computed literals and the
      row's own norm comes in as ``nrm``, a column projected ONCE in a
      parent select (CollapseProject keeps a non-cheap alias that is
      referenced K_CELLS times in its own projection). Cuts the per-row
      HOF evaluations from 3xK (dot + both norms) to K (the dots).
    * driver-side planning — the centroid matrix / cell ids / norms are
      THREE nested-array Literal nodes scored via one indexed
      ``transform``, not K_CELLS x dim separate Literals; the old form
      put ~2k expression nodes through every optimizer pass per call.
    """
    emb = F.col("embedding")
    if nrm is None:
        nrm = _norm(emb)
    cvecs = F.lit([[float(x) for x in v] for _, v in cents])
    ccells = F.lit([int(c) for c, _ in cents])
    cnorms = F.lit([_py_norm(v) for _, v in cents])

    def score(c: Column, i: Column) -> Column:
        cos = F.round(
            _dot(emb, c) / (nrm * F.element_at(cnorms, i + F.lit(1))), 6)
        return F.struct(
            (-cos).alias("nc"),
            F.element_at(ccells, i + F.lit(1)).alias("cell"))

    return F.transform(cvecs, score)


def _collect_seed_centroids(e: DataFrame) -> list[tuple[int, list[float]]]:
    rows = (
        e.filter(F.col("vec_id") >= N_QUERY)
        .orderBy("vec_id").limit(K_CELLS).collect()
    )  # K_CELLS rows only — bounded driver-side metadata, not data
    return [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows]


_IVF_COS_C = """
    round(list_sum(list_transform(range(1, len({a}.embedding) + 1),
            i -> CAST({a}.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
          / (sqrt(list_sum(list_transform({a}.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(c.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
"""


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cell, embedding FROM embeddings
      WHERE vec_id >= {N_QUERY} ORDER BY vec_id LIMIT {K_CELLS}
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_IVF_COS_C.format(a="v")} DESC,
                                           c.cell ASC) AS rn
        FROM embeddings v CROSS JOIN cent c) t
      WHERE rn = 1
    ),
    probe AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, c.cell,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_IVF_COS_C.format(a="q")} DESC,
                                           c.cell ASC) AS rn
        FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERY}) q
        CROSS JOIN cent c) t
      WHERE rn <= {NPROBE}
    )
    SELECT query_id, vec_id, cosine FROM (
      SELECT p.query_id, a.vec_id,
             {_COS_SQL} AS cosine,
             row_number() OVER (PARTITION BY p.query_id
                                ORDER BY {_COS_SQL} DESC, a.vec_id ASC) AS rn
      FROM probe p
      JOIN assign a ON a.cell = p.cell AND a.vec_id != p.query_id
      JOIN embeddings q ON q.vec_id = p.query_id
      JOIN embeddings v ON v.vec_id = a.vec_id) t
    WHERE rn <= {TOP_K}
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into K_CELLS inverted lists,
    probe each query's NPROBE nearest cells, exact-cosine re-rank.

    Scale shape: assignment and probing are narrow maps against literal
    centroids (no join, no shuffle — see _ivf_assign); the probe table is
    NPROBE x |queries| rows (broadcast); query vectors broadcast for the
    re-rank; the only shuffle is the final per-query top-k window over
    the probed cells' members (|corpus| x NPROBE / K_CELLS expected rows).
    At 100 TB the inverted lists would be written partitioned BY cell so a
    probe prunes partitions at the scan."""
    e = load(spark, sf_dir, "embeddings")
    cents = _collect_seed_centroids(e)

    # norm projected once, reused by the K_CELLS assignment dots AND the
    # final re-rank cosine (carried through the join)
    base = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    assigned = base.select(
        "vec_id", "embedding", "nrm",
        F.array_min(
            _ivf_assign(cents, nrm=F.col("nrm"))
        ).getField("cell").alias("cell"),
    )
    probes = (
        base.filter(F.col("vec_id") < N_QUERY)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.slice(
                    F.array_sort(_ivf_assign(cents, nrm=F.col("nrm"))),
                    1, NPROBE)
            ).alias("p"),
        )
        .select("query_id", F.col("p.cell").alias("cell"))
    )
    q_emb = base.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = F.round(
        _dot(F.col("q_emb"), F.col("embedding"))
        / (F.col("q_nrm") * F.col("nrm")),
        6,
    )
    j = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(q_emb), "query_id")
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


def ivf_train_centroids(
    e: DataFrame,
    seeds: list[tuple[int, list[float]]],
    iters: int = 5,
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd iterations for the IVF coarse quantizer: assign
    (narrow map vs literal centroids) -> per-(cell, dim) mean via
    posexplode + hash agg (K_CELLS x dim groups — tiny) -> collect the
    K x dim refined centroids. Cost per iteration is one corpus scan plus
    a K*dim-group aggregation; nothing wide ever shuffles. Empty cells
    keep their previous centroid (standard Lloyd practice)."""
    cents = seeds
    dim_of = {c: len(v) for c, v in cents}
    for _ in range(iters):
        # two selects, not one: a generator (posexplode) in the same select
        # as a lambda-HOF struct makes the analyzer drop the struct's field
        # aliases (col1/col2) — still one narrow chain, no shuffle
        assigned = e.select(
            "embedding", _norm(F.col("embedding")).alias("nrm")
        ).select(
            F.array_min(
                _ivf_assign(cents, nrm=F.col("nrm"))
            ).getField("cell").alias("cell"),
            "embedding",
        ).select("cell", F.posexplode("embedding").alias("pos", "x"))
        means = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "m"))
                    ),
                    lambda s: s.getField("m"),
                ).alias("centroid")
            )
            .collect()
        )  # K_CELLS rows — bounded
        new = {int(r.cell): [float(x) for x in r.centroid] for r in means}
        cents = [(c, new.get(c, v)) for c, v in cents]
        assert all(len(v) == dim_of[c] for c, v in cents)
    return cents
