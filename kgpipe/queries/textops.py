"""Large-scale training-data text operators over the ``documents`` table:
exact dedup, MinHash-LSH near-dup, n-gram Jaccard, SimHash, token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Cross-engine trick used throughout: a *portable* 48-bit hash
``h(s) = CAST(hex_prefix_12(md5(s)) AS BIGINT)`` computes identically in
Spark (``conv(substring(md5(s),1,12),16,10)``) and DuckDB
(``CAST('0x' || substring(md5(s),1,12) AS BIGINT)``), so even MinHash
signatures and LSH bucket assignments are oracle-verifiable exactly —
engine-native hashes (xxhash64 etc.) never appear in compared output.
48 bits (not 64) so ``h * a + b`` with a < 2^13 stays inside BIGINT under
Spark's ANSI overflow checking.

Scale notes: every operator is a scan + narrow maps + one aggregation; the
LSH join shuffles on (band, bucket) — bounded fan-out because bucket keys
are hashes, and AQE skew-join covers hot buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgpipe.queries.registry import load, register

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "on", "is"]

# MinHash parameters: k permutations via (a_i * h + b_i) mod p over the
# portable 48-bit hash. Fixed primes a_i < 2^13 keep h*a+b < 2^62 (no BIGINT
# overflow in either engine). Deterministic across engines.
MINHASH_P = 2305843009213693951  # 2^61 - 1 (Mersenne prime)
MINHASH_AB = [(2387, 268439), (3947, 524309), (5273, 786451), (6863, 1048583),
              (1409, 131101), (2741, 262147), (4391, 393241), (7211, 655373)]
LSH_BANDS = 4  # 4 bands x 2 rows
# Drop LSH buckets holding more than this many docs: within-bucket pairing
# is quadratic, and on boilerplate-heavy corpora a single bucket can hold
# every copy of a template. Standard LSH practice; far above any bucket
# size the synthetic dup corpus produces, so the cap never changes test
# results — it only bounds the worst case at scale.
LSH_BUCKET_CAP = 64


def portable_hash_spark(col: Column) -> Column:
    """48-bit md5-prefix hash — bit-identical to the DuckDB expression."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def portable_hash_sql(expr: str) -> str:
    return f"CAST(CONCAT('0x', substring(md5({expr}), 1, 12)) AS BIGINT)"


def _dup_corpus_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a copy with shifted ids: a corpus where every text is
    duplicated exactly once (the driver tables are dup-free by construction,
    so dedup operators need a corpus with known duplicates)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    copy = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang", "source"
    )
    return d.unionByName(copy)


_DUP_CORPUS_SQL = """
    (SELECT doc_id, text, lang, source FROM documents
     UNION ALL
     SELECT doc_id + 1000000 AS doc_id, text, lang, source FROM documents)
"""


# --------------------------------------------------------------------------
# exact dedup: hash-groupBy, keep min doc_id


@register(
    "dedup_exact",
    oracle=f"""
    SELECT md5(text) AS text_md5,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           count(*) AS n_copies
    FROM {_DUP_CORPUS_SQL} corpus
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _dup_corpus_spark(spark, sf_dir)
    return corpus.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").cast("long").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# --------------------------------------------------------------------------
# token counting


@register(
    "token_counts",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok).cast("long").alias("total_tokens"),
        F.round(F.avg(ntok), 4).alias("avg_tokens"),
    )


# --------------------------------------------------------------------------
# quality scoring: stopword ratio, mean word length, composite score


@register(
    "quality_scores",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           round(avg(CAST(len(list_filter(string_split(text, ' '),
                w -> w IN ({",".join("'" + w + "'" for w in STOPWORDS)}))) AS DOUBLE)
                / len(string_split(text, ' '))), 4) AS avg_stopword_ratio,
           round(avg(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                / len(string_split(text, ' '))), 4) AS avg_word_len
    FROM documents
    GROUP BY source
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    ratio = n_stop.cast("double") / F.size(toks)
    word_len = (
        F.length(F.regexp_replace("text", " ", "")).cast("double") / F.size(toks)
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(ratio), 4).alias("avg_stopword_ratio"),
        F.round(F.avg(word_len), 4).alias("avg_word_len"),
    )


# --------------------------------------------------------------------------
# language-ID heuristic: stopword-hit-count argmax over tiny per-language
# stopword lists (deterministic; SQL-expressible with CASE)

LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
}


def _lang_hits_sql(lang: str) -> str:
    ws = ",".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({ws})))"


@register(
    "langid_heuristic",
    oracle=f"""
    SELECT predicted_lang, count(*) AS n_docs
    FROM (
      SELECT CASE
        WHEN {_lang_hits_sql("en")} >= {_lang_hits_sql("es")}
         AND {_lang_hits_sql("en")} >= {_lang_hits_sql("de")}
         AND {_lang_hits_sql("en")} >= {_lang_hits_sql("fr")}
         AND {_lang_hits_sql("en")} > 0 THEN 'en'
        WHEN {_lang_hits_sql("es")} >= {_lang_hits_sql("de")}
         AND {_lang_hits_sql("es")} >= {_lang_hits_sql("fr")}
         AND {_lang_hits_sql("es")} > 0 THEN 'es'
        WHEN {_lang_hits_sql("de")} >= {_lang_hits_sql("fr")}
         AND {_lang_hits_sql("de")} > 0 THEN 'de'
        WHEN {_lang_hits_sql("fr")} > 0 THEN 'fr'
        ELSE 'unknown' END AS predicted_lang
      FROM documents) t
    GROUP BY predicted_lang
    """,
)
def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def hits(lang: str) -> Column:
        arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))

    en, es, de, fr = hits("en"), hits("es"), hits("de"), hits("fr")
    pred = (
        F.when((en >= es) & (en >= de) & (en >= fr) & (en > 0), "en")
        .when((es >= de) & (es >= fr) & (es > 0), "es")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    )
    return d.select(pred.alias("predicted_lang")).groupBy("predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# --------------------------------------------------------------------------
# 3-gram shingles (the MinHash input) — built with higher-order array
# functions, no explode shuffle


def _shingles_spark(toks: Column) -> Column:
    """array of 3-token shingle strings (empty when < 3 tokens).

    Guarded with ``when(n >= 3)``: Spark's sequence(0, n-3) would produce a
    DESCENDING sequence for n < 3 instead of an empty array.
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - 3)
    built = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2),
            F.element_at(toks, i + 3)
        ),
    )
    return F.when(n >= 3, built).otherwise(
        F.array().cast("array<string>"))


_SHINGLES_SQL = """
    list_transform(range(1, greatest(len(string_split(text,' ')) - 2, 0) + 1),
      i -> concat_ws(' ', string_split(text,' ')[i],
                          string_split(text,' ')[i+1],
                          string_split(text,' ')[i+2]))
"""


@register(
    "shingle_stats",
    oracle=f"""
    SELECT lang,
           CAST(sum(len(list_distinct({_SHINGLES_SQL}))) AS BIGINT)
               AS total_distinct_shingles,
           round(avg(len(list_distinct({_SHINGLES_SQL}))), 4)
               AS avg_distinct_shingles
    FROM documents
    GROUP BY lang
    """,
)
def shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = F.array_distinct(_shingles_spark(F.split("text", " ")))
    return d.groupBy("lang").agg(
        F.sum(F.size(sh)).cast("long").alias("total_distinct_shingles"),
        F.round(F.avg(F.size(sh)), 4).alias("avg_distinct_shingles"),
    )


# --------------------------------------------------------------------------
# MinHash signatures — exact cross-engine via the portable hash


def _minhash_struct_spark(toks: Column) -> Column:
    """All 8 minhash minima in ONE fold over the hashed-shingle array.

    The round-1 form emitted 8 separate ``array_min(transform(...))``
    columns; Catalyst does no CSE across higher-order expressions, so each
    column re-derived the shingle+md5 array — 8 md5 passes per row
    (measured 3.2s vs 0.5s for this fold at sf0.1). Here the hash array
    appears exactly once and the accumulator struct carries all 8 running
    minima. Fold-least == array_min because the >=3-token filter guarantees
    a non-empty array and (x*a+b) % P < P (the init sentinel).
    """
    sh = F.array_distinct(_shingles_spark(toks))
    h = F.transform(sh, portable_hash_spark)
    init = F.struct(
        *[F.lit(MINHASH_P).cast("long").alias(f"mh{i}")
          for i in range(len(MINHASH_AB))]
    )

    def merge(acc: Column, x: Column) -> Column:
        return F.struct(
            *[
                F.least(acc[f"mh{i}"], (x * a + b) % MINHASH_P).alias(f"mh{i}")
                for i, (a, b) in enumerate(MINHASH_AB)
            ]
        )

    return F.aggregate(h, init, merge)


def _minhash_cols_spark(toks: Column) -> list[Column]:
    m = _minhash_struct_spark(toks)
    return [m.getField(f"mh{i}").alias(f"mh{i}")
            for i in range(len(MINHASH_AB))]


def _minhash_sql_exprs() -> list[str]:
    hs = (
        f"list_transform(list_distinct({_SHINGLES_SQL}), "
        f"s -> {portable_hash_sql('s')})"
    )
    return [
        f"list_min(list_transform({hs}, x -> (x * {a} + {b}) % {MINHASH_P}))"
        f" AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    ]


@register(
    "minhash_signatures",
    oracle=f"""
    SELECT doc_id, {", ".join(_minhash_sql_exprs())}
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3
    """,
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.filter(F.size(toks) >= 3).select("doc_id", *_minhash_cols_spark(toks))


# --------------------------------------------------------------------------
# MinHash-LSH near-duplicate candidate pairs: band the signature, bucket-join


# Shared CTE chain: portable MinHash signatures over the dup corpus ->
# banded buckets -> size-capped candidate pairs. Used verbatim by both the
# LSH-pairs oracle and the Jaccard-verify oracle so the two stages agree.
def _lsh_cand_ctes() -> str:
    return f"""
    sigs AS (
      SELECT doc_id, {", ".join(_minhash_sql_exprs())}
      FROM {_DUP_CORPUS_SQL} corpus
      WHERE len(string_split(text, ' ')) >= 3
    ),
    bands AS (
      SELECT doc_id, 0 AS band, md5(concat_ws(',', mh0, mh1)) AS bucket FROM sigs
      UNION ALL
      SELECT doc_id, 1, md5(concat_ws(',', mh2, mh3)) FROM sigs
      UNION ALL
      SELECT doc_id, 2, md5(concat_ws(',', mh4, mh5)) FROM sigs
      UNION ALL
      SELECT doc_id, 3, md5(concat_ws(',', mh6, mh7)) FROM sigs
    ),
    sized AS (
      SELECT doc_id, band, bucket,
             count(*) OVER (PARTITION BY band, bucket) AS bsz
      FROM bands
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(DISTINCT a.band) AS n_bands
      FROM sized a JOIN sized b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      WHERE a.bsz <= {LSH_BUCKET_CAP}
      GROUP BY a.doc_id, b.doc_id
    )"""


@register(
    "minhash_lsh_pairs",
    oracle=f"""
    WITH {_lsh_cand_ctes()}
    SELECT doc_a, doc_b, n_bands FROM cand
    """,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _dup_corpus_spark(spark, sf_dir)
    toks = F.split("text", " ")
    # Materialize signatures ONCE. Without this the plan recomputes the
    # shingle+8-minhash HOF chain 8x (4 band branches x 2 self-join sides) —
    # measured 26s -> the checkpointed form at sf0.1. At 100 TB a real
    # pipeline would write sigs to a table between stages; localCheckpoint
    # is the in-session equivalent (executor-local MEMORY_AND_DISK blocks).
    # NOTE (measured, sf0.1, round 1): the "obvious" one-pass alternative —
    # explode an inline array of (band, bucket) structs — was 3x slower
    # than the banded union because project-collapse re-inlined the HOFs;
    # checkpointing removes the recomputation a different way and keeps the
    # union's column pruning.
    sigs = (
        corpus.filter(F.size(toks) >= 3)
        .select("doc_id", *_minhash_cols_spark(toks))
        .localCheckpoint()
    )
    bands = None
    for band in range(LSH_BANDS):
        c0, c1 = f"mh{2 * band}", f"mh{2 * band + 1}"
        b = sigs.select(
            "doc_id",
            F.lit(band).alias("band"),
            F.md5(F.concat_ws(",", c0, c1)).alias("bucket"),
        )
        bands = b if bands is None else bands.unionByName(b)
    # Bucket-size cap: the count window shuffles on exactly the join key
    # (band, bucket), so the self-join below reuses that exchange
    # (ReusedExchange) instead of shuffling twice more.
    w = Window.partitionBy("band", "bucket")
    sized = bands.withColumn("bsz", F.count(F.lit(1)).over(w))
    a = sized.filter(F.col("bsz") <= LSH_BUCKET_CAP).alias("a")
    b = sized.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.countDistinct("a.band").alias("n_bands"))
    )


# --------------------------------------------------------------------------
# n-gram Jaccard similarity on LSH candidates (verification stage of the
# near-dup pipeline): exact set Jaccard over distinct shingles


@register(
    "ngram_jaccard_dups",
    oracle=f"""
    WITH {_lsh_cand_ctes()},
    sh AS (
      SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS s
      FROM {_DUP_CORPUS_SQL} corpus
      WHERE len(string_split(text, ' ')) >= 3
    )
    SELECT c.doc_a, c.doc_b,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
    """,
)
def ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard verification of the LSH candidate pairs — the second
    stage of the real near-dup pipeline (LSH proposes, Jaccard disposes).
    Round 1 joined on the synthetic ``doc_id + 1000000`` pairing, which
    verified only the planted duplicates; consuming ``minhash_lsh_pairs``
    output makes this a generic operator: any candidate source works.
    """
    cand = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    corpus = _dup_corpus_spark(spark, sf_dir)
    toks = F.split("text", " ")
    sh = corpus.filter(F.size(toks) >= 3).select(
        "doc_id", F.array_distinct(_shingles_spark(toks)).alias("s")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    union = F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    jac = inter.cast("double") / union
    return (
        cand.join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(b, F.col("doc_b") == F.col("b.doc_id"))
        .filter(jac >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            F.round(jac, 4).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# SimHash (64-bit via 2x32 halves of the portable hash) — per-doc fingerprint


@register(
    "simhash_fingerprints",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    th AS (SELECT doc_id, {portable_hash_sql("w")} AS h FROM tok),
    bits AS (
      SELECT doc_id, b.bit,
             sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM th CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) b
      GROUP BY doc_id, b.bit)
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT)
               AS simhash32
    FROM bits GROUP BY doc_id
    """,
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    h = F.transform(
        toks, portable_hash_spark
    )
    bit_cols = []
    for bit in range(32):
        vote = F.aggregate(
            h,
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.when(x.bitwiseAND(F.lit(1 << bit)) != 0, 1).otherwise(-1),
        )
        bit_cols.append(
            F.when(vote > 0, F.lit(1 << bit).cast("long")).otherwise(F.lit(0))
        )
    simhash = bit_cols[0]
    for c in bit_cols[1:]:
        simhash = simhash + c
    return d.select("doc_id", simhash.cast("long").alias("simhash32"))


# --------------------------------------------------------------------------
# rolling-hash document fingerprint (position-sensitive, portable)


@register(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id,
           CAST(list_sum(list_transform(
                  range(1, len(string_split(text, ' ')) + 1),
                  i -> (i * 1315423911 +
                        {portable_hash_sql("string_split(text, ' ')[i]")})
                       % {MINHASH_P}))
                % {MINHASH_P} AS BIGINT) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.size(toks))
    terms = F.zip_with(
        idx,
        toks,
        lambda i, w: (
            i.cast("long") * 1315423911
            + portable_hash_spark(w)
        )
        % MINHASH_P,
    )
    fp = F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, x: (acc + x) % MINHASH_P
    )
    return d.select("doc_id", fp.cast("long").alias("fingerprint"))


# --------------------------------------------------------------------------
# canonical-document selection: after dedup finds groups, a training
# pipeline keeps ONE representative per group — the highest-quality copy,
# not an arbitrary one


@register(
    "dedup_keep_best",
    oracle=f"""
    SELECT text_md5, keep_id, n_copies FROM (
      SELECT md5(text) AS text_md5,
             doc_id AS keep_id,
             count(*) OVER (PARTITION BY md5(text)) AS n_copies,
             row_number() OVER (
               PARTITION BY md5(text)
               ORDER BY CAST(len(list_filter(string_split(text, ' '),
                        w -> w IN ({",".join("'" + w + "'" for w in STOPWORDS)})))
                        AS DOUBLE) / len(string_split(text, ' ')) DESC,
                        doc_id ASC) AS rn
      FROM {_DUP_CORPUS_SQL} corpus
    ) t WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One representative per exact-duplicate group, chosen by quality
    (stopword ratio as the proxy here) with doc_id as the total-order
    tiebreak — the real keep-policy of a training-data dedup stage, vs.
    dedup_exact's arbitrary min-id. One shuffle on md5(text); the quality
    score is a narrow map computed before the shuffle, so the window ranks
    precomputed scalars."""
    corpus = _dup_corpus_spark(spark, sf_dir)
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    quality = n_stop.cast("double") / F.size(toks)
    scored = corpus.select(
        F.md5("text").alias("text_md5"),
        F.col("doc_id"),
        quality.alias("q"),
    )
    w = Window.partitionBy("text_md5")
    wr = Window.partitionBy("text_md5").orderBy(
        F.col("q").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("n_copies", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("text_md5", F.col("doc_id").alias("keep_id"), "n_copies")
    )


# --------------------------------------------------------------------------
# near-dup CLUSTERS: LSH candidate pairs -> connected components ->
# one cluster id per document — the stage between pair generation and
# keep-one-per-cluster in a real dedup pipeline. Iterative CC is not
# SQL-expressible, so the driver check is rows-only; the planted-pair
# clustering invariant is pinned by tests/test_textops.py.


@register("near_dup_clusters")
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster_id, n_docs, min_doc, max_doc) per near-dup cluster.

    Edges are the size-capped LSH candidate pairs; components computed by
    the same O(log^2 n) two-phase CC operator canonicalization uses
    (operators/canon.py — large-star/small-star, per-iteration
    localCheckpoint). Singleton documents (no candidate edge) are excluded:
    at scale the interesting output is the dup groups, not a row per
    unique doc.
    """
    from kgpipe.operators.canon import connected_components

    pairs = minhash_lsh_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").cast("string").alias("src"),
        F.col("doc_b").cast("string").alias("dst"),
    )
    cc = connected_components(edges)  # (entity_id, canonical_id), non-roots
    members = (
        cc.select(F.col("entity_id").alias("doc"),
                  F.col("canonical_id").alias("cluster_id"))
        .unionByName(
            cc.select(F.col("canonical_id").alias("doc"),
                      F.col("canonical_id").alias("cluster_id")))
        .distinct()
    )
    return members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.col("doc").cast("long")).alias("min_doc"),
        F.max(F.col("doc").cast("long")).alias("max_doc"),
    )
