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
# the one SQL-literal form of the stoplist — every oracle expression uses
# THIS constant so the engine/oracle stoplists cannot desynchronize
_STOPLIST_SQL = ",".join(f"'{w}'" for w in STOPWORDS)

# MinHash parameters: k permutations h_i(x) = ((x mod M) * a_i + b_i) mod M
# over the portable 48-bit hash, with M = 2^31 - 1 (Mersenne prime).
# The pre-reduction mod M is LOAD-BEARING: round 1 used (x * a_i + b_i)
# mod 2^61-1 directly, but x < 2^48 and a_i < 2^13 means x*a+b < 2^61 NEVER
# wraps — every "permutation" was monotone in x, all 8 minima picked the
# SAME argmin shingle, and banded LSH degenerated to ONE permutation
# (bands perfectly correlated: measured near-dup recall 0.907 ~= J at
# J~0.9, where independent bands give 1-(1-J^2)^4 ~= 0.999; caught by
# bench_dedup.py's planted corpus). Reducing x to 31 bits first makes
# (x31 * a_i) wrap mod M for almost all x — a genuine universal-hash
# permutation family — while keeping every product < 2^44, far inside
# BIGINT under Spark's ANSI overflow checking, in both engines.
MINHASH_M = 2147483647  # 2^31 - 1 (Mersenne prime)
# rolling-hash modulus for doc_fingerprints — deliberately its own
# constant (2^61-1): i*const + hash(w) < 2^49 per term and a 60-term
# sum stays < 2^55, no BIGINT overflow; it never needed to wrap, and
# sharing the minhash modulus would couple two unrelated formulas
ROLLHASH_P = 2305843009213693951  # 2^61 - 1 (Mersenne prime)
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


# Session-scoped cache of materialized dedup intermediates (LSH candidate
# pairs, shingle tables). The near-dup family is a PIPELINE — pairs ->
# verify -> clusters -> keep-one — and round 2 recomputed the upstream
# stages per standalone query (ngram_jaccard_dups rebuilt signatures AND
# shingles: 9.2s standalone vs 4.7s for the pairs alone at sf0.1). One
# localCheckpoint per intermediate, shared across every consumer in the
# session; at 100 TB these would be tables written between stages.
_CACHE: dict[tuple, DataFrame] = {}


def _cached(spark: SparkSession, key: tuple, build) -> DataFrame:
    full_key = (spark.sparkContext.applicationId,) + key
    if full_key not in _CACHE:
        _CACHE[full_key] = build().localCheckpoint()
    return _CACHE[full_key]


# --------------------------------------------------------------------------
# exact dedup, both keep policies in one driver-reported query (round 4:
# the harness reports the first 50 registered queries):
#
# * policy='exact_min'  — group on md5(raw text), keep min doc_id: the
#   classic hash-groupBy exact dedup. Members of a group are byte-identical
#   so any policy richer than a total-order tiebreak is vacuous here.
# * policy='best_norm'  — group on md5(NORMALIZED text) (lowercase, collapse
#   runs of spaces, trim), keep the highest-QUALITY member (stopword ratio
#   of the raw text, doc_id ascending as the tiebreak). The variant corpus
#   plants an UPPER-CASED copy of every document at the SMALLER doc_id, so
#   the quality ranking must override the id tiebreak to pick the clean
#   copy — the policy is load-bearing (pinned by
#   tests/test_textops.py::test_dedup_best_norm_quality_is_load_bearing).
#
# Both halves are one shuffle each on the group hash; the quality score is
# a narrow map computed before the shuffle, so the window ranks
# precomputed scalars.

_NORM_SQL = "md5(lower(trim(regexp_replace(text, ' +', ' ', 'g'))))"
_RATIO_SQL = f"""CAST(len(list_filter(string_split(text, ' '),
        w -> w IN ({_STOPLIST_SQL}))) AS DOUBLE) / len(string_split(text, ' '))"""

# upper-cased (stopword-free => low-quality) copy at the SMALL id, the
# original at id + 1000000
_VARIANT_CORPUS_SQL = """
    (SELECT doc_id, upper(text) AS text FROM documents
     UNION ALL
     SELECT doc_id + 1000000 AS doc_id, text FROM documents)
"""


def _variant_corpus_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.select("doc_id", F.upper("text").alias("text")).unionByName(
        d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )


def _stopword_ratio(text_col) -> Column:
    toks = F.split(text_col, " ")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    return n_stop.cast("double") / F.size(toks)


def keep_best_norm(corpus: DataFrame, quality: Column) -> DataFrame:
    """One keeper per normalized-text group, ranked by ``quality`` desc
    then doc_id asc. ``quality`` is any scalar expression over the raw
    ``text`` column (the test swaps it for a constant to prove the
    ranking, not the tiebreak, decides)."""
    norm = F.md5(F.lower(F.trim(F.regexp_replace("text", " +", " "))))
    scored = corpus.select(
        norm.alias("group_key"),
        F.col("doc_id"),
        quality.alias("q"),
    )
    w = Window.partitionBy("group_key")
    wr = Window.partitionBy("group_key").orderBy(
        F.col("q").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("n_copies", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("group_key", F.col("doc_id").cast("long").alias("keep_id"),
                "n_copies")
    )


@register(
    "dedup_keep_best",
    oracle=f"""
    SELECT 'exact_min' AS policy,
           md5(text) AS group_key,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           count(*) AS n_copies
    FROM {_DUP_CORPUS_SQL} corpus
    GROUP BY md5(text)
    UNION ALL
    SELECT 'best_norm' AS policy, group_key, keep_id, n_copies FROM (
      SELECT {_NORM_SQL} AS group_key,
             CAST(doc_id AS BIGINT) AS keep_id,
             count(*) OVER (PARTITION BY {_NORM_SQL}) AS n_copies,
             row_number() OVER (
               PARTITION BY {_NORM_SQL}
               ORDER BY {_RATIO_SQL} DESC, doc_id ASC) AS rn
      FROM {_VARIANT_CORPUS_SQL} corpus
    ) t WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = _dup_corpus_spark(spark, sf_dir).groupBy(
        F.md5("text").alias("group_key")).agg(
        F.min("doc_id").cast("long").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select(F.lit("exact_min").alias("policy"), "*")
    corpus = _variant_corpus_spark(spark, sf_dir)
    best = keep_best_norm(corpus, _stopword_ratio(F.col("text"))).select(
        F.lit("best_norm").alias("policy"), "*")
    return exact.unionByName(best)


# --------------------------------------------------------------------------
# quality scoring × language-ID, one query (round 4: the driver's
# CORRECTNESS harness reports the first 50 registered queries, so the
# per-doc text-analysis surface is consolidated — each merged query still
# evidences every constituent operator, just in one result):
# stopword-ratio / word-length quality stats sliced by the langid
# heuristic's prediction (stopword-hit-count argmax over tiny per-language
# marker lists — deterministic, SQL-expressible with CASE).

LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
}


def _lang_hits_sql(lang: str) -> str:
    ws = ",".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({ws})))"


_LANGID_CASE_SQL = f"""CASE
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
        ELSE 'unknown' END"""


def _langid_spark(toks: Column) -> Column:
    def hits(lang: str) -> Column:
        arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))

    en, es, de, fr = hits("en"), hits("es"), hits("de"), hits("fr")
    return (
        F.when((en >= es) & (en >= de) & (en >= fr) & (en > 0), "en")
        .when((es >= de) & (es >= fr) & (es > 0), "es")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    )


@register(
    "quality_langid_scores",
    oracle=f"""
    SELECT source, predicted_lang,
           count(*) AS n_docs,
           round(avg(stop_ratio), 4) AS avg_stopword_ratio,
           round(avg(word_len), 4) AS avg_word_len
    FROM (
      SELECT source,
             {_LANGID_CASE_SQL} AS predicted_lang,
             CAST(len(list_filter(string_split(text, ' '),
                  w -> w IN ({_STOPLIST_SQL})))
                  AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
                  / len(string_split(text, ' ')) AS word_len
      FROM documents) t
    GROUP BY source, predicted_lang
    """,
)
def quality_langid_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, predicted-language) quality stats: the quality-scoring
    and language-ID operators in one scan + one hash aggregation — the
    shape a real corpus profiler runs (quality distributions sliced by
    detected language), and still the cheapest plan Spark has (narrow
    HOF maps, partial agg, no Python)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    ratio = n_stop.cast("double") / F.size(toks)
    word_len = (
        F.length(F.regexp_replace("text", " ", "")).cast("double") / F.size(toks)
    )
    return (
        d.select(
            "source",
            _langid_spark(toks).alias("predicted_lang"),
            ratio.alias("stop_ratio"),
            word_len.alias("word_len"),
        )
        .groupBy("source", "predicted_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("stop_ratio"), 4).alias("avg_stopword_ratio"),
            F.round(F.avg("word_len"), 4).alias("avg_word_len"),
        )
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
    a non-empty array and every h_i value is < MINHASH_M (the init
    sentinel).
    """
    sh = F.array_distinct(_shingles_spark(toks))
    h = F.transform(sh, portable_hash_spark)
    init = F.struct(
        *[F.lit(MINHASH_M).cast("long").alias(f"mh{i}")
          for i in range(len(MINHASH_AB))]
    )

    def merge(acc: Column, x: Column) -> Column:
        x31 = x % MINHASH_M
        return F.struct(
            *[
                F.least(acc[f"mh{i}"],
                        (x31 * a + b) % MINHASH_M).alias(f"mh{i}")
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
        f"list_min(list_transform({hs}, "
        f"x -> ((x % {MINHASH_M}) * {a} + {b}) % {MINHASH_M}))"
        f" AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    ]


@register(
    "minhash_signatures",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_distinct({_SHINGLES_SQL})) AS INT) AS n_shingles,
           {", ".join(_minhash_sql_exprs())}
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3
    """,
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc distinct-shingle count + the 8 MinHash minima (the shingle
    surface and the signature surface in one full-hash query — `n_shingles`
    verifies the 3-gram shingler itself, the minima verify the portable-
    hash permutation fold)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_sh = F.size(F.array_distinct(_shingles_spark(toks))).cast("int")
    return d.filter(F.size(toks) >= 3).select(
        "doc_id", n_sh.alias("n_shingles"), *_minhash_cols_spark(toks))


# --------------------------------------------------------------------------
# MinHash-LSH near-duplicate candidate pairs: band the signature, bucket-join


# Shared CTE chain: portable MinHash signatures over the given corpus ->
# banded buckets -> size-capped candidate pairs. Used verbatim by the
# LSH-pairs, Jaccard-verify, cluster and keep-best oracles so every stage
# of the near-dup pipeline agrees on its candidate set.
def _lsh_cand_ctes(corpus_sql: str = _DUP_CORPUS_SQL) -> str:
    return f"""
    sigs AS (
      SELECT doc_id, {", ".join(_minhash_sql_exprs())}
      FROM {corpus_sql} corpus
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
    """Size-capped LSH candidate pairs over the dup corpus, computed
    through DURABLE fingerprint-keyed sigs+pairs stage tables (the same
    A14 protocol dedup_pipeline uses, under its own corpus tag): the first
    session pays the sigs scan + bucket join and commits both stages; every
    fresh session over unchanged inputs reads the committed pairs table
    back (~6x cheaper at sf0.1). Oracle unchanged — the durable path must
    hash-match the same candidate CTE chain."""
    return _cached(spark, ("lsh_pairs", sf_dir),
                   lambda: _durable_lsh_pairs(spark, sf_dir))


def _durable_dup_family(spark: SparkSession, sf_dir: str,
                        want: str) -> DataFrame:
    """The dup-corpus family's durable run under ONE locking/fingerprint
    discipline: commit (or resume) sigs+pairs, plus the jaccard branch
    when asked. ``want``: 'pairs' or 'jaccard'."""
    import os

    from kgpipe.dedup_pipeline import (
        DUP_CORPUS_TAG,
        locked_run_dir,
        run_dedup_checkpointed,
        stage_fingerprints,
    )

    paths = [os.path.join(sf_dir, "documents.parquet")]
    fps = stage_fingerprints(paths, corpus=DUP_CORPUS_TAG)
    with locked_run_dir(spark, paths, fps) as run_dir:
        out = run_dedup_checkpointed(
            spark, _dup_corpus_spark(spark, sf_dir), paths, run_dir,
            fps=fps, through="pairs")
        if want == "pairs":
            return out["pairs"]
        run = out["run"]
        s = run.stage(
            "jaccard", out["pairs"].select("doc_a", "doc_b"),
            lambda cand: jaccard_from_pairs(cand,
                                            _shingle_table(spark, sf_dir)),
            n_buckets=1, fingerprint=fps["jaccard"])
        run.write_metrics()
        return s.df


def _durable_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _durable_dup_family(spark, sf_dir, "pairs")


def _lsh_pairs_over(corpus: DataFrame) -> DataFrame:
    """Size-capped LSH candidate pairs over any (doc_id, text) corpus."""
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
    return lsh_pairs_from_sigs(sigs)


def minhash_sigs_over(corpus: DataFrame) -> DataFrame:
    """Stage form of the signature computation (no checkpoint decision —
    the caller materializes, e.g. dedup_pipeline's A14 stage write)."""
    toks = F.split("text", " ")
    return (corpus.filter(F.size(toks) >= 3)
            .select("doc_id", *_minhash_cols_spark(toks)))


def lsh_pairs_from_sigs(sigs: DataFrame) -> DataFrame:
    """Banded bucket self-join over a materialized signature table."""
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
    verified only the planted duplicates; consuming the LSH pairs stage
    makes this a generic operator: any candidate source works.

    Durable: the verified pairs are the ``jaccard`` stage of the
    dup-corpus family's committed run (branching off ``pairs``, chained
    fingerprint) — fresh sessions over unchanged inputs read the table
    back instead of re-scanning the corpus for shingles."""
    return _cached(spark, ("jaccard_dups", sf_dir),
                   lambda: _durable_jaccard_dups(spark, sf_dir))


def _shingle_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("text", " ")
    # cached: both join sides AND any other consumer reuse ONE materialized
    # shingle table instead of re-deriving it from text
    return _cached(
        spark, ("shingles", sf_dir),
        lambda: _dup_corpus_spark(spark, sf_dir)
        .filter(F.size(toks) >= 3)
        .select("doc_id", F.array_distinct(_shingles_spark(toks)).alias("s")),
    )


def jaccard_from_pairs(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """(doc_a, doc_b) candidates + (doc_id, s) shingle sets -> pairs with
    exact n-gram Jaccard >= 0.5."""
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


def _durable_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _durable_dup_family(spark, sf_dir, "jaccard")


# --------------------------------------------------------------------------
# per-doc fingerprints, one query: SimHash (bit-vote over the portable
# token hash — near-dup-tolerant) + rolling hash (position-sensitive —
# any token move changes it). Both are narrow HOF maps over one scan.


@register(
    "doc_fingerprints",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    th AS (SELECT doc_id, {portable_hash_sql("w")} AS h FROM tok),
    bits AS (
      SELECT doc_id, b.bit,
             sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM th CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) b
      GROUP BY doc_id, b.bit),
    sim AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN 1::BIGINT << bit ELSE 0 END)
                  AS BIGINT) AS simhash32
      FROM bits GROUP BY doc_id)
    SELECT d.doc_id,
           s.simhash32,
           CAST(list_sum(list_transform(
                  range(1, len(string_split(d.text, ' ')) + 1),
                  i -> (i * 1315423911 +
                        {portable_hash_sql("string_split(d.text, ' ')[i]")})
                       % {ROLLHASH_P}))
                % {ROLLHASH_P} AS BIGINT) AS fingerprint
    FROM documents d JOIN sim s ON s.doc_id = d.doc_id
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    h = F.transform(toks, portable_hash_spark)
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
    idx = F.sequence(F.lit(1), F.size(toks))
    terms = F.zip_with(
        idx,
        toks,
        lambda i, w: (
            i.cast("long") * 1315423911
            + portable_hash_spark(w)
        )
        % ROLLHASH_P,
    )
    fp = F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, x: (acc + x) % ROLLHASH_P
    )
    return d.select(
        "doc_id",
        simhash.cast("long").alias("simhash32"),
        fp.cast("long").alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# canonical-document selection: after dedup finds groups, a training
# pipeline keeps ONE representative per group — the highest-quality copy,
# not an arbitrary one


# --------------------------------------------------------------------------
# near-dup CLUSTERS: LSH candidate pairs -> connected components ->
# one cluster id per document — the stage between pair generation and
# keep-one-per-cluster in a real dedup pipeline. The Spark side runs the
# iterative two-phase CC; the oracle expresses the SAME fixpoint as a
# DuckDB WITH RECURSIVE transitive closure over the identical capped
# candidate-pair CTE (fine at oracle scale; the closure is quadratic in
# cluster size, which is why Spark gets the O(log^2 n) algorithm).


def _closure_ctes(corpus_sql: str = _DUP_CORPUS_SQL) -> str:
    """cand-pair CTEs + transitive closure -> ``members(doc, cluster_id)``
    with cluster_id = numeric min member (matching the Spark CC's canonical
    choice). Embed under a ``WITH RECURSIVE`` prefix."""
    return f"""{_lsh_cand_ctes(corpus_sql)},
    bi AS (
      SELECT doc_a AS s, doc_b AS t FROM cand
      UNION
      SELECT doc_b, doc_a FROM cand
    ),
    reach AS (
      SELECT s, t FROM bi
      UNION
      SELECT r.s, b.t FROM reach r JOIN bi b ON r.t = b.s
      WHERE b.t <> r.s
    ),
    members AS (
      SELECT s AS doc, least(s, min(t)) AS cluster_id
      FROM reach GROUP BY s
    )"""


@register(
    "near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_closure_ctes()}
    SELECT cluster_id, count(*) AS n_docs,
           min(doc) AS min_doc, max(doc) AS max_doc
    FROM members GROUP BY cluster_id
    """,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster_id, n_docs, min_doc, max_doc) per near-dup cluster.

    Edges are the size-capped LSH candidate pairs; components computed by
    the same O(log^2 n) two-phase CC operator canonicalization uses
    (operators/canon.py — large-star/small-star, per-iteration
    localCheckpoint). Singleton documents (no candidate edge) are excluded:
    at scale the interesting output is the dup groups, not a row per
    unique doc. Doc ids are zero-padded before entering the string-keyed CC
    so string order == numeric order and ``cluster_id`` comes back as the
    numeric min member — exactly what the recursive oracle computes.
    """
    return _cluster_members(spark, sf_dir).groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc").alias("min_doc"),
        F.max("doc").alias("max_doc"),
    )


def _cluster_members(spark: SparkSession, sf_dir: str,
                     key: str = "lsh_pairs",
                     pairs_fn=None, committed=None) -> DataFrame:
    """LSH pairs -> CC -> (doc, cluster_id) long columns, session-cached.

    ``pairs_fn`` is a thunk (not a DataFrame) so a cache hit skips even the
    eager signature-checkpoint job the pairs construction runs.
    ``committed`` is an optional thunk returning an already-durable form of
    the SAME members table (or None): when dedup_pipeline has committed its
    stage tables for this input, a fresh session reads them instead of
    re-running sigs -> pairs -> CC — the stage-table sharing a real
    100-TB pipeline gets by writing stages as tables."""

    def build() -> DataFrame:
        if committed is not None:
            m = committed()
            if m is not None:
                return m
        p = pairs_fn() if pairs_fn is not None else minhash_lsh_pairs(
            spark, sf_dir)
        return members_from_pairs(p)

    return _cached(spark, ("members", key, sf_dir), build)


def members_from_pairs(pairs: DataFrame) -> DataFrame:
    """Candidate pairs -> (doc, cluster_id) via two-phase CC; cluster_id is
    the numeric min member (ids zero-padded through the string-keyed CC so
    string order == numeric order)."""
    from kgpipe.operators.canon import connected_components

    pad = "%012d"
    edges = pairs.select(
        F.format_string(pad, "doc_a").alias("src"),
        F.format_string(pad, "doc_b").alias("dst"),
    )
    cc = connected_components(edges)  # (entity_id, canonical_id), non-root
    return (
        cc.select(F.col("entity_id").alias("doc"),
                  F.col("canonical_id").alias("cluster_id"))
        .unionByName(
            cc.select(F.col("canonical_id").alias("doc"),
                      F.col("canonical_id").alias("cluster_id")))
        .distinct()
        .select(F.col("doc").cast("long").alias("doc"),
                F.col("cluster_id").cast("long").alias("cluster_id"))
    )


# --------------------------------------------------------------------------
# near-dup KEEP-BEST: the final stage of the dedup pipeline — one
# representative per NEAR-dup cluster, chosen by quality. Unlike
# dedup_keep_best (exact groups: members are byte-identical, so quality
# never discriminates), this corpus's cluster members genuinely differ:
# the low-id copy carries a junk token ("zzz " prefix), so the quality
# ranking must pick the clean HIGHER-id copy — min-id would be wrong.

_NEARDUP_CORPUS_SQL = """
    (SELECT doc_id, 'zzz ' || text AS text FROM documents
     UNION ALL
     SELECT doc_id + 1000000 AS doc_id, text FROM documents)
"""

def _neardup_corpus_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    noisy = d.select(
        "doc_id", F.concat(F.lit("zzz "), F.col("text")).alias("text"))
    clean = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return noisy.unionByName(clean)


# Shared by near_dup_keep_best and its checkpointed-pipeline twin
# (dedup_pipeline): both must produce the identical keep-set, so both are
# checked against the identical recursive-closure oracle.
_NEARDUP_KEEP_BEST_ORACLE = f"""
    WITH RECURSIVE {_closure_ctes(_NEARDUP_CORPUS_SQL)},
    scored AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                      w -> w IN ({_STOPLIST_SQL}))) AS DOUBLE)
               / len(string_split(text, ' ')) AS q
      FROM {_NEARDUP_CORPUS_SQL} corpus
    )
    SELECT cluster_id, keep_id, n_docs FROM (
      SELECT m.cluster_id,
             s.doc_id AS keep_id,
             count(*) OVER (PARTITION BY m.cluster_id) AS n_docs,
             row_number() OVER (PARTITION BY m.cluster_id
                                ORDER BY s.q DESC, s.doc_id ASC) AS rn
      FROM members m JOIN scored s ON s.doc_id = m.doc) t
    WHERE rn = 1
    """


@register("near_dup_keep_best", oracle=_NEARDUP_KEEP_BEST_ORACLE)
def near_dup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One representative per near-dup cluster: LSH pairs -> connected
    components -> quality rank (stopword ratio DESC, doc_id ASC tiebreak).
    The junk-prefixed low-id copy has a strictly lower stopword ratio than
    its clean high-id near-duplicate whenever the text contains stopwords,
    so the chosen ``keep_id`` differs from min-id on most clusters — the
    ranking is load-bearing and oracle-checked end to end (the oracle
    replays the whole pipeline: capped LSH candidates, recursive-CTE
    closure, the same window rank).

    Scale shape: quality is a narrow pre-shuffle map; the members<->score
    join shuffles on doc_id; the window ranks precomputed scalars within
    clusters (bounded by the LSH bucket cap).
    """
    members = _cluster_members(
        spark, sf_dir, key="neardup",
        pairs_fn=lambda: _lsh_pairs_over(_neardup_corpus_spark(spark, sf_dir)),
        committed=lambda: _committed_neardup_members(spark, sf_dir))
    return keep_best_from_members(
        members, _neardup_corpus_spark(spark, sf_dir))


def _committed_neardup_members(spark: SparkSession, sf_dir: str):
    """dedup_pipeline's durable 'members' stage for this input, if fully
    committed and disk-valid — the two queries compute the identical table
    (same corpus tag in the fingerprint, same capped pairs, same CC),
    pinned by their SHARED recursive-closure oracle, so reading the
    committed stage is pure reuse, not an approximation. Returns None when
    absent/stale/partial; a pure probe — creates nothing, deletes
    nothing."""
    import os

    from kgpipe.dedup_pipeline import (
        run_dir_fp,
        shared_run_dir,
        stage_fingerprints,
    )
    from kgpipe.operators.checkpoint import CheckpointedRun

    paths = [os.path.join(sf_dir, "documents.parquet")]
    fps = stage_fingerprints(paths)
    run_dir = shared_run_dir(paths, fp=run_dir_fp(fps))
    if run_dir is None or not os.path.isdir(run_dir):
        return None
    run = CheckpointedRun(spark, run_dir)
    return run.load_committed("members", fps["members"], n_buckets=1)


def keep_best_from_members(members: DataFrame,
                           corpus: DataFrame) -> DataFrame:
    """(doc, cluster_id) members + (doc_id, text) corpus -> one kept doc
    per cluster by stopword-ratio quality, doc_id ASC tiebreak."""
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    q = (F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
         .cast("double") / F.size(toks))
    scored = corpus.select("doc_id", q.alias("q"))
    w = Window.partitionBy("cluster_id")
    wr = Window.partitionBy("cluster_id").orderBy(
        F.col("q").desc(), F.col("doc_id").asc())
    return (
        members.join(scored, members["doc"] == scored["doc_id"])
        .withColumn("n_docs", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("keep_id"), "n_docs")
    )


@register("dedup_pipeline", oracle=_NEARDUP_KEEP_BEST_ORACLE)
def dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``near_dup_keep_best`` computed through the A14-checkpointed dedup
    pipeline (kgpipe/dedup_pipeline.py): sigs/pairs/members/keep_best
    land as parquet stage tables with per-bucket lineage manifests, and
    the returned keep-set must hash-match the same recursive-closure
    oracle as the direct form — the resumable path is held to the exact
    same answer as the in-memory one.

    The run_dir is keyed on the INPUT FINGERPRINT (file paths + sizes +
    mtimes + the MinHash/LSH params — checkpoint.py's A14 fingerprint),
    not the Spark application id: a fresh session over unchanged inputs
    RESUMES the durable stages instead of recomputing all four (the
    honest demo of cross-session A14 resume, and the difference between
    ~12 s and ~2 s per bench run at sf0.1). A changed input or parameter
    produces a different fingerprint and therefore a clean new run_dir;
    pytest drives forced recompute by passing its own run_dir
    (tests/test_dedup_pipeline.py).

    A shared fingerprint-keyed dir means two PROCESSES can race on it (the
    old applicationId key was per-process by construction), so the run
    holds an exclusive non-blocking ``flock`` on the ownership-verified
    dir, falling back to a private applicationId-suffixed dir when the
    lock is held or the shared root unusable
    (kgpipe.dedup_pipeline.locked_run_dir)."""
    import os as _os

    from kgpipe.dedup_pipeline import (
        locked_run_dir,
        run_dedup_checkpointed,
        stage_fingerprints,
    )

    input_paths = [_os.path.join(sf_dir, "documents.parquet")]
    # fingerprint the inputs ONCE: dir choice and stage fingerprints must
    # come from the same stat pass or a concurrent input rewrite pairs an
    # old dir with new fingerprints
    fps = stage_fingerprints(input_paths)
    with locked_run_dir(spark, input_paths, fps) as run_dir:
        out = run_dedup_checkpointed(
            spark, _neardup_corpus_spark(spark, sf_dir),
            input_paths, run_dir, fps=fps)
    return out["keep_best"]


# --------------------------------------------------------------------------
# BPE-style regex token counting (task brief: "token counting (whitespace
# + a BPE-ish regex)") — a GPT-2-flavoured pre-tokenizer: runs of letters,
# runs of digits, runs of punctuation, each optionally absorbing one
# leading space. The driver corpus is all lowercase words, so the three
# classes are made load-bearing by planting a deterministic mixed-class
# suffix ("... v<doc_id%97>-9.") on every document — digits and
# punctuation then appear in every row and the class split discriminates.
#
# Portability note: the pattern uses no lookaround and only ASCII classes,
# so Java regex (Spark) and RE2 (DuckDB) tokenize identically; both
# engines use leftmost-first alternation.

_BPE_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

_BPE_CORPUS_SQL = """
    (SELECT doc_id, lang,
            text || ' v' || CAST(doc_id % 97 AS VARCHAR) || '-9.' AS text
     FROM documents)
"""


def _bpe_corpus_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang",
        F.concat(
            F.col("text"), F.lit(" v"),
            (F.col("doc_id") % 97).cast("string"), F.lit("-9."),
        ).alias("text"),
    )


@register(
    "token_counts",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             regexp_extract_all(text, '{_BPE_PATTERN}') AS bpe,
             len(string_split(text, ' ')) AS ws_tokens
      FROM {_BPE_CORPUS_SQL} corpus
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
           round(avg(ws_tokens), 4) AS avg_ws_tokens,
           CAST(sum(len(bpe)) AS BIGINT) AS total_bpe_tokens,
           CAST(sum(len(list_filter(bpe,
                t -> regexp_matches(t, '^ ?[a-z]+$')))) AS BIGINT)
             AS alpha_tokens,
           CAST(sum(len(list_filter(bpe,
                t -> regexp_matches(t, '^ ?[0-9]+$')))) AS BIGINT)
             AS digit_tokens,
           CAST(sum(len(list_filter(bpe,
                t -> regexp_matches(t, '^ ?[^a-z0-9 ]+$')))) AS BIGINT)
             AS punct_tokens,
           round(avg(CAST(len(bpe) AS DOUBLE) / ws_tokens), 4)
             AS avg_bpe_per_ws
    FROM toks
    GROUP BY lang
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace AND BPE-ish-regex token counts per language, one query
    (task brief: "token counting (whitespace + a BPE-ish regex)"). The
    regex split is a narrow JVM-side map (``regexp_extract_all`` inside
    whole-stage codegen — no Python); one hash aggregation on ``lang``
    follows. At 100 TB this is scan + map + partial-agg — the cheapest
    shape Spark has."""
    d = _bpe_corpus_spark(spark, sf_dir)
    bpe = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)
    cls = lambda pat: F.size(F.filter(bpe, lambda t: t.rlike(pat)))
    return (
        d.select(
            "lang",
            F.size(bpe).alias("n_bpe"),
            cls("^ ?[a-z]+$").alias("n_alpha"),
            cls("^ ?[0-9]+$").alias("n_digit"),
            cls("^ ?[^a-z0-9 ]+$").alias("n_punct"),
            F.size(F.split("text", " ")).alias("n_ws"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws").cast("long").alias("total_ws_tokens"),
            F.round(F.avg("n_ws"), 4).alias("avg_ws_tokens"),
            F.sum("n_bpe").cast("long").alias("total_bpe_tokens"),
            F.sum("n_alpha").cast("long").alias("alpha_tokens"),
            F.sum("n_digit").cast("long").alias("digit_tokens"),
            F.sum("n_punct").cast("long").alias("punct_tokens"),
            F.round(
                F.avg(F.col("n_bpe").cast("double") / F.col("n_ws")), 4
            ).alias("avg_bpe_per_ws"),
        )
    )
