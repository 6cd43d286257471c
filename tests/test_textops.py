"""Near-dup clustering invariant: every planted duplicate pair
(doc_id, doc_id+1000000) must land in the same cluster, and every
cluster must contain at least one planted pair (no spurious merges of
unrelated docs into pair-free clusters)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_planted_pairs_cluster_together(spark):
    from kgpipe.queries.textops import near_dup_clusters

    rows = near_dup_clusters(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= 2
        # the planted copy of the cluster's smallest member must be inside
        assert r.min_doc + 1000000 <= r.max_doc, r


def test_all_eligible_docs_are_clustered_with_their_copy(spark):
    """Exact duplicates share every band, so each (doc, doc+1000000) pair
    is always an LSH edge -> both sides must appear in one component."""
    from pyspark.sql import functions as F

    from kgpipe.queries.registry import load
    from kgpipe.queries.textops import near_dup_clusters

    n_eligible = (
        load(spark, SF, "documents")
        .filter(F.size(F.split("text", " ")) >= 3)
        .count()
    )
    total_docs = near_dup_clusters(spark, SF).agg(
        F.sum("n_docs")).collect()[0][0]
    # every eligible doc + its planted copy is in some cluster
    assert total_docs == 2 * n_eligible


def test_keep_best_prefers_clean_copy_over_min_id(spark):
    """near_dup_keep_best's quality ranking must be load-bearing: the
    low-id cluster member carries a junk 'zzz' prefix token, so whenever
    the text contains stopwords the clean HIGHER-id copy has the higher
    stopword ratio and must win — min-id selection would fail this."""
    from pyspark.sql import functions as F

    from kgpipe.queries.registry import load
    from kgpipe.queries.textops import STOPWORDS, near_dup_keep_best

    kept = near_dup_keep_best(spark, SF)
    rows = kept.collect()
    assert rows
    non_min = [r for r in rows if r.keep_id != r.cluster_id]
    assert non_min, "quality ranking never overrode min-id — vacuous"
    # every cluster whose base doc has a stopword keeps the clean copy
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    has_stop = (
        load(spark, SF, "documents")
        .filter(F.size(toks) >= 3)
        .filter(F.size(F.filter(toks,
                lambda w: F.array_contains(stop_arr, w))) > 0)
        .select("doc_id")
    )
    stop_ids = {r.doc_id for r in has_stop.collect()}
    for r in rows:
        if r.cluster_id in stop_ids and r.n_docs == 2:
            assert r.keep_id == r.cluster_id + 1000000, r


def test_dedup_intermediates_are_session_cached(spark):
    """Standalone near-dup queries share one materialized LSH-pairs /
    members intermediate per session instead of recomputing the upstream
    pipeline (round-2 verdict: ngram_jaccard_dups recomputed signatures
    and shingles per call)."""
    from kgpipe.queries.textops import minhash_lsh_pairs, near_dup_clusters

    p1 = minhash_lsh_pairs(spark, SF)
    p2 = minhash_lsh_pairs(spark, SF)
    assert p1 is p2
    c1 = near_dup_clusters(spark, SF)
    c2 = near_dup_clusters(spark, SF)
    # the grouped result is rebuilt, but over the same cached members
    assert c1 is not c2
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))


def test_dedup_best_norm_quality_is_load_bearing(spark):
    """dedup_keep_best's best_norm policy: the variant corpus plants the
    UPPER-CASED (stopword-free) copy at the SMALL doc_id, so picking the
    clean original (id >= 1000000) requires the quality ranking to
    override the doc_id-ascending tiebreak. Swapping the quality
    expression for a constant must flip those keepers back to the min id
    — proving the ranking, not the tiebreak, decides."""
    from pyspark.sql import functions as F

    from kgpipe.queries.textops import (
        _stopword_ratio,
        _variant_corpus_spark,
        keep_best_norm,
    )

    corpus = _variant_corpus_spark(spark, SF)
    quality = keep_best_norm(corpus, _stopword_ratio(F.col("text")))
    flat = keep_best_norm(corpus, F.lit(0.0))

    q_rows = {r.group_key: r.keep_id for r in quality.collect()}
    f_rows = {r.group_key: r.keep_id for r in flat.collect()}
    assert set(q_rows) == set(f_rows)
    # constant quality == pure tiebreak -> always the planted low id
    assert all(k < 1000000 for k in f_rows.values())
    overridden = [g for g, k in q_rows.items() if k >= 1000000]
    # stopwords appear in nearly every synthetic doc; require a majority
    assert len(overridden) > len(q_rows) / 2, (
        f"quality overrode the tiebreak in only {len(overridden)}/"
        f"{len(q_rows)} groups")
