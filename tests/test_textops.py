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
