"""Canonicalization: similarity join + connected components + id rewrite
(SURVEY.md A10-A12; BASELINE.json: "canonicalization via GraphFrames-style
connected components on a salted similarity join").

GraphFrames is not installable offline (SURVEY.md §4.4), and the phrase is
"GraphFrames-STYLE": connected components are hand-rolled DataFrame code.

Two algorithms are provided:

* ``two_phase`` (default) — the alternating large-star / small-star
  algorithm of Kiveris et al., "Connected Components in MapReduce and
  Beyond" (SOCC'14): provably O(log^2 n) rounds on any graph, each round two
  shuffles (groupBy min + join). This is the 100-TB path.
* ``minprop`` — plain min-label propagation; O(diameter) rounds. Alias
  clusters are stars (diameter <= 2), so this is cheap too, but it degrades
  on long chains.

Every iteration ``localCheckpoint()``s to truncate lineage (SURVEY.md §4.2).

Similarity-join scaling: candidate pairs are generated ONLY within a blocking
key (ent_class, first token, length bucket) — an equi-join Catalyst can
shuffle-partition — and the quadratic Levenshtein filter runs per block.
Skewed blocks are covered by AQE skew-join splitting (enabled in session.py);
at 100-TB scale block caps / salting bound the worst block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_surfaces(dict_df: DataFrame) -> DataFrame:
    """entity_id -> its best (highest-prior) normalized alias + class."""
    return dict_df.groupBy("entity_id").agg(
        F.max_by("alias", F.struct("prior", "alias")).alias("surface"),
        F.first("ent_class").alias("ent_class"),
    )


def similarity_edges(surfaces: DataFrame, max_lev: int = 2) -> DataFrame:
    """Candidate duplicate pairs (a < b) via blocked Levenshtein join."""
    s = surfaces.select(
        "entity_id",
        "surface",
        "ent_class",
        F.split(F.col("surface"), " ").getItem(0).alias("block_tok"),
        F.length("surface").alias("slen"),
    )
    a = s.alias("a")
    b = s.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ent_class") == F.col("b.ent_class"))
            & (F.col("a.block_tok") == F.col("b.block_tok"))
            & (F.col("a.entity_id") < F.col("b.entity_id")),
            "inner",
        )
        # cheap length filter before the quadratic edit distance
        .filter(F.abs(F.col("a.slen") - F.col("b.slen")) <= max_lev)
        .filter(F.levenshtein(F.col("a.surface"), F.col("b.surface")) <= max_lev)
        .select(F.col("a.entity_id").alias("src"),
                F.col("b.entity_id").alias("dst"))
    )


def _edges_fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, algo: str = "two_phase",
                         max_iter: int = 25) -> DataFrame:
    """edges (src, dst) -> (entity_id, canonical_id), canonical = cluster min.

    Only non-root members appear in the output; callers coalesce identity.
    """
    if algo == "minprop":
        return _cc_minprop(edges, max_iter)
    return _cc_two_phase(edges, max_iter)


def _cc_two_phase(edges: DataFrame, max_iter: int) -> DataFrame:
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    e = e.distinct().localCheckpoint()
    prev_fp = None
    for _ in range(max_iter):
        # --- large star: for each u, connect every neighbor v > u to
        #     m = min(N(u) ∪ {u})
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        mins = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m"))
        large = (
            sym.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        # --- small star: orient edges (big -> small); connect every small
        #     neighbor (and u itself) to m = min(N⁻(u) ∪ {u})
        oriented = large.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        ).distinct()
        mins2 = oriented.groupBy("src").agg(F.min("dst").alias("m"))
        small = (
            oriented.join(mins2, "src")
            .select(F.col("dst").alias("v"), F.col("m"))
            .unionByName(mins2.select(F.col("src").alias("v"), F.col("m")))
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )
        e = small.localCheckpoint()
        fp = _edges_fingerprint(e)
        if fp == prev_fp:
            break
        prev_fp = fp
    # converged: every edge is (member, root)
    return e.select(F.col("src").alias("entity_id"),
                    F.col("dst").alias("canonical_id"))


def _cc_minprop(edges: DataFrame, max_iter: int) -> DataFrame:
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).localCheckpoint()
    for _ in range(max_iter):
        cand = (
            sym.join(labels, sym["src"] == labels["node"], "inner")
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("label").alias("cand"))
        )
        merged = (
            labels.join(cand, labels["node"] == cand["node2"], "left")
            .select(
                "node",
                F.least(F.col("label"),
                        F.coalesce(F.col("cand"), F.col("label"))).alias("new_label"),
                "label",
            )
        )
        changed = merged.filter(F.col("new_label") != F.col("label")).count()
        labels = merged.select(
            "node", F.col("new_label").alias("label")).localCheckpoint()
        if changed == 0:
            break
    return labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("entity_id"), F.col("label").alias("canonical_id"))


def build_canon_map(dict_df: DataFrame, algo: str = "two_phase") -> DataFrame:
    """candidate dictionary -> (entity_id, canonical_id) for merged ids."""
    edges = similarity_edges(entity_surfaces(dict_df))
    return connected_components(edges, algo=algo)


def canonicalize(raw_triples: DataFrame, canon_map: DataFrame) -> DataFrame:
    """Rewrite subj/obj onto canonical ids and dedup (SURVEY.md A12).

    canon_map is tiny (derived from the dictionary) -> broadcast both joins;
    the triples side never shuffles for this stage.
    """
    cm = F.broadcast(canon_map)
    t = (
        raw_triples.join(cm.withColumnRenamed("entity_id", "subj")
                         .withColumnRenamed("canonical_id", "subj_canon"),
                         "subj", "left")
        .join(cm.withColumnRenamed("entity_id", "obj")
              .withColumnRenamed("canonical_id", "obj_canon"),
              "obj", "left")
        .select(
            F.coalesce("subj_canon", "subj").alias("subj"),
            "pred",
            F.coalesce("obj_canon", "obj").alias("obj"),
            "conv_id",
            "turn_idx",
            "conf",
        )
    )
    # groupBy + max(conf), NOT dropDuplicates: when the same triple arises
    # both intra-turn (conf 1.0) and cross-turn (conf 0.9), dropDuplicates
    # keeps a plan-dependent arbitrary row; max is deterministic across
    # partitionings and matches the fused path's per-turn dedup rule.
    return t.groupBy("subj", "pred", "obj", "conv_id", "turn_idx").agg(
        F.max("conf").alias("conf"))


# --------------------------------------------------------------------------
# driver-side fast path for broadcast-sized dictionaries


def _lev(a: str, b: str, cap: int) -> int:
    """Plain Levenshtein (matches Spark's F.levenshtein), early-exit > cap."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        best = cur[0]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
            best = min(best, cur[j])
        if best > cap:
            return cap + 1
        prev = cur
    return prev[lb]


def build_canon_map_local(candidate_dict, max_lev: int = 2):
    """Same (entity_id, canonical_id) mapping as build_canon_map, computed
    driver-side in pandas + union-find.

    The candidate dictionary is broadcast-sized BY CONSTRUCTION (it ships to
    every labeler worker), so the canon map derived from it never needs a
    cluster: blocked pairwise Levenshtein over a few thousand surfaces is
    microseconds-to-milliseconds, versus seconds of driver-loop latency for
    the iterative DataFrame CC. The distributed path (build_canon_map)
    remains the correct tool when canonicalizing an OPEN entity set (e.g.
    clustering emergent entities mined from the corpus itself) and is kept
    tested against this one (tests/test_cc.py::test_local_equals_distributed).

    Returns a pandas DataFrame (entity_id, canonical_id), non-roots only.
    """
    import pandas as pd

    df = candidate_dict[["entity_id", "alias", "prior", "ent_class"]].copy()
    # per entity: best surface = max by (prior, alias) — sort ascending and
    # take the last row per entity (same as Spark's max_by(struct(...)))
    cls_first = df.groupby("entity_id", sort=False)["ent_class"].first()
    df = df.sort_values(["prior", "alias"], kind="mergesort")
    best = (df.groupby("entity_id", sort=False).last().reset_index()
            [["entity_id", "alias"]].rename(columns={"alias": "surface"}))
    best["ent_class"] = best["entity_id"].map(cls_first)

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    best["block"] = best["surface"].str.split(" ").str[0]
    for (_, _), grp in best.groupby(["ent_class", "block"], sort=False):
        rows = sorted(zip(grp["entity_id"], grp["surface"]))
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ei, si = rows[i]
                ej, sj = rows[j]
                if abs(len(si) - len(sj)) <= max_lev and \
                        _lev(si, sj, max_lev) <= max_lev:
                    union(ei, ej)

    out = [(e, find(e)) for e in best["entity_id"] if find(e) != e]
    return pd.DataFrame(out, columns=["entity_id", "canonical_id"])
