"""Physical-plan shape gates: the properties that matter at 100 TB are
asserted, not eyeballed — filters reach the parquet scan, projections prune
the read schema, the dictionary join broadcasts, the fact-fact join does
NOT broadcast-nested-loop, and Python appears only as Arrow-vectorized
eval (SURVEY.md §4.1/§4.3)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def _plan(df, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


def test_filter_pushdown_and_column_pruning(spark):
    from kgpipe.queries.relational import scan_filter_project

    p = _plan(scan_filter_project(spark, SF))
    assert "PushedFilters: [" in p and "IsNotNull" in p, p
    # projection pruned to the columns the query touches
    scan = p[p.index("ReadSchema"):].splitlines()[0]
    assert "l_comment" not in scan, scan


def test_dimension_join_broadcasts(spark):
    from kgpipe.queries.relational import join_broadcast_dims

    p = _plan(join_broadcast_dims(spark, SF))
    assert "BroadcastHashJoin" in p, p


def test_fact_fact_join_is_not_bnlj(spark):
    from kgpipe.queries.relational import join_orders_lineitem_revenue

    p = _plan(join_orders_lineitem_revenue(spark, SF))
    assert "BroadcastNestedLoopJoin" not in p, p
    assert ("SortMergeJoin" in p or "ShuffledHashJoin" in p
            or "BroadcastHashJoin" in p), p


def test_linker_join_broadcasts_and_labeler_is_arrow(spark):
    import pandas as pd

    from kgpipe.fixtures.generator import materialize
    from kgpipe.operators.labeler import label_transcripts
    from kgpipe.operators.linker import dict_to_df, link_entities
    from kgpipe.operators.mentions import extract_mentions
    from kgpipe.pipeline import read_transcripts
    import os

    fx = materialize("unit")
    t = read_transcripts(spark, os.path.join(fx, "transcripts.parquet"))
    cd = pd.read_parquet(os.path.join(fx, "candidate_dict.parquet"))
    linked = link_entities(
        extract_mentions(label_transcripts(spark, t, cd)),
        dict_to_df(spark, cd), k=1)
    p = _plan(linked)
    assert "BroadcastHashJoin" in p, p
    # vectorized Arrow eval, never row-at-a-time Python
    assert "ArrowEvalPython" in p, p
    assert "BatchEvalPython" not in p, p


def test_whole_stage_codegen_covers_relational_ops(spark):
    from kgpipe.queries.relational import agg_pricing_summary

    # AQE finalizes the plan only at execution; run the query, then check
    # the executed plan carries whole-stage-codegen stages ("*(n) Op")
    df = agg_pricing_summary(spark, SF)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in p, p[:800]


def test_fused_triples_shuffle_no_text(spark):
    """The fused extractor's whole point: no Exchange in the triples plan
    may carry the text column (the exploded reference plan has exactly
    that text-bearing exchange — asserted as the negative control so this
    test keeps discriminating if plan formatting changes)."""
    import io
    import os
    import re
    from contextlib import redirect_stdout

    import pandas as pd

    from kgpipe.fixtures.generator import materialize
    from kgpipe.pipeline import read_transcripts, run_pipeline

    fx = materialize("unit")
    t = read_transcripts(spark, os.path.join(fx, "transcripts.parquet"))
    cd = pd.read_parquet(os.path.join(fx, "candidate_dict.parquet"))

    def text_exchanges(mode: str) -> int:
        out = run_pipeline(spark, t, cd, extractor=mode)
        buf = io.StringIO()
        with redirect_stdout(buf):
            out["triples"].explain("formatted")
        blocks = re.split(r"\n\(\d+\) ", buf.getvalue())
        return sum(1 for b in blocks
                   if b.split("\n")[0].startswith("Exchange")
                   and re.search(r"\btext#", b))

    assert text_exchanges("fused") == 0
    assert text_exchanges("exploded") >= 1  # negative control


def test_fused_triples_single_corpus_pass(spark):
    """The fused triples plan must scan the transcripts (and hence run the
    labeler + digest Arrow UDFs) exactly ONCE. The first fused form
    consumed the digest subtree from three branches (window, per-chunk
    summary join, intra explode) and Catalyst could not ReusedExchange
    them because each branch pruned different columns — the x256 probe
    measured the full scan+UDF stage executing 2-3x (636s + 457s executor
    CPU for one corpus). The ghost-row chunk overlap + single
    concat/explode emission keep the digest subtree single-consumer."""
    import os

    import pandas as pd

    from kgpipe.fixtures.generator import materialize
    from kgpipe.pipeline import read_transcripts, run_pipeline

    fx = materialize("unit")
    t = read_transcripts(spark, os.path.join(fx, "transcripts.parquet"))
    cd = pd.read_parquet(os.path.join(fx, "candidate_dict.parquet"))
    out = run_pipeline(spark, t, cd, extractor="fused")
    p = out["triples"]._jdf.queryExecution().executedPlan().toString()
    assert p.count("transcripts.parquet") == 1, p[:1200]
    # ... and the ONLY shuffle is the narrow digest window: with the canon
    # map composed into the link map and dedup done per turn, the generic
    # canonicalize stage's corpus-scale dedup exchange is gone
    import re

    assert len(re.findall(r"\bExchange ", p)) == 1, p[:1200]
    # ... and labeling is inlined into the digest UDF: ONE ArrowEvalPython
    # node, so each turn's text crosses the JVM<->Python boundary once
    # (the chained labeler->digest form shipped it twice plus the span
    # structs back in between — Spark cannot merge dependent Python UDFs)
    assert len(re.findall(r"ArrowEvalPython", p)) == 1, p[:1200]


def test_labeler_udf_executes_once_in_mention_plans(spark):
    """Each intermediate plan must run the labeler UDF exactly once per
    scan. Plain explode over a UDF-derived span column triggers
    InferFiltersFromGenerate + predicate pushdown, which substitutes the
    UDF call into the inferred size()>0 filter — a second ArrowEvalPython
    executing the whole labeler again per row (extract_mentions uses
    explode_outer + an IS NOT NULL filter on the Generate output, which
    cannot be pushed below it)."""
    import os
    import re

    import pandas as pd

    from kgpipe.fixtures.generator import materialize
    from kgpipe.pipeline import read_transcripts, run_pipeline

    fx = materialize("unit")
    t = read_transcripts(spark, os.path.join(fx, "transcripts.parquet"))
    cd = pd.read_parquet(os.path.join(fx, "candidate_dict.parquet"))
    out = run_pipeline(spark, t, cd, extractor="fused")
    for name in ("mentions", "linked"):
        p = out[name]._jdf.queryExecution().executedPlan().toString()
        assert p.count("transcripts.parquet") == 1, (name, p[:900])
        assert len(re.findall(r"ArrowEvalPython", p)) == 1, (name, p[:900])


def test_capped_similarity_join_plan_shape(spark):
    """The two-tier canon similarity join must keep its scale shapes in
    the physical plan: the block-size table joins back via BROADCAST (one
    row per block, never a shuffle of the surfaces for sizing), no
    cartesian/BNLJ anywhere, and the over-cap band pairs via equi-join
    (SMJ/SHJ/BHJ) — the all-pairs blow-up stays confined to under-cap
    blocks by construction."""
    import pandas as pd

    from kgpipe.operators.canon import entity_surfaces, similarity_edges
    from kgpipe.operators.linker import dict_to_df

    cd = pd.DataFrame({
        "alias": [f"tok{i % 7} name{i:04d}" for i in range(300)],
        "entity_id": [f"E{i:04d}" for i in range(300)],
        "prior": [1.0] * 300,
        "ent_class": ["ORG"] * 300,
    })
    edges = similarity_edges(entity_surfaces(dict_to_df(spark, cd)),
                             block_cap=16, sort_window=4)
    p = edges._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p  # the sizes join-back
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
