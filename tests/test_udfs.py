"""B25/B28 gates: plain-pandas goldens for the UDAF and the SQL-registered
UDF, plus plan-shape checks that both stay on the Arrow path."""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _plan(df, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


def test_udaf_matches_plain_pandas(spark):
    from kgpipe.queries.udfs import udaf_weighted_doclen

    got = (
        udaf_weighted_doclen(spark, SF)
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["v"] = docs["text"].str.len().astype(float)
    docs["w"] = docs["text"].str.split(" ").str.len().astype(float)
    want = (
        docs.groupby("lang")
        .apply(
            lambda g: pd.Series(
                {
                    "w_char_len": round((g.v * g.w).sum() / g.w.sum(), 4),
                    "n_docs": len(g),
                }
            ),
            include_groups=False,
        )
        .reset_index()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got["w_char_len"], want["w_char_len"],
                                   rtol=1e-9)
    assert got["n_docs"].astype(int).tolist() == want["n_docs"].astype(
        int).tolist()


def test_sql_udf_matches_builtin(spark):
    from kgpipe.queries.udfs import sql_udf_token_stats

    got = (
        sql_udf_token_stats(spark, SF)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["ntok"] = docs["text"].str.split(" ").str.len()
    want = (
        docs.groupby("source")
        .agg(n_docs=("ntok", "size"), total_tokens=("ntok", "sum"),
             max_tokens=("ntok", "max"))
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert got["total_tokens"].tolist() == want["total_tokens"].tolist()
    assert got["max_tokens"].tolist() == want["max_tokens"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()


def test_udaf_plan_is_arrow_aggregate(spark):
    from kgpipe.queries.udfs import udaf_weighted_doclen

    p = _plan(udaf_weighted_doclen(spark, SF))
    # Spark 4 names the grouped-agg Arrow node ArrowAggregatePython
    # (earlier versions: AggregateInPandas)
    assert "ArrowAggregatePython" in p or "AggregateInPandas" in p, p
    assert "BatchEvalPython" not in p, p


def test_sql_udf_plan_is_arrow_eval(spark):
    from kgpipe.queries.udfs import sql_udf_token_stats

    p = _plan(sql_udf_token_stats(spark, SF))
    assert "ArrowEvalPython" in p, p
    assert "BatchEvalPython" not in p, p
