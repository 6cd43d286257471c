"""B25 (grouped-agg pandas UDAF) and B28 (SQL-registered UDF) — the two
Python-UDF surfaces SURVEY.md §2B lists beyond the scalar/grouped-map/
cogrouped forms already exercised by the labeler and pandas_ops.

Both stay on the Arrow path (pandas_udf → AggregateInPandas /
ArrowEvalPython), never row-at-a-time BatchEvalPython; tests/test_plans.py
asserts the plan nodes. Both are SQL-expressible, so the DuckDB oracle does
a full value-hash check rather than rows-only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType, LongType

from kgpipe.queries.registry import load, register


@pandas_udf(DoubleType())
def _weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """Grouped-agg pandas UDAF: Arrow ships each group's columns as
    pandas Series; the return scalar is the group's aggregate."""
    sw = float(w.sum())
    return float((v * w).sum() / sw) if sw else float("nan")


@register(
    "udaf_weighted_doclen",
    oracle="""
    SELECT lang,
           round(sum(CAST(length(text) AS DOUBLE)
                     * len(string_split(text, ' ')))
                 / sum(len(string_split(text, ' '))), 4) AS w_char_len,
           count(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def udaf_weighted_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count-weighted mean character length per language (B25).

    The UDAF runs once per group after the hash-partition shuffle on
    ``lang`` — same shuffle shape as a built-in agg, so it scales like one;
    only the per-group reduction is Python (Arrow-batched).
    """
    d = load(spark, sf_dir, "documents")
    v = F.length("text").cast("double")
    w = F.size(F.split("text", " ")).cast("double")
    return d.groupBy("lang").agg(
        F.round(_weighted_mean(v, w), 4).alias("w_char_len"),
        _group_size(F.lit(1)).alias("n_docs"),
    )


@pandas_udf(LongType())
def _group_size(v: pd.Series) -> int:
    # Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates in
    # one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row count rides the
    # same Arrow path.
    return len(v)


@pandas_udf(IntegerType())
def _py_token_count(t: pd.Series) -> pd.Series:
    return t.str.split(" ").str.len().astype("int32")


def register_sql_udfs(spark: SparkSession) -> None:
    """Idempotent registration of the SQL-callable UDF surface (B28)."""
    spark.udf.register("udf_token_count", _py_token_count)


@register(
    "sql_udf_token_stats",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(max(len(string_split(text, ' '))) AS INT)    AS max_tokens
    FROM documents
    GROUP BY source
    """,
)
def sql_udf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A registered pandas UDF driven through ``spark.sql`` (B28): the SQL
    string calls ``udf_token_count(text)`` like any built-in; the plan
    still shows ArrowEvalPython (vectorized), not BatchEvalPython.
    """
    register_sql_udfs(spark)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT source,
               count(*)                                    AS n_docs,
               CAST(sum(udf_token_count(text)) AS BIGINT)  AS total_tokens,
               CAST(max(udf_token_count(text)) AS INT)     AS max_tokens
        FROM documents_v
        GROUP BY source
        """
    )
