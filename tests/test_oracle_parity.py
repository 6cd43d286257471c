"""Replicates the driver's Spark-vs-DuckDB comparison for every registered
query at sf0.001 (fast); the driver runs the same at sf0.01."""

import pytest

from kgpipe.queries import ORACLES, QUERIES
from kgpipe.queries.parity import compare

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    r = compare(spark, name, SF)
    assert r["ok"], r.get("detail", r)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    qs, os_ = se.queries(), se.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40
