"""The relation extractor must work with ANY predicate table, not just the
fixture's planted phrases — round 1 hard-wired the extractor to the fixture
package; these tests pin the decoupling."""

from __future__ import annotations

import pandas as pd
import pytest

from kgpipe.operators.relations import extract_triples
from kgpipe.predicates import (
    DEFAULT_PRED_PHRASES,
    load_predicates,
    predicates_dict,
    predicates_df,
)


@pytest.fixture()
def custom_linked(spark):
    """Hand-built linked mentions whose connective phrase ('leads') is NOT
    in the default predicate table."""
    rows = [
        # intra-turn: "Alice leads Platform" — spans at [0,5) and [12,20)
        ("c1", 0, 0, 5, "ent:alice", "Alice leads Platform"),
        ("c1", 0, 12, 20, "ent:platform", "Alice leads Platform"),
        # cross-turn: turn 1 opens with "leads " then a mention
        ("c1", 1, 6, 11, "ent:squad", "leads Squad"),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, span_start int, span_end int, "
        "entity_id string, text string",
    )


def test_custom_predicates_extract(spark, custom_linked):
    custom = {"leads": "leads_team"}
    got = {
        (r.subj, r.pred, r.obj)
        for r in extract_triples(
            spark, custom_linked, window=3, predicates=custom
        ).collect()
    }
    assert ("ent:alice", "leads_team", "ent:platform") in got
    assert ("ent:platform", "leads_team", "ent:squad") in got


def test_default_predicates_miss_custom_phrase(spark, custom_linked):
    # with the default table, 'leads' matches nothing
    assert (
        extract_triples(spark, custom_linked, window=3).count() == 0
    )


def test_operators_no_longer_import_fixtures():
    import subprocess

    r = subprocess.run(
        ["grep", "-rn", "kgpipe.fixtures", "kgpipe/operators/",
         "kgpipe/streaming/", "--include=*.py"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.stdout.strip() == "", r.stdout


def test_predicate_forms_normalize(spark, tmp_path):
    d = {"reports to": "reports_to"}
    assert predicates_dict(d) == d
    pdf = pd.DataFrame({"phrase": ["reports to"], "pred": ["reports_to"]})
    assert predicates_dict(pdf) == d
    sdf = predicates_df(spark, d)
    assert predicates_dict(sdf) == d
    assert predicates_dict(None) == DEFAULT_PRED_PHRASES
    p = tmp_path / "preds.parquet"
    pdf.to_parquet(p)
    assert load_predicates(str(p)) == d
    with pytest.raises(ValueError):
        bad = tmp_path / "bad.parquet"
        pd.DataFrame({"x": [1]}).to_parquet(bad)
        load_predicates(str(bad))
