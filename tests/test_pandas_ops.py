"""Golden tests for the grouped-map / cogrouped-map operators (B26/B27):
the DuckDB harness can't check Python UDFs, so these pin Spark output
against a plain-pandas oracle computed on the same rows."""

from __future__ import annotations

import os

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_conversation_stats_matches_pandas(spark, unit_fixture_dir):
    from kgpipe.operators.pandas_ops import conversation_stats
    from kgpipe.pipeline import read_transcripts

    t = read_transcripts(
        spark, os.path.join(unit_fixture_dir, "transcripts.parquet"))
    got = {r.conv_id: (r.n_turns, r.n_roles,
                       round(r.median_gap_s, 6), round(r.p95_gap_s, 6))
           for r in conversation_stats(t).collect()}

    pdf = pd.read_parquet(os.path.join(unit_fixture_dir, "transcripts.parquet"))
    want = {}
    for cid, grp in pdf.groupby("conv_id"):
        grp = grp.sort_values("turn_idx", kind="mergesort")
        gaps = grp["ts"].diff().dt.total_seconds().dropna()
        want[cid] = (len(grp), grp["role"].nunique(),
                     round(float(gaps.median()) if len(gaps) else 0.0, 6),
                     round(float(gaps.quantile(0.95)) if len(gaps) else 0.0, 6))
    assert got == want


def test_asof_join_matches_pandas(spark):
    from kgpipe.operators.pandas_ops import asof_join_events

    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    left = ev.filter("event_type = 'purchase'")
    right = ev.filter("event_type = 'click'")
    got = {(r.user_id, r.l_event_id): r.r_event_id
           for r in asof_join_events(left, right).collect()}

    pdf = pd.read_parquet(os.path.join(SF, "events.parquet"))
    want = {}
    for uid, grp in pdf.groupby("user_id"):
        l = (grp[grp.event_type == "purchase"]
             .sort_values(["ts", "event_id"], kind="mergesort"))
        r = (grp[grp.event_type == "click"]
             .sort_values(["ts", "event_id"], kind="mergesort"))
        if l.empty:
            continue
        m = pd.merge_asof(l, r[["event_id", "ts"]].rename(
            columns={"event_id": "r_event_id"}),
            on="ts", allow_exact_matches=False, direction="backward")
        for le, re_ in zip(m["event_id"], m["r_event_id"]):
            want[(uid, le)] = None if pd.isna(re_) else int(re_)
    assert got == want
    assert len(got) > 0
