"""Grouped-map and cogrouped-map pandas operators (SURVEY.md §2B B26/B27).

The relational pipeline stages deliberately avoid Python (everything is
window functions + broadcast joins), so these two operators exist as the
engine's general-purpose escape hatches for semantics Spark's built-ins
can't express — each with a golden pytest against a plain-pandas oracle
(tests/test_pandas_ops.py), since the DuckDB harness can't check Python
UDFs directly.

Scale notes: both shuffle once on their grouping key; group size is
bounded by the salting guidance in SURVEY.md §4.2 (a hot key must be
salted BEFORE a grouped-map op — the whole group materializes in one
pandas frame on one worker).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """B26 grouped-map: per-conversation turn/gap statistics via
    ``groupBy().applyInPandas`` — arbitrary per-group pandas logic
    (quantiles over inter-turn gaps) that has no window-function form."""
    schema = ("conv_id string, n_turns int, n_roles int, "
              "median_gap_s double, p95_gap_s double")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx", kind="mergesort")
        gaps = pdf["ts"].diff().dt.total_seconds().dropna()
        return pd.DataFrame([{
            "conv_id": pdf["conv_id"].iloc[0],
            "n_turns": len(pdf),
            "n_roles": pdf["role"].nunique(),
            "median_gap_s": float(gaps.median()) if len(gaps) else 0.0,
            "p95_gap_s": float(gaps.quantile(0.95)) if len(gaps) else 0.0,
        }])

    return (transcripts.select("conv_id", "turn_idx", "role", "ts")
            .groupBy("conv_id").applyInPandas(stats, schema))


def asof_join_events(left: DataFrame, right: DataFrame,
                     key: str = "user_id", on: str = "ts",
                     tolerance_s: int | None = None) -> DataFrame:
    """B27 cogrouped-map: nearest-earlier as-of join via
    ``cogroup().applyInPandas(pd.merge_asof)`` — the per-key pair of
    frames lands in one pandas call, the canonical Spark pattern for
    as-of semantics (SURVEY.md §2B B10/B27)."""
    schema = (f"{key} long, l_event_id long, l_ts timestamp, "
              "r_event_id long, r_ts timestamp")

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        cols = [key, "l_event_id", "l_ts", "r_event_id", "r_ts"]
        if ldf.empty:
            return pd.DataFrame(columns=cols)
        ldf = ldf.sort_values([on, "event_id"], kind="mergesort")
        r = (rdf.sort_values([on, "event_id"], kind="mergesort")
             [["event_id", on]]
             .rename(columns={"event_id": "r_event_id"}))
        r["r_ts"] = r[on]
        kw = {}
        if tolerance_s is not None:
            kw["tolerance"] = pd.Timedelta(seconds=tolerance_s)
        m = pd.merge_asof(ldf, r, on=on, allow_exact_matches=False,
                          direction="backward", **kw)
        return pd.DataFrame({
            key: m[key],
            "l_event_id": m["event_id"],
            "l_ts": m[on],
            "r_event_id": m["r_event_id"].astype("Int64"),
            "r_ts": m["r_ts"],
        })

    lsel = left.select(key, "event_id", on)
    rsel = right.select(key, "event_id", on)
    return lsel.groupBy(key).cogroup(rsel.groupBy(key)).applyInPandas(
        lambda l, r: merge(l, r), schema)
