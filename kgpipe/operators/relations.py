"""Relation / triple extraction per turn-window (SURVEY.md A8/A9).

The reference emitted structured fields per document by pairing labeled
spans with pattern phrases (SURVEY.md §2C step 6); lifted to triples per
BASELINE.json. The graft expresses the whole stage with **window functions
and broadcast joins — zero Python** in the hot path:

* intra-turn: consecutive linked mentions (ordered by span_start) whose
  between-text normalizes to a predicate phrase -> (prev_entity, pred, entity)
* cross-turn (the turn-window case): a turn that OPENS with a predicate
  phrase followed by a mention has a dangling subject; it resolves to the
  most recent mention in the preceding ``window`` turns of the same
  conversation (Window.orderBy(turn_idx).rangeBetween(-window, -1)).

Ordering is always explicit on (conv_id, turn_idx, span_start) — never
partition/task order (BASELINE.json per-row invariant).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgpipe.predicates import predicates_df


def _norm(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def extract_triples(spark: SparkSession, linked: DataFrame,
                    window: int = 3, chunk: int | None = 4096,
                    predicates=None) -> DataFrame:
    """linked mentions (with text col) -> raw triples.

    Returns (subj, pred, obj, conv_id, turn_idx, conf). Entity ids are
    pre-canonicalization (may include ``~v1`` variants).

    ``chunk`` is the skew treatment the north rule calls "salted by
    conv_id": a per-conversation window puts a 10^6-turn hot conversation
    into ONE task. With ``chunk=C`` the window partitions by
    ``(conv_id, turn_idx // C)`` — task size is bounded by C turns no
    matter how hot the key — and the only rows that lose their lag context
    (each chunk's first mention-row) are repaired by joining a tiny
    per-chunk summary (last mention of the previous chunk; the repair is
    exact because intra-turn pairs never cross a chunk boundary — chunking
    is by turn — and the cross-turn lookback ``window`` << C).
    ``chunk=None`` is the unchunked reference plan; equality between the
    two is pinned by tests/test_relations_chunk.py.

    Single-pass plan: ONE window (per-conversation lag over the explicit
    total order (turn_idx, span_start, span_end)) yields both cases —

    * intra-turn (prev mention in the SAME turn): the text strictly between
      the previous mention and this one is a predicate phrase
      -> (prev_entity, pred, entity), conf 1.0
    * cross-turn (this row is its turn's FIRST mention): the turn's prefix
      is a predicate phrase and the nearest preceding mention-bearing turn
      is within `window` -> that turn's last entity becomes the subject,
      conf 0.9 — lag(entity) at a turn's first mention IS exactly "last
      mention of the nearest prior turn", so no groupBy/self-join is needed

    ``predicates`` is any form kgpipe.predicates accepts (dict / pandas /
    DataFrame / None for the built-in default table) — the extractor is not
    tied to any particular phrase set.

    — so the whole stage is one shuffle on conv_id plus one broadcast join,
    replacing the previous three-branch union (two window shuffles + a
    groupBy + a join) whose repeated subtrees also forced the caller to
    persist `linked`. Semantics are pinned by the planted-gold e2e tests
    and the streaming-parity test (the keyed-state op mirrors this logic).
    """
    preds = predicates_df(spark, predicates)

    base = linked.select("conv_id", "turn_idx", "span_start", "span_end",
                         "entity_id", "text")
    if chunk is None:
        w = Window.partitionBy("conv_id").orderBy(
            "turn_idx", "span_start", "span_end")
        m = (base
             .withColumn("prev_turn", F.lag("turn_idx").over(w))
             .withColumn("prev_end", F.lag("span_end").over(w))
             .withColumn("prev_ent", F.lag("entity_id").over(w)))
    else:
        if window >= chunk:
            raise ValueError("chunk must exceed the turn window")
        base = base.withColumn(
            "_chunk", (F.col("turn_idx") / F.lit(chunk)).cast("long"))
        w = Window.partitionBy("conv_id", "_chunk").orderBy(
            "turn_idx", "span_start", "span_end")
        m = (base
             .withColumn("prev_turn", F.lag("turn_idx").over(w))
             .withColumn("prev_end", F.lag("span_end").over(w))
             .withColumn("prev_ent", F.lag("entity_id").over(w)))
        # repair each chunk's first mention-row: its true predecessor is
        # the LAST mention of the previous chunk (one summary row per
        # (conv, chunk) — a tiny shuffle). Only the cross-turn case can
        # span a boundary, so prev_end needs no repair.
        # ONE max_by over a (turn, ent) struct: taking turn and entity via
        # two separate max_by calls could pair them from different rows on
        # an ordering tie (unreachable today — one linked row per span —
        # but load-bearing if upstream ever links k>1)
        summary = (base.groupBy("conv_id", "_chunk").agg(
            F.max_by(F.struct(F.col("turn_idx").alias("b_turn"),
                              F.col("entity_id").alias("b_ent")),
                     F.struct("turn_idx", "span_start", "span_end"))
             .alias("_b"))
            .select("conv_id",
                    (F.col("_chunk") + 1).alias("_chunk"),
                    F.col("_b.b_turn").alias("b_turn"),
                    F.col("_b.b_ent").alias("b_ent")))
        m = (m.join(summary, ["conv_id", "_chunk"], "left")
             .withColumn("prev_turn",
                         F.coalesce("prev_turn", "b_turn"))
             .withColumn("prev_ent",
                         F.coalesce("prev_ent", "b_ent"))
             .drop("b_turn", "b_ent", "_chunk"))

    intra_case = F.col("prev_turn") == F.col("turn_idx")
    cross_case = (
        F.col("prev_turn").isNotNull()
        & (F.col("prev_turn") < F.col("turn_idx"))
        & (F.col("prev_turn") >= F.col("turn_idx") - window)
    )
    between = F.col("text").substr(
        F.col("prev_end") + 1, F.col("span_start") - F.col("prev_end"))
    prefix = F.col("text").substr(F.lit(1), F.col("span_start"))

    phrased = (
        m.withColumn(
            "phrase_norm",
            F.when(intra_case, _norm(between))
             .when(cross_case, _norm(prefix)))
        .filter(F.col("phrase_norm").isNotNull())
    )
    return (
        phrased.join(F.broadcast(preds),
                     F.col("phrase_norm") == preds["phrase"], "inner")
        .select(
            F.col("prev_ent").alias("subj"),
            F.col("pred"),
            F.col("entity_id").alias("obj"),
            "conv_id",
            "turn_idx",
            F.when(intra_case, F.lit(1.0)).otherwise(F.lit(0.9))
             .cast("float").alias("conf"),
        )
    )


# --------------------------------------------------------------------------
# Fused turn-digest extraction: the narrow-shuffle form of the same
# semantics.
#
# ``extract_triples`` above windows over EXPLODED mention rows, each
# carrying the full turn text — so the pipeline's one wide shuffle moves
# ~(corpus bytes x mentions-per-turn). Measured on the x256 scaling corpus
# that is 4.19 GB of shuffle write for a 6.4 GB input; at the north rule's
# 10^12-turn scale it means shuffling the whole table to extract triples.
#
# Everything the window actually DECIDES, though, is turn-local except one
# thing: the cross-turn subject (the last linked mention of the nearest
# preceding mention-bearing turn). So the fused form computes all
# turn-local work — link filtering, consecutive-pair predicate matching,
# the turn-prefix predicate match — in ONE Arrow-batched pass over the
# labeled rows, where the text already lives, and emits one NARROW row per
# mention-bearing turn (a few ids + a small intra-triple array, no text).
# Only those ~50-byte rows enter the conv_id window: the shuffle drops
# from O(corpus) to O(turns x ids). Measured at sf0.1 (short ~165-byte
# synthetic turns): total pipeline shuffle write 12.8 -> 6.2 MB and
# executor CPU -40-45% for identical output; the remaining bytes are the
# narrow per-turn window plus the final triple dedup — no text in ANY
# shuffle. On realistic kilobyte-scale turns the factor is the
# text-to-ids byte ratio (~20x and up). The dictionary + predicate tables ride the SAME
# broadcast mechanism the labeler already uses (spark broadcast of plain
# dicts — the scale-correct form; a JVM map literal would bloat the plan
# past a few thousand aliases).
#
# Equality with the exploded path on both labeler paths is pinned by
# tests/test_relations_fused.py; semantics doc is `extract_triples`'s.


def turn_digests(spark: SparkSession, labeled: DataFrame,
                 candidate_dict, predicates=None,
                 canon: dict | None = None,
                 inline_labeler: str | None = None,
                 model=None) -> DataFrame:
    """labeled transcripts -> one narrow row per mention-bearing turn:

    (conv_id, turn_idx, intra: array<(subj, pred, obj)>, first_ent,
     first_pred, last_ent)

    * ``intra``: triples from consecutive LINKED mentions of this turn
      whose between-text normalizes to a predicate phrase (conf 1.0 case).
    * ``first_ent``/``first_pred``: the turn's first linked mention and
      the predicate its prefix matches (null if none) — the dangling
      subject of the cross-turn case.
    * ``last_ent``: the turn's last linked mention — the resolver target
      for the NEXT turn's dangling subject.

    Linking replicates the exploded path exactly: top-1 candidate per
    (normalized alias, class) with the (prior desc, entity_id asc) total
    order; mentions without a dictionary alias are dropped BEFORE pairing,
    exactly like link_entities' inner join. Normalization matches the
    fixture generator's python ``_norm`` (lower + whitespace collapse);
    the JVM ``norm_surface`` agrees on space-delimited text, which the
    alias registry guarantees for its side.

    ``canon`` (entity_id -> canonical_id, driver-side dict): when given,
    it is composed into the link map HERE, at broadcast-build time — the
    digests then carry canonical ids everywhere and the downstream
    canonicalize stage (two broadcast joins + a corpus-scale dedup
    exchange) disappears entirely. The composition is free: the canon map
    derives from the same broadcast-sized dictionary (operators/canon.py
    build_canon_map_local), so rewriting the link map's values is a
    driver-side dict pass, not a join.

    ``inline_labeler``: when ``"gaz"`` or ``"trained"``, sequence labeling
    runs INSIDE this UDF (``labeled`` may then be the bare transcripts) —
    one ArrowEvalPython node instead of two chained ones. Spark cannot
    merge dependent Python UDFs, so the labeled->digest form ships every
    turn's text across the JVM<->Python boundary TWICE and the span
    structs once more on the way back; job CPU counters showed the
    executor threads ~87% idle waiting on exactly this traffic. Inlining
    halves the Arrow volume: text crosses once, spans never leave Python.
    ``"trained"`` uses ``model`` (operators/train.TrainedLabeler) with the
    same decode the standalone trained labeler uses. Default ``None``
    keeps the two-UDF form (consumes a ``spans`` column) — the shape the
    standalone-labeled intermediates already have.

    The inner pairing loop stays per-row Python BY MEASUREMENT: on a
    20k-turn sf0.1 batch (1.18 spans/turn) the loop is 80 ms vs 532 ms
    for the numpy Viterbi labeling it follows — 13% of the UDF, and the
    UDF shares the wall with the JVM scan/shuffle stages. A numpy
    flatten of the span arrays would bound the win at a few percent
    end-to-end while churning the one plan-gated hot path, so it is
    deliberately not taken until a profile says labeling stopped
    dominating.
    """

    from kgpipe.operators.linker import top1_dict
    from kgpipe.predicates import predicates_dict

    t1 = top1_dict(candidate_dict)
    link_map = {
        (a, c): e for a, c, e in
        zip(t1["alias"], t1["ent_class"], t1["entity_id"])
    }
    if canon:
        link_map = {k: canon.get(v, v) for k, v in link_map.items()}
    pred_map = predicates_dict(predicates)

    gaz = trans = None
    if inline_labeler is not None:
        from kgpipe.operators.labeler import build_gazetteer, build_transitions

        if "spans" in labeled.columns:
            # inline mode RE-labels inside the digest UDF: accepting a
            # pre-labeled frame here would silently discard the caller's
            # spans (wasted upstream work, and divergence if they were
            # produced with different weights)
            raise ValueError(
                "inline_labeler recomputes labels inside the digest UDF "
                "but the input already has a 'spans' column — pass the "
                "bare transcripts, or drop inline_labeler to consume the "
                "existing spans")
        gaz = build_gazetteer(candidate_dict)
        trans = build_transitions()
        if inline_labeler == "trained" and model is None:
            raise ValueError("inline_labeler='trained' needs a model")
    bc = spark.sparkContext.broadcast(
        (link_map, pred_map, gaz, trans, model, inline_labeler))

    # The UDF returns a 0-or-1-element ARRAY per turn and the caller
    # explodes it, instead of a struct + `last_ent IS NOT NULL` filter:
    # PushDownPredicates rewrites such a filter below the projection by
    # substituting the UDF call into the predicate, and ExtractPythonUDFs
    # then materializes TWO ArrowEvalPython nodes — the whole digest (and
    # any inlined labeler) executed twice per row. explode() drops empty
    # arrays natively, there is no filter to push, and the plan gate
    # (tests/test_plans.py) pins exactly one ArrowEvalPython.
    out_type = (
        "array<struct<"
        "intra: array<struct<subj:string,pred:string,obj:string>>, "
        "first_ent: string, first_pred: string, last_ent: string>>"
    )

    def _n(s: str) -> str:
        return " ".join(s.lower().split())

    def _digest_batch(texts: pd.Series, spans_col) -> pd.Series:
        link, preds, g, tr, mdl, mode = bc.value
        if mode == "gaz":
            from kgpipe.operators.labeler import label_texts

            spans_col = label_texts(texts, g, tr)
        elif mode == "trained":
            from kgpipe.operators.train import decode_spans

            spans_col = decode_spans(texts, mdl, g)
        out: list[list[dict]] = []
        for text, spans in zip(texts, spans_col):
            linked = []
            if text is not None and spans is not None:
                # struct rows from the spans column expose ["start"] etc.;
                # the in-process labelers yield (start, end, cls, score)
                # tuples — normalize without copying when already tuples
                sp = sorted(
                    ((s[0], s[1], s[2]) if isinstance(s, tuple)
                     else (s["start"], s["end"], s["ent_type"])
                     for s in spans),
                    key=lambda t: (t[0], t[1]))
                for st, en, ty in sp:
                    ent = link.get((_n(text[st:en]), ty))
                    if ent is not None:
                        linked.append((st, en, ent))
            if not linked:
                out.append([])
                continue
            intra = []
            for (ps, pe, pent), (cs, ce, cent) in zip(linked, linked[1:]):
                pr = preds.get(_n(text[pe:cs]))
                if pr is not None:
                    intra.append({"subj": pent, "pred": pr, "obj": cent})
            out.append([{
                "intra": intra,
                "first_ent": linked[0][2],
                "first_pred": preds.get(_n(text[:linked[0][0]])),
                "last_ent": linked[-1][2],
            }])
        return pd.Series(out, index=texts.index)

    if inline_labeler is None:
        @F.pandas_udf(out_type)
        def digest(texts: pd.Series, spans_col: pd.Series) -> pd.Series:
            return _digest_batch(texts, spans_col)

        d = labeled.select(
            "conv_id", "turn_idx",
            F.explode(digest("text", "spans")).alias("d"))
    else:
        @F.pandas_udf(out_type)
        def digest_inline(texts: pd.Series) -> pd.Series:
            return _digest_batch(texts, None)

        d = labeled.select(
            "conv_id", "turn_idx",
            F.explode(digest_inline("text")).alias("d"))
    return d.select("conv_id", "turn_idx", "d.intra", "d.first_ent",
                    "d.first_pred", "d.last_ent")


def triples_from_digests(digests: DataFrame, window: int = 3,
                         chunk: int | None = 4096,
                         dedup: bool = False) -> DataFrame:
    """Per-turn digests -> raw triples; same output contract as
    ``extract_triples``.

    SINGLE-PASS plan: the digest subtree (scan -> labeler UDF -> digest
    UDF) is consumed exactly ONCE. The first fused form consumed it three
    times — window branch, per-chunk summary branch, intra-explode branch
    — and Catalyst cannot ReusedExchange them (each branch prunes
    different columns, so the exchange subplans differ): the x256 probe
    showed the full scan+Arrow-UDF stage executing 2-3x (636s + 457s
    executor CPU for one corpus). Two rewrites fix it structurally:

    * **ghost-row chunk overlap instead of a summary join.** A digest row
      within ``window`` turns of its chunk's end (``turn_idx % chunk >=
      chunk - window`` — row-local, no aggregate needed) is duplicated
      into the NEXT chunk as a non-emitting ghost. Ghost turn_idx values
      are strictly below every real turn of that chunk, so after the
      (conv_id, _chunk) window sort the ghosts sit at the front and only
      the chunk's FIRST real row can see one via lag(1) — exactly the row
      the old summary join repaired. Equivalence with the join form: the
      old repair handed the first row the previous chunk's last digest
      unconditionally and the ``>= turn_idx - window`` filter discarded
      far-away subjects; ghosts only reach back ``window`` turns, so the
      post-filter result is identical. Duplication is bounded by
      window/chunk (~0.1% of rows), vs a join whose build side is one row
      per (conv, chunk).
    * **one explode instead of union(intra, cross).** Each post-window row
      emits concat(its intra triples with conf 1.0, the cross triple as a
      0-or-1-element array with conf 0.9) through a single explode —
      union(A(d), B(d)) would have duplicated the d subtree again.

    The ONLY shuffle is the conv_id window over the narrow digest rows.
    Output equality with the exploded reference plan (and chunk=None) is
    pinned by tests/test_relations_fused.py."""
    if chunk is None:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        d = (digests.withColumn("_ghost", F.lit(False))
             .withColumn("prev_turn", F.lag("turn_idx").over(w))
             .withColumn("prev_last", F.lag("last_ent").over(w)))
    else:
        if window >= chunk:
            raise ValueError("chunk must exceed the turn window")
        own = F.struct(
            (F.col("turn_idx") / F.lit(chunk)).cast("long").alias("c"),
            F.lit(False).alias("g"))
        ghost = F.struct(
            ((F.col("turn_idx") / F.lit(chunk)).cast("long") + 1).alias("c"),
            F.lit(True).alias("g"))
        near_end = (F.col("turn_idx") % F.lit(chunk)) >= F.lit(chunk - window)
        d = (digests
             .withColumn("_cg", F.explode(
                 F.when(near_end, F.array(own, ghost))
                  .otherwise(F.array(own))))
             .withColumn("_chunk", F.col("_cg.c"))
             .withColumn("_ghost", F.col("_cg.g"))
             .drop("_cg"))
        w = Window.partitionBy("conv_id", "_chunk").orderBy("turn_idx")
        d = (d
             .withColumn("prev_turn", F.lag("turn_idx").over(w))
             .withColumn("prev_last", F.lag("last_ent").over(w)))

    cross_ok = (
        ~F.col("_ghost")
        & F.col("first_pred").isNotNull()
        & F.col("prev_turn").isNotNull()
        & (F.col("prev_turn") >= F.col("turn_idx") - window)
    )
    conf_f = lambda v: F.lit(v).cast("float")  # noqa: E731
    empty = F.array().cast(
        "array<struct<subj:string,pred:string,obj:string,conf:float>>")
    # coalesce: a null intra would null the whole concat and silently drop
    # the row's cross triple with it (digest rows always carry [], but the
    # guard costs nothing and the failure mode is silent data loss)
    intra_items = F.when(
        ~F.col("_ghost"),
        F.coalesce(
            F.transform("intra", lambda x: F.struct(
                x["subj"].alias("subj"), x["pred"].alias("pred"),
                x["obj"].alias("obj"), conf_f(1.0).alias("conf"))),
            empty),
    ).otherwise(empty)
    cross_items = F.when(cross_ok, F.array(F.struct(
        F.col("prev_last").alias("subj"),
        F.col("first_pred").alias("pred"),
        F.col("first_ent").alias("obj"),
        conf_f(0.9).alias("conf"),
    ))).otherwise(empty)
    items = F.concat(intra_items, cross_items)
    if dedup:
        # The triple dedup key is (subj, pred, obj, conv_id, turn_idx) —
        # it INCLUDES the turn, so duplicates are turn-local by definition
        # and each turn is exactly one pre-explode row here. Dedup the
        # per-turn array instead of a corpus-scale dropDuplicates
        # exchange: sort desc (equal (s,p,o) runs become adjacent with
        # conf DESC), keep each run's first element — i.e. MAX conf, a
        # deterministic rule where dropDuplicates kept a plan-dependent
        # arbitrary row when the same triple arose both intra (1.0) and
        # cross (0.9). All JVM higher-order functions, no shuffle.
        d = d.withColumn("_items", F.sort_array(items, asc=False))
        arr = F.col("_items")
        items = F.filter(arr, lambda x, i: (i == F.lit(0)) | (
            (x["subj"] != F.get(arr, i - 1)["subj"])
            | (x["pred"] != F.get(arr, i - 1)["pred"])
            | (x["obj"] != F.get(arr, i - 1)["obj"])))
    return (d
            .select("conv_id", "turn_idx",
                    F.explode(items).alias("t"))
            .select(F.col("t.subj").alias("subj"),
                    F.col("t.pred").alias("pred"),
                    F.col("t.obj").alias("obj"),
                    "conv_id", "turn_idx",
                    F.col("t.conf").alias("conf")))


def extract_triples_fused(spark: SparkSession, labeled: DataFrame,
                          candidate_dict, window: int = 3,
                          chunk: int | None = 4096,
                          predicates=None,
                          canon: dict | None = None,
                          dedup: bool = False,
                          inline_labeler: str | None = None,
                          model=None) -> DataFrame:
    """labeled -> raw triples via the narrow-shuffle digest path.

    With ``canon`` (entity_id -> canonical_id dict) and ``dedup=True`` the
    output is the FINAL canonical triple table — link map composed with
    the canon map at broadcast-build time, per-turn max-conf dedup — and
    the plan's only shuffle is the narrow digest window. Defaults produce
    pre-canonicalization raw triples, identical to ``extract_triples``.
    ``inline_labeler``/``model``: run labeling inside the digest UDF (see
    turn_digests) — ``labeled`` may then be the bare transcripts."""
    return triples_from_digests(
        turn_digests(spark, labeled, candidate_dict, predicates,
                     canon=canon, inline_labeler=inline_labeler,
                     model=model),
        window=window, chunk=chunk, dedup=dedup)
