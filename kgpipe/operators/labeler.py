"""CRF-style sequence labeling for mention/span detection (SURVEY.md A5).

The reference labels each document's token sequence with a linear-chain CRF
(python-crfsuite; SURVEY.md §2C steps 4-6, [R-MEM]). The graft re-expresses
the same decode as a **vectorized linear sequence model + Viterbi** inside a
scalar Arrow/pandas UDF (BASELINE.json input_hint: "vectorized pandas/Arrow
UDFs (no per-row Python)"):

* Emission scores are built batch-wide in numpy/pandas: gazetteer n-gram
  features (token n-gram is a known alias of class c -> boost B-c at the
  match start and I-c over the continuation), plus generic shape features
  (capitalization, digit-shape) weighted too low to open a span on their own.
* Transition scores are a dense (T, T) matrix enforcing BIO consistency
  (O->I-*, B-x->I-y, I-x->I-y are -inf).
* Decode is Viterbi, vectorized over the *batch* dimension: all turns in an
  Arrow batch are padded into an (R, L, T) emission tensor and the DP runs
  once per timestep over (R, T, T) — no per-row Python loop.

Because labeling is per-turn (scalar UDF), no grouping by conv_id is needed
at this stage at all — a 10^6-turn hot conversation costs nothing extra here
(SURVEY.md §4.2 row 1); skew only matters at the later grouped stages, which
salt.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgpipe.functions.tokenize import tokenize_batch
from kgpipe.schemas import ENT_CLASSES, SPANS_ARRAY, TAGS

N_TAGS = len(TAGS)
_O = 0
_B = {c: 1 + 2 * i for i, c in enumerate(ENT_CLASSES)}  # B-c tag index
_I = {c: 2 + 2 * i for i, c in enumerate(ENT_CLASSES)}  # I-c tag index

W_GAZ = 4.0       # per-token boost for a gazetteer n-gram match
W_SHAPE = 0.2     # capitalization / shape prior (< O baseline: never opens
W_O = 0.5         # a span alone)
NEG = -1e9
MAX_ALIAS_TOKENS = 4


def build_transitions() -> np.ndarray:
    """BIO-consistent transition matrix (additive log-domain scores)."""
    t = np.zeros((N_TAGS, N_TAGS), dtype=np.float32)
    for c in ENT_CLASSES:
        i_c = _I[c]
        # only B-c or I-c may precede I-c
        t[:, i_c] = NEG
        t[_B[c], i_c] = 0.0
        t[i_c, i_c] = 0.0
    return t


def build_gazetteer(candidate_dict: pd.DataFrame) -> dict[int, dict[str, int]]:
    """normalized alias (by token length) -> entity-class index.

    Keyed by n-gram length so batch matching does one hash map per length.
    """
    cls_idx = {c: i for i, c in enumerate(ENT_CLASSES)}
    gaz: dict[int, dict[str, int]] = {}
    for alias, cls in zip(candidate_dict["alias"], candidate_dict["ent_class"]):
        toks = alias.split()
        if not toks or len(toks) > MAX_ALIAS_TOKENS:
            continue
        gaz.setdefault(len(toks), {})[" ".join(toks)] = cls_idx[cls]
    return gaz


def label_texts(texts: pd.Series, gaz: dict[int, dict[str, int]],
                trans: np.ndarray) -> pd.Series:
    """Batch body: text -> list[(start, end, ent_type, score)] per row."""
    toks, starts, ends, row_id, row_lengths = tokenize_batch(texts)
    n_tok = len(toks)
    n_rows = len(texts)
    empty: list[tuple] = []
    if n_tok == 0:
        return pd.Series([empty] * n_rows, index=texts.index)

    norm = pd.Series(toks, dtype="object").str.lower()
    norm_np = norm.to_numpy()

    # --- emissions ---------------------------------------------------------
    em = np.zeros((n_tok, N_TAGS), dtype=np.float32)
    em[:, _O] = W_O

    # shape features: capitalized token -> weak prior on all B-*
    first_char = pd.Series(toks, dtype="object").str[:1]
    is_cap = first_char.str.isupper().fillna(False).to_numpy(dtype=bool)
    for c in ENT_CLASSES:
        em[is_cap, _B[c]] += W_SHAPE

    # gazetteer n-gram features, one vectorized map per n-gram length
    for ln, amap in gaz.items():
        if ln == 1:
            ng = norm
            valid = np.ones(n_tok, dtype=bool)
        else:
            if n_tok < ln:
                continue
            parts = [norm_np[i:n_tok - ln + 1 + i] for i in range(ln)]
            joined = parts[0].copy()
            for p in parts[1:]:
                joined = np.char.add(np.char.add(joined.astype(str), " "),
                                     p.astype(str))
            ng = pd.Series(joined)
            # n-gram must not cross a row boundary
            valid = row_id[: n_tok - ln + 1] == row_id[ln - 1:]
        hit = ng.map(amap)
        hit_pos = np.flatnonzero(hit.notna().to_numpy() & valid)
        if hit_pos.size == 0:
            continue
        hit_cls = hit.to_numpy()[hit_pos].astype(np.int64)
        b_tags = np.asarray([_B[ENT_CLASSES[c]] for c in hit_cls])
        np.add.at(em, (hit_pos, b_tags), W_GAZ)
        for off in range(1, ln):
            i_tags = np.asarray([_I[ENT_CLASSES[c]] for c in hit_cls])
            np.add.at(em, (hit_pos + off, i_tags), W_GAZ)

    # --- pad to (R, L, T) and Viterbi over the batch dimension -------------
    lmax = int(row_lengths.max())
    row_start = np.zeros(n_rows, np.int64)
    np.cumsum(row_lengths[:-1], out=row_start[1:])
    pos_in_row = np.arange(n_tok) - row_start[row_id]

    em_pad = np.full((n_rows, lmax, N_TAGS), NEG, dtype=np.float32)
    em_pad[row_id, pos_in_row] = em
    # padding steps: force O at zero cost so they never affect real scores
    pad_mask = np.arange(lmax)[None, :] >= row_lengths[:, None]
    em_pad[pad_mask] = np.array([0.0] + [NEG] * (N_TAGS - 1), dtype=np.float32)

    # start constraint: I-* cannot start a sequence
    start_pen = np.zeros(N_TAGS, dtype=np.float32)
    for c in ENT_CLASSES:
        start_pen[_I[c]] = NEG

    score = em_pad[:, 0, :] + start_pen[None, :]
    back = np.zeros((n_rows, lmax, N_TAGS), dtype=np.int8)
    for t in range(1, lmax):
        # (R, T_prev, 1) + (T_prev, T_cur) -> best prev per cur
        cand = score[:, :, None] + trans[None, :, :]
        best_prev = cand.argmax(axis=1)
        score = np.take_along_axis(cand, best_prev[:, None, :], axis=1)[:, 0, :]
        score = score + em_pad[:, t, :]
        back[:, t, :] = best_prev

    tags_pad = np.zeros((n_rows, lmax), dtype=np.int8)
    tags_pad[:, lmax - 1] = score.argmax(axis=1)
    for t in range(lmax - 1, 0, -1):
        tags_pad[:, t - 1] = np.take_along_axis(
            back[:, t, :], tags_pad[:, t, None].astype(np.int64), axis=1)[:, 0]

    # --- contiguous B/I runs -> char spans ---------------------------------
    out: list[list[tuple]] = []
    starts = starts.astype(np.int64)
    ends = ends.astype(np.int64)
    for r in range(n_rows):
        n = int(row_lengths[r])
        if n == 0:
            out.append(empty)
            continue
        tags_r = tags_pad[r, :n]
        off = int(row_start[r])
        spans: list[tuple] = []
        i = 0
        while i < n:
            tg = int(tags_r[i])
            if tg != _O and (tg - 1) % 2 == 0:  # B-*
                cls = ENT_CLASSES[(tg - 1) // 2]
                j = i + 1
                while j < n and int(tags_r[j]) == tg + 1:
                    j += 1
                spans.append((int(starts[off + i]), int(ends[off + j - 1]),
                              cls, 1.0))
                i = j
            else:
                i += 1
        out.append(spans)
    return pd.Series(out, index=texts.index)


def make_labeler_udf(spark: SparkSession, candidate_dict: pd.DataFrame):
    """Build the scalar pandas UDF; gazetteer ships as a Spark broadcast."""
    gaz = build_gazetteer(candidate_dict)
    trans = build_transitions()
    bc = spark.sparkContext.broadcast((gaz, trans))

    @F.pandas_udf(SPANS_ARRAY)
    def label_spans(texts: pd.Series) -> pd.Series:
        g, tr = bc.value
        return label_texts(texts, g, tr)

    return label_spans


def label_transcripts(spark: SparkSession, transcripts: DataFrame,
                      candidate_dict: pd.DataFrame) -> DataFrame:
    """transcripts -> + spans column (array<struct<start,end,ent_type,score>>)."""
    udf = make_labeler_udf(spark, candidate_dict)
    return transcripts.withColumn("spans", udf(F.col("text")))
