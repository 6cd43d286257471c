"""Deterministic regex tokenizer with character offsets — vectorized.

The reference tokenized per document with NLTK-style word tokenization
(SURVEY.md §2C step 2, [R-MEM]); the graft re-specifies tokenization as a
pure-regex spec so it is reproducible offline, and implements it batch-at-a-
time: all texts in an Arrow batch are joined with a sentinel and scanned with
ONE compiled-regex pass (C-side), then token->row assignment is a vectorized
``np.searchsorted``. No per-row Python in the scan.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# word-ish runs (incl digits, '_', '~', '#') or single non-space symbol
TOKEN_PATTERN = r"[A-Za-z0-9_~#]+|[^\sA-Za-z0-9_~#]"
_TOKEN_RE = re.compile(TOKEN_PATTERN)
_SENTINEL = "\n"  # never appears in transcript text (single-line turns)


def tokenize_batch(texts: pd.Series):
    """Tokenize a batch of texts in one regex pass.

    Returns ``(toks, starts, ends, row_id, row_lengths)`` where ``toks`` is a
    list[str] of all tokens in batch order, ``starts``/``ends`` are int64
    char offsets *within each row's text*, ``row_id`` maps token -> row
    ordinal (0..len(texts)-1), and ``row_lengths[r]`` is the token count of
    row r.
    """
    vals = texts.fillna("").astype(str).str.replace(_SENTINEL, " ", regex=False)
    n_rows = len(vals)
    if n_rows == 0:
        return [], np.empty(0, np.int64), np.empty(0, np.int64), \
            np.empty(0, np.int64), np.zeros(0, np.int64)

    arr = vals.to_numpy()
    lens = np.fromiter((len(s) for s in arr), dtype=np.int64, count=n_rows)
    # row r occupies big[row_off[r] : row_off[r]+lens[r]]
    row_off = np.zeros(n_rows, np.int64)
    np.cumsum(lens[:-1] + 1, out=row_off[1:])
    big = _SENTINEL.join(arr)

    spans = np.array([m.span() for m in _TOKEN_RE.finditer(big)],
                     dtype=np.int64).reshape(-1, 2)
    if spans.size == 0:
        return [], np.empty(0, np.int64), np.empty(0, np.int64), \
            np.empty(0, np.int64), np.zeros(n_rows, np.int64)
    toks = _TOKEN_RE.findall(big)

    row_id = np.searchsorted(row_off, spans[:, 0], side="right") - 1
    starts = spans[:, 0] - row_off[row_id]
    ends = spans[:, 1] - row_off[row_id]
    row_lengths = np.bincount(row_id, minlength=n_rows).astype(np.int64)
    return toks, starts, ends, row_id, row_lengths


def tokens_struct_batch(texts: pd.Series) -> pd.Series:
    """pandas-UDF body: text -> list of (tok, start, end) tuples per row."""
    toks, starts, ends, row_id, row_lengths = tokenize_batch(texts)
    out = []
    pos = 0
    for r in range(len(texts)):
        n = int(row_lengths[r])
        out.append(
            [(toks[i], int(starts[i]), int(ends[i]))
             for i in range(pos, pos + n)]
        )
        pos += n
    return pd.Series(out, index=texts.index)
