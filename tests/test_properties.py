"""Property-based gates for the two lowest-level invariants everything
else builds on: tokenizer offsets and the portable cross-engine hash."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from kgpipe.functions.tokenize import tokenize_batch

# texts over a broad printable alphabet incl. unicode, whitespace runs,
# punctuation — the tokenizer must never emit an offset that doesn't
# round-trip to its token
_text = st.text(
    alphabet=st.characters(codec="utf-8",
                           exclude_categories=("Cs",)),
    max_size=120,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_text, max_size=8))
def test_tokenizer_offsets_roundtrip(texts):
    s = pd.Series(texts, dtype="object")
    toks, starts, ends, row_id, row_lengths = tokenize_batch(s)
    # the tokenizer normalizes the newline sentinel to a space first
    vals = s.fillna("").astype(str).str.replace("\n", " ", regex=False)
    assert len(toks) == len(starts) == len(ends) == len(row_id)
    assert int(row_lengths.sum()) == len(toks)
    assert row_lengths.size == len(texts)
    for tok, a, b, r in zip(toks, starts, ends, row_id):
        assert vals.iloc[int(r)][int(a):int(b)] == tok
    # tokens within a row are ordered and non-overlapping
    if len(toks):
        order = np.lexsort((starts, row_id))
        assert (order == np.arange(len(toks))).all()
        same = row_id[1:] == row_id[:-1]
        assert (starts[1:][same] >= ends[:-1][same]).all()


def test_portable_hash_matches_duckdb_on_random_strings(spark):
    """The 48-bit md5-prefix hash must be bit-identical across engines —
    every dedup/LSH oracle comparison rests on this."""
    import duckdb

    from pyspark.sql import functions as F

    from kgpipe.queries.textops import portable_hash_spark, portable_hash_sql

    rng = np.random.default_rng(11)
    alphabet = list("abcdefghijklmnopqrstuvwxyz0123456789 _-ü€")
    strings = ["".join(rng.choice(alphabet, size=rng.integers(0, 40)))
               for _ in range(300)]
    sdf = spark.createDataFrame([(s,) for s in strings], "s string")
    got = [r.h for r in
           sdf.select(portable_hash_spark(F.col("s")).alias("h"))
           .collect()]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {portable_hash_sql('?')}", [s]).fetchone()[0]
        for s in strings
    ]
    assert got == want


# a tiny fixed gazetteer; texts are RANDOM, so the property exercises
# every miss/partial-overlap/boundary shape around these aliases
_GAZ_DICT = pd.DataFrame({
    "alias": ["acme corp", "acme", "bob lee", "zurich"],
    "entity_id": ["org0", "org0", "per0", "loc0"],
    "prior": [0.9, 0.8, 0.9, 0.9],
    "ent_class": ["ORG", "PER", "PER", "PLACE"],
})

_words = st.lists(
    st.sampled_from(["acme", "corp", "bob", "lee", "zurich", "the",
                     "at", "works", "x1", "--", "ACME", "Corp"]),
    max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_words.map(" ".join), max_size=6))
def test_labeler_span_invariants(texts):
    """Every span the gazetteer labeler emits must lie inside its text,
    align exactly on token boundaries of a dictionary alias (normalized),
    carry a known class, and never overlap a neighbor — the invariants
    extract_mentions / linking / the digest UDF all assume."""
    from kgpipe.operators.labeler import (
        build_gazetteer,
        build_transitions,
        label_texts,
    )
    from kgpipe.schemas import ENT_CLASSES

    aliases = {a for a in _GAZ_DICT["alias"]}
    s = pd.Series(texts, dtype="object")
    out = label_texts(s, build_gazetteer(_GAZ_DICT), build_transitions())
    assert len(out) == len(texts)
    for text, spans in zip(texts, out):
        prev_end = -1
        for (a, b, cls, score) in sorted(spans):
            assert 0 <= a < b <= len(text)
            assert cls in ENT_CLASSES
            surface = " ".join(text[a:b].lower().split())
            assert surface in aliases, (text, a, b, surface)
            # token-aligned: span edges touch whitespace or text edges
            assert a == 0 or text[a - 1] == " "
            assert b == len(text) or text[b] == " "
            assert a >= prev_end, "overlapping spans"
            prev_end = b
