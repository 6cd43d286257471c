import numpy as np
import pandas as pd

from kgpipe.functions.tokenize import tokenize_batch, tokens_struct_batch


def test_offsets_roundtrip():
    texts = pd.Series([
        "Alice works at Acme Corp .",
        "",
        "  leading and  double  spaces here",
        "punct,and.symbols!x",
    ])
    toks, starts, ends, row_id, row_lengths = tokenize_batch(texts)
    for i, t in enumerate(toks):
        r = int(row_id[i])
        assert texts.iloc[r][starts[i]:ends[i]] == t
    assert int(row_lengths[1]) == 0
    assert sum(row_lengths) == len(toks)


def test_empty_and_null():
    texts = pd.Series([None, "", "x"])
    toks, starts, ends, row_id, row_lengths = tokenize_batch(texts)
    assert list(row_lengths) == [0, 0, 1]
    assert toks == ["x"]


def test_struct_batch_shape():
    s = tokens_struct_batch(pd.Series(["a b", "c"]))
    assert s.iloc[0] == [("a", 0, 1), ("b", 2, 3)]
    assert s.iloc[1] == [("c", 0, 1)]


def test_batch_order_independent():
    """Token offsets must not depend on batch composition."""
    a = pd.Series(["hello world", "foo bar baz"])
    b = pd.Series(["foo bar baz"])
    _, s_a, e_a, r_a, _ = tokenize_batch(a)
    _, s_b, e_b, _, _ = tokenize_batch(b)
    mask = r_a == 1
    assert np.array_equal(s_a[mask], s_b)
    assert np.array_equal(e_a[mask], e_b)
