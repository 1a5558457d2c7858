"""M1 analyzer tests — SURVEY.md §5.2: golden token arrays + Arrow/Python
oracle equivalence (including on hypothesis-generated unicode)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from parser_indexer_spark import analyze

GOLDEN = [
    ("Hello, World!", ["hello", "world"]),
    ("Spark, JOIN; filter!", ["spark", "join", "filter"]),
    ("foo_bar baz_", ["foo", "bar", "baz"]),
    ("a1b2 3c4d 42", ["a1b2", "3c4d", "42"]),
    ("", []),
    ("   \t\n ", []),
    ("!!!...???", []),
    ("Straße", ["straße"]),
    ("Café CAFÉ café", ["café", "café", "café"]),  # NFKD: all equal bytes
    ("ﬁle ｆｕｌｌ", ["file", "full"]),  # NFKD compat: ligature + fullwidth
    ("日本語 テスト", ["日本語", "テスト"]),
    ("word", ["word"]),
    ("UPPER lower MiXeD", ["upper", "lower", "mixed"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden_python(text, expected):
    import unicodedata
    exp = [unicodedata.normalize("NFKD", t) for t in expected]
    assert analyze.tokenize_py(text) == exp


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden_arrow(text, expected):
    import unicodedata
    exp = [unicodedata.normalize("NFKD", t) for t in expected]
    got = analyze.tokenize_series(pd.Series([text]))[0]
    assert list(got) == exp


def test_null_text():
    out = analyze.tokenize_series(pd.Series([None, "x y"], dtype=object))
    assert list(out[0]) == [] and list(out[1]) == ["x", "y"]


# Alphabet: BMP codepoints assigned in Unicode 14 (Python 3.11's unicodedata).
# Outside this, Arrow's utf8proc (newer Unicode) may classify codepoints that
# Python still reports as Cn-unassigned — the Arrow path is engine-
# authoritative; the oracle parity contract covers assigned codepoints.
import unicodedata as _ud

_ASSIGNED_BMP = st.characters(
    max_codepoint=0xFFFF,
    blacklist_categories=("Cn", "Cs"),
)


@given(st.lists(st.text(alphabet=_ASSIGNED_BMP, max_size=60), min_size=1, max_size=20))
@settings(max_examples=150, deadline=None)
def test_arrow_matches_python_oracle(texts):
    got = analyze.tokenize_series(pd.Series(texts, dtype=object))
    for t, g in zip(texts, got):
        assert list(g) == analyze.tokenize_py(t), repr(t)


def test_tokenize_tf_batches():
    pdf = pd.DataFrame({
        "doc_id": np.array([10, 11, 12], dtype=np.int64),
        "text": ["spark join spark", "", "Join, SPARK; join!"],
    })
    out = pd.concat(list(analyze.tokenize_tf_batches(iter([pdf]))))
    rows = {(r.doc_id, r.term): (r.tf, r.dl) for r in out.itertuples()}
    assert rows == {
        (10, "spark"): (2, 3),
        (10, "join"): (1, 3),
        (12, "join"): (2, 3),
        (12, "spark"): (1, 3),
    }
    assert str(out["doc_id"].dtype) == "int64"
    assert str(out["tf"].dtype) == "int32"
    assert str(out["dl"].dtype) == "int32"
