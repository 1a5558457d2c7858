"""Wildcard, term-range, and regexp queries (D21/D22 r5) [public: Lucene
WildcardQuery / TermRangeQuery / RegexpQuery; Solr wildcard + range +
/regex/ syntax]: all rewrite to a bounded scored OR over dictionary
terms, so every test checks (a) the expansion set against a brute-force
vocabulary scan and (b) the ranked results against the oracle running
the expanded list.
"""

import re

import pytest

from parser_indexer_spark.analyze import tokenize_py


def _vocab(corpus):
    out = set()
    for t in corpus["text"]:
        out.update(tokenize_py(t))
    return out


def _glob_matches(vocab, pattern):
    rx = re.compile("^" + "".join(
        ".*" if c == "*" else "." if c == "?" else re.escape(c)
        for c in pattern) + "$")
    return sorted(t for t in vocab if rx.match(t))


# ----------------------------------------------------------------- wildcard

def test_wildcard_expansion_matches_brute_force(engine, corpus):
    vocab = _vocab(corpus)
    for pat in ["s?a*", "w00?2", "*oin", "me*ge"]:
        assert engine.expand_wildcard(pat, max_expansions=10 ** 6) == \
            _glob_matches(vocab, pat), pat


def test_wildcard_query_scores_as_or(engine, oracle, corpus):
    terms = engine.expand_wildcard("s?a*")
    assert terms  # pattern chosen to match (scan/spark/... in t_tiny)
    got = [(r.doc_id, r.score) for r in engine.query("s?a*", k=10).collect()]
    exp = oracle.search(" ".join(terms), k=10)
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-9)


def test_wildcard_must_not_excludes_expansions(engine, oracle, corpus):
    excl = set(engine.expand_wildcard("s?a*"))
    base = oracle.search("join", k=10 ** 9)
    bad = set()
    for i, t in enumerate(corpus["text"]):
        if excl & set(tokenize_py(t)):
            bad.add(i)
    exp = [(d, s) for d, s in base if d not in bad][:10]
    got = [(r.doc_id, r.score)
           for r in engine.query("join -s?a*", k=10).collect()]
    assert [g[0] for g in got] == [e[0] for e in exp]


def test_wildcard_bounds_and_validation(engine):
    with pytest.raises(ValueError, match="more than"):
        engine.query("w*", k=10, max_expansions=5).collect()
    with pytest.raises(ValueError, match="literal"):
        engine.expand_wildcard("*?*")
    # no match -> empty, not an error
    assert engine.query("zz?nope*", k=10).count() == 0
    # '+' on a wildcard is a parse error (required disjunction)
    with pytest.raises(ValueError, match="required disjunction"):
        engine.query("+wi?dow", k=10)


def test_wildcard_large_vocab_df_path(engine, corpus):
    """The pushed-down (non-preloaded) dict-scan path returns the same
    expansion as the driver-cache path."""
    cached = engine.expand_wildcard("s?a*")
    saved = engine._dict_preloaded
    engine._dict_preloaded = False
    try:
        assert engine.expand_wildcard("s?a*") == cached
    finally:
        engine._dict_preloaded = saved


# --------------------------------------------------------------- term range

def test_range_expansion_matches_brute_force(engine, corpus):
    vocab = _vocab(corpus)
    got = engine.expand_range("scan", "spark", max_expansions=10 ** 6)
    assert got == sorted(t for t in vocab if "scan" <= t <= "spark")
    exc = engine.expand_range("scan", "spark", incl_lo=False,
                              incl_hi=False, max_expansions=10 ** 6)
    assert exc == sorted(t for t in vocab if "scan" < t < "spark")
    opn = engine.expand_range("w1995", None, max_expansions=10 ** 6)
    assert opn == sorted(t for t in vocab if t >= "w1995")


def test_range_query_scores_as_or(engine, oracle, corpus):
    terms = engine.expand_range("scan", "spark")
    assert terms
    got = [(r.doc_id, r.score)
           for r in engine.query("[scan TO spark]", k=10).collect()]
    exp = oracle.search(" ".join(terms), k=10)
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-9)


def test_range_exclusive_and_open_bounds(engine, oracle):
    terms = engine.expand_range("scan", "spark", incl_lo=False,
                                incl_hi=False)
    got = [(r.doc_id, r.score)
           for r in engine.query("{scan TO spark}", k=10).collect()]
    exp = oracle.search(" ".join(terms), k=10) if terms else []
    assert [g[0] for g in got] == [e[0] for e in exp]
    terms = engine.expand_range("w1995", None)
    got = [(r.doc_id, r.score)
           for r in engine.query("[w1995 TO *]", k=10).collect()]
    exp = oracle.search(" ".join(terms), k=10)
    assert [g[0] for g in got] == [e[0] for e in exp]


def test_range_bounds_and_validation(engine):
    with pytest.raises(ValueError, match="more than"):
        engine.query("[a TO zzzz]", k=10, max_expansions=5).collect()
    with pytest.raises(ValueError, match="at least one bound"):
        engine.query("[* TO *]", k=10)
    with pytest.raises(ValueError, match="required disjunction"):
        engine.query("+[scan TO spark]", k=10)
    # empty range -> empty result, not an error
    assert engine.query("[zzy TO zzz]", k=10).count() == 0


def test_range_large_vocab_df_path(engine):
    cached = engine.expand_range("scan", "spark")
    saved = engine._dict_preloaded
    engine._dict_preloaded = False
    try:
        assert engine.expand_range("scan", "spark") == cached
    finally:
        engine._dict_preloaded = saved


# ------------------------------------------------------------------- regexp

def _regex_matches(vocab, pattern):
    rx = re.compile("^(?:" + pattern + ")$")
    return sorted(t for t in vocab if rx.match(t))


def test_regexp_expansion_matches_brute_force(engine, corpus):
    vocab = _vocab(corpus)
    for pat in ["s[pc]a[rn].*", "w00[0-9]2", "jo(in|bs)", "sp.rk",
                "merge|scan", "w0+1.?"]:
        assert engine.expand_regexp(pat, max_expansions=10 ** 6) == \
            _regex_matches(vocab, pat), pat


def test_regexp_query_scores_as_or(engine, oracle):
    terms = engine.expand_regexp("s[pc]a[rn].*")
    assert terms  # spark + scan live in t_tiny's vocabulary
    got = [(r.doc_id, r.score)
           for r in engine.query("/s[pc]a[rn].*/", k=10).collect()]
    exp = oracle.search(" ".join(terms), k=10)
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-9)


def test_regexp_must_not_excludes_expansions(engine, oracle, corpus):
    excl = set(engine.expand_regexp("s[pc]a[rn].*"))
    base = oracle.search("join", k=10 ** 9)
    bad = {i for i, t in enumerate(corpus["text"])
           if excl & set(tokenize_py(t))}
    exp = [(d, s) for d, s in base if d not in bad][:10]
    got = [(r.doc_id, r.score)
           for r in engine.query("join -/s[pc]a[rn].*/", k=10).collect()]
    assert [g[0] for g in got] == [e[0] for e in exp]


def test_regexp_bounds_and_validation(engine):
    with pytest.raises(ValueError, match="more than"):
        engine.query("/w.*/", k=10, max_expansions=5).collect()
    with pytest.raises(ValueError, match="bad regexp"):
        engine.expand_regexp("[unclosed")
    with pytest.raises(ValueError, match="empty regexp"):
        engine.query("//", k=10)
    with pytest.raises(ValueError, match="required disjunction"):
        engine.query("+/sp.rk/", k=10)
    # no match -> empty result, not an error
    assert engine.query("/zz[0-9]qq.*/", k=10).count() == 0


def test_regexp_large_vocab_df_path(engine):
    """Pushed-down dict-scan path == driver-cache path, with and without
    a guaranteed literal prefix (alternation voids the pushdown)."""
    for pat in ["s[pc]a[rn].*", "merge|scan"]:
        cached = engine.expand_regexp(pat)
        saved = engine._dict_preloaded
        engine._dict_preloaded = False
        try:
            assert engine.expand_regexp(pat) == cached, pat
        finally:
            engine._dict_preloaded = saved
