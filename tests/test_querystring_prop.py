"""Property tests for the Lucene-classic query-string parser (D1 r5).

Spark-free (the parser is pure Python), so these run in milliseconds:
the parser either returns a structured ParsedQuery or raises ValueError —
never crashes, never silently mis-parses — and well-formed queries
round-trip render→parse exactly.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from parser_indexer_spark.querystring import Clause, parse_query

WORD = st.text(alphabet=string.ascii_lowercase + string.digits,
               min_size=1, max_size=8).filter(
    lambda w: w.upper() not in ("AND", "OR", "NOT"))
FIELD = st.one_of(st.none(), st.sampled_from(["text", "source", "lang"]))


def clause_strategy() -> st.SearchStrategy[Clause]:
    def build(kind, occur, words, fld, slop, dist, boost, brackets):
        # expansion clauses never take MUST (the parser rejects it)
        soft = "SHOULD" if occur == "MUST" else occur
        if kind == "phrase":
            return Clause(text=" ".join(words), occur=occur, kind="phrase",
                          field=fld, slop=slop)
        if kind == "prefix":
            return Clause(text=words[0], occur=soft, kind="prefix",
                          field=fld)
        if kind == "wildcard":
            return Clause(text=words[0] + "*" + (words[1] if
                          len(words) > 1 else "?"), occur=soft,
                          kind="wildcard", field=fld)
        if kind == "range":
            lo, hi = words[0], (words[1] if len(words) > 1 else None)
            text = ("[" if brackets[0] else "{") + lo + " TO " + \
                (hi or "*") + ("]" if brackets[1] else "}")
            return Clause(text=text, occur=soft, kind="range", field=fld,
                          lo=lo, hi=hi, incl_lo=brackets[0],
                          incl_hi=brackets[1])
        if kind == "fuzzy":
            return Clause(text=words[0], occur=soft, kind="fuzzy",
                          field=fld, max_dist=dist)
        if kind == "regex":
            pat = words[0] + (".*" if brackets[0] else "") + \
                ("[ab]" if brackets[1] else "")
            return Clause(text=pat, occur=soft, kind="regex", field=fld)
        boost = boost if fld is not None else 1.0
        return Clause(text=words[0], occur=occur, kind="term", field=fld,
                      boost=boost)

    return st.builds(
        build,
        st.sampled_from(["term", "phrase", "prefix", "wildcard", "range",
                         "fuzzy", "regex"]),
        st.sampled_from(["SHOULD", "MUST", "MUST_NOT"]),
        st.lists(WORD, min_size=1, max_size=3),
        FIELD,
        st.integers(0, 9),
        st.integers(1, 2),
        st.sampled_from([1.0, 2.0, 3.5]),
        st.tuples(st.booleans(), st.booleans()),
    )


def render(c: Clause) -> str:
    sign = {"SHOULD": "", "MUST": "+", "MUST_NOT": "-"}[c.occur]
    fld = f"{c.field}:" if c.field else ""
    if c.kind == "phrase":
        body = f'"{c.text}"' + (f"~{c.slop}" if c.slop else "")
    elif c.kind == "prefix":
        body = f"{c.text}*"
    elif c.kind == "wildcard":
        body = c.text
    elif c.kind == "range":
        body = ("[" if c.incl_lo else "{") + (c.lo or "*") + " TO " + \
            (c.hi or "*") + ("]" if c.incl_hi else "}")
    elif c.kind == "fuzzy":
        body = f"{c.text}~{c.max_dist}"
    elif c.kind == "regex":
        body = "/" + c.text.replace("/", r"\/") + "/"
    else:
        body = c.text + (f"^{c.boost:g}" if c.boost != 1.0 else "")
    return sign + fld + body


@settings(max_examples=300, deadline=None)
@given(st.lists(clause_strategy(), min_size=1, max_size=6))
def test_roundtrip_render_parse(clauses):
    qs = " ".join(render(c) for c in clauses)
    parsed = parse_query(qs).clauses
    assert parsed == clauses


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=40))
def test_never_crashes_only_valueerror(qs):
    try:
        out = parse_query(qs)
    except ValueError:
        return
    assert isinstance(out.clauses, list)
    for c in out.clauses:
        assert c.occur in ("SHOULD", "MUST", "MUST_NOT")
        assert c.kind in ("term", "phrase", "prefix", "wildcard",
                          "range", "fuzzy", "regex")
        assert c.text or c.kind == "phrase"  # "" phrase = empty quotes


@settings(max_examples=200, deadline=None)
@given(st.lists(WORD, min_size=1, max_size=8))
def test_plain_words_are_should_terms(words):
    parsed = parse_query(" ".join(words)).clauses
    assert [c.text for c in parsed] == words
    assert all(c.occur == "SHOULD" and c.kind == "term" and
               c.field is None for c in parsed)
