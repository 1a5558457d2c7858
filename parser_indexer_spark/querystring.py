"""Lucene-classic-style query-string parser (D1 upgrade, round 5)
[public: Lucene classic QueryParser / Solr lucene QParser syntax].

Parses the subset of the classic syntax the engine executes natively and
returns a structured ``ParsedQuery`` the ``Index.query`` router maps onto
the existing execution paths (term scorer, phrase scorer, fielded search):

  spark join                OR (SHOULD) terms — default, like Lucene
  +spark join               '+' = MUST: doc must contain 'spark';
                            'join' stays optional but scores (BooleanQuery
                            MUST + SHOULD semantics)
  -scan                     '-' = MUST_NOT: excludes docs, never scores
  "sort merge"              quoted phrase (PhraseQuery)
  "sort merge"~2            phrase with slop
  spar*                     prefix query (PrefixQuery rewrite)
  s?a*n / *join             wildcard query ('*' any run, '?' one char;
                            WildcardQuery rewrite — needs >= 1 literal
                            char)
  [hash TO join]            inclusive term range; {a TO b} exclusive,
                            '*' = open bound (TermRangeQuery rewrite)
  databse~ / databse~1      fuzzy query; bare '~' = edit distance 2
                            (Lucene FuzzyQuery default)
  /s[pc]a[rn].*/            regexp query, anchored whole-term match
                            (RegexpQuery rewrite; portable regex core
                            only — see Index.expand_regexp)
  source:src7               fielded term; source:"a b" fielded phrase
  lang:en^2                 per-clause boost (fielded terms only — it maps
                            onto search_fields' per-field boost)

Deliberately NOT supported (raise ValueError, never silently mis-parse):
parenthesised sub-queries, OR/AND/NOT keyword operators (use +/- and the
mode argument), '+' on prefix/wildcard/range/fuzzy clauses (a required
DISJUNCTION of expansions is group-level semantics the conjunctive
scorer doesn't model), and boosts on non-fielded clauses.

The parser is pure Python (no Spark) so it unit-tests in microseconds and
the router's behavior stays fully determined by the dataclass it emits.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Clause:
    """One parsed clause, pre-analysis (raw token text; the router runs
    the index analyzer on ``text`` so query analysis happens EXACTLY once,
    in one place, like Lucene's QueryParser.getFieldQuery)."""
    text: str
    occur: str = "SHOULD"        # SHOULD | MUST | MUST_NOT
    kind: str = "term"           # term | phrase | prefix | wildcard |
    #                              range | fuzzy
    field: str | None = None     # None = default text field
    slop: int = 0                # phrase only
    max_dist: int = 2            # fuzzy only
    boost: float = 1.0           # fielded terms only
    lo: str | None = None        # range only; None = open bound
    hi: str | None = None        # range only; None = open bound
    incl_lo: bool = True         # range only; [ vs {
    incl_hi: bool = True         # range only; ] vs }


@dataclass
class ParsedQuery:
    clauses: list[Clause] = field(default_factory=list)

    def by_occur(self, occur: str) -> list[Clause]:
        return [c for c in self.clauses if c.occur == occur]

    def by_kind(self, kind: str) -> list[Clause]:
        return [c for c in self.clauses if c.kind == kind]


# a quoted span (with optional ~N and field prefix), a bracketed term
# range, or a bare token
_TOKEN = re.compile(
    r'\s*([+-]?)'                      # occur modifier
    r'(?:([A-Za-z_][A-Za-z0-9_]*):)?'  # optional field prefix
    r'(?:"([^"]*)"(?:~(\d+))?'         # quoted phrase [~slop]
    r'|([\[\{])\s*(\S+)\s+TO\s+(\S+)\s*([\]\}])'  # [lo TO hi] range
    r'|/((?:[^/\\]|\\.)*)/'            # /regexp/ (\/ escapes a slash)
    r'|(\S+))'                         # or a bare token
)

_FUZZY = re.compile(r'^(.*?)~(\d*)$')
_BOOST = re.compile(r'^(.*)\^(\d+(?:\.\d+)?)$')

_UNSUPPORTED = {"AND", "OR", "NOT", "&&", "||"}


def parse_query(qs: str) -> ParsedQuery:
    """Parse ``qs`` into clauses; raises ValueError on syntax the engine
    does not execute (see module docstring for the exact surface)."""
    if not qs or not qs.strip():
        return ParsedQuery()
    # parens are legal INSIDE a /regexp/ clause (grouping); only bare ones
    # mean an unsupported sub-query
    outside = re.sub(r'/(?:[^/\\]|\\.)*/', '', qs)
    if "(" in outside or ")" in outside:
        raise ValueError("parenthesised sub-queries are not supported; "
                         "use +term / -term modifiers")
    out = ParsedQuery()
    pos = 0
    while pos < len(qs):
        m = _TOKEN.match(qs, pos)
        if not m or m.end() == pos:
            if qs[pos:].strip():
                raise ValueError(f"cannot parse query at: {qs[pos:]!r}")
            break
        pos = m.end()
        (sign, fld, phrase, slop, obr, rlo, rhi, cbr, rex,
         bare) = m.groups()
        occur = {"": "SHOULD", "+": "MUST", "-": "MUST_NOT"}[sign]
        if phrase is not None:
            out.clauses.append(Clause(
                text=phrase, occur=occur, kind="phrase", field=fld,
                slop=int(slop) if slop else 0))
            continue
        if obr is not None:
            if occur == "MUST":
                raise ValueError(
                    "'+' on a range clause is not supported (a required "
                    "disjunction of expansions); drop the '+'")
            lo = None if rlo == "*" else rlo
            hi = None if rhi == "*" else rhi
            if lo is None and hi is None:
                raise ValueError("term range needs at least one bound: "
                                 f"{obr}{rlo} TO {rhi}{cbr}")
            out.clauses.append(Clause(
                text=f"{obr}{rlo} TO {rhi}{cbr}", occur=occur,
                kind="range", field=fld, lo=lo, hi=hi,
                incl_lo=obr == "[", incl_hi=cbr == "]"))
            continue
        if rex is not None:
            if occur == "MUST":
                raise ValueError(
                    "'+' on a regexp clause is not supported (a required "
                    "disjunction of expansions); drop the '+'")
            if not rex.strip():
                raise ValueError("empty regexp clause: '//'")
            out.clauses.append(Clause(
                text=rex.replace(r"\/", "/"), occur=occur, kind="regex",
                field=fld))
            continue
        if bare in _UNSUPPORTED:
            raise ValueError(
                f"the {bare!r} operator is not supported; use +/- "
                "modifiers and the mode argument")
        boost = 1.0
        bm = _BOOST.match(bare)
        if bm:
            bare, boost = bm.group(1), float(bm.group(2))
            if fld is None:
                raise ValueError(
                    "boosts are only supported on fielded terms "
                    f"(got {bare!r}^{boost:g})")
        if "*" in bare or "?" in bare:
            if occur == "MUST":
                raise ValueError(
                    "'+' on a prefix/wildcard clause is not supported (a "
                    "required disjunction of expansions); drop the '+' or "
                    "use a full term")
            trailing_star_only = (bare.endswith("*") and "?" not in bare
                                  and "*" not in bare[:-1] and len(bare) > 1)
            if trailing_star_only:
                out.clauses.append(Clause(text=bare[:-1], occur=occur,
                                          kind="prefix", field=fld,
                                          boost=boost))
            else:
                if not bare.strip("*?"):
                    raise ValueError(
                        "wildcard pattern needs at least one literal "
                        f"character: {bare!r}")
                out.clauses.append(Clause(text=bare, occur=occur,
                                          kind="wildcard", field=fld,
                                          boost=boost))
            continue
        fm = _FUZZY.match(bare)
        if fm and "~" in bare:
            word, dist = fm.group(1), fm.group(2)
            if not word:
                raise ValueError(f"fuzzy clause with no term: {bare!r}")
            if occur == "MUST":
                raise ValueError(
                    "'+' on a fuzzy clause is not supported (a required "
                    "disjunction of expansions); drop the '+' or use a "
                    "full term")
            out.clauses.append(Clause(
                text=word, occur=occur, kind="fuzzy", field=fld,
                max_dist=int(dist) if dist else 2, boost=boost))
            continue
        out.clauses.append(Clause(text=bare, occur=occur, kind="term",
                                  field=fld, boost=boost))
    if not out.clauses:
        return out
    if all(c.occur == "MUST_NOT" for c in out.clauses):
        # pure-negative query: Lucene returns no results (nothing scores)
        return out
    return out
