"""Generate the frozen golden fixtures (FIXTURES.md §1/§3) — committed JSON.

Run from the repo root:  python tools/gen_fixtures.py

Produces, deterministically (seed=42, single-node oracle only, no Spark):
  fixtures/topk/q01.json .. q20.json   golden top-k per frozen query
  fixtures/text_equality_t_tiny.json   (conv_id, turn_idx, sha256(text))

These stand in for "the reference's per-turn text-equality and top-k
fixtures" (BASELINE.json:6) — the reference mount is empty (SURVEY.md §0),
so the committed oracle output IS the reference result set the engine must
be rank-identical to.
"""

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parser_indexer_spark.oracle import OracleIndex  # noqa: E402
from parser_indexer_spark.transcripts import synthesize_pandas  # noqa: E402

T_TINY_TURNS = 2000

# The frozen query set (FIXTURES.md §3). filter entries are pandas-eval
# predicates over the transcripts attribute columns; the engine runs the
# equivalent SQL predicate (doc_filter).
QUERY_SET = [
    ("q01", "spark", "OR", 10, None),                 # head term (skew/BMW)
    ("q02", "join", "OR", 10, None),                  # head term
    ("q03", "w1999", "OR", 10, None),                 # rare term
    ("q04", "vector", "OR", 10, None),                # literal tail term
    ("q05", "zzzunseen", "OR", 10, None),             # absent term
    ("q06", "spark join", "OR", 10, None),            # 2-term OR
    ("q07", "sort merge", "OR", 10, None),            # 2-term OR
    ("q08", "spark join", "AND", 10, None),           # 2-term AND
    ("q09", "hash agg", "AND", 10, None),             # 2-term AND
    ("q10", "spark w0042 filter", "OR", 10, None),    # mixed head+rare OR
    ("q11", "merge w0100 w0500", "OR", 10, None),
    ("q12", "index query scan table", "OR", 10, None),
    ("q13", "window w0007 partition order limit", "OR", 10, None),
    ("q14", "window partition order", "AND", 10, None),  # 3-term AND
    ("q15", "select count distinct", "AND", 10, None),
    ("q16", "SPARK, Join!", "OR", 10, None),          # analyzer parity
    ("q17", "join join join", "OR", 10, None),        # dup terms dedup
    ("q18", "spark join", "OR", 10, "role == 'assistant'"),   # D9 filter
    ("q19", "spark", "OR", 10, "ts < '2024-01-01T01:00:00'"),  # D9 ts filter
    ("q20", "w1999", "OR", 1000, None),               # k > matches
]

FILTER_SQL = {  # pandas predicate -> engine SQL predicate
    "role == 'assistant'": "role = 'assistant'",
    "ts < '2024-01-01T01:00:00'": "ts < timestamp'2024-01-01 01:00:00'",
}


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    corpus = (synthesize_pandas(T_TINY_TURNS)
              .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    ora = OracleIndex(range(len(corpus)), corpus["text"].tolist())

    topk_dir = os.path.join(root, "fixtures", "topk")
    os.makedirs(topk_dir, exist_ok=True)
    for qid, query, mode, k, flt in QUERY_SET:
        if flt is None:
            results = ora.search(query, k=k, mode=mode)
        else:
            allowed = set(corpus.index[corpus.eval(flt)])
            results = [(d, s) for d, s in ora.search(query, k=10**9, mode=mode)
                       if d in allowed][:k]
        obj = {
            "query": query, "mode": mode, "k": k,
            "filter_pandas": flt, "filter_sql": FILTER_SQL.get(flt),
            "corpus": {"name": "t_tiny", "n_turns": T_TINY_TURNS, "seed": 42},
            "results": [[int(d), float(s)] for d, s in results],
        }
        with open(os.path.join(topk_dir, f"{qid}.json"), "w") as f:
            json.dump(obj, f, indent=1)
        print(qid, query, mode, "->", len(results), "hits")

    eq = [
        [r.conv_id, int(r.turn_idx),
         hashlib.sha256(r.text.encode("utf-8")).hexdigest()]
        for r in corpus.itertuples()
    ]
    with open(os.path.join(root, "fixtures", "text_equality_t_tiny.json"), "w") as f:
        json.dump({"corpus": {"name": "t_tiny", "n_turns": T_TINY_TURNS,
                              "seed": 42}, "rows": eq}, f)
    print("text-equality rows:", len(eq))


if __name__ == "__main__":
    main()
