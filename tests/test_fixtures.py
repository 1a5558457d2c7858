"""§5.5 golden-fixture parity: the engine must be rank-identical (scores to
1e-6 rel) to the committed frozen top-k fixtures (fixtures/topk/q*.json) and
byte-lossless vs the text-equality fixture — BASELINE.json:6,14,15."""

import glob
import hashlib
import json
import os

import pytest

from parser_indexer_spark.build import read_docs

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = sorted(glob.glob(os.path.join(ROOT, "fixtures", "topk", "q*.json")))


def _load(path):
    with open(path) as f:
        return json.load(f)


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p)[:-5] for p in FIXTURES])
def test_golden_topk(engine, path):
    fx = _load(path)
    got = engine.search(fx["query"], k=fx["k"], mode=fx["mode"],
                        doc_filter=fx.get("filter_sql")).collect()
    exp = fx["results"]
    assert [r.doc_id for r in got] == [e[0] for e in exp], fx["query"]
    for r, e in zip(got, exp):
        assert r.score == pytest.approx(e[1], rel=1e-6)


def test_text_equality_fixture(spark, index_dir):
    fx = _load(os.path.join(ROOT, "fixtures", "text_equality_t_tiny.json"))
    rows = (read_docs(spark, index_dir)
            .orderBy("conv_id", "turn_idx")
            .select("conv_id", "turn_idx", "text").collect())
    assert len(rows) == len(fx["rows"])
    for r, (conv, turn, h) in zip(rows, fx["rows"]):
        assert (r.conv_id, r.turn_idx) == (conv, turn)
        assert hashlib.sha256(r.text.encode("utf-8")).hexdigest() == h
