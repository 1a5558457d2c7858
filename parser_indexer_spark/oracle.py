"""Single-node BM25 oracle (D6 reference semantics) — SURVEY.md §0/§5.5.

The reference's query results are operationalized as this deterministic
oracle implementing Lucene's BM25 formula exactly [public: Lucene
BM25Similarity; Robertson & Zaragoza 2009], with the documented deviation
that dl is exact (no 1-byte lossy norm — SURVEY.md §2 C8):

    idf(t)       = ln(1 + (N - df + 0.5)/(df + 0.5))
    tf_norm(t,d) = tf / (tf + k1*(1 - b + b*dl/avgdl))      k1=1.2 b=0.75
    score(q,d)   = sum over sorted unique query terms of idf*tf_norm
                   (float64, frozen accumulation order — FIXTURES.md §3)

Pure pandas/numpy; per-row Python allowed here (test/oracle code only).
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import pandas as pd

from parser_indexer_spark.analyze import tokenize_py
from parser_indexer_spark.config import BM25_B, BM25_K1


class OracleIndex:
    def __init__(self, doc_ids: Iterable[int], texts: Iterable[str],
                 k1: float = BM25_K1, b: float = BM25_B,
                 stopwords: tuple = ()):
        self.k1, self.b = k1, b
        self.stopwords = tuple(stopwords)
        self.doc_ids = list(doc_ids)
        toks = [tokenize_py(t, self.stopwords) for t in texts]
        self.toks = {d: tk for d, tk in zip(self.doc_ids, toks)}
        self.n_docs = len(self.doc_ids)
        self.dl = {d: len(tk) for d, tk in zip(self.doc_ids, toks)}
        self.sum_dl = sum(self.dl.values())
        self.avg_dl = self.sum_dl / max(1, self.n_docs)
        # postings: term -> (sorted doc_id array, tf array)
        rows = []
        for d, tk in zip(self.doc_ids, toks):
            if not tk:
                continue
            s = pd.Series(tk).value_counts()
            rows.append(pd.DataFrame({"doc_id": d, "term": s.index, "tf": s.values}))
        tf = (pd.concat(rows, ignore_index=True) if rows
              else pd.DataFrame(columns=["doc_id", "term", "tf"]))
        self.df = tf.groupby("term")["doc_id"].nunique().to_dict()
        self.cf = tf.groupby("term")["tf"].sum().to_dict()
        self.postings = {}
        for term, g in tf.groupby("term"):
            g = g.sort_values("doc_id")
            self.postings[term] = (g["doc_id"].to_numpy(np.int64),
                                   g["tf"].to_numpy(np.float64))

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(self, query: str, k: int = 10, mode: str = "OR",
               must=None):
        """-> list[(doc_id, score)] ordered by (score desc, doc_id asc).
        ``must``: required words (mixed MUST+SHOULD Boolean semantics,
        mirroring Index.search(must=...)): a doc must contain every one,
        all query terms still score."""
        req = sorted({t for w in (must or [])
                      for t in tokenize_py(str(w), self.stopwords)})
        terms = sorted(set(tokenize_py(query, self.stopwords)) | set(req))
        # AND with an absent term matches nothing (required-term semantics,
        # same check as Index.search — evaluated before dropping df==0 terms)
        if mode == "AND" and any(self.df.get(t, 0) == 0 for t in terms):
            return []
        if any(self.df.get(t, 0) == 0 for t in req):
            return []
        terms = [t for t in terms if self.df.get(t, 0) > 0]
        if not terms:
            return []
        if mode == "AND" or (req and set(req) == set(terms)):
            mode, req = "AND", []
        if mode == "AND":
            common = None
            for t in terms:
                d = self.postings[t][0]
                common = d if common is None else common[np.isin(common, d, assume_unique=True)]
                if common.size == 0:
                    return []
            docs = common
        else:
            docs = np.unique(np.concatenate([self.postings[t][0] for t in terms]))
        total = np.zeros(docs.size, dtype=np.float64)
        for t in terms:  # frozen accumulation order
            d, tf = self.postings[t]
            if mode == "AND":
                pos = np.searchsorted(d, docs)
                sel_tf = tf[pos]
                sel_docs = np.arange(docs.size)
            else:
                pos = np.searchsorted(docs, d)
                sel_tf = tf
                sel_docs = pos
            dls = np.array([self.dl[int(x)] for x in (docs if mode == "AND" else d)],
                           dtype=np.float64)
            contrib = self.idf(t) * sel_tf / (
                sel_tf + self.k1 * (1.0 - self.b + self.b * dls / self.avg_dl))
            if mode == "AND":
                total += contrib
            else:
                np.add.at(total, sel_docs, contrib)
        if req:
            # mixed MUST+SHOULD: keep only docs containing every required
            # term; their scores stay the full OR sums computed above
            keep = np.ones(docs.size, dtype=bool)
            for t in req:
                keep &= np.isin(docs, self.postings[t][0],
                                assume_unique=True)
            docs, total = docs[keep], total[keep]
            if docs.size == 0:
                return []
        order = np.lexsort((docs, -total))[:k]
        return [(int(docs[i]), float(total[i])) for i in order]

    def phrase(self, query: str, k: int = 10, slop: int = 0):
        """Phrase / chained-gap proximity oracle mirroring Index.phrase:
        phrase_tf = number of start positions p_0 with positions
        p_0 < p_1 < ... (one per phrase term, in order) and every adjacent
        gap in [1, slop+1]; score = idf_sum * tf_norm(phrase_tf, dl).
        Brute-force per-doc scan (oracle code only)."""
        toks_q = tokenize_py(query, self.stopwords)
        if not toks_q:
            return []
        uniq = sorted(set(toks_q))
        if any(self.df.get(t, 0) == 0 for t in uniq):
            return []
        if len(toks_q) == 1:
            return self.search(query, k)
        idf_sum = sum(self.idf(t) for t in toks_q)
        hits = []
        for d in self.doc_ids:
            tk = self.toks[d]
            S = {i for i, w in enumerate(tk) if w == toks_q[-1]}
            for qi in range(len(toks_q) - 2, -1, -1):
                S = {i for i, w in enumerate(tk) if w == toks_q[qi]
                     and any((i + g) in S for g in range(1, slop + 2))}
                if not S:
                    break
            ptf = len(S)
            if ptf:
                dl = self.dl[d]
                score = idf_sum * ptf / (ptf + self.k1 * (
                    1.0 - self.b + self.b * dl / self.avg_dl))
                hits.append((d, score))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return [(int(d), float(s)) for d, s in hits[:k]]
