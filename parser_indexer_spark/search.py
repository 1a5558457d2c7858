"""Query engine (D1-D9) — SURVEY.md §2.D, §3.2.

Reference path: HTTP /select -> Solr SearchHandler -> Lucene QueryParser ->
BM25 Weight/Scorer with WAND -> TopScoreDocCollector [public: Solr/Lucene].
Engine path:

  driver   analyze query with the engine analyzer (D1) -> bucket set ->
           df/idf from the dict table (partition-pruned read, D2) ->
           stats.json gives N, avgdl
  plan     postings filter: bucket ISIN (partition pruning) + term ISIN
           (Parquet row-group pruning via min/max on the sorted term column)
  shuffle  repartition(chunk): every term's blocks for one doc-range chunk
           co-locate (blocks are chunk-aligned by construction, C3), so
           intersection/union is partition-local — ONE small shuffle of
           compressed blocks, never of raw postings
  executor mapInPandas scoring, STREAMED: input is chunk-sorted within the
           partition and consumed as complete chunk runs off the Arrow batch
           iterator (carry pattern), so memory is one chunk, not the
           partition; FOR/varint decode (D3), chunk-grid leapfrog
           intersection (D4) / union (D5), exact-dl BM25 (D6), per-partition
           top-k heap with block-max-WAND chunk skipping (D7/D8); selective
           doc_filters are broadcast into the scorer pre-heap (D9), so
           truncation and WAND stay active under filters
  driver   global orderBy(score desc, doc_id asc).limit(k) over <=k rows per
           partition (deterministic total order => rank-identical across
           parallelism levels)

Scores are float64, accumulated in sorted-unique-term order (frozen,
FIXTURES.md §3) so engine == oracle bit-for-bit modulo the documented
1e-12 pruning epsilon.
"""

from __future__ import annotations

import math
import os
import re
import unicodedata
import zlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parser_indexer_spark.analyze import tokenize_py
from parser_indexer_spark.build import read_dict, read_docs, read_postings, term_bucket
from parser_indexer_spark.codec import decode, decode_blocks, \
    delta_decode_blocks
from parser_indexer_spark.config import EngineConfig
from parser_indexer_spark.deletes import deletes_path as _deletes_path, live_mask as _live_mask_arr, read_tombstones as _read_tombstones
from parser_indexer_spark.manifest import CATALOG, IndexPaths

_PRUNE_EPS = 1e-12  # float-safety margin on the WAND skip test (see §7 hp-3)

# doc_filter sets up to this many doc_ids are broadcast INTO the scorer so
# per-partition top-k truncation + WAND stay active under a filter (D9);
# larger filter sides fall back to the semi-join-after-scoring path.
FILTER_BROADCAST_LIMIT = 1_000_000

# queries whose matched posting volume exceeds this many blocks get a
# cross-executor WAND θ seed (D8 v2): the driver exactly scores the single
# highest-upper-bound chunk (metadata-only argmax + one small collect) and
# ships its k-th score as θ0 to EVERY partition, so pruning starts hot
# instead of each partition growing its own θ from zero. The threshold is
# set where the fan-out is wide enough (~64 scoring tasks) that saved
# decode work beats the seed's two extra small jobs; below it the fixed
# per-job latency dominates and seeding is a net loss (measured: +2s p95
# on a 4M-turn index with a 5k-block threshold).
THETA_SEED_MIN_BLOCKS = 32_768

# vocabularies at or below this size are loaded into driver memory ONCE per
# Index handle (~60 B/term => <=~120 MB at the cap), so repeat queries skip
# the per-query dict-lookup job entirely — the analogue of Lucene holding
# the term-dictionary FST in RAM [public: Lucene BlockTreeTermsReader].
# Larger vocabularies (the 100 TB path) keep the pruned per-query lookup
# with incremental caching.
DICT_PRELOAD_LIMIT = 2_000_000


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


class Index:
    """Handle over a committed index directory (reads _manifest.json)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.manifest = CATALOG.load_snapshot(root)
        self.cfg = EngineConfig.from_dict(self.manifest["config"])
        self.stats = CATALOG.read_meta(IndexPaths(root).stats)
        self._dict_cache: dict[str, int] = {}
        self._dict_preloaded = False
        # reuse the resolved scan relations across queries (file listing +
        # schema inference happen once per Index handle)
        self._postings_df = read_postings(spark, root)
        self._dict_df = read_dict(spark, root)
        # doc_filter -> broadcast allowed-set cache (ADVICE r2): broadcasts
        # are reused across repeated filtered queries; evicted entries are
        # unpersisted (re-broadcastable), destroy() only on close().
        self._filter_bc: dict[str, object] = {}
        self._filter_bc_max = 8
        # impact sidecar (head-term early exit + theta seeding [public:
        # Lucene 8 impacts]): per-segment top-I postings of high-df terms.
        # Only head terms ever populate the caches, so they stay tiny.
        self._impact_segs = [s["seg"] for s in self.manifest["segments"]
                             if s.get("n_impact_terms", 0) > 0]
        self._impacts_df = None
        if self._impact_segs:
            ip = IndexPaths(root)
            self._impacts_df = CATALOG.read_table(
                spark, *[ip.impacts_seg(s) for s in self._impact_segs],
                base_path=ip.impacts)
        # all three driver-side caches are FIFO-capped like _filter_bc
        # (ADVICE r4): a long-lived handle serving many distinct filters /
        # head terms must not grow driver memory without bound
        self._impact_cache: dict[str, pd.DataFrame] = {}
        self._seg_df_cache: dict[str, set] = {}
        self._postings_pruned: dict[tuple, Optional[DataFrame]] = {}
        self._impact_cache_max = 256
        self._postings_pruned_max = 8
        # tombstones [public: Lucene liveDocs]: sorted doc_id array of
        # deleted docs, loaded driver-side from the manifest's deletes
        # generation (bounded by FILTER_BROADCAST_LIMIT — delete_docs
        # refuses beyond it and points at compaction)
        self._tombstones: Optional[np.ndarray] = None
        self._denied_bc = None
        dels = self.manifest.get("deletes")
        if dels and dels.get("n"):
            self._tombstones = _read_tombstones(root, dels["gen"])

    def close(self) -> None:
        """Release broadcast state held by this handle. NOTE: destroys the
        filter broadcasts, so DataFrames previously returned by filtered
        queries on this handle must not be re-executed afterwards."""
        for bc in self._filter_bc.values():
            if bc is not None:
                bc.destroy()
        self._filter_bc.clear()
        if self._denied_bc is not None:
            self._denied_bc.destroy()
            self._denied_bc = None

    # ---------------------------------------------------------- deletes ---
    def _denied(self):
        """Broadcast tombstone set for the scorers (lazy, one per handle)."""
        if self._tombstones is None:
            return None
        if self._denied_bc is None:
            self._denied_bc = self.spark.sparkContext.broadcast(
                self._tombstones)
        return self._denied_bc

    def _live_mask(self, d: np.ndarray) -> Optional[np.ndarray]:
        """Boolean mask of NON-deleted entries of ``d``, or None when no
        tombstones exist (driver-side twin of the scorer-side mask)."""
        return _live_mask_arr(d, self._tombstones)

    def delete_docs(self, doc_ids) -> dict:
        """Tombstone ``doc_ids`` [public: Lucene IndexWriter.deleteDocuments
        / Solr deleteById]: the docs stop matching every query immediately;
        their postings, doc-store rows, and contribution to corpus stats
        are physically purged at the next merge/compaction (Lucene liveDocs
        semantics — df/avgdl stay at their build-time values until then,
        which keeps surviving docs' scores IDENTICAL to pre-delete scores).

        Commit protocol: the new tombstone generation is written as a
        parquet table first, the manifest pointing at it last — a crash
        between the two leaves the previous generation live."""
        ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
        if self._tombstones is not None:
            ids = np.union1d(ids, self._tombstones)
        if ids.size > FILTER_BROADCAST_LIMIT:
            raise ValueError(
                f"{ids.size} tombstones exceed the broadcastable bound "
                f"({FILTER_BROADCAST_LIMIT}); run compact/merge to purge "
                "them physically before deleting more")
        gen = int(self.manifest.get("deletes", {}).get("gen", 0)) + 1
        CATALOG.write_table(
            self.spark.createDataFrame(
                pd.DataFrame({"doc_id": ids}), "doc_id long"),
            _deletes_path(self.root, gen))
        man = dict(self.manifest)
        man["deletes"] = {"gen": gen, "n": int(ids.size)}
        CATALOG.commit_snapshot(self.root, man)
        # ADVICE r5 (low): superseded generations accumulate forever on
        # long-lived indexes — drop the previous one now that the manifest
        # no longer references it (same post-commit cleanup pattern as
        # compact_segments uses for old postings/dict dirs)
        if gen > 1:
            import shutil as _sh
            _sh.rmtree(_deletes_path(self.root, gen - 1),
                       ignore_errors=True)
        self.manifest = man
        self._tombstones = ids
        if self._denied_bc is not None:
            # unpersist, not destroy: previously returned DataFrames may
            # still re-execute against the old broadcast (same rule as
            # _filter_bc eviction)
            self._denied_bc.unpersist(blocking=False)
            self._denied_bc = None
        return man

    def delete_by_query(self, doc_filter: str) -> dict:
        """Solr delete-by-query analogue: tombstone every doc matching a
        SQL boolean expression over the docs table's attribute columns."""
        ids = (read_docs(self.spark, self.root).where(doc_filter)
               .select("doc_id").limit(FILTER_BROADCAST_LIMIT + 1)
               .toPandas()["doc_id"].to_numpy(dtype=np.int64))
        if ids.size > FILTER_BROADCAST_LIMIT:
            raise ValueError(
                "delete_by_query matches more docs than the tombstone "
                "bound; delete in narrower slices with compactions between")
        return self.delete_docs(ids)

    # ----------------------------------------------------------- lookup ---
    def term_stats(self, terms: list[str]) -> dict[str, int]:
        """df per term. Small vocabularies preload the whole dict into the
        driver once (Arrow, one job) — every later query costs ZERO lookup
        jobs; large ones fall back to a partition-pruned per-query lookup
        with incremental caching (VERDICT r2 #3: per-query fixed job
        count)."""
        missing = [t for t in terms if t not in self._dict_cache]
        if missing and not self._dict_preloaded \
                and self.stats["n_terms"] <= DICT_PRELOAD_LIMIT:
            pdf = self._dict_df.select("term", "df").toPandas()
            self._dict_cache = {
                t: int(v) for t, v in zip(pdf["term"].to_numpy(),
                                          pdf["df"].to_numpy())}
            self._dict_preloaded = True
            missing = [t for t in terms if t not in self._dict_cache]
        if missing:
            if self._dict_preloaded:
                for t in missing:           # genuinely absent from the index
                    self._dict_cache[t] = 0
            else:
                buckets = sorted({term_bucket(t, self.cfg.n_buckets)
                                  for t in missing})
                rows = (self._dict_df
                        .where(F.col("bucket").isin(buckets))
                        .where(F.col("term").isin(missing))
                        .select("term", "df").collect())
                found = {r["term"]: r["df"] for r in rows}
                for t in missing:
                    self._dict_cache[t] = int(found.get(t, 0))
        return {t: self._dict_cache[t] for t in terms}

    # ---------------------------------------------------- impact sidecar ---
    def _impact_rows(self, terms: list) -> dict:
        """Collect (and cache) the impact-sidecar rows of ``terms`` in ONE
        bucket/term-pruned job. Rows: (term, seg, doc_id, tf, dl) with
        doc_id = -1 marking the per-(term, segment) rest bound. Terms whose
        global df <= impact_df_threshold can have no rows (per-segment df
        <= global df) and are skipped without a job."""
        missing = [t for t in terms if t not in self._impact_cache]
        if missing and self._impacts_df is not None:
            buckets = sorted({term_bucket(t, self.cfg.n_buckets)
                              for t in missing})
            pdf = (self._impacts_df
                   .where(F.col("bucket").isin(buckets))
                   .where(F.col("term").isin(missing))
                   .select("term", "seg", "doc_id", "tf", "dl").toPandas())
            for t in missing:
                while len(self._impact_cache) >= self._impact_cache_max:
                    self._impact_cache.pop(next(iter(self._impact_cache)))
                self._impact_cache[t] = \
                    pdf[pdf["term"] == t].reset_index(drop=True)
        return {t: self._impact_cache.get(t) for t in terms}

    def _segs_containing(self, term: str) -> set:
        """Live segments whose per-segment dictionary contains ``term``
        (pruned read of the tiny dict_segs table; cached per term). Used
        only to validate sidecar coverage on multi-segment indexes."""
        if term in self._seg_df_cache:
            return self._seg_df_cache[term]
        ip = IndexPaths(self.root)
        live = [s["seg"] for s in self.manifest["segments"]]
        dd = CATALOG.read_table(self.spark, *[ip.dict_seg(s) for s in live],
                                base_path=ip.dict_segs)
        rows = (dd.where(F.col("bucket") ==
                         term_bucket(term, self.cfg.n_buckets))
                .where(F.col("term") == term).select("seg").collect())
        res = {int(r["seg"]) for r in rows}
        while len(self._seg_df_cache) >= self._impact_cache_max:
            self._seg_df_cache.pop(next(iter(self._seg_df_cache)))
        self._seg_df_cache[term] = res
        return res

    def _impact_topk_single(self, term: str, idf_t: float, df_t: int,
                            k: int):
        """Head-term early exit [public: Lucene 8 impacts / Anh & Moffat
        2006]: answer a single-term top-k ENTIRELY from the sidecar — zero
        posting blocks decoded — when the k-th sidecar score strictly
        beats the exact (max tf, min dl) bound over every posting the
        sidecar excludes. Returns an ordered k-row DataFrame, or None to
        fall back to the full scan (coverage gap, bound too tight, or
        k > sidecar size). Lossless: excluded postings score <= bound <
        theta under any avgdl, and equal-score ties at the boundary cannot
        occur because acceptance requires strict separation."""
        rows = self._impact_rows([term]).get(term)
        if rows is None or rows.empty:
            return None
        bounds = rows[rows["doc_id"] < 0]
        cands = rows[rows["doc_id"] >= 0]
        live = self._live_mask(cands["doc_id"].to_numpy(dtype=np.int64))
        if live is not None:
            cands = cands[live]          # tombstoned docs never answer
        covered = {int(s) for s in bounds["seg"]}
        live = {s["seg"] for s in self.manifest["segments"]}
        if covered != live:
            # term may have (un-bounded) postings in an uncovered segment:
            # allowed only if its per-segment dicts say it is absent there
            if not self._segs_containing(term).issubset(covered):
                return None
        k1, b = self.cfg.k1, self.cfg.b
        avg = self.stats["avg_dl"]
        tf = cands["tf"].to_numpy(dtype=np.float64)
        dl = cands["dl"].to_numpy(dtype=np.float64)
        d = cands["doc_id"].to_numpy(dtype=np.int64)
        sc = idf_t * (tf / (tf + k1 * (1.0 - b + b * dl / avg)))
        order = np.lexsort((d, -sc))
        d, sc = d[order], sc[order]
        btf = bounds["tf"].to_numpy(dtype=np.float64)
        bdl = bounds["dl"].to_numpy(dtype=np.float64)
        bound = float(np.max(
            idf_t * (btf / (btf + k1 * (1.0 - b + b * bdl / avg)))))
        if d.size >= k:
            theta = float(sc[k - 1])
            if theta - bound <= _PRUNE_EPS * max(1.0, abs(theta)):
                return None            # not strictly separated -> full scan
            d, sc = d[:k], sc[:k]
        elif d.size < df_t:
            return None                # incomplete and cannot fill k
        # same ordering CONTRACT as the slow path's trailing
        # .orderBy(score desc, doc_id asc).limit(k) (ADVICE r4): without
        # it a consumer that repartitions/re-plans the returned DataFrame
        # could observe a different row order than the full-scan path
        return self.spark.createDataFrame(
            pd.DataFrame({"doc_id": d.astype(np.int64),
                          "score": sc.astype(np.float64)}),
            "doc_id long, score double") \
            .orderBy(F.desc("score"), F.asc("doc_id"))

    def _impact_topk_multi(self, terms: list, idf: dict, dfs: dict,
                           k: int, mode: str):
        """Multi-term early exit (VERDICT r4 #2): answer an OR/AND top-k
        ENTIRELY from the sidecars when every query term is sidecar-
        covered and the k-th FULLY-COVERED doc strictly beats every
        possible rival. Generalizes _impact_topk_single's acceptance:

        * a doc present in EVERY term's sidecar has an EXACT score (each
          (term, doc) posting carries exact tf/dl), accumulated in the
          scorer's frozen term order so floats agree bit-for-bit;
        * a doc missing from term t's sidecar may still contain t in the
          tail, so its score is only bounded: partial sum + Σ_absent B_t,
          where B_t is the term's exact excluded-(tf, min-dl) skyline
          bound (0 when the sidecar holds ALL of t's postings — the tf=0
          coverage marker);
        * docs in NO sidecar are bounded by Σ_t B_t.

        Accept iff ≥ k fully-covered docs exist and the k-th strictly
        beats the max rival bound (same eps rule as the single-term
        path); when every term is COMPLETE (Σ B_t = 0) all union scores
        are exact and the answer needs no separation at all. Returns an
        ordered ≤ k-row DataFrame or None to fall back to the full scan."""
        terms = sorted(terms)
        rows = self._impact_rows(terms)
        live = {s["seg"] for s in self.manifest["segments"]}
        k1, b = self.cfg.k1, self.cfg.b
        avg = self.stats["avg_dl"]
        per: dict[str, tuple] = {}
        B: dict[str, float] = {}
        for t in terms:
            r = rows.get(t)
            if r is None or r.empty:
                return None
            bounds = r[r["doc_id"] < 0]
            cands = r[r["doc_id"] >= 0]
            alive = self._live_mask(cands["doc_id"].to_numpy(dtype=np.int64))
            if alive is not None:
                cands = cands[alive]     # tombstoned docs never answer
            covered = {int(s) for s in bounds["seg"]}
            if covered != live \
                    and not self._segs_containing(t).issubset(covered):
                return None            # un-bounded postings somewhere
            tf = cands["tf"].to_numpy(dtype=np.float64)
            dl = cands["dl"].to_numpy(dtype=np.float64)
            sc = idf[t] * (tf / (tf + k1 * (1.0 - b + b * dl / avg)))
            per[t] = (cands["doc_id"].to_numpy(dtype=np.int64), sc)
            btf = bounds["tf"].to_numpy(dtype=np.float64)
            bdl = bounds["dl"].to_numpy(dtype=np.float64)
            B[t] = float(np.max(
                idf[t] * (btf / (btf + k1 * (1.0 - b + b * bdl / avg)))))
        tot_b = float(sum(B.values()))
        all_docs = np.unique(np.concatenate([per[t][0] for t in terms]))
        total = np.zeros(all_docs.size, dtype=np.float64)
        n_cov = np.zeros(all_docs.size, dtype=np.int64)
        b_cov = np.zeros(all_docs.size, dtype=np.float64)
        for t in terms:                # scorer's frozen accumulation order
            d, sc = per[t]
            pos = np.searchsorted(all_docs, d)
            total[pos] += sc
            n_cov[pos] += 1
            b_cov[pos] += B[t]
        full = n_cov == len(terms)

        def topk(d, sc, kk):
            order = np.lexsort((d, -sc))[:kk]
            return self.spark.createDataFrame(
                pd.DataFrame({"doc_id": d[order].astype(np.int64),
                              "score": sc[order].astype(np.float64)}),
                "doc_id long, score double") \
                .orderBy(F.desc("score"), F.asc("doc_id"))

        if tot_b == 0.0:
            # every term complete: the union carries every matching doc
            # with its exact score — no separation test needed, and (like
            # a full scan) fewer than k rows is a valid answer
            if mode == "AND":
                return topk(all_docs[full], total[full], k)
            return topk(all_docs, total, k)
        if int(full.sum()) < k:
            return None
        fd, fs = all_docs[full], total[full]
        order = np.lexsort((fd, -fs))
        theta = float(fs[order[k - 1]])
        partial = ~full
        max_rival = tot_b
        if partial.any():
            ub = total[partial] + (tot_b - b_cov[partial])
            max_rival = max(max_rival, float(ub.max()))
        if theta - max_rival <= _PRUNE_EPS * max(1.0, abs(theta)):
            return None                # not strictly separated
        return topk(fd, fs, k)

    def _impact_theta0(self, terms, idf, avg_dl, k, mode) -> float:
        """WAND theta seed from the impact sidecars (replaces the two-job
        _seed_theta whenever a query term is sidecar-covered — the collect
        is one tiny pruned read, cached per term). OR: per-doc PARTIAL
        sums over sidecar-present terms are lower bounds of real achieved
        scores, so their k-th largest is a valid theta0. AND: restricted
        to docs present in EVERY term's sidecar (those provably match all
        terms and their sums are exact)."""
        if self._impacts_df is None:
            return 0.0
        thr = self.cfg.impact_df_threshold
        big = [t for t in terms if self._dict_cache.get(t, thr + 1) > thr]
        if not big:
            return 0.0
        rows = self._impact_rows(big)
        k1, b = self.cfg.k1, self.cfg.b
        per = []
        for t in (terms if mode == "AND" else big):
            r = rows.get(t)
            if r is None or r.empty or (r["doc_id"] >= 0).sum() == 0:
                if mode == "AND":
                    return 0.0      # intersection requires every term
                continue
            c = r[r["doc_id"] >= 0]
            alive = self._live_mask(c["doc_id"].to_numpy(dtype=np.int64))
            if alive is not None:
                c = c[alive]    # a deleted doc's partial sum must not
                                # seed θ0 — live docs might all score lower
            if c.empty:
                if mode == "AND":
                    return 0.0
                continue
            avg = float(avg_dl[t]) if isinstance(avg_dl, dict) else avg_dl
            tfa = c["tf"].to_numpy(dtype=np.float64)
            dla = c["dl"].to_numpy(dtype=np.float64)
            s = idf[t] * (tfa / (tfa + k1 * (1.0 - b + b * dla / avg)))
            per.append(pd.DataFrame({"doc_id": c["doc_id"].to_numpy(),
                                     "s": s, "t": t}))
        if not per:
            return 0.0
        allr = pd.concat(per, ignore_index=True)
        if mode == "AND":
            g = allr.groupby("doc_id").agg(n=("t", "nunique"), s=("s", "sum"))
            sc = g[g["n"] == len(terms)]["s"].to_numpy()
        else:
            sc = allr.groupby("doc_id")["s"].sum().to_numpy()
        if sc.size < k:
            return 0.0
        return float(np.partition(sc, -k)[-k])

    # ----------------------------------------------------------- search ---
    def expand_prefix(self, prefix: str,
                      max_expansions: int = 64) -> list[str]:
        """Dictionary terms starting with ``prefix`` [public: Lucene
        PrefixQuery rewrite; Solr wildcard]. Bounded: more than
        ``max_expansions`` matches raises instead of silently truncating
        (a truncated expansion would change results non-deterministically
        with segment layout)."""
        if not prefix:
            raise ValueError("empty prefix")
        if not self._dict_preloaded \
                and self.stats["n_terms"] <= DICT_PRELOAD_LIMIT:
            self.term_stats([prefix])        # triggers the one-time preload
        if self._dict_preloaded:
            out = sorted(t for t in self._dict_cache
                         if t.startswith(prefix)
                         and self._dict_cache[t] > 0)[:max_expansions + 1]
        else:
            # large-vocab path: pushed-down startsWith scan of the dict
            out = sorted(r["term"] for r in self._dict_df
                         .where(F.col("term").startswith(prefix))
                         .select("term").limit(max_expansions + 1).collect())
        if len(out) > max_expansions:
            raise ValueError(
                f"prefix '{prefix}*' expands to more than {max_expansions} "
                "terms; use a longer prefix or raise max_expansions")
        return out

    def expand_fuzzy(self, word: str, max_dist: int = 2,
                     max_expansions: int = 50) -> list[str]:
        """Dictionary terms within Levenshtein distance ``max_dist`` of
        ``word`` [public: Lucene FuzzyQuery]. Candidates come from the
        char-bigram q-gram filter when it is LOSSLESS — a term at edit
        distance d shares at least len(word)-1-2d bigrams with the word
        (q-gram lemma), so the filter is complete only while that bound
        is >= 1; shorter words scan the full dictionary. Ranked (distance
        asc, term asc) and capped at ``max_expansions`` keeping the
        CLOSEST terms (Lucene's best-terms rewrite cap — unlike prefix
        expansion, exceeding the cap is normal, not an error; Lucene
        classic caps a DFA enumeration the same way)."""
        if not word:
            raise ValueError("empty fuzzy term")
        cand = self._dict_df.select("term").distinct()
        if (len(word) - 1) - 2 * max_dist >= 1:
            pred = None
            for g in sorted({word[i:i + 2] for i in range(len(word) - 1)}):
                c = F.col("term").contains(g)
                pred = c if pred is None else (pred | c)
            cand = cand.where(pred)
        rows = (cand
                .withColumn("dist", F.levenshtein(F.col("term"),
                                                  F.lit(word)))
                .where(F.col("dist") <= max_dist)
                .orderBy(F.asc("dist"), F.asc("term"))
                .limit(max_expansions).collect())
        return [r["term"] for r in rows]

    def expand_wildcard(self, pattern: str,
                        max_expansions: int = 64) -> list[str]:
        """Dictionary terms matching a glob ``pattern`` ('*' = any run,
        '?' = one char) [public: Lucene WildcardQuery]. Like prefix
        expansion the match set is exact-or-error: more than
        ``max_expansions`` matches raises (a truncated wildcard would
        change results with segment layout). The literal prefix before
        the first wildcard is pushed down as a startsWith predicate so
        the dict scan prunes on it; the regex itself runs JVM-side
        (rlike) on the pruned rows — no driver-side full-vocab pass on
        the large-vocab path."""
        if not pattern or not pattern.strip("*?"):
            raise ValueError("wildcard pattern needs at least one "
                             f"literal character: {pattern!r}")
        rx = "^" + "".join(
            ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
            for ch in pattern) + "$"
        lit = re.match(r"[^*?]*", pattern).group(0)
        if not self._dict_preloaded \
                and self.stats["n_terms"] <= DICT_PRELOAD_LIMIT:
            self.term_stats([lit or pattern])   # one-time preload trigger
        if self._dict_preloaded:
            crx = re.compile(rx)
            out = sorted(t for t in self._dict_cache
                         if crx.match(t)
                         and self._dict_cache[t] > 0)[:max_expansions + 1]
        else:
            cand = self._dict_df
            if lit:
                cand = cand.where(F.col("term").startswith(lit))
            out = sorted(r["term"] for r in cand
                         .where(F.col("term").rlike(rx))
                         .select("term").limit(max_expansions + 1).collect())
        if len(out) > max_expansions:
            raise ValueError(
                f"wildcard {pattern!r} expands to more than "
                f"{max_expansions} terms; narrow it or raise "
                "max_expansions")
        return out

    def expand_range(self, lo: Optional[str], hi: Optional[str],
                     incl_lo: bool = True, incl_hi: bool = True,
                     max_expansions: int = 64) -> list[str]:
        """Dictionary terms in the lexicographic range [public: Lucene
        TermRangeQuery; Solr field:[a TO b]]. ``None`` = unbounded on
        that side ('*' in query syntax); square bracket = inclusive,
        curly = exclusive. Exact-or-error like prefix expansion. Both
        bounds are pushable comparison predicates, so the dict scan
        prunes row groups on the large-vocab path."""
        if lo is None and hi is None:
            raise ValueError("term range needs at least one bound")
        if self._dict_preloaded:
            def ok(t):
                if lo is not None and (t < lo or (t == lo and not incl_lo)):
                    return False
                if hi is not None and (t > hi or (t == hi and not incl_hi)):
                    return False
                return True
            out = sorted(t for t in self._dict_cache
                         if ok(t)
                         and self._dict_cache[t] > 0)[:max_expansions + 1]
        else:
            cand = self._dict_df
            if lo is not None:
                cand = cand.where(F.col("term") >= lo if incl_lo
                                  else F.col("term") > lo)
            if hi is not None:
                cand = cand.where(F.col("term") <= hi if incl_hi
                                  else F.col("term") < hi)
            out = sorted(r["term"] for r in cand.select("term")
                         .limit(max_expansions + 1).collect())
        if len(out) > max_expansions:
            b = lambda x: "*" if x is None else x  # noqa: E731
            raise ValueError(
                f"range [{b(lo)} TO {b(hi)}] expands to more than "
                f"{max_expansions} terms; narrow it or raise "
                "max_expansions")
        return out

    def expand_regexp(self, pattern: str,
                      max_expansions: int = 64) -> list[str]:
        """Dictionary terms whose ENTIRE text matches ``pattern`` [public:
        Lucene RegexpQuery; Solr field:/regex/]. Anchored on both ends
        (RegexpQuery semantics) and exact-or-error like wildcard
        expansion. Callers should stick to the portable regex core —
        literals, '.', character classes, '*', '+', '?', '|', '()'
        grouping — because the driver-cache path matches with Python
        ``re``, the large-vocab path with JVM ``rlike``, and the test
        oracle with DuckDB's RE2; the engine validates syntax driver-side
        but does not translate between dialects. The literal prefix (when
        one is guaranteed — no alternation, prefix not consumed by a
        quantifier) pushes down as a startsWith predicate on the dict
        scan, mirroring expand_wildcard."""
        if not pattern:
            raise ValueError("empty regexp")
        rx = "^(?:" + pattern + ")$"
        try:
            crx = re.compile(rx)
        except re.error as e:
            raise ValueError(f"bad regexp {pattern!r}: {e}") from e
        lit = re.match(r"[^.?*+\[\]{}()|\\^$]*", pattern).group(0)
        if len(lit) < len(pattern) and pattern[len(lit)] in "*?{":
            lit = lit[:-1]      # quantifier binds the last literal char
        if "|" in pattern:
            lit = ""            # top-level alternation voids any prefix
        if not self._dict_preloaded \
                and self.stats["n_terms"] <= DICT_PRELOAD_LIMIT:
            self.term_stats([lit or pattern])   # one-time preload trigger
        if self._dict_preloaded:
            out = sorted(t for t in self._dict_cache
                         if crx.match(t)
                         and self._dict_cache[t] > 0)[:max_expansions + 1]
        else:
            cand = self._dict_df
            if lit:
                cand = cand.where(F.col("term").startswith(lit))
            out = sorted(r["term"] for r in cand
                         .where(F.col("term").rlike(rx))
                         .select("term").limit(max_expansions + 1).collect())
        if len(out) > max_expansions:
            raise ValueError(
                f"regexp /{pattern}/ expands to more than "
                f"{max_expansions} terms; narrow it or raise "
                "max_expansions")
        return out

    def search(self, query: str, k: int = 10, mode: str = "OR",
               doc_filter: Optional[str] = None, prune: bool = True,
               score_partitions: Optional[int] = None,
               after: Optional[tuple] = None,
               seed_theta: Optional[bool] = None,
               must_not: Optional[list] = None,
               must: Optional[list] = None,
               max_expansions: int = 64,
               sort: bool = True) -> DataFrame:
        """Top-k BM25. Returns DataFrame (doc_id long, score double), ordered
        by (score desc, doc_id asc), <= k rows.

        doc_filter: SQL boolean expression over the docs table's attribute
        columns (conv_id, turn_idx, role, tool, ts) — Solr fq semantics (D9):
        restricts candidates, does not change scores.

        after: (score, doc_id) cursor for deep paging (Solr cursorMark
        analogue, D11): returns the top-k strictly after that position in
        (score desc, doc_id asc) order. Applied pre-heap in the scorer, so
        page N keeps full truncation + WAND pruning. Scores are
        deterministic float64, so the cursor round-trips exactly.

        must_not: words whose docs are EXCLUDED [public: Lucene
        BooleanQuery MUST_NOT; Solr -term]: candidates containing any of
        them are masked pre-heap; survivors' scores are untouched
        (exclusion never contributes to scoring). A pure-negative query
        (no surviving positive term) returns empty, as in Lucene.

        must: words that are REQUIRED [public: Lucene BooleanQuery MUST +
        SHOULD]: a doc matches only if it contains every one of them, but
        the remaining (SHOULD) query terms still add to its score — the
        classic '+term' semantics. A must-word absent from the index
        matches nothing, exactly like mode="AND". must ⊆ query terms is
        not needed; must words join the scored term set automatically.

        sort=False (facet/export internal path): return EVERY matching
        doc with its exact score, unsorted and unlimited — pruning, heap
        truncation, and the impact fast path are disabled; ``k`` is
        ignored.

        Prefix queries: a whitespace token ending in '*' (e.g. "spar*")
        expands to every dictionary term with that prefix (bounded by
        ``max_expansions``, error beyond) and joins the OR as ordinary
        scored terms [public: Lucene SCORING_BOOLEAN_REWRITE]. AND mode
        rejects prefixes: "all expansions required" is never what a
        wildcard means.
        """
        spark = self.spark
        empty = spark.createDataFrame([], "doc_id long, score double")
        plain_parts, prefixes = [], []
        for part in query.split():
            if part.endswith("*") and len(part) > 1:
                toks = tokenize_py(part[:-1], self.cfg.stopwords)
                if toks:
                    prefixes.append(toks[-1])
                    plain_parts.extend(toks[:-1])
            else:
                plain_parts.append(part)
        terms = sorted(set(tokenize_py(" ".join(plain_parts),
                                       self.cfg.stopwords)))
        req = sorted({t for w in (must or [])
                      for t in tokenize_py(str(w), self.cfg.stopwords)})
        if req:
            terms = sorted(set(terms) | set(req))
        if prefixes:
            if mode == "AND":
                raise ValueError("prefix queries are OR-only")
            for pfx in prefixes:
                terms = sorted(set(terms)
                               | set(self.expand_prefix(pfx,
                                                        max_expansions)))
        if not terms:
            return empty
        dfs = self.term_stats(terms)
        # required-term semantics [public: Lucene BooleanQuery MUST]: an AND
        # query containing a term absent from the index matches nothing —
        # checked against the ORIGINAL term list, before dropping df==0
        # terms; a MUST word absent from the index matches nothing too
        if mode == "AND" and any(dfs[t] == 0 for t in terms):
            return empty
        if any(dfs[t] == 0 for t in req):
            return empty
        terms = [t for t in terms if dfs[t] > 0]
        if not terms:
            return empty
        if mode == "AND" or (req and set(req) == set(terms)):
            # every term required: the dedicated AND path IS this query
            mode, req = "AND", []
        excl = sorted({t for w in (must_not or [])
                       for t in tokenize_py(str(w), self.cfg.stopwords)})
        if excl:
            edfs = self.term_stats(excl)
            excl = [t for t in excl if edfs[t] > 0]
        n_docs = self.stats["n_docs"]
        avg_dl = self.stats["avg_dl"]
        idf = {t: bm25_idf(n_docs, dfs[t]) for t in terms}
        if (sort and doc_filter is None and after is None and prune
                and not excl and not req and k <= self.cfg.impact_top
                and all(dfs[t] > self.cfg.impact_df_threshold
                        for t in terms)):
            if len(terms) == 1:
                fast = self._impact_topk_single(terms[0], idf[terms[0]],
                                                dfs[terms[0]], k)
            else:
                fast = self._impact_topk_multi(terms, idf, dfs, k, mode)
            if fast is not None:
                return fast
        return self._search_terms(
            terms, dfs, idf, avg_dl, k=k, mode=mode, doc_filter=doc_filter,
            prune=prune and sort, score_partitions=score_partitions,
            after=after, seed_theta=seed_theta, excl_terms=excl,
            required=req or None, sort=sort)

    def search_facets(self, query: str, facet_fields: list,
                      mode: str = "OR", doc_filter: Optional[str] = None,
                      must: Optional[list] = None,
                      must_not: Optional[list] = None) -> DataFrame:
        """Field faceting over the query's FULL matching doc set [public:
        Solr facet.field; Lucene facets] — the counts a search UI shows
        next to the top-k page, computed over every match, not the page.

        Matching rides the ordinary scorer with pruning, θ seeding, heap
        truncation, and the global top-k sort all disabled (facets need
        every match; ``sort=False`` path): the plan is the same pruned
        block scan -> streaming scorer -> left-semi join into the doc
        store -> stack(field, value) -> groupBy/count. Distributed
        end-to-end with no driver collect and no top-k heap — the shape
        that survives faceting a head term at corpus scale. Tombstones
        are masked inside the scorer like every other query path.

        Returns (field string, value string, n long), one row per facet
        field value with >= 1 matching doc (null values dropped, like
        Solr's default facet.missing=false)."""
        if not facet_fields:
            raise ValueError("facet_fields must be non-empty")
        matches = self.search(query, k=1, mode=mode, doc_filter=doc_filter,
                              must=must, must_not=must_not, prune=False,
                              sort=False).select("doc_id")
        stack_expr = "stack({}, {}) as (field, value)".format(
            len(facet_fields),
            ", ".join(f"'{f}', cast({f} as string)" for f in facet_fields))
        return (read_docs(self.spark, self.root)
                .join(matches, "doc_id", "left_semi")
                .selectExpr(stack_expr)
                .where(F.col("value").isNotNull())
                .groupBy("field", "value").agg(F.count("*").alias("n")))

    def search_facet_range(self, query: str, field: str,
                           start, end, gap,
                           mode: str = "OR",
                           doc_filter: Optional[str] = None,
                           must: Optional[list] = None,
                           must_not: Optional[list] = None) -> DataFrame:
        """Range faceting over the query's full match set [public: Solr
        facet.range]: doc counts per ``[start + i*gap, start + (i+1)*gap)``
        bucket of a numeric doc-store ``field``, computed over EVERY
        matching doc. Values outside ``[start, end)`` and nulls are
        dropped (Solr's default ``facet.range.other=none``); the last
        bucket keeps its full ``gap`` width (Solr raises ``end`` to
        ``start + ceil((end-start)/gap)*gap`` — same here, since the
        bucket floor, not ``end``, bounds membership).

        Same distributed shape as search_facets: unpruned/unsorted scorer
        (``sort=False``) -> left-semi join into the doc store -> one
        groupBy over the bucket floor. Returns (bucket_lo long, n long),
        only buckets with >= 1 matching doc (Solr mincount=1 behaviour;
        a UI zero-fills client-side from start/end/gap). Integer
        start/end/gap only — bucket_lo is a long."""
        if gap <= 0 or end <= start:
            raise ValueError("need gap > 0 and end > start")
        if not all(isinstance(x, int) for x in (start, end, gap)):
            raise ValueError("integer start/end/gap only")
        matches = self.search(query, k=1, mode=mode, doc_filter=doc_filter,
                              must=must, must_not=must_not, prune=False,
                              sort=False).select("doc_id")
        v = F.col(field)
        bucket_lo = (F.lit(start)
                     + F.floor((v - start) / gap) * gap).cast("long")
        return (read_docs(self.spark, self.root)
                .join(matches, "doc_id", "left_semi")
                .where(v.isNotNull() & (v >= start) & (v < end))
                .select(bucket_lo.alias("bucket_lo"))
                .groupBy("bucket_lo").agg(F.count("*").alias("n")))

    def search_collapse(self, query: str, collapse_field: str, k: int = 10,
                        mode: str = "OR", doc_filter: Optional[str] = None,
                        must: Optional[list] = None,
                        must_not: Optional[list] = None) -> DataFrame:
        """Field collapsing on the query path [public: Solr
        CollapsingQParserPlugin (`fq={!collapse field=f}`); Lucene grouping
        module]: the match set collapses to its single best hit per
        ``collapse_field`` value (highest score, ties to the lowest
        doc_id — the engine's standard total order), THEN the top-k page
        is taken over the group representatives. Correct collapsing needs
        the FULL match set (a pre-collapsed top-k could starve groups), so
        this rides the unpruned ``sort=False`` scorer like facets, then
        one window rank per group and the ordinary global top-k — two
        shuffles total (group hash, final TakeOrdered), no driver collect.

        A null group value forms ONE group like any other value (Spark
        window and SQL GROUP BY semantics; deviation from Solr's default
        nullPolicy=ignore, declared here). Returns (doc_id long, score
        double, <collapse_field>), ordered (score desc, doc_id asc),
        <= k rows."""
        from pyspark.sql import Window
        m = self.search(query, k=1, mode=mode, doc_filter=doc_filter,
                        must=must, must_not=must_not, prune=False,
                        sort=False)
        joined = m.join(
            read_docs(self.spark, self.root)
            .select("doc_id", collapse_field), "doc_id", "inner")
        w = (Window.partitionBy(collapse_field)
             .orderBy(F.desc("score"), F.asc("doc_id")))
        return (joined.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1).drop("_rn")
                .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))

    def search_facet_pivot(self, query: str, field_a: str, field_b: str,
                           mode: str = "OR",
                           doc_filter: Optional[str] = None,
                           must: Optional[list] = None,
                           must_not: Optional[list] = None) -> DataFrame:
        """Pivot (nested) faceting over the query's full match set
        [public: Solr facet.pivot=`a,b`]: doc counts per (field_a,
        field_b) value pair across EVERY matching doc — the drill-down
        tree a search UI renders, flattened to rows. Same full-match
        shape as facets: sort=False scorer -> left-semi join -> ONE
        two-key groupBy (the nested tree is a client-side regroup of
        these rows — no extra pass needed). Rows where either field is
        null are dropped (facet.missing=false at both levels). Returns
        (value_a string, value_b string, n long)."""
        m = self.search(query, k=1, mode=mode, doc_filter=doc_filter,
                        must=must, must_not=must_not, prune=False,
                        sort=False).select("doc_id")
        return (read_docs(self.spark, self.root)
                .join(m, "doc_id", "left_semi")
                .where(F.col(field_a).isNotNull()
                       & F.col(field_b).isNotNull())
                .select(F.col(field_a).cast("string").alias("value_a"),
                        F.col(field_b).cast("string").alias("value_b"))
                .groupBy("value_a", "value_b")
                .agg(F.count("*").alias("n")))

    def search_sort_by(self, query: str, by: str, k: int = 10,
                       ascending: bool = True, mode: str = "OR",
                       doc_filter: Optional[str] = None,
                       must: Optional[list] = None,
                       must_not: Optional[list] = None) -> DataFrame:
        """Field-sorted results [public: Solr `sort=field asc|desc` on
        /select; Lucene Sort/SortField]: the top-k of the FULL match set
        ordered by a doc-store field instead of relevance. A score-pruned
        scorer is unsound here (the best-by-field doc may score lowest),
        so the match set comes from the unpruned ``sort=False`` scorer,
        joins the sort field, and one TakeOrdered picks the page —
        exactly the shape Solr uses (bypass relevance, walk the field).
        Nulls sort LAST in both directions (Solr sortMissingLast
        analogue, declared); ties break by doc_id ascending (the
        engine's standard total order). Returns (doc_id long, score
        double, <by>), <= k rows."""
        m = self.search(query, k=1, mode=mode, doc_filter=doc_filter,
                        must=must, must_not=must_not, prune=False,
                        sort=False)
        joined = m.join(
            read_docs(self.spark, self.root).select("doc_id", by),
            "doc_id", "inner")
        key = (F.col(by).asc_nulls_last() if ascending
               else F.col(by).desc_nulls_last())
        return joined.orderBy(key, F.asc("doc_id")).limit(k)

    def search_facet_stats(self, query: str, field: str,
                           mode: str = "OR",
                           doc_filter: Optional[str] = None,
                           must: Optional[list] = None,
                           must_not: Optional[list] = None) -> DataFrame:
        """Numeric stats over the query's full match set [public: Solr
        StatsComponent (`stats.field`); JSON facet aggregations]:
        count/sum/mean/min/max of a doc-store numeric field across EVERY
        matching doc. Same full-match shape as facets (``sort=False``
        scorer -> left-semi join -> ONE partial+final aggregate); nulls
        excluded from all five stats (Solr counts them separately as
        `missing` — not returned here). Returns one row
        (n long, sum_v, avg_v double, min_v, max_v)."""
        m = self.search(query, k=1, mode=mode, doc_filter=doc_filter,
                        must=must, must_not=must_not, prune=False,
                        sort=False).select("doc_id")
        v = F.col(field)
        return (read_docs(self.spark, self.root)
                .join(m, "doc_id", "left_semi")
                .agg(F.count(v).alias("n"),
                     F.sum(v).alias("sum_v"),
                     F.avg(v).alias("avg_v"),
                     F.min(v).alias("min_v"),
                     F.max(v).alias("max_v")))

    def export_matches(self, query: str, columns: tuple = (),
                       mode: str = "OR", doc_filter: Optional[str] = None,
                       must: Optional[list] = None,
                       must_not: Optional[list] = None) -> DataFrame:
        """Full match-set export [public: Solr /export handler (streaming
        expressions source); Lucene searchAfter exhaustion]: EVERY doc
        matching the query with its exact BM25 score, plus any requested
        doc-store ``columns`` — the feed a reranker or a downstream join
        consumes, where top-k truncation would be wrong.

        The scorer runs unpruned/unsorted/untruncated (``sort=False``) so
        the result is the complete match set; no driver collect, no heap —
        the output stays a distributed DataFrame the caller writes or
        joins. Deliberately UNORDERED (a global sort of an unbounded
        match set is the one thing /export refuses too — Solr streams by
        segment order; callers sort after narrowing). Returns
        (doc_id long, score double, *columns)."""
        out = self.search(query, k=1, mode=mode, doc_filter=doc_filter,
                          must=must, must_not=must_not, prune=False,
                          sort=False)
        if columns:
            out = out.join(
                read_docs(self.spark, self.root)
                .select("doc_id", *columns), "doc_id", "inner")
        return out

    def search_boosted(self, query: str, boost_by: str, k: int = 10,
                       additive: bool = False, mode: str = "OR",
                       doc_filter: Optional[str] = None,
                       must: Optional[list] = None,
                       must_not: Optional[list] = None) -> DataFrame:
        """Function-score boosting [public: Solr `boost=`/`bf=` params;
        Lucene FunctionScoreQuery]: final score = bm25 * f(doc) (or
        bm25 + f(doc) with ``additive=True``, Solr's `bf`), where
        ``boost_by`` is a SQL expression over doc-store columns evaluated
        per matching doc — recency decay, length priors, popularity
        signals. An unbounded boost can promote ANY match into the page,
        so score-pruned top-k is unsound here: the match set rides the
        unpruned ``sort=False`` scorer, joins the doc store once, and one
        TakeOrdered picks the page (same full-match shape as
        search_sort_by). A null boost value is the neutral element
        (1 multiplicative / 0 additive — deterministic; Solr's
        `field(f,def)` default analogue, declared). Ties break by doc_id
        ascending. Returns (doc_id long, score double), <= k rows —
        ``score`` is the BOOSTED score."""
        m = self.search(query, k=1, mode=mode, doc_filter=doc_filter,
                        must=must, must_not=must_not, prune=False,
                        sort=False)
        b = F.coalesce(F.expr(boost_by).cast("double"),
                       F.lit(0.0 if additive else 1.0))
        joined = m.join(read_docs(self.spark, self.root), "doc_id", "inner")
        boosted = (F.col("score") + b) if additive else (F.col("score") * b)
        return (joined.select("doc_id", boosted.alias("score"))
                .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))

    def search_fields(self, field_queries: dict, boosts: Optional[dict] = None,
                      k: int = 10, mode: str = "OR",
                      doc_filter: Optional[str] = None, prune: bool = True,
                      score_partitions: Optional[int] = None,
                      after: Optional[tuple] = None,
                      must: Optional[dict] = None,
                      must_not: Optional[dict] = None) -> DataFrame:
        """Multi-field search with per-field boosts (Solr qf/dismax
        analogue [public: Solr DisMaxQParser]; requires an index built with
        cfg.fields). ``field_queries`` maps field -> query string; "text"
        is the main field, any other key must be in cfg.fields (indexed as
        "<field>:<term>").

        score(d) = Σ_f boost_f · Σ_{t ∈ q_f} idf(f:t) · tf_norm(tf, dl_f,
        avgdl_f) — BM25 with PER-FIELD length normalization (each fielded
        posting carries its field's dl; stats.json stores per-field avgdl).
        mode="AND" requires every term of every field to match. Same
        one-shuffle plan, truncation, WAND, filters, and paging as
        search(); the boost folds into the per-term idf weight, so the
        scorer and its block-max bounds need no special casing.

        ``must``: dict field -> words that are REQUIRED (Lucene MUST on a
        fielded clause, '+field:term'); ``must_not``: dict field -> words
        whose docs are EXCLUDED ('-field:term') — exclusion rides the
        same block scan via the fielded term names and never scores."""
        boosts = boosts or {}
        must = must or {}
        must_not = must_not or {}
        unknown = [f for f in list(field_queries) + list(must)
                   + list(must_not)
                   if f != "text" and f not in self.cfg.fields]
        if unknown:
            raise ValueError(f"fields {unknown} not indexed "
                             f"(cfg.fields={list(self.cfg.fields)})")
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        terms, boost_of, avg_of, nd_of = [], {}, {}, {}
        req: list = []
        favg = self.stats.get("fields", {})
        for occur, fq in (("SHOULD", field_queries), ("MUST", must)):
            for f, q in fq.items():
                if f != "text" and favg.get(f) is None:
                    # the field is configured but produced NO postings
                    # (e.g. all-null column): no document can match its
                    # leg — treat as zero-score rather than KeyError
                    # (ADVICE r3). AND mode / MUST fall through to the
                    # required-term df==0 check below.
                    if (mode == "AND" or occur == "MUST") \
                            and tokenize_py(q, self.cfg.stopwords):
                        return empty
                    continue
                for t in sorted(set(tokenize_py(q, self.cfg.stopwords))):
                    ft = t if f == "text" else f"{f}:{t}"
                    terms.append(ft)
                    if occur == "MUST":
                        req.append(ft)
                    boost_of[ft] = float(boosts.get(f, 1.0))
                    # per-field docCount normalization (VERDICT r4 #7)
                    # [public: Lucene per-field BM25 docCount]: both avgdl
                    # AND idf use the field's own doc count, so a
                    # 50%-sparse field ranks exactly as a dense index
                    # built on the subset would (tests/test_fields.py)
                    avg_of[ft] = (self.stats["avg_dl"] if f == "text"
                                  else favg[f]["avg_dl"])
                    nd_of[ft] = (self.stats["n_docs"] if f == "text"
                                 else favg[f].get("n_docs",
                                                  self.stats["n_docs"]))
        terms = sorted(set(terms))
        req = sorted(set(req))
        if not terms:
            return empty
        dfs = self.term_stats(terms)
        if mode == "AND" and any(dfs[t] == 0 for t in terms):
            return empty
        if any(dfs[t] == 0 for t in req):
            return empty
        terms = [t for t in terms if dfs[t] > 0]
        if not terms:
            return empty
        if mode == "AND" or (req and set(req) == set(terms)):
            mode, req = "AND", []
        excl = sorted({(t if f == "text" else f"{f}:{t}")
                       for f, q in must_not.items()
                       for t in tokenize_py(str(q), self.cfg.stopwords)})
        if excl:
            edfs = self.term_stats(excl)
            excl = [t for t in excl if edfs[t] > 0]
        idf = {t: boost_of[t] * bm25_idf(nd_of[t], dfs[t]) for t in terms}
        return self._search_terms(
            terms, dfs, idf, {t: avg_of[t] for t in terms}, k=k, mode=mode,
            doc_filter=doc_filter, prune=prune,
            score_partitions=score_partitions, after=after,
            seed_theta=None,  # sidecar seed handles per-field avgdl; the
                              # metadata-agg seed self-disables on dicts
            excl_terms=excl, required=req or None)

    def query(self, qs: str, k: int = 10,
              doc_filter: Optional[str] = None, prune: bool = True,
              score_partitions: Optional[int] = None,
              after: Optional[tuple] = None,
              max_expansions: int = 64) -> DataFrame:
        """Lucene-classic query-string surface (D1 upgrade, r5) [public:
        Lucene classic QueryParser; Solr lucene QParser]: one entry point
        that parses ``qs`` (see querystring.parse_query for the exact
        grammar) and routes onto the native execution paths —

          spark join              OR terms                -> search()
          +spark join -scan       MUST / SHOULD / MUST_NOT -> search(must=,
                                                             must_not=)
          "sort merge"~2 -scan    phrase (slop) + exclusion -> phrase()
          spar* databse~1         prefix / fuzzy expansion -> scored OR
          s?a*n [hash TO join]    wildcard / term-range expansion -> OR
          /s[pc]a[rn].*/          regexp expansion (anchored) -> OR
          source:src7^2 +lang:en  fielded terms w/ boosts  -> search_fields()

        A phrase clause must be the only SCORED clause (MUST_NOT term
        clauses may accompany it); combining a phrase with other scored
        clauses raises — the summed PhraseQuery+TermQuery score is a
        different scorer this engine does not implement, and silently
        dropping a clause would be worse than saying so."""
        from parser_indexer_spark.querystring import parse_query
        pq = parse_query(qs)
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        if not pq.clauses:
            return empty
        pos = [c for c in pq.clauses if c.occur != "MUST_NOT"]
        neg = [c for c in pq.clauses if c.occur == "MUST_NOT"]
        if not pos:
            return empty    # pure-negative matches nothing (Lucene)
        common = dict(k=k, doc_filter=doc_filter, prune=prune,
                      score_partitions=score_partitions, after=after)
        phrases = [c for c in pos if c.kind == "phrase"]
        if phrases:
            if len(pos) != 1:
                raise ValueError(
                    "a phrase clause cannot be combined with other scored "
                    "clauses; run them as separate queries")
            c = phrases[0]
            bad = [n for n in neg if n.kind != "term"
                   or n.field not in (None, c.field)]
            if bad:
                raise ValueError(
                    "with a phrase clause, MUST_NOT supports plain term "
                    "clauses in the phrase's own field only")
            return self.phrase(c.text, slop=c.slop,
                               field=c.field or "text",
                               must_not=[n.text for n in neg], **common)
        fielded = any(c.field for c in pq.clauses)
        if fielded:
            bad = [c for c in pos if c.kind not in ("term",)]
            if bad:
                raise ValueError(
                    "prefix/wildcard/range/fuzzy/regexp clauses are not "
                    "supported in fielded queries; use plain terms or an "
                    "unfielded query")
            if any(n.kind != "term" for n in neg):
                raise ValueError("fielded MUST_NOT supports plain term "
                                 "clauses only")

            def group(clauses):
                out: dict[str, list] = {}
                for c in clauses:
                    out.setdefault(c.field or "text", []).append(c.text)
                return {f: " ".join(ts) for f, ts in out.items()}

            boosts: dict[str, float] = {}
            for c in pos:
                f = c.field or "text"
                if f in boosts and boosts[f] != c.boost:
                    raise ValueError(
                        f"conflicting boosts for field {f!r}: one boost "
                        "per field (search_fields folds boosts per field)")
                boosts[f] = c.boost
            return self.search_fields(
                group([c for c in pos if c.occur == "SHOULD"]),
                boosts=boosts, mode="OR",
                must=group([c for c in pos if c.occur == "MUST"]),
                must_not=group(neg), **common)
        def norm_bound(b):
            if b is None:
                return None
            toks = tokenize_py(b, self.cfg.stopwords)
            return toks[-1] if toks else b

        def expand(c):
            """Expansion clauses -> analyzed dictionary terms (the scored
            OR / exclusion set; Lucene's rewrite step)."""
            if c.kind == "prefix":
                toks = tokenize_py(c.text, self.cfg.stopwords)
                return self.expand_prefix(toks[-1], max_expansions) \
                    if toks else []
            if c.kind == "wildcard":
                # the analyzer's normalization, with */? kept as wildcards
                pat = unicodedata.normalize("NFKD", c.text).lower()
                return self.expand_wildcard(pat, max_expansions)
            if c.kind == "range":
                return self.expand_range(
                    norm_bound(c.lo), norm_bound(c.hi),
                    c.incl_lo, c.incl_hi, max_expansions)
            if c.kind == "regex":
                # analyzer normalization of the pattern's literals; regex
                # metachars are ASCII so NFKD+lower is a no-op on them
                pat = unicodedata.normalize("NFKD", c.text).lower()
                return self.expand_regexp(pat, max_expansions)
            if c.kind == "fuzzy":
                toks = tokenize_py(c.text, self.cfg.stopwords)
                return self.expand_fuzzy(toks[-1], c.max_dist) \
                    if toks else []
            # ADVICE r5 (medium): never silently mis-execute a clause kind
            # this router does not handle (the old fall-through ran a
            # MUST_NOT phrase as a fuzzy expansion of its last word)
            raise ValueError(
                f"unsupported clause kind {c.kind!r} in this position")

        for n in neg:
            if n.kind == "phrase":
                raise ValueError(
                    "phrase exclusion (-\"...\") is not implemented; "
                    "MUST_NOT supports term/expansion clauses only")

        should: list[str] = []
        for c in pos:
            if c.occur != "SHOULD":
                continue
            if c.kind == "term":
                should.append(c.text)
            else:
                should.extend(expand(c))
        excl: list[str] = []
        for n in neg:
            if n.kind == "term":
                excl.append(n.text)
            else:
                excl.extend(expand(n))
        must = [c.text for c in pos if c.occur == "MUST"]
        if not should and not must:
            return empty
        return self.search(" ".join(should), mode="OR", must=must,
                           must_not=excl, max_expansions=max_expansions,
                           **common)

    def _search_terms(self, terms, dfs, idf, avg_dl, k, mode, doc_filter,
                      prune, score_partitions, after, seed_theta,
                      excl_terms=None, required=None, sort=True):
        """Shared execution path for search()/search_fields(): pruned
        block scan -> one chunk shuffle -> streamed scorer -> top-k.
        ``avg_dl``: scalar, or dict term->avgdl (per-field norms).
        ``excl_terms``: MUST_NOT terms — their blocks ride the same scan
        (doc-id streams only) and mask candidates inside the scorer.
        ``required``: MUST-term subset (mixed Boolean queries); candidates
        must contain every one of them, the rest still score.
        ``sort=False`` (facet/export path): return EVERY match unsorted —
        heap truncation, θ seeding, and the final global top-k all
        disabled; ``k`` is ignored."""
        spark = self.spark
        excl_terms = excl_terms or []
        empty = spark.createDataFrame([], "doc_id long, score double")
        buckets = sorted({term_bucket(t, self.cfg.n_buckets)
                          for t in list(terms) + list(excl_terms)})
        # D9 filters: a selective filter is broadcast INTO the scorer (the
        # allowed doc_id set, sorted), so heap truncation + WAND keep
        # bounding the candidate set; only a huge filter side falls back to
        # scoring everything and semi-joining after (VERDICT r1 #1).
        allowed_bc, allowed_df, truncate, is_empty = \
            self._resolve_filter(doc_filter)
        truncate = truncate and sort
        if is_empty:
            return empty
        src = self._postings_for_filter(allowed_bc)
        if src is None:
            return empty       # filter range misses every live segment
        blocks = (
            src
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(list(terms) + list(excl_terms)))
            .select("term", "chunk", "first_doc_id", "last_doc_id",
                    "num_docs", "max_tf", "min_dl",
                    "docs_enc", "tfs_enc", "dls_enc")
        )
        # scoring width grows with THIS QUERY's posting volume (VERDICT r1
        # #2) — never with total index size — AND is capped at 2 waves of
        # the cluster's parallelism (r4: each mapInPandas task carries a
        # fixed Python-worker/Arrow cost; the r3 512-blocks-per-task rule
        # chose 113 tasks for a 2-head-term query at local[4] and tripled
        # its latency vs 8 tasks — measured 7.8 s -> 2.2 s). ~2048 blocks
        # per task keeps compute >> overhead; on a 1000-executor cluster
        # the 2x-parallelism cap, not the quota, is the binding limit.
        q_blocks = sum(dfs[t] for t in terms) // max(1, self.cfg.block_size)
        par = self.spark.sparkContext.defaultParallelism
        np_parts = score_partitions or max(
            4, min(256, 2 * par, q_blocks // 2048))
        theta0 = 0.0
        if (prune and truncate and allowed_bc is None and after is None
                and not excl_terms and seed_theta is not False):
            # sidecar seed first: one tiny cached pruned read, works for
            # per-field avgdl too; the metadata-agg seed (two jobs) only
            # runs for wide fan-outs the sidecar couldn't seed. MUST_NOT
            # disables both seeds: an excluded doc's achieved score is NOT
            # a lower bound of the k-th SURVIVING score (the _seed_theta
            # leg below would be maskable, but the sidecar θ0 is not).
            # With required terms the sidecar seed runs in AND mode: a
            # fully-covered doc contains every term, so it meets any MUST
            # subset and its exact full sum is an achieved score
            theta0 = self._impact_theta0(
                terms, idf, avg_dl, k, "AND" if required else mode)
            if theta0 <= 0.0 and (seed_theta is True
                                  or q_blocks >= THETA_SEED_MIN_BLOCKS):
                theta0 = self._seed_theta(blocks, terms, idf, avg_dl, k,
                                          mode, required=required)
        scorer = _make_scorer(
            terms=terms, idf=idf, k1=self.cfg.k1, b=self.cfg.b,
            avg_dl=avg_dl, k=k, mode=mode, prune=prune and truncate,
            truncate=truncate, chunk_bits=self.cfg.chunk_bits,
            allowed_bc=allowed_bc, after=after, theta0=theta0,
            denied_bc=self._denied(), excl_terms=set(excl_terms),
            required=required,
        )
        cand = (
            blocks.repartition(np_parts, "chunk")
                  .sortWithinPartitions("chunk")
                  .mapInPandas(scorer, "doc_id long, score double")
        )
        if doc_filter is not None and allowed_bc is None:
            cand = cand.join(allowed_df, "doc_id", "left_semi")
        if not sort:
            return cand
        return cand.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # ----------------------------------------------------------- phrase ---
    def phrase(self, query: str, k: int = 10, slop: int = 0,
               field: str = "text",
               doc_filter: Optional[str] = None, prune: bool = True,
               score_partitions: Optional[int] = None,
               after: Optional[tuple] = None,
               seed_theta: Optional[bool] = None,
               must_not: Optional[list] = None) -> DataFrame:
        """Top-k phrase / ordered-proximity query over positional postings
        (D-phrase) [public: Lucene PhraseQuery / SloppyPhraseScorer].

        Semantics: a doc matches if its token stream contains positions
        p_0 < p_1 < ... < p_{m-1}, one per phrase term IN ORDER, with every
        adjacent gap p_{i+1} - p_i in [1, slop + 1]. slop=0 is the exact
        phrase. (Documented deviation from Lucene: slop bounds each
        adjacent gap — "chained gaps" — rather than the total permutation
        edit distance; out-of-order matches never count.)

        Scoring [public: Lucene PhraseQuery scoring]: the phrase acts as
        one pseudo-term — score = (sum of idf over phrase terms, duplicates
        counted) * tf_norm(phrase_tf, dl), where phrase_tf is the number of
        chain START positions with a full match.

        Execution = the same one-shuffle chunk-grid plan as search():
        partition pruning + term pushdown -> repartition(chunk) ->
        mapInPandas positional scorer (vectorized key-set chain
        intersection, no per-posting Python) -> TakeOrderedAndProject.
        Block-max WAND stays active: phrase_tf <= min over terms of
        max_tf, so idf_sum * tf_norm(min_t max_tf_t, min dl) is a lossless
        chunk upper bound.
        """
        if not self.cfg.positions:
            raise ValueError(
                "index was built with positions=False; phrase queries "
                "need positional postings")
        if field != "text" and field not in self.cfg.fields:
            raise ValueError(f"field {field!r} not indexed "
                             f"(cfg.fields={list(self.cfg.fields)})")
        spark = self.spark
        empty = spark.createDataFrame([], "doc_id long, score double")
        base_toks = tokenize_py(query, self.cfg.stopwords)
        if not base_toks:
            return empty
        # fielded phrase (field:"exact phrase", Solr analogue): the SAME
        # positional machinery runs over the "<field>:<term>" postings,
        # whose dl and positions are the field's own; BM25 normalizes by
        # the field's avgdl (stats.json per-field stats)
        toks = (base_toks if field == "text"
                else [f"{field}:{t}" for t in base_toks])
        if field == "text":
            avg_dl = self.stats["avg_dl"]
        else:
            favg = self.stats.get("fields", {}).get(field)
            if favg is None:      # configured field emitted no postings
                return empty
            avg_dl = favg["avg_dl"]
        uniq = sorted(set(toks))
        dfs = self.term_stats(uniq)
        # a phrase containing an index-absent term matches nothing
        if any(dfs[t] == 0 for t in uniq):
            return empty
        # MUST_NOT on the phrase path [public: Lucene BooleanQuery with a
        # PhraseQuery MUST clause]: exclusion terms match in the SAME
        # field as the phrase; their doc-id streams ride the block scan
        # and mask candidates pre-heap, like the term path
        excl = sorted({(t if field == "text" else f"{field}:{t}")
                       for w in (must_not or [])
                       for t in tokenize_py(str(w), self.cfg.stopwords)})
        if excl:
            edfs = self.term_stats(excl)
            excl = [t for t in excl if edfs[t] > 0]
        if len(toks) == 1:
            if field == "text":
                # single-term phrase == single-term BM25 (phrase_tf == tf)
                return self.search(query, k=k, doc_filter=doc_filter,
                                   prune=prune,
                                   score_partitions=score_partitions,
                                   after=after, must_not=must_not)
            n_docs = favg.get("n_docs", self.stats["n_docs"])
            t0 = toks[0]
            return self._search_terms(
                [t0], dfs, {t0: bm25_idf(n_docs, dfs[t0])}, {t0: avg_dl},
                k=k, mode="OR", doc_filter=doc_filter, prune=prune,
                score_partitions=score_partitions, after=after,
                seed_theta=None, excl_terms=excl)
        # per-field docCount (VERDICT r4 #7): a fielded phrase scores with
        # the field's own doc count, like search_fields
        n_docs = (self.stats["n_docs"] if field == "text"
                  else favg.get("n_docs", self.stats["n_docs"]))
        idf = {t: bm25_idf(n_docs, dfs[t]) for t in uniq}
        idf_sum = float(sum(idf[t] for t in toks))

        buckets = sorted({term_bucket(t, self.cfg.n_buckets)
                          for t in list(uniq) + list(excl)})
        allowed_bc, allowed_df, truncate, is_empty = \
            self._resolve_filter(doc_filter)
        if is_empty:
            return empty
        src = self._postings_for_filter(allowed_bc)
        if src is None:
            return empty       # filter range misses every live segment
        blocks = (
            src
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(list(uniq) + list(excl)))
            .select("term", "chunk", "first_doc_id", "num_docs",
                    "max_tf", "min_dl", "docs_enc", "tfs_enc", "dls_enc",
                    "pos_enc")
        )
        # candidate volume is bounded by the rarest term's postings; same
        # 2-wave parallelism cap + per-task quota as _search_terms (r4)
        q_blocks = min(dfs[t] for t in uniq) // max(1, self.cfg.block_size)
        par = self.spark.sparkContext.defaultParallelism
        np_parts = score_partitions or max(
            4, min(256, 2 * par, q_blocks // 2048))
        theta0 = 0.0
        if (prune and truncate and allowed_bc is None and after is None
                and not excl and seed_theta is not False
                and (seed_theta is True
                     or q_blocks >= THETA_SEED_MIN_BLOCKS)):
            # MUST_NOT disables the seed: an excluded doc's achieved
            # phrase score is not a lower bound of the k-th survivor
            theta0 = self._seed_theta_phrase(blocks, uniq, toks, idf_sum,
                                             avg_dl, k, slop)
        scorer = _make_phrase_scorer(
            phrase_terms=list(toks), idf_sum=idf_sum, k1=self.cfg.k1,
            b=self.cfg.b, avg_dl=avg_dl, k=k, slop=slop,
            prune=prune and truncate, truncate=truncate,
            chunk_bits=self.cfg.chunk_bits, allowed_bc=allowed_bc,
            after=after, theta0=theta0, denied_bc=self._denied(),
            excl_terms=set(excl) or None)
        cand = (
            blocks.repartition(np_parts, "chunk")
                  .sortWithinPartitions("chunk")
                  .mapInPandas(scorer, "doc_id long, score double")
        )
        if doc_filter is not None and allowed_bc is None:
            cand = cand.join(allowed_df, "doc_id", "left_semi")
        return cand.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _postings_for_filter(self, allowed_bc):
        """Segment pruning under doc filters (VERDICT r3 #9): every
        segment manifest row carries its doc_id range [doc_lo, doc_hi];
        when a broadcast filter's allowed set misses a segment's range
        entirely, that segment's posting files are excluded from the scan
        relation (file-level pruning on top of the bucket/term pruning).
        Returns the postings DataFrame to scan, or None if NO segment can
        contain an allowed doc. Pruned relations are cached per surviving
        segment set."""
        segs_all = self.manifest["segments"]
        if allowed_bc is None or len(segs_all) <= 1:
            return self._postings_df
        arr = allowed_bc.value
        surv = []
        for s in segs_all:
            i = int(np.searchsorted(arr, s["doc_lo"]))
            if i < arr.size and arr[i] <= s["doc_hi"]:
                surv.append(s["seg"])
        if len(surv) == len(segs_all):
            return self._postings_df
        key = tuple(surv)
        if key not in self._postings_pruned:
            while len(self._postings_pruned) >= self._postings_pruned_max:
                self._postings_pruned.pop(next(iter(self._postings_pruned)))
            self._postings_pruned[key] = (
                read_postings(self.spark, self.root, segs=surv)
                if surv else None)
        return self._postings_pruned[key]

    def _resolve_filter(self, doc_filter: Optional[str]):
        """doc_filter -> (allowed_bc, allowed_df, truncate, is_empty).
        Selective filters become a cached broadcast sorted-int64 set (Arrow
        collection, no driver Row objects — ADVICE r2); oversized ones
        return allowed_bc=None + truncate=False (semi-join fallback)."""
        if doc_filter is None:
            return None, None, True, False
        spark = self.spark
        allowed_df = (read_docs(spark, self.root)
                      .where(doc_filter).select("doc_id"))
        if doc_filter in self._filter_bc:
            allowed_bc = self._filter_bc[doc_filter]
            if allowed_bc is None:          # cached "too big" verdict
                return None, allowed_df, False, False
            return (allowed_bc, allowed_df, True,
                    allowed_bc.value.size == 0)
        head = (allowed_df.limit(FILTER_BROADCAST_LIMIT + 1)
                .toPandas()["doc_id"].to_numpy(dtype=np.int64))
        if head.size <= FILTER_BROADCAST_LIMIT:
            arr = np.sort(head)
            allowed_bc = spark.sparkContext.broadcast(arr)
        else:
            allowed_bc = None
        if len(self._filter_bc) >= self._filter_bc_max:
            oldest = next(iter(self._filter_bc))   # FIFO eviction
            old = self._filter_bc.pop(oldest)
            if old is not None:
                # unpersist, NOT destroy (ADVICE r3): a previously returned
                # DataFrame is lazily re-executable and may still capture
                # this broadcast in its scorer closure; unpersist drops the
                # executor copies but lets a re-run re-broadcast from the
                # driver value. destroy() is reserved for close(), which
                # documents that it invalidates outstanding DataFrames.
                old.unpersist(blocking=False)
        self._filter_bc[doc_filter] = allowed_bc
        if allowed_bc is None:
            return None, allowed_df, False, False
        return allowed_bc, allowed_df, True, head.size == 0

    def _seed_theta(self, blocks: DataFrame, terms, idf, avg_dl, k,
                    mode, required=None) -> float:
        """Cross-executor WAND θ seed (D8 v2): find the chunk with the
        highest summed per-term block-max upper bound (metadata-only agg —
        no posting decode), collect just that chunk's blocks, score it
        exactly with the SAME scorer code, and return its k-th score. θ0 is
        an achieved score of k real docs, so the global k-th best is >= θ0
        and pruning against it stays lossless everywhere."""
        if isinstance(avg_dl, dict):
            return 0.0  # per-field norms: the metadata-agg leg assumes one
        k1, b = self.cfg.k1, self.cfg.b
        idf_col = F.lit(0.0)
        for t in terms:
            idf_col = F.when(F.col("term") == t, float(idf[t])).otherwise(idf_col)
        tfn = F.col("max_tf") / (
            F.col("max_tf") + k1 * (1.0 - b + b * F.col("min_dl") / avg_dl))
        per = (blocks.groupBy("chunk", "term")
               .agg(F.max(idf_col * tfn).alias("u")))
        best = (per.groupBy("chunk").agg(F.sum("u").alias("ub"))
                .orderBy(F.desc("ub"), F.asc("chunk")).limit(1).collect())
        if not best:
            return 0.0
        seed_rows = blocks.where(F.col("chunk") == best[0]["chunk"]).toPandas()
        if seed_rows.empty:
            return 0.0
        sc = _make_scorer(terms=terms, idf=idf, k1=k1, b=b, avg_dl=avg_dl,
                          k=k, mode=mode, prune=False, truncate=True,
                          chunk_bits=self.cfg.chunk_bits,
                          denied_bc=self._denied(), required=required)
        out = pd.concat(list(sc(iter([seed_rows]))), ignore_index=True)
        if len(out) < k:
            return 0.0
        return float(out["score"].min())

    # ------------------------------------------------------- spellcheck ---
    def build_spell_index(self) -> None:
        """D14 spellcheck scale path (VERDICT r3 #6 / r2 #5): persist the
        char-bigram -> term inverted map at <root>/spell (see
        build_spell_table)."""
        import os
        build_spell_table(self._dict_df, os.path.join(self.root, "spell"))

    def _spell_fresh(self, spell_dir: str) -> bool:
        """A persisted spell table is used only while its build-time
        n_terms watermark matches the live dictionary (ADVICE r4): after
        an append the table silently lacks the new terms, so queries fall
        back to the dict-scan path until build_spell_index() reruns. A
        table with no watermark (pre-r5 layout) is treated as stale."""
        import os
        try:
            meta = CATALOG.read_meta(
                os.path.join(spell_dir, "_spell_meta.json"))
        except Exception:
            return False
        return meta.get("n_terms") == self.stats["n_terms"]

    def spellcheck(self, word: str, max_dist: int = 2,
                   limit: int = 5) -> DataFrame:
        """Nearest dictionary terms to ``word`` via the bucket-pruned
        spell table when build_spell_index() ran, else via a dict scan
        with the same candidate predicate (see spellcheck_table for the
        candidate semantics)."""
        import os
        spell_dir = os.path.join(self.root, "spell")
        if os.path.isdir(spell_dir) and self._spell_fresh(spell_dir):
            return spellcheck_table(self.spark, spell_dir, word,
                                    max_dist=max_dist, limit=limit)
        bgs = sorted({word[i:i + 2] for i in range(len(word) - 1)})
        pred = None
        for g in bgs:
            c = F.col("term").contains(g)
            pred = c if pred is None else (pred | c)
        cand = self._dict_df.select("term", "df")
        if pred is not None:
            cand = cand.where(pred)
        return _spell_rank(cand, word, max_dist, limit)

    def _seed_theta_phrase(self, blocks: DataFrame, uniq, toks, idf_sum,
                           avg_dl, k, slop) -> float:
        """Phrase-path WAND θ seed (VERDICT r3 #7): pick the chunk with
        the highest LOSSLESS phrase upper bound — idf_sum * tf_norm(min
        over terms of max max_tf, min min_dl), computed from block
        metadata only and restricted to chunks containing EVERY phrase
        term — then exactly phrase-score that one chunk driver-side with
        the same scorer code; its k-th score is an achieved lower bound
        of the global k-th best, so pruning against it stays lossless."""
        k1, b = self.cfg.k1, self.cfg.b
        per = (blocks.groupBy("chunk", "term")
               .agg(F.max("max_tf").alias("mt"), F.min("min_dl").alias("md")))
        agg = (per.groupBy("chunk")
               .agg(F.min("mt").alias("mt"), F.min("md").alias("md"),
                    F.countDistinct("term").alias("nt"))
               .where(F.col("nt") == len(uniq)))
        tfn = F.col("mt") / (F.col("mt")
                             + k1 * (1.0 - b + b * F.col("md") / avg_dl))
        best = agg.orderBy(F.desc(tfn), F.asc("chunk")).limit(1).collect()
        if not best:
            return 0.0
        seed_rows = blocks.where(F.col("chunk") == best[0]["chunk"]) \
                          .toPandas()
        if seed_rows.empty:
            return 0.0
        sc = _make_phrase_scorer(
            phrase_terms=list(toks), idf_sum=idf_sum, k1=k1, b=b,
            avg_dl=avg_dl, k=k, slop=slop, prune=False, truncate=True,
            chunk_bits=self.cfg.chunk_bits, denied_bc=self._denied())
        out = pd.concat(list(sc(iter([seed_rows]))), ignore_index=True)
        if len(out) < k:
            return 0.0
        return float(out["score"].min())

    def fetch(self, topk: DataFrame) -> DataFrame:
        """A6 doc-store fetch: join top-k ids back to stored fields; the
        k-row side is broadcast so no shuffle of the doc store happens."""
        docs = read_docs(self.spark, self.root)
        return (docs.join(F.broadcast(topk), "doc_id")
                    .orderBy(F.desc("score"), F.asc("doc_id")))

    def highlight(self, query: str, k: int = 10, mode: str = "OR",
                  window: int = 5, **kw) -> DataFrame:
        """D13 highlighting: top-k + a snippet around the first matching
        term occurrence, <mark>-tagged. Pandas UDF over the k fetched rows
        only (never the corpus) [public: Solr highlighter analogue]."""
        terms = sorted(set(tokenize_py(query, self.cfg.stopwords)))
        hits = self.fetch(self.search(query, k=k, mode=mode, **kw))

        @F.pandas_udf("string")
        def snip(texts: pd.Series) -> pd.Series:
            out = []
            for text in texts:
                toks = tokenize_py(text or "")
                pos = next((i for i, t in enumerate(toks) if t in terms), None)
                if pos is None:
                    out.append("")
                    continue
                lo, hi = max(0, pos - window), pos + window + 1
                frag = [f"<mark>{t}</mark>" if t in terms else t
                        for t in toks[lo:hi]]
                out.append(("... " if lo else "") + " ".join(frag)
                           + (" ..." if hi < len(toks) else ""))
            return pd.Series(out)

        return hits.withColumn("snippet", snip(F.col("text")))

    def highlight_phrase(self, query: str, k: int = 10, slop: int = 0,
                         window: int = 5, **kw) -> DataFrame:
        """D13 phrase highlighting: top-k phrase hits + a snippet marking
        the FULL first matching phrase span (every token of the chain gets
        <mark>). Pandas UDF over the k fetched rows only."""
        toks_q = tokenize_py(query, self.cfg.stopwords)
        hits = self.fetch(self.phrase(query, k=k, slop=slop, **kw))
        m = len(toks_q)

        def first_chain(toks):
            """-> list of matched positions of the first phrase chain, or
            None. Backward S_i sets (same semantics as the scorer), then a
            forward walk from the smallest valid start."""
            sets = [None] * m
            sets[-1] = {i for i, w in enumerate(toks) if w == toks_q[-1]}
            for qi in range(m - 2, -1, -1):
                nxt = sets[qi + 1]
                sets[qi] = {i for i, w in enumerate(toks) if w == toks_q[qi]
                            and any((i + g) in nxt
                                    for g in range(1, slop + 2))}
                if not sets[qi]:
                    return None
            if not sets[-1]:
                return None
            span = [min(sets[0])]
            for qi in range(1, m):
                span.append(min(p for p in sets[qi]
                                if 1 <= p - span[-1] <= slop + 1))
            return span

        @F.pandas_udf("string")
        def snip(texts: pd.Series) -> pd.Series:
            out = []
            for text in texts:
                toks = tokenize_py(text or "")
                span = first_chain(toks) if toks else None
                if span is None:
                    out.append("")
                    continue
                lo = max(0, span[0] - window)
                hi = min(len(toks), span[-1] + window + 1)
                marked = set(span)
                frag = [f"<mark>{t}</mark>" if i in marked else t
                        for i, t in enumerate(toks[lo:hi], start=lo)]
                out.append(("... " if lo else "") + " ".join(frag)
                           + (" ..." if hi < len(toks) else ""))
            return pd.Series(out)

        return hits.withColumn("snippet", snip(F.col("text")))


def _make_scorer(terms, idf, k1, b, avg_dl, k, mode, prune, truncate,
                 chunk_bits, allowed_bc=None, after=None, theta0=0.0,
                 denied_bc=None, excl_terms=None, required=None):
    """Build the mapInPandas scoring function. Input arrives chunk-sorted
    within the partition (sortWithinPartitions upstream); the scorer STREAMS
    complete chunk runs off the Arrow batch iterator with a carry for the
    run spanning a batch boundary — the same pattern as the block builder —
    so peak memory is one chunk's blocks, not the partition (VERDICT r1 #2).
    θ improves monotonically for WAND because chunks arrive in ascending
    order. ``allowed_bc``: optional broadcast sorted int64 doc_id array; the
    filter applies pre-heap, keeping truncation + WAND active (block-max
    upper bounds over the unfiltered corpus stay valid upper bounds).
    ``avg_dl``: scalar, or dict term->avgdl (multi-field per-field
    normalization — fielded postings carry the field's own dl)."""
    terms_sorted = list(terms)  # already sorted unique
    idf_arr = {t: float(idf[t]) for t in terms_sorted}
    avg_of = {t: float(avg_dl[t] if isinstance(avg_dl, dict) else avg_dl)
              for t in terms_sorted}
    m = len(terms_sorted)
    # mixed-occur Boolean query [public: Lucene BooleanQuery MUST+SHOULD]:
    # ``required`` (a strict subset of terms) must ALL match; the rest are
    # optional but still score. mode="AND" is the required==terms special
    # case and keeps its dedicated leapfrog branch below.
    req_sorted = sorted(required) if required else []
    if req_sorted and set(req_sorted) == set(terms_sorted):
        mode, req_sorted = "AND", []

    def tf_norm(tf, dl, avg):
        return tf / (tf + k1 * (1.0 - b + b * dl / avg))

    def decode_term(sel: pd.DataFrame, member):
        """Decode one term's block rows of a chunk. ``member``: optional
        sorted int64 doc set — only blocks whose [first_doc_id,
        last_doc_id] range intersects it are decoded (block-level skipping,
        the MaxScore non-essential-list lookup [public: Turtle & Flood
        1995; Lucene MaxScore]), and decoded postings are filtered to
        membership. Returns (docs, tfs, dls) sorted by doc, or None if
        nothing survives."""
        if member is not None and len(sel):
            fd = sel["first_doc_id"].to_numpy(dtype=np.int64)
            ld = sel["last_doc_id"].to_numpy(dtype=np.int64)
            lo = np.searchsorted(member, fd, side="left")
            lo_c = np.minimum(lo, member.size - 1)
            sel = sel[(lo < member.size) & (member[lo_c] <= ld)]
        if not len(sel):
            return None
        # batched block decode (VERDICT r4 #5-adjacent): ONE vectorized
        # pass over all surviving blocks of the chunk instead of a
        # per-block decode() loop — the loop's fixed per-call cost was
        # the dominant term of multi-term head-query latency (measured
        # 4.4 s for one df=3M term, ~60 % pure loop overhead)
        nd = sel["num_docs"].to_numpy(dtype=np.int64)
        d = delta_decode_blocks(
            decode_blocks(sel["docs_enc"].to_numpy(), nd), nd,
            sel["first_doc_id"].to_numpy(dtype=np.int64))
        # blocks of a salted term interleave doc ranges (two salt groups
        # of one term may share a build partition and emit one merged run
        # that skips the middle salt's range) — re-sort after decode.
        order = np.argsort(d)
        d = d[order]
        tf_a = decode_blocks(sel["tfs_enc"].to_numpy(), nd) \
            .astype(np.float64)[order]
        dl_a = decode_blocks(sel["dls_enc"].to_numpy(), nd) \
            .astype(np.float64)[order]
        if member is not None:
            pos = np.searchsorted(member, d)
            pos_c = np.minimum(pos, member.size - 1)
            keep = member[pos_c] == d
            if not keep.any():
                return None
            d, tf_a, dl_a = d[keep], tf_a[keep], dl_a[keep]
        return d, tf_a, dl_a

    def score_chunk(rows: pd.DataFrame, heap_docs, heap_scores):
        """rows: all block rows of ONE chunk. Returns updated heap arrays."""
        allowed_chunk = None
        if allowed_bc is not None:
            allowed = allowed_bc.value
            c = int(rows["chunk"].iloc[0])
            lo = np.searchsorted(allowed, np.int64(c) << chunk_bits)
            hi = np.searchsorted(allowed, np.int64(c + 1) << chunk_bits)
            if lo == hi:
                return heap_docs, heap_scores  # no allowed doc in range
            allowed_chunk = allowed[lo:hi]
        theta = heap_scores[-1] if truncate and len(heap_scores) == k else None
        if theta0 > 0.0:
            theta = theta0 if theta is None else max(theta, theta0)
        tarr = rows["term"].to_numpy()
        sel_of = {t: rows[tarr == t] for t in terms_sorted
                  if (tarr == t).any()}
        if mode == "AND" and len(sel_of) < m:
            return heap_docs, heap_scores
        # a chunk is a doc-id range, so a doc's postings for EVERY term it
        # contains live in this same chunk: a required term with no blocks
        # here means no doc of the chunk can match
        if any(t not in sel_of for t in req_sorted):
            return heap_docs, heap_scores
        ex_set = None
        if excl_terms:
            # MUST_NOT [public: Lucene BooleanQuery MUST_NOT]: the chunk's
            # excluded-doc set from the excluded terms' doc-id streams
            # ONLY (tf/dl never decoded — exclusion doesn't score)
            exm = np.isin(tarr, list(excl_terms))
            if exm.any():
                ex = rows[exm]
                nd_e = ex["num_docs"].to_numpy(dtype=np.int64)
                ex_set = np.unique(delta_decode_blocks(
                    decode_blocks(ex["docs_enc"].to_numpy(), nd_e), nd_e,
                    ex["first_doc_id"].to_numpy(dtype=np.int64)))
        ubs = {}
        margin = 0.0
        if prune and theta is not None:
            margin = _PRUNE_EPS * max(1.0, abs(theta))
            ub_sum = 0.0
            for t, sel in sel_of.items():
                mt = sel["max_tf"].to_numpy(dtype=np.float64)
                md = sel["min_dl"].to_numpy(dtype=np.float64)
                ubs[t] = idf_arr[t] * float(np.max(tf_norm(mt, md,
                                                           avg_of[t])))
                ub_sum += ubs[t]
            if ub_sum < theta - margin:
                return heap_docs, heap_scores  # block-max WAND skip (D8)

        per_term = {}
        if mode == "AND":
            # block-skipping leapfrog: decode the term with the fewest
            # blocks first; every later term decodes ONLY blocks whose doc
            # range intersects the running intersection — head terms'
            # blocks outside the rare term's matches are never touched
            common = allowed_chunk
            for t in sorted(sel_of, key=lambda u: len(sel_of[u])):
                res = decode_term(sel_of[t], common)
                if res is None or res[0].size == 0:
                    return heap_docs, heap_scores
                per_term[t] = res
                if common is None:
                    common = res[0]
                else:
                    # membership-filtered decode => res[0] is the new,
                    # smaller intersection
                    common = res[0]
            total = np.zeros(common.size, dtype=np.float64)
            for t in terms_sorted:  # frozen accumulation order
                d, tf, dl = per_term[t]
                pos = np.searchsorted(d, common)
                total += idf_arr[t] * tf_norm(tf[pos], dl[pos], avg_of[t])
            docs_out, scores_out = common, total
        elif req_sorted:
            # mixed MUST+SHOULD [public: Lucene BooleanQuery]: leapfrog-
            # intersect the REQUIRED terms exactly like the AND branch
            # (rarest-first, membership-filtered decode), then every
            # OPTIONAL term decodes lookup-only against the intersection
            # — a doc outside it can never match, so optional postings
            # beyond the candidates are never touched
            common = allowed_chunk
            for t in sorted(req_sorted, key=lambda u: len(sel_of[u])):
                res = decode_term(sel_of[t], common)
                if res is None or res[0].size == 0:
                    return heap_docs, heap_scores
                per_term[t] = res
                common = res[0]
            total = np.zeros(common.size, dtype=np.float64)
            for t in terms_sorted:      # frozen accumulation order
                if t in per_term:       # required: defined on all of common
                    d, tf, dl = per_term[t]
                    pos = np.searchsorted(d, common)
                    total += idf_arr[t] * tf_norm(tf[pos], dl[pos],
                                                  avg_of[t])
                    continue
                if t not in sel_of:
                    continue
                res = decode_term(sel_of[t], common)
                if res is None or res[0].size == 0:
                    continue
                d, tf, dl = res        # member-filtered => d ⊆ common
                pos = np.searchsorted(common, d)
                total[pos] += idf_arr[t] * tf_norm(tf, dl, avg_of[t])
            docs_out, scores_out = common, total
        else:
            # MaxScore split: the longest ub-ascending prefix whose ub sum
            # stays under theta is NON-ESSENTIAL — a doc matching only
            # those terms cannot reach the heap, so candidates come from
            # essential terms alone and NE terms are lookup-only (their
            # blocks decode only where a candidate lands)
            ne: set = set()
            if ubs and theta is not None:
                cum = 0.0
                for t in sorted(ubs, key=lambda u: ubs[u]):
                    if cum + ubs[t] < theta - margin:
                        cum += ubs[t]
                        ne.add(t)
                    else:
                        break
            for t in sel_of:
                if t in ne:
                    continue
                res = decode_term(sel_of[t], allowed_chunk)
                if res is not None:
                    per_term[t] = res
            if not per_term:
                return heap_docs, heap_scores
            all_docs = np.unique(np.concatenate(
                [per_term[t][0] for t in per_term]))
            for t in ne:
                res = decode_term(sel_of[t], all_docs)
                if res is not None:
                    per_term[t] = res
            total = np.zeros(all_docs.size, dtype=np.float64)
            for t in terms_sorted:  # frozen accumulation order
                if t not in per_term:
                    continue
                d, tf, dl = per_term[t]
                pos = np.searchsorted(all_docs, d)
                total[pos] += idf_arr[t] * tf_norm(tf, dl, avg_of[t])
            docs_out, scores_out = all_docs, total

        if ex_set is not None and ex_set.size and docs_out.size:
            # MUST_NOT mask, pre-heap (same lossless argument as the
            # tombstone mask below); survivor scores are untouched
            keep = _live_mask_arr(docs_out, ex_set)
            if keep is not None:
                docs_out, scores_out = docs_out[keep], scores_out[keep]
                if docs_out.size == 0:
                    return heap_docs, heap_scores
        if denied_bc is not None and docs_out.size:
            # tombstone mask [public: Lucene liveDocs], pre-heap so θ only
            # ever grows from live docs (a deleted doc's score seeding the
            # heap would make WAND skips lossy for live docs)
            live = _live_mask_arr(docs_out, denied_bc.value)
            if live is not None:
                docs_out, scores_out = docs_out[live], scores_out[live]
                if docs_out.size == 0:
                    return heap_docs, heap_scores
        if after is not None:
            # keyset cursor (D11): keep docs strictly after (score desc,
            # doc_id asc) position — pre-heap, so truncation + WAND hold
            a_s, a_d = float(after[0]), int(after[1])
            keep = (scores_out < a_s) | ((scores_out == a_s) & (docs_out > a_d))
            docs_out, scores_out = docs_out[keep], scores_out[keep]
            if docs_out.size == 0:
                return heap_docs, heap_scores

        if not truncate:
            heap_docs.append(docs_out)
            heap_scores.append(scores_out)
            return heap_docs, heap_scores
        # merge into running top-k: (score desc, doc_id asc)
        cd = np.concatenate([heap_docs, docs_out]) if len(heap_docs) else docs_out
        cs = np.concatenate([heap_scores, scores_out]) if len(heap_scores) else scores_out
        order = np.lexsort((cd, -cs))[:k]
        return cd[order], cs[order]

    def scorer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Stream chunk runs off the batch iterator: rows arrive chunk-sorted
        (sortWithinPartitions upstream); the (possibly incomplete) final
        chunk of each batch is carried into the next — peak memory is one
        chunk's blocks plus one Arrow batch, flat in the index size. θ
        improves monotonically for WAND as chunks ascend."""
        if truncate:
            hd = np.empty(0, dtype=np.int64)
            hs = np.empty(0, dtype=np.float64)
        else:
            hd, hs = [], []
        carry: Optional[pd.DataFrame] = None
        for pdf in batches:
            if pdf.empty:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            chunks = pdf["chunk"].to_numpy()
            last_start = int(np.flatnonzero(chunks != chunks[-1]).max() + 1) \
                if chunks[0] != chunks[-1] else 0
            carry = pdf.iloc[last_start:]
            head = pdf.iloc[:last_start]
            for _, rows in head.groupby("chunk", sort=True):
                hd, hs = score_chunk(rows, hd, hs)
        if carry is not None and len(carry):
            for _, rows in carry.groupby("chunk", sort=True):
                hd, hs = score_chunk(rows, hd, hs)
        if truncate:
            out_d, out_s = hd, hs
        else:
            out_d = np.concatenate(hd) if hd else np.empty(0, np.int64)
            out_s = np.concatenate(hs) if hs else np.empty(0, np.float64)
        yield pd.DataFrame({"doc_id": out_d.astype(np.int64),
                            "score": out_s.astype(np.float64)})

    return scorer


# ------------------------------------------------------------ spellcheck ---

_SPELL_BUCKETS = 64


def build_spell_table(dict_df: DataFrame, spell_dir: str) -> None:
    """Persist a char-bigram -> term inverted map over the dictionary,
    partitioned by a bigram hash bucket, so a spellcheck query
    Levenshteins ONLY the union of its bigram buckets instead of scanning
    the dict [public: Lucene n-gram spellchecker candidate retrieval].
    Layout: <spell_dir>/bgb=NN/ rows (bg, term, df)."""
    bg = (dict_df.select(
            "term", "df",
            F.explode(F.expr(
                "transform(sequence(1, greatest(length(term) - 1, 1)),"
                " i -> substring(term, i, 2))")).alias("bg"))
          .where(F.length("bg") == 2).distinct()
          .withColumn("bgb", (F.crc32(F.encode(F.col("bg"), "UTF-8"))
                              % _SPELL_BUCKETS).cast("int")))
    CATALOG.write_table(bg, spell_dir, partition_by="bgb")
    # freshness watermark (ADVICE r4): Index.spellcheck uses the table
    # only while the dictionary still has this many terms — an append
    # grows n_terms and flips queries back to the always-fresh dict scan
    # until build_spell_index() is re-run
    CATALOG.write_meta(os.path.join(spell_dir, "_spell_meta.json"),
                       {"n_terms": dict_df.count()})


def _spell_rank(cand: DataFrame, word: str, max_dist: int,
                limit: int) -> DataFrame:
    dist = F.levenshtein(F.col("term"), F.lit(word)).cast("int")
    return (cand
            .where(F.abs(F.length("term") - len(word)) <= max_dist)
            .withColumn("dist", dist)
            .where(F.col("dist") <= max_dist)
            .orderBy("dist", F.desc("df"), F.asc("term"))
            .select("term", "dist", "df").limit(limit))


def spellcheck_table(spark: SparkSession, spell_dir: str, word: str,
                     max_dist: int = 2, limit: int = 5) -> DataFrame:
    """Candidates = dictionary terms within +-max_dist length sharing
    >= 1 char bigram with ``word`` (documented deviation from an
    exhaustive scan: a term with NO shared bigram is never proposed —
    the same candidate semantics as Lucene's n-gram spellchecker),
    fetched by a partition-pruned read of the spell table, then ranked
    (edit distance, df desc, term)."""
    bgs = sorted({word[i:i + 2] for i in range(len(word) - 1)})
    if not bgs:
        return spark.createDataFrame([], "term string, dist int, df long")
    buckets = sorted({zlib.crc32(g.encode("utf-8")) % _SPELL_BUCKETS
                      for g in bgs})
    cand = (CATALOG.read_table(spark, spell_dir)
            .where(F.col("bgb").isin(buckets))
            .where(F.col("bg").isin(bgs))
            .select("term", "df").distinct())
    return _spell_rank(cand, word, max_dist, limit)


# ---------------------------------------------------------------- phrase ---

# positions are packed with doc_ids into int64 keys: key = (doc << _POS_BITS)
# | pos. Docs up to 2^41 and 4M tokens/doc — enforced at decode time.
_POS_BITS = 22
_POS_LIMIT = 1 << _POS_BITS


def _decode_positions(pos_enc: bytes, tf: np.ndarray) -> np.ndarray:
    """One block's position payload -> flat ABSOLUTE positions (int64),
    tf[i] values per posting i. Gaps are within-doc deltas (first absolute),
    so decode = cumsum with a per-posting base reset (vectorized)."""
    npos = int(tf.sum())
    gaps = decode(pos_enc, npos).astype(np.int64)
    cum = np.cumsum(gaps)
    starts = np.concatenate(([0], np.cumsum(tf)[:-1])).astype(np.int64)
    base = cum[starts] - gaps[starts]
    out = cum - np.repeat(base, tf)
    if out.size and int(out.max()) >= _POS_LIMIT:
        raise ValueError(f"token position >= {_POS_LIMIT} unsupported "
                         "by phrase keys")
    return out


def _merge_topk(heap_docs, heap_scores, docs, scores, k):
    """Merge candidates into the running top-k, (score desc, doc_id asc)."""
    cd = np.concatenate([heap_docs, docs]) if len(heap_docs) else docs
    cs = np.concatenate([heap_scores, scores]) if len(heap_scores) else scores
    order = np.lexsort((cd, -cs))[:k]
    return cd[order], cs[order]


def _make_phrase_scorer(phrase_terms, idf_sum, k1, b, avg_dl, k, slop,
                        prune, truncate, chunk_bits, allowed_bc=None,
                        after=None, theta0=0.0, denied_bc=None,
                        excl_terms=None):
    """mapInPandas positional scorer: same chunk-streaming carry pattern as
    _make_scorer; inside a chunk the phrase is matched by a BACKWARD key-set
    chain — S_i = positions of term i that start a valid suffix chain —
    using only np.isin on (doc << _POS_BITS | pos) keys, so the cost is
    O(total positions of the query terms in the chunk), no per-doc Python."""
    uniq = sorted(set(phrase_terms))
    m = len(phrase_terms)
    deltas = list(range(1, slop + 2))

    def tf_norm(tf, dl):
        return tf / (tf + k1 * (1.0 - b + b * dl / avg_dl))

    def score_chunk(rows: pd.DataFrame, heap_docs, heap_scores):
        ex_rows = None
        if excl_terms:
            # split MUST_NOT rows off before the presence check — an
            # excluded term's blocks must never stand in for a missing
            # phrase term
            exm = np.isin(rows["term"].to_numpy(), list(excl_terms))
            if exm.any():
                ex_rows = rows[exm]
                rows = rows[~exm]
        present = pd.unique(rows["term"].to_numpy())
        if len(present) < len(uniq):
            return heap_docs, heap_scores  # a required term is absent
        theta = heap_scores[-1] if truncate and len(heap_scores) == k else None
        if theta0 > 0.0:
            theta = theta0 if theta is None else max(theta, theta0)
        if prune and theta is not None:
            # lossless ub: phrase_tf <= min_t tf_t(d) <= min_t max(max_tf)
            mtf, mdl = np.inf, np.inf
            tarr = rows["term"].to_numpy()
            for t in uniq:
                sel = rows[tarr == t]
                mtf = min(mtf, float(sel["max_tf"].max()))
                mdl = min(mdl, float(sel["min_dl"].min()))
            ub = idf_sum * tf_norm(mtf, mdl)
            if ub < theta - _PRUNE_EPS * max(1.0, abs(theta)):
                return heap_docs, heap_scores

        # decode each unique term: doc/tf/dl arrays + positional keys.
        # r6 (VERDICT r5 #4 sibling): batched — ONE decode_blocks call per
        # column across the term's blocks (killing the per-block fixed
        # cost, same as the main scorer and merge path); the per-posting
        # position cumsum-reset works unchanged on the concatenated gap
        # stream because position gaps are posting-local.
        per_term = {}
        tarr = rows["term"].to_numpy()
        for t in uniq:
            sel = rows[tarr == t]
            ns = sel["num_docs"].to_numpy(dtype=np.int64)
            d = delta_decode_blocks(
                decode_blocks(sel["docs_enc"].to_numpy(), ns), ns,
                sel["first_doc_id"].to_numpy(dtype=np.int64))
            tf = decode_blocks(sel["tfs_enc"].to_numpy(), ns) \
                .astype(np.int64)
            ls = decode_blocks(sel["dls_enc"].to_numpy(), ns) \
                .astype(np.float64)
            block_starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
            npos_blk = np.add.reduceat(tf, block_starts)
            gaps = decode_blocks(sel["pos_enc"].to_numpy(),
                                 npos_blk).astype(np.int64)
            cum = np.cumsum(gaps)
            starts = np.concatenate(([0], np.cumsum(tf)[:-1])) \
                .astype(np.int64)
            base = cum[starts] - gaps[starts]
            pos = cum - np.repeat(base, tf)
            if pos.size and int(pos.max()) >= _POS_LIMIT:
                raise ValueError(f"token position >= {_POS_LIMIT} "
                                 "unsupported by phrase keys")
            keys = (np.repeat(d, tf) << _POS_BITS) | pos
            per_term[t] = (d, ls, keys)

        # AND pre-filter: docs containing every unique term
        common = None
        for t in uniq:
            d = np.sort(per_term[t][0])
            common = d if common is None else \
                common[np.isin(common, d, assume_unique=True)]
            if common.size == 0:
                return heap_docs, heap_scores
        if allowed_bc is not None:
            allowed = allowed_bc.value
            pos_i = np.searchsorted(allowed, common)
            pos_c = np.minimum(pos_i, allowed.size - 1)
            common = common[allowed[pos_c] == common]
            if common.size == 0:
                return heap_docs, heap_scores
        if denied_bc is not None:
            # tombstone mask [public: Lucene liveDocs] — pre-heap, so the
            # phrase θ only grows from live docs
            live = _live_mask_arr(common, denied_bc.value)
            if live is not None:
                common = common[live]
                if common.size == 0:
                    return heap_docs, heap_scores
        if ex_rows is not None and len(ex_rows):
            # MUST_NOT mask [public: Lucene BooleanQuery MUST_NOT]:
            # excluded terms' doc-id streams only (positions/tf never
            # decoded — exclusion doesn't score), pre-heap
            nd_e = ex_rows["num_docs"].to_numpy(dtype=np.int64)
            ex_set = np.unique(delta_decode_blocks(
                decode_blocks(ex_rows["docs_enc"].to_numpy(), nd_e), nd_e,
                ex_rows["first_doc_id"].to_numpy(dtype=np.int64)))
            keep = _live_mask_arr(common, ex_set)
            if keep is not None:
                common = common[keep]
                if common.size == 0:
                    return heap_docs, heap_scores

        def term_keys(t):
            ks = per_term[t][2]
            return ks[np.isin(ks >> _POS_BITS, common)]

        # backward chain: S holds key positions of phrase_terms[i] that
        # start a valid chain through the phrase suffix
        pos_mask = np.int64(_POS_LIMIT - 1)
        S = term_keys(phrase_terms[-1])
        for i in range(m - 2, -1, -1):
            q = term_keys(phrase_terms[i])
            if q.size == 0 or S.size == 0:
                return heap_docs, heap_scores
            match = np.zeros(q.size, dtype=bool)
            for dlt in deltas:
                # q + dlt may wrap across the doc boundary of the packed
                # key (pos near 2^22 makes doc<<22|pos + dlt == the NEXT
                # doc's pos ~0, ADVICE r3) — only probe positions whose
                # shifted key stays inside the same doc
                ok = (q & pos_mask) + dlt < _POS_LIMIT
                match |= ok & np.isin(q + dlt, S)
            S = q[match]
        if S.size == 0:
            return heap_docs, heap_scores

        docs_out, ptf = np.unique(S >> _POS_BITS, return_counts=True)
        # dl lookup from any term's decoded run (all matching docs have it)
        d0, dl0, _ = per_term[uniq[0]]
        o = np.argsort(d0)
        dl_m = dl0[o][np.searchsorted(d0[o], docs_out)]
        scores_out = idf_sum * tf_norm(ptf.astype(np.float64), dl_m)

        if after is not None:
            a_s, a_d = float(after[0]), int(after[1])
            keep = (scores_out < a_s) | \
                   ((scores_out == a_s) & (docs_out > a_d))
            docs_out, scores_out = docs_out[keep], scores_out[keep]
            if docs_out.size == 0:
                return heap_docs, heap_scores
        if not truncate:
            heap_docs.append(docs_out)
            heap_scores.append(scores_out)
            return heap_docs, heap_scores
        return _merge_topk(heap_docs, heap_scores, docs_out, scores_out, k)

    def scorer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if truncate:
            hd = np.empty(0, dtype=np.int64)
            hs = np.empty(0, dtype=np.float64)
        else:
            hd, hs = [], []
        carry: Optional[pd.DataFrame] = None
        for pdf in batches:
            if pdf.empty:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            chunks = pdf["chunk"].to_numpy()
            last_start = int(np.flatnonzero(chunks != chunks[-1]).max() + 1) \
                if chunks[0] != chunks[-1] else 0
            carry = pdf.iloc[last_start:]
            head = pdf.iloc[:last_start]
            for _, rows in head.groupby("chunk", sort=True):
                hd, hs = score_chunk(rows, hd, hs)
        if carry is not None and len(carry):
            for _, rows in carry.groupby("chunk", sort=True):
                hd, hs = score_chunk(rows, hd, hs)
        if truncate:
            out_d, out_s = hd, hs
        else:
            out_d = np.concatenate(hd) if hd else np.empty(0, np.int64)
            out_s = np.concatenate(hs) if hs else np.empty(0, np.float64)
        yield pd.DataFrame({"doc_id": out_d.astype(np.int64),
                            "score": out_s.astype(np.float64)})

    return scorer
