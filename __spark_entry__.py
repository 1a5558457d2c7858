"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship top-k BM25 over sf0.001 documents (index built by
                 the engine, scored distributed, verified vs DuckDB SQL BM25).
queries()     -> one entry per implemented operator (SURVEY.md §2.E + the
                 fulltext path §2.C/D + training-data ops).
oracle_sql()  -> DuckDB-runnable ANSI SQL equivalents (same column aliases;
                 floats made deterministic via decimal-exact sums/rounding —
                 see parser_indexer_spark/relops.py docstring).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parser_indexer_spark import relops
from parser_indexer_spark.build import build_index
from parser_indexer_spark.config import EngineConfig
from parser_indexer_spark.search import Index

_INDEX_CACHE_ROOT = "/tmp/parser_indexer_spark_cache"
_FLAGSHIP_QUERY = "spark join"
_FLAGSHIP_K = 10


_STOP_LIST = ("data", "fast", "the")  # topk_bm25_stop analyzer option


def _documents_index(spark: SparkSession, sf_dir: str,
                     variant: str = "default") -> Index:
    """Build (once per (sf_dir, variant)) the inverted index over testdata
    documents; reuses the committed index on later calls (C12 resume).
    variant='stop' uses the opt-in stopword analyzer (persisted in the
    manifest with a bumped analyzer_version)."""
    # "v5": per-field docCount stats (r5) on top of the r4 impact-sidecar
    # + spell-table format — a /tmp cache from an older round must not be
    # reused; pos_enc back-compat is handled, the sidecar is not implied
    key = sf_dir.strip("/").replace("/", "_") + "_" + variant + "_v5"
    out = os.path.join(_INDEX_CACHE_ROOT, key)
    try:
        return Index(spark, out)
    except FileNotFoundError:
        pass
    shutil.rmtree(out, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = EngineConfig(n_buckets=8, build_partitions=16,
                       salt_df_threshold=100_000, n_salts=4, chunk_bits=12,
                       stopwords=_STOP_LIST if variant == "stop" else (),
                       fields=(("source", "lang") if variant == "fielded"
                               else ()))
    build_index(spark, docs, out, cfg, segments=1, doc_id_col="doc_id",
                input_desc=f"{sf_dir}/documents.parquet")
    return Index(spark, out)


def topk_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    ix = _documents_index(spark, sf_dir)
    top = ix.search(_FLAGSHIP_QUERY, k=_FLAGSHIP_K, mode="OR")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_bm25_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    ix = _documents_index(spark, sf_dir)
    top = ix.search("hash agg scan", k=_FLAGSHIP_K, mode="AND")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_bm25_and_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND with an index-absent term -> empty (required-term semantics,
    [public: Lucene BooleanQuery MUST]; ADVICE r1)."""
    ix = _documents_index(spark, sf_dir)
    top = ix.search("hash agg zzzabsentterm", k=_FLAGSHIP_K, mode="AND")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_bm25_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUST_NOT clause [public: Lucene BooleanQuery MUST_NOT; Solr
    -term]: top-k for 'spark join' excluding every doc containing
    'scan'; survivors keep their unmodified BM25 scores."""
    ix = _documents_index(spark, sf_dir)
    top = ix.search(_FLAGSHIP_QUERY, k=_FLAGSHIP_K, mode="OR",
                    must_not=["scan"])
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix query [public: Lucene PrefixQuery / Solr wildcard]: 's*'
    expands against the term dictionary (bounded, error beyond) into an
    ordinary scored OR."""
    ix = _documents_index(spark, sf_dir)
    top = ix.search("s*", k=_FLAGSHIP_K, mode="OR")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_bm25_must(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed MUST+SHOULD Boolean query via the Lucene-classic parser
    (D1/D19 r5) [public: Lucene classic QueryParser; BooleanQuery MUST +
    SHOULD]: '+spark join scan' — docs must contain 'spark'; 'join' and
    'scan' stay optional but score."""
    ix = _documents_index(spark, sf_dir)
    top = ix.query("+spark join scan", k=_FLAGSHIP_K)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy query (D20 r5) [public: Lucene FuzzyQuery]: 'spar~1' expands
    to the closest dictionary terms within Levenshtein distance 1 and
    scores them as an ordinary OR (scoring-Boolean rewrite)."""
    ix = _documents_index(spark, sf_dir)
    top = ix.query("spar~1", k=_FLAGSHIP_K)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard query (D21 r5) [public: Lucene WildcardQuery]: 's?a*'
    ('?' one char, '*' any run) expands against the term dictionary
    (bounded, error beyond) into an ordinary scored OR; the literal
    prefix prunes the dict scan on the large-vocab path."""
    ix = _documents_index(spark, sf_dir)
    top = ix.query("s?a*", k=_FLAGSHIP_K)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp query (D22 r5) [public: Lucene RegexpQuery; Solr /regex/]:
    '/s[pc]a[rn].*/' matches whole dictionary terms (anchored), expands
    bounded-or-error into a scored OR; the guaranteed literal prefix
    ('s') prunes the dict scan on the large-vocab path."""
    ix = _documents_index(spark, sf_dir)
    top = ix.query("/s[pc]a[rn].*/", k=_FLAGSHIP_K)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_term_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-range query (D21 r5) [public: Lucene TermRangeQuery; Solr
    field:[a TO b]]: every dictionary term in ['scan', 'spark'] joins a
    scored OR; both bounds push down onto the dict scan."""
    ix = _documents_index(spark, sf_dir)
    top = ix.query("[scan TO spark]", k=_FLAGSHIP_K)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def facet_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field faceting over a query's FULL match set (r5) [public: Solr
    facet.field]: per-value doc counts of lang and source across every
    doc matching 'spark join' (OR) — scorer runs unpruned/unsorted, match
    set semi-joins the doc store, stack+groupBy counts; no top-k heap."""
    ix = _documents_index(spark, sf_dir)
    return ix.search_facets(_FLAGSHIP_QUERY, ["lang", "source"])


def facet_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range faceting over a query's full match set (r5) [public: Solr
    facet.range]: docs matching 'spark join' (OR) counted into
    250-char-wide n_chars buckets on [0, 4000); out-of-range and null
    values dropped (facet.range.other=none)."""
    ix = _documents_index(spark, sf_dir)
    return ix.search_facet_range(_FLAGSHIP_QUERY, "n_chars", 0, 4000, 250)


def collapse_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field collapsing on the query path (r5) [public: Solr
    CollapsingQParserPlugin]: top-10 of the single best 'spark join'
    (OR) hit per source value — collapse needs the FULL match set, so
    the sort=False scorer feeds a per-group window rank, then the
    ordinary global top-k."""
    ix = _documents_index(spark, sf_dir)
    top = ix.search_collapse(_FLAGSHIP_QUERY, "source", k=_FLAGSHIP_K)
    return top.select("doc_id", F.round("score", 4).alias("score"),
                      "source")


def facet_pivot_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot faceting over a query's full match set (r5) [public: Solr
    facet.pivot=lang,source]: doc counts per (lang, source) pair across
    every doc matching 'spark join' (OR), null pairs dropped."""
    ix = _documents_index(spark, sf_dir)
    return ix.search_facet_pivot(_FLAGSHIP_QUERY, "lang", "source")


def sort_by_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-sorted search results (r5) [public: Solr sort=field asc]:
    the 10 shortest docs (n_chars asc, doc_id tiebreak) among ALL
    matches of 'spark join' (OR) — relevance bypassed, so the unpruned
    full-match scorer feeds one TakeOrdered on the field."""
    ix = _documents_index(spark, sf_dir)
    top = ix.search_sort_by(_FLAGSHIP_QUERY, "n_chars", k=_FLAGSHIP_K,
                            ascending=True)
    return top.select("doc_id", F.round("score", 4).alias("score"),
                      "n_chars")


def facet_stats_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats facet over a query's full match set (r5) [public: Solr
    StatsComponent stats.field]: count/sum/mean/min/max of n_chars
    across every doc matching 'spark join' (OR), nulls excluded."""
    ix = _documents_index(spark, sf_dir)
    return ix.search_facet_stats(_FLAGSHIP_QUERY, "n_chars")


def export_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full match-set export (r5) [public: Solr /export handler]: EVERY
    doc matching 'spark join' (OR) with its exact BM25 score plus the
    lang doc-store column — unordered, untruncated (the reranker-feed
    path where top-k would be wrong)."""
    ix = _documents_index(spark, sf_dir)
    out = ix.export_matches(_FLAGSHIP_QUERY, columns=("lang",))
    return out.select("doc_id", F.round("score", 4).alias("score"), "lang")


def boosted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-score boosting (D25 r5) [public: Solr boost= param;
    Lucene FunctionScoreQuery]: top-10 of 'spark join' (OR) by
    bm25 * (0.5 + n_chars/4000) — a length prior evaluated per matching
    doc. An unbounded boost can promote any match, so this rides the
    unpruned full-match scorer + one TakeOrdered."""
    ix = _documents_index(spark, sf_dir)
    top = ix.search_boosted(_FLAGSHIP_QUERY, "0.5 + n_chars / 4000.0",
                            k=_FLAGSHIP_K)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_bm25_stop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-analyzer index (Solr StopFilter analogue): 'the'/'data'/
    'fast' are dropped at index AND query time, changing dl/avgdl and
    hence every score — verified against a DuckDB oracle tokenizing with
    the same stop list."""
    ix = _documents_index(spark, sf_dir, variant="stop")
    top = ix.search("the fast spark join", k=_FLAGSHIP_K, mode="OR")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_bm25_fielded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-field search with boosts (Solr qf analogue): text:(spark
    join) + source:src7^2.0 + lang:en^0.5 over an index built with
    fields=(source, lang); fielded postings carry per-field dl/avgdl."""
    ix = _documents_index(spark, sf_dir, variant="fielded")
    top = ix.search_fields({"text": "spark join", "source": "src7",
                            "lang": "en"},
                           boosts={"source": 2.0, "lang": 0.5},
                           k=_FLAGSHIP_K)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase query over positional postings (D-phrase, [public:
    Lucene PhraseQuery]): docs whose token stream contains 'spark'
    immediately followed by 'join', scored as one pseudo-term —
    idf_sum * tf_norm(phrase_tf, dl)."""
    ix = _documents_index(spark, sf_dir)
    top = ix.phrase("spark join", k=_FLAGSHIP_K, slop=0)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def topk_phrase_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered proximity (chained-gap slop=2): 'filter' then 'window'
    within 3 positions, in order."""
    ix = _documents_index(spark, sf_dir)
    top = ix.phrase("filter window", k=_FLAGSHIP_K, slop=2)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def term_dict_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index dictionary (C7): df/cf per term, recomputable in SQL."""
    ix = _documents_index(spark, sf_dir)
    from parser_indexer_spark.build import read_dict
    return read_dict(spark, ix.root).select("term", "df", "cf")


def term_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D14 suggester: prefix completion from the index term dictionary,
    ranked by collection frequency (Solr Suggester analogue) — served from
    the tiny dict table, zero postings touched."""
    from parser_indexer_spark.build import read_dict
    ix = _documents_index(spark, sf_dir)
    return (read_dict(spark, ix.root)
            .where(F.col("term").startswith("s"))
            .orderBy(F.desc("cf"), F.asc("term"))
            .select("term", "cf").limit(10))


def spellcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D14 spellcheck via the bigram-prefiltered scale path (Index.
    spellcheck): candidates come from the persisted char-bigram -> term
    map (bucket-pruned read), Levenshtein runs on the candidate union
    only — never a dict scan [public: Lucene n-gram spellchecker]."""
    ix = _documents_index(spark, sf_dir)
    if not os.path.isdir(os.path.join(ix.root, "spell")):
        ix.build_spell_index()
    return ix.spellcheck("sparl", max_dist=2, limit=5)


def more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D14 MLT: documents most similar to doc 0 — BM25 OR-query over doc
    0's 5 rarest terms (lowest df, Lucene MLT's interesting-terms
    selection), source doc excluded from the page."""
    from parser_indexer_spark.analyze import tokenize_py
    ix = _documents_index(spark, sf_dir)
    src = (spark.read.parquet(f"{sf_dir}/documents.parquet")
           .where(F.col("doc_id") == 0).select("text").first())["text"]
    terms = sorted(set(tokenize_py(src)))
    dfs = ix.term_stats(terms)
    picked = sorted((t for t in terms if dfs[t] > 0),
                    key=lambda t: (dfs[t], t))[:5]
    top = ix.search(" ".join(picked), k=10, mode="OR")
    return (top.where(F.col("doc_id") != 0)
               .select("doc_id", F.round("score", 4).alias("score")))


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column pipeline (parser_indexer_spark.multimodal):
    byte-class histogram over the BINARY payload, computed by np.frombuffer
    inside mapInPandas. Payloads are the documents' UTF-8 bytes (ASCII in
    testdata), so DuckDB can verify byte classes as char classes."""
    from parser_indexer_spark import multimodal as mm
    return mm.media_byte_stats(mm.media_table(spark, sf_dir))


def ann_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-LSH ANN lookup (parser_indexer_spark.ann): per-vector
    bucket assignments persisted partitioned by (table, bucket) ONCE; the
    query reads only its <= L bucket partitions (partition-pruned) and
    exact-reranks the candidates — the 100 TB path where hashing the full
    embeddings table per query is not an option. Candidates and scores
    are identical to ann_cosine_lsh_multi (same planes, same re-rank)."""
    from parser_indexer_spark import ann
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    key = sf_dir.strip("/").replace("/", "_") + "_ann_v1"
    out = os.path.join(_INDEX_CACHE_ROOT, key)
    if not os.path.exists(os.path.join(out, "_ann_meta.json")):
        shutil.rmtree(out, ignore_errors=True)
        ann.build_ann_index(spark, emb, out, n_tables=16, n_planes=3)
    return ann.ann_query(spark, emb, out, query_vec_id=0, k=10)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return topk_bm25(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-facing query set — kept at <= 50 entries because the r3
    driver report capped at the first 50 in dict order and silently
    dropped the rest (VERDICT r3 'What's wrong' #1). One representative
    per operator family stays here; near-duplicate variants moved to
    extra_queries(), which the pytest oracle harness still runs in full.
    simhash8/simhash64 (the two entries that fell off the r3 report) are
    ordered early in their block as extra insurance."""
    return {
        # fulltext index + BM25 path (SURVEY.md §2.C/D — the north rule)
        "topk_bm25": topk_bm25,
        "topk_bm25_and": topk_bm25_and,
        "topk_bm25_not": topk_bm25_not,
        "topk_prefix": topk_prefix,
        "topk_bm25_stop": topk_bm25_stop,
        "topk_phrase": topk_phrase,
        "topk_phrase_slop": topk_phrase_slop,
        "topk_bm25_fielded": topk_bm25_fielded,
        "facet_search": facet_search,
        "export_search": export_search,
        "term_dict_stats": term_dict_stats,
        # training-data pipeline ops (simhash64, the r3 report casualty,
        # ordered early in its block as extra insurance; its 8-bit
        # variant moved to extra_queries when r5 queries hit the cap)
        "simhash64": relops.simhash64,
        "lang_trigram": relops.lang_trigram,
        "media_features": media_features,
        "dedup_exact": relops.dedup_exact,
        "minhash_signature": relops.minhash_signature,
        "dedup_near_pairs": relops.dedup_near_pairs,
        "ann_cosine": relops.ann_cosine,
        "ann_cosine_lsh": relops.ann_cosine_lsh,
        "ann_cosine_lsh_multi": relops.ann_cosine_lsh_multi,
        "ann_index_lookup": ann_index_lookup,
        "dedup_embedding_pairs": relops.dedup_embedding_pairs,
        "token_count_bpe": relops.token_count_bpe,
        "fingerprint_rolling": relops.fingerprint_rolling,
        "median_udaf": relops.median_udaf,
        "asof_join": relops.asof_join,
        "zscore_grouped": relops.zscore_grouped,
        "quality_score": relops.quality_score,
        "token_stats": relops.token_stats,
        # relational coverage (SURVEY.md §2.E)
        "project_filter": relops.project_filter,
        "join_broadcast": relops.join_broadcast,
        "join_sortmerge": relops.join_sortmerge,
        "join_semi": relops.join_semi,
        "join_anti": relops.join_anti,
        "agg_stats": relops.agg_stats,
        "facet_count": relops.facet_count,
        "agg_distinct": relops.agg_distinct,
        "cube_lang_source": relops.cube_lang_source,
        "window_rank": relops.window_rank,
        "window_lag_frame": relops.window_lag_frame,
        "topk_orders": relops.topk_orders,
        "topk_orders_page2": relops.topk_orders_page2,
        "setop_union": relops.setop_union,
        "term_suggest": term_suggest,
        "spellcheck": spellcheck,
        "more_like_this": more_like_this,
        "str_tokens": relops.str_tokens,
        "date_trunc_agg": relops.date_trunc_agg,
        "array_explode_tf": relops.array_explode_tf,
        "json_extract": relops.json_extract,
    }


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Overflow variants beyond the driver's 50-entry report window.
    Oracle-checked by tests/test_entry.py exactly like queries(); their
    operator families keep a representative in queries()."""
    return {
        "topk_bm25_and_absent": topk_bm25_and_absent,   # topk_bm25_and
        "topk_bm25_must": topk_bm25_must,               # topk_bm25_not
        "topk_fuzzy": topk_fuzzy,                       # topk_prefix
        "topk_wildcard": topk_wildcard,                 # topk_prefix
        "topk_term_range": topk_term_range,             # topk_prefix
        "topk_regexp": topk_regexp,                     # topk_prefix
        "facet_range_search": facet_range_search,       # facet_search
        "facet_stats_search": facet_stats_search,       # facet_search
        "facet_pivot_search": facet_pivot_search,       # facet_search
        "collapse_search": collapse_search,             # topk_bm25
        "sort_by_search": sort_by_search,               # topk_orders
        "boosted_search": boosted_search,               # topk_bm25
        "simhash8": relops.simhash8,                    # simhash64
        "facet_percentile": relops.facet_percentile,    # facet_count
        "ann_cosine_lsh_probe": relops.ann_cosine_lsh_probe,  # _lsh
        "setop_except": relops.setop_except,            # setop_union
        "setop_intersect": relops.setop_intersect,      # setop_union
        "lang_guess": relops.lang_guess,                # lang_trigram
    }


_TOK = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
        "x -> x <> '')")


def _bm25_sql(terms_sql: str, mode: str, k: int, stop: tuple = (),
              must_not: tuple = (), prefix: str | None = None,
              must: tuple = (), fuzzy: tuple | None = None,
              like_pattern: str | None = None,
              trange: tuple | None = None,
              regex: str | None = None,
              export_col: str | None = None,
              collapse_col: str | None = None,
              sort_by: tuple | None = None,
              boost_expr: str | None = None) -> str:
    """DuckDB BM25 over documents: same formula, exact dl, k1=1.2 b=0.75.
    ``stop``: analyzer stopword list (applied to the corpus tokenization,
    mirroring the engine's index-time StopFilter). ``must_not``: docs
    containing any of these terms are dropped AFTER scoring (exclusion
    never changes survivors' scores — Lucene MUST_NOT). ``prefix``: derive
    the query term set as every corpus term with this prefix instead of a
    literal list (Lucene PrefixQuery scoring rewrite). ``must``: docs must
    contain every one of these terms (include them in ``terms_sql`` too);
    the remaining terms still score — Lucene BooleanQuery MUST + SHOULD.
    ``fuzzy``: (word, max_dist) — the query term set is the 50 closest
    corpus terms within Levenshtein distance, (distance, term)-ordered,
    mirroring Index.expand_fuzzy's Lucene-style best-terms cap.
    ``like_pattern``: SQL LIKE pattern ('_'/'%') — the query term set is
    every corpus term matching it (WildcardQuery rewrite; '?'->'_',
    '*'->'%'). ``trange``: (lo, hi) inclusive — every corpus term in the
    lexicographic range (TermRangeQuery rewrite). ``regex``: anchored
    whole-term regex — every corpus term fully matching it (RegexpQuery
    rewrite; regexp_full_match is DuckDB's anchored match).
    ``export_col``: mirror of Index.export_matches — return the FULL
    match set (no ORDER/LIMIT) with this doc-store column joined in;
    incompatible with must_not here (the entry doesn't combine them).
    ``collapse_col``: mirror of Index.search_collapse — best hit per
    value of this column (score desc, doc_id asc), then top-k.
    ``sort_by``: (column, 'ASC'|'DESC') — mirror of Index.search_sort_by:
    top-k of the full match set by a doc-store field, nulls last.
    ``boost_expr``: SQL over d.<doc-store cols> — mirror of
    Index.search_boosted (multiplicative): top-k by score * boost, null
    boost = neutral 1.0, doc_id tiebreak."""
    assert not (export_col and must_not), "entry never combines these"
    having = "" if mode == "OR" else \
        f"HAVING count(*) = (SELECT count(*) FROM qterms)"
    if must and mode == "OR":
        m_in = ", ".join(f"'{w}'" for w in must)
        having = (f"HAVING count(DISTINCT CASE WHEN term IN ({m_in}) "
                  f"THEN term END) = {len(must)}")
    tok_expr = _TOK
    if stop:
        inlist = ", ".join(f"'{w}'" for w in stop)
        tok_expr = f"list_filter({_TOK}, x -> x NOT IN ({inlist}))"
    if prefix is not None:
        qterms = f"SELECT DISTINCT term FROM tok WHERE term LIKE '{prefix}%'"
    elif like_pattern is not None:
        qterms = ("SELECT DISTINCT term FROM tok WHERE term LIKE "
                  f"'{like_pattern}'")
    elif trange is not None:
        qterms = ("SELECT DISTINCT term FROM tok WHERE term >= "
                  f"'{trange[0]}' AND term <= '{trange[1]}'")
    elif regex is not None:
        qterms = ("SELECT DISTINCT term FROM tok WHERE "
                  f"regexp_full_match(term, '{regex}')")
    elif fuzzy is not None:
        w, d = fuzzy
        qterms = (f"SELECT term FROM (SELECT DISTINCT term FROM tok) "
                  f"WHERE levenshtein(term, '{w}') <= {d} "
                  f"ORDER BY levenshtein(term, '{w}'), term LIMIT 50")
    else:
        qterms = f"SELECT unnest([{terms_sql}]) AS term"
    not_where = ""
    if must_not:
        exl = ", ".join(f"'{w}'" for w in must_not)
        not_where = (f"WHERE doc_id NOT IN (SELECT DISTINCT doc_id "
                     f"FROM tok WHERE term IN ({exl}))")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({tok_expr}) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
st AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(dl) FROM dl) AS sum_dl
),
qterms AS ({qterms}),
tfs AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN (SELECT term FROM qterms) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tfs GROUP BY term),
scored AS (
  SELECT t.doc_id,
         sum( ln(1 + (st.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                        / (st.sum_dl * 1.0 / st.n_docs))) ) AS score
  FROM tfs t JOIN dfs d USING(term) JOIN dl USING(doc_id) CROSS JOIN st
  GROUP BY t.doc_id
  {having}
)
{f'''SELECT doc_id, round(bscore, 4) AS score
FROM (SELECT s.doc_id, s.score * coalesce(({boost_expr}), 1.0) AS bscore
      FROM scored s JOIN documents d USING(doc_id))
ORDER BY bscore DESC, doc_id LIMIT {k}''' if boost_expr else
 f'''SELECT s.doc_id AS doc_id, round(s.score, 4) AS score,
       d.{export_col} AS {export_col}
FROM scored s JOIN documents d USING(doc_id)''' if export_col else
 f'''SELECT s.doc_id AS doc_id, round(s.score, 4) AS score,
       d.{sort_by[0] if sort_by else ""} AS {sort_by[0] if sort_by else ""}
FROM scored s JOIN documents d USING(doc_id)
ORDER BY d.{sort_by[0] if sort_by else ""} {sort_by[1] if sort_by else ""}
         NULLS LAST, s.doc_id LIMIT {k}''' if sort_by else
 f'''SELECT doc_id, round(raw_score, 4) AS score, {collapse_col}
FROM (SELECT s.doc_id, s.score AS raw_score, d.{collapse_col},
             row_number() OVER (PARTITION BY d.{collapse_col}
                 ORDER BY s.score DESC, s.doc_id) AS rn
      FROM scored s JOIN documents d USING(doc_id))
WHERE rn = 1 ORDER BY raw_score DESC, doc_id LIMIT {k}''' if collapse_col else
 f'''SELECT doc_id, round(score, 4) AS score
FROM scored {not_where} ORDER BY scored.score DESC, doc_id LIMIT {k}'''}
"""


def _phrase_sql(term_a: str, term_b: str, slop: int, k: int) -> str:
    """DuckDB mirror of Index.phrase for a two-term phrase: phrase_tf =
    count of start positions i with toks[i]=a and b within (i, i+slop+1];
    score = (idf_a + idf_b) * tf_norm(phrase_tf, dl)."""
    if slop == 0:
        ptf = (f"len(list_filter(range(1, len(toks)), i -> "
               f"toks[i]='{term_a}' AND toks[i+1]='{term_b}'))")
    else:
        ptf = (f"len(list_filter(range(1, len(toks) + 1), i -> "
               f"toks[i]='{term_a}' AND len(list_filter("
               f"range(i+1, least(i+{slop + 2}, len(toks)+1)), "
               f"j -> toks[j]='{term_b}')) > 0))")
    return f"""
WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
st AS (SELECT count(*) AS n_docs, sum(len(toks)) AS sum_dl,
       sum(CASE WHEN list_contains(toks, '{term_a}') THEN 1 ELSE 0 END) AS df_a,
       sum(CASE WHEN list_contains(toks, '{term_b}') THEN 1 ELSE 0 END) AS df_b
       FROM tok),
ph AS (SELECT doc_id, len(toks) AS dl, {ptf} AS ptf FROM tok),
scored AS (SELECT doc_id,
   (ln(1+(n_docs-df_a+0.5)/(df_a+0.5)) + ln(1+(n_docs-df_b+0.5)/(df_b+0.5)))
   * ptf / (ptf + 1.2*(1-0.75+0.75*dl/(sum_dl*1.0/n_docs))) AS score
   FROM ph CROSS JOIN st WHERE ptf > 0)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""


def _fielded_sql(k: int) -> str:
    """DuckDB mirror of topk_bm25_fielded: text BM25 legs + fielded legs
    with tf=1, dl=1, avgdl_field=1 (single-token fields) => tf_norm =
    1/(1+k1); boost folds into the idf weight."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
st AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(dl) FROM dl) AS sum_dl
),
qterms AS (SELECT unnest(['join', 'spark']) AS term),
tfs AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN (SELECT term FROM qterms) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tfs GROUP BY term),
textscore AS (
  SELECT t.doc_id,
         sum( ln(1 + (st.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                        / (st.sum_dl * 1.0 / st.n_docs))) ) AS ts
  FROM tfs t JOIN dfs d USING(term) JOIN dl USING(doc_id) CROSS JOIN st
  GROUP BY t.doc_id
),
fst AS (
  -- per-field docCount (Lucene per-field BM25): idf over docs WITH the
  -- field (dense here, so == n_docs — kept explicit for parity)
  SELECT (SELECT count(*) FROM documents WHERE source = 'src7') AS df_src,
         (SELECT count(*) FROM documents WHERE lang = 'en') AS df_lang,
         (SELECT count(*) FROM documents WHERE len(list_filter(
            regexp_split_to_array(lower(source), '[^a-z0-9]+'),
            x -> x <> '')) > 0) AS n_src,
         (SELECT count(*) FROM documents WHERE len(list_filter(
            regexp_split_to_array(lower(lang), '[^a-z0-9]+'),
            x -> x <> '')) > 0) AS n_lang
),
fieldscore AS (
  SELECT doc_id,
         (CASE WHEN source = 'src7' THEN
            2.0 * ln(1 + (n_src - df_src + 0.5) / (df_src + 0.5))
                * (1.0 / (1.0 + 1.2)) ELSE 0 END)
       + (CASE WHEN lang = 'en' THEN
            0.5 * ln(1 + (n_lang - df_lang + 0.5) / (df_lang + 0.5))
                * (1.0 / (1.0 + 1.2)) ELSE 0 END) AS fs,
         (source = 'src7' OR lang = 'en') AS fmatch
  FROM documents CROSS JOIN fst
)
SELECT doc_id, round(score, 4) AS score FROM (
  SELECT coalesce(t.doc_id, f.doc_id) AS doc_id,
         coalesce(ts, 0) + coalesce(fs, 0) AS score
  FROM textscore t
  FULL JOIN (SELECT doc_id, fs FROM fieldscore WHERE fmatch) f
    ON t.doc_id = f.doc_id
) ORDER BY score DESC, doc_id LIMIT {k}
"""


def _mlt_sql(k: int) -> str:
    """DuckDB MLT oracle: BM25 over doc 0's 5 rarest terms (df asc, term
    asc), top-k page computed first, source doc excluded after — mirrors
    more_like_this exactly."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
st AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(dl) FROM dl) AS sum_dl
),
alldf AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
qterms AS (
  SELECT term FROM alldf
  WHERE term IN (SELECT DISTINCT term FROM tok WHERE doc_id = 0)
  ORDER BY df ASC, term LIMIT 5
),
tfs AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN (SELECT term FROM qterms) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tfs GROUP BY term),
scored AS (
  SELECT t.doc_id,
         sum( ln(1 + (st.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                        / (st.sum_dl * 1.0 / st.n_docs))) ) AS score
  FROM tfs t JOIN dfs d USING(term) JOIN dl USING(doc_id) CROSS JOIN st
  GROUP BY t.doc_id
)
SELECT * FROM (
  SELECT doc_id, round(score, 4) AS score
  FROM scored ORDER BY scored.score DESC, doc_id LIMIT {k}
) WHERE doc_id <> 0
"""


def _ann_multi_sql(k: int = 10, n_tables: int = 16, n_planes: int = 3) -> str:
    """Generated DuckDB mirror of relops.ann_cosine_lsh_multi (L-table
    LSH): same integer-deterministic planes, candidates = union over
    tables of query-bucket members, exact cosine re-rank."""
    npl = n_tables * n_planes

    def dotp(p: int) -> str:
        return (f"list_dot_product(embedding::DOUBLE[], "
                f"(SELECT h FROM planes WHERE p={p}))")

    buckets = []
    for t in range(n_tables):
        bits = " + ".join(
            f"(CASE WHEN {dotp(t * n_planes + i)} >= 0 "
            f"THEN {2 ** i} ELSE 0 END)" for i in range(n_planes))
        buckets.append(f"({bits}) AS b{t}")
    qb = ", ".join(f"b{t} AS qb{t}" for t in range(n_tables))
    match = " OR ".join(f"eb.b{t} = q.qb{t}" for t in range(n_tables))
    return f"""
        WITH planes AS (
          SELECT p, list_transform(
                   range(0, (SELECT len(embedding) FROM embeddings LIMIT 1)),
                   j -> (CAST((j+1)*(p*7+3)*2654435761 % 1000 AS DOUBLE) - 500)/250.0
                 ) AS h
          FROM (SELECT unnest(range(0, {npl})) AS p)
        ),
        eb AS (
          SELECT vec_id, embedding::DOUBLE[] AS e, {', '.join(buckets)}
          FROM embeddings
        ),
        q AS (SELECT e AS qe, {qb} FROM eb WHERE vec_id = 0),
        s AS (
          SELECT vec_id,
                 list_dot_product(e, qe)
                 / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))) AS c
          FROM eb, q WHERE ({match}) AND vec_id <> 0
        )
        SELECT vec_id, round(c, 6) AS cosine
        FROM s ORDER BY c DESC, vec_id LIMIT {k}"""


def _dedup_embedding_sql(threshold: float = 0.3, cap: int = 1000) -> str:
    """Generated DuckDB mirror of relops.dedup_embedding_pairs."""
    def dotp(p: int) -> str:
        return (f"list_dot_product(embedding::DOUBLE[], "
                f"(SELECT h FROM planes WHERE p={p}))")

    bits = " + ".join(f"(CASE WHEN {dotp(p)} >= 0 THEN {2 ** p} ELSE 0 END)"
                      for p in range(8))
    return f"""
        WITH planes AS (
          SELECT p, list_transform(
                   range(0, (SELECT len(embedding) FROM embeddings LIMIT 1)),
                   j -> (CAST((j+1)*(p*7+3)*2654435761 % 1000 AS DOUBLE) - 500)/250.0
                 ) AS h
          FROM (SELECT unnest(range(0, 8)) AS p)
        ),
        eb AS (
          SELECT vec_id, embedding::DOUBLE[] AS e, ({bits}) AS bucket
          FROM embeddings
        ),
        small AS (
          SELECT bucket FROM eb GROUP BY bucket HAVING count(*) <= {cap}
        ),
        s AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))) AS c
          FROM eb a
          JOIN small s ON s.bucket = a.bucket
          JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b, round(c, 6) AS cosine
        FROM s WHERE c >= {threshold}"""


def _lang_trigram_sql() -> str:
    """Generated DuckDB mirror of relops.lang_trigram_df (rank-weighted
    presence, weight = profile_len - rank)."""
    from parser_indexer_spark.relops import _TRIGRAM_PROFILES
    langs = sorted(_TRIGRAM_PROFILES)
    score = {lg: " + ".join(
        f"(CASE WHEN contains(tl, '{t}') THEN {len(_TRIGRAM_PROFILES[lg]) - i} ELSE 0 END)"
        for i, t in enumerate(_TRIGRAM_PROFILES[lg])) for lg in langs}
    sel = ", ".join(f"({score[lg]}) AS score_{lg}" for lg in langs)
    cases = []
    for i, lg in enumerate(langs[:-1]):
        conds = " AND ".join(f"score_{lg} >= score_{o}" for o in langs[i + 1:])
        cases.append(f"WHEN {conds} THEN '{lg}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return f"""
        WITH s AS (
          SELECT doc_id, {sel}
          FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS tl FROM documents)
        )
        SELECT doc_id, {', '.join(f'score_{lg}' for lg in langs)},
               {case} AS lang_id
        FROM s"""


def _simhash64_sql() -> str:
    """Generated DuckDB mirror of relops.simhash64_df (4x16-bit bands)."""
    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(md5(term),{pos},1)) - 1)"

    hv = ", ".join(
        " + ".join(f"{nib(4 * j + c + 1)} * {16 ** (3 - c)}" for c in range(4))
        + f" AS hv{j}" for j in range(4))
    sums = ", ".join(f"sum((hv{j} // {2 ** i}) % 2) AS b{j}_{i}"
                     for j in range(4) for i in range(16))
    sigs = ", ".join(
        "CAST(" + " + ".join(f"(CASE WHEN b{j}_{i}*2 > n THEN {2 ** i} ELSE 0 END)"
                             for i in range(16)) + f" AS INT) AS sh{j}"
        for j in range(4))
    return f"""
        WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
        hv AS (SELECT doc_id, {hv} FROM tok),
        g AS (SELECT doc_id, count(*) AS n, {sums} FROM hv GROUP BY doc_id)
        SELECT doc_id, {sigs} FROM g"""


def oracle_sql() -> dict[str, str]:
    return {
        "topk_bm25": _bm25_sql("'join', 'spark'", "OR", _FLAGSHIP_K),
        "topk_bm25_and": _bm25_sql("'agg', 'hash', 'scan'", "AND", _FLAGSHIP_K),
        "topk_bm25_and_absent": _bm25_sql(
            "'agg', 'hash', 'zzzabsentterm'", "AND", _FLAGSHIP_K),
        "topk_bm25_not": _bm25_sql("'join', 'spark'", "OR", _FLAGSHIP_K,
                                   must_not=("scan",)),
        "topk_bm25_must": _bm25_sql("'join', 'scan', 'spark'", "OR",
                                    _FLAGSHIP_K, must=("spark",)),
        "topk_fuzzy": _bm25_sql("", "OR", _FLAGSHIP_K, fuzzy=("spar", 1)),
        "topk_wildcard": _bm25_sql("", "OR", _FLAGSHIP_K,
                                   like_pattern="s_a%"),
        "topk_term_range": _bm25_sql("", "OR", _FLAGSHIP_K,
                                     trange=("scan", "spark")),
        "topk_regexp": _bm25_sql("", "OR", _FLAGSHIP_K,
                                 regex="s[pc]a[rn].*"),
        "export_search": _bm25_sql("'join', 'spark'", "OR", 0,
                                   export_col="lang"),
        "collapse_search": _bm25_sql("'join', 'spark'", "OR", _FLAGSHIP_K,
                                     collapse_col="source"),
        "sort_by_search": _bm25_sql("'join', 'spark'", "OR", _FLAGSHIP_K,
                                    sort_by=("n_chars", "ASC")),
        "boosted_search": _bm25_sql(
            "'join', 'spark'", "OR", _FLAGSHIP_K,
            boost_expr="0.5 + d.n_chars / 4000.0"),
        "facet_pivot_search": f"""
            WITH m AS (
              SELECT DISTINCT doc_id
              FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
              WHERE term IN ('join', 'spark')
            )
            SELECT CAST(lang AS VARCHAR) AS value_a,
                   CAST(source AS VARCHAR) AS value_b, count(*) AS n
            FROM documents WHERE doc_id IN (SELECT doc_id FROM m)
              AND lang IS NOT NULL AND source IS NOT NULL
            GROUP BY lang, source""",
        "facet_stats_search": f"""
            WITH m AS (
              SELECT DISTINCT doc_id
              FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
              WHERE term IN ('join', 'spark')
            )
            SELECT count(n_chars) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_v,
                   avg(n_chars) AS avg_v,
                   min(n_chars) AS min_v,
                   max(n_chars) AS max_v
            FROM documents WHERE doc_id IN (SELECT doc_id FROM m)""",
        "facet_range_search": f"""
            WITH m AS (
              SELECT DISTINCT doc_id
              FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
              WHERE term IN ('join', 'spark')
            )
            SELECT CAST(0 + floor((n_chars - 0) / 250) * 250 AS BIGINT)
                     AS bucket_lo,
                   count(*) AS n
            FROM documents WHERE doc_id IN (SELECT doc_id FROM m)
              AND n_chars IS NOT NULL AND n_chars >= 0 AND n_chars < 4000
            GROUP BY 1""",
        "topk_prefix": _bm25_sql("", "OR", _FLAGSHIP_K, prefix="s"),
        "topk_bm25_stop": _bm25_sql("'join', 'spark'", "OR", _FLAGSHIP_K,
                                    stop=_STOP_LIST),
        "topk_phrase": _phrase_sql("spark", "join", 0, _FLAGSHIP_K),
        "topk_phrase_slop": _phrase_sql("filter", "window", 2, _FLAGSHIP_K),
        "topk_bm25_fielded": _fielded_sql(_FLAGSHIP_K),
        "facet_search": f"""
            WITH m AS (
              SELECT DISTINCT doc_id
              FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
              WHERE term IN ('join', 'spark')
            )
            SELECT 'lang' AS field, CAST(lang AS VARCHAR) AS value,
                   count(*) AS n
            FROM documents WHERE doc_id IN (SELECT doc_id FROM m)
              AND lang IS NOT NULL
            GROUP BY lang
            UNION ALL
            SELECT 'source', CAST(source AS VARCHAR), count(*)
            FROM documents WHERE doc_id IN (SELECT doc_id FROM m)
              AND source IS NOT NULL
            GROUP BY source""",
        "term_dict_stats": f"""
            SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf FROM (
              SELECT doc_id, term, count(*) AS tf
              FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
              GROUP BY doc_id, term)
            GROUP BY term""",
        "project_filter": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE lang = 'en' AND n_chars > 200""",
        "join_broadcast": """
            SELECT o_orderpriority, count(*) AS n_items,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                        AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F' GROUP BY o_orderpriority""",
        "join_sortmerge": """
            SELECT p_brand, count(*) AS n_items,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand""",
        "join_semi": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)""",
        "join_anti": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
        "agg_stats": """
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value,
                   min(value) AS min_value, max(value) AS max_value
            FROM events GROUP BY event_type""",
        "facet_count": """
            SELECT lang, source, count(*) AS n FROM documents
            GROUP BY lang, source""",
        "agg_distinct": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type""",
        "cube_lang_source": """
            SELECT lang, source, count(*) AS n FROM documents
            GROUP BY CUBE (lang, source)""",
        "window_rank": """
            SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rnk
              FROM orders) WHERE rnk <= 3""",
        "window_lag_frame": """
            SELECT event_id, user_id,
                   value - lag(value) OVER w AS delta,
                   CAST(sum(CAST(value AS DECIMAL(28,10)))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS DOUBLE) AS moving3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
        "topk_orders_page2": """
            WITH p1 AS (
              SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
            ),
            cursor AS (
              SELECT o_totalprice AS lp, o_orderkey AS lk FROM p1
              ORDER BY o_totalprice ASC, o_orderkey DESC LIMIT 1
            )
            SELECT o_orderkey, o_totalprice FROM orders, cursor
            WHERE o_totalprice < lp OR (o_totalprice = lp AND o_orderkey > lk)
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
        "facet_percentile": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.9), 4) AS p90
            FROM events GROUP BY event_type""",
        "setop_union": """
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            UNION
            SELECT o_custkey FROM orders WHERE o_totalprice > 100000""",
        "setop_except": """
            SELECT c_custkey FROM customer
            EXCEPT SELECT o_custkey FROM orders""",
        "setop_intersect": """
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",
        "term_suggest": f"""
            SELECT term, CAST(count(*) AS BIGINT) AS cf
            FROM (SELECT unnest({_TOK}) AS term FROM documents)
            WHERE term LIKE 's%'
            GROUP BY term ORDER BY cf DESC, term LIMIT 10""",
        # candidate semantics mirror the engine's n-gram retrieval: length
        # within +-2 AND >= 1 shared char bigram with the query word
        "spellcheck": f"""
            WITH d AS (
              SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
              GROUP BY term)
            SELECT term, CAST(levenshtein(term, 'sparl') AS INT) AS dist, df
            FROM d WHERE levenshtein(term, 'sparl') <= 2
              AND abs(length(term) - 5) <= 2
              AND (contains(term, 'sp') OR contains(term, 'pa')
                   OR contains(term, 'ar') OR contains(term, 'rl'))
            ORDER BY dist, df DESC, term LIMIT 5""",
        "more_like_this": _mlt_sql(_FLAGSHIP_K),
        "str_tokens": f"""
            SELECT term, count(*) AS n_occurrences
            FROM (SELECT unnest({_TOK}) AS term FROM documents)
            GROUP BY term""",
        "date_trunc_agg": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
                   count(*) AS n
            FROM events GROUP BY 1""",
        "array_explode_tf": f"""
            SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
            GROUP BY doc_id, term""",
        "json_extract": """
            SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) % 10 AS k_mod,
                   count(*) AS n
            FROM events GROUP BY 1""",
        "media_features": """
            SELECT doc_id,
                   CAST(length(text) AS INT) AS n_bytes,
                   CAST(length(text) - length(regexp_replace(text, '[a-m]', '', 'g')) AS INT) AS h_am,
                   CAST(length(text) - length(regexp_replace(text, '[n-z]', '', 'g')) AS INT) AS h_nz,
                   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS h_digit,
                   CAST(length(regexp_replace(text, '[a-z0-9]', '', 'g')) AS INT) AS h_other
            FROM documents""",
        "dedup_exact": """
            SELECT md5(text) AS fp, count(*) AS n_dups, min(doc_id) AS keeper
            FROM documents GROUP BY 1""",
        "minhash_signature": f"""
            WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            sh AS (
              SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
              FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i
                    FROM tok WHERE len(toks) >= 3)
            )
            SELECT doc_id,
                   min(md5('s0:' || shingle)) AS sig0,
                   min(md5('s1:' || shingle)) AS sig1,
                   min(md5('s2:' || shingle)) AS sig2,
                   min(md5('s3:' || shingle)) AS sig3
            FROM sh GROUP BY doc_id""",
        "dedup_near_pairs": f"""
            WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
              FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
                    FROM tok WHERE len(toks) >= 3)
            ),
            sig AS (
              SELECT doc_id,
                     min(md5('s0:' || shingle)) AS sig0, min(md5('s1:' || shingle)) AS sig1,
                     min(md5('s2:' || shingle)) AS sig2, min(md5('s3:' || shingle)) AS sig3,
                     min(md5('s4:' || shingle)) AS sig4, min(md5('s5:' || shingle)) AS sig5,
                     min(md5('s6:' || shingle)) AS sig6, min(md5('s7:' || shingle)) AS sig7
              FROM sh GROUP BY doc_id
            ),
            bands AS (
              SELECT doc_id, 0 AS band, md5(sig0 || '|' || sig1) AS bh FROM sig
              UNION ALL SELECT doc_id, 1, md5(sig2 || '|' || sig3) FROM sig
              UNION ALL SELECT doc_id, 2, md5(sig4 || '|' || sig5) FROM sig
              UNION ALL SELECT doc_id, 3, md5(sig6 || '|' || sig7) FROM sig
            ),
            small AS (
              SELECT band, bh FROM bands
              GROUP BY band, bh HAVING count(*) <= 1000
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a
              JOIN small s ON s.band = a.band AND s.bh = a.bh
              JOIN bands b
                ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
            ),
            sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
              SELECT doc_a, doc_b, count(*) AS n_inter
              FROM cand
              JOIN sh sa ON sa.doc_id = doc_a
              JOIN sh sb ON sb.doc_id = doc_b AND sb.shingle = sa.shingle
              GROUP BY doc_a, doc_b
            )
            SELECT doc_a, doc_b,
                   round(n_inter * 1.0 / (za.n_sh + zb.n_sh - n_inter), 4) AS jaccard
            FROM inter
            JOIN sz za ON za.doc_id = doc_a
            JOIN sz zb ON zb.doc_id = doc_b
            WHERE n_inter * 1.0 / (za.n_sh + zb.n_sh - n_inter) >= 0.5""",
        "ann_cosine": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
                       WHERE vec_id = 0),
            s AS (
              SELECT vec_id,
                     list_dot_product(embedding::DOUBLE[], qe)
                     / (sqrt(list_dot_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[]))
                        * sqrt(list_dot_product(qe, qe))) AS c
              FROM embeddings, q WHERE vec_id <> 0
            )
            SELECT vec_id, round(c, 6) AS cosine
            FROM s ORDER BY c DESC, vec_id LIMIT 20""",
        "asof_join": """
            SELECT event_id, user_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
                   strftime(last_view, '%Y-%m-%d %H:%M:%S') AS asof_view_ts
            FROM (
              SELECT event_id, user_id, ts, event_type,
                     last_value(CASE WHEN event_type = 'view' THEN ts END
                                IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS last_view
              FROM events)
            WHERE event_type = 'error'""",
        "zscore_grouped": """
            SELECT doc_id, source,
                   CASE WHEN count(*) OVER w > 1
                             AND stddev_samp(n_chars) OVER w > 0
                        THEN round((n_chars - avg(n_chars) OVER w)
                                   / stddev_samp(n_chars) OVER w, 4)
                        ELSE 0.0 END AS z_chars
            FROM documents
            WINDOW w AS (PARTITION BY source)""",
        "ann_cosine_lsh": """
            WITH planes AS (
              SELECT p, list_transform(
                       range(0, (SELECT len(embedding) FROM embeddings LIMIT 1)),
                       j -> (CAST((j+1)*(p*7+3)*2654435761 % 1000 AS DOUBLE) - 500)/250.0
                     ) AS h
              FROM (SELECT unnest([0,1,2,3]) AS p)
            ),
            eb AS (
              SELECT vec_id, embedding::DOUBLE[] AS e,
                     (CASE WHEN list_dot_product(embedding::DOUBLE[], (SELECT h FROM planes WHERE p=0)) >= 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN list_dot_product(embedding::DOUBLE[], (SELECT h FROM planes WHERE p=1)) >= 0 THEN 2 ELSE 0 END)
                   + (CASE WHEN list_dot_product(embedding::DOUBLE[], (SELECT h FROM planes WHERE p=2)) >= 0 THEN 4 ELSE 0 END)
                   + (CASE WHEN list_dot_product(embedding::DOUBLE[], (SELECT h FROM planes WHERE p=3)) >= 0 THEN 8 ELSE 0 END)
                     AS bucket
              FROM embeddings
            ),
            q AS (SELECT e AS qe, bucket AS qbucket FROM eb WHERE vec_id = 0),
            s AS (
              SELECT vec_id,
                     list_dot_product(e, qe)
                     / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))) AS c
              FROM eb, q WHERE eb.bucket = q.qbucket AND vec_id <> 0
            )
            SELECT vec_id, round(c, 6) AS cosine
            FROM s ORDER BY c DESC, vec_id LIMIT 10""",
        "ann_cosine_lsh_probe": """
            WITH planes AS (
              SELECT p, list_transform(
                       range(0, (SELECT len(embedding) FROM embeddings LIMIT 1)),
                       j -> (CAST((j+1)*(p*7+3)*2654435761 % 1000 AS DOUBLE) - 500)/250.0
                     ) AS h
              FROM (SELECT unnest([0,1,2,3]) AS p)
            ),
            eb AS (
              SELECT vec_id, embedding::DOUBLE[] AS e,
                     (CASE WHEN list_dot_product(embedding::DOUBLE[], (SELECT h FROM planes WHERE p=0)) >= 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN list_dot_product(embedding::DOUBLE[], (SELECT h FROM planes WHERE p=1)) >= 0 THEN 2 ELSE 0 END)
                   + (CASE WHEN list_dot_product(embedding::DOUBLE[], (SELECT h FROM planes WHERE p=2)) >= 0 THEN 4 ELSE 0 END)
                   + (CASE WHEN list_dot_product(embedding::DOUBLE[], (SELECT h FROM planes WHERE p=3)) >= 0 THEN 8 ELSE 0 END)
                     AS bucket
              FROM embeddings
            ),
            q AS (SELECT e AS qe, bucket AS qbucket FROM eb WHERE vec_id = 0),
            s AS (
              SELECT vec_id,
                     list_dot_product(e, qe)
                     / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))) AS c
              FROM eb, q
              WHERE eb.bucket IN (q.qbucket, xor(q.qbucket, 1), xor(q.qbucket, 2),
                                  xor(q.qbucket, 4), xor(q.qbucket, 8))
                AND vec_id <> 0
            )
            SELECT vec_id, round(c, 6) AS cosine
            FROM s ORDER BY c DESC, vec_id LIMIT 10""",
        "ann_cosine_lsh_multi": _ann_multi_sql(),
        # materialized path: same planes, same candidate set, same re-rank
        "ann_index_lookup": _ann_multi_sql(),
        "dedup_embedding_pairs": _dedup_embedding_sql(),
        "token_count_bpe": r"""
            SELECT doc_id % 10 AS doc_mod, count(*) AS n_docs,
                   CAST(sum(n) AS BIGINT) AS total_tokens,
                   CAST(max(n) AS BIGINT) AS max_tokens
            FROM (SELECT doc_id,
                         len(regexp_extract_all(lower(text),
                             '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+'))
                         AS n
                  FROM documents)
            GROUP BY 1""",
        "fingerprint_rolling": """
            SELECT doc_id,
                   CASE WHEN length(text) > 0 THEN
                     list_reduce(
                       [CAST(0 AS BIGINT)] ||
                       list_transform(range(1, length(text) + 1),
                                      i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)),
                       (acc, x) -> (acc * 31 + x) % 2147483647)
                   ELSE 0 END AS fp_roll
            FROM documents""",
        "median_udaf": """
            SELECT event_type, round(median(value), 4) AS median_value
            FROM events GROUP BY event_type""",
        "quality_score": f"""
            WITH tok AS (SELECT doc_id, n_chars, {_TOK} AS toks FROM documents)
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   round(n_chars * 1.0 / greatest(len(toks), 1), 4) AS chars_per_token,
                   round(len(list_filter(toks, x -> list_contains(
                       ['the','a','of','and','to','in','is','on','for','with',
                        'as','by','at','from','or','an','be','this','that','it'], x)))
                       * 1.0 / greatest(len(toks), 1), 4) AS stopword_ratio,
                   round(len(list_filter(toks, x -> regexp_full_match(x, '[0-9]+')))
                       * 1.0 / greatest(len(toks), 1), 4) AS digit_ratio
            FROM tok""",
        "token_stats": f"""
            SELECT source, count(*) AS n_tokens, count(DISTINCT term) AS n_terms
            FROM (SELECT source, unnest({_TOK}) AS term FROM documents)
            GROUP BY source""",
        "lang_guess": f"""
            WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            h AS (SELECT doc_id,
                    len(list_filter(toks, x -> list_contains(['the','fast','small'], x))) AS hits_en,
                    len(list_filter(toks, x -> list_contains(['agg','data','dup'], x))) AS hits_es,
                    len(list_filter(toks, x -> list_contains(['hash','window','stream'], x))) AS hits_de
                  FROM tok)
            SELECT doc_id, hits_en, hits_es, hits_de,
                   CASE WHEN hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
                        WHEN hits_es >= hits_de THEN 'es' ELSE 'de' END AS lang_guess
            FROM h""",
        "simhash8": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            hv AS (SELECT doc_id,
                     (strpos('0123456789abcdef', substr(md5(term),1,1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(md5(term),2,1)) - 1) AS hv
                   FROM tok),
            g AS (SELECT doc_id, count(*) AS n,
                    sum((hv // 1) % 2)  AS b0, sum((hv // 2) % 2)  AS b1,
                    sum((hv // 4) % 2)  AS b2, sum((hv // 8) % 2)  AS b3,
                    sum((hv // 16) % 2) AS b4, sum((hv // 32) % 2) AS b5,
                    sum((hv // 64) % 2) AS b6, sum((hv // 128) % 2) AS b7
                  FROM hv GROUP BY doc_id)
            SELECT doc_id, CAST(
                   (CASE WHEN b0*2 > n THEN 1   ELSE 0 END)
                 + (CASE WHEN b1*2 > n THEN 2   ELSE 0 END)
                 + (CASE WHEN b2*2 > n THEN 4   ELSE 0 END)
                 + (CASE WHEN b3*2 > n THEN 8   ELSE 0 END)
                 + (CASE WHEN b4*2 > n THEN 16  ELSE 0 END)
                 + (CASE WHEN b5*2 > n THEN 32  ELSE 0 END)
                 + (CASE WHEN b6*2 > n THEN 64  ELSE 0 END)
                 + (CASE WHEN b7*2 > n THEN 128 ELSE 0 END) AS INT) AS simhash8
            FROM g""",
        "simhash64": _simhash64_sql(),
        "lang_trigram": _lang_trigram_sql(),
    }
