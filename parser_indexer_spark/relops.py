"""General relational operator surface (SURVEY.md §2.E) + training-data
pipeline ops (dedup/fingerprint/ANN) over the driver's testdata tables.

The reference delegates all of this to Solr (facets/filters/sort) or lacks
it; the engine exposes each as an idiomatic Catalyst plan so the driver's
DuckDB harness can verify it 1:1 (SURVEY.md §3.3). Determinism rules used
throughout (floats must hash identically across engines):
  * money sums -> SUM(CAST(x AS DECIMAL(18,2))) then cast double (exact)
  * unordered float reductions are avoided or decimal-exact
  * window arithmetic over <=3 doubles in frame order is bitwise-stable
  * every computed column is aliased identically here and in the SQL oracle
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from parser_indexer_spark.analyze import tokenize_series


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------- scan / filter ---

def project_filter(spark, sf_dir):
    """Projection + predicate pushdown: both reach the Parquet scan
    (PushedFilters / ReadSchema show only 3 columns)."""
    return (T(spark, sf_dir, "documents")
            .where((F.col("lang") == "en") & (F.col("n_chars") > 200))
            .select("doc_id", "source", "n_chars"))


# ------------------------------------------------------------------ joins ---

def join_broadcast(spark, sf_dir):
    """Small-dim broadcast hash join (orders side grouped after)."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)") *
           (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
    return (li.join(F.broadcast(o.where(F.col("o_orderstatus") == "F")
                                 .select("o_orderkey", "o_orderpriority")),
                    li.l_orderkey == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_items"),
                 F.sum(rev).cast("double").alias("revenue")))


def join_sortmerge(spark, sf_dir):
    """Large-large sort-merge join (merge hint defeats auto-broadcast)."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").hint("merge")
    return (li.join(p, li.l_partkey == p.p_partkey)
            .groupBy("p_brand")
            .agg(F.count("*").alias("n_items"),
                 F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                  .cast("double").alias("sum_qty")))


def join_semi(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
             .select("c_custkey", "c_mktsegment"))


def join_anti(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .select("c_custkey", "c_name"))


# ----------------------------------------------------------- aggregation ---

def agg_stats(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (e.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(28,10)"))
                  .cast("double").alias("sum_value"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value")))


def facet_count(spark, sf_dir):
    """Solr field-facet analogue: group-by count [public: Solr JSON facets]."""
    return (T(spark, sf_dir, "documents")
            .groupBy("lang", "source").agg(F.count("*").alias("n")))


def agg_distinct(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (e.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_users")))


def cube_lang_source(spark, sf_dir):
    """Solr pivot-facet analogue: CUBE with subtotal rows."""
    return (T(spark, sf_dir, "documents")
            .cube("lang", "source").agg(F.count("*").alias("n")))


# ---------------------------------------------------------------- windows ---

def window_rank(spark, sf_dir):
    """Solr result-collapse analogue: top-3 orders per customer."""
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.withColumn("rnk", F.row_number().over(w))
             .where(F.col("rnk") <= 3)
             .select("o_custkey", "o_orderkey", "o_totalprice", "rnk"))


def window_lag_frame(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-2, 0)
    return (e.withColumn("prev_value", F.lag("value").over(w))
             .withColumn("delta", F.col("value") - F.col("prev_value"))
             .withColumn("moving3",
                         F.sum(F.col("value").cast("decimal(28,10)")).over(wf)
                          .cast("double"))
             .select("event_id", "user_id", "delta", "moving3"))


# ------------------------------------------------------- sort / set ops ---

def topk_orders(spark, sf_dir):
    return (T(spark, sf_dir, "orders")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .select("o_orderkey", "o_totalprice").limit(20))


def topk_orders_page2(spark, sf_dir):
    """D11 deep pagination (Solr cursorMark analogue): keyset paging — page
    2 is WHERE (sortkey, id) strictly after page 1's last row, then sort +
    limit again. No OFFSET scan: the predicate pushes to the scan, so page
    N costs the same as page 1 at any depth (the whole point at 100 TB).
    The cursor round-trips through the client exactly like cursorMark."""
    o = T(spark, sf_dir, "orders")
    p1 = (o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
           .select("o_orderkey", "o_totalprice").limit(20).collect())
    lp, lk = p1[-1]["o_totalprice"], p1[-1]["o_orderkey"]
    after = (F.col("o_totalprice") < lp) | (
        (F.col("o_totalprice") == lp) & (F.col("o_orderkey") > lk))
    return (o.where(after)
             .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
             .select("o_orderkey", "o_totalprice").limit(20))


def facet_percentile(spark, sf_dir):
    """Solr JSON-facet percentile analogue (D10): exact interpolated
    percentiles per facet bucket — Spark F.percentile == ANSI
    percentile_cont == DuckDB quantile_cont."""
    e = T(spark, sf_dir, "events")
    return (e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90")))


def setop_union(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.union(b).distinct()


def setop_except(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o.distinct()).distinct()


def setop_intersect(spark, sf_dir):
    """INTERSECT: customers that placed both an 'F' and an 'O' order."""
    o = T(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


# --------------------------------------------- strings / dates / arrays ---

def str_tokens(spark, sf_dir):
    """Tokenizer equivalence (C1) via the engine's Arrow pandas_udf."""
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def tok(texts: pd.Series) -> pd.Series:
        return tokenize_series(texts)

    d = T(spark, sf_dir, "documents")
    return (d.select(F.explode(tok(F.col("text"))).alias("term"))
             .groupBy("term").agg(F.count("*").alias("n_occurrences")))


def date_trunc_agg(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (e.groupBy(F.date_format(F.date_trunc("hour", F.col("ts")),
                                    "yyyy-MM-dd HH").alias("hour"))
             .agg(F.count("*").alias("n")))


def array_explode_tf(spark, sf_dir):
    """tf via pure built-ins: split/explode/filter/group — the JVM-side
    equivalent of the fused tokenize stage (documents are ASCII lower)."""
    d = T(spark, sf_dir, "documents")
    tokens = F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                      lambda x: x != "")
    return (d.select("doc_id", F.explode(tokens).alias("term"))
             .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))


def json_extract(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int")
    return (e.select(k.alias("k"))
             .groupBy((F.col("k") % 10).alias("k_mod"))
             .agg(F.count("*").alias("n")))


# ------------------------------------- training-data pipeline operators ---

def dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (hash-groupBy); keeper = min doc_id."""
    d = T(spark, sf_dir, "documents")
    return (d.groupBy(F.md5(F.col("text")).alias("fp"))
             .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper")))


def minhash_signature(spark, sf_dir):
    """MinHash over token 3-shingles, 4 hash families (md5-seeded) — the
    signature stage of MinHash-LSH near-dup detection, verifiable in SQL."""
    d = T(spark, sf_dir, "documents")
    tokens = F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                      lambda x: x != "")
    sh = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(tokens) - 3),
                lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, 3)),
            )
        ).alias("shingle"),
    ).where(F.size(tokens) >= 3)
    aggs = [F.min(F.md5(F.concat(F.lit(f"s{i}:"), F.col("shingle"))))
             .alias(f"sig{i}") for i in range(4)]
    return sh.groupBy("doc_id").agg(*aggs)


def _shingle_set(d: DataFrame, k: int = 3) -> DataFrame:
    """DISTINCT (doc_id, shingle) over token k-shingles — the set view that
    Jaccard needs (minhash_signature keeps duplicates; min is unaffected)."""
    tokens = F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                      lambda x: x != "")
    return (d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(tokens) - k),
                lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)),
            )
        ).alias("shingle"),
    ).where(F.size(tokens) >= k).distinct())


def _cap_buckets(rows: DataFrame, keys: list, max_bucket: int) -> DataFrame:
    """Drop every LSH bucket larger than ``max_bucket`` members (VERDICT r2
    #2): a degenerate band hash (empty-ish/boilerplate docs at corpus
    scale) would make the candidate self-join quadratic inside that bucket
    — m members emit m^2 candidate rows. Production LSH skips or sub-salts
    oversized buckets [public: Spark MinHashLSH docs caveat; Leskovec et
    al., Mining of Massive Datasets ch.3]. The cap is a left-semi join
    against the under-cap bucket list (one map-side-combinable count, no
    extra pass over docs). Dropped buckets are observable via
    lsh_oversized_buckets()."""
    small = (rows.groupBy(*keys).agg(F.count("*").alias("_bsz"))
                 .where(F.col("_bsz") <= max_bucket)
                 .select(*keys))
    return rows.join(small, keys, "left_semi")


def lsh_oversized_buckets(d: DataFrame, n_hashes: int = 8, n_bands: int = 4,
                          max_bucket: int = 1000) -> DataFrame:
    """Audit companion to near_dup_pairs: the (band, bh, size) buckets the
    cap dropped — run it when a dedup job reports fewer pairs than
    expected, so truncation is observable rather than silent."""
    bands = _minhash_bands(d, n_hashes, n_bands)
    return (bands.groupBy("band", "bh").agg(F.count("*").alias("size"))
                 .where(F.col("size") > max_bucket))


def _minhash_bands(d: DataFrame, n_hashes: int, n_bands: int) -> DataFrame:
    rows = n_hashes // n_bands
    sh = _shingle_set(d)
    sigs = sh.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat(F.lit(f"s{i}:"), F.col("shingle"))))
         .alias(f"sig{i}") for i in range(n_hashes)])
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"sig{b * rows + r}")
                                     for r in range(rows)])).alias("bh"),
        ) for b in range(n_bands)]
    return (sigs.select("doc_id", F.explode(F.array(*band_structs)).alias("x"))
                .select("doc_id", "x.band", "x.bh"))


def near_dup_pairs(d: DataFrame, n_hashes: int = 8, n_bands: int = 4,
                   threshold: float = 0.5,
                   max_bucket: int = 1000) -> DataFrame:
    """MinHash-LSH near-duplicate detection, END-TO-END (VERDICT r1 #1):
    shingle -> minhash signature -> banding -> candidate pairs by band-hash
    equi-join -> exact-Jaccard verification -> (doc_a, doc_b, jaccard).

    100-TB shape: candidates come from an EQUI-JOIN on (band, band_hash) —
    docs only meet inside an LSH bucket, never all-pairs; the verification
    join touches only candidate docs' shingle sets (linear shuffles). With
    b bands of r rows, P(candidate) = 1-(1-J^r)^b — here r=2, b=4 targets
    J >= ~0.5. Deterministic md5 hashing keeps DuckDB rank-agreeing.

    ``max_bucket`` caps LSH bucket size (VERDICT r2 #2): buckets with more
    members are dropped from candidate generation (bounding the self-join
    at max_bucket^2 per bucket) and surfaced by lsh_oversized_buckets().
    The DuckDB oracle mirrors the cap exactly."""
    sh = _shingle_set(d)
    bands = _cap_buckets(_minhash_bands(d, n_hashes, n_bands),
                         ["band", "bh"], max_bucket)
    ba = bands.select(F.col("doc_id").alias("doc_a"), "band", "bh")
    bb = bands.select(F.col("doc_id").alias("doc_b"), "band", "bh")
    cand = (ba.join(bb, ["band", "bh"])
              .where(F.col("doc_a") < F.col("doc_b"))
              .select("doc_a", "doc_b").distinct())
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (cand.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
                 .groupBy("doc_a", "doc_b")
                 .agg(F.count("*").alias("n_inter")))
    jac = F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (inter
            .join(sizes.select(F.col("doc_id").alias("doc_a"),
                               F.col("n_sh").alias("na")), "doc_a")
            .join(sizes.select(F.col("doc_id").alias("doc_b"),
                               F.col("n_sh").alias("nb")), "doc_b")
            .where(jac >= threshold)
            .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard")))


def dedup_near_pairs(spark, sf_dir):
    """Near-dup pairs over the documents table (queries() entry)."""
    return near_dup_pairs(T(spark, sf_dir, "documents"))


def ann_cosine(spark, sf_dir):
    """Brute-force cosine top-20 neighbours of vec_id=0 over embeddings —
    the exact baseline for ANN; JVM-side higher-order functions only."""
    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")).first()["q_emb"]
    qlit = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), qlit,
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"),
                    lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    qn = float(sum(float(x) * float(x) for x in q)) ** 0.5
    cos = dot / (nrm * F.lit(qn))
    return (emb.where(F.col("vec_id") != 0)
               .select("vec_id", cos.alias("_exact"))
               .orderBy(F.desc("_exact"), F.asc("vec_id")).limit(20)
               .select("vec_id", F.round("_exact", 6).alias("cosine")))


# ------------------------------------ text analysis (training-data ops) ---

_STOPWORDS = ("the a of and to in is on for with as by at from or an be "
              "this that it").split()


def quality_score(spark, sf_dir):
    """Document quality heuristics: token count, mean token length,
    stopword ratio, digit ratio — pure JVM expressions, fully
    SQL-expressible (training-data pipeline quality gate)."""
    d = T(spark, sf_dir, "documents")
    tokens = F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                      lambda x: x != "")
    n_tok = F.size(tokens)
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(tokens, lambda x: F.array_contains(stop_arr, x)))
    n_digit = F.size(F.filter(tokens, lambda x: x.rlike("^[0-9]+$")))
    return (d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(F.col("n_chars") / F.greatest(n_tok, F.lit(1)), 4)
         .alias("chars_per_token"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(n_digit / F.greatest(n_tok, F.lit(1)), 4).alias("digit_ratio"),
    ))


def token_stats(spark, sf_dir):
    """Corpus token accounting: docs, total tokens, distinct terms per
    source partition (the 'how big is my training set' query)."""
    d = T(spark, sf_dir, "documents")
    tokens = F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                      lambda x: x != "")
    e = d.select("source", F.explode(tokens).alias("term"))
    return (e.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("term").alias("n_terms")))


def lang_guess(spark, sf_dir):
    """Heuristic language ID over a known tiny phrasebook: argmax by hit
    count of per-language marker words; deterministic tie-break by language
    code. (The real corpus text is English-ish synthetic, so the guess
    column mostly exercises the machinery: CASE/array ops, argmax.)"""
    markers = {
        "en": ["the", "fast", "small"],
        "es": ["agg", "data", "dup"],
        "de": ["hash", "window", "stream"],
    }
    d = T(spark, sf_dir, "documents")
    tokens = F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                      lambda x: x != "")
    hits = {}
    for lang, ws in markers.items():
        arr = F.array(*[F.lit(w) for w in ws])
        hits[lang] = F.size(F.filter(tokens, lambda x: F.array_contains(arr, x)))
    best = F.when((hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"]), "en") \
            .when(hits["es"] >= hits["de"], "es").otherwise("de")
    return d.select("doc_id", hits["en"].alias("hits_en"),
                    hits["es"].alias("hits_es"), hits["de"].alias("hits_de"),
                    best.alias("lang_guess"))


# character-trigram profiles (hand-built from public orthography facts:
# most-frequent character trigrams of each language, RANK-ORDERED most
# frequent first; the classic n-gram profile method of Cavnar & Trenkle
# 1994). Spaces mark word boundaries. Scoring is weighted presence —
# weight = profile_len - rank — a monotone approximation of the C-T
# out-of-place distance that stays a pure JVM/DuckDB boolean expression
# (VERDICT r3 #8: wider profiles + rank-aware scoring). No apostrophes
# (they would need SQL escaping in the generated oracle).
_TRIGRAM_PROFILES = {
    "de": [" de", "der", "ein", "ich", "sch", "die", "und", " un", "cht",
           "gen", "ung", " ge", "nde", "ber", "das", "ten", "den", " di",
           "ine", " ei", "che", "ver", " ve", "ens", "lic", "ier", "eit",
           "hen", " zu", "ang", " au", "auf", "ist", " is", "ese", "ndi",
           "nen", "and", "rde", "ste", "sei", " se", "wir", " wi", "mit",
           " mi", "ach", "ner", "run", "wei", "ehe", "nic", "ht ",
           "ei ", "er ", "en ", "ch ", "te ", "ng ", "nd ", "ie "],
    "en": [" th", "the", "ing", " an", "and", "ion", " of", " to", "ent",
           "tio", "for", " in", "his", "ere", "ng ", "her", "hat", " wh",
           "tha", "ati", " co", "ter", "was", " wa", "ver", "all", " be",
           "ith", "wit", " wi", "ave", " ha", "has", "not", " no", "are",
           " ar", "is ", " is", "ed ", "es ", " re", "ons", "ome", " on",
           "oul", "uld", "ld ", "you", " yo", "ts ", "nt ", "of ", "to ",
           "at ", "in ", "e t", "t t", "s t", " a "],
    "es": ["que", " qu", "ión", " la", " el", "los", "ado", "est", " es",
           "nte", "cio", " co", "as ", "ien", "aci", " en", "ent", " un",
           "una", "con", "por", " po", "par", " pa", "ara", " de", "de ",
           "del", "la ", "el ", "os ", "es ", "al ", " se", "se ", "ndo",
           "sta", "ció", "nci", "ida", "dad", " no", "no ", " al",
           "ant", "tra", " tr", "res", "ore", "ist", "o d", "a d", "e l",
           "a l", "o e", "a e", "os ", "ón ", "an ", "ar "],
    "fr": [" le", "les", "ent", "des", " pa", "eur", "ais", "our", " et",
           "ons", "ait", "aux", "nce", "éta", "ouv", " de", "de ", " la",
           "la ", "le ", "et ", "es ", " co", "con", "ion", "tio", "men",
           " me", "que", " qu", "ue ", " un", "une", "ne ", "re ", " re",
           "ur ", "eme", "nte", "ant", "dan", " da", "ans", "ns ", "pou",
           " po", "vou", " vo", "ous", "us ", "ont", "nt ",
           "it ", "st ", " il", "il ", "ce ", " ce", "e l", "e d"],
}
# profiles must be duplicate-free or the weighted sum double-counts; they
# are also capped at 40 trigrams/lang — each trigram is one contains()
# pass over the text, and the 60/lang variant measured 11 s of one-time
# whole-stage-codegen compilation plus ~1.5x steady-state cost for ~no
# additional separation on the test sentences
_TRIGRAM_PROFILES = {
    lg: list(dict.fromkeys(tris))[:40]
    for lg, tris in _TRIGRAM_PROFILES.items()
}


# joins every doc to the profile table even when no profile trigram is
# present, so zero-score docs survive the inner join without a second
# shuffle to re-attach them (\x01 cannot occur in a real trigram)
_LANGID_SENTINEL = "\x01\x01\x01"


def _langid_profile_rows() -> list[tuple]:
    """(trigram, w_de, w_en, w_es, w_fr) rows: weight = profile_len - rank
    for the language's profile, 0 for languages not listing the trigram;
    plus the all-zero sentinel row."""
    langs = sorted(_TRIGRAM_PROFILES)
    entries: dict[str, dict[str, int]] = {}
    for lg, tris in _TRIGRAM_PROFILES.items():
        n = len(tris)
        for i, tri in enumerate(tris):
            entries.setdefault(tri, dict.fromkeys(langs, 0))[lg] = n - i
    entries[_LANGID_SENTINEL] = dict.fromkeys(langs, 0)
    return [(tri, *[ws[lg] for lg in langs])
            for tri, ws in sorted(entries.items())]


def lang_trigram_df(d: DataFrame) -> DataFrame:
    """Character-trigram-profile language ID (B5; Cavnar-Trenkle-style):
    per language, RANK-WEIGHTED presence of its top trigrams in the
    lowercased text (weight = profile_len - rank, so the most frequent
    trigrams dominate — a monotone stand-in for the C-T out-of-place
    distance); argmax with deterministic language-code tie-break.

    Single-pass plan (VERDICT r4 #3): the text's DISTINCT trigrams are
    exploded once (O(|text|), map-side only) and hash-joined against the
    broadcast ~160-row (trigram, weights) profile table, then one
    map-side-combined groupBy(doc_id) sums the weights — replacing the
    prior 160-`contains()` projection whose cost was O(|profiles| x
    |text|) per row. Same output bit-for-bit (the DuckDB oracle still
    computes the contains() form, so the two algorithms cross-check)."""
    langs = sorted(_TRIGRAM_PROFILES)
    prof = d.sparkSession.createDataFrame(
        _langid_profile_rows(),
        "tri string, " + ", ".join(f"w_{lg} int" for lg in langs))
    # the padded text is materialized as its own attribute BELOW the
    # Generate: referencing the concat/lower expression directly inside
    # the transform lambda re-evaluates it PER ELEMENT (measured: O(L^2)
    # per doc, 3.5x slower than the contains() form it replaces); as an
    # attribute it is computed once per row and the lambda's substr is
    # O(1) per element
    tl = F.col("_tl")
    tri_arr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(tl) - F.lit(2), F.lit(1))),
        lambda i: tl.substr(i, F.lit(3)))
    # per-row intersect with the constant profile-trigram set BEFORE the
    # explode (array_intersect also dedups): only the <= ~160 trigrams
    # that can score survive, so the join/agg sees O(profile) rows per
    # doc instead of O(|text|) — the explode volume no longer scales
    # with document length at all
    all_tris = sorted({t for tris in _TRIGRAM_PROFILES.values()
                       for t in tris})
    matched = F.array_intersect(
        tri_arr, F.array(*[F.lit(t) for t in all_tris]))
    padded = d.select(
        "doc_id",
        F.concat(F.lit(" "), F.lower(F.col("text")),
                 F.lit(" ")).alias("_tl"))
    e = padded.select("doc_id", F.explode(
        F.concat(matched,
                 F.array(F.lit(_LANGID_SENTINEL)))).alias("tri"))
    g = (e.join(F.broadcast(prof), "tri")
         .groupBy("doc_id")
         .agg(*[F.sum(f"w_{lg}").cast("int").alias(f"s_{lg}")
                for lg in langs]))
    scores = {lg: F.col(f"s_{lg}") for lg in langs}
    # sequential argmax: first language (alphabetically) whose score >= all
    # later ones wins — ties break to the earlier code, same as the oracle
    best = F.lit(langs[-1])
    whens = []
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for other in langs[i + 1:]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        whens.append((cond, lang))
    expr = None
    for cond, lang in whens:
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    best = expr.otherwise(langs[-1])
    return g.select("doc_id",
                    *[scores[lg].alias(f"score_{lg}") for lg in langs],
                    best.alias("lang_id"))


def lang_trigram(spark, sf_dir):
    return lang_trigram_df(T(spark, sf_dir, "documents"))


def simhash8(spark, sf_dir):
    """8-bit SimHash fingerprint: per doc, bit i = majority over tokens of
    bit i of md5(token). Cross-engine deterministic because md5 is; the
    LSH-style near-dup grouping key for fuzzy dedup."""
    d = T(spark, sf_dir, "documents")
    tokens = F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                      lambda x: x != "")
    e = d.select("doc_id", F.explode(tokens).alias("term"))
    h = F.conv(F.substring(F.md5(F.col("term")), 1, 2), 16, 10).cast("int")
    e = e.select("doc_id", h.alias("hv"), F.lit(1).alias("one"))
    aggs = [F.count("*").alias("n")]
    for i in range(8):
        aggs.append(F.sum(((F.col("hv") / (2 ** i)).cast("int") % 2))
                    .alias(f"b{i}"))
    g = e.groupBy("doc_id").agg(*aggs)
    sig = sum([(F.when(F.col(f"b{i}") * 2 > F.col("n"), 2 ** i).otherwise(0))
               for i in range(8)], F.lit(0))
    return g.select("doc_id", sig.cast("int").alias("simhash8"))


def simhash64_df(d: DataFrame) -> DataFrame:
    """64-bit SimHash as four 16-bit bands (sh0..sh3): bit i of band j =
    majority over tokens of bit i of md5(token) hex nibbles [4j, 4j+4).
    Band representation doubles as the Hamming-ball LSH probe table:
    near-identical docs agree on most bits, so at least one 16-bit band
    collides with high probability (probed by simhash_band_candidates).
    64-bit upgrade of simhash8 (VERDICT r1 #9); md5 keeps DuckDB agreeing."""
    tokens = F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                      lambda x: x != "")
    e = d.select("doc_id", F.explode(tokens).alias("term"))
    hvs = [F.conv(F.substring(F.md5(F.col("term")), 4 * j + 1, 4), 16, 10)
            .cast("int").alias(f"hv{j}") for j in range(4)]
    e = e.select("doc_id", *hvs)
    aggs = [F.count("*").alias("n")]
    for j in range(4):
        for i in range(16):
            aggs.append(F.sum((F.col(f"hv{j}") / (2 ** i)).cast("int") % 2)
                        .alias(f"b{j}_{i}"))
    g = e.groupBy("doc_id").agg(*aggs)
    sigs = []
    for j in range(4):
        sig = sum([(F.when(F.col(f"b{j}_{i}") * 2 > F.col("n"),
                           2 ** i).otherwise(0)) for i in range(16)],
                  F.lit(0))
        sigs.append(sig.cast("int").alias(f"sh{j}"))
    return g.select("doc_id", *sigs)


def simhash64(spark, sf_dir):
    return simhash64_df(T(spark, sf_dir, "documents"))


def simhash_band_candidates(d: DataFrame,
                            max_bucket: int = 1000) -> DataFrame:
    """Hamming-ball probing via band equality: candidate near-dup pairs are
    docs sharing ANY of the four 16-bit simhash bands — four equi-joins
    (bucketed, never all-pairs), unioned and deduped. Pairs then go to an
    exact verifier (near_dup_pairs' Jaccard stage or Hamming distance).
    ``max_bucket`` drops degenerate band values (VERDICT r2 #2) — e.g. the
    all-zero band that every near-empty doc shares — before the self-join
    can go quadratic."""
    s = simhash64_df(d)
    parts = []
    for j in range(4):
        bandj = _cap_buckets(
            s.select("doc_id", F.col(f"sh{j}").alias("band_val")),
            ["band_val"], max_bucket)
        a = bandj.select(F.col("doc_id").alias("doc_a"), "band_val")
        b = bandj.select(F.col("doc_id").alias("doc_b"), "band_val")
        parts.append(a.join(b, "band_val")
                      .where(F.col("doc_a") < F.col("doc_b"))
                      .select("doc_a", "doc_b"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.distinct()


def ann_cosine_lsh(spark, sf_dir):
    """LSH-bucketed ANN (the scale path next to the exact ann_cosine
    baseline): 4 deterministic pseudo-random hyperplanes (seeded from the
    embedding index via cos/sin — identical arithmetic in DuckDB), bucket =
    sign bits; exact cosine re-rank WITHIN the query's bucket.
    At 100 TB the bucket join replaces the full scan: candidates co-locate
    by a single equi-join on the bucket key."""
    return _ann_lsh(spark, sf_dir, k=10, probe=False)


def ann_cosine_lsh_probe(spark, sf_dir):
    """Multi-probe LSH ANN: probe the query's bucket PLUS the 4 buckets at
    Hamming distance 1 (one sign bit flipped) — the standard recall fix for
    bucketed LSH (a near neighbour that lands just across one hyperplane is
    recovered). 5 of 16 buckets scanned instead of 1, still never all-pairs."""
    return _ann_lsh(spark, sf_dir, k=10, probe=True)


def _ann_lsh(spark, sf_dir, k, probe):
    emb = T(spark, sf_dir, "embeddings")
    first = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    dim = len(first)

    def plane(p):
        # deterministic pseudo-random hyperplane from EXACT integer
        # arithmetic (identical doubles in DuckDB — libm cos() may differ
        # in the last ulp and flip a sign bit at the bucket boundary)
        return [((j + 1) * (p * 7 + 3) * 2654435761 % 1000 - 500) / 250.0
                for j in range(dim)]

    def dot_with(vals):
        lit = F.array(*[F.lit(v) for v in vals])
        return F.aggregate(
            F.zip_with(F.col("embedding"), lit,
                       lambda a, b: a.cast("double") * b.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x)

    bucket = sum([(F.when(dot_with(plane(p)) >= 0, 2 ** p).otherwise(0))
                  for p in range(4)], F.lit(0)).alias("bucket")
    with_b = emb.select("vec_id", "embedding", bucket)
    qb = with_b.where(F.col("vec_id") == 0).select(
        F.col("bucket").alias("qbucket"),
        F.col("embedding").alias("qe")).first()
    qe, qbucket = qb["qe"], qb["qbucket"]
    qlit = F.array(*[F.lit(float(x)) for x in qe])
    dot = F.aggregate(F.zip_with(F.col("embedding"), qlit,
                                 lambda a, b: a.cast("double") * b.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"), lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    qn = float(sum(float(x) * float(x) for x in qe)) ** 0.5
    cos = dot / (nrm * F.lit(qn))
    buckets = [qbucket]
    if probe:
        buckets += [qbucket ^ (1 << p) for p in range(4)]
    return (with_b.where(F.col("bucket").isin(buckets)
                         & (F.col("vec_id") != 0))
            .select("vec_id", cos.alias("_exact"))
            .orderBy(F.desc("_exact"), F.asc("vec_id")).limit(k)
            .select("vec_id", F.round("_exact", 6).alias("cosine")))


def ann_cosine_lsh_multi(spark, sf_dir):
    """L-table LSH ANN [public: Indyk & Motwani 1998; Andoni & Indyk 2008
    E2LSH]: 16 INDEPENDENT hash tables of 3 hyperplanes each (planes
    3t..3t+2 per table t, same integer-deterministic construction as
    ann_cosine_lsh). Candidates = UNION over tables of the query-bucket
    members — a near neighbour is missed only if it disagrees with the
    query in EVERY table, so recall rises as 1-(1-p^r)^L instead of p^r.
    L=16/r=3 is sized for the fixture embeddings (near-uniform: top-10
    cosine ~0.3 => per-plane agreement p ~0.61, per-table hit ~0.22, 16
    tables => ~0.98 expected recall; asserted >= 0.9 in
    tests/test_relops_ext.py). NOTE: at that similarity level ANY LSH
    needs a wide union — the candidate fraction is ~0.9 of the tiny
    fixture corpus; real clustered embeddings at the same L keep buckets
    sparse. Execution = 16 bucket-equality lookups unioned + exact
    re-rank over deduped candidates; at 100 TB each lookup is a
    partition-pruned read of a bucket-partitioned table, never a scan."""
    return _ann_lsh_multi(spark, sf_dir, k=10, n_tables=16, n_planes=3)


def _ann_lsh_multi(spark, sf_dir, k, n_tables, n_planes):
    emb = T(spark, sf_dir, "embeddings")
    first = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    dim = len(first)

    def plane(p):
        return [((j + 1) * (p * 7 + 3) * 2654435761 % 1000 - 500) / 250.0
                for j in range(dim)]

    def dot_with(vals):
        lit = F.array(*[F.lit(v) for v in vals])
        return F.aggregate(
            F.zip_with(F.col("embedding"), lit,
                       lambda a, b: a.cast("double") * b.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x)

    def bucket_col(t):
        return sum([(F.when(dot_with(plane(t * n_planes + i)) >= 0,
                            2 ** i).otherwise(0))
                    for i in range(n_planes)], F.lit(0)).alias(f"b{t}")

    with_b = emb.select("vec_id", "embedding",
                        *[bucket_col(t) for t in range(n_tables)])
    q = with_b.where(F.col("vec_id") == 0).first()
    qe = q["embedding"]
    qlit = F.array(*[F.lit(float(x)) for x in qe])
    dot = F.aggregate(F.zip_with(F.col("embedding"), qlit,
                                 lambda a, b: a.cast("double") * b.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"), lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    qn = float(sum(float(x) * float(x) for x in qe)) ** 0.5
    cos = dot / (nrm * F.lit(qn))
    # ONE scan with an OR-of-band-equalities predicate (VERDICT r3 #5):
    # the candidate set is identical to the 16-way union of per-table
    # lookups, but the embeddings table is read once and no distinct
    # shuffle is needed (a row matches the predicate once, however many
    # tables agree). On the materialized path (ann.py) the same predicate
    # becomes a partition-pruned read of the (t, b)-partitioned table.
    cond = None
    for t in range(n_tables):
        c = F.col(f"b{t}") == int(q[f"b{t}"])
        cond = c if cond is None else (cond | c)
    cand = with_b.where(cond & (F.col("vec_id") != 0))
    return (cand.select("vec_id", cos.alias("_exact"))
                .orderBy(F.desc("_exact"), F.asc("vec_id")).limit(k)
                .select("vec_id", F.round("_exact", 6).alias("cosine")))


def dedup_embedding_pairs(spark, sf_dir, threshold: float = 0.3,
                          max_bucket: int = 1000):
    """Embedding-cosine near-dup PAIRS, bucketed (the 5th dedup modality
    next to exact/MinHash/SimHash/Jaccard): 8-hyperplane sign-LSH bucket
    per vector (integer-deterministic planes, DuckDB-mirrorable), candidate
    pairs ONLY via the bucket self equi-join (capped by max_bucket, never
    all-pairs), exact cosine verify >= threshold.

    Recall semantics [public: Charikar 2002 SimHash/random hyperplane]:
    per-plane agreement is 1 - theta/pi, so a TRUE duplicate (cos ~0.95)
    collides with p ~0.9^8 ~0.43 per table — production dedup runs L such
    tables (see ann_cosine_lsh_multi) to push recall to ~1; the fixture's
    moderate-similarity pairs are deliberately under-recalled by a single
    table. Precision is exact (cosine verify). Output: (vec_a, vec_b,
    cosine)."""
    emb = T(spark, sf_dir, "embeddings")
    first = emb.select("embedding").first()["embedding"]
    dim = len(first)

    def plane(p):
        return [((j + 1) * (p * 7 + 3) * 2654435761 % 1000 - 500) / 250.0
                for j in range(dim)]

    def dot_with(vals):
        lit = F.array(*[F.lit(v) for v in vals])
        return F.aggregate(
            F.zip_with(F.col("embedding"), lit,
                       lambda a, b: a.cast("double") * b.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x)

    bucket = sum([(F.when(dot_with(plane(p)) >= 0, 2 ** p).otherwise(0))
                  for p in range(8)], F.lit(0)).alias("bucket")
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"),
                    lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    eb = _cap_buckets(emb.select("vec_id", "embedding", bucket,
                                 nrm.alias("nrm")),
                      ["bucket"], max_bucket)
    a = eb.select(F.col("vec_id").alias("vec_a"),
                  F.col("embedding").alias("ea"),
                  F.col("nrm").alias("na"), "bucket")
    b = eb.select(F.col("vec_id").alias("vec_b"),
                  F.col("embedding").alias("eb"),
                  F.col("nrm").alias("nb"), "bucket")
    dot = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (F.col("na") * F.col("nb"))
    return (a.join(b, "bucket")
             .where(F.col("vec_a") < F.col("vec_b"))
             .select("vec_a", "vec_b", cos.alias("_c"))
             .where(F.col("_c") >= threshold)
             .select("vec_a", "vec_b", F.round("_c", 6).alias("cosine")))


BPE_PRETOKEN_RE = (r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+"
                   r"| ?[^a-z0-9\s']+")


def token_count_bpe(spark, sf_dir):
    """BPE-ish pre-token counting (GPT-2-style pretokenizer shape:
    contractions | space?+letters | space?+digits | space?+punct-run),
    RE2-compatible (no lookahead) so DuckDB counts identically. The
    'how many tokens is my corpus' query of every training-data budget."""
    d = T(spark, sf_dir, "documents")
    n = F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                    F.lit(BPE_PRETOKEN_RE), 0))
    return (d.select("doc_id", n.alias("n_bpe_tokens"))
             .groupBy((F.col("doc_id") % 10).alias("doc_mod"))
             .agg(F.count("*").alias("n_docs"),
                  F.sum("n_bpe_tokens").alias("total_tokens"),
                  F.max("n_bpe_tokens").cast("long").alias("max_tokens")))


FP_BASE, FP_MOD = 31, 2147483647  # Horner rolling hash, overflow-safe in i64


def fingerprint_rolling(spark, sf_dir):
    """Document fingerprinting via polynomial rolling hash (Karp-Rabin/
    Horner: fp = fold(acc*B + byte) mod p). Pure JVM higher-order functions
    — aggregate over the char-code sequence — so DuckDB's list_reduce
    agrees exactly. acc*31+255 < 2^36 keeps ANSI long arithmetic safe."""
    d = T(spark, sf_dir, "documents")
    codes = F.transform(
        F.sequence(F.lit(1), F.length(F.col("text"))),
        lambda i: F.ascii(F.substring(F.col("text"), i, 1)).cast("long"))
    fp = F.aggregate(codes, F.lit(0).cast("long"),
                     lambda acc, x: (acc * FP_BASE + x) % FP_MOD)
    fp = F.when(F.length(F.col("text")) > 0, fp).otherwise(F.lit(0).cast("long"))
    return d.select("doc_id", fp.alias("fp_roll"))


def median_udaf(spark, sf_dir):
    """GROUPED_AGG pandas UDAF surface (G4): exact per-group median via a
    vectorized pandas aggregation (pandas interpolated median == SQL
    median/quantile_cont)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pd_median(v: pd.Series) -> float:
        return float(v.median())

    e = T(spark, sf_dir, "events")
    return (e.groupBy("event_type")
             .agg(F.round(pd_median("value"), 4).alias("median_value")))


def zscore_grouped(spark, sf_dir):
    """Grouped-map UDF surface (G3, applyInPandas): per-source z-score of
    n_chars — each group arrives as one pandas DataFrame (the normalize-
    within-group pattern every feature pipeline needs). Sums of small ints
    are exact in float64, so mean/std match DuckDB's window aggregates
    bitwise; round(4) guards the division."""
    d = T(spark, sf_dir, "documents")

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].astype("float64")
        mu = x.mean()
        sd = x.std(ddof=1)  # sample stddev == SQL stddev_samp
        z = (x - mu) / sd if sd > 0 else x * 0.0
        return pd.DataFrame({"doc_id": pdf["doc_id"],
                             "source": pdf["source"],
                             "z_chars": z})

    out = (d.select("doc_id", "source", "n_chars")
            .groupBy("source")
            .applyInPandas(norm, "doc_id long, source string, z_chars double"))
    # round JVM-side: Spark/DuckDB round half-away-from-zero, while pandas
    # .round is half-to-even — rounding here keeps the oracle hash-exact
    return out.select("doc_id", "source",
                      F.round("z_chars", 4).alias("z_chars"))


def asof_join(spark, sf_dir):
    """As-of join (SURVEY.md §2.E flagged this absent in the reference):
    for every 'error' event, the most recent prior 'view' ts by the same
    user. Implemented as the scale-safe windowed formulation — one sort per
    user partition, no O(n*m) range join: running last_value(view ts,
    ignore nulls) over (user, ts, event_id) order."""
    e = T(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    last_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    return (e.withColumn("asof_view_ts", last_view)
             .where(F.col("event_type") == "error")
             .select("event_id", "user_id",
                     F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
                     F.date_format("asof_view_ts", "yyyy-MM-dd HH:mm:ss")
                      .alias("asof_view_ts")))
