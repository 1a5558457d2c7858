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

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.storagelevel import StorageLevel

from parser_indexer_spark.analyze import tokenize_series


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _rr(df: DataFrame, probe: DataFrame | None = None) -> DataFrame:
    """Scale-adaptive parallelism floor for compute-heavy per-row operators
    (guide §2.2/§6): the testdata tables are single-row-group parquet files,
    which CANNOT be split below one scan task no matter what
    maxPartitionBytes says — so at bench scale every text/vector operator
    otherwise runs its whole compute on ONE core. Round-robin repartition to
    the session's default parallelism ONLY when the scan has fewer
    partitions; at real scale the scan already has more splits than cores
    and this no-ops (the bytes moved here are the pruned input columns,
    megabytes — the compute they feed is seconds per core).

    ``probe``: optional CHEAP-plan stand-in whose partition count equals
    ``df``'s — `.rdd.getNumPartitions()` forces full physical planning +
    codegen of df's plan at CONSTRUCTION time (measured 9s on the near-dup
    join pipeline, recompiled again at execution); probing the raw scan a
    broadcast join preserves the partitioning of costs ~0.1s."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if (probe if probe is not None else df).rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


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

    d = _rr(T(spark, sf_dir, "documents").select("text"))  # r6: 1-RG scan
    return (d.select(F.explode(tok(F.col("text"))).alias("term"))
             .groupBy("term").agg(F.count("*").alias("n_occurrences")))


def date_trunc_agg(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (e.groupBy(F.date_format(F.date_trunc("hour", F.col("ts")),
                                    "yyyy-MM-dd HH").alias("hour"))
             .agg(F.count("*").alias("n")))


def array_explode_tf(spark, sf_dir):
    """tf per (doc_id, term). r6: every row of an output group comes from
    ONE input document row, so the corpus-wide groupBy shuffle is
    unnecessary — the counts are computed doc-locally in one Arrow/numpy
    pass (factorize + lexsort + run-length, the same pattern as the build
    path's fused tokenize stage) and emitted directly: zero Exchange.
    Output rows identical to split/explode/groupBy-count (the DuckDB
    oracle still computes that form)."""
    d = T(spark, sf_dir, "documents")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            t, parents, _ = _relops_flat_tokens(pdf["text"])
            if t.size == 0:
                continue
            codes, uniq = pd.factorize(t)
            order = np.lexsort((codes, parents))
            p_s, c_s = parents[order], codes[order]
            cut = np.empty(t.size, dtype=bool)
            cut[0] = True
            cut[1:] = (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])
            starts = np.flatnonzero(cut)
            tf = np.diff(np.append(starts, t.size))
            yield pd.DataFrame({
                "doc_id": doc_ids[p_s[starts]],
                "term": np.asarray(uniq, dtype=object)[c_s[starts]],
                "tf": tf.astype(np.int64),
            })

    return _rr(d.select("doc_id", "text")) \
        .mapInPandas(gen, "doc_id long, term string, tf long")


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


def _relops_flat_tokens(texts: pd.Series):
    """lower + split on [^a-z0-9]+ (the relops/oracle tokenizer — NOT the
    index analyzer) via Arrow kernels; returns (flat object ndarray of
    tokens, parent row indices int64, per-row token counts int64). Mirrors
    F.filter(F.split(F.lower(text), '[^a-z0-9]+'), x -> x != '') exactly:
    same split pattern, empties dropped, null text -> zero tokens."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts, type=pa.string())
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), r"[^a-z0-9]+")
    lengths = pc.fill_null(pc.list_value_length(toks), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    parents = np.repeat(np.arange(len(toks), dtype=np.int64), lengths)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
    flat = flat.filter(keep)
    parents = parents[keep_np]
    counts = np.bincount(parents, minlength=len(toks)).astype(np.int64)
    return flat.to_numpy(zero_copy_only=False), parents, counts


def _minhash_sigs_np(d: DataFrame, n_hashes: int, with_size: bool = False,
                     n_bands: int = 0,
                     explode_bands: bool = False) -> DataFrame:
    """(doc_id, sig0..sig{n-1}[, n_sh]) — MinHash signatures over token
    3-shingles in ONE Arrow/numpy pass (guide §4.2: batch work to native
    kernels instead of interpreted JVM HOF chains; the prior expression
    tree measured ~20us/shingle in HOF md5 evaluation, and its
    split()-inside-lambda re-evaluated the tokenizer PER ELEMENT —
    O(L^2)/doc). Semantics are bit-identical to
    min(md5('s{i}:' || shingle)): md5 here is libc hashlib over the same
    UTF-8 bytes, min is the same lexicographic order on the hex digests,
    shingles are deduped per batch (min is unaffected by duplicates), and
    docs with < 3 tokens emit no row. ``with_size`` adds n_sh = the
    DISTINCT shingle count per doc (what exact-Jaccard needs).
    ``n_bands`` > 0 additionally emits bh0..bh{n_bands-1} — the LSH band
    hashes md5(sig_{b*r} || '|' || ... ) — in the same pass, so the band
    join consumes plain columns instead of a JVM md5-expression stage.
    ``explode_bands`` instead emits n_bands NARROW rows per doc
    (doc_id[, n_sh], band, bh) straight from the kernel: the candidate
    pipeline then carries no unused signature columns (r6: the wide
    cached relation + band-struct explode dominated the generated-code
    volume of the near-dup plan)."""
    import hashlib

    prefixes = [f"s{i}:".encode("utf-8") for i in range(n_hashes)]
    rows_per = n_hashes // n_bands if n_bands else 0
    if explode_bands:
        assert n_bands > 0
        schema = "doc_id long" + (", n_sh int" if with_size else "") + \
            ", band int, bh string"
    else:
        schema = "doc_id long, " + \
            ", ".join(f"sig{i} string" for i in range(n_hashes))
        if with_size:
            schema += ", n_sh int"
        if n_bands:
            schema += ", " + \
                ", ".join(f"bh{b} string" for b in range(n_bands))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            t, parents, _ = _relops_flat_tokens(pdf["text"])
            if t.size >= 3:
                valid = parents[:-2] == parents[2:]
                sh = (t[:-2] + " " + t[1:-1] + " " + t[2:])[valid]
                par = parents[:-2][valid]
            else:
                sh = np.empty(0, dtype=object)
                par = np.empty(0, dtype=np.int64)
            if sh.size == 0:
                continue
            # (doc, shingle) -> distinct, then md5 only the batch-unique
            # shingles (synthetic corpora repeat shingles heavily)
            codes, uniq = pd.factorize(sh)
            pair = pd.DataFrame({"_p": par, "_c": codes}).drop_duplicates()
            H = [np.fromiter(
                    (md5(p + u.encode("utf-8")).hexdigest() for u in uniq),
                    dtype=object, count=len(uniq)) for p in prefixes]
            cols = {"_p": pair["_p"].to_numpy()}
            cc = pair["_c"].to_numpy()
            for i in range(n_hashes):
                cols[f"sig{i}"] = H[i][cc]
            g = pd.DataFrame(cols).groupby("_p", sort=True)
            mins = g.min()
            sig_arrs = [mins[f"sig{i}"].to_numpy()
                        for i in range(n_hashes)]
            bh_arrs = []
            for b in range(n_bands):
                joined = sig_arrs[b * rows_per]
                for r in range(1, rows_per):
                    joined = joined + "|" + sig_arrs[b * rows_per + r]
                bh_arrs.append(np.fromiter(
                    (md5(x.encode("utf-8")).hexdigest() for x in joined),
                    dtype=object, count=len(joined)))
            ids = doc_ids[mins.index.to_numpy()]
            nsh = g.size().to_numpy().astype(np.int32) if with_size \
                else None
            if explode_bands:
                nd = len(ids)
                out = {"doc_id": np.tile(ids, n_bands)}
                if with_size:
                    out["n_sh"] = np.tile(nsh, n_bands)
                out["band"] = np.repeat(
                    np.arange(n_bands, dtype=np.int32), nd)
                out["bh"] = np.concatenate(bh_arrs)
            else:
                out = {"doc_id": ids}
                for i in range(n_hashes):
                    out[f"sig{i}"] = sig_arrs[i]
                if with_size:
                    out["n_sh"] = nsh
                for b in range(n_bands):
                    out[f"bh{b}"] = bh_arrs[b]
            yield pd.DataFrame(out)

    return _rr(d.select("doc_id", "text")).mapInPandas(gen, schema)


def minhash_signature(spark, sf_dir):
    """MinHash over token 3-shingles, 4 hash families (md5-seeded) — the
    signature stage of MinHash-LSH near-dup detection, verifiable in SQL.
    r6: computed by the Arrow/numpy kernel (_minhash_sigs_np) — same
    output bit-for-bit, the DuckDB oracle still computes the explode +
    groupBy min form so the two algorithms cross-check."""
    return _minhash_sigs_np(T(spark, sf_dir, "documents"), 4)


def _shingle_rows_np(d: DataFrame,
                     probe: DataFrame | None = None) -> DataFrame:
    """DISTINCT (doc_id, shingle) rows over token 3-shingles — the set view
    exact-Jaccard verification joins on. Same Arrow/numpy kernel as
    _minhash_sigs_np (shared tokenizer, per-batch dedup), no corpus-wide
    distinct shuffle: the (doc, shingle) pairs of one doc all come from one
    input row, so dedup is batch-local."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            t, parents, _ = _relops_flat_tokens(pdf["text"])
            if t.size < 3:
                continue
            valid = parents[:-2] == parents[2:]
            sh = (t[:-2] + " " + t[1:-1] + " " + t[2:])[valid]
            par = parents[:-2][valid]
            if sh.size == 0:
                continue
            yield pd.DataFrame({"doc_id": doc_ids[par],
                                "shingle": sh}).drop_duplicates()

    return _rr(d.select("doc_id", "text"), probe=probe) \
        .mapInPandas(gen, "doc_id long, shingle string")


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


def _minhash_band_rows_np(d: DataFrame, n_hashes: int, n_bands: int,
                          with_size: bool = False) -> DataFrame:
    """(doc_id[, n_sh], band, bh) — the LSH band rows EXPLODED inside the
    signature kernel (n_bands rows per doc emitted from Python), so the
    candidate pipeline consumes a 3-4 column table with no JVM explode
    stage and no unused signature columns in the cached relation (r6:
    the wide 13-column cache + band-struct explode dominated the plan's
    generated-code volume)."""
    return _minhash_sigs_np(d, n_hashes, with_size=with_size,
                            n_bands=n_bands, explode_bands=True)


def _minhash_bands(d: DataFrame, n_hashes: int, n_bands: int) -> DataFrame:
    return _minhash_band_rows_np(d, n_hashes, n_bands)


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
    The DuckDB oracle mirrors the cap exactly.

    r6 plan shape (guide §1.2 step 1 — remove recomputation before tuning
    per-task work): the old plan evaluated the full-corpus shingle subtree
    FOUR times (bands, sizes, and both verification legs). Now ONE
    Arrow/numpy pass computes signatures AND distinct-shingle sizes
    (_minhash_sigs_np with_size=True), persisted (tiny: n_docs x 9 cols)
    so banding/cap/candidates/sizes all reuse it; the exact-Jaccard
    verification re-shingles ONLY candidate docs (broadcast semi-join
    pushed below the shingle projection), not the whole corpus."""
    band_rows = _minhash_band_rows_np(d, n_hashes, n_bands,
                                      with_size=True) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    bands = _cap_buckets(band_rows, ["band", "bh"], max_bucket)
    # n_sh rides along on the band rows, so the Jaccard denominator needs
    # no re-join against the size table afterwards (2 fewer join stages)
    ba = bands.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("na"), "band", "bh")
    bb = bands.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("nb"), "band", "bh")
    cand = (ba.join(bb, ["band", "bh"])
              .where(F.col("doc_a") < F.col("doc_b"))
              .select("doc_a", "doc_b", "na", "nb").distinct()) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    cdocs = (cand.select(F.col("doc_a").alias("doc_id"))
                 .union(cand.select(F.col("doc_b").alias("doc_id")))
                 .distinct())
    # probe=d: the broadcast semi-join preserves the scan's partitioning,
    # and probing the joined plan itself would compile the whole candidate
    # pipeline at construction time (see _rr docstring)
    sh = _shingle_rows_np(d.join(F.broadcast(cdocs), "doc_id", "left_semi"),
                          probe=d) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (cand.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
                 .groupBy("doc_a", "doc_b", "na", "nb")
                 .agg(F.count("*").alias("n_inter")))
    jac = F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (inter
            .where(jac >= threshold)
            .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard")))


def dedup_near_pairs(spark, sf_dir):
    """Near-dup pairs over the documents table (queries() entry)."""
    return near_dup_pairs(T(spark, sf_dir, "documents"))


def _lsh_plane(p: int, dim: int) -> list:
    """Deterministic pseudo-random hyperplane from EXACT integer arithmetic
    (identical doubles in DuckDB — libm cos() may differ in the last ulp
    and flip a sign bit at the bucket boundary)."""
    return [((j + 1) * (p * 7 + 3) * 2654435761 % 1000 - 500) / 250.0
            for j in range(dim)]


def _py_fold_dot(vec, plane) -> float:
    """Driver-side plane dot with the SAME left-fold order as the JVM
    aggregate(zip_with(...)) expression — bitwise-identical doubles."""
    acc = 0.0
    for x, p in zip(vec, plane):
        acc += float(x) * float(p)
    return acc


def _emb_lsh_np(emb: DataFrame, planes: np.ndarray, group_sizes: list,
                names: list, qe) -> DataFrame:
    """(vec_id, <bucket cols>, _exact) in ONE Arrow/numpy pass (r6, guide
    §4.2). Replaces per-row interpreted zip_with/aggregate folds (one per
    hyperplane + cosine, ~50 passes/row for the 16-table variant) with a
    column-wise accumulation loop: acc += E[:, j] * p[j] performs, for
    every row lane independently, EXACTLY the JVM fold's addition sequence
    — results are bitwise-identical doubles, so bucket sign bits and
    cosine ranks cannot diverge. Bucket col g = sum of 2^i over planes i
    of its group with dot >= 0 (same when/otherwise integer build)."""
    qn = float(sum(float(x) * float(x) for x in qe)) ** 0.5
    qarr = np.array([float(x) for x in qe], dtype=np.float64)
    schema = "vec_id long, " + \
        "".join(f"{b} int, " for b in names) + "_exact double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf["embedding"].to_numpy())
            n, dim = E.shape
            npl = planes.shape[1] if planes.size else 0
            D = np.zeros((n, npl), dtype=np.float64)
            dot = np.zeros(n, dtype=np.float64)
            ss = np.zeros(n, dtype=np.float64)
            for j in range(dim):
                c = E[:, j].astype(np.float64)
                if npl:
                    D += c[:, None] * planes[j][None, :]
                dot += c * qarr[j]
                ss += c * c
            cos = dot / (np.sqrt(ss) * qn)
            out = {"vec_id": pdf["vec_id"].to_numpy(np.int64)}
            off = 0
            for name, gs in zip(names, group_sizes):
                b = np.zeros(n, dtype=np.int64)
                for i in range(gs):
                    b |= (D[:, off + i] >= 0).astype(np.int64) << i
                out[name] = b.astype(np.int32)
                off += gs
            out["_exact"] = cos
            yield pd.DataFrame(out)

    return _rr(emb.select("vec_id", "embedding")).mapInPandas(gen, schema)


def ann_cosine(spark, sf_dir):
    """Brute-force cosine top-20 neighbours of vec_id=0 over embeddings —
    the exact baseline for ANN (r6: numpy kernel, bitwise-identical fold)."""
    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")).first()["q_emb"]
    sc = _emb_lsh_np(emb, np.empty((len(q), 0)), [], [], q)
    return (sc.where(F.col("vec_id") != 0)
              .select("vec_id", "_exact")
              .orderBy(F.desc("_exact"), F.asc("vec_id")).limit(20)
              .select("vec_id", F.round("_exact", 6).alias("cosine")))


# ------------------------------------ text analysis (training-data ops) ---

_STOPWORDS = ("the a of and to in is on for with as by at from or an be "
              "this that it").split()


def quality_score(spark, sf_dir):
    """Document quality heuristics: token count, mean token length,
    stopword ratio, digit ratio — pure JVM expressions, fully
    SQL-expressible (training-data pipeline quality gate)."""
    d = _rr(T(spark, sf_dir, "documents")
            .select("doc_id", "n_chars", "text"))  # r6: 1-RG scan floor
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
    d = _rr(T(spark, sf_dir, "documents")
            .select("source", "text"))  # r6: 1-RG scan floor
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
    column mostly exercises the machinery: CASE/array ops, argmax.)
    r6: _rr parallelism floor only — the 3x size(filter(...)) passes are
    cheap enough once they are not single-task."""
    markers = {
        "en": ["the", "fast", "small"],
        "es": ["agg", "data", "dup"],
        "de": ["hash", "window", "stream"],
    }
    d = _rr(T(spark, sf_dir, "documents").select("doc_id", "text"))
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


def lang_trigram_np(d: DataFrame) -> DataFrame:
    """r6 Arrow/numpy execution of lang_trigram_df (guide §4.2): ONE
    mapInPandas pass — utf8_lower (Arrow kernel), all docs of a batch
    concatenated and decoded to UTF-32 so 3-codepoint windows are EXACTLY
    the JVM substr(i, 3) trigrams, window codes packed into uint64
    (3 x 21 bits), np.isin against the ~160 packed profile codes, distinct
    (doc, trigram) via np.unique (the array_intersect dedup), weight
    lookup by searchsorted, np.add.at score accumulation, np.select
    argmax with the same sequential tie-break. Replaces a plan that
    generated one JVM string allocation per character of every document
    (transform + substr + array_intersect + explode + broadcast join +
    4-column groupBy) with three numpy passes; output is bit-identical
    (integer weights, same dedup, same tie-break; null-text docs are
    absent in both)."""
    langs = sorted(_TRIGRAM_PROFILES)
    rows = [r for r in _langid_profile_rows() if r[0] != _LANGID_SENTINEL]

    def pack(tri: str) -> int:
        cs = [ord(c) for c in tri]
        return (cs[0] << 42) | (cs[1] << 21) | cs[2]

    prof = sorted((pack(tri), ws) for tri, *ws in rows)
    prof_codes = np.array([c for c, _ in prof], dtype=np.uint64)
    prof_w = np.array([w for _, w in prof], dtype=np.int64)  # (160, 4)

    schema = ("doc_id long, " +
              ", ".join(f"score_{lg} int" for lg in langs) +
              ", lang_id string")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.compute as pc
        for pdf in batches:
            if pdf.empty:
                continue
            low = pc.utf8_lower(pa.array(pdf["text"], type=pa.string()))
            texts = low.to_pylist()
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            # null text stays in the output with all-zero scores — the JVM
            # twin's greatest(length(NULL)-2, 1) keeps the row alive (its
            # single NULL window matches nothing, the sentinel scores 0)
            padded = ["" if t is None else " " + t + " " for t in texts]
            lens = np.array([len(p) for p in padded], dtype=np.int64)
            buf = np.frombuffer("".join(padded).encode("utf-32-le"),
                                dtype="<u4").astype(np.uint64)
            n = len(texts)
            scores = np.zeros((n, len(langs)), dtype=np.int64)
            if buf.size >= 3:
                doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
                valid = doc_of[:-2] == doc_of[2:]
                codes = ((buf[:-2] << np.uint64(42)) |
                         (buf[1:-1] << np.uint64(21)) | buf[2:])[valid]
                docs_w = doc_of[:-2][valid]
                hit = np.isin(codes, prof_codes)
                if hit.any():
                    hc, hd = codes[hit], docs_w[hit]
                    # distinct (doc, trigram) — array_intersect dedups
                    order = np.lexsort((hc, hd))
                    hc, hd = hc[order], hd[order]
                    keep = np.empty(hc.size, dtype=bool)
                    keep[0] = True
                    keep[1:] = (hc[1:] != hc[:-1]) | (hd[1:] != hd[:-1])
                    hc, hd = hc[keep], hd[keep]
                    widx = np.searchsorted(prof_codes, hc)
                    np.add.at(scores, hd, prof_w[widx])
            out = {"doc_id": doc_ids}
            for j, lg in enumerate(langs):
                out[f"score_{lg}"] = scores[:, j].astype(np.int32)
            s = [scores[:, j] for j in range(len(langs))]
            conds = [np.logical_and.reduce(
                        [s[i] >= s[j] for j in range(i + 1, len(langs))])
                     for i in range(len(langs) - 1)]
            out["lang_id"] = np.select(conds, langs[:-1], default=langs[-1])
            yield pd.DataFrame(out)

    return _rr(d.select("doc_id", "text")).mapInPandas(gen, schema)


def lang_trigram(spark, sf_dir):
    return lang_trigram_np(T(spark, sf_dir, "documents"))


def _simhash_np(d: DataFrame, n_bits_per_band: int, n_bands: int,
                out_cols: list) -> DataFrame:
    """Shared SimHash kernel (r6, guide §4.2): per doc, bit i of band j =
    majority over token OCCURRENCES of bit i of the md5-hex nibble window
    [4j, 4j+4) (or [0, 2) for the 8-bit variant). One Arrow/numpy pass:
    tokenize via Arrow kernels, md5 only the batch-unique tokens
    (synthetic vocab repeats heavily), per-unique bit matrix, per-doc bit
    sums via np.add.reduceat over the doc-contiguous token stream,
    majority threshold 2*sum > n. Replaces a 65-aggregate explode/groupBy
    whose interpreted bit-extraction expressions evaluated 64 divisions
    per token occurrence. Identical output: same md5 nibbles, same
    integer majority rule, docs with zero tokens absent in both."""
    import hashlib

    hex_lo = 2 if n_bits_per_band == 8 else 4   # hex chars per band window
    schema = "doc_id long, " + ", ".join(f"{c} int" for c in out_cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            t, parents, counts = _relops_flat_tokens(pdf["text"])
            if t.size == 0:
                continue
            codes, uniq = pd.factorize(t)
            # per-unique-token band values from the md5 hex digest
            hv = np.empty((len(uniq), n_bands), dtype=np.int64)
            for u_i, u in enumerate(uniq):
                h = md5(u.encode("utf-8")).hexdigest()
                for j in range(n_bands):
                    hv[u_i, j] = int(h[hex_lo * j:hex_lo * j + hex_lo], 16)
            # per-unique bit matrix (n_uniq, n_bands*n_bits) uint8
            bits = np.empty((len(uniq), n_bands * n_bits_per_band),
                            dtype=np.uint8)
            for j in range(n_bands):
                for i in range(n_bits_per_band):
                    bits[:, j * n_bits_per_band + i] = \
                        (hv[:, j] >> i) & 1
            live = counts > 0
            starts = np.concatenate(
                ([0], np.cumsum(counts)[:-1]))[live].astype(np.int64)
            sums = np.add.reduceat(bits[codes].astype(np.int32), starts,
                                   axis=0)
            n_tok = counts[live][:, None]
            maj = (sums * 2 > n_tok)
            out = {"doc_id": doc_ids[live]}
            for j in range(n_bands):
                w = maj[:, j * n_bits_per_band:(j + 1) * n_bits_per_band]
                vals = (w * (1 << np.arange(n_bits_per_band,
                                            dtype=np.int64))).sum(axis=1)
                out[out_cols[j]] = vals.astype(np.int32)
            yield pd.DataFrame(out)

    return _rr(d.select("doc_id", "text")).mapInPandas(gen, schema)


def simhash8(spark, sf_dir):
    """8-bit SimHash fingerprint: per doc, bit i = majority over tokens of
    bit i of md5(token). Cross-engine deterministic because md5 is; the
    LSH-style near-dup grouping key for fuzzy dedup. (r6: numpy kernel,
    _simhash_np — the DuckDB oracle still computes the explode/groupBy
    form so the algorithms cross-check.)"""
    return _simhash_np(T(spark, sf_dir, "documents"), 8, 1, ["simhash8"])


def simhash64_df(d: DataFrame) -> DataFrame:
    """64-bit SimHash as four 16-bit bands (sh0..sh3): bit i of band j =
    majority over tokens of bit i of md5(token) hex nibbles [4j, 4j+4).
    Band representation doubles as the Hamming-ball LSH probe table:
    near-identical docs agree on most bits, so at least one 16-bit band
    collides with high probability (probed by simhash_band_candidates).
    64-bit upgrade of simhash8 (VERDICT r1 #9); md5 keeps DuckDB agreeing.
    r6: executed by the shared numpy kernel (_simhash_np)."""
    return _simhash_np(d, 16, 4, [f"sh{j}" for j in range(4)])


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
    qe = emb.where(F.col("vec_id") == 0) \
            .select("embedding").first()["embedding"]
    dim = len(qe)
    planes = np.array([_lsh_plane(p, dim) for p in range(4)]).T  # (dim, 4)
    # query bucket driver-side: same integer planes, same fold order as
    # the kernel — no extra full-table job just to read one row's bucket
    qbucket = sum((1 << p) for p in range(4)
                  if _py_fold_dot(qe, planes[:, p]) >= 0)
    buckets = [qbucket]
    if probe:
        buckets += [qbucket ^ (1 << p) for p in range(4)]
    sc = _emb_lsh_np(emb, planes, [4], ["bucket"], qe)
    return (sc.where(F.col("bucket").isin(buckets)
                     & (F.col("vec_id") != 0))
            .select("vec_id", "_exact")
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
    qe = emb.where(F.col("vec_id") == 0) \
            .select("embedding").first()["embedding"]
    dim = len(qe)
    planes = np.array([_lsh_plane(p, dim)
                       for p in range(n_tables * n_planes)]).T
    qb = [sum((1 << i) for i in range(n_planes)
              if _py_fold_dot(qe, planes[:, t * n_planes + i]) >= 0)
          for t in range(n_tables)]
    # ONE scan with an OR-of-band-equalities predicate (VERDICT r3 #5):
    # the candidate set is identical to the 16-way union of per-table
    # lookups, but the embeddings table is read once and no distinct
    # shuffle is needed (a row matches the predicate once, however many
    # tables agree). On the materialized path (ann.py) the same predicate
    # becomes a partition-pruned read of the (t, b)-partitioned table.
    # r6: all 48 plane dots + the cosine come from the single numpy
    # kernel pass instead of ~50 interpreted folds per row.
    sc = _emb_lsh_np(emb, planes, [n_planes] * n_tables,
                     [f"b{t}" for t in range(n_tables)], qe)
    cond = None
    for t in range(n_tables):
        c = F.col(f"b{t}") == int(qb[t])
        cond = c if cond is None else (cond | c)
    cand = sc.where(cond & (F.col("vec_id") != 0))
    return (cand.select("vec_id", "_exact")
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
    planes = np.array([_lsh_plane(p, dim) for p in range(8)]).T  # (dim, 8)
    etype = emb.schema["embedding"].dataType.simpleString()

    # r6: bucket sign bits + the row norm from one numpy kernel pass
    # (same bitwise-exact column fold as _emb_lsh_np), embedding carried
    # through; the pair cosine after the bucket join is a second
    # vectorized pass instead of an interpreted 64-element fold per pair.
    def with_bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf["embedding"].to_numpy())
            n = E.shape[0]
            D = np.zeros((n, 8), dtype=np.float64)
            ss = np.zeros(n, dtype=np.float64)
            for j in range(dim):
                c = E[:, j].astype(np.float64)
                D += c[:, None] * planes[j][None, :]
                ss += c * c
            b = np.zeros(n, dtype=np.int64)
            for i in range(8):
                b |= (D[:, i] >= 0).astype(np.int64) << i
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(np.int64),
                "embedding": pdf["embedding"],
                "bucket": b.astype(np.int32),
                "nrm": np.sqrt(ss)})

    eb = _cap_buckets(
        _rr(emb.select("vec_id", "embedding")).mapInPandas(
            with_bucket,
            f"vec_id long, embedding {etype}, bucket int, nrm double"),
        ["bucket"], max_bucket)
    a = eb.select(F.col("vec_id").alias("vec_a"),
                  F.col("embedding").alias("ea"),
                  F.col("nrm").alias("na"), "bucket")
    b = eb.select(F.col("vec_id").alias("vec_b"),
                  F.col("embedding").alias("eb"),
                  F.col("nrm").alias("nb"), "bucket")

    def pair_cos(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            EA = np.stack(pdf["ea"].to_numpy())
            EB = np.stack(pdf["eb"].to_numpy())
            dot = np.zeros(EA.shape[0], dtype=np.float64)
            for j in range(dim):
                dot += EA[:, j].astype(np.float64) * \
                    EB[:, j].astype(np.float64)
            cos = dot / (pdf["na"].to_numpy() * pdf["nb"].to_numpy())
            yield pd.DataFrame({"vec_a": pdf["vec_a"].to_numpy(np.int64),
                                "vec_b": pdf["vec_b"].to_numpy(np.int64),
                                "_c": cos})

    pairs = (a.join(b, "bucket")
              .where(F.col("vec_a") < F.col("vec_b"))
              .select("vec_a", "vec_b", "ea", "eb", "na", "nb"))
    return (pairs.mapInPandas(pair_cos, "vec_a long, vec_b long, _c double")
                 .where(F.col("_c") >= threshold)
                 .select("vec_a", "vec_b", F.round("_c", 6).alias("cosine")))


BPE_PRETOKEN_RE = (r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+"
                   r"| ?[^a-z0-9\s']+")


def token_count_bpe(spark, sf_dir):
    """BPE-ish pre-token counting (GPT-2-style pretokenizer shape:
    contractions | space?+letters | space?+digits | space?+punct-run),
    RE2-compatible (no lookahead) so DuckDB counts identically. The
    'how many tokens is my corpus' query of every training-data budget."""
    d = _rr(T(spark, sf_dir, "documents")
            .select("doc_id", "text"))  # r6: 1-RG scan floor
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
    Horner: fp = fold(acc*B + code) mod p), matching DuckDB's list_reduce
    exactly. r6: the fold runs in the Python worker (guide §4.2) — integer
    arithmetic is exact in both engines, the per-character JVM expression
    tree (substring + ascii + lambda per char) was the cost, not the math.
    ord(ch) == F.ascii(ch) for every code point; empty/null text -> 0 as
    before (the JVM form guarded sequence(1, 0) with a when())."""
    d = T(spark, sf_dir, "documents")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            fps = np.empty(len(pdf), dtype=np.int64)
            for i, t in enumerate(pdf["text"]):
                acc = 0
                if isinstance(t, str):
                    for ch in t:
                        acc = (acc * FP_BASE + ord(ch)) % FP_MOD
                fps[i] = acc
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "fp_roll": fps})

    return _rr(d.select("doc_id", "text")) \
        .mapInPandas(gen, "doc_id long, fp_roll long")


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
