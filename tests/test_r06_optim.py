"""Round-6 optimization equivalence tests: every operator whose internals
moved from JVM expression trees to Arrow/numpy kernels must produce
BIT-IDENTICAL output to the original formulation — on an edge corpus the
sf testdata does not cover (unicode, empty/null text, <3 tokens, repeated
shingles). The DuckDB oracle comparisons (test_entry.py) cover the driver
data; these pin the kernel↔JVM equivalence itself."""

import numpy as np
import pandas as pd
import pytest
import pyspark.sql.functions as F

from parser_indexer_spark import relops

EDGE_DOCS = [
    (0, ""),
    (1, None),
    (2, "ab"),                                  # 1 token
    (3, "a b c"),                               # exactly 3 tokens
    (4, "x y x y x y"),                         # repeated shingles
    (5, "The QUICK brown-fox; jumps_over 42 lazy dogs!"),
    (6, "ПРИВЕТ мир 123 éta ión x y z"),        # unicode + accents
    (7, "spark " * 50 + "join shuffle hash agg window sort"),
    (8, "a1 b2 c3 d4 e5 f6 g7 h8 i9 j0"),
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(EDGE_DOCS, columns=["doc_id", "text"])
        .astype({"doc_id": "int64"}), "doc_id long, text string")


def _norm(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _tokens():
    return F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                    lambda x: x != "")


def test_minhash_kernel_equals_jvm(edge_df):
    """_minhash_sigs_np == the original explode + groupBy(min(md5)) plan."""
    tokens = _tokens()
    sh = edge_df.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.size(tokens) - 3),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, 3)),
        )).alias("shingle")).where(F.size(tokens) >= 3)
    jvm = sh.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat(F.lit(f"s{i}:"), F.col("shingle"))))
         .alias(f"sig{i}") for i in range(4)])
    got = _norm(relops._minhash_sigs_np(edge_df, 4))
    exp = _norm(jvm)
    pd.testing.assert_frame_equal(got, exp)


def test_minhash_kernel_sizes(edge_df):
    """n_sh == DISTINCT shingle count per doc (the Jaccard denominator)."""
    tokens = _tokens()
    sh = edge_df.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.size(tokens) - 3),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, 3)),
        )).alias("shingle")).where(F.size(tokens) >= 3).distinct()
    exp = _norm(sh.groupBy("doc_id").agg(F.count("*").alias("n_sh")))
    got = _norm(relops._minhash_sigs_np(edge_df, 1, with_size=True)
                .select("doc_id", "n_sh"))
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_sh"].tolist() == exp["n_sh"].tolist()


def test_simhash_kernel_equals_jvm(edge_df):
    """_simhash_np == the original 65-aggregate explode/groupBy plan."""
    tokens = _tokens()
    e = edge_df.select("doc_id", F.explode(tokens).alias("term"))
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
    exp = _norm(g.select("doc_id", *sigs))
    got = _norm(relops.simhash64_df(edge_df))
    pd.testing.assert_frame_equal(got, exp)


def test_lang_trigram_kernel_equals_jvm(edge_df):
    """lang_trigram_np == lang_trigram_df (the retained JVM twin) on
    unicode/empty/null edge docs AND real multilingual sentences."""
    got = _norm(relops.lang_trigram_np(edge_df))
    exp = _norm(relops.lang_trigram_df(edge_df))
    pd.testing.assert_frame_equal(got, exp)


def test_lang_trigram_kernel_real_sentences(spark):
    sents = [
        (0, "the quick brown fox jumps over the lazy dog and runs away"),
        (1, "der schnelle braune Fuchs springt über den faulen Hund und"),
        (2, "el rápido zorro marrón salta sobre el perro perezoso según"),
        (3, "le renard brun rapide saute par dessus le chien paresseux"),
    ]
    d = spark.createDataFrame(pd.DataFrame(sents,
                                           columns=["doc_id", "text"]))
    got = _norm(relops.lang_trigram_np(d))
    exp = _norm(relops.lang_trigram_df(d))
    pd.testing.assert_frame_equal(got, exp)
    assert got.sort_values("doc_id")["lang_id"].tolist() == \
        ["en", "de", "es", "fr"]


def test_fingerprint_kernel_equals_jvm(edge_df):
    """python Horner fold == the original JVM aggregate over char codes."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(F.col("text"))),
        lambda i: F.ascii(F.substring(F.col("text"), i, 1)).cast("long"))
    fp = F.aggregate(codes, F.lit(0).cast("long"),
                     lambda acc, x: (acc * relops.FP_BASE + x)
                     % relops.FP_MOD)
    fp = F.when(F.length(F.col("text")) > 0, fp) \
          .otherwise(F.lit(0).cast("long"))
    exp = _norm(edge_df.select("doc_id", fp.alias("fp_roll")))
    got = _norm(_fp_np(edge_df))
    pd.testing.assert_frame_equal(got, exp)


def _fp_np(d):
    """The r6 fingerprint kernel applied to an arbitrary DataFrame (the
    public entry reads from sf_dir; the kernel logic is what we pin —
    body identical to relops.fingerprint_rolling's)."""

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            fps = np.empty(len(pdf), dtype=np.int64)
            for i, t in enumerate(pdf["text"]):
                acc = 0
                if isinstance(t, str):
                    for ch in t:
                        acc = (acc * relops.FP_BASE + ord(ch)) \
                            % relops.FP_MOD
                fps[i] = acc
            yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(np.int64),
                                "fp_roll": fps})

    return relops._rr(d.select("doc_id", "text")) \
        .mapInPandas(gen, "doc_id long, fp_roll long")


def test_array_tf_kernel_equals_jvm(edge_df):
    """doc-local run-length tf == split/explode/groupBy count."""
    tokens = _tokens()
    exp = _norm(edge_df.select("doc_id", F.explode(tokens).alias("term"))
                .groupBy("doc_id", "term")
                .agg(F.count("*").cast("long").alias("tf")))

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            t, parents, _ = relops._relops_flat_tokens(pdf["text"])
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
                "tf": tf.astype(np.int64)})

    got = _norm(relops._rr(edge_df.select("doc_id", "text"))
                .mapInPandas(gen, "doc_id long, term string, tf long"))
    pd.testing.assert_frame_equal(got, exp)


def test_emb_kernel_fold_bitwise_equals_jvm(spark):
    """The numpy column-fold must reproduce the JVM aggregate(zip_with)
    left fold BITWISE — plane-dot sign bits and cosine doubles."""
    rng = np.random.RandomState(7)
    vecs = [(int(i), rng.randn(16).astype(np.float32).tolist())
            for i in range(50)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    qe = vecs[0][1]
    dim = 16
    planes = np.array([relops._lsh_plane(p, dim) for p in range(4)]).T

    def dot_with(vals):
        lit = F.array(*[F.lit(v) for v in vals])
        return F.aggregate(
            F.zip_with(F.col("embedding"), lit,
                       lambda a, b: a.cast("double") * b.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x)

    bucket = sum([(F.when(dot_with(relops._lsh_plane(p, dim)) >= 0,
                          2 ** p).otherwise(0))
                  for p in range(4)], F.lit(0)).alias("bucket")
    qlit = F.array(*[F.lit(float(x)) for x in qe])
    dot = F.aggregate(F.zip_with(F.col("embedding"), qlit,
                                 lambda a, b: a.cast("double")
                                 * b.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"),
                    lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    qn = float(sum(float(x) * float(x) for x in qe)) ** 0.5
    cos = dot / (nrm * F.lit(qn))
    exp = _norm(emb.select("vec_id", bucket, cos.alias("_exact")))
    got = _norm(relops._emb_lsh_np(emb, planes, [4], ["bucket"], qe))
    # exact equality, not approx: the fold order is the same
    assert got["bucket"].tolist() == exp["bucket"].tolist()
    assert got["_exact"].tolist() == exp["_exact"].tolist()
    # and the driver-side query-bucket fold agrees with the JVM row
    qb = sum((1 << p) for p in range(4)
             if relops._py_fold_dot(qe, planes[:, p]) >= 0)
    assert qb == int(exp[exp["vec_id"] == 0]["bucket"].iloc[0])
