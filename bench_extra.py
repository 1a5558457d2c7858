"""Round-6 auxiliary benchmarks (bench.py is FROZEN for the driver; the
numbers cited in OPTIMIZATION_r06.md come from here).

1. Warm, noop-sink-isolated timings (guide §1.4) of the operators the r6
   round optimized — separates computation from the collect the frozen
   bench pays, and from first-query session warmup.
2. Merge-path block-decode A/B: the r5 per-block itertuples loop vs the
   r6 batched decode_blocks path, over the SAME committed posting blocks,
   single-threaded pandas (no Spark scheduling noise).

Usage: python bench_extra.py [sf_dir]    (default /root/testdata/sf1.0)
Prints one JSON line per section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _old_decode_blocks(batches):
    """The r5 merge decoder (per-block itertuples loop) — kept here as the
    A/B baseline; output-identical to merge._decode_blocks."""
    from parser_indexer_spark.codec import decode, delta_decode, \
        varint_slices
    for pdf in batches:
        if pdf.empty:
            continue
        ds, ts, ls, terms, pgs = [], [], [], [], []
        for r in pdf.itertuples():
            n = int(r.num_docs)
            tf = decode(r.tfs_enc, n)
            ds.append(delta_decode(decode(r.docs_enc, n),
                                   int(r.first_doc_id)))
            ts.append(tf.astype(np.int32))
            ls.append(decode(r.dls_enc, n).astype(np.int32))
            terms.append(np.full(n, r.term, dtype=object))
            if r.pos_enc is not None:
                npos = int(tf.sum())
                gaps = decode(r.pos_enc, npos)
                starts = np.concatenate(
                    ([0], np.cumsum(tf.astype(np.int64))[:-1]))
                pgs.extend(varint_slices(gaps, starts))
            else:
                pgs.extend([None] * n)
        yield pd.DataFrame({
            "doc_id": np.concatenate(ds).astype(np.int64),
            "term": np.concatenate(terms),
            "tf": np.concatenate(ts),
            "dl": np.concatenate(ls),
            "pos_gaps": pgs,
        })


def merge_decode_ab(spark) -> dict:
    """Single-threaded A/B of the merge re-inversion decode stage over the
    committed bench transcripts index blocks (pandas batches, no Spark)."""
    from parser_indexer_spark.merge import _decode_blocks
    idx = "/tmp/bench_docs_index"
    import glob
    files = sorted(glob.glob(f"{idx}/postings/seg=0/bucket=*/*.parquet"))
    if not files:
        return {"skipped": "no committed bench index at " + idx}
    pdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if "pos_enc" not in pdf.columns:
        pdf["pos_enc"] = None
    cols = ["term", "num_docs", "first_doc_id",
            "docs_enc", "tfs_enc", "dls_enc", "pos_enc"]
    batches = [pdf[cols].iloc[i:i + 65536].reset_index(drop=True)
               for i in range(0, len(pdf), 65536)]
    out = {"n_blocks": int(len(pdf)),
           "n_postings": int(pdf["num_docs"].sum())}
    for name, fn in [("old_per_block_sec", _old_decode_blocks),
                     ("new_batched_sec", _decode_blocks)]:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            res = [b for b in fn(iter(batches))]
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        out.setdefault("rows", int(sum(len(b) for b in res)))
    # equivalence spot check: same row count + same first/last doc ids
    a = pd.concat(list(_old_decode_blocks(iter(batches))),
                  ignore_index=True)
    b = pd.concat(list(_decode_blocks(iter(batches))), ignore_index=True)
    out["identical"] = bool(
        len(a) == len(b)
        and (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
        and (a["tf"].to_numpy() == b["tf"].to_numpy()).all()
        and (a["dl"].to_numpy() == b["dl"].to_numpy()).all()
        and (a["term"].to_numpy() == b["term"].to_numpy()).all()
        and all((x is None and y is None) or x == y
                for x, y in zip(a["pos_gaps"], b["pos_gaps"])))
    out["speedup"] = round(out["old_per_block_sec"]
                           / max(1e-9, out["new_batched_sec"]), 2)
    return out


def warm_noop(spark) -> dict:
    """Warm noop-isolated timings of the r6-optimized operators (best of
    3 after one untimed warm rep each — steady-state computation only)."""
    from parser_indexer_spark import relops
    from parser_indexer_spark import multimodal as mm

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    ops = {
        "minhash_signature": lambda: noop(
            relops.minhash_signature(spark, SF_DIR)),
        "dedup_near_pairs": lambda: noop(
            relops.dedup_near_pairs(spark, SF_DIR)),
        "lang_trigram": lambda: noop(relops.lang_trigram(spark, SF_DIR)),
        "simhash64": lambda: noop(relops.simhash64(spark, SF_DIR)),
        "simhash8": lambda: noop(relops.simhash8(spark, SF_DIR)),
        "array_explode_tf": lambda: noop(
            relops.array_explode_tf(spark, SF_DIR)),
        "ann_cosine": lambda: noop(relops.ann_cosine(spark, SF_DIR)),
        "ann_cosine_lsh": lambda: noop(
            relops.ann_cosine_lsh(spark, SF_DIR)),
        "ann_cosine_lsh_multi": lambda: noop(
            relops.ann_cosine_lsh_multi(spark, SF_DIR)),
        "dedup_embedding_pairs": lambda: noop(
            relops.dedup_embedding_pairs(spark, SF_DIR)),
        "fingerprint_rolling": lambda: noop(
            relops.fingerprint_rolling(spark, SF_DIR)),
        "quality_score": lambda: noop(relops.quality_score(spark, SF_DIR)),
        "token_stats": lambda: noop(relops.token_stats(spark, SF_DIR)),
        "token_count_bpe": lambda: noop(
            relops.token_count_bpe(spark, SF_DIR)),
        "str_tokens": lambda: noop(relops.str_tokens(spark, SF_DIR)),
        "media_features": lambda: noop(
            mm.media_byte_stats(mm.media_table(spark, SF_DIR))),
    }
    out = {}
    for name, fn in ops.items():
        fn()                                    # untimed warm rep
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    from parser_indexer_spark.session import get_spark
    spark = get_spark(app="bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10000).repartition(CPUS) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription("bench_extra: warm noop suite")
    print(json.dumps({"section": "warm_noop", "sf_dir": SF_DIR,
                      "queries": warm_noop(spark)}))
    spark.sparkContext.setJobDescription("bench_extra: merge decode A/B")
    print(json.dumps({"section": "merge_decode_ab",
                      **merge_decode_ab(spark)}))
    spark.stop()


if __name__ == "__main__":
    main()
