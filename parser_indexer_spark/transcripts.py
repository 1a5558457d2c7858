"""Deterministic synthetic `transcripts` corpus — FIXTURES.md §1 (seed=42).

The contractual input table shape (BASELINE.json:15):
    (conv_id string, turn_idx int32, role string, text string,
     tool string, ts timestamp)

Generation is pure numpy (vectorized) so t_bench (~10^6 turns) materializes
in seconds; Zipf(s=1.2) over a 2,030-word vocabulary makes head terms
genuinely skewed (exercises salting, SURVEY.md §2 C11).

For multi-million-turn benches the generator can emit directly into Spark
partitions via ``synthesize_spark`` (mapInPandas over a range frame) so the
driver never holds the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
# 30 literal words shared with testdata `documents` + w0000..w1999
LITERAL_WORDS = (
    "spark join filter window merge sort hash agg shuffle partition "
    "broadcast index query scan table column row group order limit "
    "select count distinct union except stream batch schema vector data"
).split()
VOCAB = LITERAL_WORDS + [f"w{i:04d}" for i in range(2000)]
ZIPF_S = 1.2
ROLES = ("user", "assistant")
TOOLS = np.array(["search", "browser", "python", "bash"])
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00")


def _zipf_probs(n: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def synthesize_pandas(n_turns: int, avg_turns: int = 8, seed: int = SEED,
                      conv_offset: int = 0) -> pd.DataFrame:
    """Generate ~n_turns transcript turns (exact count may differ by <40 due
    to per-conv clamping; callers that need exactness truncate)."""
    rng = np.random.default_rng([seed, conv_offset])
    n_convs = max(1, n_turns // avg_turns)
    turns_per_conv = 1 + rng.poisson(7.0, size=n_convs).clip(max=39)
    total = int(turns_per_conv.sum())

    conv_i = np.repeat(np.arange(n_convs) + conv_offset, turns_per_conv)
    starts = np.concatenate(([0], np.cumsum(turns_per_conv)[:-1]))
    turn_idx = (np.arange(total) - np.repeat(starts, turns_per_conv)).astype(np.int32)

    # roles: user/assistant alternating, 15% tool insertions
    role_codes = np.where(turn_idx % 2 == 0, 0, 1)
    tool_mask = rng.random(total) < 0.15
    roles = np.where(tool_mask, "tool", np.array(ROLES)[role_codes])
    tools = np.where(tool_mask, TOOLS[rng.integers(0, len(TOOLS), total)], None)

    # text: Zipf bag-of-words, length ~ 5 + Geometric(0.08) clamped <= 200
    lens = (5 + rng.geometric(0.08, size=total)).clip(max=200)
    total_tokens = int(lens.sum())
    probs = _zipf_probs(len(VOCAB))
    word_ids = rng.choice(len(VOCAB), size=total_tokens, p=probs)
    vocab_arr = np.array(VOCAB, dtype=object)
    words = vocab_arr[word_ids]
    doc_of_tok = np.repeat(np.arange(total), lens)
    # join per-doc via pandas C-level groupby-join
    texts = pd.Series(words).groupby(doc_of_tok).agg(" ".join)
    texts = texts.reindex(np.arange(total), fill_value="").to_numpy(dtype=object)

    # ~3% noise turns: mixed case + punctuation
    noise = rng.random(total) < 0.03
    if noise.any():
        s = pd.Series(texts[noise])
        texts[noise] = (s.str.replace(" ", ", ", regex=False)
                         .str.capitalize() + "!").to_numpy(dtype=object)

    ts = (EPOCH_2024
          + (conv_i * 17).astype("timedelta64[s]")
          + (turn_idx.astype(np.int64) * 30).astype("timedelta64[s]"))

    pdf = pd.DataFrame({
        "conv_id": pd.Series([f"conv{i:08d}" for i in conv_i], dtype=object),
        "turn_idx": turn_idx,
        "role": pd.Series(roles, dtype=object),
        "text": pd.Series(texts, dtype=object),
        "tool": pd.Series(tools, dtype=object),
        "ts": pd.Series(ts),
    })
    return pdf


TRANSCRIPTS_SCHEMA = ("conv_id string, turn_idx int, role string, "
                      "text string, tool string, ts timestamp")


def synthesize_spark(spark, n_turns: int, avg_turns: int = 8, seed: int = SEED,
                     partitions: int = 32):
    """Distributed generation: each Spark partition synthesizes a disjoint
    conv_id range (deterministic per (seed, conv_offset)); no driver-side
    corpus materialization — the pattern that scales to 10^12 turns."""
    import pyspark.sql.functions as F  # noqa: F401

    n_convs = max(1, n_turns // avg_turns)
    per_part = max(1, n_convs // partitions)
    bounds = [(p * per_part,
               (p + 1) * per_part if p < partitions - 1 else n_convs)
              for p in range(partitions)]
    bdf = spark.createDataFrame(
        [(lo, hi) for lo, hi in bounds], "lo long, hi long"
    ).repartition(partitions, "lo")

    def gen(batches):
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                n = int(hi - lo)
                if n <= 0:
                    continue
                out = synthesize_pandas(n * avg_turns, avg_turns=avg_turns,
                                        seed=seed, conv_offset=int(lo))
                # clamp conv range exactly: synthesize_pandas made n convs
                yield out

    return bdf.mapInPandas(gen, TRANSCRIPTS_SCHEMA)
