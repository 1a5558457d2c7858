"""Frozen engine constants + per-build configuration.

The scoring constants and analyzer version are contractual (FIXTURES.md §2-3,
SURVEY.md §2 D6): golden fixtures are generated against exactly these values.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- BM25 constants (public: Lucene BM25Similarity defaults; FIXTURES.md §3) ---
BM25_K1: float = 1.2
BM25_B: float = 0.75

# --- Analyzer (FIXTURES.md §2; frozen) ---
# NFKD normalize -> lowercase -> tokens = maximal runs of [\p{L}\p{M}\p{N}].
# (pyarrow 16's utf8_normalize only implements the decomposing forms
# correctly, so the frozen form is NFKD; marks \p{M} are kept inside tokens
# so decomposed accents do not split words.)
ANALYZER_VERSION: str = "nfkd-lower-lmn-v1"
TOKEN_SPLIT_REGEX: str = r"[^\p{L}\p{M}\p{N}]+"  # RE2 syntax (pyarrow / DuckDB)

# --- Index layout (SURVEY.md §1.2) ---
# bucket = crc32(term) % n_buckets   -> Parquet/Iceberg partition column
#                                       (query-time partition pruning, D2)
# chunk  = doc_id >> chunk_bits      -> doc-range grid; posting blocks never
#                                       cross a chunk boundary, so every
#                                       term's blocks align to the same grid
#                                       and AND-intersection co-locates by a
#                                       single shuffle on `chunk` (D4).
# block  = <=block_size postings, delta-encoded doc gaps + tf + dl, each
#          FOR-bit-packed (C3-C6; varint kept for format evolution — every
#          payload is tagged with its codec id byte, so segments of
#          different codecs coexist in one index).
CODECS = ("for", "varint")


@dataclass(frozen=True)
class EngineConfig:
    """Per-index configuration, persisted in the index manifest (C12/C13)."""

    n_buckets: int = 16           # term-hash partitions (scale: 256-4096)
    block_size: int = 128          # max postings per block (Lucene-style)
    chunk_bits: int = 16           # docs per chunk = 2**chunk_bits
    build_partitions: int = 32     # shuffle width for the build (scale: >>)
    salt_df_threshold: int = 100_000  # terms with df above this get salted
    n_salts: int = 8               # doc-range salt fan-out for head terms
    k1: float = BM25_K1
    b: float = BM25_B
    analyzer_version: str = ""     # derived from stopwords unless set
    stopwords: tuple = ()          # opt-in StopFilter analogue (C1 option)
    codec: str = "for"             # live posting-block codec: "for"|"varint"
    codec_version: str = ""        # derived from codec unless explicitly set
    positions: bool = True         # store within-doc token positions
                                   # (phrase/proximity queries, D-phrase;
                                   # Lucene indexes positions by default)
    fields: tuple = ()             # extra doc columns indexed as fielded
                                   # terms "<field>:<term>" (multi-field
                                   # search with boosts, Solr qf analogue;
                                   # ':' never appears in analyzer tokens)
    impact_df_threshold: int = 4096  # terms with per-segment df above this
                                   # get an impact sidecar: their top
                                   # postings by score bound, written at
                                   # build time so head-term queries can
                                   # early-exit without decoding the full
                                   # posting list [public: Lucene 8
                                   # impacts; Anh & Moffat 2006]
    impact_top: int = 256          # sidecar size I per (term, segment)
    extra: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.codec not in CODECS:
            raise ValueError(f"unknown codec {self.codec!r}")
        if not self.codec_version:
            # honest lineage: the version string names the LIVE wire format
            object.__setattr__(self, "codec_version",
                               f"delta-{self.codec}-v1")
        object.__setattr__(self, "stopwords",
                           tuple(sorted(set(self.stopwords))))
        object.__setattr__(self, "fields", tuple(self.fields))
        if not self.analyzer_version:
            # analyzer lineage bumps when a stopword list is active; the
            # list itself is persisted so old indexes validate under their
            # recorded analyzer (SURVEY.md §2 C1 option)
            av = ANALYZER_VERSION
            if self.stopwords:
                av += f"+stop{len(self.stopwords)}"
            object.__setattr__(self, "analyzer_version", av)

    @property
    def chunk_size(self) -> int:
        return 1 << self.chunk_bits

    def to_dict(self) -> dict:
        return {
            "n_buckets": self.n_buckets,
            "block_size": self.block_size,
            "chunk_bits": self.chunk_bits,
            "build_partitions": self.build_partitions,
            "salt_df_threshold": self.salt_df_threshold,
            "n_salts": self.n_salts,
            "k1": self.k1,
            "b": self.b,
            "analyzer_version": self.analyzer_version,
            "stopwords": list(self.stopwords),
            "codec": self.codec,
            "codec_version": self.codec_version,
            "positions": self.positions,
            "fields": list(self.fields),
            "impact_df_threshold": self.impact_df_threshold,
            "impact_top": self.impact_top,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        known = {k: d[k] for k in (
            "n_buckets", "block_size", "chunk_bits", "build_partitions",
            "salt_df_threshold", "n_salts", "k1", "b",
            "analyzer_version", "codec", "codec_version",
            "positions", "impact_df_threshold", "impact_top") if k in d}
        # indexes committed before the positional format carry no
        # "positions" key and have no pos_enc column
        known.setdefault("positions", "positions" in d)
        if "stopwords" in d:
            known["stopwords"] = tuple(d["stopwords"])
        if "fields" in d:
            known["fields"] = tuple(d["fields"])
        return cls(**known)
