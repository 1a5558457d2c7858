"""parser_indexer_spark — a PySpark-native inverted-index builder + BM25 query
engine with the capabilities of ``thammegowda/parser-indexer``.

Built from scratch on the DataFrame / Arrow-UDF API (SURVEY.md §7 design
stance): all novelty lives in (a) the table layout (term-bucketed,
doc-chunk-aligned posting blocks), (b) vectorized numpy codecs
(delta + FOR bit-packing / varint), and (c) three fused Arrow stages
(tokenize+tf, block-build, score). Zero custom Catalyst rules; zero RDD
usage on hot paths; no per-row Python (BASELINE.json:15).

Reference provenance: the reference mount ``/root/reference`` was empty at
survey time (SURVEY.md §0); the functional contract is BASELINE.json plus
the public Lucene/Solr semantics cited per-operator in SURVEY.md §2.
"""

from parser_indexer_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
