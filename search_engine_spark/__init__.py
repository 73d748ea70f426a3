"""PySpark-native full-text analytics engine.

A from-scratch, Spark-first reimplementation of the capabilities of the
reference C++/Python search engine (kingxl111/search-engine): HTML text
extraction, byte-exact tokenization, inverted-index construction with
delta-gap + varbyte compressed posting blocks (block-max metadata),
BM25 top-k boolean/phrase/proximity query answering, Zipf analytics,
plus large-scale training-data pipeline operators (dedup, similarity
search, text quality, multimodal plumbing).

Architecture: DataFrame/Catalyst logical plans; Python confined to
vectorized pandas/Arrow UDFs (mapInPandas / pandas_udf); no per-row
Python UDFs, no RDDs.
"""

from search_engine_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
