"""Plan-shape guards + scaling-bench corpus invariants.

These tests pin the physical-plan properties the 100 TB design relies
on: parquet predicate pushdown + column pruning on the blocks scan, and
the scaling corpus actually being URL-unique (a silent prefixing bug
once collapsed a 2M-doc benchmark corpus to 4k docs through dedup).
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query_eval import SearchEngine
from search_engine_spark.sources.pages_source import pages_df

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_blocks_scan_pushes_term_filter(spark, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, pages_df(spark, n_docs=80, seed=3), out,
                EngineConfig(index_partitions=4))
    eng = SearchEngine(spark, out, cache=False)
    plan = (
        eng.blocks.filter(F.col("term") == "x")
        .select("doc_gaps", "tfs", "dls")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(term), EqualTo(term,x)]" in plan
    # column pruning: the scan must not read the metadata columns
    assert "max_score" not in plan.split("ReadSchema")[1][:400]


def test_scaling_corpus_urls_unique(spark):
    from scaling_bench import generate_corpus
    import tempfile

    out = os.path.join(tempfile.mkdtemp(prefix="se_test_corpus_"), "pages")
    n = generate_corpus(spark, 800, out, chunk=200)
    df = spark.read.parquet(out)
    assert df.count() == n
    # the generator plants ~2% duplicate urls WITHIN a chunk (dedup
    # exercise); across chunks urls must not collide, so distinct urls
    # == the requested doc count exactly
    assert df.select("url").distinct().count() == 800
    # and every chunk's rows carry its unique prefix
    assert df.filter(~F.col("url").rlike(r"^https://c\d{4}\.")).count() == 0
