"""Exports surface (S9-S12, V16) tests."""

import json
import os

import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.exports import (
    export_build_stats,
    export_index_text,
    export_results_json,
    export_search_stats,
    regex_search,
)
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query_eval import SearchEngine
from search_engine_spark.sources.pages_source import (
    REFERENCE_QUERY_TERMS,
    pages_df,
)

CFG = EngineConfig(index_partitions=4)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp") / "index")
    store = build_index(spark, pages_df(spark, n_docs=120, seed=7), out, CFG)
    return store, SearchEngine(spark, out)


def test_export_index_text(spark, built, tmp_path):
    store, _ = built
    out = str(tmp_path / "dump")
    export_index_text(store, spark, out)
    dic = spark.read.json(os.path.join(out, "dictionary"))
    assert dic.count() > 0
    assert set(dic.columns) >= {"term", "df", "cf"}
    assert os.path.exists(os.path.join(out, "stats.json"))


def test_export_build_stats(built, tmp_path):
    store, _ = built
    p = str(tmp_path / "build_stats.json")
    out = export_build_stats(store, p)
    assert out["total_documents"] > 0
    assert out["docs_per_sec"] > 0
    assert json.load(open(p)) == out


def test_export_search_stats_and_results(built, tmp_path):
    _, engine = built
    term = REFERENCE_QUERY_TERMS[0]
    engine.search(term, 5).collect()
    engine.search(f"{term} && {REFERENCE_QUERY_TERMS[1]}", 5).collect()
    stats = export_search_stats(engine.query_log, str(tmp_path / "s.json"))
    assert stats["queries"] >= 2
    assert sum(stats["histogram"]["counts"]) == stats["queries"]

    res = export_results_json(engine, term, str(tmp_path / "r.json"), 5)
    assert res["query"] == term
    assert res["results"][0]["rank"] == 1
    assert res["results"] == sorted(
        res["results"], key=lambda r: (-r["score"], r["doc_id"])
    )


def test_regex_search(spark):
    docs = spark.createDataFrame(
        [(0, "Apache Spark engine"), (1, "spark plugs"), (2, "hadoop")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in regex_search(docs, "spark").collect()}
    assert got == {0, 1}
    got = {r["doc_id"]
           for r in regex_search(docs, "spark", not_pattern="plug").collect()}
    assert got == {0}
