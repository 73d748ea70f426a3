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


def test_regex_search_query_boolean_composition(spark):
    """V16 composed (VERDICT r2 #7): &&-lists with embedded !, ||-lists,
    bare !, implicit whitespace AND, and title-OR-text matching."""
    from search_engine_spark.operators.exports import regex_search_query

    docs = spark.createDataFrame(
        [
            (0, "Intro", "apache spark engine"),
            (1, "Spark", "plugs and coils"),
            (2, "Other", "hadoop mapreduce"),
            (3, "Mix", "spark and hadoop together"),
        ],
        "doc_id long, title string, text string",
    )
    run = lambda q, **kw: {
        r["doc_id"] for r in regex_search_query(docs, q, **kw).collect()
    }
    assert run("spark && !hadoop") == {0}  # text-only by default
    assert run("spark && !hadoop", title_col="title") == {0, 1}
    assert run("spark || hadoop") == {0, 2, 3}
    assert run("!spark") == {1, 2}
    assert run("spark hadoop") == {3}  # implicit AND
    assert run("spark && engine") == {0}
    # title-OR-text: doc 1 matches 'spark' only through its title
    assert run("spark", title_col="title") == {0, 1, 3}
    assert run("spark") == {0, 3}


def test_flat_text_export_and_sidecar(spark, built, tmp_path):
    from search_engine_spark.operators.exports import flat_text_export

    store, _ = built
    docs = store.read_stage(spark, "docs")
    out_dir = str(tmp_path / "flat")
    out = flat_text_export(spark, docs, out_dir, single_file=True)
    rows = out.orderBy("export_id").collect()
    n_nonempty = docs.filter("trim(coalesce(text,'')) != ''").count()
    assert len(rows) == n_nonempty
    assert [r["export_id"] for r in rows] == list(range(len(rows)))
    # export ordinal follows doc_id order over surviving docs
    assert [r["doc_id"] for r in rows] == sorted(r["doc_id"] for r in rows)
    # each line is "{title}. {content}" with no newlines
    for r in rows[:10]:
        assert r["line"].startswith(f"{r['title']}. ")
        assert "\n" not in r["line"] and "\r" not in r["line"]
    # files round-trip: line i of documents == sidecar export_id i
    lines = (
        spark.read.text(os.path.join(out_dir, "documents")).collect()
    )
    assert len(lines) == len(rows)
    meta = spark.read.json(os.path.join(out_dir, "metadata"))
    assert meta.count() == len(rows)
    assert set(meta.columns) == {"export_id", "title", "url", "doc_id"}


def test_text_file_source_roundtrip(spark, built, tmp_path):
    """S6 round-trip (VERDICT r1 #7): flat export → text-file source →
    index must rank exactly like a pages-table build on the same
    content with the same urls."""
    import glob

    from search_engine_spark.operators.exports import flat_text_export
    from search_engine_spark.sources.pages_source import text_file_pages

    store, _ = built
    docs = store.read_stage(spark, "docs")
    exp = str(tmp_path / "flat")
    out = flat_text_export(spark, docs, exp, single_file=True)
    part = glob.glob(os.path.join(exp, "documents", "part-*"))[0]

    # ?line= urls survive the DEFAULT config's E12 normalization
    cfg = EngineConfig(index_partitions=4)
    pages_b = text_file_pages(spark, part)
    idx_b = str(tmp_path / "idx_b")
    build_index(spark, pages_b, idx_b, cfg)
    eng_b = SearchEngine(spark, idx_b)

    # pages-table twin: same lines, same urls (zero-padded ordinals)
    from pyspark.sql import functions as F

    pages_c = out.select(
        F.format_string(
            f"file://{part}?line=%09d", F.col("export_id") + 1
        ).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("line").alias("text"),
        F.lit("").alias("lang"),
    )
    idx_c = str(tmp_path / "idx_c")
    build_index(spark, pages_c, idx_c, cfg)
    eng_c = SearchEngine(spark, idx_c)

    for q in list(REFERENCE_QUERY_TERMS)[:2] + ["математика && информация"]:
        got_b = [(r["doc_id"], round(r["score"], 9))
                 for r in eng_b.search(q, 10, with_meta=False).collect()]
        got_c = [(r["doc_id"], round(r["score"], 9))
                 for r in eng_c.search(q, 10, with_meta=False).collect()]
        assert got_b == got_c, q
        assert got_b  # queries actually hit


def test_cli_repl_in_process(spark, built):
    """scripts/search_cli.py REPL shape over streams (main.cpp:27-90)."""
    import io
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import search_cli

    _, eng = built
    inp = io.StringIO("\nматематика\nquit\nnever reached\n")
    out = io.StringIO()
    n = search_cli.repl(eng, 5, inp, out)
    assert n == 1  # blank skipped, quit stops before the last line
    text = out.getvalue()
    assert "Interactive Search Mode" in text
    assert "Found" in text and "Document #" in text
    assert "Title:" in text and "URL:" in text and "Snippet:" in text
