"""Golden mini-corpus tests lifted from the reference's own unit tests
(FIXTURES.md §3). Doc texts verbatim from test_search.cpp / test_index.cpp;
expected doc sets from the reference's asserted semantics, phrase under
documented-intent (token-ordinal) matching.

Spark engine and oracle are both checked, and checked against each other.
"""

import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query_eval import SearchEngine
from search_engine_spark.oracle.refmodel import RefIndex

CFG = EngineConfig(index_partitions=4, block_size=4)


def _mk(spark, tmp, texts):
    rows = [
        {"url": f"http://t/{i}", "warc_ts": None, "title": f"Doc {i}", "text": t}
        for i, t in enumerate(texts)
    ]
    oracle = RefIndex.from_rows(rows, CFG)
    pages = spark.createDataFrame(
        [(r["url"], None, None, r["text"], "ru") for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    store = build_index(spark, pages, str(tmp / "idx"), CFG)
    engine = SearchEngine(spark, str(tmp / "idx"), cache=False)
    return engine, oracle


def _docs(engine, q):
    return sorted(
        r["doc_id"] for r in engine.search(q, 100, with_meta=False).collect()
    )


# corpus from test_search.cpp:47-49 — urls sort as doc order here
BOOLEAN_TEXTS = [
    "красный автомобиль быстрый",
    "синий автомобиль медленный",
    "красный мотоцикл быстрый",
]


@pytest.fixture(scope="module")
def boolean_engine(spark, tmp_path_factory):
    return _mk(spark, tmp_path_factory.mktemp("golden_bool"), BOOLEAN_TEXTS)


def test_boolean_operators_golden(boolean_engine):
    engine, oracle = boolean_engine
    # expected sets from test_search.cpp:42-118 asserts
    cases = {
        "красный && автомобиль": [0],
        "красный || автомобиль": [0, 1, 2],
        "автомобиль && !красный": [1],
        "красный && быстрый": [0, 2],
    }
    for q, want in cases.items():
        assert _docs(engine, q) == want, q
        assert sorted(d for d, _ in oracle.search(q, 100)) == want, q


PAREN_TEXTS = [
    "кошки собаки домашние животные",
    "кошки тигры дикие животные",
    "собаки волки дикие животные",
]


def test_parentheses_golden(spark, tmp_path_factory):
    engine, oracle = _mk(spark, tmp_path_factory.mktemp("golden_paren"), PAREN_TEXTS)
    q = "(кошки || собаки) && домашние"
    assert _docs(engine, q) == [0]
    assert sorted(d for d, _ in oracle.search(q, 100)) == [0]


PHRASE_TEXTS = [
    "Московский авиационный институт основан в 1930 году",
    "Авиационный институт в Москве называется МАИ",
    "Московский институт авиационный технический",
]


def test_phrase_golden(spark, tmp_path_factory):
    engine, oracle = _mk(spark, tmp_path_factory.mktemp("golden_phrase"), PHRASE_TEXTS)
    # Documented-intent (token ordinals): doc0 contains the consecutive
    # phrase; doc2 has the words but not consecutively.  NB lowercase
    # phrase matches doc0's "Московский" only if case matches — the
    # corpus preserves Cyrillic case, so query with the exact case.
    q = '"Московский авиационный институт"'
    assert _docs(engine, q) == [0]
    assert sorted(d for d, _ in oracle.search(q, 100)) == [0]
    # proximity: all terms within a 2-token window of the first
    q2 = '"Московский институт" /2'
    assert _docs(engine, q2) == [0, 2]
    assert sorted(d for d, _ in oracle.search(q2, 100)) == [0, 2]


def test_term_frequencies_golden(spark, tmp_path_factory):
    # test_index.cpp:177-178: cf(word)=4, cf(repeat)=3, df(word)=2
    texts = ["word word word repeat repeat", "word repeat another"]
    engine, oracle = _mk(spark, tmp_path_factory.mktemp("golden_tf"), texts)
    d = {
        r["term"]: (r["df"], r["cf"])
        for r in engine.dictionary.collect()
    }
    assert d["word"] == (2, 4)
    assert d["repeat"] == (2, 3)
    assert d["another"] == (1, 1)
    assert oracle.cf("word") == 4 and oracle.df("word") == 2


def test_mai_corpus_search(spark, tmp_path_factory):
    # test_index.cpp:16-21 corpus
    texts = [
        "Московский авиационный институт лучший",
        "Авиационный институт в Москве",
        "Технический университет с авиационной специализацией",
    ]
    engine, oracle = _mk(spark, tmp_path_factory.mktemp("golden_mai"), texts)
    got = [(r["doc_id"], r["score"]) for r in
           engine.search("институт", 10, with_meta=False).collect()]
    want = oracle.search("институт", 10)
    assert [d for d, _ in got] == [d for d, _ in want]
    # doc1's "Авиационный" is capitalized; Cyrillic case is preserved
    # (ASCII-only folding) so the lowercase query matches doc0 only —
    # the exact case-sensitivity quirk SURVEY §5.1(b) documents.
    assert _docs(engine, "авиационный && институт") == [0]
    assert sorted(d for d, _ in oracle.search("авиационный && институт", 10)) == [0]
    assert _docs(engine, "Авиационный && институт") == [1]


def test_empty_phrase_matches_nothing(spark, tmp_path_factory):
    """A whitespace-only quoted phrase parses to Phrase(()) — it must
    return zero hits, not crash on reduce() of an empty score list."""
    engine, _ = _mk(
        spark, tmp_path_factory.mktemp("golden_empty_phrase"), PHRASE_TEXTS
    )
    assert _docs(engine, '"   "') == []
    # composed with a real term the empty leaf stays a no-match
    assert _docs(engine, 'институт && "  "') == []
