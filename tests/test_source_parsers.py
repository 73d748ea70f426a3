"""E4–E10 + E12: source parsers, metadata/links, URL normalization.

Fixture HTML exercises every branch of the reference parser family
(source_parsers.py:56-360, page_downloader.py:293-338,
url_manager.py:57-85); expected values are hand-derived from the
reference algorithms.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.source_parsers import (
    PARSE_SCHEMA,
    dispatch_parse,
    extract_links,
    extract_metadata,
    normalize_url,
    normalize_url_col,
    parse_pages_map,
)
from search_engine_spark.functions.html_extract import parse_html

WIKI_HTML = """<html><head><title>Doc X — Википедия</title>
<meta name="description" content="wiki desc">
<meta property="og:title" content="OGT"></head><body>
<h1 class="firstHeading">Граф — Википедия</h1>
<div id="mw-content-text">
<div class="toc">table of contents noise</div>
<table class="infobox"><tr><td>infobox noise</td></tr></table>
<div class="navbox">navbox noise</div>
<p>Первый абзац текста.</p>
<p>Второй абзац.</p>
<a href="/wiki/Other">o</a>
<a href="/wiki/Zeta">z</a>
<a href="/wiki/File:Img">file-skipped</a>
<a href="https://ext.com/x">external-skipped</a>
</div></body></html>"""

HABR_HTML = """<html><head><title>t</title>
<meta property="og:description" content="habr og desc"></head><body>
<h1 class="tm-title">Статья про Spark</h1>
<div class="tm-article-body">
<div class="tm-article-poll">poll dropped</div>
<aside class="tm-advertisement">ad dropped</aside>
<p>Текст статьи.</p><p>Ещё текст.</p>
<a href="/articles/123/">a1</a>
<a href="https://habr.com/posts/9/">a2</a>
<a href="/users/someone/">not-article</a>
</div>
<a class="tm-tags-list__link">spark</a>
<a class="tm-tags-list__link">поиск</a>
<a class="tm-user-info__username">ivan</a>
<time datetime="2024-05-01T00:00:00"></time>
</body></html>"""

SO_HTML = """<html><head><title>t</title></head><body>
<h1 itemprop="name">How to join?</h1>
<div class="s-prose">Question body text.</div>
<div class="answer"><div class="s-prose">Answer one.</div></div>
<div class="answer"><div class="s-prose">Answer two.</div></div>
<div class="answer"><div class="s-prose">Answer three.</div></div>
<div class="answer"><div class="s-prose">Answer four dropped.</div></div>
<a class="post-tag">sql</a>
<div id="sidebar"><a href="/questions/7/x">rel</a>
<a href="/tags/sql">not-q</a></div>
</body></html>"""

GENERIC_HTML = """<html><head><title>Fallback Title</title></head><body>
<h1>Page Heading</h1>
<nav>navigation dropped</nav>
<main>
<aside>sidebar dropped</aside>
<p>This paragraph is intentionally longer than fifty characters total.</p>
<span>short</span>
</main>
<a href="/local/page">same-domain</a>
<a href="https://other.example.net/x">cross-domain</a>
</body></html>"""


def test_wikipedia_parser():
    out = dispatch_parse("https://ru.wikipedia.org/wiki/Граф", WIKI_HTML)
    assert out["source"] == "wikipedia"
    assert out["title"] == "Граф"  # " — Википедия" suffix stripped
    assert out["content"] == "Первый абзац текста. Второй абзац."
    assert out["meta_description"] == "wiki desc"
    # reference tests `'.ru.' in url` — "https://ru.wikipedia.org/…"
    # does NOT contain ".ru." so it classifies as 'en' (as-implemented)
    assert out["language"] == "en"
    assert (
        dispatch_parse("https://www.ru.wikipedia.org/wiki/X", WIKI_HTML)[
            "language"
        ]
        == "ru"
    )
    assert out["links"] == [
        "https://ru.wikipedia.org/wiki/Other",
        "https://ru.wikipedia.org/wiki/Zeta",
    ]


def test_habr_parser():
    out = dispatch_parse("https://habr.com/ru/articles/1/", HABR_HTML)
    assert out["source"] == "habr"
    assert out["title"] == "Статья про Spark"
    # poll/ad decomposed; get_text(separator=' ') over remaining nodes
    assert out["content"] == "Текст статьи. Ещё текст. a1 a2 not-article"
    assert out["meta_description"] == "habr og desc"
    assert out["tags"] == ["spark", "поиск"]
    assert out["author"] == "ivan"
    assert out["published_date"] == "2024-05-01T00:00:00"
    assert out["links"] == [
        "https://habr.com/articles/123/",
        "https://habr.com/posts/9/",
    ]


def test_stackoverflow_parser():
    out = dispatch_parse("https://ru.stackoverflow.com/questions/1/x", SO_HTML)
    assert out["source"] == "stackoverflow"
    assert out["title"] == "How to join?"
    # question + top-3 answers only
    assert out["content"] == (
        "Question body text. Answer one. Answer two. Answer three."
    )
    assert out["answers_count"] == 3
    assert out["tags"] == ["sql"]
    assert out["language"] == "ru"
    assert out["links"] == ["https://ru.stackoverflow.com/questions/7/x"]


def test_generic_alt_parser():
    out = dispatch_parse("https://example.org/post/1", GENERIC_HTML)
    assert out["source"] == "generic"
    assert out["title"] == "Page Heading"  # h1 beats <title>
    # only the >50-char paragraph survives; nav/aside decomposed
    assert out["content"] == (
        "This paragraph is intentionally longer than fifty characters total."
    )
    assert out["language"] == "unknown"
    assert out["links"] == ["https://example.org/local/page"]


def test_dispatch_first_match_order():
    for url, src in [
        ("https://en.wikipedia.org/wiki/A", "wikipedia"),
        ("https://habr.com/x", "habr"),
        ("https://stackoverflow.com/questions/1", "stackoverflow"),
        ("https://random.site/x", "generic"),
    ]:
        assert dispatch_parse(url, "<html><body></body></html>")["source"] == src


def test_metadata_extraction():
    html = """<html><head>
    <meta name="Description" content="d">
    <meta property="og:image" content="i.png">
    <meta http-equiv="Content-Type" content="text/html">
    <meta name="empty" content="">
    <meta name="nocontent">
    </head><body></body></html>"""
    md = extract_metadata(parse_html(html))
    assert md == {
        "description": "d",
        "og:image": "i.png",
        "content-type": "text/html",
    }


def test_link_extraction_filters():
    html = """<body>
    <a href="/ok/page">1</a>
    <a href="#anchor">skip</a>
    <a href="">skip</a>
    <a href="javascript:void(0)">skip</a>
    <a href="mailto:a@b.c">skip</a>
    <a href="tel:+1">skip</a>
    <a href="/f/Report.PDF">skip</a>
    <a href="/img/x.png">skip</a>
    <a href="https://h.com/second">2</a>
    </body>"""
    assert extract_links(parse_html(html)) == ["/ok/page", "https://h.com/second"]


NORM_CASES = [
    ("http://Example.org/Path#frag", "http://example.org/path"),
    ("https://a.b/C?Q=V#x", "https://a.b/c?q=v"),
    ("example.org/NoScheme", "http://example.org/noscheme"),
    ("HTTP://HOST/", "http://host/"),
    ("http://host/path", "http://host/path"),
]


def test_normalize_url_python():
    for raw, want in NORM_CASES:
        assert normalize_url(raw) == want, raw


ADVERSARIAL_URLS = [
    # ADVICE r2: inputs where the old urlparse().geturl() refmodel form
    # diverged from the column form (returned None / re-assembled).
    "#",
    "a#",
    "#only-fragment",
    "mailto:User@Example.COM",
    "tel:+1-800-FLOWERS",
    "http://host:not_a_port/Path",
    "http://[::1]:80/Path#Frag",
    "http://[unclosed/bracket#f",
    "http://h/Path?",       # bare trailing '?' must survive
    "??",
    "%20Space/Path#x",
    "HTTP://H/#a#b",
    "javascript:void(0)#x",
]


def test_normalize_url_column_matches_python(spark):
    """The Python refmodel form and the JVM column form must agree on
    EVERY input — well-formed and adversarial alike (ADVICE r2) — since
    build_docs uses the column form while the oracle refmodel uses the
    Python form; any divergence surfaces as a doc_id mismatch."""
    raws = [r for r, _ in NORM_CASES] + ADVERSARIAL_URLS
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    got = [
        r["n"]
        for r in df.select(normalize_url_col(F.col("url")).alias("n"))
        .collect()
    ]
    assert got == [normalize_url(r) for r in raws]
    assert got[: len(NORM_CASES)] == [want for _, want in NORM_CASES]
    # pin a few adversarial outcomes to the rule itself
    assert normalize_url("#") == "http://"
    assert normalize_url("http://h/Path?") == "http://h/path?"
    assert normalize_url("mailto:User@Example.COM") == "mailto:user@example.com"


def test_url_normalization_collapses_planted_dups(spark, tmp_path):
    """Corpus plants fragment/case url variants (norm_dup_frac); with
    normalize_urls on (default) the build collapses them to the first
    writer, matching the single-node reference model exactly."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.oracle.refmodel import RefIndex
    from search_engine_spark.sources.pages_source import (
        generate_pages_pdf,
        pages_df,
    )

    n = 120
    cfg = EngineConfig(index_partitions=4)
    out = str(tmp_path / "idx")
    store = build_index(
        spark, pages_df(spark, n_docs=n, seed=9, norm_dup_frac=0.5), out, cfg
    )
    meta = store.read_stage(spark, "docmeta")
    urls = [r["url"] for r in meta.select("url").collect()]
    # every variant collapsed: exactly the n base urls, all lowercase
    assert len(urls) == n
    assert all(u == u.lower() and "#" not in u for u in urls)
    ref = RefIndex.from_rows(
        generate_pages_pdf(n_docs=n, seed=9, norm_dup_frac=0.5).to_dict(
            "records"
        ),
        cfg,
    )
    assert ref.n_docs == n
    got = {r["doc_id"]: r["url"] for r in meta.collect()}
    assert got == {d.doc_id: d.url for d in ref.docs}


def test_build_docs_meta_links_columns(spark, tmp_path):
    """E9/E10 as docs-stage columns (extract_meta_links=True): same
    parse pass, MapType metadata + array links."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import build_docs

    rows = [
        (
            "https://en.wikipedia.org/wiki/A",
            None,
            WIKI_HTML.encode(),
            None,
            "ru",
        ),
        ("https://plain.example/x", None, GENERIC_HTML.encode(), None, "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    cfg = EngineConfig(index_partitions=2, extract_meta_links=True)
    docs = build_docs(spark, pages, cfg)
    got = {r["url"]: r for r in docs.collect()}
    w = got["https://en.wikipedia.org/wiki/a"]  # url normalized (lowered)
    assert w["metadata"]["description"] == "wiki desc"
    assert w["metadata"]["og:title"] == "OGT"
    g = got["https://plain.example/x"]
    assert g["links"] == ["/local/page", "https://other.example.net/x"]
    assert g["metadata"] == {}


def test_parse_pages_map_spark(spark):
    rows = [
        ("https://en.wikipedia.org/wiki/A", WIKI_HTML.encode()),
        ("https://habr.com/ru/articles/2/", HABR_HTML.encode()),
        ("https://stackoverflow.com/questions/3", SO_HTML.encode()),
        ("https://plain.example/x", GENERIC_HTML.encode()),
    ]
    df = spark.createDataFrame(rows, "url string, html binary").repartition(2)
    out = {r["url"]: r for r in df.mapInPandas(
        parse_pages_map, schema=PARSE_SCHEMA
    ).collect()}
    assert out["https://en.wikipedia.org/wiki/A"]["source"] == "wikipedia"
    assert out["https://habr.com/ru/articles/2/"]["title"] == "Статья про Spark"
    assert out["https://stackoverflow.com/questions/3"]["metadata"] == {}
    g = out["https://plain.example/x"]
    assert g["source"] == "generic"
    assert g["raw_links"] == ["/local/page", "https://other.example.net/x"]
