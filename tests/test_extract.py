"""HTML extraction tests — the per-row invariant surface (FIXTURES.md §1).

Golden strings pin the reference algorithm (page_downloader.py:249-291):
decompose script/style/nav/footer/header/aside; selector order article,
main, .content, #content, .post-content, .entry-content,
.article-content with >100-char gate; body fallback; ' ' joins; \\s+
collapse; strip.
"""

from search_engine_spark.functions.html_extract import extract_html, parse_html
from search_engine_spark.sources.pages_source import generate_pages_pdf

LONG = "слово " * 30  # > 100 chars once stripped


def test_body_fallback():
    html = f"<html><head><title>T</title></head><body><p>{LONG}</p></body></html>"
    title, text = extract_html(html)
    assert title == "T"
    assert text == LONG.strip()


def test_article_selector_wins_and_noise_removed():
    html = (
        "<html><head><title>T</title><style>p{color:red}</style></head><body>"
        "<nav>NAVNOISE</nav><article><h1>H</h1><p>" + LONG + "</p></article>"
        "<footer>FOOTNOISE</footer></body></html>"
    )
    _, text = extract_html(html)
    assert "NAVNOISE" not in text and "FOOTNOISE" not in text
    assert text == ("H " + LONG).strip()


def test_script_content_never_indexed():
    html = (
        "<html><body><script>var x='SECRET';</script><main><p>"
        + LONG + "</p></main></body></html>"
    )
    _, text = extract_html(html)
    assert "SECRET" not in text
    assert text == LONG.strip()


def test_short_container_falls_back_to_body():
    # article text <= 100 chars → not kept → body fallback (which includes it)
    html = "<html><body><article>short</article><p>outside text</p></body></html>"
    _, text = extract_html(html)
    assert text == "short outside text"


def test_multiple_selectors_duplicate_like_reference():
    # An element with class "content" inside an <article>: both the
    # article selector and .content selector match → text appended twice
    # (the reference loop does not break; page_downloader.py:268-275).
    inner = LONG.strip()
    html = (
        '<html><body><article><div class="content">' + LONG + "</div>"
        "</article></body></html>"
    )
    _, text = extract_html(html)
    assert text == inner + " " + inner


def test_entities_unescaped():
    html = "<html><body><p>a &amp; b &lt;c&gt; ещё</p></body></html>"
    _, text = extract_html(html)
    assert text == "a & b <c> ещё"


def test_whitespace_collapse():
    html = "<html><body><p>a\n\n  b\t\tc</p></body></html>"
    _, text = extract_html(html)
    assert text == "a b c"


def test_get_text_strip_semantics():
    # BS4 get_text(separator=' ', strip=True): per-node strip, skip
    # empties, join with separator.
    root = parse_html("<div> a <b> b </b>\n<i>  </i> c </div>")
    assert root.get_text(" ", True) == "a b c"


def test_corpus_generator_invariant():
    pdf = generate_pages_pdf(n_docs=40, seed=42)
    # text column (where present) must byte-equal extraction output
    for _, row in pdf.iterrows():
        if row["text"] is not None:
            _, text = extract_html(row["html"])
            assert text.encode("utf-8") == row["text"].encode("utf-8"), row["url"]
    # deterministic: same seed → identical frame
    pdf2 = generate_pages_pdf(n_docs=40, seed=42)
    assert pdf.equals(pdf2)
    # contains the reference query terms somewhere
    blob = " ".join(t for t in pdf["text"] if t)
    assert "математика" in blob and "информация" in blob


def test_encoding_detection_cascade():
    from search_engine_spark.functions.html_extract import (
        detect_encoding,
        parse_html,
    )

    cp1251 = "<html><head><meta charset=windows-1251></head><body><p>" \
             "привет мир как дела сегодня у нас тут" \
             "</p></body></html>".encode("cp1251")
    assert detect_encoding(cp1251) == "windows-1251"
    # header charset wins over the meta tag
    assert detect_encoding(cp1251, header_charset="koi8-r") == "koi8-r"
    # bogus header falls through to the meta tag
    assert detect_encoding(cp1251, header_charset="not-a-charset") == \
        "windows-1251"
    # no signal → utf-8
    assert detect_encoding(b"<html><body>hi</body></html>") == "utf-8"
    # decoded text round-trips through the declared encoding
    root = parse_html(cp1251)
    assert "привет" in root.get_text(separator=" ", strip=True)


def test_detect_encoding_chardet_branch(monkeypatch):
    """E1's chardet step (page_downloader.py:214-222) — exercised with a
    stub module since chardet isn't installed here (VERDICT r2 'What's
    missing' #4): a confident guess wins over the meta tag; low
    confidence or a null encoding falls through to it."""
    import sys
    import types

    from search_engine_spark.functions import html_extract
    from search_engine_spark.functions.html_extract import detect_encoding

    page = b"<html><head><meta charset=windows-1251></head></html>"

    def inject(result):
        # reset the import sentinel so the stubbed module is re-resolved
        monkeypatch.setattr(html_extract, "_CHARDET", None)
        mod = types.ModuleType("chardet")
        mod.detect = lambda raw: result
        monkeypatch.setitem(sys.modules, "chardet", mod)

    inject({"encoding": "koi8-r", "confidence": 0.99})
    assert detect_encoding(page) == "koi8-r"
    # header charset still wins over chardet
    assert detect_encoding(page, header_charset="utf-8") == "utf-8"
    inject({"encoding": "koi8-r", "confidence": 0.3})
    assert detect_encoding(page) == "windows-1251"
    inject({"encoding": None, "confidence": 0.9})
    assert detect_encoding(page) == "windows-1251"
    # absence is cached as False after the first failed lookup
    monkeypatch.setattr(html_extract, "_CHARDET", None)
    monkeypatch.delitem(sys.modules, "chardet", raising=False)
    assert detect_encoding(page) == "windows-1251"
    assert html_extract._CHARDET is False


def test_upsert_pages(spark):
    from search_engine_spark.sources.pages_source import upsert_pages

    base = spark.createDataFrame(
        [("u1", "old1"), ("u2", "old2")], "url string, text string"
    )
    updates = spark.createDataFrame(
        [("u2", "new2"), ("u3", "new3")], "url string, text string"
    )
    got = {r["url"]: r["text"] for r in upsert_pages(base, updates).collect()}
    assert got == {"u1": "old1", "u2": "new2", "u3": "new3"}
