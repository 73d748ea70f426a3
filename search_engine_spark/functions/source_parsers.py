"""Source-specific extraction parsers, metadata/link extraction, and
URL normalization (SURVEY.md §2.2 E4–E10, E12).

Clean-room reimplementation of the reference parser family on the
stdlib mini-DOM from :mod:`html_extract` (the reference uses
BeautifulSoup — the *algorithm*, selector lists, and thresholds are the
contract, not the library):

* Wikipedia  — ``src/crawler/source_parsers.py:56-103``
* Habr       — ``source_parsers.py:116-179``
* StackOverflow — ``source_parsers.py:192-250``
* Generic (alt) — ``source_parsers.py:263-326``
* First-match dispatch — ``source_parsers.py:332-360``
* ``<meta>``/OG metadata — ``src/crawler/page_downloader.py:293-313``
* Link extraction — ``page_downloader.py:315-338``
* URL normalization — ``src/crawler/url_manager.py:57-85``

One recorded divergence: the reference returns ``list(set(links))[:N]``
whose order depends on Python's randomized string hashing — different
output every process. We return ``sorted(set(links))[:N]``: same set
semantics, deterministic order (required for reproducible pipelines and
the DuckDB oracle).

The Spark entry point is :func:`parse_pages_map` (mapInPandas; one
parse per page shared by title/content/metadata/links — zero extra
parse cost for the E9/E10 columns). URL normalization additionally has
a pure-column form (:func:`normalize_url_col`) usable ahead of the
dedup shuffle without any Python worker.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, Iterator, List, Optional, Tuple
from urllib.parse import urljoin, urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from search_engine_spark.functions.html_extract import Node, parse_html

# ---------------------------------------------------------------------------
# E12: URL normalization (url_manager.py:57-85)
# ---------------------------------------------------------------------------


_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


def normalize_url(url: str) -> Optional[str]:
    """Reference `_normalize_url` rule (drop the fragment, default the
    scheme to http://, lowercase the whole URL), implemented with the
    SAME regex semantics as :func:`normalize_url_col` so the Python
    refmodel and the JVM build path can never disagree (ADVICE r2: the
    earlier urlparse().geturl() form returned None on malformed urls
    and re-assembled others — e.g. dropped a bare trailing '?' — which
    the column form kept; an exotic url then surfaced as an
    engine/oracle doc_id mismatch). The reference lowercases
    ``parsed.geturl()``, not just the host; for well-formed web urls
    the two formulations agree (unit-pinned), and malformed ones now
    normalize identically on both sides by construction."""
    url = re.sub(r"#.*", "", url)
    if not re.match(_SCHEME_RE, url):
        url = "http://" + url
    return url.lower()


def normalize_url_col(c: Column) -> Column:
    """JVM column form of :func:`normalize_url` — usable ahead of the
    url dedup shuffle with no Python worker in the path. Matches the
    Python form for well-formed web URLs (the unit tests pin the two
    against each other on the reference's cases)."""
    defrag = F.regexp_replace(c, "#.*", "")
    with_scheme = F.when(
        defrag.rlike(_SCHEME_RE), defrag
    ).otherwise(F.concat(F.lit("http://"), defrag))
    return F.lower(with_scheme)


# ---------------------------------------------------------------------------
# E9: metadata extraction (page_downloader.py:293-313)
# ---------------------------------------------------------------------------


def extract_metadata(root: Node) -> Dict[str, str]:
    """All ``<meta>`` name/property/http-equiv → content (keys
    lowercased), then OG ``property^=og:`` tags keyed verbatim."""
    metadata: Dict[str, str] = {}
    for tag in root.find_all_attr("meta"):
        name = (
            tag.attrs.get("name")
            or tag.attrs.get("property")
            or tag.attrs.get("http-equiv")
        )
        content = tag.attrs.get("content")
        if name and content:
            metadata[name.lower()] = content
    for tag in root.find_all_attr("meta"):
        prop = tag.attrs.get("property", "")
        content = tag.attrs.get("content", "")
        if prop and prop.startswith("og:") and content:
            metadata[prop] = content
    return metadata


# ---------------------------------------------------------------------------
# E10: link extraction (page_downloader.py:315-338)
# ---------------------------------------------------------------------------

_SKIP_PREFIXES = ("javascript:", "mailto:", "tel:")
_SKIP_SUFFIXES = (
    ".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx",
    ".zip", ".rar", ".tar", ".gz", ".jpg", ".jpeg", ".png", ".gif",
)


def extract_links(root: Node) -> List[str]:
    """Raw hrefs in document order, skipping anchors, javascript/mailto/
    tel, and file links — exactly the reference filter set."""
    links: List[str] = []
    for a in root.find_all_attr("a"):
        href = a.attrs.get("href")
        if not href or href.startswith("#"):
            continue
        if href.startswith(_SKIP_PREFIXES):
            continue
        if href.lower().endswith(_SKIP_SUFFIXES):
            continue
        links.append(href)
    return links


# ---------------------------------------------------------------------------
# E4–E7: per-source parsers
# ---------------------------------------------------------------------------

_WIKI_SUFFIX_RE = re.compile(r"\s*—\s*Википедия\s*$")


def _meta_description(root: Node) -> str:
    tag = root.find_attr("meta", {"name": "description"}) or root.find_attr(
        "meta", {"property": "og:description"}
    )
    return tag.attrs.get("content", "") if tag else ""


def can_parse_wikipedia(url: str) -> bool:
    return "wikipedia.org" in urlparse(url).netloc


def parse_wikipedia(url: str, root: Node) -> dict:
    """E4 (source_parsers.py:56-103)."""
    title = ""
    title_tag = root.find_attr("h1", {"class": "firstHeading"}) or root.find(
        "title"
    )
    if title_tag:
        title = _WIKI_SUFFIX_RE.sub("", title_tag.get_text("", strip=True))
    content = ""
    links: List[str] = []
    content_div = root.find_attr("div", attrs={"id": "mw-content-text"})
    if content_div:
        content_div.decompose_matching(
            ("table", "div"),
            {"class": ["toc", "navbox", "vertical-navbox", "infobox"]},
        )
        content = " ".join(
            p.get_text("", strip=True) for p in content_div.find_all_attr("p")
        )
        for a in content_div.find_all_attr("a"):
            href = a.attrs.get("href")
            if href and href.startswith("/wiki/") and ":" not in href:
                links.append(urljoin(url, href))
    return {
        "url": url,
        "title": title,
        "content": content,
        "meta_description": _meta_description(root),
        "links": sorted(set(links))[:50],
        "source": "wikipedia",
        "language": "ru" if ".ru." in url else "en",
    }


def can_parse_habr(url: str) -> bool:
    return "habr.com" in urlparse(url).netloc


def parse_habr(url: str, root: Node) -> dict:
    """E5 (source_parsers.py:116-179)."""
    title_tag = root.find_attr("h1", {"class": "tm-title"}) or root.find("h1")
    title = title_tag.get_text("", strip=True) if title_tag else ""
    content = ""
    links: List[str] = []
    body = root.find_attr("div", {"class": "tm-article-body"}) or root.find(
        "article"
    )
    if body:
        body.decompose_matching(
            ("div", "aside"),
            {"class": ["tm-article-poll", "tm-advertisement"]},
        )
        content = body.get_text(" ", strip=True)
        for a in body.find_all_attr("a"):
            href = a.attrs.get("href")
            if href and ("/articles/" in href or "/posts/" in href):
                links.append(urljoin(url, href))
    tags = [
        t.get_text("", strip=True)
        for t in root.find_all_attr("a", {"class": "tm-tags-list__link"})
    ]
    author_tag = root.find_attr("a", {"class": "tm-user-info__username"})
    time_tag = root.find("time")
    date = ""
    if time_tag:
        date = time_tag.attrs.get("datetime", "") or time_tag.attrs.get(
            "title", ""
        )
    return {
        "url": url,
        "title": title,
        "content": content,
        "meta_description": _meta_description(root),
        "tags": tags,
        "author": author_tag.get_text("", strip=True) if author_tag else "",
        "published_date": date,
        "links": sorted(set(links))[:30],
        "source": "habr",
        "language": "ru",
    }


def can_parse_stackoverflow(url: str) -> bool:
    netloc = urlparse(url).netloc
    return "ru.stackoverflow.com" in netloc or "stackoverflow.com" in netloc


def parse_stackoverflow(url: str, root: Node) -> dict:
    """E6 (source_parsers.py:192-250): question + top-3 answers."""
    title_tag = root.find_attr("h1", {"itemprop": "name"}) or root.find_attr(
        "a", {"class": "s-link"}
    )
    title = title_tag.get_text("", strip=True) if title_tag else ""
    question_div = root.find_attr("div", {"class": "s-prose"}) or root.find_attr(
        "div", {"class": "question"}
    )
    question = question_div.get_text(" ", strip=True) if question_div else ""
    answers: List[str] = []
    for answer_div in root.find_all_attr("div", {"class": "answer"})[:3]:
        body = answer_div.find_attr("div", {"class": "s-prose"})
        if body:
            answers.append(body.get_text(" ", strip=True))
    content = f"{question} {' '.join(answers)}"
    tags = [
        t.get_text("", strip=True)
        for t in root.find_all_attr("a", {"class": "post-tag"})
    ]
    links: List[str] = []
    sidebar = root.find_attr("div", attrs={"id": "sidebar"})
    if sidebar:
        for a in sidebar.find_all_attr("a"):
            href = a.attrs.get("href")
            if href and "/questions/" in href:
                links.append(urljoin(url, href))
    return {
        "url": url,
        "title": title,
        "content": content,
        "meta_description": _meta_description(root),
        "tags": tags,
        "answers_count": len(answers),
        "links": sorted(set(links))[:20],
        "source": "stackoverflow",
        "language": "ru" if "ru.stackoverflow" in url else "en",
    }


def parse_generic_alt(url: str, root: Node) -> dict:
    """E7 (source_parsers.py:263-326) — the ALTERNATE generic parser
    (h1-first title, p/div/span blocks > 50 chars, same-domain links);
    distinct from the page_downloader generic algorithm in
    html_extract.extract_text."""
    title_tag = root.find("h1") or root.find("title")
    title = title_tag.get_text("", strip=True) if title_tag else ""
    main_content = (
        root.find("main")
        or root.find("article")
        or root.find_attr(
            "div",
            {"class": ["content", "post-content", "article-content",
                       "main-content"]},
        )
        or root.find("body")
    )
    content = ""
    if main_content:
        main_content.decompose_matching(("nav", "aside", "footer", "header"))
        texts = []
        for p in main_content.find_all_attr(("p", "div", "span")):
            text = p.get_text("", strip=True)
            if len(text) > 50:
                texts.append(text)
        content = " ".join(texts)
    base_domain = urlparse(url).netloc
    links: List[str] = []
    for a in root.find_all_attr("a"):
        href = a.attrs.get("href")
        if not href:
            continue
        full = urljoin(url, href)
        if urlparse(full).netloc == base_domain:
            links.append(full)
    return {
        "url": url,
        "title": title,
        "content": content,
        "meta_description": _meta_description(root),
        "links": sorted(set(links))[:40],
        "source": "generic",
        "language": "unknown",
    }


# ---------------------------------------------------------------------------
# E8: first-match dispatch (source_parsers.py:332-360)
# ---------------------------------------------------------------------------

_PARSERS: Tuple[tuple, ...] = (
    (can_parse_wikipedia, parse_wikipedia),
    (can_parse_habr, parse_habr),
    (can_parse_stackoverflow, parse_stackoverflow),
    (lambda url: True, parse_generic_alt),
)


def dispatch_parse(url: str, html) -> dict:
    """Parse with the first parser whose ``can_parse(url)`` accepts —
    Generic is the catch-all. The page is parsed into the mini-DOM
    once; metadata (E9) and raw links (E10) come from the same tree."""
    root = parse_html(html if html is not None else "")
    # E9/E10 read the pristine tree (the reference runs them on their
    # own BeautifulSoup instance); parsers may decompose subtrees below
    metadata = extract_metadata(root)
    raw_links = extract_links(root)
    for can, parse in _PARSERS:
        if can(url):
            out = parse(url, root)
            break
    out["metadata"] = metadata
    out["raw_links"] = raw_links
    return out


_PARSE_COLUMNS = (
    "url", "source", "title", "content", "meta_description", "language",
    "metadata", "links", "raw_links",
)

PARSE_SCHEMA = (
    "url string, source string, title string, content string, "
    "meta_description string, language string, "
    "metadata map<string,string>, links array<string>, "
    "raw_links array<string>"
)


def parse_pages_map(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas over pages(url, html[, …]) → one row per page with
    the dispatched parser's output plus metadata/links columns."""
    for pdf in batches:
        rows = {c: [] for c in _PARSE_COLUMNS}
        html_col = (
            pdf["html"] if "html" in pdf.columns else [None] * len(pdf)
        )
        for url, html in zip(pdf["url"], html_col):
            out = dispatch_parse(url, html)
            for c in _PARSE_COLUMNS:
                rows[c].append(out.get(c))
        yield pd.DataFrame(rows)
