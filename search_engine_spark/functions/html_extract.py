"""HTML -> (title, text) extraction — the per-row invariant surface.

Clean-room reimplementation of the reference's generic extraction
algorithm (``src/crawler/page_downloader.py:249-291`` ``_extract_text``,
``:242-247`` ``_extract_title``) on a stdlib ``html.parser`` mini-DOM
(BeautifulSoup/lxml are not available in this environment; the algorithm
— not the library — is the contract):

1. Decompose (remove subtree incl. text) every ``script, style, nav,
   footer, header, aside`` element.
2. For each selector in order ``article``, ``main``, ``.content``,
   ``#content``, ``.post-content``, ``.entry-content``,
   ``.article-content``: collect all matching elements in document
   order; take ``get_text(separator=' ', strip=True)``; keep texts
   longer than 100 chars.  (The reference loop does NOT break after the
   first matching selector — an element matched by several selectors is
   appended several times; replicated.)
3. If nothing matched: the whole ``<body>`` text.
4. ``' '.join(parts)``, collapse ``\\s+`` -> single space, strip.

``get_text(separator=' ', strip=True)`` = join of per-text-node
stripped strings, skipping strings that are empty after strip, in
document order — BeautifulSoup's documented behavior.

The Spark-facing entry point is :func:`extract_pages_map`, a
``mapInPandas`` generator (Arrow-batched; no per-row Python UDFs).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterable, Iterator, List, Optional, Tuple, Union

import pandas as pd

REMOVE_TAGS = frozenset({"script", "style", "nav", "footer", "header", "aside"})

# Reference selector order (page_downloader.py:258-266).
CONTENT_SELECTORS: Tuple[str, ...] = (
    "article",
    "main",
    ".content",
    "#content",
    ".post-content",
    ".entry-content",
    ".article-content",
)

MIN_CONTENT_CHARS = 100  # page_downloader.py:273

VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

_WS_RE = re.compile(r"\s+")
_NL_RE = re.compile(r"\n+")


class Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: Optional[dict] = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: List[Union["Node", str]] = []

    # -- traversal -------------------------------------------------
    def iter_elements(self) -> Iterator["Node"]:
        """Document-order element iterator (self excluded).

        Iterative pre-order with an explicit stack — recursive
        ``yield from`` pays O(depth) per element through the generator
        chain, which dominated the extraction profile."""
        stack = self.children[::-1]
        while stack:
            c = stack.pop()
            if isinstance(c, Node):
                yield c
                if c.children:
                    stack.extend(c.children[::-1])

    def classes(self) -> List[str]:
        return (self.attrs.get("class") or "").split()

    def get_text(self, separator: str = " ", strip: bool = True) -> str:
        parts: List[str] = []

        def walk(n: "Node") -> None:
            for c in n.children:
                if isinstance(c, str):
                    s = c.strip() if strip else c
                    if s:
                        parts.append(s)
                else:
                    walk(c)

        walk(self)
        return separator.join(parts)

    def decompose_tags(self, tags: frozenset) -> None:
        self.children = [
            c for c in self.children if not (isinstance(c, Node) and c.tag in tags)
        ]
        for c in self.children:
            if isinstance(c, Node):
                c.decompose_tags(tags)

    def find(self, tag: str) -> Optional["Node"]:
        for el in self.iter_elements():
            if el.tag == tag:
                return el
        return None

    # -- attribute-aware search (the source-parser surface, E4-E8) -----
    def _matches(self, el: "Node", tags, attrs: Optional[dict]) -> bool:
        if tags is not None:
            tset = (tags,) if isinstance(tags, str) else tuple(tags)
            if el.tag not in tset:
                return False
        if attrs:
            for k, v in attrs.items():
                if k == "class":
                    want = (v,) if isinstance(v, str) else tuple(v)
                    if not any(c in el.classes() for c in want):
                        return False
                else:
                    if el.attrs.get(k) != v:
                        return False
        return True

    def find_all_attr(self, tags=None, attrs: Optional[dict] = None
                      ) -> List["Node"]:
        """BeautifulSoup-style ``find_all(tag(s), {attr: value})``:
        ``class`` matches if the element's class list contains ANY of
        the given class names; other attrs match exactly."""
        return [el for el in self.iter_elements()
                if self._matches(el, tags, attrs)]

    def find_attr(self, tags=None, attrs: Optional[dict] = None
                  ) -> Optional["Node"]:
        for el in self.iter_elements():
            if self._matches(el, tags, attrs):
                return el
        return None

    def decompose_matching(self, tags, attrs: Optional[dict] = None) -> None:
        """Remove (subtree incl. text) every descendant matching
        ``find_all_attr(tags, attrs)`` — BeautifulSoup ``decompose``."""
        self.children = [
            c
            for c in self.children
            if not (isinstance(c, Node) and self._matches(c, tags, attrs))
        ]
        for c in self.children:
            if isinstance(c, Node):
                c.decompose_matching(tags, attrs)

    def select(self, selector: str) -> List["Node"]:
        """Minimal CSS select: bare tag, ``.class``, ``#id``."""
        out: List[Node] = []
        if selector.startswith("."):
            cls = selector[1:]
            for el in self.iter_elements():
                if cls in el.classes():
                    out.append(el)
        elif selector.startswith("#"):
            ident = selector[1:]
            for el in self.iter_elements():
                if el.attrs.get("id") == ident:
                    out.append(el)
        else:
            for el in self.iter_elements():
                if el.tag == selector:
                    out.append(el)
        return out

    def select_many(self, selectors) -> dict:
        """``{selector: select(selector)}`` for several selectors in
        ONE document-order walk (extract_text runs 7 selectors per
        page; per-selector walks dominated the extraction profile).
        Result lists are identical to per-selector ``select``."""
        by_tag: dict = {}
        by_cls: dict = {}
        by_id: dict = {}
        out: dict = {s: [] for s in selectors}
        for s in out:  # deduped — a repeated selector must not double-bucket
            if s.startswith("."):
                by_cls.setdefault(s[1:], []).append(out[s])
            elif s.startswith("#"):
                by_id.setdefault(s[1:], []).append(out[s])
            else:
                by_tag.setdefault(s, []).append(out[s])
        for el in self.iter_elements():
            buckets = by_tag.get(el.tag)
            if buckets:
                for b in buckets:
                    b.append(el)
            if by_cls:
                cl = el.classes()
                if cl:
                    # membership test per selector (not per class
                    # token) so duplicated class tokens can't
                    # double-append vs select()'s semantics
                    for cname, buckets in by_cls.items():
                        if cname in cl:
                            for b in buckets:
                                b.append(el)
            if by_id:
                ident = el.attrs.get("id")
                if ident is not None:
                    buckets = by_id.get(ident)
                    if buckets:
                        for b in buckets:
                            b.append(el)
        return out


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack: List[Node] = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        node = Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.stack[-1].children.append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag: str) -> None:
        # pop to the nearest matching open tag (lenient, like html.parser
        # tree builders); ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].children.append(data)


_CHARSET_META_RE = __import__("re").compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?\s*([A-Za-z0-9_.:-]+)", __import__("re").I
)

# chardet import sentinel: None = not yet tried, False = unavailable
_CHARDET = None


def detect_encoding(html: bytes, header_charset: str | None = None) -> str:
    """E1 (page_downloader.py:207-240): HTTP-header charset → chardet
    (confidence > 0.7; optional dependency, absent in this container) →
    <meta charset> tag → utf-8."""
    if header_charset:
        try:
            b"x".decode(header_charset)
            return header_charset
        except (LookupError, UnicodeDecodeError):
            pass
    # NOTE: the import is resolved lazily per call but the sentinel
    # avoids re-searching sys.path on every document when chardet is
    # absent — a failed import triggers a full path scan, which
    # profiled at ~27% of the whole extraction kernel.
    global _CHARDET
    if _CHARDET is None:
        try:
            import chardet  # pragma: no cover - not installed here

            _CHARDET = chardet
        except ImportError:
            _CHARDET = False
    if _CHARDET:
        guess = _CHARDET.detect(html[:65536])
        if guess.get("confidence", 0) > 0.7 and guess.get("encoding"):
            return guess["encoding"]
    m = _CHARSET_META_RE.search(html[:65536])
    if m:
        enc = m.group(1).decode("ascii", errors="replace")
        try:
            b"x".decode(enc)
            return enc
        except (LookupError, UnicodeDecodeError):
            pass
    return "utf-8"


def parse_html(html: Union[bytes, str],
               header_charset: str | None = None) -> Node:
    if isinstance(html, (bytes, bytearray)):
        raw = bytes(html)
        html = raw.decode(detect_encoding(raw, header_charset),
                          errors="replace")
    p = _TreeBuilder()
    p.feed(html)
    p.close()
    return p.root


def extract_title(root: Node) -> str:
    t = root.find("title")
    return t.get_text(separator="", strip=True).strip() if t else ""


def extract_text(root: Node) -> str:
    root.decompose_tags(REMOVE_TAGS)
    parts: List[str] = []
    selected = root.select_many(CONTENT_SELECTORS)
    for selector in CONTENT_SELECTORS:
        for el in selected[selector]:
            text = el.get_text(separator=" ", strip=True)
            if len(text) > MIN_CONTENT_CHARS:
                parts.append(text)
    if not parts:
        body = root.find("body")
        if body is not None:
            parts.append(body.get_text(separator=" ", strip=True))
    full = " ".join(parts)
    full = _WS_RE.sub(" ", full)
    full = _NL_RE.sub("\n", full)  # no-op after \s+ collapse; kept for parity
    return full.strip()


def extract_html(html: Union[bytes, str, None]) -> Tuple[str, str]:
    """(title, text) from raw HTML — the single-row oracle form."""
    if html is None:
        return "", ""
    root = parse_html(html)
    title = extract_title(root)
    text = extract_text(root)  # mutates (decomposes) — title read first
    return title, text


def extract_pages_map(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas generator: pages(url, warc_ts, html, text, lang, ...)
    -> (url, title, text, lang).

    When the ``text`` column is already populated it is passed through
    (the per-row invariant demands extraction output == provided text;
    tests assert that); nulls are filled by extraction from ``html``.
    """
    for pdf in batches:
        titles: List[str] = []
        texts: List[str] = []
        html_col = pdf["html"] if "html" in pdf.columns else pd.Series([None] * len(pdf))
        text_col = pdf["text"] if "text" in pdf.columns else pd.Series([None] * len(pdf))
        for html, pre in zip(html_col, text_col):
            if isinstance(pre, str) and pre:
                title, text = (extract_html(html)[0] if html is not None else ""), pre
            else:
                title, text = extract_html(html)
            titles.append(title)
            texts.append(text)
        out = pd.DataFrame(
            {
                "url": pdf["url"],
                "title": titles,
                "text": texts,
                "lang": pdf.get("lang", pd.Series([""] * len(pdf))),
            }
        )
        yield out
