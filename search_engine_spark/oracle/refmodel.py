"""Single-node Python reference model — the correctness oracle.

Implements, in plain dicts/lists, the *as-implemented* semantics of the
reference index (tokenizer T1-T4, per-doc aggregation B1, postings B2,
doc-length bookkeeping B3, stats B6/B7 — ``inverted_index.cpp:46-204``)
plus the documented-intent semantics where the reference is broken
(phrase/proximity on token *ordinals*, ``report/main.tex:788-795``;
SURVEY.md §5.1 explains why the C++ binaries can't be oracles), and
BM25 scoring with the engine constants (k1=1.2, b=0.75, Lucene-style
idf) since the reference's shipped scorer is the constant 1.0
(``query_evaluator.cpp:288-291``).

Rank order: (score desc, doc_id asc) — ``query_evaluator.h:22-28``.

The Spark engine must reproduce this model's outputs exactly; every
integration test compares against it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

from search_engine_spark.config import DEFAULT_CONFIG, EngineConfig
from search_engine_spark.functions.tokenizer import tokenize_text
from search_engine_spark.plans import query_parser as qp


@dataclass
class RefDoc:
    doc_id: int
    url: str
    title: str
    text: str
    doc_len: int = 0          # total tokens (BM25 |d|)
    unique_terms: int = 0     # reference Document.length (inverted_index.cpp:99-100)


class RefIndex:
    """In-memory inverted index with BM25."""

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.docs: List[RefDoc] = []
        # term -> list[(doc_id, tf, positions)] sorted by doc_id
        self.postings: Dict[str, List[Tuple[int, int, List[int]]]] = {}

    # -- build ------------------------------------------------------
    @staticmethod
    def from_rows(
        rows: Sequence[dict], cfg: EngineConfig = DEFAULT_CONFIG
    ) -> "RefIndex":
        """rows: dicts with url/title/text (+ optional warc_ts for dedup).

        Dedup: url normalization (E12, url_manager.py:57-85 — matching
        cfg.normalize_urls) then first-by-warc_ts per url (E13); doc_id
        = rank of url in sorted order (deterministic dense assignment,
        SURVEY §7.1).
        """
        from search_engine_spark.functions.source_parsers import normalize_url

        best: Dict[str, dict] = {}
        for r in rows:
            u = r["url"]
            if cfg.normalize_urls:
                u = normalize_url(u) or u
            if u not in best or (
                r.get("warc_ts") is not None
                and best[u].get("warc_ts") is not None
                and r["warc_ts"] < best[u]["warc_ts"]
            ):
                best[u] = r
        idx = RefIndex(cfg)
        for doc_id, url in enumerate(sorted(best)):
            r = best[url]
            idx._index_doc(doc_id, url, r.get("title", ""), r.get("text", "") or "")
        return idx

    def _index_doc(self, doc_id: int, url: str, title: str, text: str) -> None:
        tokens = tokenize_text(text, self.cfg)
        agg: Dict[str, List[int]] = {}
        for pos, t in enumerate(tokens):
            agg.setdefault(t, []).append(pos)
        for term, positions in agg.items():
            self.postings.setdefault(term, []).append(
                (doc_id, len(positions), positions)
            )
        self.docs.append(
            RefDoc(doc_id, url, title, text, doc_len=len(tokens),
                   unique_terms=len(agg))
        )

    # -- stats --------------------------------------------------------
    @property
    def n_docs(self) -> int:
        return len(self.docs)

    @property
    def avgdl(self) -> float:
        if not self.docs:
            return 0.0
        return sum(d.doc_len for d in self.docs) / len(self.docs)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def cf(self, term: str) -> int:
        return sum(tf for _, tf, _ in self.postings.get(term, ()))

    def stats(self) -> dict:
        """IndexStats (B6, inverted_index.cpp:158-204): avg_document_length
        averages the unique-terms length, reference parity."""
        total_postings = sum(len(v) for v in self.postings.values())
        # deterministic tie-break: highest df, then lexicographically
        # largest term (the reference's hash-order pick is nondeterministic)
        most = max(self.postings.items(), key=lambda kv: (len(kv[1]), kv[0]),
                   default=(None, []))
        return {
            "total_documents": self.n_docs,
            "total_terms": len(self.postings),
            "total_postings": total_postings,
            "avg_document_length": (
                sum(d.unique_terms for d in self.docs) / self.n_docs
                if self.n_docs else 0.0
            ),
            "avg_term_frequency": (
                total_postings / len(self.postings) if self.postings else 0.0
            ),
            "most_frequent_term": most[0],
        }

    # -- scoring ------------------------------------------------------
    def idf(self, term: str) -> float:
        d = self.df(term)
        return math.log((self.n_docs - d + 0.5) / (d + 0.5) + 1.0)

    def bm25(self, term: str, tf: int, doc_len: int) -> float:
        k1, b = self.cfg.k1, self.cfg.b
        denom = tf + k1 * (1.0 - b + b * doc_len / self.avgdl)
        return self.idf(term) * tf / denom

    def term_scores(self, term: str) -> Dict[int, float]:
        out: Dict[int, float] = {}
        for doc_id, tf, _ in self.postings.get(term, ()):
            out[doc_id] = self.bm25(term, tf, self.docs[doc_id].doc_len)
        return out

    # -- boolean / phrase evaluation ----------------------------------
    def _eval(self, node: qp.Node) -> Dict[int, float]:
        """doc_id -> accumulated BM25 score over matched positive terms."""
        if isinstance(node, qp.Term):
            return self.term_scores(node.term)
        if isinstance(node, qp.Phrase):
            docs = (
                self._phrase_docs(list(node.terms))
                if node.proximity is None
                else self._proximity_docs(list(node.terms), node.proximity)
            )
            out: Dict[int, float] = {}
            per_term = [self.term_scores(t) for t in node.terms]
            for d in docs:
                out[d] = sum(ts.get(d, 0.0) for ts in per_term)
            return out
        if isinstance(node, qp.Not):
            inner = self._eval(node.child)
            return {d.doc_id: 0.0 for d in self.docs if d.doc_id not in inner}
        if isinstance(node, qp.And):
            l, r = self._eval(node.left), self._eval(node.right)
            return {d: l[d] + r[d] for d in l.keys() & r.keys()}
        if isinstance(node, qp.Or):
            l, r = self._eval(node.left), self._eval(node.right)
            out = dict(l)
            for d, s in r.items():
                out[d] = out.get(d, 0.0) + s
            return out
        raise TypeError(node)

    def _positions(self, term: str) -> Dict[int, List[int]]:
        return {d: p for d, _, p in self.postings.get(term, ())}

    def _phrase_docs(self, terms: List[str]) -> Set[int]:
        """Documented-intent phrase: consecutive token ordinals."""
        if not terms:
            return set()
        pos = [self._positions(t) for t in terms]
        cand = set(pos[0])
        for p in pos[1:]:
            cand &= set(p)
        out: Set[int] = set()
        for d in cand:
            later = [set(p[d]) for p in pos[1:]]
            for start in pos[0][d]:
                if all((start + i + 1) in later[i] for i in range(len(later))):
                    out.add(d)
                    break
        return out

    def _proximity_docs(self, terms: List[str], max_dist: int) -> Set[int]:
        """Every term has an ordinal in [start, start+max_dist] for some
        occurrence `start` of the first term (query_evaluator.cpp:94-140
        intent, over ordinals)."""
        if not terms:
            return set()
        pos = [self._positions(t) for t in terms]
        cand = set(pos[0])
        for p in pos[1:]:
            cand &= set(p)
        out: Set[int] = set()
        for d in cand:
            later = [set(p[d]) for p in pos[1:]]
            for start in pos[0][d]:
                if all(
                    any(start <= q <= start + max_dist for q in s) for s in later
                ):
                    out.add(d)
                    break
        return out

    def search(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        """Top-k (doc_id, score), ordered (score desc, doc_id asc)."""
        ast = qp.parse(query)
        if ast is None:
            return []
        scores = self._eval(ast)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def count(self, query: str) -> int:
        ast = qp.parse(query)
        return 0 if ast is None else len(self._eval(ast))
