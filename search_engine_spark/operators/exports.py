"""Index/search export surfaces (SURVEY.md §2.1 S9-S12, §2.6 V15-V16).

The reference ships several debug/ops exports; here they are as plans
over the index store:

* S9  index text export     — term-sorted dictionary + postings dump
* S10 build-stats export    — docs/sec, tokens/sec, totals (JSON)
* S11 search-stats export   — latency min/max/median + histogram
* S12 result JSON export    — query + ranked results
* V16 regex search          — `rlike` filter over docs text (the
  reference's Mongo $regex alternate path, simple_python_search.py)
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_index_text(store, spark: SparkSession, out_dir: str,
                      fmt: str = "json") -> None:
    """S9 (inverted_index.cpp:445-499): stats header + term-ascending
    dictionary and postings dumps. The reference bubble-sorts terms; we
    let the shuffle sort."""
    dictionary = store.read_stage(spark, "dictionary").orderBy("term")
    postings = (
        store.read_stage(spark, "postings")
        .select("term", "doc_id", "tf")
        .orderBy("term", "doc_id")
    )
    writer = lambda df, name: getattr(
        df.coalesce(1).write.mode("overwrite"), fmt
    )(os.path.join(out_dir, name))
    writer(dictionary, "dictionary")
    writer(postings, "postings")
    meta = store.read_meta()
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(meta.get("stats", {}), f, indent=1, ensure_ascii=False)


def export_build_stats(store, out_path: str) -> dict:
    """S10 (index_builder.cpp:248-277): docs/sec + tokens/sec from the
    persisted stats/timings — no extra Spark job."""
    meta = store.read_meta()
    stats = meta.get("stats", {})
    timings = meta.get("timings", {})
    total_s = sum(timings.values()) or 1.0
    out = {
        "total_documents": stats.get("total_documents", 0),
        "total_tokens": stats.get("total_tokens", 0),
        "total_terms": stats.get("total_terms", 0),
        "total_postings": stats.get("total_postings", 0),
        "build_seconds": round(total_s, 3),
        "docs_per_sec": round(stats.get("total_documents", 0) / total_s, 3),
        "tokens_per_sec": round(stats.get("total_tokens", 0) / total_s, 3),
        "stage_timings_s": timings,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    return out


def export_search_stats(query_log: List[dict], out_path: str,
                        bins: int = 10) -> dict:
    """S11/V15 (boolean_search.cpp:153-215): per-query latency summary +
    fixed-width histogram (driver-side; the log is driver-sized)."""
    import statistics

    lat = sorted(q["wall_ms"] for q in query_log)
    if not lat:
        out = {"queries": 0}
    else:
        lo, hi = lat[0], lat[-1]
        width = (hi - lo) / bins or 1.0
        hist = [0] * bins
        for v in lat:
            hist[min(int((v - lo) / width), bins - 1)] += 1
        out = {
            "queries": len(lat),
            "mean_ms": round(statistics.fmean(lat), 3),
            "median_ms": round(statistics.median(lat), 3),
            "min_ms": round(lo, 3),
            "max_ms": round(hi, 3),
            "histogram": {
                "bin_width_ms": round(width, 3),
                "counts": hist,
            },
        }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    return out


def export_results_json(engine, query: str, out_path: str,
                        limit: int = 10) -> dict:
    """S12 (search_cli.py:169-190): {query, results: [{rank, doc_id,
    score, url, title}]} as one JSON file."""
    rows = engine.search(query, limit).collect()
    out = {
        "query": query,
        "total_returned": len(rows),
        "results": [
            {
                "rank": i + 1,
                "doc_id": int(r["doc_id"]),
                "score": float(r["score"]),
                "url": r["url"],
                "title": r["title"],
            }
            for i, r in enumerate(rows)
        ],
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    return out


def flat_text_export(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    single_file: bool = False,
    partitions: int = 8,
) -> DataFrame:
    """S5 (scripts/export_to_cpp.py:77-153): one line per doc
    ``"{title}. {content}"`` (fields trimmed, ``\\n``→space, ``\\r``
    dropped), docs with empty content skipped, plus a
    ``metadata.json``-shaped sidecar mapping the export ordinal to
    (title, url, source doc_id). The export ordinal renumbers the
    surviving docs densely in doc_id order — the reference numbers by
    cursor order; doc_id order is our deterministic equivalent.

    Lines are written under ``out_dir/documents/`` as ordered part
    files (part order × in-part order == ordinal order) and the sidecar
    under ``out_dir/metadata/`` as JSON rows; ``single_file=True``
    coalesces both to one part (driver-friendly, small exports only).
    Returns the (export_id, line, title, url, doc_id) frame."""
    from search_engine_spark.operators.index_build import global_ordinal

    line = F.regexp_replace(
        F.regexp_replace(
            F.concat_ws(
                "",
                F.trim(F.coalesce(F.col("title"), F.lit(""))),
                F.lit(". "),
                F.trim(F.col("text")),
            ),
            "\n",
            " ",
        ),
        "\r",
        "",
    )
    src = (
        docs.filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select(
            F.col("doc_id").alias("src_doc_id"),
            "url",
            F.trim(F.coalesce(F.col("title"), F.lit(""))).alias("title"),
            line.alias("line"),
        )
    )
    numbered = global_ordinal(
        src, [F.col("src_doc_id").asc()], "export_id", max(1, partitions)
    )
    out = numbered.select(
        "export_id", "line", "title", "url",
        F.col("src_doc_id").alias("doc_id"),
    )
    writer_docs = out.select(F.col("line").alias("value"))
    writer_meta = out.select("export_id", "title", "url", "doc_id")
    if single_file:
        writer_docs = writer_docs.coalesce(1)
        writer_meta = writer_meta.coalesce(1)
    writer_docs.write.mode("overwrite").text(os.path.join(out_dir, "documents"))
    writer_meta.write.mode("overwrite").json(os.path.join(out_dir, "metadata"))
    return out


def regex_search(docs: DataFrame, pattern: str,
                 not_pattern: Optional[str] = None,
                 text_col: str = "text", k: Optional[int] = None) -> DataFrame:
    """V16 (simple_python_search.py:41-146): case-insensitive regex
    match over text, optional NOT pattern — the documented alternate
    query path. Pure `rlike` filters (JVM regex, full codegen)."""
    out = docs.filter(F.col(text_col).rlike(f"(?i){pattern}"))
    if not_pattern:
        out = out.filter(~F.col(text_col).rlike(f"(?i){not_pattern}"))
    if k is not None:
        out = out.limit(k)
    return out


def regex_search_query(docs: DataFrame, query: str,
                       text_col: str = "text",
                       title_col: Optional[str] = None,
                       k: Optional[int] = None) -> DataFrame:
    """V16 composed (VERDICT r2 #7): boolean AND/OR/NOT lists of regex
    conditions, mirroring the reference's query grammar
    (simple_python_search.py:41-64): split on '&&' → AND of conditions,
    else '||' → OR, else a leading '!' → NOT, else whitespace-separated
    implicit AND. Each positive condition matches when the
    case-insensitive regex hits the title OR the text (the reference's
    $or over both fields, :92-146); a NOT condition requires neither.

    Divergence, recorded: the reference's parser only strips '!' on a
    bare single-condition query, so '!x' INSIDE a compound query is
    regex-matched literally there; here '!'-prefixed conditions negate
    in every position — the evident intent of the grammar. Everything
    stays `rlike` column logic (JVM regex, whole-stage codegen)."""
    from functools import reduce as _reduce

    def cond(term: str):
        c = F.col(text_col).rlike(f"(?i){term}")
        if title_col is not None:
            c = c | F.col(title_col).rlike(f"(?i){term}")
        return c

    def signed(part: str):
        part = part.strip()
        if part.startswith("!"):
            return ~cond(part[1:].strip())
        return cond(part)

    q = query.strip().lower()
    if "&&" in q:
        pred = _reduce(lambda a, b: a & b,
                       [signed(p) for p in q.split("&&")])
    elif "||" in q:
        pred = _reduce(lambda a, b: a | b,
                       [signed(p) for p in q.split("||")])
    elif q.startswith("!"):
        pred = ~cond(q[1:].strip())
    else:
        parts = q.split()
        pred = _reduce(lambda a, b: a & b, [cond(p) for p in parts])
    out = docs.filter(pred)
    if k is not None:
        out = out.limit(k)
    return out
