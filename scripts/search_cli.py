"""Interactive / one-shot search CLI — the reference service shape.

Mirrors ``boolean_search/src/main.cpp:92-205`` (args ``--index
--query --limit --stats --interactive``; per-hit "N. Document #id /
Title / URL / Snippet" output; ``quit``/``exit`` to leave the REPL) and
the Python wrapper's export flag (``scripts/search_cli.py:169-190``:
``--export`` writes the result JSON).

The REPL body is a plain function over streams (:func:`repl`) so tests
drive it in-process; ``main`` wires a SparkSession + SearchEngine
around it.

Usage::

    spark-submit [--py-files ZIP] scripts/search_cli.py \
        --index /path/to/index [--query 'a && b'] [--limit 10] \
        [--interactive] [--stats stats.json] [--export results.json]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def format_hits(engine, query: str, limit: int, out) -> int:
    """One query → reference-shaped result block. Returns hit count."""
    t0 = time.time()
    try:
        rows = engine.search_with_snippets(query, k=limit).collect()
    except Exception as e:  # parse errors → reference's Error: line
        out.write(f"Error: {e}\n\n")
        return -1
    ms = (time.time() - t0) * 1000
    total = engine.count(query)
    out.write(
        f"Found {total} documents (showing {len(rows)}) in {ms:.1f} ms\n\n"
    )
    for i, r in enumerate(rows, start=1):
        out.write(f"{i}. Document #{r['doc_id']}\n")
        out.write(f"   Title: {r['title'] or ''}\n")
        out.write(f"   URL: {r['url'] or ''}\n")
        if r["snippet"]:
            out.write(f"   Snippet: {r['snippet']}\n")
        out.write("\n")
    return len(rows)


def repl(engine, limit: int, in_stream, out) -> int:
    """Interactive loop (main.cpp:27-90): blank lines skipped,
    ``quit``/``exit`` ends, anything else searches."""
    out.write("=== Interactive Search Mode ===\n")
    out.write("Enter queries (or 'quit' to exit):\n\n")
    n_queries = 0
    for line in in_stream:
        query = line.strip()
        if not query:
            continue
        if query in ("quit", "exit"):
            break
        format_hits(engine, query, limit, out)
        n_queries += 1
    return n_queries


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query")
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--interactive", action="store_true")
    ap.add_argument("--stats", help="export search-stats JSON here")
    ap.add_argument("--export", help="export result JSON here")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()
    if not args.interactive and not args.query:
        ap.error("--query is required (or use --interactive)")

    from search_engine_spark.operators.exports import (
        export_results_json,
        export_search_stats,
    )
    from search_engine_spark.operators.query_eval import SearchEngine
    from search_engine_spark.session import build_session

    print("=== Boolean Search Engine ===\n")
    print(f"Loading index from {args.index}...")
    spark = build_session(cpus=args.cpus, app_name="search_cli")
    engine = SearchEngine(spark, args.index)
    print("Index loaded successfully!\n")

    if args.interactive:
        repl(engine, args.limit, sys.stdin, sys.stdout)
    else:
        print(f"Query: {args.query}\nSearching...\n")
        format_hits(engine, args.query, args.limit, sys.stdout)
        if args.export:
            export_results_json(engine, args.query, args.export, args.limit)
            print(f"Results exported to {args.export}")
    if args.stats:
        export_search_stats(engine.query_log, args.stats)
        print(f"Statistics exported to {args.stats}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
