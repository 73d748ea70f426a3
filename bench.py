"""Benchmark harness — one JSON line to stdout.

Runs the engine's headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32):

* index_build  — full pipeline over `documents` as the pages corpus
                 (extract → tokenize → postings → dictionary →
                 compressed blocks, all persisted) — the north-rule
                 docs/sec metric.
* q_*          — BM25 single-term / boolean / phrase top-k, analytics
                 (zipf), dedup (minhash-LSH), ANN (brute cosine top-k).

Output: {"metric": "index_docs_per_sec", "value": N, "unit": "sec",
"queries": {name: seconds}, "sf": dir, ...}.

Scaling-efficiency evidence (north_rule N→4N): run twice —
SPARK_GRAFT_CPUS=8 then 32 — via scripts/scaling_bench.py, which
records both throughputs and their efficiency into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _box_state() -> dict:
    """Light stream-bandwidth sample via the shared probe
    (scripts/membw_probe.quick_stream_state)."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "scripts"))
        import membw_probe

        return membw_probe.quick_stream_state()
    except Exception:  # pragma: no cover - probe must never fail bench
        return {}


def _wait_for_healthy_window() -> dict:
    """Retry-until-healthy (VERDICT r3 #7): this box's memory bandwidth
    is bimodal (~20.5 GB/s healthy vs ~2-7 degraded for stretches), and
    a bench run in a degraded window understates the code by multiples.
    Probe the 4-core stream bandwidth; below the threshold, sleep and
    re-probe until the wait budget runs out, then run anyway with the
    outcome recorded so the number is auditable.

    Env knobs: SPARK_GRAFT_HEALTHY_BW (GB/s threshold, 0 disables;
    default 12), SPARK_GRAFT_HEALTHY_WAIT_S (budget; default 600 —
    the box recovers from work-induced degradation in 2-4 idle min),
    SPARK_GRAFT_HEALTHY_PROBE_S (re-probe interval; default 45)."""
    thr = float(os.environ.get("SPARK_GRAFT_HEALTHY_BW", "12"))
    budget = float(os.environ.get("SPARK_GRAFT_HEALTHY_WAIT_S", "600"))
    interval = float(os.environ.get("SPARK_GRAFT_HEALTHY_PROBE_S", "45"))
    if thr <= 0:
        return {"healthy_wait": "disabled"}
    t0 = time.time()
    while True:
        bw = _box_state().get("stream_bw_4core_total_gb_s")
        waited = round(time.time() - t0, 1)
        if bw is None:
            # probe unavailable ≠ degraded window (ADVICE r4): without a
            # reading there is nothing to wait FOR — run now, flagged
            return {"healthy_wait": "unprobed", "healthy_wait_s": waited}
        if bw >= thr:
            return {"healthy_wait": "healthy", "healthy_wait_s": waited,
                    "healthy_wait_bw": bw}
        if time.time() - t0 + interval > budget:
            # all probed windows degraded — run anyway, say so
            return {"healthy_wait": "timeout", "healthy_wait_s": waited,
                    "healthy_wait_bw": bw}
        print(f"[bench] stream bw {bw} GB/s < {thr}; waiting for a "
              f"healthy window ({waited}/{budget}s)", file=sys.stderr)
        time.sleep(interval)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    healthy = _wait_for_healthy_window()
    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query_eval import SearchEngine
    from search_engine_spark.session import build_session

    # tmpfs for shuffle + index: the microVM block layer injects
    # one-sided multi-10s stalls under parallel IO (see CLAUDE.md)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    spark = build_session(cpus=cpus, shuffle_partitions=max(cpus, 8),
                          app_name="search_engine_bench",
                          local_dir=os.path.join(shm, "se_bench_local"))

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pages = docs.select(
        F.format_string("doc://%09d", F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )
    n_docs = pages.count()

    cfg = EngineConfig(index_partitions=max(cpus, 8))
    idx_dir = tempfile.mkdtemp(prefix="se_bench_idx_", dir=shm)
    timings: dict = {}
    try:
        # two builds: run 1 is cold (python-worker spin-up, JIT — the
        # r1-comparable number), run 2 is steady-state; report the min
        # as the throughput headline and BOTH raw walls for
        # transparency (one-sided microVM stalls; see bench() note)
        build_runs = []
        for i in range(2):
            d = idx_dir if i == 0 else tempfile.mkdtemp(
                prefix="se_bench_idx2_", dir=shm
            )
            t0 = time.time()
            build_index(spark, pages, d, cfg=cfg, resume=False)
            build_runs.append(round(time.time() - t0, 3))
            if i > 0:
                shutil.rmtree(d, ignore_errors=True)
        build_s = min(build_runs)
        timings["index_build"] = round(build_s, 3)

        eng = SearchEngine(spark, idx_dir)
        # warm the caches once so query timings measure the query path
        eng.docmeta.count()
        eng.blocks.count()

        # best-of-K (default 2): the microVM block layer / THP
        # compaction inject one-sided multi-second stalls (CLAUDE.md);
        # the min of K runs is the documented noise discipline for
        # this box. SPARK_GRAFT_BENCH_TRIALS raises K for dedicated
        # variance checks (e.g. the q_or best-of-5 watch, VERDICT r3 #8)
        trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))

        def bench(name: str, fn) -> None:
            best = None
            for _ in range(trials):
                t = time.time()
                fn()
                dt = time.time() - t
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)

        bench("q_term", lambda: eng.search("join", 10).collect())
        bench("q_and", lambda: eng.search("join && fast", 10).collect())
        bench("q_or", lambda: eng.search("slow || vector", 10).collect())
        bench("q_not", lambda: eng.search("join && !fast", 10).collect())
        # mixed AND/OR tree — exercises the general boolean-tree WAND
        # path (same shape as the gate's bool_complex query)
        bench(
            "q_bool_mixed",
            lambda: eng.search(
                "(join && fast) || (slow && !vector)", 10
            ).collect(),
        )
        # metadata-filtered search — the r3 weak spot: θ now comes from
        # a filtered phase 1, so this pays the pruned plan + one pushed
        # docmeta scan instead of a full multi-term block decode
        bench(
            "q_filter",
            lambda: eng.search(
                "join || vector", 10, meta_filter=F.col("lang") == "de"
            ).collect(),
        )
        bench("q_phrase", lambda: eng.search('"table scan"', 10).collect())
        bench(
            "q_mlt", lambda: eng.more_like_this(0, 10).collect()
        )

        from search_engine_spark.operators.analytics import (
            zipf_fit,
            zipf_rank_table,
        )

        freqs = eng.dictionary.select(
            "term", F.col("cf").cast("long").alias("freq")
        )
        bench("q_zipf", lambda: zipf_fit(
            zipf_rank_table(freqs, n_terms=eng.n_terms)
        ).collect())

        from search_engine_spark.operators.dedup import minhash_lsh_pairs

        bench(
            "q_dedup_minhash",
            lambda: minhash_lsh_pairs(docs, threshold=0.8).count(),
        )

        from search_engine_spark.operators.dedup import span_dedup

        bench(
            "q_dedup_span",
            lambda: span_dedup(docs, w=10).count(),
        )

        from search_engine_spark.operators.similarity import cosine_topk

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        bench(
            "q_ann",
            lambda: cosine_topk(emb, qv, 10, exclude_id=0).collect(),
        )

        docs_per_sec = n_docs / build_s if build_s else 0.0
        print(
            json.dumps(
                {
                    # one fast stream sample (see scripts/membw_probe):
                    # this box's memory bandwidth is bimodal (~20.5
                    # GB/s healthy vs ~7 degraded for stretches) and
                    # every timing above is hostage to which state it
                    # ran in — record it so the numbers are auditable
                    "box_state": _box_state(),
                    # the healthy-window gate outcome this run started
                    # under (VERDICT r3 #7): "healthy" = probe met the
                    # threshold, "timeout" = every probed window was
                    # degraded and the run proceeded anyway
                    **healthy,
                    "metric": "index_docs_per_sec",
                    "value": round(docs_per_sec, 3),
                    "unit": "sec",
                    "queries": timings,
                    "index_build_runs_sec": build_runs,
                    # run 1 is the cold build — the number comparable
                    # to round-1's single-cold-build headline (ADVICE
                    # r2); the min above is the steady-state throughput
                    "index_build_cold_sec": build_runs[0],
                    "sf": sf_dir,
                    "n_docs": n_docs,
                    "cpus": cpus,
                    "total_query_sec": round(
                        sum(v for k, v in timings.items() if k.startswith("q_")),
                        3,
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
