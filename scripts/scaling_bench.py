"""Scaling-efficiency evidence for the north rule (N → 4N ≥ 0.8).

No real cluster exists in this sandbox, so per the driver instructions
the same job runs at two parallelism levels — local[1] and local[4] by
default (--cpus-pair) — on the SAME deterministic synthetic corpus,
each as its own
``spark-submit --py-files`` process (cold JVM, library shipped as a
zip, exactly the cluster submission path).

    python scripts/scaling_bench.py [--docs 64000] [--out BENCH_SCALING.json]

Efficiency = (T_N / T_4N) / 4. The corpus is generated once (seeded
chunks through the pages generator, realistic log-normal doc sizes,
dup urls + null-text rows included) and reused by both runs.

Parallelism pair: local[1] vs local[4] by default. Each Spark thread
pairs with a Python UDF worker, so local[N] demands ~2N hot threads;
on this 32-core box local[8]→local[32] would oversubscribe (64
threads) and saturate memory bandwidth — the 1→4 pair keeps both runs
in the linear region, which is what a real N→4N executor scale-up
looks like (executors don't share a socket). Corpus, index output and
spark.local.dir all sit on tmpfs so the microVM's slow block layer
doesn't pollute the CPU-scaling signal; both runs use the SAME
partition counts so the plans are identical — only thread count
varies.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def generate_corpus(spark, n_docs: int, out: str, chunk: int = 4000) -> int:
    """Deterministic corpus: seeded generator chunks, parallelized as a
    Spark job (one chunk per task)."""
    import pandas as pd
    from pyspark.sql import types as T

    from search_engine_spark.sources.pages_source import generate_pages_pdf

    n_chunks = (n_docs + chunk - 1) // chunk
    seeds = [(i, chunk) for i in range(n_chunks)]
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )

    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                # null_text_frac=1.0: every row carries html only, so the
                # build pays the full extraction path per doc — the
                # Common-Crawl regime the north rule describes.
                # norm_dup_frac=0: the bench corpus keeps exactly n
                # unique urls (comparable across rounds); normalization
                # dedup is exercised by the pytest corpus instead
                out_pdf = generate_pages_pdf(
                    n_docs=int(row["chunk"]), seed=1000 + int(row["seed"]),
                    null_text_frac=1.0, norm_dup_frac=0.0,
                )
                # chunk-unique urls so chunks don't collide
                out_pdf["url"] = out_pdf["url"].str.replace(
                    "https://", f"https://c{int(row['seed']):04d}.", n=1,
                    regex=False,
                )
                assert out_pdf["url"].str.contains(
                    f"c{int(row['seed']):04d}."
                ).all(), "chunk url prefixing failed"
                yield out_pdf[["url", "warc_ts", "html", "text", "lang"]]

    df = spark.createDataFrame(seeds, "seed int, chunk int").repartition(
        n_chunks
    ).mapInPandas(gen, schema=schema)
    df.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).count()


def run_build(cpus: int, corpus: str, zip_path: str,
              partitions: int = 32, pin: bool = False) -> dict:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    out_dir = tempfile.mkdtemp(prefix=f"se_scale_idx_{cpus}_", dir=base)
    cmd = []
    if pin:
        # Pin the whole process tree (JVM + python workers) to exactly
        # `cpus` physical cores. Without this, local[1]'s background JVM
        # threads (GC, shuffle writers, Arrow IPC) run FREE on the other
        # 31 cores — measured 1.2 system cores busy during a "1-core"
        # run — which understates T1 and therefore the N→4N efficiency.
        # An N-core cluster executor gets N cores, full stop; taskset is
        # the faithful sandbox equivalent.
        cmd += ["taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0"]
    cmd += [
        "spark-submit",
        "--master", f"local[{cpus}]",
        "--driver-memory", "24g",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.local.dir={base}/se_spark_local",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "run_build.py"),
        "--input", corpus,
        "--output", out_dir,
        "--cpus", str(cpus),
        "--partitions", str(partitions),
        "--pyz", zip_path,
    ]
    env = dict(os.environ)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=3600)
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not line:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise RuntimeError(f"build at local[{cpus}] produced no JSON")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    return json.loads(line[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000000)
    ap.add_argument("--cpus-pair", default="1,4")
    ap.add_argument("--trials", type=int, default=3,
                    help="runs per level; best wall is reported (microVM "
                         "noise is strictly additive)")
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--pin", action="store_true",
                    help="taskset the run to exactly N cores (see "
                         "run_build docstring)")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALING.json"))
    args = ap.parse_args()

    from search_engine_spark.session import build_session, package_zip

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    corpus = args.corpus or os.path.join(
        base, f"se_scaling_corpus_{args.docs}"
    )
    if not os.path.isdir(corpus):
        spark = build_session(cpus=16, shuffle_partitions=16,
                              app_name="corpus_gen")
        n = generate_corpus(spark, args.docs, corpus)
        print(f"corpus: {n} docs at {corpus}")
        spark.stop()

    zip_path = package_zip()
    n_lo, n_hi = (int(x) for x in args.cpus_pair.split(","))
    assert n_hi == 4 * n_lo, "pair must be N,4N"
    results = {}
    samples = {n_lo: [], n_hi: []}
    for trial in range(args.trials):
        for cpus in (n_lo, n_hi):
            r = run_build(cpus, corpus, zip_path, pin=args.pin)
            samples[cpus].append(r)
            print(f"trial {trial} local[{cpus}]: {r}")
    for cpus in (n_lo, n_hi):
        results[cpus] = min(samples[cpus], key=lambda r: r["build_s"])
        results[cpus]["all_build_s"] = [r["build_s"] for r in samples[cpus]]

    t_lo, t_hi = results[n_lo]["build_s"], results[n_hi]["build_s"]
    eff = (t_lo / t_hi) / 4.0
    summary = {
        "corpus_docs": results[n_hi]["n_docs"],
        "pinned_to_n_cores": bool(args.pin),
        f"local{n_lo}": results[n_lo],
        f"local{n_hi}": results[n_hi],
        "speedup_N_to_4N": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
