"""TRUE two-cluster-size scaling evidence: a local Spark STANDALONE
cluster with N vs 4N single-core worker JVMs.

The north rule's criterion is throughput at two CLUSTER sizes. The
`local[N]` thread proxy (scripts/scaling_bench.py) distorts both ends:
unpinned, a "1-core" JVM's GC/shuffle/Arrow threads run free on the
other 31 cores (measured 1.2 cores busy); pinned, all 4 task threads
share ONE heap, so GC pressure inflates CPU ~25% at local[4]. Real
clusters have neither artifact — each executor is its own JVM with its
own heap and cores.

This harness builds that faithfully on one box:

* one standalone Master (JVM),
* k Workers, each ``taskset``-pinned to its OWN physical core, 1 core
  1 executor each, separate heaps (so N→4N = 1 worker → 4 workers),
* ``spark-submit --master spark://…`` of the same
  ``scripts/run_build.py`` job over the same tmpfs corpus,
* executor shuffle goes through real netty block transfers between
  JVMs — the cluster data path, not local[*] in-process handoff.

    python scripts/cluster_scaling_bench.py [--docs 500000] [--trials 2]
        [--workers-pair 1,4] [--corpus DIR]
        [--out BENCH_SCALING_CLUSTER.json]

Efficiency = (T_N / T_4N) / 4 from best-of-K wall times.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark

SPARK_HOME = os.path.dirname(os.path.abspath(pyspark.__file__))
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
MASTER_HOST = "127.0.0.1"
MASTER_PORT = 7078
MASTER_URL = f"spark://{MASTER_HOST}:{MASTER_PORT}"


def _popen(cmd, log_path, extra_env=None):
    env = dict(os.environ)
    env.setdefault("SPARK_HOME", SPARK_HOME)
    if extra_env:
        env.update(extra_env)
    log = open(log_path, "w")
    return subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                            env=env)


def _wait_for(log_path, needle, timeout_s=60):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if os.path.exists(log_path):
            with open(log_path, errors="replace") as f:
                if needle in f.read():
                    return True
        time.sleep(0.5)
    raise RuntimeError(f"'{needle}' not seen in {log_path}")


class Cluster:
    """Master + k single-core pinned workers, torn down on exit."""

    def __init__(self, n_workers: int, base_dir: str, mem: str = "7g"):
        self.procs = []
        mlog = os.path.join(base_dir, "master.log")
        self.procs.append(
            _popen(
                [SPARK_CLASS, "org.apache.spark.deploy.master.Master",
                 "--host", MASTER_HOST, "--port", str(MASTER_PORT),
                 "--webui-port", "8082"],
                mlog,
            )
        )
        _wait_for(mlog, "I have been elected leader")
        for i in range(n_workers):
            wlog = os.path.join(base_dir, f"worker{i}.log")
            self.procs.append(
                _popen(
                    ["taskset", "-c", str(i), SPARK_CLASS,
                     "org.apache.spark.deploy.worker.Worker",
                     "--cores", "1", "--memory", mem,
                     "--webui-port", str(8100 + i), MASTER_URL],
                    wlog,
                    extra_env={
                        "SPARK_LOCAL_DIRS": os.path.join(
                            base_dir, f"worker{i}_local"
                        )
                    },
                )
            )
            _wait_for(wlog, "Successfully registered with master")

    def stop(self):
        for p in reversed(self.procs):
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()


def box_state_probe() -> dict:
    """One fast stream-probe sample (scripts/membw_probe.py) recorded
    with every scaling trial: this microVM's aggregate memory
    bandwidth is bimodal (measured 20.5 GB/s healthy vs ~7 GB/s in a
    degraded stretch), and a 4-worker build in a degraded window is
    bandwidth-starved in a way a 1-worker build is not — silently
    corrupting the N->4N ratio. Recording the probe makes each
    sample's box state auditable."""
    import importlib

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    probe = importlib.import_module("membw_probe")
    one = probe.best_of("stream", [0], 1)[0]
    four = probe.best_of("stream", [0, 1, 2, 3], 1)
    gb = 25 * 2 * 400_000_000 / 1e9
    return {
        "stream_bw_1core_gb_s": round(gb / one, 2),
        "stream_bw_4core_total_gb_s": round(sum(gb / t for t in four), 2),
    }


def run_build(n_workers: int, corpus: str, zip_path: str, base_dir: str,
              partitions: int = 32) -> dict:
    out_dir = tempfile.mkdtemp(prefix=f"se_cluster_idx_{n_workers}_",
                               dir=base_dir)
    cmd = [
        "spark-submit",
        "--master", MASTER_URL,
        "--driver-memory", "8g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.executor.cores=1",
        "--conf", "spark.executor.memory=6g",
        "--conf", f"spark.cores.max={n_workers}",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "run_build.py"),
        "--input", corpus,
        "--output", out_dir,
        "--cpus", str(n_workers),
        "--partitions", str(partitions),
        "--pyz", zip_path,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise RuntimeError(f"cluster build with {n_workers} workers "
                           "produced no JSON")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    return json.loads(lines[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500000)
    ap.add_argument("--workers-pair", default="1,4")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--only", type=int, default=None,
                    help="measure just this worker count (extra trials "
                         "for best-of-K merging; writes raw samples)")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "BENCH_SCALING_CLUSTER.json"))
    args = ap.parse_args()

    from search_engine_spark.session import build_session, package_zip

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    corpus = args.corpus or os.path.join(base,
                                         f"se_scaling_corpus_{args.docs}")
    if not os.path.isdir(corpus):
        from scaling_bench import generate_corpus

        spark = build_session(cpus=16, shuffle_partitions=16,
                              app_name="corpus_gen")
        n = generate_corpus(spark, args.docs, corpus)
        print(f"corpus: {n} docs at {corpus}")
        spark.stop()

    zip_path = package_zip()
    if args.only is not None:
        run_dir = tempfile.mkdtemp(prefix="se_cluster_", dir=base)
        samples = []
        for trial in range(args.trials):
            cl = Cluster(args.only, run_dir)
            try:
                r = run_build(args.only, corpus, zip_path, run_dir)
            finally:
                cl.stop()
            r["box_state"] = box_state_probe()
            samples.append(r)
            print(f"trial {trial} {args.only} worker(s): {r}", flush=True)
        with open(args.out, "w") as f:
            json.dump({"only_workers": args.only, "samples": samples},
                      f, indent=1)
        return 0
    n_lo, n_hi = (int(x) for x in args.workers_pair.split(","))
    assert n_hi == 4 * n_lo, "pair must be N,4N"
    run_dir = tempfile.mkdtemp(prefix="se_cluster_", dir=base)
    samples = {n_lo: [], n_hi: []}
    for trial in range(args.trials):
        for k in (n_lo, n_hi):
            cl = Cluster(k, run_dir)
            try:
                r = run_build(k, corpus, zip_path, run_dir)
            finally:
                cl.stop()
            r["box_state"] = box_state_probe()
            samples[k].append(r)
            print(f"trial {trial} {k} worker(s): {r}", flush=True)
    results = {}
    for k in (n_lo, n_hi):
        results[k] = min(samples[k], key=lambda r: r["build_s"])
        results[k]["all_build_s"] = [r["build_s"] for r in samples[k]]
    t_lo, t_hi = results[n_lo]["build_s"], results[n_hi]["build_s"]
    eff = (t_lo / t_hi) / 4.0
    summary = {
        "mode": "standalone cluster, 1-core pinned worker JVMs",
        "corpus_docs": results[n_hi]["n_docs"],
        f"workers_{n_lo}": results[n_lo],
        f"workers_{n_hi}": results[n_hi],
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
