"""Stage-level wall profile of minhash_lsh_pairs at a given sf dir.

Times each materialization boundary of the exact pipeline (signature
persist over inline-computed hashed shingles, banding
self-join+distinct, candidate re-shingle + exact verify) so
optimization effort lands where the time actually goes (VERDICT r4
#7). Run alone — never concurrently with another Spark job (CLAUDE.md
measurement discipline).

Usage: python scripts/profile_minhash.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from search_engine_spark.operators.dedup import (
    _fan_out,
    minhash_signatures,
    shingles_col,
    _verify_pairs,
)
from search_engine_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
                          shuffle_partitions=32)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n, threshold, num_hashes, bands, seed = 3, 0.8, 128, 32, 7
    rows = num_hashes // bands

    t = {}
    t0 = time.time()
    sh_inline = _fan_out(docs).select(
        F.col("doc_id").alias("id"),
        F.array_distinct(
            F.transform(shingles_col(F.col("text"), n),
                        lambda s: F.xxhash64(s))
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    sigs = minhash_signatures(docs, n, num_hashes, seed, "doc_id", "text",
                              shingle_docs=sh_inline).persist(
        StorageLevel.DISK_ONLY)
    sigs.count()
    t["1_signatures_persist"] = round(time.time() - t0, 2)

    t0 = time.time()
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), bi * rows + 1, rows),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    ).localCheckpoint(eager=True)
    t["2_banding_selfjoin"] = round(time.time() - t0, 2)
    n_cand = candidates.count()

    t0 = time.time()
    cand_ids = (
        candidates.select(F.col("id_a").alias("id"))
        .union(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    cand_sh = (
        docs.select(F.col("doc_id").alias("id"), F.col("text").alias("_t"))
        .join(cand_ids, "id")
        .select(
            "id",
            F.explode(
                F.array_distinct(
                    F.transform(shingles_col(F.col("_t"), n),
                                lambda s: F.xxhash64(s))
                )
            ).alias("shingle"),
        )
        .localCheckpoint(eager=True)
    )
    out = _verify_pairs(candidates, cand_sh, threshold).localCheckpoint(
        eager=True)
    t["3_candshingle_verify"] = round(time.time() - t0, 2)
    n_pairs = out.count()
    sigs.unpersist()

    t["total"] = round(sum(v for k, v in t.items() if k != "total"), 2)
    print({"stages_s": t, "candidates": n_cand, "pairs": n_pairs})


if __name__ == "__main__":
    main()
