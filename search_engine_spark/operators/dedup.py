"""Deduplication operators for web-scale training-data curation.

Five candidate-generation strategies, one exactness contract: every
near-dup operator returns pairs whose *exact* n-gram Jaccard similarity
meets the threshold. Candidate generation differs (that is where the
scale behavior lives); a final exact verification join makes the output
independent of the generator, so MinHash-LSH / SimHash results are
bit-identical to the brute-force shingle-join path whenever recall holds
(probabilistically ~1 at the thresholds used; the gap in real web data
between planted dups (J≥0.9) and background (J≈0.05) is exactly why
LSH works).

Scale design:
* ``ngram_jaccard_pairs`` — the "brute force" here is already the
  scalable inverted shingle join (pairs only materialize for docs
  sharing a shingle), NOT a cartesian product. Ubiquitous shingles are
  the skew hazard → ``max_shingle_df`` drops shingles shared by more
  than that many docs (standard practice: they carry no dedup signal
  and quadratically blow up the join).
* ``minhash_lsh_pairs`` — 1 Arrow pass for signatures (numpy, vectorized
  64-bit multiply-shift hashing), band-bucket groupBy, exact verify.
  Candidate volume is O(collisions), never O(n²).
* ``simhash_pairs`` — 64-bit simhash; pigeonhole banding (k+1 chunks
  catch all pairs within hamming k), JVM popcount check via
  ``bit_count(a ^ b)``, then the same exact verification.
* ``embedding_pairs_exact`` / ``embedding_pairs_lsh`` —
  normalized-vector dot products; broadcast block nested-loop (exact,
  one side fits an executor) or hyperplane-bucketed (scale path).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.operators.textstats import shingles_col, tokens_col

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _fan_out(df: DataFrame) -> DataFrame:
    """Repartition tiny-partition-count inputs up to the session's
    defaultParallelism before CPU-heavy per-row transforms (shingling,
    signature kernels). A bench- or test-scale corpus often arrives as
    ONE parquet row group → one task → the whole pass runs
    single-threaded on a many-core session (measured: the sf0.1
    signature pass was 1 task; fanned out it ran 1.5-3x faster even in
    a degraded-bandwidth window). At warehouse scale the input already
    has ≫ cores partitions and this is a metadata-only no-op — the
    check costs no job, and no shuffle is added when partitions ≥
    parallelism."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact content dedup by md5(text): one hash-groupBy shuffle.
    Returns (content_hash, n_copies, keep_id) — keep_id = min id."""
    return (
        docs.select(
            F.md5(F.encode(F.col(text_col), "utf-8")).alias("content_hash"),
            F.col(id_col),
        )
        .groupBy("content_hash")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
    )


def drop_exact_dups(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Keep the min-id representative of each exact-duplicate group."""
    keep = exact_dedup(docs, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, id_col, "inner")


def span_dedup(docs: DataFrame, w: int = 10, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Chunked exact-substring dedup — the scalable Spark shape of
    suffix-array ExactSubstr dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", 2021): each document's token
    stream is cut into consecutive ``w``-token spans; a span whose exact
    text occurred earlier in the corpus (global order = (doc_id,
    span_no) ascending, first writer wins) is dropped, and the surviving
    spans re-join in order into the cleaned text.

    Returns one row per document that produced >= 1 span:
    ``(doc_id, n_spans, n_kept, clean_text)`` where ``clean_text`` is
    the space-joined surviving spans ('' when every span was a
    duplicate).

    Scale design:
    * Span construction is one map stage. The token array is bound ONCE
      via the ``element_at(transform(array(...)), 1)`` idiom — Spark HOF
      lambdas do not hoist non-lambda subexpressions, so referencing the
      split result directly inside ``transform`` would re-tokenize per
      span (the shingles_col O(len^2) bug).
    * First-writer-wins needs no window function: ``groupBy(span_text)
      .agg(min(struct(doc_id, span_no)))`` IS the kept-span set, and the
      min partial-aggregates map-side, so a hyper-duplicated span (a
      boilerplate footer repeated across millions of pages) collapses
      before the shuffle instead of landing on one reducer the way
      ``row_number() over (partition by span_text)`` would.
    * Shuffle keys carry the span text so the dedup is exact; a
      production variant at 100 TB keys on xxhash128(span_text) and
      resolves the ~0 collision risk in a residual equality check.

    Reference scope: the reference dedups whole documents by URL
    (src/indexer/database_handler.py upsert); span granularity is the
    training-data extension this engine adds.
    """
    toks = tokens_col(F.col(text_col))
    spans_arr = F.element_at(
        F.transform(
            F.array(toks),
            lambda tk: F.when(F.size(tk) == 0, F.array().cast("array<string>"))
            .otherwise(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size(tk) / F.lit(float(w))).cast("int") - 1,
                    ),
                    lambda i: F.array_join(F.slice(tk, i * w + 1, w), " "),
                )
            ),
        ),
        1,
    )
    spans = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(spans_arr).alias("span_no", "span_text"),
    )
    winners = spans.groupBy("span_text").agg(
        F.min(F.struct("doc_id", "span_no")).alias("first")
    )
    kept = winners.select(
        F.col("first.doc_id").alias("doc_id"),
        F.col("first.span_no").alias("span_no"),
        "span_text",
    )
    # n_spans is a closed-form map column (ceil(n_tokens / w)), NOT a
    # groupBy over the exploded spans: counting after the explode would
    # re-run the whole tokenize+explode branch a second time (Spark
    # does not share the subplan between consumers) and add a doc_id
    # shuffle for a value the scan already knows.
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.ceil(F.size(toks) / F.lit(float(w))).cast("long").alias("n_spans"),
    ).filter(F.col("n_spans") > 0)
    kept_agg = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_no", "span_text"))),
                lambda s: s["span_text"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return per_doc.join(kept_agg, "doc_id", "left").select(
        "doc_id",
        "n_spans",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# shingle table + exact Jaccard verification (shared by all near-dup ops)
# ---------------------------------------------------------------------------

# Candidate-generation df cap for ngram_jaccard_pairs. The driver-gate
# oracle SQL mirrors this constant (ADVICE r2: engine and oracle must
# share candidate-generation semantics, or a pair whose shared shingles
# all exceed the cap surfaces as a gate failure at larger corpora).
DEFAULT_MAX_SHINGLE_DF = 256


def shingle_table(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id, shingle) distinct — the inverted file over n-gram shingles."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(shingles_col(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
    )


def _jaccard_from_shingles(sh: DataFrame, threshold: float) -> DataFrame:
    """Exact pairwise Jaccard via inverted shingle self-join."""
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
             ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
                        ) -> DataFrame:
    """Exact near-dup pairs (id_a < id_b, jaccard ≥ threshold) over
    word n-gram shingles. The shuffle is the shingle equi-join —
    linear in shingle postings, not quadratic in docs.

    ``max_shingle_df`` (default on — 256) guards the quadratic hazard:
    a shingle shared by m docs contributes m² join rows, so ubiquitous
    shingles blow the self-join up. Shingles with df above the cap are
    used for *candidate generation* only being dropped there; every
    candidate is then verified with exact Jaccard over the FULL shingle
    universe, so reported values are the true Jaccard, never a
    filtered-universe estimate. The only effect of the cap is recall:
    a pair whose every shared shingle is ubiquitous is missed — at
    threshold ≥ 0.5 such pairs share most of their shingles, so this
    requires an essentially boilerplate-only corpus (document, don't
    fear).

    The shingle table is persisted across its consumers (df filter,
    candidate self-join, exact verify — plan audit counted 8 re-scans
    of the corpus without it, Spark shares no subplans between
    consumers) and released after the pair list materializes via the
    same eager-localCheckpoint contract as minhash_lsh_pairs."""
    from pyspark import StorageLevel

    sh = shingle_table(_fan_out(docs), n, id_col, text_col).persist(
        StorageLevel.DISK_ONLY
    )
    sh.count()
    if max_shingle_df is None:
        verified = _jaccard_from_shingles(sh, threshold)
    else:
        rare = (
            sh.groupBy("shingle")
            .count()
            .filter(F.col("count") <= max_shingle_df)
            .select("shingle")
        )
        joinable = sh.join(rare, "shingle")
        a = joinable.alias("a")
        b = joinable.alias("b")
        candidates = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        verified = _verify_pairs(candidates, sh, threshold)
    out = verified.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def _verify_pairs(candidates: DataFrame, sh: DataFrame,
                  threshold: float) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs."""
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
             ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def connected_components(pairs: DataFrame, nodes: Optional[DataFrame] = None,
                         max_iter: int = 25) -> DataFrame:
    """Connected components over near-dup pairs → (node, component) with
    component = the smallest node id reachable (the canonical doc of a
    duplicate cluster). ``pairs`` has (id_a, id_b); ``nodes`` optionally
    supplies the full node universe (singletons map to themselves).

    Min-label propagation: each round every node takes the min of its
    own label and its neighbors' labels; stop when no label changes.
    Rounds = cluster diameter — near-dup clusters are shallow (a dup
    family shares shingles pairwise, so diameters are 1-3), and each
    round is one join + one groupBy shuffle keyed on node, both
    bounded by |pairs| — no quadratic or driver-side step. Labels
    persist per round and the previous round unpersists.

    Raises RuntimeError if labels have not converged after ``max_iter``
    rounds — partial labels silently split clusters, which for a
    canonicalization operator means silently keeping duplicates. A
    graph whose components legitimately exceed that diameter (chained
    revision families) needs a larger ``max_iter`` or a
    star-contraction variant, not a truncated answer."""
    edges_one = pairs.select(
        F.col("id_a").cast("long").alias("a"),
        F.col("id_b").cast("long").alias("b"),
    )
    # materialize the edge list ONCE: it is consumed by every
    # propagation round, and a lazy `pairs` plan (e.g. the whole
    # shingle-join Jaccard pipeline) would otherwise re-execute per
    # round; the edge list is pairs-sized — tiny next to the corpus
    edges = (
        edges_one.unionByName(
            edges_one.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes is not None:
        universe = nodes.select(F.col(nodes.columns[0]).cast("long").alias("node"))
    else:
        universe = edges.select(F.col("a").alias("node")).distinct()
    labels = universe.select("node", F.col("node").alias("component")).persist()
    labels.count()
    converged = False
    for _ in range(max_iter):
        neighbor = (
            edges.join(
                labels.select(
                    F.col("node").alias("a"), F.col("component").alias("la")
                ),
                "a",
            )
            .select(F.col("b").alias("node"), F.col("la").alias("component"))
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    return labels


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_SIG_SENTINEL = (1 << 62) - 1  # > any 51-bit multiply-shift value


def _hash_params(num_hashes: int, seed: int) -> np.ndarray:
    """Odd 64-bit multipliers for the multiply-shift hash family."""
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 1 << 62, size=num_hashes, dtype=np.int64).astype(
        np.uint64
    )
    return (a << np.uint64(1)) | np.uint64(1)


def _base_hash(flat: list) -> np.ndarray:
    """Stable vectorized 64-bit base hashes. Pre-hashed integer keys
    (JVM-side ``xxhash64`` longs — the minhash_lsh_pairs fast path, where
    shingle strings never cross the Arrow boundary at all) pass through
    as-is; string shingles fall back to pandas' SipHash with its fixed
    default key — both deterministic across processes and runs."""
    if flat and isinstance(flat[0], (int, np.integer)):
        return np.asarray(flat, dtype=np.int64).view(np.uint64)
    return pd.util.hash_array(np.asarray(flat, dtype=object))  # uint64


def minhash_signatures(docs: DataFrame, n: int = 3, num_hashes: int = 128,
                       seed: int = 7, id_col: str = "doc_id",
                       text_col: str = "text",
                       shingle_docs: Optional[DataFrame] = None) -> DataFrame:
    """(id, sig array<long>) — one vectorized Arrow pass per doc batch.

    h_i(s) = (a_i · (2·base(s)+1) mod 2^64) >> 13 — the multiply-shift
    family; wraparound multiply IS the hash, one mul + one shift per
    cell. The whole batch computes as ONE (num_hashes × total_shingles)
    broadcast followed by ``np.minimum.reduceat`` over per-doc segments
    — no per-hash or per-doc Python loops."""
    a = _hash_params(num_hashes, seed)

    sh_docs = shingle_docs if shingle_docs is not None else docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles_col(F.col(text_col), n)).alias("shingles"),
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("sig", T.ArrayType(T.LongType()), False),
        ]
    )

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = np.fromiter((len(s) for s in pdf["shingles"]),
                               dtype=np.int64, count=len(pdf))
            flat: list = []
            for s in pdf["shingles"]:
                flat.extend(s)
            sigs: list
            if len(flat) == 0:
                sigs = [np.full(num_hashes, _SIG_SENTINEL, dtype=np.int64)
                        for _ in range(len(pdf))]
            else:
                base = (_base_hash(flat) << np.uint64(1)) | np.uint64(1)
                with np.errstate(over="ignore"):
                    hm = (a[:, None] * base[None, :]) >> np.uint64(13)
                hm = hm.astype(np.int64)  # < 2^51, sign-safe
                nonempty = lens > 0
                starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
                np.cumsum(lens[nonempty][:-1], out=starts[1:])
                mins = np.minimum.reduceat(hm, starts, axis=1)  # (H, docs≠∅)
                sigs = []
                j = 0
                for ne in nonempty:
                    if ne:
                        sigs.append(mins[:, j].copy())
                        j += 1
                    else:
                        sigs.append(np.full(num_hashes, _SIG_SENTINEL,
                                            dtype=np.int64))
            yield pd.DataFrame({"id": pdf["id"], "sig": sigs})

    return sh_docs.mapInPandas(fn, schema=schema)


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                      num_hashes: int = 128, bands: int = 32, seed: int = 7,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    bands=32 × rows=4 at 128 hashes → P(candidate | J=0.8) ≈
    1−(1−0.8⁴)³² ≈ 1−6e-7: recall ~1 at the threshold. Candidates =
    band-bucket groupBy (shuffle keyed on (band, bucket-hash)); the
    verification join is restricted to candidates only. The shingle
    array is hashed to 64-bit keys JVM-side (verification Jaccard over
    the hashed sets is identical to string Jaccard barring a 64-bit
    collision inside one compared pair's union, P < 1e-12, and
    candidate-generator-independent exactly as before). Shingles are
    NOT materialized corpus-wide (r5, VERDICT r4 #7 profile): the
    signature pass consumes them inline (one docs scan), and
    verification re-shingles only the CANDIDATE docs — join docs to the
    pair-derived id set BEFORE the shingle transform, then eagerly
    localCheckpoint that candidate-sized frame so _verify_pairs' three
    consumers (sizes, side a, side b) read it for free. The old shape
    paid one full shingle-cache write plus FOUR full cache reads; this
    one pays two docs scans, one of them shingling only candidates.
    (The result is materialized eagerly via localCheckpoint, so
    repeated calls don't accumulate cached blocks for the session.)

    Docs with zero shingles (< n tokens) are excluded before banding:
    they can never reach a positive Jaccard threshold, and their
    identical all-sentinel signatures would otherwise collide pairwise
    in every band — an O(m²) candidate blowup on empty-heavy corpora."""
    rows = num_hashes // bands
    from pyspark import StorageLevel

    # Shingles hashed to 64-bit keys JVM-side (xxhash64, VERDICT r4 #7):
    # the signature kernel's Arrow transfer ships int64 columns instead
    # of every shingle string, the Python SipHash pass disappears, and
    # the verification join shuffles longs. The frame is consumed
    # INLINE by the signature pass — the r4 corpus-wide DISK_ONLY
    # persist cost more than it saved once verification became
    # candidate-restricted (profile: the persist write+count was the
    # single largest stage; the only other full-table consumer was
    # verification, which now re-shingles candidates only).
    # fan out ONLY the signature input: the verify branch below reads
    # `docs` directly, and inheriting the repartition there would
    # re-execute the fan-out shuffle a second time (no subplan sharing)
    sh_inline = _fan_out(docs).select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(
                shingles_col(F.col(text_col), n), lambda s: F.xxhash64(s)
            )
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    # the banding self-join consumes sigs on BOTH sides — without a
    # persist the signature Arrow pass runs twice (self-joins duplicate
    # the subplan; no exchange reuse fires). DISK_ONLY: the memory-
    # columnar cache measured 3-4x wall variance on this box (CLAUDE.md,
    # quantified in the r2->r3 A/B: 29.3 s memory vs 23.9 s DISK_ONLY
    # best-of-3 at sf0.1).
    sigs = minhash_signatures(docs, n, num_hashes, seed, id_col, text_col,
                              shingle_docs=sh_inline).persist(
        StorageLevel.DISK_ONLY
    )
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
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
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
    )
    # candidate-restricted verification (same shape as simhash_pairs):
    # the pair list materializes once (it is pair-sized — this also
    # keeps the banding self-join from running twice), and the three
    # verify reads explode only the CANDIDATE docs' shingles instead of
    # the whole corpus three times
    candidates = candidates.localCheckpoint(eager=True)
    cand_ids = (
        candidates.select(F.col("id_a").alias("id"))
        .union(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # re-shingle ONLY the candidate docs: the join runs BEFORE the
    # shingle transform so the (expensive) transform touches candidate
    # rows only, and the eager checkpoint makes _verify_pairs' three
    # consumers of this frame read a candidate-sized local relation
    # instead of re-executing anything (no-subplan-sharing, CLAUDE.md)
    cand_sh = (
        docs.select(F.col(id_col).alias("id"),
                    F.col(text_col).alias("_vtext"))
        .join(cand_ids, "id")
        .select(
            "id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        shingles_col(F.col("_vtext"), n),
                        lambda s: F.xxhash64(s),
                    )
                )
            ).alias("shingle"),
        )
        .localCheckpoint(eager=True)
    )
    verified = _verify_pairs(candidates, cand_sh, threshold)
    # materialize now (pairs output ≪ corpus) so the signature cache
    # can be released immediately instead of living for the session
    out = verified.localCheckpoint(eager=True)
    sigs.unpersist()
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                       text_col: str = "text", chunks: int = 1) -> DataFrame:
    """(id, simhash long, chunks array<long>) — 64-bit simhash over
    n-gram shingle hashes, one Arrow pass (numpy bit-unpack + column
    sum). ``chunks`` pigeonhole keys (the i-th ``64//chunks``-bit slice)
    are emitted alongside for LSH-style banding.

    Shingle hashes are the two 32-bit halves of ``md5(shingle)``,
    computed JVM-side (VERDICT r4): md5 is bit-identical in every
    engine, so the DuckDB oracle reproduces the SIGNATURE itself and
    checks the engine's actual contract — (hamming ≤ k ∧ Jaccard ≥ t)
    — instead of assuming full recall of an uncapped Jaccard query
    (the previous pd.util.hash_array family was oracle-opaque; its
    assumed-full recall broke on organic 0.87-0.92 pairs at sf0.1).
    The md5 array is bound once per element list and sliced twice —
    the per-element work is two substrings, not two md5s of the whole
    tail (the HOF no-CSE trap applies per element only)."""
    sh_docs = (
        docs.select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                shingles_col(F.col(text_col), n)
            ).alias("shingles"),
        )
        .withColumn("hx", F.transform("shingles", lambda s: F.md5(s)))
        .select(
            "id",
            F.transform(
                "hx",
                lambda x: F.conv(F.substring(x, 1, 8), 16, 10).cast("long"),
            ).alias("hi"),
            F.transform(
                "hx",
                lambda x: F.conv(F.substring(x, 9, 8), 16, 10).cast("long"),
            ).alias("lo"),
        )
    )
    width = 64 // chunks
    mask = (1 << width) - 1
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("simhash", T.LongType(), False),
            T.StructField("chunks", T.ArrayType(T.LongType()), False),
        ]
    )

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # batch-vectorized (VERDICT r2 #5): ONE unpackbits +
        # add.reduceat per batch instead of a numpy round-trip per
        # document; the string hashing itself happened JVM-side (md5
        # halves), so the kernel only recombines two int columns.
        for pdf in batches:
            n_docs = len(pdf)
            lens = np.fromiter((len(s) for s in pdf["hi"]),
                               dtype=np.int64, count=n_docs)
            flat_hi: list = []
            flat_lo: list = []
            for h, l in zip(pdf["hi"], pdf["lo"]):
                flat_hi.extend(h)
                flat_lo.extend(l)
            out = np.zeros(n_docs, dtype=np.uint64)
            if flat_hi:
                hs = (
                    np.asarray(flat_hi, dtype=np.int64).astype(np.uint64)
                    << np.uint64(32)
                ) | np.asarray(flat_lo, dtype=np.int64).astype(np.uint64)
                bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8),
                                     axis=1, bitorder="little")
                nonempty = lens > 0
                starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
                np.cumsum(lens[nonempty][:-1], out=starts[1:])
                votes = (
                    np.add.reduceat(bits, starts, axis=0) * 2
                    >= lens[nonempty][:, None]
                )
                packed = np.packbits(votes.astype(np.uint8), axis=1,
                                     bitorder="little")
                out[nonempty] = packed.view(np.uint64).ravel()
            sims = out.view(np.int64)

            def _signed(k: int) -> int:
                return k if k < (1 << 63) else k - (1 << 64)

            keys = [
                [_signed((v >> (ci * width)) & mask) for ci in range(chunks)]
                for v in (int(u) for u in out)
            ]
            yield pd.DataFrame(
                {"id": pdf["id"], "simhash": sims, "chunks": keys}
            )

    return sh_docs.mapInPandas(fn, schema=schema)


def simhash_pairs(docs: DataFrame, n: int = 3, hamming_k: int = 6,
                  jaccard_threshold: float | None = 0.8,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SimHash near-dup pairs: pigeonhole banding on (k+1)-way 64-bit
    chunking guarantees every pair within hamming ≤ k collides in at
    least one chunk; JVM bit_count(xor) filters candidates; optional
    exact-Jaccard verification pins the output to the shared contract."""
    chunks = hamming_k + 1
    # fan out only the signature input (the verify path reads `docs`)
    sigs = simhash_signatures(_fan_out(docs), n, id_col, text_col,
                              chunks=chunks)
    banded = sigs.select(
        "id", "simhash", F.posexplode("chunks").alias("chunk", "key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_k)
        .select("id_a", "id_b")
        .distinct()
    )
    if jaccard_threshold is None:
        return candidates
    # Verification touches the shingle table three times (sizes + both
    # join sides) and Spark shares no subplans between consumers — but
    # unlike ngram_jaccard_pairs, the candidate generator here never
    # needs the full shingle table, so persisting it whole costs more
    # than it saves (measured 4.9 s -> 13.7 s at sf0.1). Instead the
    # pair list materializes once (it is pair-sized), and only the
    # candidate docs' shingles — the subset verification can see — are
    # cached across the three reads.
    from pyspark import StorageLevel

    candidates = candidates.localCheckpoint(eager=True)
    cand_ids = (
        candidates.select(F.col("id_a").alias("id"))
        .union(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh_cand = (
        shingle_table(docs, n, id_col, text_col)
        .join(cand_ids, "id")
        .persist(StorageLevel.DISK_ONLY)
    )
    sh_cand.count()
    out = _verify_pairs(candidates, sh_cand, jaccard_threshold).localCheckpoint(
        eager=True
    )
    sh_cand.unpersist()
    return out


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_pairs_exact(emb: DataFrame, threshold: float | None = None,
                          top_pairs: int | None = None,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          n_blocks: int = 8) -> DataFrame:
    """Exact all-pairs cosine as a fully distributed block nested-loop.

    Each vector hashes to a block ``id % n_blocks`` and is replicated
    to every block-PAIR group containing its block (n_blocks copies);
    ``groupBy(p, q).applyInPandas`` computes the cross gram matrix of
    blocks p×q (triangular when p == q). Every unordered id pair lands
    in exactly one group, so no driver collect, no broadcast of the
    table, no post-dedup — the previous design collected the full
    embedding table to the driver (a driver OOM at scale; VERDICT r1
    What's-wrong #3). Shuffle volume is n_blocks× the table; per-group
    memory is ~2·(n/n_blocks)·d doubles, so size n_blocks to the
    executor. Compute is inherently O(n²·d) — for corpora where that is
    the bottleneck use ``embedding_pairs_lsh``.

    Returns (id_a, id_b, cos) with id_a < id_b, filtered by threshold
    and/or truncated to the global top `top_pairs` (TakeOrdered)."""
    B = int(n_blocks)
    thr = -2.0 if threshold is None else float(threshold)
    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.col(id_col), F.lit(B)).cast("int").alias("blk"),
    )
    expanded = base.select(
        "id",
        "vec",
        "blk",
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("other"),
    ).select(
        "id",
        "vec",
        "blk",
        F.least("blk", "other").alias("p"),
        F.greatest("blk", "other").alias("q"),
    )

    pair_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cos", T.DoubleType(), False),
        ]
    )

    def block_fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        p, q = key
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
            {"id_a": np.int64, "id_b": np.int64, "cos": np.float64}
        )
        if len(pdf) < 2:
            return empty
        ids = pdf["id"].to_numpy()
        mat = np.array(list(pdf["vec"]), dtype=np.float64)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        nrm[nrm == 0] = 1.0
        unit = mat / nrm[:, None]
        if p == q:
            sims = unit @ unit.T
            ia, ib = np.triu_indices(len(ids), k=1)
            keep = sims[ia, ib] >= thr
            a, b = ids[ia[keep]], ids[ib[keep]]
            cos = sims[ia, ib][keep]
        else:
            mp = pdf["blk"].to_numpy() == p
            up, uq = unit[mp], unit[~mp]
            ip, iq = ids[mp], ids[~mp]
            if not len(ip) or not len(iq):
                return empty
            sims = up @ uq.T
            keep = sims >= thr
            ra, ca = np.nonzero(keep)
            a, b = ip[ra], iq[ca]
            cos = sims[ra, ca]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": cos})

    pairs = expanded.groupBy("p", "q").applyInPandas(
        block_fn, schema=pair_schema
    )
    if top_pairs is not None:
        pairs = pairs.orderBy(
            F.desc("cos"), F.asc("id_a"), F.asc("id_b")
        ).limit(top_pairs)
    return pairs


def embedding_pairs_lsh(emb: DataFrame, threshold: float = 0.9,
                        planes: int = 16, tables: int = 8, seed: int = 11,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Scale path: random-hyperplane LSH bucketing + exact in-bucket
    cosine. P(same bucket | cos=c) = (1−acos(c)/π)^planes per table;
    `tables` independent tables drive recall up. Shuffle = bucket
    groupBy; per-bucket work is a numpy gram matrix."""
    first = emb.select(vec_col).first()
    dim = len(first[vec_col])
    rng = np.random.RandomState(seed)
    hyper = rng.normal(size=(tables, planes, dim))

    sig_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("table", T.IntegerType(), False),
            T.StructField("bucket", T.LongType(), False),
            T.StructField("vec", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def sig_fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pows = (1 << np.arange(planes, dtype=np.int64))
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            nrm[nrm == 0] = 1.0
            unit = mat / nrm[:, None]
            outs = []
            for t in range(tables):
                proj = unit @ hyper[t].T > 0
                buckets = (proj.astype(np.int64) * pows).sum(axis=1)
                outs.append(
                    pd.DataFrame(
                        {
                            "id": pdf[id_col].to_numpy(),
                            "table": np.full(len(pdf), t, dtype=np.int32),
                            "bucket": buckets,
                            "vec": list(unit),
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    sigs = emb.select(id_col, vec_col).mapInPandas(sig_fn, schema=sig_schema)

    pair_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cos", T.DoubleType(), False),
        ]
    )

    def bucket_fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "cos": np.float64}
            )
        ids = pdf["id"].to_numpy()
        mat = np.array(list(pdf["vec"]), dtype=np.float64)
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": sims[ia, ib][keep]})

    pairs = sigs.groupBy("table", "bucket").applyInPandas(
        bucket_fn, schema=pair_schema
    )
    return pairs.groupBy("id_a", "id_b").agg(F.max("cos").alias("cos"))
