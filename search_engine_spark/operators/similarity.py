"""Similarity search over embedding columns (array<float>).

Two paths, one contract (cosine top-k):

* ``cosine_topk`` — exact brute force: broadcast the query vector(s),
  one numpy pass per Arrow batch, TakeOrdered for top-k. Zero shuffle;
  scales linearly with corpus size across executors — the right
  baseline even at 100 TB when k is small and queries are few.
* ``ann_lsh_topk`` — random-hyperplane LSH with multiprobe: scan only
  buckets whose signature is within ``probe_hamming`` of the query's,
  exact-rerank candidates. At scale the bucket table is written
  partitioned by (table, bucket) so a query prunes to a handful of
  partitions (the parquet/iceberg partition-pruning path).
* ``ivf_topk`` — IVF (inverted file) variant: k-means-lite centroids
  (seeded sample, Lloyd iterations in numpy on the driver over a
  sampled matrix), assignment = argmax dot; query probes ``nprobe``
  nearest centroids. Assignment column doubles as the physical
  partition key at rest.

All math in float64 regardless of storage dtype so results are
reproducible against SQL oracles.
"""

from __future__ import annotations

import os
from functools import reduce
from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cos", T.DoubleType(), False),
    ]
)


def _as_unit(v) -> np.ndarray:
    q = np.asarray(list(v), dtype=np.float64)
    n = float(np.sqrt((q * q).sum()))
    return q / (n if n else 1.0)


def cosine_scores(emb: DataFrame, query_vec: Sequence[float],
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cos) for every vector — one mapInPandas, no shuffle."""
    q = _as_unit(query_vec)
    bc = emb.sparkSession.sparkContext.broadcast(q)

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qv = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            nrm[nrm == 0] = 1.0
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "cos": (mat / nrm[:, None]) @ qv}
            )

    return emb.select(id_col, vec_col).mapInPandas(fn, schema=_SCORE_SCHEMA)


def cosine_topk(emb: DataFrame, query_vec: Sequence[float], k: int = 10,
                exclude_id: int | None = None, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k (vec_id, cos); ties break vec_id asc."""
    scores = cosine_scores(emb, query_vec, id_col, vec_col)
    if exclude_id is not None:
        scores = scores.filter(F.col("vec_id") != exclude_id)
    return scores.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def _local_topk_frame(ids: np.ndarray, scores: np.ndarray,
                      q_ids: np.ndarray, k: int) -> pd.DataFrame:
    """Per-query local top-k over one batch's (n, n_q) score matrix;
    -inf scores (masked rows) never emit. Shared by the brute, LSH, and
    IVF batch paths.

    The selection is a full (score desc, id asc) lexsort, NOT a plain
    argpartition on scores: with exact score ties straddling the local
    k-th boundary (duplicate embeddings — precisely what a dedup corpus
    contains) argpartition keeps an arbitrary tied row, which would
    make batch results diverge from the single-query orderBy(cos desc,
    vec_id asc) contract."""
    top = min(k, len(ids))
    out_q, out_id, out_cos = [], [], []
    for j in range(len(q_ids)):
        sel = np.lexsort((ids, -scores[:, j]))[:top]
        keep = np.isfinite(scores[sel, j])
        out_q.append(np.full(int(keep.sum()), q_ids[j], dtype=np.int64))
        out_id.append(ids[sel][keep])
        out_cos.append(scores[sel, j][keep])
    return pd.DataFrame(
        {
            "q_id": np.concatenate(out_q),
            "vec_id": np.concatenate(out_id),
            "cos": np.concatenate(out_cos),
        }
    )


def cosine_topk_batch(emb: DataFrame, queries: DataFrame, k: int = 10,
                      exclude_self: bool = False,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      q_id_col: str = "q_id",
                      q_vec_col: str = "q_vec") -> DataFrame:
    """Exact cosine top-k for MANY query vectors in ONE corpus pass —
    the batch shape a dedup-against-index step actually runs (score a
    batch of new docs against the whole corpus), instead of one scan
    per query.

    ``queries`` is a small (q_id, q_vec) table; it is collected and
    broadcast (queries are few by contract — corpus-sized query sets
    belong in embedding_pairs_*). Each Arrow batch scores ALL queries
    with one (batch × n_q) matmul and emits only its LOCAL top-k rows
    per query, so the final per-query selection aggregates
    partitions × n_q × k rows — never corpus × n_q. Returns
    (q_id, vec_id, cos), ties vec_id asc; ``exclude_self`` masks
    corpus rows whose id equals the query id (self-match).
    """
    qrows = queries.select(q_id_col, q_vec_col).collect()
    if not qrows:
        spark = emb.sparkSession
        return spark.createDataFrame(
            [], "q_id long, vec_id long, cos double"
        )
    qids = np.array([r[q_id_col] for r in qrows], dtype=np.int64)
    qmat = np.stack([_as_unit(r[q_vec_col]) for r in qrows])  # (n_q, d)
    bc = emb.sparkSession.sparkContext.broadcast((qids, qmat))

    schema = T.StructType(
        [
            T.StructField("q_id", T.LongType(), False),
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("cos", T.DoubleType(), False),
        ]
    )

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids, q_mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            nrm[nrm == 0] = 1.0
            scores = (mat / nrm[:, None]) @ q_mat.T  # (n, n_q)
            if exclude_self:
                scores[ids[:, None] == q_ids[None, :]] = -np.inf
            yield _local_topk_frame(ids, scores, q_ids, k)

    local = emb.select(id_col, vec_col).mapInPandas(fn, schema=schema)
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# LSH ANN
# ---------------------------------------------------------------------------


def _cells_pred(cells):
    """(table, bucket) membership as a SHALLOW partition-prunable
    predicate: buckets grouped into one ``isin`` per table, OR depth =
    n_tables. The naive per-cell OR chain builds an expression tree as
    deep as the cell count and overflows the JVM converter stack once
    a batch probes thousands of cells (measured: 128 queries × 8
    tables × hamming-1 ≈ 6.6k cells → StackOverflowError); In-lists
    prune partitions just as well."""
    by_table: dict = {}
    for t, b in cells:
        by_table.setdefault(t, []).append(b)
    return reduce(
        lambda a, c: a | c,
        [
            (F.col("table") == t) & F.col("bucket").isin(bs)
            for t, bs in sorted(by_table.items())
        ],
    )


class LshIndex:
    """Random-hyperplane signature index over an embedding DataFrame.

    ``build`` materializes (vec_id, table, bucket, unit-vec) — persist
    it partitioned by (table, bucket) for partition-pruned queries at
    scale. Query = candidate union over multiprobe buckets → exact
    rerank (distributed; only candidate rows are scored).
    """

    def __init__(self, emb: DataFrame, planes: int = 12, tables: int = 6,
                 seed: int = 11, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        self.emb = emb
        self.planes = planes
        self.last_candidate_count: int | None = None
        self.tables = tables
        self.id_col = id_col
        self.vec_col = vec_col
        first = emb.select(vec_col).first()
        self.dim = len(first[vec_col])
        rng = np.random.RandomState(seed)
        self.hyper = rng.normal(size=(tables, planes, self.dim))
        self._sigs: DataFrame | None = None

    def build(self) -> DataFrame:
        hyper, tables, planes = self.hyper, self.tables, self.planes
        id_col, vec_col = self.id_col, self.vec_col
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType(), False),
                T.StructField("table", T.IntegerType(), False),
                T.StructField("bucket", T.LongType(), False),
                T.StructField("vec", T.ArrayType(T.DoubleType()), False),
            ]
        )

        def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pows = 1 << np.arange(planes, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf[vec_col]), dtype=np.float64)
                nrm = np.sqrt((mat * mat).sum(axis=1))
                nrm[nrm == 0] = 1.0
                unit = mat / nrm[:, None]
                for t in range(tables):
                    proj = unit @ hyper[t].T > 0
                    yield pd.DataFrame(
                        {
                            "vec_id": pdf[id_col].to_numpy(),
                            "table": np.full(len(pdf), t, dtype=np.int32),
                            "bucket": (proj.astype(np.int64) * pows).sum(axis=1),
                            "vec": list(unit),
                        }
                    )

        sigs = self.emb.select(self.id_col, self.vec_col).mapInPandas(
            fn, schema=schema
        )
        # DISK_ONLY: the memory-columnar cache measured 3-4x wall variance
        # on multi-GB frames on this box (CLAUDE.md; dedup.py quantifies)
        self._sigs = sigs.repartition("table", "bucket").persist(
            StorageLevel.DISK_ONLY
        )
        return self._sigs

    def save(self, path: str) -> None:
        """Persist the signature table AT REST, parquet-partitioned by
        (table, bucket): a multiprobe query's static cell predicate
        prunes to its probed directories. Hyperplanes ride a sidecar
        parquet (tables × planes × dim doubles — driver-sized)."""
        if self._sigs is None:
            self.build()
        self._sigs.write.partitionBy("table", "bucket").mode(
            "overwrite"
        ).parquet(os.path.join(path, "sigs"))
        rows = [
            (t, p, self.hyper[t, p].tolist())
            for t in range(self.tables)
            for p in range(self.planes)
        ]
        self.emb.sparkSession.createDataFrame(
            rows, "table int, plane int, hyperplane array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "hyper")
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LshIndex":
        """Open a saved signature index; queries prune to the probed
        (table, bucket) partitions."""
        inst = cls.__new__(cls)
        hrows = spark.read.parquet(os.path.join(path, "hyper")).collect()
        tables = max(r["table"] for r in hrows) + 1
        planes = max(r["plane"] for r in hrows) + 1
        dim = len(hrows[0]["hyperplane"])
        hyper = np.zeros((tables, planes, dim))
        for r in hrows:
            hyper[r["table"], r["plane"]] = r["hyperplane"]
        inst.hyper = hyper
        inst.tables, inst.planes, inst.dim = tables, planes, dim
        inst._sigs = spark.read.parquet(os.path.join(path, "sigs"))
        inst.last_candidate_count = None
        inst.id_col = "vec_id"
        inst.vec_col = "vec"
        inst.emb = inst._sigs
        return inst

    def _query_buckets(self, q_unit: np.ndarray, probe_hamming: int) -> list:
        """(table, bucket) cells to scan: the query's bucket per table
        plus all buckets within `probe_hamming` bit flips (multiprobe)."""
        out = []
        for t in range(self.tables):
            base = int(
                ((q_unit @ self.hyper[t].T > 0).astype(np.int64)
                 * (1 << np.arange(self.planes, dtype=np.int64))).sum()
            )
            cells = {base}
            if probe_hamming >= 1:
                for i in range(self.planes):
                    cells.add(base ^ (1 << i))
            if probe_hamming >= 2:
                for i in range(self.planes):
                    for j in range(i + 1, self.planes):
                        cells.add(base ^ (1 << i) ^ (1 << j))
            out.extend((t, c) for c in cells)
        return out

    def query(self, query_vec: Sequence[float], k: int = 10,
              probe_hamming: int = 1, exclude_id: int | None = None,
              count_candidates: bool = False) -> DataFrame:
        """``count_candidates=True`` additionally records the number of
        candidate vectors scanned in ``self.last_candidate_count`` (one
        extra count job — diagnostics/tests only; production params are
        judged by this fraction staying ≪ 1)."""
        if self._sigs is None:
            self.build()
        q = _as_unit(query_vec)
        cells = self._query_buckets(q, probe_hamming)
        spark = self.emb.sparkSession
        # static (table, bucket) membership predicate rather than a
        # join: the probed-cell list is driver-sized (tables × probe
        # count), and a literal predicate statically PRUNES the
        # partitioned at-rest layout (a join would need runtime DPP to
        # do the same)
        pred = _cells_pred(cells)
        cand = (
            self._sigs.filter(pred)
            .select("vec_id", "vec")
            .dropDuplicates(["vec_id"])
        )
        # always (re)assigned: a stale count from an earlier query must
        # not masquerade as this query's scan size
        self.last_candidate_count = cand.count() if count_candidates else None
        bc = spark.sparkContext.broadcast(q)

        def score(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            qv = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf["vec"]), dtype=np.float64)
                yield pd.DataFrame(
                    {"vec_id": pdf["vec_id"].to_numpy(), "cos": mat @ qv}
                )

        scores = cand.mapInPandas(score, schema=_SCORE_SCHEMA)
        if exclude_id is not None:
            scores = scores.filter(F.col("vec_id") != exclude_id)
        return scores.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)

    def query_batch(self, queries: DataFrame, k: int = 10,
                    probe_hamming: int = 1, exclude_self: bool = False,
                    q_id_col: str = "q_id",
                    q_vec_col: str = "q_vec") -> DataFrame:
        """Many queries through the LSH index in ONE pruned scan (the
        IVF ``query_batch`` shape): the union of every query's probed
        (table, bucket) cells becomes one static predicate (partition-
        prunable at rest), each candidate row carries a uint64 bitmask
        of which queries probe its cell, and one matmul per Arrow batch
        scores all queries with non-probing (query, row) pairs masked
        out — results are identical to one ``query`` call per query.
        A bitmask word holds 64 queries; larger batches chunk into
        64-query words internally (one pruned scan per word, results
        unioned — VERDICT r3 #3), so callers never mis-handle the cap.

        Returns (q_id, vec_id, cos), ties vec_id asc."""
        if self._sigs is None:
            self.build()
        qrows = queries.select(q_id_col, q_vec_col).collect()
        if not qrows:
            return self.emb.sparkSession.createDataFrame(
                [], "q_id long, vec_id long, cos double"
            )
        if len(qrows) > 64:
            # chunk into bitmask words; q_ids are disjoint across
            # chunks, so the union preserves per-query top-k and tie
            # semantics exactly
            parts = [
                self._query_batch_word(
                    qrows[i : i + 64], k, probe_hamming, exclude_self,
                    q_id_col, q_vec_col,
                )
                for i in range(0, len(qrows), 64)
            ]
            return reduce(DataFrame.unionByName, parts)
        return self._query_batch_word(
            qrows, k, probe_hamming, exclude_self, q_id_col, q_vec_col
        )

    def _query_batch_word(self, qrows, k, probe_hamming, exclude_self,
                          q_id_col, q_vec_col) -> DataFrame:
        """One ≤64-query bitmask word — the single-scan batch kernel."""
        qids = np.array([r[q_id_col] for r in qrows], dtype=np.int64)
        qmat = np.stack([_as_unit(r[q_vec_col]) for r in qrows])
        cell_mask: dict = {}
        for j in range(len(qids)):
            for cell in self._query_buckets(qmat[j], probe_hamming):
                cell_mask[cell] = cell_mask.get(cell, 0) | (1 << j)
        pred = _cells_pred(list(cell_mask))
        # a vector can sit in several probed cells (multiple tables) —
        # OR its masks together so it appears once with every querying
        # bit set, instead of emitting duplicate (q_id, vec_id) rows.
        # The static filter does the partition pruning; the broadcast
        # join (cells are driver-sized) attaches each cell's bitmask.
        # bit 63 (the 64th query) exceeds LongType as an unsigned int —
        # wrap to signed two's-complement; numpy's arithmetic shifts on
        # int64 still extract every bit correctly on the executor side
        def _signed64(m: int) -> int:
            return m - (1 << 64) if m >= (1 << 63) else m

        cells_df = self.emb.sparkSession.createDataFrame(
            [(t, int(b), _signed64(int(m))) for (t, b), m in cell_mask.items()],
            "table int, bucket long, cell_qmask long",
        )
        cand = (
            self._sigs.filter(pred)
            .join(F.broadcast(cells_df), ["table", "bucket"])
            .groupBy("vec_id")
            .agg(
                F.first("vec").alias("vec"),
                F.bit_or("cell_qmask").alias("qmask"),
            )
        )
        bc = self.emb.sparkSession.sparkContext.broadcast((qids, qmat))

        schema = T.StructType(
            [
                T.StructField("q_id", T.LongType(), False),
                T.StructField("vec_id", T.LongType(), False),
                T.StructField("cos", T.DoubleType(), False),
            ]
        )

        def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            q_ids, q_mat = bc.value
            shifts = np.arange(len(q_ids), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                masks = pdf["qmask"].to_numpy(dtype=np.int64)
                mat = np.array(list(pdf["vec"]), dtype=np.float64)
                scores = mat @ q_mat.T  # (n, n_q); vecs already unit
                allowed = ((masks[:, None] >> shifts[None, :]) & 1).astype(bool)
                scores[~allowed] = -np.inf
                if exclude_self:
                    scores[ids[:, None] == q_ids[None, :]] = -np.inf
                yield _local_topk_frame(ids, scores, q_ids, k)

        local = cand.mapInPandas(fn, schema=schema)
        from pyspark.sql import Window

        w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
        return (
            local.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------


class IvfIndex:
    """Inverted-file ANN: seeded centroids (Lloyd on a driver sample),
    per-vector nearest-centroid assignment (the physical partition key
    at rest), query probes the ``nprobe`` nearest centroids."""

    def __init__(self, emb: DataFrame, n_centroids: int = 16, iters: int = 5,
                 sample: int = 4096, seed: int = 13, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        self.emb = emb
        self.id_col = id_col
        self.vec_col = vec_col
        # TakeOrdered sample (first `sample` ids): the centroid fit
        # depends on row order through rng.choice, so an arbitrary
        # limit() would make the index depend on scan parallelism.
        rows = (
            emb.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(sample)
            .collect()
        )
        mat = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        nrm[nrm == 0] = 1.0
        unit = mat / nrm[:, None]
        rng = np.random.RandomState(seed)
        n_centroids = min(n_centroids, len(unit))
        cent = unit[rng.choice(len(unit), n_centroids, replace=False)]
        for _ in range(iters):
            assign = (unit @ cent.T).argmax(axis=1)
            for c in range(n_centroids):
                members = unit[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    n = np.sqrt((v * v).sum())
                    cent[c] = v / (n if n else 1.0)
        self.centroids = cent
        self._assigned: DataFrame | None = None
        self.last_candidate_count: int | None = None
        self._spark = emb.sparkSession

    def build(self) -> DataFrame:
        cent = self.centroids
        id_col, vec_col = self.id_col, self.vec_col
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType(), False),
                T.StructField("cell", T.IntegerType(), False),
                T.StructField("vec", T.ArrayType(T.DoubleType()), False),
            ]
        )

        def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf[vec_col]), dtype=np.float64)
                nrm = np.sqrt((mat * mat).sum(axis=1))
                nrm[nrm == 0] = 1.0
                unit = mat / nrm[:, None]
                yield pd.DataFrame(
                    {
                        "vec_id": pdf[id_col].to_numpy(),
                        "cell": (unit @ cent.T).argmax(axis=1).astype(np.int32),
                        "vec": list(unit),
                    }
                )

        assigned = self.emb.select(self.id_col, self.vec_col).mapInPandas(
            fn, schema=schema
        )
        # DISK_ONLY for the same wall-variance reason as LshIndex.build
        self._assigned = assigned.repartition("cell").persist(
            StorageLevel.DISK_ONLY
        )
        return self._assigned

    def save(self, path: str) -> None:
        """Persist the index AT REST: the assignment table written as
        parquet ``partitionBy("cell")`` — a query's ``cell IN (...)``
        then prunes to nprobe directories before any IO (the
        PartitionFilters path, asserted by the plan test) — plus a
        centroids sidecar parquet (driver-sized: n_centroids × dim)."""
        if self._assigned is None:
            self.build()
        self._assigned.write.partitionBy("cell").mode("overwrite").parquet(
            os.path.join(path, "assigned")
        )
        self._spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(self.centroids)],
            "cell int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "centroids")
        )

    @classmethod
    def load(cls, spark: "SparkSession", path: str) -> "IvfIndex":
        """Open a saved index without touching the embedding table —
        queries run partition-pruned scans over the saved layout."""
        inst = cls.__new__(cls)
        cent_rows = sorted(
            spark.read.parquet(os.path.join(path, "centroids")).collect(),
            key=lambda r: r["cell"],
        )
        inst.centroids = np.array(
            [list(r["centroid"]) for r in cent_rows], dtype=np.float64
        )
        inst._assigned = spark.read.parquet(os.path.join(path, "assigned"))
        inst.last_candidate_count = None
        inst._spark = spark
        inst.id_col = "vec_id"
        inst.vec_col = "vec"
        inst.emb = inst._assigned
        return inst

    def query(self, query_vec: Sequence[float], k: int = 10, nprobe: int = 4,
              exclude_id: int | None = None,
              count_candidates: bool = False) -> DataFrame:
        if self._assigned is None:
            self.build()
        q = _as_unit(query_vec)
        cells = [int(c) for c in np.argsort(-(self.centroids @ q))[:nprobe]]
        cand = self._assigned.filter(F.col("cell").isin(cells))
        self.last_candidate_count = cand.count() if count_candidates else None
        bc = self._spark.sparkContext.broadcast(q)

        def score(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            qv = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf["vec"]), dtype=np.float64)
                yield pd.DataFrame(
                    {"vec_id": pdf["vec_id"].to_numpy(), "cos": mat @ qv}
                )

        scores = cand.mapInPandas(score, schema=_SCORE_SCHEMA)
        if exclude_id is not None:
            scores = scores.filter(F.col("vec_id") != exclude_id)
        return scores.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)

    def query_batch(self, queries: DataFrame, k: int = 10, nprobe: int = 4,
                    exclude_self: bool = False, q_id_col: str = "q_id",
                    q_vec_col: str = "q_vec") -> DataFrame:
        """Many queries through the IVF index in ONE pruned scan. Each
        query's ``nprobe`` nearest cells come from the driver-resident
        centroids; the scan filters to the UNION of every query's cells
        (a static ``cell IN (...)`` predicate — partition-prunable on
        the at-rest layout exactly like single-query ``query``); inside
        each Arrow batch one matmul scores all queries and a per-query
        cell-membership mask keeps query q's scores only for vectors in
        q's OWN probed cells, so results are identical to running
        ``query`` once per query. Per-batch local top-k caps the final
        per-query selection at partitions × n_q × k rows.

        Returns (q_id, vec_id, cos), ties vec_id asc."""
        if self._assigned is None:
            self.build()
        qrows = queries.select(q_id_col, q_vec_col).collect()
        if not qrows:
            return self._spark.createDataFrame(
                [], "q_id long, vec_id long, cos double"
            )
        qids = np.array([r[q_id_col] for r in qrows], dtype=np.int64)
        qmat = np.stack([_as_unit(r[q_vec_col]) for r in qrows])
        order = np.argsort(-(qmat @ self.centroids.T), axis=1)[:, :nprobe]
        # allowed[c, j] = cell c is probed by query j
        allowed = np.zeros((len(self.centroids), len(qids)), dtype=bool)
        for j in range(len(qids)):
            allowed[order[j], j] = True
        union_cells = [int(c) for c in np.nonzero(allowed.any(axis=1))[0]]
        cand = self._assigned.filter(F.col("cell").isin(union_cells))
        bc = self._spark.sparkContext.broadcast((qids, qmat, allowed))

        schema = T.StructType(
            [
                T.StructField("q_id", T.LongType(), False),
                T.StructField("vec_id", T.LongType(), False),
                T.StructField("cos", T.DoubleType(), False),
            ]
        )

        def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            q_ids, q_mat, allow = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                cells_arr = pdf["cell"].to_numpy(dtype=np.int64)
                mat = np.array(list(pdf["vec"]), dtype=np.float64)
                scores = mat @ q_mat.T  # (n, n_q); vecs already unit
                scores[~allow[cells_arr]] = -np.inf
                if exclude_self:
                    scores[ids[:, None] == q_ids[None, :]] = -np.inf
                yield _local_topk_frame(ids, scores, q_ids, k)

        local = cand.select("vec_id", "cell", "vec").mapInPandas(
            fn, schema=schema
        )
        from pyspark.sql import Window

        w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
        return (
            local.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
