"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

These extend the reference's analytics surface (SURVEY.md §2.7/§2.8)
with the operations a 100 TB web-text curation pipeline needs. Every
operator here is a pure column-expression plan (whole-stage codegen, no
Python in the hot path): tokenization via ``F.split`` on a delimiter
regex mirrors the engine tokenizer for the plain-text fast path, and the
byte-exact UDF tokenizer (functions.tokenizer) remains the slow path for
byte-fidelity work.

Scale notes: all operators are embarrassingly parallel per-document
projections — no shuffle at all. A 1000-executor cluster runs them as a
single map stage over the parquet scan with full column pruning.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Delimiter class mirroring the engine tokenizer (ASCII space + punct);
# used by the JVM-side fast path for plain-text corpora.
TOKEN_SPLIT_RE = r"[\s!-/:-@\[-`{-~]+"

# Tiny per-language marker lexicons (function words). Public knowledge;
# good enough for coarse routing — a real pipeline swaps in fastText.
LANG_MARKERS: Dict[str, Sequence[str]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "que", "pour", "dans"),
    "es": ("el", "la", "los", "las", "es", "una", "que", "por", "para", "con"),
    "ru": ("и", "в", "не", "на", "что", "это", "как", "по", "из", "его"),
}


def tokens_col(text: Column) -> Column:
    """JVM-side tokens: split on the engine delimiter class, lowercase
    (ASCII semantics match the byte-exact tokenizer for ASCII text),
    keep 2..50 chars."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE),
        lambda t: (F.length(t) >= 2) & (F.length(t) <= 50),
    )


def language_id(
    docs: DataFrame,
    text_col: str = "text",
    markers: Dict[str, Sequence[str]] = LANG_MARKERS,
) -> DataFrame:
    """Marker-lexicon language ID: score = marker-token hits per
    language, predict the argmax (ties → lexicographically first lang,
    'und' when no marker hits at all). One map stage, no shuffle."""
    toks = tokens_col(F.col(text_col))
    out = docs
    score_cols = []
    for lang in sorted(markers):
        lex = F.array(*[F.lit(w) for w in markers[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(lex, t)))
        out = out.withColumn(f"_s_{lang}", score)
        score_cols.append(lang)
    best = F.greatest(*[F.col(f"_s_{l}") for l in score_cols])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in score_cols:  # sorted → deterministic tie-break
        pred = pred.when(F.col(f"_s_{lang}") == best, F.lit(lang))
    out = out.withColumn("lang_pred", pred)
    return out.drop(*[f"_s_{l}" for l in score_cols])


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features (Gopher/C4-style heuristics):
    n_chars, n_tokens, avg_token_len, distinct_token_ratio,
    alpha_ratio, ws_ratio — plus a composite quality score in [0, 1].

    All closed-form column expressions (no UDF, no shuffle)."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text).cast("long")
    n_tokens = F.size(toks).cast("long")
    sum_tok_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    avg_tok = F.when(n_tokens > 0, sum_tok_len / n_tokens).otherwise(F.lit(0.0))
    distinct_ratio = F.when(
        n_tokens > 0, F.size(F.array_distinct(toks)) / n_tokens
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / n_chars,
    ).otherwise(F.lit(0.0))
    ws_ratio = F.when(
        n_chars > 0, F.length(F.regexp_replace(text, r"[^\s]", "")) / n_chars
    ).otherwise(F.lit(0.0))
    # Composite: reward 3..8-char tokens, some vocabulary diversity,
    # mostly-alphabetic text, sane whitespace density.
    len_term = F.greatest(
        F.lit(0.0), 1.0 - F.abs(avg_tok - 5.5) / 5.5
    )
    ws_term = F.greatest(F.lit(0.0), 1.0 - F.abs(ws_ratio - 0.17) / 0.17)
    score = F.least(
        F.lit(1.0),
        0.25 * len_term + 0.25 * distinct_ratio + 0.25 * alpha_ratio + 0.25 * ws_term,
    )
    return docs.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_tokens.alias("q_n_tokens"),
        avg_tok.alias("q_avg_token_len"),
        distinct_ratio.alias("q_distinct_ratio"),
        alpha_ratio.alias("q_alpha_ratio"),
        ws_ratio.alias("q_ws_ratio"),
        score.alias("quality_score"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token-count estimators: whitespace tokens and BPE-ish pieces
    (greedy runs of ≤4 word chars — a deterministic proxy for subword
    vocab sizing when no tokenizer model ships)."""
    text = F.col(text_col)
    ws = F.size(F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0))
    pieces = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]{1,4}"), 0))
    return docs.select(
        "*",
        ws.cast("long").alias("n_ws_tokens"),
        pieces.cast("long").alias("n_bpe_pieces"),
    )


def shingles_col(text: Column, n: int = 3) -> Column:
    """Positional word n-gram shingles, JVM-side: tokens → sliding
    concat_ws over index sequence. Empty array when fewer than n tokens.

    The token array is bound ONCE as a lambda variable via a
    singleton-array transform: higher-order functions do not hoist
    non-lambda subexpressions, so referencing ``tokens_col(text)``
    directly inside the sliding-window lambda re-ran the regex
    split + length filter once per shingle position — O(len²)
    interpreted work that made shingling the dominant cost of the
    whole MinHash pipeline (measured 8–12 s for a 251k-shingle corpus;
    ~0.5 s with the binding)."""
    shingles_of = lambda t: F.when(  # noqa: E731  (t = materialized tokens)
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.element_at(F.transform(F.array(tokens_col(text)), shingles_of), 1)


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     n: int = 2, id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document over word
    ``n``-grams: ``top_ngram_ratio`` (most frequent n-gram's share of
    all n-gram occurrences — high ⇒ boilerplate/spam loops) and
    ``distinct_ngram_ratio`` (vocabulary diversity). Docs with fewer
    than ``n`` tokens emit 0/0.

    Shape at scale: the JVM shingle array explodes once and aggregates
    by (doc, shingle) — one hash shuffle keyed by the doc, no UDF."""
    sh = docs.select(
        F.col(id_col), F.explode_outer(shingles_col(F.col(text_col), n)).alias("sh")
    )
    per = sh.groupBy(id_col, "sh").count()
    return (
        per.groupBy(id_col)
        .agg(
            F.max(F.when(F.col("sh").isNotNull(), F.col("count"))).alias("_mx"),
            F.sum(F.when(F.col("sh").isNotNull(), F.col("count"))).alias("_tot"),
            F.count(F.when(F.col("sh").isNotNull(), True)).alias("_dst"),
        )
        .select(
            id_col,
            F.coalesce(F.col("_mx") / F.col("_tot"), F.lit(0.0)).alias(
                "top_ngram_ratio"
            ),
            F.coalesce(F.col("_dst") / F.col("_tot"), F.lit(0.0)).alias(
                "distinct_ngram_ratio"
            ),
        )
    )


# conservative patterns shared with the SQL oracle — both Spark (Java
# regex) and DuckDB (RE2) support this subset identically
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


def scrub_pii(docs: DataFrame, text_col: str = "text",
              email_token: str = "<EMAIL>",
              phone_token: str = "<PHONE>") -> DataFrame:
    """Redact emails and phone-number-like digit runs from the text
    column (standard pre-training PII scrub). Pure JVM
    ``regexp_replace`` — no UDF; the patterns are restricted to the
    regex subset Java and RE2 interpret identically, so the operator
    is exactly SQL-oracle-checkable."""
    out = F.regexp_replace(F.col(text_col), EMAIL_RE, email_token)
    out = F.regexp_replace(out, PHONE_RE, phone_token)
    return docs.withColumn(text_col, out)


def fingerprint(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Document fingerprint = lexicographic min of md5(shingle) — a
    deterministic winnowing-style content signature. md5 keeps it
    reproducible across engines (same value in DuckDB/Spark)."""
    sh = shingles_col(F.col(text_col), n)
    fp = F.array_min(F.transform(sh, lambda s: F.md5(F.encode(s, "utf-8"))))
    whole = F.md5(F.encode(F.col(text_col), "utf-8"))
    return docs.select(
        "*", F.coalesce(fp, whole).alias("fingerprint")
    )


def simple_regex_tokens(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """T8a (scripts/simple_python_search.py:33-39): the reference's
    alternate "simple search" tokenization — ``re.findall(r'\\b\\w+\\b',
    text.lower())`` kept when len ≥ 2, as a SET per document. Pure
    column expressions ((?U) makes Java's \\w match Unicode word chars
    like Python's re). Returns (id, terms array<string>) with the set
    in first-occurrence order de-duplicated (array_distinct)."""
    text = F.col(text_col)
    toks = F.regexp_extract_all(F.lower(text), F.lit(r"(?U)\w+"), 0)
    kept = F.array_distinct(F.filter(toks, lambda t: F.length(t) >= 2))
    return docs.select(F.col(id_col).alias("id"), kept.alias("terms"))


def zipf_alt_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """T8b (src/zipf_analysis/zipf_analyzer.py:63-71): the Zipf
    module's sloppier tokenization — ``text.lower().split()``, keep
    tokens with raw len > 2, THEN strip edge punctuation
    ``.,!?;:"'()[]{}`` (the reference keeps empty-after-strip tokens;
    replicated). Returns one ``term`` row per kept token."""
    text = F.col(text_col)
    raw = F.filter(
        F.split(F.lower(text), r"\s+"), lambda t: F.length(t) > 2
    )
    punct = "\\.|,|!|\\?|;|:|\"|'|\\(|\\)|\\[|\\]|\\{|\\}"
    stripped = F.transform(
        raw,
        lambda t: F.regexp_replace(
            F.regexp_replace(t, f"^({punct})+", ""), f"({punct})+$", ""
        ),
    )
    return docs.select(F.explode(stripped).alias("term"))
