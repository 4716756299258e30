"""Text-analysis operators over a documents table (doc_id, text, lang).

All pure Catalyst column expressions (JVM, codegen) — token counting,
quality scoring, language-ID heuristic, fingerprinting. Each has an
exact ANSI-SQL oracle (see __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# languages scored by tiny marker lexicons (deterministic heuristic;
# the real signal in CC data would be charset n-grams — same plumbing)
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "la"],
    "es": ["el", "y", "de"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lower-cased text, empty tokens dropped
    (matches DuckDB's string_split semantics when filtered)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def avg_token_len(text: Column) -> Column:
    t = tokens(text)
    return F.round(
        F.aggregate(t, F.lit(0.0), lambda acc, x: acc + F.length(x))
        / F.greatest(F.size(t), F.lit(1)),
        6,
    )


def stopword_ratio(text: Column) -> Column:
    t = tokens(text)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_sw = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.round(n_sw / F.greatest(F.size(t), F.lit(1)), 6)


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\w\s]", "")
    return F.round(
        (F.length(text) - F.length(stripped)) / F.greatest(F.length(text), F.lit(1)), 6
    )


def quality_score(text: Column) -> Column:
    """Composite quality score: length band + lexical diversity -
    stopword excess - punctuation noise (deterministic, SQL-mirrorable)."""
    tc = token_count(text)
    diversity = distinct_token_count(text) / F.greatest(tc, F.lit(1))
    len_ok = F.when((tc >= 10) & (tc <= 5000), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        len_ok * (F.lit(0.5) + F.lit(0.5) * diversity)
        - F.lit(0.25) * punct_ratio(text),
        6,
    )


def lang_id(text: Column) -> Column:
    """N-gram/lexicon language-ID heuristic: argmax of marker hits, ties
    to 'und'. Mirrors a CASE chain in SQL."""
    t = tokens(text)
    scores = {
        lang: F.size(
            F.filter(t, lambda x: F.array_contains(F.array(*[F.lit(m) for m in ms]), x))
        )
        for lang, ms in LANG_MARKERS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS):  # deterministic tie order
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def fingerprint(text: Column) -> Column:
    """Document fingerprint: 60-bit hash of whitespace-normalized,
    lower-cased text (stable across engines via md5)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return md5_long(norm)


def document_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row of text statistics per document.

    Round 6: the outputs are composed from STAGED intermediates
    (`_toks`, `_n`, `_nd`, `_punct`, per-language marker counts) instead
    of independent expression trees — the single-Project form
    re-tokenized the document ~15x per row (token_count, distinct,
    avg_len, stopword, quality's nested counts, 4 lang filters are all
    separate `split(lower(text))` evaluations, and higher-order
    functions are CodegenFallback so nothing de-duplicates them at
    runtime). Staged aliases are expensive and multiply-referenced, so
    CollapseProject keeps them materialized once per row; every output
    value is the identical expression over the identical intermediates."""
    t = F.col("_toks")
    n = F.col("_n")
    staged = (
        docs.select("doc_id", F.col(text_col).alias("_text"))
        .withColumn("_toks", tokens(F.col("_text")))
        .withColumn("_n", F.size(t))
        .withColumn("_nd", F.size(F.array_distinct(t)))
        .withColumn(
            "_punct",
            F.round(
                (F.length(F.col("_text"))
                 - F.length(F.regexp_replace(F.col("_text"), r"[^\w\s]", "")))
                / F.greatest(F.length(F.col("_text")), F.lit(1)),
                6,
            ),
        )
    )
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    marker_cols = {
        lang: F.size(
            F.filter(t, lambda x: F.array_contains(F.array(*[F.lit(m) for m in ms]), x))
        ).alias(f"_sc_{lang}")
        for lang, ms in LANG_MARKERS.items()
    }
    staged = staged.select("*", *marker_cols.values())
    # lang argmax over the staged marker counts — same traversal order
    # and tie rule as lang_id
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS):
        cond = F.col(f"_sc_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"_sc_{lang}")).otherwise(best_score)
    diversity = F.col("_nd") / F.greatest(n, F.lit(1))
    len_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.5))
    return staged.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.col("_nd").cast("long").alias("n_distinct_tokens"),
        F.round(
            F.aggregate(t, F.lit(0.0), lambda acc, x: acc + F.length(x))
            / F.greatest(n, F.lit(1)),
            6,
        ).alias("avg_token_len"),
        F.round(
            F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
            / F.greatest(n, F.lit(1)),
            6,
        ).alias("stopword_ratio"),
        F.col("_punct").alias("punct_ratio"),
        F.round(
            len_ok * (F.lit(0.5) + F.lit(0.5) * diversity)
            - F.lit(0.25) * F.col("_punct"),
            6,
        ).alias("quality"),
        best.alias("lang_pred"),
        fingerprint(F.col("_text")).alias("fingerprint"),
    )


def corpus_filter(
    docs: DataFrame,
    min_tokens: int = 10,
    min_quality: float = 0.5,
    lang: str = "en",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end training-corpus gate — the webtext pipeline composed
    from its oracle-checked parts: exact dedup (keep the min-doc_id
    representative per normalized-text hash), then language / token
    budget / quality thresholds. Returns one row per KEPT document:
    (doc_id, lang_pred, n_tokens, quality, n_copies).

    Plan shape: two independent single-shuffle aggregations (dedup
    groupBy, stats are per-row expressions) joined on doc_id — no
    quadratic stage anywhere; filters are plain Catalyst predicates
    pushed below the join."""
    from .dedup import exact_dedup

    reps = exact_dedup(docs, text_col)
    stats = document_stats(docs, text_col)
    return (
        stats.join(reps, "doc_id")
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("quality") >= min_quality)
            & (F.col("lang_pred") == lang)
        )
        .select("doc_id", "lang_pred", "n_tokens", "quality", "n_copies")
    )
