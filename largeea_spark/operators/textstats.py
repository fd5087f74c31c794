"""Text-analysis operators for the training-data pipeline (round-1
instruction: first-class alongside SURVEY.md §2): language ID, quality
scoring, token counting, document fingerprinting. All JVM-side builtin
expressions — oracle-checkable and codegen-fast at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import char_shingles
from ..functions.names import tokenize_ws

# tiny deterministic stopword lexicons for the n-gram/stopword langid
# heuristic (public common-word lists, truncated)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "was"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "en"],
}


def token_count(text_col: str | Column) -> Column:
    """Whitespace token count (Python str.split semantics)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(tokenize_ws(c))
    )


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpeish_token_count(text_col: str | Column) -> Column:
    """BPE-ish token estimate: alpha runs, digit runs, and single
    punctuation marks each count as one token (regexp_count — same
    regex runs in the DuckDB oracle)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def quality_features(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-doc quality features: char/token counts, mean token length,
    punctuation ratio, stopword ratio, and a composite [0,1] score
    (monotone heuristic: long-enough, low-punct, stopword-bearing text
    scores high — the usual web-corpus quality gate shape)."""
    c = F.col(text_col)
    toks = tokenize_ws(c)
    n_chars = F.length(c)
    n_toks = token_count(c)
    punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    all_stop = [w for ws in LANG_STOPWORDS.values() for w in ws]
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in set(all_stop)])))
    mean_tok_len = F.when(n_toks > 0, (n_chars - (n_toks - 1)) / n_toks).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_toks > 0, stop_hits / n_toks).otherwise(F.lit(0.0))
    score = (
        F.least(n_toks / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars_calc"),
        n_toks.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def langid(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
           default: str = "und") -> DataFrame:
    """Stopword-voting language ID: the language whose stopword lexicon
    intersects the token set most wins (ties broken by language code
    order; zero hits → ``default``). A deterministic n-gram-free
    heuristic that the DuckDB oracle mirrors token-for-token."""
    toks = F.array_distinct(tokenize_ws(F.lower(F.col(text_col))))
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias("hits"),
            F.lit(code).alias("lang"),
        )
        for code, ws in sorted(LANG_STOPWORDS.items())
    ]
    # max by (hits, lang) — but prefer SMALLER lang code on hit ties:
    # array_max picks lexicographically-largest struct, so negate via
    # sort: use sort_array desc on (hits asc? ) — simplest: greatest of
    # structs with (hits, reversed-lang-rank).
    ranked = [
        F.struct(s.getField("hits").alias("hits"),
                 F.lit(len(LANG_STOPWORDS) - i).alias("rk"),
                 s.getField("lang").alias("lang"))
        for i, s in enumerate(scores)
    ]
    best = F.greatest(*ranked)
    return docs.select(
        F.col(id_col),
        F.when(best.getField("hits") > 0, best.getField("lang"))
        .otherwise(F.lit(default)).alias("pred_lang"),
        best.getField("hits").alias("stopword_hits"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                k: int = 8, shingle: int = 16) -> DataFrame:
    """Document fingerprint: bottom-k sketch of md5'd character
    shingles (winnowing-style selection of extremal shingle hashes —
    rolling-hash family). md5 (not xxhash64) so the DuckDB oracle can
    reproduce it bit-for-bit. Output: (id, fingerprint string)."""
    sh = char_shingles(F.col(text_col), shingle)
    hashed = F.sort_array(F.transform(sh, lambda s: F.md5(s)))
    bottom_k = F.slice(hashed, 1, k)
    return docs.select(
        F.col(id_col), F.concat_ws("", bottom_k).alias("fingerprint")
    )


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_dup_line_frac: float = 0.3, max_top_bigram_share: float = 0.2,
) -> DataFrame:
    """Gopher/C4-style repetition quality filter (Rae et al. 2021 §A1.1
    repetition rules; public heuristics): documents dominated by
    repeated lines or by one word-bigram are low-quality boilerplate.

    Returns (id, n_lines, dup_line_frac, top_bigram_share,
    repetition_ok):
      dup_line_frac    = 1 − distinct_lines / lines (empty text → 0)
      top_bigram_share = max bigram count / bigram count (|toks|<2 → 0)
      repetition_ok    = both under their thresholds

    Plan: line stats are pure array expressions (codegen); the bigram
    share is one explode + two hash aggregations with map-side combine —
    scale-safe (no per-doc collect, no UDF)."""
    c = F.col(text_col)
    lines = F.filter(F.split(c, "\n"), lambda x: F.trim(x) != "")
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(lines).alias("n_lines"),
        F.when(
            F.size(lines) > 0,
            1.0 - F.size(F.array_distinct(lines)) / F.size(lines),
        ).otherwise(F.lit(0.0)).alias("dup_line_frac"),
        tokenize_ws(c).alias("toks"),
    )
    toks = base.select("id", F.col("toks"))
    bigrams = toks.select(
        "id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.zip_with(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.slice("toks", 2, F.size("toks") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
            ).otherwise(F.array())
        ).alias("bg"),
    )
    per_bg = bigrams.groupBy("id", "bg").agg(F.count("*").alias("c"))
    top = per_bg.groupBy("id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_bg")
    )
    return (
        base.drop("toks")
        .join(top, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_lines",
            F.round("dup_line_frac", 6).alias("dup_line_frac"),
            F.round(
                F.coalesce(F.col("top_c") / F.col("n_bg"), F.lit(0.0)), 6
            ).alias("top_bigram_share"),
            (
                (F.col("dup_line_frac") <= max_dup_line_frac)
                & (F.coalesce(F.col("top_c") / F.col("n_bg"), F.lit(0.0))
                   <= max_top_bigram_share)
            ).alias("repetition_ok"),
        )
    )
