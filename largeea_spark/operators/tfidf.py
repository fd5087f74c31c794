"""TF-IDF posting-list operator (SURVEY.md A4, `text_utils.py:146-156`).

Reference uses sklearn CountVectorizer + TfidfTransformer defaults:
  tf = raw count of token in doc
  idf = ln((1+n_docs)/(1+df)) + 1          (smooth_idf=True)
  row L2 normalization                     (norm='l2')
Reproduced exactly as DataFrame aggs over an exploded posting list —
deterministic, oracle-checkable in SQL (vs `pyspark.ml.feature.IDF`,
which uses a different idf formula; SURVEY.md §7.3 chose explicit).

Output: (id, token, tf long, tf_idf double) — the long-format CSR
analogue (EntTokenInfo TF-IDF, `text_utils.py:24-89`).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window, functions as F


def postings(df: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    """(id, token, tf) exploded posting list (A3 incidence counts)."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(tokens_col).alias("token"))
        .groupBy("id", "token")
        .agg(F.count("*").alias("tf"))
    )


def tf_idf(df: DataFrame, id_col: str, tokens_col: str,
           n_docs: int | None = None) -> DataFrame:
    """sklearn-default TF-IDF with L2 row norm (see module docstring)."""
    # the posting table feeds both the df-count branch and the weighted
    # join; without the checkpoint each branch re-explodes and re-counts
    # the corpus (two full scans in the round-6 'before' plan). Lazy —
    # materialized by the caller's first action.
    post = postings(df, id_col, tokens_col).localCheckpoint(eager=False)
    if n_docs is None:
        n_docs = df.select(id_col).distinct().count()
    # post is unique per (id, token) by construction, so count(*) ==
    # countDistinct(id) — same result without the distinct-agg expand
    dfreq = post.groupBy("token").agg(F.count("*").alias("df"))
    idf = dfreq.withColumn(
        "idf", F.log((F.lit(1.0 + n_docs)) / (F.col("df") + 1.0)) + 1.0
    ).select("token", "idf")
    raw = post.join(idf, "token").withColumn("w", F.col("tf") * F.col("idf"))
    norm = Window.partitionBy("id")
    return (
        raw.withColumn("nrm", F.sqrt(F.sum(F.col("w") * F.col("w")).over(norm)))
        .select(
            "id", "token", "tf",
            F.when(F.col("nrm") > 0, F.col("w") / F.col("nrm"))
            .otherwise(F.lit(0.0)).alias("tf_idf"),
        )
    )


def stop_tokens(df: DataFrame, id_col: str, tokens_col: str, k: int = 25) -> DataFrame:
    """U6 (`text_utils.py:63-89`): the k highest-document-frequency
    tokens (the reference also unions punctuation tokens; punctuation is
    already space-stripped by P2 upstream here). Deterministic tiebreak
    by token."""
    post = postings(df, id_col, tokens_col)
    # post is unique per (id, token) — count(*) == countDistinct(id)
    dfreq = post.groupBy("token").agg(F.count("*").alias("df"))
    w = Window.orderBy(F.col("df").desc(), F.col("token").asc())
    return dfreq.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k).drop("rk")
