"""MinHash-LSH candidate blocking (SURVEY.md J7/F14/O2).

Reference: datasketch MinHashLSH at Jaccard 0.5, 128 perms, redis store,
queried per-entity (`text_sim.py:181-224`). Engine: signatures +
band keys computed JVM-side (functions.hashing), candidates from a
sort-merge equi-join on ``(band, key)`` — broadcast-free by design (the
north star names this join shape explicitly). No server, no driver loop.

Scale: band-bucket join cost is Σ_bucket |e1_bucket|·|e2_bucket|. Hot
buckets (stop-token-heavy names) are handled by ``max_bucket`` — buckets
larger than the cap on either side are dropped (they carry near-zero
signal and quadratic cost); dropped-bucket count is observable via
``bucket_stats``. AQE skew-join splits the survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import explode_band_keys
from ..session import session_shuffle_width


def widen_if_narrow(df: DataFrame, *cols: str) -> DataFrame:
    """Widen-ONLY repartition to the session's shuffle width.

    Compute-dense per-row stages (MinHash signatures are num_perm
    JVM hash-min expressions per row; shingling/posting joins
    likewise) inherit the input's partitioning — a small table arrives
    as 1-2 parquet splits or a narrow checkpoint and the stage runs on
    1-2 cores at any cluster size (measured 5× on the sf0.1
    ngram-Jaccard path). Inputs already at least shuffle-width wide
    (any real corpus) pass through untouched, so parallelism is never
    SHRUNK at scale. PLANS.md "compute-dense Arrow stages"."""
    width = session_shuffle_width(df.sparkSession)
    if df.rdd.getNumPartitions() >= width:
        return df
    return df.repartition(width, *[F.col(c) for c in cols]) if cols else (
        df.repartition(width)
    )


def minhash_candidates(
    df1: DataFrame, df2: DataFrame, id_col: str, token_col: str,
    num_perm: int = 128, bands: int = 32, rows: int = 4,
    max_bucket: int | None = 10000, stats: dict | None = None,
) -> DataFrame:
    """Candidate pairs (src=id from df1, dst=id from df2) whose MinHash
    band keys collide in ≥1 band. Distinct pairs, long-format.

    ``stats``: pass a dict to receive hot-bucket drop counts
    (``dropped_buckets_{1,2}``, ``dropped_rows_{1,2}``) — the no-silent-
    caps observability hook (wired into StageStore metrics by the
    pipeline's string-channel stage)."""
    b1 = explode_band_keys(widen_if_narrow(df1, id_col), id_col, token_col,
                           num_perm, bands, rows)
    b2 = explode_band_keys(widen_if_narrow(df2, id_col), id_col, token_col,
                           num_perm, bands, rows)
    if max_bucket is not None:
        b1 = _cap_buckets(b1, max_bucket, stats, side=1)
        b2 = _cap_buckets(b2, max_bucket, stats, side=2)
    left = b1.select(F.col(id_col).alias("src"), "band", "key")
    right = b2.select(F.col(id_col).alias("dst"), "band", "key")
    return left.join(right, ["band", "key"]).select("src", "dst").distinct()


def _cap_buckets(bk: DataFrame, max_bucket: int, stats: dict | None = None,
                 side: int = 0) -> DataFrame:
    counts = bk.groupBy("band", "key").count()
    if stats is not None:
        # materialize the counts ONCE (localCheckpoint) so the eager
        # stats action and the keep filter share one band-key groupBy
        # instead of paying the shuffle twice for observability
        counts = counts.localCheckpoint(eager=True)
        row = (
            counts.where(F.col("count") > max_bucket)
            .agg(F.count("*").alias("nb"),
                 F.coalesce(F.sum("count"), F.lit(0)).alias("nr"))
            .first()
        )
        stats[f"dropped_buckets_{side}"] = int(row["nb"])
        stats[f"dropped_rows_{side}"] = int(row["nr"])
    keep = counts.where(F.col("count") <= max_bucket)
    return bk.join(keep.select("band", "key"), ["band", "key"], "left_semi")


def bucket_stats(df: DataFrame, id_col: str, token_col: str,
                 num_perm: int = 128, bands: int = 32, rows: int = 4) -> DataFrame:
    """Bucket-size distribution (skew observability; SURVEY.md G8-style
    stats for the blocking stage)."""
    bk = explode_band_keys(df, id_col, token_col, num_perm, bands, rows)
    return (
        bk.groupBy("band", "key").count()
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("count").alias("max_bucket"),
            F.avg("count").alias("avg_bucket"),
            F.expr("percentile_approx(count, 0.99)").alias("p99_bucket"),
        )
    )


def jaccard_selfjoin_prefix(
    df: DataFrame, id_col: str, token_col: str, threshold: float,
) -> DataFrame:
    """EXACT self-join Jaccard ≥ threshold via prefix filtering
    (AllPairs, Bayardo et al. WWW'07 — public algorithm): order each
    record's distinct tokens by GLOBAL frequency (rarest first); two
    records with Jaccard ≥ t must share a token within their first
    ``|A| − ⌈t·|A|⌉ + 1`` tokens, so the candidate join only touches
    prefixes — hot tokens sit at the END of every ordering and almost
    never join. Candidates are then verified exactly with
    array_intersect on the full token sets (JVM-side). Same results as
    the full posting join at a fraction of the join volume — the 100 TB
    shape for exact thresholded similarity. Returns (src, dst, jaccard)
    with src < dst."""
    toks = df.select(
        F.col(id_col).alias("rid"),
        F.array_distinct(F.col(token_col)).alias("toks"),
    ).withColumn("sz", F.size("toks"))
    post = toks.select("rid", "sz", F.explode("toks").alias("tok"))
    freq = post.groupBy("tok").agg(F.count("*").alias("f"))
    w = Window.partitionBy("rid").orderBy(F.col("f").asc(), F.col("tok").asc())
    prefix = (
        post.join(freq, "tok")
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1)
        .select("rid", "tok")
    )
    cand = (
        prefix.alias("a").join(prefix.alias("b"), "tok")
        .where(F.col("a.rid") < F.col("b.rid"))
        .select(F.col("a.rid").alias("src"), F.col("b.rid").alias("dst"))
        .distinct()
    )
    ta = toks.select(F.col("rid").alias("src"), F.col("toks").alias("ta"),
                     F.col("sz").alias("na"))
    tb = toks.select(F.col("rid").alias("dst"), F.col("toks").alias("tb"),
                     F.col("sz").alias("nb"))
    return (
        cand.join(ta, "src").join(tb, "dst")
        .withColumn("n_int", F.size(F.array_intersect("ta", "tb")))
        .withColumn(
            "jaccard",
            F.col("n_int") / (F.col("na") + F.col("nb") - F.col("n_int")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("src", "dst", "jaccard")
    )


def exact_jaccard_pairs(
    df1: DataFrame, df2: DataFrame, id_col: str, token_col: str,
    threshold: float = 0.5, max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram/token Jaccard join via posting-list self-join —
    the oracle-checkable counterpart of MinHash blocking (and the exact
    dedup path for `documents`). Returns (src, dst, jaccard).

    Pattern: explode tokens → join on token → count shared → sizes via
    two small aggs → |A∩B| / (|A|+|B|−|A∩B|). One shuffle on token,
    one on the pair.

    Skew: a token appearing in f docs contributes f² join rows.
    ``max_df`` drops tokens with df > max_df from the INTERSECTION join
    only (sizes keep them), making the result a LOWER bound on Jaccard —
    candidates are under-generated only for pairs whose sole overlap is
    stop-token-grade tokens, which sit far below any useful threshold.
    At web scale set max_df ≈ 1000 (the reference's high-freq stop-token
    drop, `text_utils.py:63-72`, is the same idea)."""
    t1 = df1.select(F.col(id_col).alias("src"), F.explode(F.array_distinct(F.col(token_col))).alias("tok"))
    t2 = df2.select(F.col(id_col).alias("dst"), F.explode(F.array_distinct(F.col(token_col))).alias("tok"))
    # set sizes come straight off the array column — a narrow projection
    # per doc row, not a groupBy over the exploded postings (saves two
    # full shuffles of the posting table)
    n1 = df1.select(
        F.col(id_col).alias("src"),
        F.size(F.array_distinct(F.col(token_col))).alias("n_src"),
    )
    n2 = df2.select(
        F.col(id_col).alias("dst"),
        F.size(F.array_distinct(F.col(token_col))).alias("n_dst"),
    )
    j1, j2 = t1, t2
    if max_df is not None:
        hot = (
            t1.groupBy("tok").count().unionByName(t2.groupBy("tok").count())
            .groupBy("tok").agg(F.max("count").alias("c"))
            .where(F.col("c") > max_df).select("tok")
        )
        j1 = t1.join(hot, "tok", "left_anti")
        j2 = t2.join(hot, "tok", "left_anti")
    inter = j1.join(j2, "tok").groupBy("src", "dst").agg(F.count("*").alias("n_int"))
    return (
        inter.join(n1, "src").join(n2, "dst")
        .withColumn(
            "jaccard",
            F.col("n_int") / (F.col("n_src") + F.col("n_dst") - F.col("n_int")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("src", "dst", "jaccard")
    )
