"""Event-stream relational operators: sessionization and as-of join.

Not present in the reference (it has no time dimension — SURVEY §2.7
notes `warc_ts` is pass-through lineage), but first-class for the
training-data pipeline over the `events` table and standard OLAP
surface coverage.

Both are pure window compositions (no UDF):
- sessionize: gap-based session ids via lag + running sum — the classic
  Spark sessionization (one shuffle on the user key).
- asof_join: union-merge + last-non-null carry-forward window — Spark
  has no native ASOF; this is the standard O(n log n) single-shuffle
  formulation (vs the quadratic range-join naive form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: float = 30.0) -> DataFrame:
    """Attach ``session_id`` (per-user 1-based ordinal): a new session
    starts when the gap from the previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60.0
    # cast via TIMESTAMP: TIMESTAMP_NTZ has no direct numeric cast
    secs = lambda c: c.cast("timestamp").cast("double")  # noqa: E731
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull() | ((secs(F.col(ts_col)) - secs(prev)) > gap_s),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def asof_join(
    left: DataFrame, right: DataFrame, key_col: str, ts_col: str,
    value_cols: list[str], suffix: str = "_asof",
) -> DataFrame:
    """For each left row, the most recent right row with the same key and
    ``right.ts <= left.ts`` (ties on ts: larger right row wins via the
    deterministic pre-dedup below). Left rows with no match keep nulls.

    Implementation: tag and union both sides, sort per key by
    (ts, side) with right-before-left at equal ts, carry the right
    values forward with last(ignorenulls), keep left rows. One shuffle.
    """
    # dedup right to one row per (key, ts): keep the max of value cols'
    # carrying row deterministically (row_number by all value cols desc)
    wdedup = Window.partitionBy(key_col, ts_col).orderBy(
        *[F.col(c).desc() for c in value_cols]
    )
    r = (
        right.withColumn("__rn", F.row_number().over(wdedup))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    lcols = left.columns
    l_tag = left.withColumn("__side", F.lit(1))
    for c in value_cols:
        l_tag = l_tag.withColumn(f"__v_{c}", F.lit(None).cast(dict(r.dtypes)[c]))
    r_tag = r.select(
        F.col(key_col), F.col(ts_col),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    ).withColumn("__side", F.lit(0))
    for c in lcols:
        if c not in (key_col, ts_col):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))
    merged = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col("__side").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    out = merged
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.last(f"__v_{c}", ignorenulls=True).over(w))
    return out.where(F.col("__side") == 1).select(
        *lcols, *[f"{c}{suffix}" for c in value_cols]
    )
