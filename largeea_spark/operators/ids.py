"""Deterministic dict-encoding (SURVEY.md A1, S1-S2).

The reference assigns dense int ids in first-seen TSV scan order
(`dataset.py:91-100` via `add_cnt_for`, `utils.py:338-347`) — a side
effect of scan order that is NOT reproducible across parallelism levels.
The engine's deterministic variant: ``row_number() OVER (ORDER BY key)``
(0-based), which yields identical ids at local[8] and local[32] (a
benchmark requirement, SURVEY.md §4.3 / §7.4.3). Parity metrics are all
computed in URI/name space, so the id-value deviation is inert.

Scale note: a global ``row_number`` over one unpartitioned window is a
single-reducer sort. ``dict_encode`` therefore uses
``zipWithIndex``-free, sort-based dense ranking: a global ``orderBy``
(range-partitioned sort, fully distributed) followed by
``monotonically_increasing_id`` would NOT be dense; instead we compute
per-partition counts of the sorted ids and add prefix offsets — the
classic distributed dense-id pattern. At 1e9+ keys this is one sort
shuffle + one tiny driver-side prefix sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dict_encode(df: DataFrame, key_col: str, id_col: str = "id") -> DataFrame:
    """Distinct values of ``key_col`` → dense, deterministic 0-based ids.

    Equivalent semantics to the reference's ``add_cnt_for``
    (`utils.py:338-347`) modulo id ordering (lexicographic, not
    first-seen — deterministic across parallelism; SURVEY.md §7.4.3).

    Returns DataFrame(key_col, id_col long), one row per distinct key.
    """
    distinct = df.select(key_col).where(F.col(key_col).isNotNull()).distinct()
    return assign_dense_ids(distinct, key_col, id_col)


def assign_dense_ids(distinct_df: DataFrame, key_col: str, id_col: str = "id") -> DataFrame:
    """Dense 0-based ids by lexicographic key order, without a
    single-reducer window.

    Pattern: sort (distributed range partitioning) → per-partition local
    rank via ``spark_partition_id`` grouping — implemented with RDD
    ``zipWithIndex`` which does exactly the count-then-offset two-pass and
    preserves the sort order. This is the one deliberate RDD use in the
    engine (per-partition prefix arithmetic; no DataFrame equivalent that
    avoids the 1-reducer window).
    """
    spark = distinct_df.sparkSession
    sorted_df = distinct_df.orderBy(key_col)
    schema = sorted_df.schema
    indexed = sorted_df.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1]))
    out_schema = schema.add(id_col, "long", False)
    return spark.createDataFrame(indexed, out_schema)


def encode_column(
    df: DataFrame, dim: DataFrame, key_col: str, out_col: str, dim_key: str | None = None,
    broadcast_dim: bool = False,
) -> DataFrame:
    """Replace a string key column with its dense id via an equi-join.

    Reference analogue: the dict lookup inside `dataset.py:92-99`.
    ``broadcast_dim=True`` for small dims (rel vocabularies);
    entity dims at 1e9 rows stay sort-merge (AQE handles skew).
    """
    dkey = dim_key or key_col
    d = dim.select(F.col(dkey).alias("__k"), F.col("id").alias(out_col))
    if broadcast_dim:
        d = F.broadcast(d)
    return (
        df.join(d, df[key_col] == d["__k"], "inner")
        .drop("__k", key_col)
    )


def with_offset(df: DataFrame, col: str, offset: int) -> Column:
    """Shifted id column (EAKit export shift, `dataset.py:66-85`)."""
    return (F.col(col) + F.lit(offset)).alias(col)
