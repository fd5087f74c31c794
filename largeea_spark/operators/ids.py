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
    single-reducer window and without a Python/RDD round-trip.

    Two-pass distributed dense-rank:
      1. range-partition + sort by key (disjoint ordered ranges);
      2. per-partition counts → tiny driver-side prefix sum →
         broadcast offsets;
      3. ``row_number`` windowed WITHIN each range partition + offset.

    Correctness does not depend on the (sampled) range boundaries: ids
    equal the global rank because ranges are disjoint and ordered —
    deterministic at any parallelism (the local[8]-vs-local[32]
    id-stability requirement, SURVEY.md §4.3.3). Stays entirely in
    whole-stage codegen.
    """
    from pyspark.sql import Window

    spark = distinct_df.sparkSession
    n_part = max(2, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    # localCheckpoint pins the (sampled) range boundaries so the count
    # pass and the id pass see identical partitioning
    ranged = (
        distinct_df.repartitionByRange(n_part, F.col(key_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {r["__pid"]: r["cnt"] for r in
              ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off long"
        )
    )
    w = Window.partitionBy("__pid").orderBy(key_col)
    return (
        ranged.join(off_df, "__pid")
        .withColumn(id_col, F.row_number().over(w) - 1 + F.col("__off"))
        .drop("__pid", "__off")
    )


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
