"""Vector functions: L2-normalize, cosine, deterministic hashed
char-n-gram name encoder (SURVEY.md F7/F8, A6 stand-in).

The reference's name encoder is BERT max-pooling (`emb_loader.py:119-182`)
— a GPU/model boundary. The engine's *default* encoder is a deterministic
hashed char-n-gram bag (feature hashing, the classic "hashing trick"),
which needs no model download, is reproducible across parallelism levels,
and preserves the downstream contract: ``DataFrame(id long, emb
array<float>)``. A real transformer encoder slots in behind the same
``mapInPandas`` signature (SURVEY.md §7.1 step 3).

All heavy math is numpy inside Arrow pandas UDFs — no per-row Python in
the JVM↔Python boundary (BASELINE.json input_hint).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType, FloatType


def l2_normalize_expr(col: str) -> Column:
    """F8: row L2-normalize an array<float/double> column, JVM-side.

    `utils.py:73-76` / `text_utils.py:133-137` (norm_process).
    Zero vectors pass through unchanged (reference divides and gets nan;
    we keep zeros — deviation documented, only affects empty names).
    """
    norm = F.sqrt(F.aggregate(F.col(col), F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when(norm > 0, F.transform(F.col(col), lambda x: x / norm)).otherwise(
        F.col(col)
    )


def dot_expr(a: str | Column, b: str | Column) -> Column:
    """F7: dot product of two array columns via zip_with + aggregate
    (JVM-side, codegen'd — no UDF). `utils.py:34-38`."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two array columns, JVM-side."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    sq = lambda c: F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)  # noqa: E731
    denom = F.sqrt(sq(ca)) * F.sqrt(sq(cb))
    return F.when(denom > 0, dot_expr(ca, cb) / denom).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# Deterministic hashed char-n-gram encoder (BERT stand-in, A6)
# ---------------------------------------------------------------------------

def _ngram_hash_embed(texts: list, dim: int, n: int) -> np.ndarray:
    """Feature-hash char n-grams (with boundary padding) into R^dim,
    signed by one hash bit, then L2-normalized. crc32-based → stable
    across processes, Python versions and parallelism levels."""
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        if t is None:
            continue
        s = f"\x02{t}\x03"  # boundary marks so short names still get grams
        bs = s.encode("utf-8")
        L = len(s)
        if L < n:
            grams = [bs]
        else:
            enc = [c.encode("utf-8") for c in s]
            grams = [b"".join(enc[j : j + n]) for j in range(L - n + 1)]
        row = out[i]
        for g in grams:
            h = zlib.crc32(g)
            sign = 1.0 if (h >> 16) & 1 else -1.0
            row[h % dim] += sign
        nrm = np.linalg.norm(row)
        if nrm > 0:
            row /= nrm
    return out


def hashed_name_encoder(dim: int = 64, n: int = 3):
    """Returns a pandas UDF string → array<float> embedding column."""

    @F.pandas_udf(ArrayType(FloatType()))
    def encode(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            mat = _ngram_hash_embed(s.tolist(), dim, n).astype(np.float32)
            yield pd.Series(list(mat))

    return encode


def encode_names(df: DataFrame, name_col: str, out_col: str = "emb",
                 dim: int = 64, n: int = 3) -> DataFrame:
    """Attach the deterministic name embedding (contract of A6/M9:
    ``id → array<float>``)."""
    return df.withColumn(out_col, hashed_name_encoder(dim, n)(F.col(name_col)))
