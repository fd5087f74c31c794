"""Levenshtein **ratio** (SURVEY.md F6) — parity-critical.

`python-Levenshtein`'s ``ratio`` (used at `text_utils.py:277-279`) is
``(len1+len2 − dist₂) / (len1+len2)`` where ``dist₂`` is edit distance
with substitution cost 2 (insert/delete cost 1). With substitution
costing exactly delete+insert, the optimal alignment never substitutes,
so ``dist₂ = len1 + len2 − 2·LCS(s1,s2)`` and therefore

    ratio(s1, s2) = 2·LCS(s1, s2) / (len1 + len2)

(empty+empty → 1.0, one empty → 0.0, matching python-Levenshtein).
This is NOT Spark's builtin ``levenshtein()`` (absolute unit-cost
distance) and NOT ``1 − lev/max(len)``; SURVEY.md §7.4.1.

Implemented as an Arrow pandas UDF — vectorized batch transfer, per-pair
LCS DP with a numpy rolling row (O(len1·len2) each, O(min_len) memory).
Hot path at scale: pairs arrive pre-blocked by MinHash-LSH (J7), so the
pair count is ~linear in entity count, not quadratic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def lcs_len(a: str, b: str) -> int:
    """Length of the longest common subsequence (classic DP, numpy row)."""
    if not a or not b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    # b is the shorter string; one DP row over b.
    b_arr = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.zeros(len(b_arr) + 1, dtype=np.int32)
    for ch in a:
        code = ord(ch)
        match = prev[:-1] + (b_arr == code)
        # cur[j+1] = max(match[j], cur[j], prev[j+1]) — the cur[j]
        # dependency is a running max, done with np.maximum.accumulate
        # over (match shifted) interleaved with prev.
        cur = np.maximum(match, prev[1:])
        cur = np.maximum.accumulate(np.concatenate(([0], cur)))
        # accumulate handles cur[j+1] >= cur[j]; but LCS needs
        # cur[j+1] >= cur[j] only via the "skip b[j]" move, which the
        # running max provides exactly.
        prev = cur
    return int(prev[-1])


def ratio_py(s1: str, s2: str) -> float:
    """python-Levenshtein ``ratio`` semantics (see module docstring)."""
    if s1 is None or s2 is None:
        return 0.0
    total = len(s1) + len(s2)
    if total == 0:
        return 1.0
    return 2.0 * lcs_len(s1, s2) / total


@F.pandas_udf(DoubleType())
def levenshtein_ratio(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) Levenshtein ratio column."""
    return pd.Series(
        [ratio_py(a, b) for a, b in zip(s1.tolist(), s2.tolist())],
        dtype="float64",
    )
