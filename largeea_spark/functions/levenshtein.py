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


_PAD_A = 0xFFFFFFFF
_PAD_B = 0xFFFFFFFE


def _encode_padded(strs: list, pad: int, width: int) -> np.ndarray:
    out = np.full((len(strs), width), pad, dtype=np.uint32)
    for i, s in enumerate(strs):
        if s:
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            out[i, : len(cp)] = cp
    return out


def batch_lcs_len(a_strs: list, b_strs: list) -> np.ndarray:
    """Exact LCS lengths for a batch of pairs, DP vectorized across the
    PAIR axis: each DP row update is one numpy op over all pairs at
    once, so per-pair cost is ~la·lb array-element ops instead of
    la·lb numpy-call overheads (~40× faster on short strings).

    Distinct padding sentinels on each side never match, and because DP
    rows are monotone non-decreasing, padded iterations/columns are
    no-ops — answers are read at each pair's true (la, lb) corner."""
    B = len(a_strs)
    la = np.array([len(s) if s else 0 for s in a_strs], dtype=np.int64)
    lb = np.array([len(s) if s else 0 for s in b_strs], dtype=np.int64)
    wa, wb = int(la.max(initial=0)), int(lb.max(initial=0))
    if wa == 0 or wb == 0:
        return np.zeros(B, dtype=np.int64)
    A = _encode_padded(a_strs, _PAD_A, wa)
    Bm = _encode_padded(b_strs, _PAD_B, wb)
    prev = np.zeros((B, wb + 1), dtype=np.int32)
    zeros = np.zeros((B, 1), dtype=np.int32)
    for i in range(wa):
        match = prev[:, :-1] + (A[:, i : i + 1] == Bm)
        cur = np.maximum(match, prev[:, 1:])
        cur = np.maximum.accumulate(np.concatenate([zeros, cur], axis=1), axis=1)
        prev = cur
    return prev[np.arange(B), lb].astype(np.int64)


def batch_ratio(a_strs: list, b_strs: list, chunk: int = 2048) -> np.ndarray:
    """Batched ratio with length-bucketing: pairs sorted by combined
    length and chunked so one outlier string doesn't inflate the padded
    DP for the whole batch."""
    B = len(a_strs)
    a_strs = ["" if s is None else s for s in a_strs]
    b_strs = ["" if s is None else s for s in b_strs]
    order = np.argsort([len(a) + len(b) for a, b in zip(a_strs, b_strs)], kind="stable")
    out = np.zeros(B, dtype=np.float64)
    for lo in range(0, B, chunk):
        idx = order[lo : lo + chunk]
        aa = [a_strs[i] for i in idx]
        bb = [b_strs[i] for i in idx]
        lcs = batch_lcs_len(aa, bb)
        tot = np.array([len(x) + len(y) for x, y in zip(aa, bb)], dtype=np.float64)
        r = np.where(tot > 0, 2.0 * lcs / np.maximum(tot, 1.0), 1.0)
        out[idx] = r
    return out


@F.pandas_udf(DoubleType())
def levenshtein_ratio(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) Levenshtein ratio column — pair-axis
    batched LCS DP (see batch_lcs_len). Null on either side scores 0.0,
    matching ``ratio_py`` (batch_ratio alone would coerce None→"" and
    score a None/None pair 1.0)."""
    out = batch_ratio(s1.tolist(), s2.tolist())
    null_mask = (s1.isna() | s2.isna()).to_numpy()
    if null_mask.any():
        out = np.where(null_mask, 0.0, out)
    return pd.Series(out, dtype="float64")
