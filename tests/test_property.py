"""Property-based tests (hypothesis) for parity-critical scalar kernels:
the Levenshtein ratio (F6) and the hashed encoder's determinism. These
run WITHOUT Spark — pure numpy — so hypothesis can afford many examples."""

import numpy as np
from hypothesis import given, settings, strategies as st

from largeea_spark.functions.levenshtein import batch_ratio, lcs_len, ratio_py
from largeea_spark.functions.vectors import _ngram_hash_embed

# moderate alphabet incl. multibyte + combining chars to stress the
# utf-32 encode path
_ALPHA = st.sampled_from(list("abcXYZ01 _-é漢🚀́"))
_TEXT = st.text(alphabet=_ALPHA, max_size=24)


def _dist2_reference(a: str, b: str) -> int:
    """Textbook edit distance with substitution cost 2 (insert/delete 1)
    — the python-Levenshtein ``ratio`` distance. O(len·len) DP."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            sub = prev[j - 1] + (0 if a[i - 1] == b[j - 1] else 2)
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub)
        prev = cur
    return prev[lb]


@given(_TEXT, _TEXT)
@settings(max_examples=300, deadline=None)
def test_ratio_matches_sub2_edit_distance(a, b):
    total = len(a) + len(b)
    want = 1.0 if total == 0 else (total - _dist2_reference(a, b)) / total
    assert abs(ratio_py(a, b) - want) < 1e-12


@given(st.lists(st.tuples(_TEXT, _TEXT), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_batch_ratio_matches_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = batch_ratio(a, b)
    want = np.array([ratio_py(x, y) for x, y in pairs])
    assert np.allclose(got, want, atol=1e-12)


@given(_TEXT, _TEXT)
@settings(max_examples=200, deadline=None)
def test_lcs_symmetry_and_bounds(a, b):
    l = lcs_len(a, b)
    assert l == lcs_len(b, a)
    assert 0 <= l <= min(len(a), len(b))
    assert lcs_len(a, a) == len(a)


@given(st.lists(_TEXT, min_size=1, max_size=10))
@settings(max_examples=50, deadline=None)
def test_hashed_encoder_row_independent(texts):
    """Each row's embedding depends only on its own text — batch
    composition must not matter (parallelism invariance)."""
    full = _ngram_hash_embed(texts, 32, 3)
    for i, t in enumerate(texts):
        solo = _ngram_hash_embed([t], 32, 3)
        assert np.array_equal(full[i], solo[0])
