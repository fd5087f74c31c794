"""Round-6 optimization tests: the blocked Jaccard kernel must be a
drop-in replacement for the posting join (bitwise-identical pairs and
jaccard values), and the knn query-grid widening must not change
results. Each test pins the EXACT output equivalence the optimization
round promises ("do not change what any declared query computes")."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from largeea_spark.operators import dedup  # noqa: E402
from largeea_spark.operators.blocking import jaccard_selfjoin_blocked  # noqa: E402


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs_set(df):
    return {(r["a"], r["b"], r["jaccard"]) for r in df.collect()}


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # a boilerplate-heavy corpus: 40 near-identical docs (hot shingles,
    # the posting join's quadratic case), plus unique tails, short docs,
    # an empty doc and a whitespace-only doc
    rows = []
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    for i in range(40):
        rows.append((i, boiler + f" variant {i % 4}"))
    for i in range(40, 60):
        rows.append((i, f"unique document number {i} with words w{i} x{i} y{i} z{i}"))
    rows += [(60, "tiny"), (61, "two words"), (62, ""), (63, "   ")]
    return rows


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
@pytest.mark.parametrize("n", [2, 3])
def test_blocked_equals_posting_on_skewed_corpus(spark, skewed_docs, threshold, n):
    docs = _docs(spark, skewed_docs)
    a = _pairs_set(dedup.ngram_jaccard_pairs(docs, n=n, threshold=threshold,
                                             method="posting"))
    b = _pairs_set(dedup.ngram_jaccard_pairs(docs, n=n, threshold=threshold,
                                             method="blocked"))
    assert a == b  # identical pairs AND bitwise-identical jaccard floats
    assert len(b) > 0  # the boilerplate cluster must be found


def test_blocked_corpus_smaller_than_grid(spark):
    # fewer docs than blocks: most cells empty, results still exact
    docs = _docs(spark, [(1, "a b c d e"), (2, "a b c d f"), (3, "x y z w q")])
    a = _pairs_set(dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.3,
                                             method="posting"))
    b = _pairs_set(dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.3,
                                             method="blocked"))
    assert a == b
    assert len(b) == 1  # (1,2) share 2 of 6 distinct bigrams


def test_blocked_null_text_rows_dropped_like_posting(spark):
    docs = spark.createDataFrame(
        [(1, "shared text body here"), (2, "shared text body here"), (3, None)],
        "doc_id long, text string",
    )
    a = _pairs_set(dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5,
                                             method="posting"))
    b = _pairs_set(dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5,
                                             method="blocked"))
    assert a == b == {(1, 2, 1.0)}


def test_blocked_pair_budget_chunking_exact(spark, skewed_docs):
    # force many expansion chunks (budget far below the pair volume);
    # counts must merge exactly across chunks
    docs = _docs(spark, skewed_docs)
    from largeea_spark.operators.dedup import _doc_tokens

    t = _doc_tokens(docs, "doc_id", "text", 2)
    small = jaccard_selfjoin_blocked(t, "doc_id", "grams", 0.3, pair_budget=7)
    big = jaccard_selfjoin_blocked(t, "doc_id", "grams", 0.3)
    assert _pairs_set(small.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                                   "jaccard")) == \
        _pairs_set(big.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                              "jaccard"))


def test_knn_query_grid_widening_keeps_results(spark):
    # >1024 queries triggers the widened query grid when only n_blocks
    # is pinned; the per-src result set must equal the unwidened run
    import numpy as np

    rng = np.random.default_rng(3)
    n, d = 1536, 8
    emb = rng.standard_normal((n, d)).round(3)
    rows = [(i, [float(x) for x in emb[i]]) for i in range(n)]
    e = spark.createDataFrame(rows, "id long, emb array<double>")
    from largeea_spark.operators.knn import knn_topk

    wide = knn_topk(e, e, k=5, n_blocks=2)  # widened path (nqb auto)
    narrow = knn_topk(e, e, k=5, n_blocks=2, n_query_blocks=1)
    sw = {(r["src"], r["dst"]) for r in wide.collect()}
    sn = {(r["src"], r["dst"]) for r in narrow.collect()}
    assert sw == sn


def test_cc_loop_same_labels_after_shuffle_restructure(spark):
    # chains + stars + isolated pairs: labels must be the exact min-id
    # of each component (the restructured rounds change only the plan)
    from largeea_spark.operators.canonical import connected_components

    edges = [(i, i + 1) for i in range(0, 20)]            # one chain 0..20
    edges += [(100, x) for x in range(101, 110)]          # a star
    edges += [(200, 201), (300, 301)]                     # pairs
    df = spark.createDataFrame(edges, "a long, b long")
    got = {(r["node"], r["component"]) for r in connected_components(df).collect()}
    want = {(i, 0) for i in range(21)}
    want |= {(x, 100) for x in [100] + list(range(101, 110))}
    want |= {(200, 200), (201, 200), (300, 300), (301, 300)}
    assert got == want


@pytest.mark.parametrize("diagonal", [True, False])
@pytest.mark.parametrize("budget", [3, 8_000_000])
def test_cell_kernel_matches_bruteforce(diagonal, budget):
    # the division-free int32 expansion (round-6 follow-up) must count
    # intersections exactly — pin the kernel directly against an O(n^2)
    # set-based reference on an irregular cell, with the tightest
    # possible pair_budget chunking (3 pairs per chunk)
    import numpy as np
    import pandas as pd

    from largeea_spark.operators.blocking import _make_jaccard_cell_kernel

    rng = np.random.default_rng(42)
    def mk(n_docs, base, blk):
        rows = [np.unique(rng.integers(-50, 50, size=rng.integers(1, 12))
                          .astype(np.int64)) for _ in range(n_docs)]
        return pd.DataFrame({
            "rid": np.arange(base, base + n_docs, dtype=np.int64),
            "n": [len(r) for r in rows], "hg": rows,
            "ci": np.full(n_docs, 0, dtype=np.int32),
            "cj": np.full(n_docs, blk, dtype=np.int32)})

    left = mk(37, 0, 0 if diagonal else 1)
    right = left.copy() if diagonal else mk(41, 1000, 1)
    threshold = 0.25
    out = _make_jaccard_cell_kernel(threshold, budget)(left, right)
    got = {(int(r.src), int(r.dst), float(r.jaccard))
           for r in out.itertuples()}

    want = set()
    for i in range(len(left)):
        for j in range(len(right)):
            a, b = set(left["hg"][i]), set(right["hg"][j])
            n_int = len(a & b)
            if n_int == 0:
                continue
            jac = float(n_int) / (len(a) + len(b) - n_int)
            s, d = int(left["rid"][i]), int(right["rid"][j])
            if diagonal:
                if not (s < d and jac >= threshold):
                    continue
            else:
                if jac < threshold:
                    continue
                s, d = min(s, d), max(s, d)
            want.add((s, d, jac))
    assert got == want and len(want) > 0
