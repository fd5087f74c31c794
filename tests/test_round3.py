"""Round-3 regression tests: ANN auto-selection, payload replication
fix, watermarked streaming dedup, d=768 chunked propagation, the
GCN-Align-shaped backbone, and single-pass triple placement."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from largeea_spark.sources import fixtures
from largeea_spark.sources.kg import KGPair, encode_graph, encode_links


def _small_pair(spark, n_ents=120, n_links=90, link_ratio=0.3):
    t1, t2, links, _ = fixtures.two_kg_fixture(
        spark, n_ents=n_ents, n_triples=3 * n_ents, n_links=n_links
    )
    kg1, kg2 = encode_graph(t1), encode_graph(t2)
    lk = encode_links(links, kg1.ent, kg2.ent, link_ratio)
    return KGPair(kg1=kg1, kg2=kg2, links=lk), lk


# ---------------------------------------------------------------------------
# ANN auto-selection (VERDICT r2 #1): brute below the threshold, IVF above
# ---------------------------------------------------------------------------

def test_name_embedding_auto_selects_by_index_size(spark):
    from largeea_spark.plans.name_channel import name_embedding_similarity

    pair, _ = _small_pair(spark)

    def key_set(df):
        return {(r.src, r.dst) for r in df.collect()}

    brute = name_embedding_similarity(pair, k=10, method="brute")
    # default threshold (100k) >> fixture size → auto must take brute
    st_small: dict = {}
    auto_small = name_embedding_similarity(pair, k=10, method="auto",
                                           stats=st_small)
    assert key_set(auto_small) == key_set(brute)
    assert st_small["knn_method"] == "brute" and st_small["n_index"] == 120

    # threshold 1 → auto must take IVF with the same derived nlist/nprobe
    ivf = name_embedding_similarity(pair, k=10, method="ivf")
    st_big: dict = {}
    auto_big = name_embedding_similarity(pair, k=10, method="auto",
                                         ivf_threshold=1, stats=st_big)
    assert key_set(auto_big) == key_set(ivf)
    assert st_big["knn_method"] == "ivf"
    # and the IVF result differs from brute only mildly (recall, not junk)
    inter = len(key_set(ivf) & key_set(brute))
    assert inter / max(len(key_set(brute)), 1) > 0.8


# ---------------------------------------------------------------------------
# pack_batch_payload: KG1 triples joined on distinct p1 (ADVICE r2)
# ---------------------------------------------------------------------------

def test_pack_payload_t1_not_replicated_with_topk_corr(spark):
    from largeea_spark.operators.trainer import pack_batch_payload

    parts1 = spark.createDataFrame([(i, 0) for i in range(4)], "id long, part int")
    parts2 = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, part int"
    )
    placed1 = spark.createDataFrame(
        [(0, 0, 1, 0), (1, 0, 2, 0), (2, 0, 3, 0)],
        "src long, rel long, dst long, part int",
    )
    placed2 = spark.createDataFrame(
        [(0, 0, 1, 0), (2, 0, 3, 1)], "src long, rel long, dst long, part int"
    )
    train = spark.createDataFrame([(0, 0), (1, 1)], "e1 long, e2 long")
    emb1 = spark.createDataFrame(
        [(i, [0.1, 0.2]) for i in range(4)], "id long, emb array<double>"
    )
    emb2 = spark.createDataFrame(
        [(i, [0.3, 0.4]) for i in range(4)], "id long, emb array<double>"
    )
    # top_k_corr=2 shape: src part 0 unions BOTH trg parts
    payload = pack_batch_payload(
        [(0, 0), (0, 1)], parts1, parts2, placed1, placed2, train, emb1, emb2
    )
    counts = {r.kind: r.n for r in
              payload.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert counts["t1"] == 3, f"KG1 triples replicated per (p1,p2): {counts}"
    assert counts["t2"] == 2      # trg triples DO come from both parts
    assert counts["seed"] == 2
    assert counts["e1"] == 4      # KG1 entities once per src batch
    assert counts["e2"] == 4      # both trg parts' entities


# ---------------------------------------------------------------------------
# streaming dedup: watermarked mode dedups on md5 alone (ADVICE r2)
# ---------------------------------------------------------------------------

def test_stream_dedup_watermark_md5_only(spark, tmp_path):
    import datetime as dt

    from largeea_spark.streaming.ingest import stream_dedup_documents

    src = str(tmp_path / "wm_in")
    ts0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (0, "alpha text", "en", "web", 10, ts0),
        # same text, DIFFERENT timestamp → must still be dropped
        (1, "alpha text", "en", "web", 10, ts0 + dt.timedelta(minutes=5)),
        (2, "beta text", "en", "web", 9, ts0),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long, warc_ts timestamp",
    ).write.parquet(src)
    out, ckpt = str(tmp_path / "wm_out"), str(tmp_path / "wm_ckpt")
    n = stream_dedup_documents(spark, src, out, ckpt,
                               watermark_col="warc_ts", watermark="1 hour")
    assert n == 2, "same-md5 rows with different event times were kept"


# ---------------------------------------------------------------------------
# d=768 guard: chunked per-dimension aggregation ≡ numpy ground truth
# ---------------------------------------------------------------------------

def _numpy_propagate(edges, h, n_layers, alpha=1.0):
    """Reference semantics of propagate_embeddings: h ← L2norm(h + α·Âh)
    with Â the multiplicity-weighted sym-normalized undirected adjacency."""
    n = h.shape[0]
    und = {}
    for s, d in edges:
        for a, b in ((s, d), (d, s)):
            und[(a, b)] = und.get((a, b), 0.0) + 1.0
    deg = np.zeros(n)
    for (a, _), m in und.items():
        deg[a] += m
    h = h.astype(np.float64).copy()
    for _ in range(n_layers):
        msg = np.zeros_like(h)
        for (a, b), m in und.items():
            msg[b] += (m / np.sqrt(deg[a] * deg[b])) * h[a]
        h = h + alpha * msg
        h /= np.maximum(np.linalg.norm(h, axis=1, keepdims=True), 1e-12)
    return h


@pytest.mark.parametrize("dim", [64, 768])
def test_propagate_embeddings_matches_numpy(spark, dim):
    from largeea_spark.operators.structure import propagate_embeddings

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    rng = np.random.default_rng(3)
    h0 = rng.standard_normal((4, dim))
    triples = spark.createDataFrame(
        [(s, 0, d) for s, d in edges], "src long, rel long, dst long"
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in h0[i]]) for i in range(4)],
        "id long, emb array<double>",
    )
    got = {r.id: np.array(r.emb) for r in
           propagate_embeddings(triples, emb, n_layers=2).collect()}
    want = _numpy_propagate(edges, h0, n_layers=2)
    for i in range(4):
        assert np.allclose(got[i], want[i], atol=1e-9), f"node {i} (d={dim})"


def test_propagate_grouped_d768(spark):
    """Grouped variant at d=768: each group propagates independently and
    matches the ungrouped result on its own subgraph."""
    from largeea_spark.operators.structure import (
        propagate_embeddings, propagate_embeddings_grouped,
    )

    dim = 768
    rng = np.random.default_rng(7)
    h0 = rng.standard_normal((4, dim))
    edges = [(0, 1), (2, 3)]
    triples_g = spark.createDataFrame(
        [(0, 0, 0, 1), (1, 2, 0, 3)], "batch int, src long, rel long, dst long"
    )
    emb_g = spark.createDataFrame(
        [(g, i, [float(x) for x in h0[i]])
         for g, ids in ((0, (0, 1)), (1, (2, 3))) for i in ids],
        "batch int, id long, emb array<double>",
    )
    got = {(r.batch, r.id): np.array(r.emb) for r in
           propagate_embeddings_grouped(triples_g, emb_g, n_layers=1).collect()}
    for g, (a, b) in ((0, (0, 1)), (1, (2, 3))):
        tri = spark.createDataFrame([(a, 0, b)], "src long, rel long, dst long")
        emb = spark.createDataFrame(
            [(i, [float(x) for x in h0[i]]) for i in (a, b)],
            "id long, emb array<double>",
        )
        want = {r.id: np.array(r.emb) for r in
                propagate_embeddings(tri, emb, n_layers=1).collect()}
        assert np.allclose(got[(g, a)], want[a], atol=1e-9)
        assert np.allclose(got[(g, b)], want[b], atol=1e-9)


# ---------------------------------------------------------------------------
# GCN-Align-shaped backbone (M6 analogue)
# ---------------------------------------------------------------------------

def test_gcn_backbone_deterministic_and_seed_tying():
    from largeea_spark.operators.trainer import train_embeddings_gcn_np

    rng = np.random.default_rng(5)
    ids1 = np.arange(6, dtype=np.int64)
    ids2 = np.arange(6, dtype=np.int64)
    emb1 = rng.standard_normal((6, 16))
    emb2 = rng.standard_normal((6, 16))
    t1 = np.array([[0, 0, 1], [1, 0, 2], [2, 1, 3], [3, 1, 4], [4, 0, 5]],
                  dtype=np.int64)
    t2 = t1.copy()
    seeds = np.array([[0, 0], [3, 3]], dtype=np.int64)
    r1a, r2a = train_embeddings_gcn_np(ids1, emb1, ids2, emb2, t1, t2, seeds)
    r1b, r2b = train_embeddings_gcn_np(ids1, emb1, ids2, emb2, t1, t2, seeds)
    assert np.array_equal(r1a, r1b) and np.array_equal(r2a, r2b)
    # seed pairs are pinned to the shared mean → identical vectors
    assert np.allclose(r1a[0], r2a[0]) and np.allclose(r1a[3], r2a[3])
    # non-seed vectors differ across sides (different name init)
    assert not np.allclose(r1a[1], r2a[1])


def test_gcn_backbone_channel_quality(spark):
    from largeea_spark.functions.vectors import encode_names
    from largeea_spark.operators import evalx
    from largeea_spark.plans.name_channel import entity_names
    from largeea_spark.plans.structure_channel import (
        trained_batched_structure_similarity,
    )

    pair, lk = _small_pair(spark)
    e1 = encode_names(entity_names(pair.kg1.ent, False), "name", dim=32).select("id", "emb")
    e2 = encode_names(entity_names(pair.kg2.ent, False), "name", dim=32).select("id", "emb")
    sim, stats = trained_batched_structure_similarity(
        pair, e1, e2, k_parts=2, knn_k=10, algo="gcn"
    )
    test = lk.where(F.col("split") == "test")
    acc = evalx.accuracy(sim, test)
    assert sim.count() > 0 and acc > 0.3, f"gcn channel collapsed: {acc}"


# ---------------------------------------------------------------------------
# single-pass place_triples (VERDICT r2 #8): same counts as the old form
# ---------------------------------------------------------------------------

def test_place_triples_counts(spark):
    from largeea_spark.operators.partition_kg import place_triples

    triples = spark.createDataFrame(
        [(0, 0, 1), (1, 0, 2), (2, 0, 3), (0, 1, 3)],
        "src long, rel long, dst long",
    )
    parts = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, part int"
    )
    kept, dropped = place_triples(triples, parts)
    rows = {(r.src, r.rel, r.dst, r.part) for r in kept.collect()}
    assert rows == {(0, 0, 1, 0), (2, 0, 3, 1)}
    assert dropped == 2


# ---------------------------------------------------------------------------
# compute-dense stage pinning: the GEMM cogroup must sit on explicit
# REPARTITION_BY_NUM exchanges (AQE byte-based coalescing would
# serialize it), with no extra ENSURE_REQUIREMENTS exchange in between,
# and the auto grid must widen to the session's shuffle width
# ---------------------------------------------------------------------------

def test_knn_cogroup_pinned_at_shuffle_width(spark):
    import pandas as pd

    from largeea_spark.functions.vectors import encode_names
    from largeea_spark.operators.knn import _auto_grid, knn_topk

    n = 400
    df = spark.createDataFrame(
        pd.DataFrame({
            "id": range(n),
            "name": [f"Entity_{i}_{(i * i) % 881}_{i % 7}" for i in range(n)],
        })
    )
    e = encode_names(df, "name", dim=32).select("id", "emb")
    sim = knn_topk(e, e, k=5)
    plan = sim._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    cog = [i for i, ln in enumerate(lines) if "FlatMapCoGroupsInPandas" in ln]
    assert cog, plan
    # both cogroup children repartitioned with an explicit count
    assert plan.count("REPARTITION_BY_NUM") >= 2, plan
    # no planner-inserted exchange between the pinned repartition and
    # the cogroup (the explicit one must satisfy the distribution)
    below = "\n".join(lines[cog[0]:])
    first_ex = [ln for ln in below.splitlines() if "Exchange" in ln]
    assert first_ex and "REPARTITION_BY_NUM" in first_ex[0], below[:800]

    # grid widening: 1×1 memory grid fans out to >= shuffle width cells
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nqb, nb = _auto_grid(20000, 20000, 1, 1, width)
    assert nqb * nb >= width
    # and honors memory-cap lower bounds
    nqb2, nb2 = _auto_grid(1000, 10_000_000, 1, 100, width)
    assert nb2 >= 100

    # exactness unchanged by the widened grid: same (src, dst) set as
    # an explicit 2×2 grid (both merge via the deterministic windowed
    # top-k; the 1×1 fast path differs only in k-boundary tie selection)
    two = knn_topk(e, e, k=5, n_blocks=2, n_query_blocks=2)
    assert {(r.src, r.dst) for r in sim.collect()} == \
        {(r.src, r.dst) for r in two.collect()}


def test_string_similarity_scoring_stage_pinned(spark):
    from largeea_spark.plans.name_channel import string_similarity

    pair, _ = _small_pair(spark)
    sim = string_similarity(pair)
    plan = sim._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan, plan[:1200]
    assert sim.count() > 0


# ---------------------------------------------------------------------------
# name-encoder dim auto-widening: below the entity threshold the auto
# default must be byte-for-byte the dim=64 pipeline (no behavior change
# for small runs); the threshold path is covered by SCALE.md soaks
# ---------------------------------------------------------------------------

def test_align_emb_dim_auto_small_equals_64(spark, tmp_path):
    from largeea_spark.plans.pipeline import align_kg_pair
    from largeea_spark.sources.stage import StageStore

    pair, _ = _small_pair(spark)
    res_a = align_kg_pair(
        spark, pair, StageStore(spark, str(tmp_path / "a")), knn_k=10,
        emb_dim="auto", k_parts=2,
    )
    res_64 = align_kg_pair(
        spark, pair, StageStore(spark, str(tmp_path / "b")), knn_k=10,
        emb_dim=64, k_parts=2,
    )
    assert res_a["metrics"]["fused"] == res_64["metrics"]["fused"]
