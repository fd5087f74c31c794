"""End-to-end pipeline tests: web-corpus KG construction with
checkpoint/resume + lineage, and the full two-KG alignment phase graph
(SURVEY.md §3 lifecycle, north rule)."""

import pytest
from pyspark.sql import functions as F

from largeea_spark.plans.pipeline import align_kg_pair, construct_kg_from_pages
from largeea_spark.sources import fixtures
from largeea_spark.sources.kg import KGPair, encode_graph, encode_links
from largeea_spark.sources.stage import StageStore


def test_construct_kg_from_pages(spark, tmp_path):
    pages, gold = fixtures.web_pages_fixture(spark, n_pages=150)
    store = StageStore(spark, str(tmp_path / "kgrun"))
    out = construct_kg_from_pages(spark, pages, store)
    # every golden triple representable → surface P/R gate
    from largeea_spark.operators import evalx

    pr = evalx.precision_recall_f1(out["surface"], gold, cols=("subj", "pred", "obj"))
    assert pr["precision"] >= 0.95 and pr["recall"] >= 0.95
    # canonical kg: int-encoded, deduplicated, bucketed
    assert out["kg"].columns == ["src", "rel", "dst", "bucket"]
    assert out["kg"].count() > 0
    # lineage present for every stage
    for stage in ["triples_surface", "entities", "triples", "canonical", "kg_canonical"]:
        assert store.lineage(stage).count() > 0
    # resume: second run rebuilds nothing and returns identical counts
    out2 = construct_kg_from_pages(spark, pages, store)
    assert out2["kg"].count() == out["kg"].count()
    # metrics rows appended on both runs
    assert store.metrics().count() >= 2


def test_batched_structure_channel(spark):
    """run_batched_ea equivalent (`main.py:58-88`): per-partition batch
    propagation + sim accumulation must stay usable vs the unbatched
    channel (cross-partition pairs are lost by design — the reference
    drops cross-batch triples/pairs too, `sampler.py:212-227`)."""
    from largeea_spark.functions.vectors import encode_names
    from largeea_spark.operators import evalx
    from largeea_spark.plans.name_channel import entity_names
    from largeea_spark.plans.structure_channel import batched_structure_similarity

    t1, t2, links, _ = fixtures.two_kg_fixture(spark, n_ents=120, n_triples=360,
                                               n_links=90)
    kg1, kg2 = encode_graph(t1), encode_graph(t2)
    lk = encode_links(links, kg1.ent, kg2.ent, 0.2)
    pair = KGPair(kg1=kg1, kg2=kg2, links=lk)
    n1 = entity_names(pair.kg1.ent, False)
    n2 = entity_names(pair.kg2.ent, False)
    e1 = encode_names(n1, "name", dim=32).select("id", "emb")
    e2 = encode_names(n2, "name", dim=32).select("id", "emb")
    sim, stats = batched_structure_similarity(
        pair, e1, e2, k_parts=3, n_layers=1, knn_k=10
    )
    assert sim.count() > 0
    assert len(stats["batches"]) >= 3
    test = lk.where(F.col("split") == "test")
    acc = evalx.accuracy(sim, test)
    assert acc > 0.2, f"batched structure channel collapsed: {acc}"


def test_trained_batched_structure_channel(spark):
    """M2 shape: per-batch numpy margin training in applyInPandas must
    produce a usable structure sim (and not regress far below the
    untrained propagation on the same setup)."""
    from largeea_spark.functions.vectors import encode_names
    from largeea_spark.operators import evalx
    from largeea_spark.plans.name_channel import entity_names
    from largeea_spark.plans.structure_channel import (
        batched_structure_similarity,
        trained_batched_structure_similarity,
    )

    t1, t2, links, _ = fixtures.two_kg_fixture(spark, n_ents=120, n_triples=360,
                                               n_links=90)
    kg1, kg2 = encode_graph(t1), encode_graph(t2)
    lk = encode_links(links, kg1.ent, kg2.ent, 0.3)
    pair = KGPair(kg1=kg1, kg2=kg2, links=lk)
    e1 = encode_names(entity_names(pair.kg1.ent, False), "name", dim=32).select("id", "emb")
    e2 = encode_names(entity_names(pair.kg2.ent, False), "name", dim=32).select("id", "emb")
    test = lk.where(F.col("split") == "test")
    sim_tr, stats = trained_batched_structure_similarity(
        pair, e1, e2, k_parts=2, knn_k=10, epochs=10
    )
    acc_tr = evalx.accuracy(sim_tr, test)
    assert sim_tr.count() > 0 and len(stats["batches"]) >= 2
    assert acc_tr > 0.3, f"trained batched channel collapsed: {acc_tr}"
    # determinism: rerun → identical accuracy
    sim_tr2, _ = trained_batched_structure_similarity(
        pair, e1, e2, k_parts=2, knn_k=10, epochs=10
    )
    assert abs(evalx.accuracy(sim_tr2, test) - acc_tr) < 1e-9


def test_procrustes_refined_similarity(spark):
    from largeea_spark.functions.vectors import encode_names
    from largeea_spark.operators import evalx
    from largeea_spark.operators.structure import procrustes_refined_similarity
    from largeea_spark.plans.name_channel import entity_names

    t1, t2, links, _ = fixtures.two_kg_fixture(spark, n_ents=120, n_triples=360,
                                               n_links=90)
    kg1, kg2 = encode_graph(t1), encode_graph(t2)
    # W is d×d — keep anchors (45) comfortably above dim (16)
    lk = encode_links(links, kg1.ent, kg2.ent, 0.5)
    pair = KGPair(kg1=kg1, kg2=kg2, links=lk)
    e1 = encode_names(entity_names(pair.kg1.ent, False), "name", dim=16).select("id", "emb")
    e2 = encode_names(entity_names(pair.kg2.ent, False), "name", dim=16).select("id", "emb")
    sim = procrustes_refined_similarity(pair, e1, e2, n_layers=1, k=10)
    test = lk.where(F.col("split") == "test")
    acc = evalx.accuracy(sim, test)
    assert acc > 0.3, f"procrustes-refined channel collapsed: {acc}"


def test_align_kg_pair_full(spark, tmp_path):
    t1, t2, links, _ = fixtures.two_kg_fixture(spark, n_ents=150, n_triples=450,
                                               n_links=120)
    kg1, kg2 = encode_graph(t1), encode_graph(t2)
    lk = encode_links(links, kg1.ent, kg2.ent, 0.2)
    pair = KGPair(kg1=kg1, kg2=kg2, links=lk)
    store = StageStore(spark, str(tmp_path / "alignrun"))
    res = align_kg_pair(spark, pair, store, knn_k=20, structure_layers=1, emb_dim=32)
    m = res["metrics"]
    assert m["fused"]["hits@1"] > 0.6, m
    assert m["fused"]["MRR"] >= m["fused"]["hits@1"]
    # fusion should not be (much) worse than the best single channel
    best_single = max(m["string"]["hits@1"], m["embed"]["hits@1"])
    assert m["fused"]["hits@1"] >= best_single - 0.05, m
    # checkpoints exist and resume path returns same fused metric
    assert store.exists("sim_fused")
    res2 = align_kg_pair(spark, pair, store, knn_k=20, structure_layers=1, emb_dim=32)
    assert abs(res2["metrics"]["fused"]["hits@1"] - m["fused"]["hits@1"]) < 1e-9
