"""Connected components, partitioner invariants, structure propagation,
dedup strategies (SURVEY.md §5 plan items: partition invariants, CC)."""

import pytest
from pyspark.sql import functions as F

from largeea_spark.operators import dedup, partition_kg
from largeea_spark.operators.canonical import canonical_ids, connected_components


def test_connected_components_basic(spark):
    # components: {0,1,2,3}, {10,11}, {20,21,22}; 5 isolated in all_nodes
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "a long, b long",
    )
    cc = {r.node: r.component for r in connected_components(edges).collect()}
    assert cc == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    allnodes = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 10, 11, 20, 21, 22, 5]],
                                     "node long")
    ids = {r.node: r.component for r in canonical_ids(edges, allnodes).collect()}
    assert ids[5] == 5 and ids[3] == 0


def test_connected_components_long_chain(spark):
    # path graph of 33 nodes — exercises the O(log²) iteration
    edges = spark.createDataFrame([(i, i + 1) for i in range(32)], "a long, b long")
    cc = connected_components(edges).collect()
    assert {r.component for r in cc} == {0}
    assert len(cc) == 33


@pytest.fixture(scope="module")
def kg_pair(spark):
    from largeea_spark.sources import fixtures
    from largeea_spark.sources.kg import KGPair, encode_graph, encode_links

    t1, t2, links, _ = fixtures.two_kg_fixture(spark, n_ents=200, n_triples=600,
                                               n_links=150)
    kg1, kg2 = encode_graph(t1), encode_graph(t2)
    lk = encode_links(links, kg1.ent, kg2.ent, 0.2).cache()
    return KGPair(kg1=kg1, kg2=kg2, links=lk)


def test_partition_invariants(spark, kg_pair):
    """FIXTURES.md §4 'partition invariants': total coverage, uniqueness,
    seed co-location (`partition.py:250-269` analogue)."""
    k = 4
    p1, p2 = partition_kg.seed_aware_partition(kg_pair, k=k, n_iter=2)
    n1 = kg_pair.kg1.ent.count()
    assert p1.count() == n1
    assert p1.select("id").distinct().count() == n1  # exactly one part each
    # seed co-location: every train pair in the same part
    train = kg_pair.links.where(F.col("split") == "train")
    j = (
        train.join(p1.select(F.col("id").alias("e1"), F.col("part").alias("pa")), "e1")
        .join(p2.select(F.col("id").alias("e2"), F.col("part").alias("pb")), "e2")
    )
    assert j.where(F.col("pa") != F.col("pb")).count() == 0
    stats = partition_kg.partition_stats(p1)
    assert stats["n_parts"] <= k


def test_partition_cap_salting(spark, kg_pair):
    cap = 40
    p1, p2 = partition_kg.seed_aware_partition(kg_pair, k=2, n_iter=2, cap=cap)
    mx = p1.groupBy("part").count().agg(F.max("count")).first()[0]
    assert mx <= cap
    train = kg_pair.links.where(F.col("split") == "train")
    j = (
        train.join(p1.select(F.col("id").alias("e1"), F.col("part").alias("pa")), "e1")
        .join(p2.select(F.col("id").alias("e2"), F.col("part").alias("pb")), "e2")
    )
    assert j.where(F.col("pa") != F.col("pb")).count() == 0


def test_place_triples_and_correspondence(spark, kg_pair):
    p1, p2 = partition_kg.seed_aware_partition(kg_pair, k=3, n_iter=2)
    kept, dropped = partition_kg.place_triples(kg_pair.kg1.triples, p1)
    assert kept.count() + dropped == kg_pair.kg1.triples.count()
    assert kept.where(F.col("part").isNull()).count() == 0
    corr = partition_kg.correspondence(kg_pair.links, p1, p2, top_k=1)
    # by seed inheritance, every src part's top trg part is itself
    assert corr.where(F.col("p1") != F.col("p2")).count() == 0


def test_structure_propagation_improves_or_holds(spark, kg_pair):
    """Propagation must produce a usable sim and keep exact-name anchors
    alignable (sanity, not a strict quality gate at this tiny scale)."""
    from largeea_spark.functions.vectors import encode_names
    from largeea_spark.operators.structure import structure_similarity
    from largeea_spark.plans.name_channel import entity_names

    n1 = entity_names(kg_pair.kg1.ent, False)
    n2 = entity_names(kg_pair.kg2.ent, False)
    e1 = encode_names(n1, "name", dim=32)
    e2 = encode_names(n2, "name", dim=32)
    sim = structure_similarity(kg_pair, e1.select("id", "emb"),
                               e2.select("id", "emb"), n_layers=1, k=10)
    from largeea_spark.operators import evalx

    test = kg_pair.links.where(F.col("split") == "test")
    acc = evalx.accuracy(sim, test)
    assert sim.count() > 0
    assert acc > 0.3, f"structure-channel acc collapsed: {acc}"


# --- dedup strategies on a constructed corpus
@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy dog again and once"
    other = "completely different content about spark shuffles and joins"
    rows = [
        (0, base), (1, base),            # exact dups
        (2, near),                       # near dup of 0/1
        (3, other), (4, other + " now"),  # near pair
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, dup_docs):
    clusters = dedup.exact_duplicates(dup_docs).collect()
    assert len(clusters) == 1 and clusters[0].doc_ids == [0, 1]
    kept = dedup.exact_dedup_keep(dup_docs)
    assert kept.count() == 5 and kept.where(F.col("doc_id") == 1).count() == 0


def test_ngram_jaccard_dedup(spark, dup_docs):
    pairs = {(r.a, r.b) for r in
             dedup.ngram_jaccard_pairs(dup_docs, n=3, threshold=0.5).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert not any(a == 5 or b == 5 for a, b in pairs)
    kept = dedup.dedup_keep_from_pairs(
        dup_docs, dedup.ngram_jaccard_pairs(dup_docs, n=3, threshold=0.5)
    )
    assert {r.doc_id for r in kept.select("doc_id").collect()} >= {0, 3, 5}
    assert kept.where(F.col("doc_id").isin(1, 2)).count() == 0


def test_minhash_lsh_recall_vs_exact(spark, dup_docs):
    exact = {(r.a, r.b) for r in
             dedup.ngram_jaccard_pairs(dup_docs, n=2, threshold=0.8).collect()}
    lsh = {(r.a, r.b) for r in
           dedup.minhash_lsh_pairs(dup_docs, n=2, num_perm=64, bands=32, rows=2,
                                   verify_threshold=0.8).collect()}
    # verified-LSH ⊆ exact, and exact dups always collide
    assert lsh <= exact
    assert (0, 1) in lsh


def test_simhash_exact_dup_distance_zero(spark, dup_docs):
    pairs = {(r.a, r.b): r.hamming for r in
             dedup.simhash_pairs(dup_docs, max_hamming=10).collect()}
    assert pairs.get((0, 1)) == 0
