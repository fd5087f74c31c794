"""Diagnose structure-channel recall loss: what fraction of TEST pairs
end up co-batched (e1's part p1, e2 in the corresponding p2)? Upper
bound for batched structure Hits@1."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from largeea_spark.operators.partition_kg import correspondence, seed_aware_partition
from largeea_spark.plans import name_channel
from largeea_spark.session import get_spark
from largeea_spark.sources import fixtures
from largeea_spark.sources.kg import KGPair, encode_graph, encode_links

spark = get_spark("diag", master="local[16]", shuffle_partitions=16)
t1, t2, links, _ = fixtures.two_kg_fixture(spark, n_ents=500, n_triples=1500, n_links=400)
kg1, kg2 = encode_graph(t1), encode_graph(t2)
lk = encode_links(links, kg1.ent, kg2.ent, 0.2)
pair = KGPair(kg1, kg2, lk)

from largeea_spark.plans.structure_channel import _corr_batches

for k_parts in (2, 4):
    parts1, parts2 = seed_aware_partition(pair, k_parts, n_iter=3)
    for top_k in (1, 2, 3):
        batches = _corr_batches(pair, parts1, parts2, top_k)
        bdf = spark.createDataFrame(batches, "p1 int, p2 int")
        test = lk.where(F.col("split") == "test")
        j = (
            test.join(parts1.select(F.col("id").alias("e1"), F.col("part").alias("p1")), "e1")
            .join(parts2.select(F.col("id").alias("e2"), F.col("part").alias("p2e")), "e2")
            .join(bdf, "p1")
        )
        n_test = test.count()
        coloc = j.where(F.col("p2e") == F.col("p2")).count()
        print(f"k_parts={k_parts} top_k={top_k}: test={n_test} "
              f"co-batched={coloc} rate={coloc/n_test:.3f}")
spark.stop()
