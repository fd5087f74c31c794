"""Cross-parallelism determinism check: identical alignment RESULTS
(not just metrics) at different local[N]."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from largeea_spark.session import get_spark
from largeea_spark.plans import name_channel
from largeea_spark.sources import fixtures
from largeea_spark.sources.kg import KGPair, encode_graph, encode_links

master = sys.argv[1]
spark = get_spark("xpar", master=master, shuffle_partitions=int(sys.argv[2]))
t1, t2, links, _ = fixtures.two_kg_fixture(spark, n_ents=250, n_triples=750, n_links=200)
kg1, kg2 = encode_graph(t1), encode_graph(t2)
lk = encode_links(links, kg1.ent, kg2.ent, 0.2)
pair = KGPair(kg1, kg2, lk)
s = name_channel.string_similarity(pair)
rows = sorted((r.src, r.dst, round(r.sim, 9)) for r in s.collect())
import hashlib
h = hashlib.md5(str(rows).encode()).hexdigest()
e = name_channel.name_embedding_similarity(pair, k=10)
rows2 = sorted((r.src, r.dst, round(r.sim, 9)) for r in e.collect())
h2 = hashlib.md5(str(rows2).encode()).hexdigest()
# structure channel: batched anchor trainer (applyInPandas) must also be
# bit-identical — sorted edges/seeds fix the float accumulation order
from largeea_spark.functions.vectors import encode_names
from largeea_spark.plans.structure_channel import (
    trained_batched_structure_similarity,
)

e1 = encode_names(name_channel.entity_names(pair.kg1.ent, False), "name",
                  dim=32).select("id", "emb")
e2 = encode_names(name_channel.entity_names(pair.kg2.ent, False), "name",
                  dim=32).select("id", "emb")
stru, _ = trained_batched_structure_similarity(pair, e1, e2, k_parts=3,
                                               knn_k=10, algo="anchor")
rows3 = sorted((r.src, r.dst, round(r.sim, 9)) for r in stru.collect())
h3 = hashlib.md5(str(rows3).encode()).hexdigest()
print(f"XPAR {master} string={h} n={len(rows)} embed={h2} n2={len(rows2)} "
      f"structure={h3} n3={len(rows3)}")
spark.stop()
