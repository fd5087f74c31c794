"""Minimal spark-submit driver (north rule: "runs via spark-submit
--py-files"): extraction parity + one alignment slice on the
deterministic fixture, using ONLY the shipped package (no repo on
sys.path — the --py-files zip must be self-contained).

Package + submit (see scripts/submit_example.sh):
    cd /root/repo && zip -qr /tmp/largeea_spark.zip largeea_spark
    spark-submit --master 'local[4]' \
        --py-files /tmp/largeea_spark.zip scripts/submit_job.py
"""

from pyspark.sql import SparkSession, functions as F

from largeea_spark.operators import evalx
from largeea_spark.plans import extract
from largeea_spark.sources import fixtures
from largeea_spark.sources.kg import KGPair, encode_graph, encode_links


def main():
    spark = (
        SparkSession.builder.appName("largeea_submit")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    pages, gold = fixtures.web_pages_fixture(spark, n_pages=200)
    assert extract.verify_byte_identical(pages) == 0
    tri = extract.triples_for_parity(pages)
    pr = evalx.precision_recall_f1(tri, gold, cols=("subj", "pred", "obj"))
    assert pr["precision"] >= 0.95 and pr["recall"] >= 0.95

    t1, t2, links, _ = fixtures.two_kg_fixture(spark, n_ents=120,
                                               n_triples=360, n_links=90)
    kg1, kg2 = encode_graph(t1), encode_graph(t2)
    lk = encode_links(links, kg1.ent, kg2.ent, 0.2)
    pair = KGPair(kg1, kg2, lk)
    from largeea_spark.plans.name_channel import name_embedding_similarity

    sim = name_embedding_similarity(pair, k=10, dim=32)
    test = lk.where(F.col("split") == "test")
    m = evalx.hits_and_mrr(sim, test, ks=(1,), n_src=120)
    print(f"SUBMIT_OK extraction_pr={pr['precision']:.2f}/{pr['recall']:.2f} "
          f"align_hits1={m['hits@1']:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
