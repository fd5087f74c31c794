"""Benchmark harness (driver contract + north-rule scaling evidence).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ...,
   "scaling": {throughput at local[8] and local[32] on the same KG
               job + efficiency}}

The scaling block is the sandbox stand-in for N→4N executors
(driver instruction): identical input, identical job, 8 vs 32 cores.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from largeea_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_TMP = "/tmp/largeea_bench_kg"


def _t(spark, name):
    return spark.read.parquet(f"{SF_DIR}/{name}.parquet")


# ---------------------------------------------------------------------------
# headline queries (each returns a DataFrame; we force with a count/collect)
# ---------------------------------------------------------------------------

def q_tpch_q1(spark):
    import __spark_entry__ as e

    return e.queries()["tpch_q1"](spark, SF_DIR).collect()


def q_window_topk(spark):
    import __spark_entry__ as e

    return e.queries()["topk_parts_per_supplier"](spark, SF_DIR).count()


def q_doc_tfidf(spark):
    import __spark_entry__ as e

    return e.queries()["doc_tfidf"](spark, SF_DIR).count()


def q_doc_minhash_dedup(spark):
    from largeea_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_t(spark, "documents"), n=3, num_perm=64,
                             bands=16, rows=4, verify_threshold=0.5).count()


def q_emb_knn(spark):
    from largeea_spark.operators.knn import knn_topk

    e = _t(spark, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    return knn_topk(e, e, k=10, n_blocks=4).count()


def q_cc_dedup(spark):
    from largeea_spark.operators.canonical import connected_components
    from largeea_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(_t(spark, "documents"), n=3, threshold=0.4)
    return connected_components(pairs.select("a", "b")).count()


def q_extract_triples(spark):
    from largeea_spark.plans import extract
    from largeea_spark.sources import fixtures

    pages, gold = fixtures.web_pages_fixture(spark, n_pages=2000)
    emitted = extract.triples_for_parity(pages)
    return emitted.count()


HEADLINE = {
    "tpch_q1": q_tpch_q1,
    "window_topk": q_window_topk,
    "doc_tfidf": q_doc_tfidf,
    "doc_minhash_dedup": q_doc_minhash_dedup,
    "emb_knn": q_emb_knn,
    "cc_dedup": q_cc_dedup,
    "extract_triples": q_extract_triples,
}


# ---------------------------------------------------------------------------
# scaling job: KG string-channel alignment over a fixed parquet KG
# ---------------------------------------------------------------------------

def _materialize_scaling_input(n_ents=6000, n_triples=20000, n_links=4000):
    """Generate the two-KG fixture once and persist as parquet so both
    parallelism levels read the identical bytes."""
    if os.path.exists(f"{SCALE_TMP}/done"):
        return
    shutil.rmtree(SCALE_TMP, ignore_errors=True)
    spark = get_spark("bench_gen", master="local[8]", shuffle_partitions=8)
    from largeea_spark.sources import fixtures

    t1, t2, links, _ = fixtures.two_kg_fixture(
        spark, n_ents=n_ents, n_triples=n_triples, n_links=n_links
    )
    t1.repartition(32).write.mode("overwrite").parquet(f"{SCALE_TMP}/t1")
    t2.repartition(32).write.mode("overwrite").parquet(f"{SCALE_TMP}/t2")
    links.repartition(4).write.mode("overwrite").parquet(f"{SCALE_TMP}/links")
    spark.stop()
    os.makedirs(f"{SCALE_TMP}/done", exist_ok=True)


def _scaling_job(cores: int) -> dict:
    """Encode + string-channel align + mutual argmax on the persisted KG;
    returns wall time + triples/sec at the given parallelism."""
    spark = get_spark(f"bench_scale_{cores}", master=f"local[{cores}]",
                      shuffle_partitions=2 * cores)
    from largeea_spark.plans import name_channel
    from largeea_spark.sources.kg import KGPair, encode_graph, encode_links

    t1 = spark.read.parquet(f"{SCALE_TMP}/t1")
    t2 = spark.read.parquet(f"{SCALE_TMP}/t2")
    links = spark.read.parquet(f"{SCALE_TMP}/links")
    n_triples = t1.count() + t2.count()
    t0 = time.time()
    kg1, kg2 = encode_graph(t1), encode_graph(t2)
    lk = encode_links(links, kg1.ent, kg2.ent, 0.2)
    pair = KGPair(kg1=kg1, kg2=kg2, links=lk)
    sim = name_channel.string_similarity(pair)
    from largeea_spark.operators.simops import bi_mapping

    n_pairs = bi_mapping(sim).count()
    dt = time.time() - t0
    spark.stop()
    return {"cores": cores, "sec": round(dt, 2),
            "triples_per_sec": round(n_triples / dt, 1), "pairs": n_pairs}


def _write_bench_md(results, lo, hi, eff):
    """North-rule evidence: throughput at both parallelism levels +
    scaling efficiency, persisted to BENCH.md."""
    here = os.path.dirname(os.path.abspath(__file__))
    lines = [
        "# BENCH — headline wall-clock + scaling evidence",
        "",
        f"sf dir: `{SF_DIR}`  ·  cores: {CPUS}",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v} |" for k, v in results.items()]
    lines += [
        "",
        "## Scaling (same persisted KG input, same job — N vs 4N stand-in)",
        "",
        "| cores | sec | triples/sec |",
        "|---|---|---|",
        f"| {lo['cores']} | {lo['sec']} | {lo['triples_per_sec']} |",
        f"| {hi['cores']} | {hi['sec']} | {hi['triples_per_sec']} |",
        "",
        f"**Scaling efficiency (N→4N): {round(eff, 3)}** (target ≥ 0.8)",
        "",
    ]
    with open(f"{here}/BENCH.md", "w") as f:
        f.write("\n".join(lines))


def main():
    results: dict[str, float] = {}
    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    for name, fn in HEADLINE.items():
        t0 = time.time()
        fn(spark)
        results[name] = round(time.time() - t0, 2)
    spark.stop()

    _materialize_scaling_input()
    lo = _scaling_job(max(2, CPUS // 4))
    hi = _scaling_job(CPUS)
    eff = (hi["triples_per_sec"] / lo["triples_per_sec"]) / (
        hi["cores"] / lo["cores"]
    )

    total = round(sum(results.values()), 2)
    _write_bench_md(results, lo, hi, eff)
    print(json.dumps({
        "metric": "headline_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "scaling": {
            "low": lo, "high": hi,
            "efficiency": round(eff, 3),
            "note": "same persisted KG input, local[N] vs local[4N] (driver-sanctioned stand-in for N vs 4N executors)",
        },
    }))


if __name__ == "__main__":
    main()
