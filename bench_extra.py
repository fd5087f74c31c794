"""Round-6 optimization measurement harness (guide §1) — SEPARATE from
the frozen ``bench.py``.

Reuses ``bench.HEADLINE`` (the exact closures the driver times) so the
numbers here are the same workload, but adds:

  * per-query cold + N warm timings, one JSON line at the end;
  * ``--plans <tag>``: ``.explain("formatted")`` per headline query into
    ``plans/r06/<query>_<tag>.txt`` (the judge's plan-claim evidence);
  * ``--stages``: per-stage wall-clock breakdown of the composite
    queries (cc_dedup = pairs + CC; doc_minhash = signature/band/verify)
    using noop-sink isolation so the stage, not the sink, is timed.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [--runs 3]
  SPARK_GRAFT_SF_DIR=... python bench_extra.py --plans before
  SPARK_GRAFT_SF_DIR=... python bench_extra.py --stages
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402  (frozen harness — reused, never edited)
from largeea_spark.session import get_spark  # noqa: E402

SF_DIR = bench.SF_DIR
CPUS = bench.CPUS
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _session():
    return get_spark("bench_extra", master=f"local[{CPUS}]",
                     shuffle_partitions=CPUS)


def run_timings(runs: int) -> None:
    spark = _session()
    out_cold, out_warm, out_all = {}, {}, {}
    for name, fn in bench.HEADLINE.items():
        times = []
        for i in range(1 + runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            fn(spark)
            times.append(round(time.time() - t0, 2))
        spark.sparkContext.setJobDescription(None)
        out_cold[name] = times[0]
        out_warm[name] = min(times[1:] or times)
        out_all[name] = times
        print(f"  {name}: cold {times[0]}  warm {times[1:]}", flush=True)
    spark.stop()
    print(json.dumps({
        "sf_dir": SF_DIR, "cpus": CPUS,
        "value_warm": round(sum(out_warm.values()), 2),
        "value_cold": round(sum(out_cold.values()), 2),
        "queries_warm": out_warm, "queries_cold": out_cold,
        "samples": out_all,
    }))


# ---------------------------------------------------------------------------
# plan capture: build the same DataFrames the headline closures force
# ---------------------------------------------------------------------------

def _headline_dfs(spark):
    import __spark_entry__ as e

    from largeea_spark.operators.canonical import connected_components
    from largeea_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    from largeea_spark.operators.knn import knn_topk
    from largeea_spark.plans import extract
    from largeea_spark.sources import fixtures

    qs = e.queries()
    emb = bench._t(spark, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
    pages, _ = fixtures.web_pages_fixture(spark, n_pages=2000)
    return {
        "tpch_q1": lambda: qs["tpch_q1"](spark, SF_DIR),
        "window_topk": lambda: qs["topk_parts_per_supplier"](spark, SF_DIR),
        "doc_tfidf": lambda: qs["doc_tfidf"](spark, SF_DIR),
        "doc_minhash_dedup": lambda: minhash_lsh_pairs(
            bench._t(spark, "documents"), n=3, num_perm=64, bands=16, rows=4,
            verify_threshold=0.5),
        "emb_knn": lambda: knn_topk(emb, emb, k=10, n_blocks=4),
        "cc_dedup": lambda: connected_components(
            ngram_jaccard_pairs(bench._t(spark, "documents"), n=3,
                                threshold=0.4).select("a", "b")),
        "extract_triples": lambda: extract.triples_for_parity(pages),
    }


def dump_plans(tag: str) -> None:
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = _session()
    for name, mk in _headline_dfs(spark).items():
        df = mk()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(PLANS_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange nodes)")
    spark.stop()


# ---------------------------------------------------------------------------
# stage breakdown of the composite queries (noop-isolated)
# ---------------------------------------------------------------------------

def run_stages() -> None:
    spark = _session()
    from largeea_spark.operators.canonical import connected_components
    from largeea_spark.operators.dedup import (
        _doc_tokens, minhash_lsh_pairs, ngram_jaccard_pairs)
    from largeea_spark.functions.hashing import explode_band_keys

    docs = bench._t(spark, "documents")
    res = {}

    def timed(label, fn, n=2):
        ts = []
        for _ in range(n):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 2))
        res[label] = ts
        print(f"  {label}: {ts}", flush=True)

    spark.sparkContext.setJobDescription("stage: ngram pairs only")
    timed("cc.pairs_only", lambda: _noop(
        ngram_jaccard_pairs(docs, n=3, threshold=0.4)))
    spark.sparkContext.setJobDescription("stage: full cc_dedup")
    timed("cc.full", lambda: connected_components(
        ngram_jaccard_pairs(docs, n=3, threshold=0.4).select("a", "b")).count())

    spark.sparkContext.setJobDescription("stage: tokens+shingles only")
    timed("mh.tokens_only", lambda: _noop(_doc_tokens(docs, "doc_id", "text", 3)))
    spark.sparkContext.setJobDescription("stage: band keys")
    timed("mh.band_keys", lambda: _noop(explode_band_keys(
        _doc_tokens(docs, "doc_id", "text", 3), "doc_id", "grams", 64, 16, 4)))
    spark.sparkContext.setJobDescription("stage: candidates no verify")
    timed("mh.cand_only", lambda: _noop(minhash_lsh_pairs(
        docs, n=3, num_perm=64, bands=16, rows=4, verify_threshold=None)))
    spark.sparkContext.setJobDescription("stage: full minhash verify")
    timed("mh.full", lambda: _noop(minhash_lsh_pairs(
        docs, n=3, num_perm=64, bands=16, rows=4, verify_threshold=0.5)))
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "stages": res}))
    spark.stop()


if __name__ == "__main__":
    if "--plans" in sys.argv:
        dump_plans(sys.argv[sys.argv.index("--plans") + 1])
    elif "--stages" in sys.argv:
        run_stages()
    else:
        runs = 3
        if "--runs" in sys.argv:
            runs = int(sys.argv[sys.argv.index("--runs") + 1])
        run_timings(runs)
