"""Construct-pipeline soak with a SKEWED corpus: a zipfian surface-name
distribution where the hottest name appears tens of thousands of times —
the exact shape that made the round-1 same-name canonicalization
self-join quadratic (f² pairs for frequency f). With star edges the
edge count is linear in corpus size; this soak proves the full
construct path (extract → encode → canonicalize → materialize) finishes
at hot-name scale and appends evidence to SCALE.md.

Usage: python scripts/construct_soak.py [n_pages] [hot_copies]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from largeea_spark.plans.pipeline import construct_kg_from_pages  # noqa: E402
from largeea_spark.session import get_spark  # noqa: E402
from largeea_spark.sources.stage import StageStore  # noqa: E402


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    hot_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    spark = get_spark("construct_soak", master="local[32]", shuffle_partitions=32)

    # zipf-ish hot GROUP: `hot_copies` DISTINCT case variants of one
    # surface name (identical after lower+punct normalization → one
    # canonical component of size hot_copies), the rest unique titles;
    # every page emits one triple mentioning a unique object
    base = "great hot company xy"  # ≥17 letters → >100k case variants

    def case_variant(j: int) -> str:
        out, b = [], j
        for ch in base:
            if ch == " ":
                out.append(ch)
                continue
            out.append(ch.upper() if b & 1 else ch)
            b >>= 1
        return "".join(out)

    def gen(i: int):
        title = case_variant(i) if i < hot_copies else f"Unique Title {i}"
        text = f"{title}\n{title} locatedIn Place_{i}."
        html = f"<html><body><h1>{title}</h1><p>{title} locatedIn Place_{i}.</p></body></html>"
        return {"url": f"http://site.example/p{i}", "warc_ts": None,
                "html": html.encode(), "text": text, "lang": "en"}

    t0 = time.time()
    pdf = pd.DataFrame([gen(i) for i in range(n_pages)])
    pages = spark.createDataFrame(
        pdf, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    ).repartition(32).localCheckpoint(eager=True)
    _ = pages.count()
    t_gen = time.time() - t0

    import tempfile

    store = StageStore(spark, tempfile.mkdtemp(prefix="construct_soak_"))
    t0 = time.time()
    out = construct_kg_from_pages(spark, pages, store)
    n_ents = out["entities"].count()
    n_kg = out["kg"].count()
    n_comp = out["canonical"].select("component").distinct().count()
    wall = time.time() - t0

    line = (f"| {n_pages} | {hot_copies} | {n_ents} | {n_comp} | {n_kg} |"
            f" {t_gen:.0f} | {wall:.0f} |")
    header = ("\n## Construct soak — skewed (zipfian) surface names\n\n"
              "Full construct path (extract → encode → star-edge\n"
              "canonicalize → CC → materialize) on local[32]. The hot\n"
              "name appears `hot` times; the round-1 self-join would\n"
              "have emitted hot²/2 ≈ "
              f"{hot_copies * hot_copies // 2:,} pairs for this corpus —\n"
              "star edges emit hot−1.\n\n"
              "| pages | hot copies | entities | components | kg triples |"
              " gen s | construct s |\n"
              "|---|---|---|---|---|---|---|\n")
    with open("/root/repo/SCALE.md", "a") as f:
        if not os.path.exists("/root/repo/SCALE.md") or "Construct soak" not in open("/root/repo/SCALE.md").read():
            f.write(header)
        f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
