"""Deterministic synthetic fixtures (FIXTURES.md §1-§2). Seeded stdlib
``random`` + pandas → createDataFrame; no external data, reproducible
across parallelism levels.

Two generators:
- ``two_kg_fixture``: the reference ``EAData`` shape (`dataset.py:17-111`)
  — two KGs with power-law degrees, gold links, fr-side name variants
  (accent subs / token reorder / exact copies, 30/30/40) so MinHash-LSH
  and Levenshtein-ratio both do non-trivial work.
- ``web_pages_fixture``: the BASELINE.json input shape
  ``(url, warc_ts, html, text, lang)`` with template sentences
  ``"{A} {pred} {B}."`` embedding entity mentions, plus the golden
  ``(subj, pred, obj)`` triple table for the P/R ≥ 0.95 gate.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from zlib import crc32

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_ADJ = [
    "Great", "Old", "New", "Upper", "Lower", "Royal", "Silent", "Golden",
    "Iron", "Green", "White", "Black", "Crystal", "Sunny", "Windy", "Stone",
]
_NOUN = [
    "River", "Mountain", "Castle", "Bridge", "Valley", "Harbor", "Temple",
    "Forest", "Island", "Tower", "Garden", "Square", "Palace", "Canyon",
    "Lake", "Village",
]
_ACCENT = {"a": "à", "e": "é", "i": "î", "o": "ô", "u": "ù", "c": "ç"}
PREDICATES = ["locatedIn", "partOf", "near", "connectedTo", "builtBy"]


def _base_name(i: int) -> str:
    return f"{_ADJ[i % len(_ADJ)]}_{_NOUN[(i // len(_ADJ)) % len(_NOUN)]}_{i}"


def _accentize(name: str, rng: random.Random) -> str:
    chars = list(name)
    positions = [k for k, c in enumerate(chars) if c.lower() in _ACCENT]
    rng.shuffle(positions)
    for k in positions[: max(1, len(positions) // 3)]:
        low = chars[k].lower()
        chars[k] = _ACCENT[low] if chars[k].islower() else _ACCENT[low].upper()
    return "".join(chars)


def _variant_name(name: str, kind: str, rng: random.Random) -> str:
    if kind == "exact":
        return name
    if kind == "accent":
        return _accentize(name, rng)
    toks = name.split("_")  # token reorder
    if len(toks) > 1:
        rot = rng.randrange(1, len(toks))
        toks = toks[rot:] + toks[:rot]
    return "_".join(toks)


def two_kg_fixture(
    spark: SparkSession, n_ents: int = 500, n_triples: int = 1500,
    n_links: int = 400, seed: int = 42, corr_edges: float = 0.7,
):
    """Returns (triples1_df, triples2_df, links_df) of URI strings, the
    raw shape `dataset.py:91-111` ingests, plus the variant-kind table.

    KG1 URIs: ``http://dbp.example/resource/{name}``; KG2:
    ``http://fr.dbp.example/resource/{variant}`` — both match
    PREFIX = ``http(s)?://[a-z.]+/[^/]+/`` (`text_utils.py:21`).

    ``corr_edges``: fraction of KG2's triples copied from KG1 through the
    entity correspondence (real cross-lingual KG pairs describe the same
    world, so their graphs are correlated — DBP1M-style; the remainder
    is independent noise so the graphs are not isomorphic).
    """
    rng = random.Random(seed)
    names1 = [_base_name(i) for i in range(n_ents)]
    kinds = (["accent"] * 30 + ["reorder"] * 30 + ["exact"] * 40)
    names2, kind_of = [], []
    for i, nm in enumerate(names1):
        kind = kinds[(crc32(nm.encode()) + i) % len(kinds)]
        names2.append(_variant_name(nm, kind, rng))
        kind_of.append(kind)

    pre1 = "http://dbp.example/resource/"
    pre2 = "http://fr.dbp.example/resource/"

    def gen_triples(names, prefix):
        rows = []
        # power-law-ish degrees: entity i has weight ~ 1/(i+1)
        weights = [1.0 / (i + 1) for i in range(len(names))]
        total = sum(weights)
        cum, acc = [], 0.0
        for w in weights:
            acc += w / total
            cum.append(acc)

        def draw():
            x = rng.random()
            lo, hi = 0, len(cum) - 1
            while lo < hi:
                mid = (lo + hi) // 2
                if cum[mid] < x:
                    lo = mid + 1
                else:
                    hi = mid
            return lo

        seen = set()
        # base chain so every entity appears in ≥1 triple (ent dims are a
        # side effect of the triple scan, `dataset.py:91-100`)
        for i in range(len(names)):
            j = (i + 1) % len(names)
            p = PREDICATES[i % len(PREDICATES)]
            seen.add((i, p, j))
            rows.append((prefix + names[i], f"http://dbp.example/property/{p}",
                         prefix + names[j]))
        while len(rows) < n_triples:
            h, t = draw(), draw()
            if h == t:
                continue
            p = PREDICATES[rng.randrange(len(PREDICATES))]
            if (h, p, t) in seen:
                continue
            seen.add((h, p, t))
            rows.append((prefix + names[h], f"http://dbp.example/property/{p}",
                         prefix + names[t]))
        return pd.DataFrame(rows, columns=["s", "p", "o"])

    t1 = gen_triples(names1, pre1)
    # KG2: corr_edges of KG1's edge structure mapped through the
    # correspondence (same entity index i ↔ variant name), rest noise
    shared_rows = []
    for s, p, o in t1.itertuples(index=False):
        if rng.random() < corr_edges:
            i = int(s.rsplit("_", 1)[1])
            j = int(o.rsplit("_", 1)[1])
            shared_rows.append((pre2 + names2[i], p, pre2 + names2[j]))
    t2_noise = gen_triples(names2, pre2)
    # keep the full base chain (rows [:n_ents]) so every entity stays
    # covered, then top up with noise rows
    n_extra = max(0, n_triples - len(shared_rows) - n_ents)
    t2 = (
        pd.concat(
            [pd.DataFrame(shared_rows, columns=["s", "p", "o"]),
             t2_noise.iloc[:n_ents],
             t2_noise.iloc[n_ents : n_ents + n_extra]],
            ignore_index=True,
        )
        .drop_duplicates()
        .reset_index(drop=True)
    )
    link_idx = list(range(n_ents))
    rng.shuffle(link_idx)
    link_idx = sorted(link_idx[:n_links])
    links = pd.DataFrame(
        [(pre1 + names1[i], pre2 + names2[i], j) for j, i in enumerate(link_idx)],
        columns=["u1", "u2", "idx"],
    )
    variants = pd.DataFrame(
        {"name1": names1, "name2": names2, "kind": kind_of}
    )
    return (
        spark.createDataFrame(t1),
        spark.createDataFrame(t2),
        spark.createDataFrame(links),
        spark.createDataFrame(variants),
    )


# ---------------------------------------------------------------------------
# Web-page corpus (FIXTURES.md §1)
# ---------------------------------------------------------------------------

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _display(name: str) -> str:
    return name.replace("_", " ")


def page_rows(n_pages: int, seed: int = 42, mentions_per_page: int = 3):
    """Yield (url, warc_ts, html, text, lang) dicts + golden triples.

    text layout (the byte-identical golden column):
        "{title}\\n{sentence} {sentence} ..."
    html: ``<html><body><h1>{title}</h1><p>{sentences}</p></body></html>``.
    """
    rng = random.Random(seed)
    names = [_base_name(i) for i in range(n_pages)]
    langs = ["en" if i % 2 == 0 else "fr" for i in range(n_pages)]
    pages, gold = [], []
    for i, nm in enumerate(names):
        title = _display(nm)
        sents = []
        k = 1 + rng.randrange(mentions_per_page)
        for _ in range(k):
            j = rng.randrange(n_pages)
            if j == i:
                j = (j + 1) % n_pages
            pred = PREDICATES[rng.randrange(len(PREDICATES))]
            sents.append(f"{title} {pred} {_display(names[j])}.")
            gold.append((nm, pred, names[j]))
        body = " ".join(sents)
        text = f"{title}\n{body}"
        html = f"<html><body><h1>{title}</h1><p>{body}</p></body></html>".encode("utf-8")
        url = f"https://{langs[i]}.example.org/wiki/{nm}"
        ts = _EPOCH + timedelta(seconds=crc32(url.encode()) % 86400)
        pages.append(
            {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": langs[i]}
        )
    return pages, gold, names


def web_pages_fixture(spark: SparkSession, n_pages: int = 400, seed: int = 42):
    """Returns (pages_df, gold_triples_df). Pages: the BASELINE.json
    input shape; gold: (subj, pred, obj) surface-name triples."""
    pages, gold, _ = page_rows(n_pages, seed)
    pages_df = spark.createDataFrame(
        pd.DataFrame(pages),
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    gold_df = spark.createDataFrame(
        pd.DataFrame(gold, columns=["subj", "pred", "obj"]).drop_duplicates()
    )
    return pages_df, gold_df
