"""Per-batch embedding trainer (SURVEY.md M2 analogue): the reference
trains an RREA GNN per METIS batch on GPU (`models/rrea/rrea.py:48-180`).
This is the engine's executor-side counterpart — a deterministic numpy
refinement loop inside grouped ``applyInPandas``: each batch (bounded by
the partition cap, G4) is one pandas payload, trained independently on
an executor, exactly the reference's memory contract.

Objective per epoch (all vectorized numpy):
  1. propagate: H ← L2norm(H + Â·H) over the batch's union graph
     (both KGs + seed cross-edges) — the GNN forward;
  2. seed pull: H[e1] += λ(H[e2]−H[e1]) and symmetrically — the
     alignment loss gradient step on positive pairs;
  3. negative push: for hashed negative partners ñ,
     H[e] −= λ_neg·max(0, γ−d)·(H[ñ]−H[e]) — the margin term
     (`models/utils.py:62-96` negative sampling, value-hashed here).

Deterministic: no RNG beyond value hashes, fixed epoch count, float64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _norm_rows(h: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(h, axis=1, keepdims=True)
    return h / np.maximum(n, 1e-12)


def train_embeddings_np(
    ids1: np.ndarray, emb1: np.ndarray, ids2: np.ndarray, emb2: np.ndarray,
    triples1: np.ndarray, triples2: np.ndarray, seeds: np.ndarray,
    epochs: int = 15, lam: float = 0.2, lam_neg: float = 0.02,
    margin: float = 0.5, prop_rounds: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Pure-numpy batch trainer; returns refined (emb1, emb2).

    ids are global; triples are (src, rel, dst) global; seeds (e1, e2).
    Entities referenced by triples but missing from the embedding rows
    are ignored (the caller filters triples to the batch)."""
    n1, n2 = len(ids1), len(ids2)
    if n1 == 0 or n2 == 0:
        return emb1, emb2
    loc = {g: i for i, g in enumerate(ids1)}
    loc.update({g: n1 + i for i, g in enumerate(ids2)})
    h = _norm_rows(np.vstack([emb1, emb2]).astype(np.float64))

    edges = []
    for tri in (triples1, triples2):
        for s, _, d in tri:
            if s in loc and d in loc:
                edges.append((loc[s], loc[d]))
    for e1, e2 in seeds:
        if e1 in loc and e2 in loc:
            edges.append((loc[e1], loc[e2]))
    if edges:
        e = np.array(edges, dtype=np.int64)
        src = np.concatenate([e[:, 0], e[:, 1]])
        dst = np.concatenate([e[:, 1], e[:, 0]])
        deg = np.bincount(src, minlength=len(h)).astype(np.float64)
        w = 1.0 / np.sqrt(np.maximum(deg[src], 1.0) * np.maximum(deg[dst], 1.0))
    s1 = np.array([loc[a] for a, b in seeds if a in loc and b in loc], dtype=np.int64)
    s2 = np.array([loc[b] for a, b in seeds if a in loc and b in loc], dtype=np.int64)

    for ep in range(epochs):
        # 1. propagation — only the first ``prop_rounds`` epochs: more
        # rounds = a deeper GCN = oversmoothing toward the dominant
        # eigenvector (the reference uses depth 2, `rrea.py:68-79`)
        if edges and ep < prop_rounds:
            msg = np.zeros_like(h)
            np.add.at(msg, dst, h[src] * w[:, None])
            h = _norm_rows(h + msg)
        if len(s1):
            # 2. seed pull
            d12 = h[s2] - h[s1]
            h[s1] += lam * d12
            h[s2] -= lam * d12
            # 3. negative push: deterministic partner = rolled seeds
            if len(s1) > 1:
                neg2 = np.roll(s2, 1 + (ep % max(1, len(s2) - 1)))
                gap = h[neg2] - h[s1]
                dist = np.linalg.norm(gap, axis=1, keepdims=True)
                push = np.maximum(0.0, margin - dist)
                h[s1] -= lam_neg * push * gap / np.maximum(dist, 1e-12)
            h = _norm_rows(h)
    return h[:n1], h[n1:]


PAYLOAD_SCHEMA = (
    "batch int, kind string, a long, b long, c long, vec array<double>"
)
OUT_SCHEMA = "side int, id long, emb array<double>"


def pack_batch_payload(
    batches: list, parts1: DataFrame, parts2: DataFrame,
    placed1: DataFrame, placed2: DataFrame, train: DataFrame,
    emb1: DataFrame, emb2: DataFrame,
) -> DataFrame:
    """Build the unified (batch, kind, a, b, c, vec) payload DF for
    grouped training. ``batches``: [(p1, p2)] correspondence pairs; the
    batch id is the src part p1."""
    spark = parts1.sparkSession
    corr = spark.createDataFrame(
        [(int(p1), int(p2)) for p1, p2 in batches], "p1 int, p2 int"
    )
    b1 = parts1.join(corr, parts1.part == corr.p1).select(
        F.col("p1").alias("batch"), F.col("id")
    )
    b2 = parts2.join(corr, parts2.part == corr.p2).select(
        F.col("p1").alias("batch"), F.col("id")
    )
    nul = F.lit(None).cast("long")
    nulv = F.lit(None).cast("array<double>")
    rows = []
    rows.append(
        placed1.join(corr, placed1.part == corr.p1).select(
            F.col("p1").alias("batch"), F.lit("t1").alias("kind"),
            F.col("src").alias("a"), F.col("rel").alias("b"), F.col("dst").alias("c"),
            nulv.alias("vec"),
        )
    )
    rows.append(
        placed2.join(corr, placed2.part == corr.p2).select(
            F.col("p1").alias("batch"), F.lit("t2").alias("kind"),
            F.col("src").alias("a"), F.col("rel").alias("b"), F.col("dst").alias("c"),
            nulv.alias("vec"),
        )
    )
    rows.append(
        train.join(b1.withColumnRenamed("id", "e1"), "e1").select(
            F.col("batch"), F.lit("seed").alias("kind"),
            F.col("e1").alias("a"), F.col("e2").alias("b"), nul.alias("c"),
            nulv.alias("vec"),
        )
    )
    rows.append(
        emb1.join(b1, "id").select(
            F.col("batch"), F.lit("e1").alias("kind"),
            F.col("id").alias("a"), nul.alias("b"), nul.alias("c"),
            F.col("emb").cast("array<double>").alias("vec"),
        )
    )
    rows.append(
        emb2.join(b2, "id").select(
            F.col("batch"), F.lit("e2").alias("kind"),
            F.col("id").alias("a"), nul.alias("b"), nul.alias("c"),
            F.col("emb").cast("array<double>").alias("vec"),
        )
    )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def train_batches(payload: DataFrame, epochs: int = 15, lam: float = 0.2,
                  lam_neg: float = 0.02, margin: float = 0.5) -> DataFrame:
    """groupBy(batch).applyInPandas over the packed payload → refined
    embeddings (side 1|2, id, emb). One executor task per batch; batch
    size bounded by the partition cap (G4 memory contract)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        def rows(kind):
            return pdf[pdf["kind"] == kind]

        e1r, e2r = rows("e1"), rows("e2")
        ids1 = e1r["a"].to_numpy(dtype=np.int64)
        ids2 = e2r["a"].to_numpy(dtype=np.int64)
        emb1 = np.array(e1r["vec"].tolist(), dtype=np.float64) if len(e1r) else np.zeros((0, 1))
        emb2 = np.array(e2r["vec"].tolist(), dtype=np.float64) if len(e2r) else np.zeros((0, 1))
        t1 = rows("t1")[["a", "b", "c"]].to_numpy(dtype=np.int64) if len(rows("t1")) else np.zeros((0, 3), np.int64)
        t2 = rows("t2")[["a", "b", "c"]].to_numpy(dtype=np.int64) if len(rows("t2")) else np.zeros((0, 3), np.int64)
        sd = rows("seed")[["a", "b"]].to_numpy(dtype=np.int64) if len(rows("seed")) else np.zeros((0, 2), np.int64)
        # deterministic order regardless of shuffle arrival
        o1, o2 = np.argsort(ids1), np.argsort(ids2)
        ids1, ids2 = ids1[o1], ids2[o2]
        if len(emb1):
            emb1 = emb1[o1]
        if len(emb2):
            emb2 = emb2[o2]
        r1, r2 = train_embeddings_np(
            ids1, emb1, ids2, emb2, t1, t2, sd,
            epochs=epochs, lam=lam, lam_neg=lam_neg, margin=margin,
        )
        return pd.DataFrame({
            "side": np.concatenate([np.ones(len(ids1), np.int32),
                                    np.full(len(ids2), 2, np.int32)]),
            "id": np.concatenate([ids1, ids2]),
            "emb": [list(v) for v in r1] + [list(v) for v in r2],
        })

    return payload.groupBy("batch").applyInPandas(fn, schema=OUT_SCHEMA)
