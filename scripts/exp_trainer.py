"""Spark-free experiment harness for the batch trainer algorithm
(operators/trainer.py). Rebuilds the exact two_kg_fixture in pandas,
encodes names with the hashed n-gram encoder, then evaluates trainer
variants (Hits@1/@5 over test links, brute-force cosine argmax) so the
algorithm can be iterated in seconds instead of a full Spark run.

Usage: python scripts/exp_trainer.py [n_ents] [n_links]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from largeea_spark.functions.vectors import _ngram_hash_embed
from largeea_spark.sources import fixtures


class _PandasSpark:
    """Stub: two_kg_fixture only calls spark.createDataFrame(pdf)."""

    def createDataFrame(self, pdf):
        return pdf


def build_fixture(n_ents=500, n_links=400):
    t1, t2, links, _ = fixtures.two_kg_fixture(
        _PandasSpark(), n_ents=n_ents, n_triples=3 * n_ents, n_links=n_links
    )

    def encode_graph(t):
        uris = sorted(set(t["s"]) | set(t["o"]))
        ent = {u: i for i, u in enumerate(uris)}  # lexicographic dense ids
        rels = sorted(set(t["p"]))
        rel = {p: i for i, p in enumerate(rels)}
        trip = np.array(
            [(ent[s], rel[p], ent[o]) for s, p, o in t.itertuples(index=False)],
            dtype=np.int64,
        )
        return ent, rel, trip

    ent1, rel1, trip1 = encode_graph(t1)
    ent2, rel2, trip2 = encode_graph(t2)
    lk = links.sort_values("idx")
    e1 = np.array([ent1[u] for u in lk["u1"]], dtype=np.int64)
    e2 = np.array([ent2[u] for u in lk["u2"]], dtype=np.int64)
    cut = int(len(lk) * 0.2)
    names1 = [u.rsplit("/", 1)[1] for u in sorted(ent1, key=ent1.get)]
    names2 = [u.rsplit("/", 1)[1] for u in sorted(ent2, key=ent2.get)]
    emb1 = _ngram_hash_embed(names1, 64, 3)
    emb2 = _ngram_hash_embed(names2, 64, 3)
    return dict(
        trip1=trip1, trip2=trip2, emb1=emb1, emb2=emb2,
        seeds=np.stack([e1[:cut], e2[:cut]], axis=1),
        test=np.stack([e1[cut:], e2[cut:]], axis=1),
        n1=len(ent1), n2=len(ent2),
        n_rel=max(len(rel1), len(rel2)),
    )


def hits(r1, r2, test, ks=(1, 5)):
    a = r1 / np.maximum(np.linalg.norm(r1, axis=1, keepdims=True), 1e-12)
    b = r2 / np.maximum(np.linalg.norm(r2, axis=1, keepdims=True), 1e-12)
    sim = a[test[:, 0]] @ b.T
    order = np.argsort(-sim, axis=1)
    ranks = np.array(
        [np.where(order[i] == test[i, 1])[0][0] for i in range(len(test))]
    )
    return {f"h@{k}": float(np.mean(ranks < k)) for k in ks}


def main():
    n_ents = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    n_links = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    fx = build_fixture(n_ents, n_links)
    from largeea_spark.operators import trainer as T

    base = hits(fx["emb1"], fx["emb2"], fx["test"])
    print("name-embedding baseline:", base)

    variants = {}
    ids1 = np.arange(fx["n1"])
    ids2 = np.arange(fx["n2"])

    t0 = time.time()
    r1, r2 = T.train_embeddings_np(
        ids1, fx["emb1"].copy(), ids2, fx["emb2"].copy(),
        fx["trip1"], fx["trip2"], fx["seeds"], epochs=10,
    )
    variants["v1 current (10 ep)"] = (hits(r1, r2, fx["test"]), time.time() - t0)

    if hasattr(T, "train_embeddings_rrea_np"):
        for ep in (10, 30):
            t0 = time.time()
            r1, r2 = T.train_embeddings_rrea_np(
                ids1, fx["emb1"].copy(), ids2, fx["emb2"].copy(),
                fx["trip1"], fx["trip2"], fx["seeds"], epochs=ep,
            )
            variants[f"v2 rrea ({ep} ep)"] = (
                hits(r1, r2, fx["test"]), time.time() - t0)

    for k, (v, dt) in variants.items():
        print(f"{k}: {v}  [{dt:.1f}s]")


if __name__ == "__main__":
    main()
