"""End-to-end KG-construction + alignment pipeline with checkpointed
phases (SURVEY.md §3; north rule: triple extraction → entity linking →
canonicalization → graph materialize, resumable, with lineage).

Phase graph (each phase = one StageStore checkpoint, resumable):

  pages ──extract──▶ triples_surface          (S8 + mention detection)
        └──────────▶ entity dim (dict-encode) (A1)
  triples_surface ──encode──▶ triples         (S1 joins)
  ent dims ──name channel──▶ sim_string, sim_embed   (phases 3, 1-2)
  sim_* ──semi seeds──▶ seeds                 (phase 0 prologue)
  triples+seeds ──structure──▶ sim_structure  (phase 0)
  sims ──fuse──▶ sim_fused ──mutual argmax──▶ links
  links ──connected components──▶ canonical ids
  triples×canonical ──▶ kg_canonical (materialized, partitioned)

Single-KG (web corpus) and two-KG (alignment benchmark) entry points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import evalx, simops
from ..operators.canonical import canonical_ids
from ..operators.ids import assign_dense_ids
from ..sources.kg import KGPair
from ..sources.stage import StageStore
from . import extract, name_channel


def construct_kg_from_pages(
    spark: SparkSession, pages: DataFrame, store: StageStore,
    dedup_names: bool = True,
) -> dict[str, DataFrame]:
    """Web-corpus KG construction (north rule): extract → encode →
    canonicalize → materialize. Returns the stage DataFrames."""
    surface = store.checkpoint(
        "triples_surface", lambda: extract.triples_for_parity(pages)
    )
    store.log_metrics("triples_surface", {"rows": surface.count()})

    def build_ents():
        names = surface.select(F.col("subj").alias("name")).unionByName(
            surface.select(F.col("obj").alias("name"))
        ).distinct()
        return assign_dense_ids(names, "name")

    ents = store.checkpoint("entities", build_ents)

    def build_triples():
        es = ents.select(F.col("name").alias("subj"), F.col("id").alias("src"))
        eo = ents.select(F.col("name").alias("obj"), F.col("id").alias("dst"))
        preds = assign_dense_ids(surface.select(F.col("pred").alias("name")).distinct(), "name")
        ep = F.broadcast(preds.select(F.col("name").alias("pred"), F.col("id").alias("rel")))
        return surface.join(es, "subj").join(eo, "obj").join(ep, "pred").select(
            "src", "rel", "dst"
        ).distinct()

    triples = store.checkpoint("triples", build_triples)

    def build_canonical():
        if not dedup_names:
            return ents.select(F.col("id").alias("node"), F.col("id").alias("component"))
        # same-normalized-name edges → CC → canonical ids
        from ..functions.names import remove_punct

        norm = ents.select("id", F.lower(remove_punct(F.col("name"))).alias("norm"))
        # STAR edges to the group-minimum id, NOT an all-pairs self-join:
        # a surface name occurring f times yields f−1 edges (linear),
        # where norm-join pairs would yield f²/2 — a hot web name
        # ("Home", "John Smith") at f=10⁶ would emit 10¹² join rows.
        # CC over the star is identical to CC over the clique.
        gmin = norm.groupBy("norm").agg(F.min("id").alias("a"))
        pairs = (
            norm.join(gmin, "norm")
            .where(F.col("id") != F.col("a"))
            .select("a", F.col("id").alias("b"))
        )
        return canonical_ids(pairs, ents, node_col="id")

    canon = store.checkpoint("canonical", build_canonical)

    def build_materialized():
        c_src = canon.select(F.col("node").alias("src"), F.col("component").alias("c_src"))
        c_dst = canon.select(F.col("node").alias("dst"), F.col("component").alias("c_dst"))
        return (
            triples.join(c_src, "src").join(c_dst, "dst")
            .select(
                F.col("c_src").alias("src"), "rel", F.col("c_dst").alias("dst")
            )
            .distinct()
            .withColumn("bucket", F.pmod(F.xxhash64("src"), F.lit(32)).cast("int"))
        )

    kg = store.checkpoint("kg_canonical", build_materialized, partition_by=["bucket"])
    store.log_metrics("kg_canonical", {"rows": kg.count()})
    return {"surface": surface, "entities": ents, "triples": triples,
            "canonical": canon, "kg": kg}


def align_kg_pair(
    spark: SparkSession, pair: KGPair, store: StageStore,
    knn_k: int = 50, string_weight: float = 0.05, use_structure: bool = True,
    structure_layers: int = 2, emb_dim: int | str = "auto",
    use_token_channel: bool = False, token_weight: float = 0.3,
    structure_weight: float = 1.0, k_parts: int = 4,
    structure_impl: str = "auto", structure_algo: str = "anchor",
    top_k_corr: int = 1, it_rounds: int = 1, semi_margin: float = 0.05,
    knn_method: str = "auto", encoder="hashed",
) -> dict:
    """Two-KG alignment, reference phase order (`main.py:242-369`):
    name channel (string+embedding) → structure channel → fusion → eval.
    Each sim is a checkpointed stage (S4 analogue).

    The default structure channel is the batched seed-anchor trainer
    (``structure_impl='auto'`` → 'batched', ``structure_algo='anchor'``)
    trained on GOLD seeds only, fused at the reference's weight 1.0
    (`main.py:356`). ``structure_impl='propagate'`` pins the
    training-free propagation channel (L8/L9) — economical below ~256
    dims only (12× the trainer's cost at d=768, SCALE.md); the choice
    is logged via the ``structure_impl_choice`` metrics row.

    ``emb_dim='auto'`` (default) widens the hashed name encoder from
    64 to 128 dims above 60k total entities — collision noise at fixed
    width grows with entity count (SCALE.md "Iterative quality").

    ``encoder``: ``'hashed'`` (default) or a zero-arg model loader for
    a real transformer encoder (``model_name_encoder`` seam,
    `emb_loader.py:119-182`) — threads through BOTH channels' name
    embeddings (the structure channel initializes from them too).

    ``it_rounds > 1`` enables iterative semi-supervision (M4/M8,
    `models/rrea/rrea.py:182-211`, `EAKit/semi_utils.py:20-110`): each
    extra round mines high-margin mutual pairs (W10/W11) from the
    current FUSED sim, conflict-filters them against gold train (U5
    anti-joins on both sides), re-trains the structure channel with
    gold ∪ mined, and re-fuses."""
    if emb_dim == "auto":
        # hashed-encoder collision noise grows with the entity count at
        # fixed width (numeric-suffix siblings nearly tie in trigram
        # space): name-only Hits@1 at 50k ents is 0.61 at dim=64 vs
        # 0.64 at 128 (SCALE.md "Iterative quality" / name_dim_probe).
        # 64 keeps small runs cheap; 128 above 30k entities. A real
        # transformer encoder (d=768 contract) makes this moot.
        n_ents = pair.kg1.ent.count() + pair.kg2.ent.count()
        emb_dim = 128 if n_ents >= 60_000 else 64

    # structure-impl routing (same policy shape as emb_dim='auto'):
    # the chunked-propagation channel (L8, ≤128 agg cols per groupBy)
    # is correct at any width but costs ~12× the grouped trainer at
    # d=768 (SCALE.md "d=768 soak") — 'auto' always takes the grouped
    # trainer; 'propagate' stays available as an explicit pin, and a
    # high-dim pin is logged so the 12× choice is never silent.
    requested_impl = structure_impl
    if structure_impl == "auto":
        structure_impl = "batched"
    store.log_metrics("structure_impl_choice", {
        "requested": requested_impl, "resolved": structure_impl,
        "emb_dim": int(emb_dim),
        "high_dim_propagate_pinned":
            structure_impl == "propagate" and int(emb_dim) >= 256,
    })

    blocking_stats: dict = {}

    def build_string():
        # blocking_stats is only populated on a cold build (resume skips
        # it); the metrics row records hot-bucket drops (no-silent-caps)
        sim = name_channel.string_similarity(pair, stats=blocking_stats)
        if blocking_stats:
            store.log_metrics("sim_string_blocking", blocking_stats)
        return sim

    sim_string = store.checkpoint("sim_string", build_string)
    sim_embed = store.checkpoint(
        "sim_embed",
        lambda: name_channel.name_embedding_similarity(
            pair, k=knn_k, dim=emb_dim, method=knn_method, encoder=encoder
        ),
    )
    seeds = store.checkpoint(
        "semi_seeds", lambda: name_channel.semi_seeds(sim_embed, sim_string)
    )

    sims = {"string": sim_string, "embed": sim_embed}
    train = pair.links.where(F.col("split") == "train").select("e1", "e2")

    def make_structure(extra_links: DataFrame | None, key: str) -> DataFrame:
        def build():
            from ..functions.vectors import encode_names

            n1 = name_channel.entity_names(pair.kg1.ent, punct_to_space=False)
            n2 = name_channel.entity_names(pair.kg2.ent, punct_to_space=False)
            e1 = encode_names(n1, "name", dim=emb_dim,
                              encoder=encoder).select("id", "emb")
            e2 = encode_names(n2, "name", dim=emb_dim,
                              encoder=encoder).select("id", "emb")
            lks = train if extra_links is None else (
                train.unionByName(extra_links.select("e1", "e2")).distinct()
            )
            kgp = KGPair(kg1=pair.kg1, kg2=pair.kg2,
                         links=lks.withColumn("split", F.lit("train")))
            if structure_impl == "propagate":
                from ..operators.structure import structure_similarity

                return structure_similarity(kgp, e1, e2,
                                            n_layers=structure_layers, k=knn_k)
            from .structure_channel import trained_batched_structure_similarity

            sim, _ = trained_batched_structure_similarity(
                kgp, e1, e2, k_parts=k_parts, knn_k=knn_k,
                top_k_corr=top_k_corr, algo=structure_algo,
            )
            return sim

        return store.checkpoint(key, build)

    if use_structure:
        sims["structure"] = make_structure(None, "sim_structure")

    if use_token_channel:
        sims["token"] = store.checkpoint(
            "sim_token",
            lambda: name_channel.token_level_similarity(pair, dim=emb_dim),
        )

    def fuse_round(structure_sim: DataFrame | None) -> DataFrame:
        name_parts = [sim_embed, sim_string]
        name_w = [1.0, string_weight]
        if use_token_channel:
            name_parts.append(sims["token"])
            name_w.append(token_weight)
        name_sim = simops.fuse(name_parts, name_w)
        if structure_sim is not None:
            # reference fuses stru + name at weight 1.0 (`main.py:356`)
            return simops.fuse([structure_sim, name_sim],
                               [structure_weight, 1.0])
        return name_sim

    fused = store.checkpoint(
        "sim_fused", lambda: fuse_round(sims.get("structure"))
    )

    test = pair.links.where(F.col("split") == "test")
    n_src = (pair.kg1.ent.agg(F.max("id")).first()[0] or 0) + 1
    metrics = {}
    for name, s in {**sims, "fused": fused}.items():
        metrics[name] = evalx.hits_and_mrr(s, test, ks=(1, 5, 50), n_src=n_src)
        store.log_metrics(f"eval_{name}", metrics[name])

    # iterative semi-supervision (M4/M8): mine → conflict-filter →
    # re-train structure → re-fuse; metrics logged per round
    for r in range(2, it_rounds + 1):
        if not use_structure:
            break
        mined = store.checkpoint(
            f"semi_mined_r{r}",
            lambda: simops.margin_mutual_pairs(fused, semi_margin)
            .select(F.col("src").alias("e1"), F.col("dst").alias("e2"))
            .join(train.select("e1"), "e1", "left_anti")
            .join(train.select("e2"), "e2", "left_anti"),
        )
        sims[f"structure_r{r}"] = make_structure(mined, f"sim_structure_r{r}")
        fused = store.checkpoint(
            f"sim_fused_r{r}", lambda: fuse_round(sims[f"structure_r{r}"])
        )
        metrics[f"fused_r{r}"] = evalx.hits_and_mrr(fused, test, ks=(1, 5, 50), n_src=n_src)
        store.log_metrics(f"eval_fused_r{r}", metrics[f"fused_r{r}"])
        metrics["fused"] = metrics[f"fused_r{r}"]  # final = last round

    # CSLS-rescored eval (the reference's test-time protocol, W7;
    # `eval.py:82-129`, `models/rrea/CSLS.py:56-95`) — computed on the
    # FINAL fused sim (after any semi-supervision rounds) so both
    # headline metrics describe the same sim table.
    metrics["fused_csls"] = evalx.hits_and_mrr(
        simops.csls_rescore(fused, k=10), test, ks=(1, 5, 50), n_src=n_src
    )
    store.log_metrics("eval_fused_csls", metrics["fused_csls"])

    return {"sims": sims, "fused": fused, "seeds": seeds, "metrics": metrics}
