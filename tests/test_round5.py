"""Round-5 tests: the five ADVICE r4 fixes + stateful-op TTL (VERDICT #7).

Each test pins the FIXED behavior, not just absence of the bug, so a
regression is a red assertion rather than a silent semantic drift.
"""
import datetime
import time

import numpy as np
import pandas as pd
import pytest

from tests.conftest import spark  # noqa: F401


# ---------------------------------------------------------------------------
# ADVICE r4 #1 (trainer.py): fun/ifun must include self-loop triples —
# the reference's func/ifunc (utils.py) run over the FULL KG; only the
# adjacency accumulation skips (h, r, h) rows.
# ---------------------------------------------------------------------------

def test_gcn_weights_fun_ifun_include_self_loops():
    from largeea_spark.operators.trainer import _gcn_weighted_edges

    # relation 0: 3 non-loop triples {(0,0,1), (2,0,1), (5,0,4)} plus
    # SELF-LOOP (3,0,3).
    tri = np.array(
        [[0, 0, 1], [2, 0, 1], [5, 0, 4], [3, 0, 3]], dtype=np.int64)
    ids = np.array([0, 1, 2, 3, 4, 5], dtype=np.int64)

    # reference semantics: n_tri=4 (loop counted), heads={0,2,5,3}→fun=1.0,
    # tails={1,4,3}→ifun=3/4; the loop contributes NO edge.
    edges, weights = _gcn_weighted_edges(tri, ids, 0)
    # 3 surviving triples × 2 directions
    assert edges.shape == (6, 2)
    fwd = weights[:3]      # h→t carries ifun
    bwd = weights[3:]      # t→h carries fun
    assert np.allclose(fwd, 0.75), fwd
    assert np.allclose(bwd, 1.0), bwd

    # counter-case: computed on FILTERED triples ifun would be 2/3 —
    # assert we are not doing that
    assert not np.allclose(fwd, 2.0 / 3.0)


# ---------------------------------------------------------------------------
# ADVICE r4 #2 (knn._bounded_chunk): never exceed the budget on skewed
# cells, never override a smaller explicit request.
# ---------------------------------------------------------------------------

def test_bounded_chunk_respects_budget_and_request():
    from largeea_spark.operators.knn import _GEMM_BUDGET_ELEMS, _bounded_chunk

    # normal cell: budget allows more than requested → requested wins
    assert _bounded_chunk(4096, 10_000) == 4096
    # huge skewed cell (>195k rows): budget < 256 — the old floor
    # re-opened the blow-up; now the budget wins
    big = 400_000
    got = _bounded_chunk(4096, big)
    assert got * big <= _GEMM_BUDGET_ELEMS
    assert got == _GEMM_BUDGET_ELEMS // big
    # explicit tiny request is honored, not floored up to 256
    assert _bounded_chunk(8, 10_000) == 8
    # degenerate: always at least 1 row per chunk
    assert _bounded_chunk(4096, 10 * _GEMM_BUDGET_ELEMS) == 1


# ---------------------------------------------------------------------------
# ADVICE r4 #3 (knn._cast_shuffle_dtype): float64 maps to Spark
# 'double'; unknown dtypes raise ValueError instead of a deferred
# AnalysisException.
# ---------------------------------------------------------------------------

def test_cast_shuffle_dtype_validation(spark):  # noqa: F811
    from largeea_spark.operators.knn import _cast_shuffle_dtype

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "id long, emb array<double>")
    assert dict(_cast_shuffle_dtype(df, "emb", "float32").dtypes)[
        "emb"] == "array<float>"
    assert dict(_cast_shuffle_dtype(df, "emb", "float64").dtypes)[
        "emb"] == "array<double>"
    assert dict(_cast_shuffle_dtype(df, "emb", None).dtypes)[
        "emb"] == "array<double>"
    with pytest.raises(ValueError, match="shuffle_dtype"):
        _cast_shuffle_dtype(df, "emb", "float16")


# ---------------------------------------------------------------------------
# ADVICE r4 #4 (streaming state encoding): an event_type containing '|'
# must stay ONE type across drains (json-encoded state set).
# ---------------------------------------------------------------------------

def test_stream_state_type_set_delimiter_safe(spark, tmp_path):  # noqa: F811
    from largeea_spark.streaming.ingest import stream_running_user_stats

    src = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = ("event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    t = datetime.datetime(2026, 1, 1)
    spark.createDataFrame(
        [(1, t, 7, "a|b|c", 1.0, None)], schema).write.parquet(src)
    stream_running_user_stats(spark, src, out, ckpt)

    # drain 2: same composite type again — still exactly 1 distinct type
    spark.createDataFrame(
        [(2, t, 7, "a|b|c", 1.0, None)], schema
    ).write.mode("append").parquet(src)
    stream_running_user_stats(spark, src, out, ckpt)
    rows = [r for r in spark.read.parquet(out).collect() if r.n_events == 2]
    assert len(rows) == 1 and rows[0].n_types == 1, rows


# ---------------------------------------------------------------------------
# VERDICT r4 #7: state TTL — an idle key's state is evicted across
# drains (ProcessingTimeTimeout); a returning key starts fresh.
# ---------------------------------------------------------------------------

def test_stream_state_ttl_evicts_idle_key(spark, tmp_path):  # noqa: F811
    from largeea_spark.streaming.ingest import stream_running_user_stats

    src = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = ("event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    t = datetime.datetime(2026, 1, 1)
    # TTL must comfortably exceed the inter-drain gap (a drain restart
    # replays the previous drain's pending zero-input batch, whose
    # timeout processing evicts any key already idle past the TTL —
    # see stream_running_user_stats docstring), so only the DELIBERATE
    # idle gap below crosses it. A 500ms TTL raced drain overhead.
    ttl = 15000
    spark.createDataFrame(
        [(1, t, 7, "click", 1.0, None), (2, t, 9, "view", 2.0, None)],
        schema).write.parquet(src)
    stream_running_user_stats(spark, src, out, ckpt, state_ttl_ms=ttl)

    # drain 2 well inside the TTL: user 9 active again — activity wins,
    # cumulative totals carry (2 events, 5.0)
    spark.createDataFrame(
        [(3, t, 9, "view", 3.0, None)], schema
    ).write.mode("append").parquet(src)
    stream_running_user_stats(spark, src, out, ckpt, state_ttl_ms=ttl)
    u9 = sorted((r.n_events, r.total_value)
                for r in spark.read.parquet(out).collect() if r.user_id == 9)
    assert u9[-1] == (2, 5.0), u9

    # idle both keys past the TTL, then drain 3 with data only for a
    # throwaway user: users 7 and 9's expired timers fire and their
    # state is EVICTED — the state store stays bounded by activity
    time.sleep((ttl + 2000) / 1000.0)
    spark.createDataFrame(
        [(4, t, 99, "ping", 7.0, None)], schema
    ).write.mode("append").parquet(src)
    stream_running_user_stats(spark, src, out, ckpt, state_ttl_ms=ttl)

    # drain 4: user 7 returns AFTER eviction — totals start FRESH
    # (1 event, 10.0); an uninterrupted carry would show (2, 11.0)
    spark.createDataFrame(
        [(5, t, 7, "click", 10.0, None)], schema
    ).write.mode("append").parquet(src)
    stream_running_user_stats(spark, src, out, ckpt, state_ttl_ms=ttl)
    u7 = [(r.n_events, r.total_value)
          for r in spark.read.parquet(out).collect() if r.user_id == 7]
    assert (1, 10.0) in u7 and (2, 11.0) not in u7, u7


# ---------------------------------------------------------------------------
# ADVICE r4 #5 (multimodal P6): malformed separator after maxval raises
# instead of decoding garbage; valid files with comments still decode.
# ---------------------------------------------------------------------------

def test_p6_maxval_separator_validated():
    from largeea_spark.operators.multimodal import decode_image

    raster = bytes(range(2 * 2 * 3))
    ok = b"P6\n2 2\n255\n" + raster
    img = decode_image(ok)
    assert img.shape == (2, 2, 3) and img[0, 0, 0] == 0

    # comment in the header (before maxval) is fine
    commented = b"P6\n# hi\n2 2\n255\n" + raster
    assert np.array_equal(decode_image(commented), img)

    # truncated right after maxval: separator byte missing → clear error
    with pytest.raises(NotImplementedError, match="whitespace"):
        decode_image(b"P6\n2 2\n255")


# ---------------------------------------------------------------------------
# VERDICT r4 #4: gradient-TRAINED RREA backbone ('rrea_sgd') — margin
# ranking loss + Adam with hand-derived backprop through the
# reflection-attention stack. These tests pin (a) the gradients against
# central finite differences, (b) determinism under input-order
# shuffles, (c) that training actually reduces the loss.
# ---------------------------------------------------------------------------

def _tiny_rrea_graph():
    rng = np.random.default_rng(0)
    n, d, R = 7, 5, 3
    h = rng.standard_normal((n, d))
    rel = rng.standard_normal((R, d))
    e_src = np.array([0, 0, 1, 2, 3, 4, 5, 6, 6])
    e_dst = np.array([1, 2, 3, 4, 5, 6, 0, 1, 2])
    e_rel = np.array([0, 1, 2, 0, 1, 2, 0, 1, 2])
    return n, d, R, h, rel, e_src, e_dst, e_rel


def test_rrea_sgd_gradients_match_finite_differences():
    from largeea_spark.operators.trainer import (
        _norm_rows, _norm_rows_bwd, _rrea_layer_bwd, _rrea_sgd_forward)

    n, d, R, h, rel, e_src, e_dst, e_rel = _tiny_rrea_graph()
    tau, depth = 0.1, 2
    rng = np.random.default_rng(1)
    W = rng.standard_normal((n, d))  # arbitrary linear loss: L = Σ W·e

    def loss(h0, rl):
        e, _ = _rrea_sgd_forward(h0, rl, e_src, e_dst, e_rel, depth, tau)
        return float((W * e).sum())

    e, (y0, caches) = _rrea_sgd_forward(h, rel, e_src, e_dst, e_rel, depth, tau)
    gh = W.copy()
    grel = np.zeros_like(rel)
    for c in reversed(caches):
        gh, dr = _rrea_layer_bwd(c, e_src, e_dst, e_rel, R, tau, gh)
        grel += dr
    gh0 = _norm_rows_bwd(y0, _norm_rows(y0), gh)

    eps = 1e-6
    for anal, param, which in ((gh0, h, "h"), (grel, rel, "rel")):
        num = np.zeros_like(param)
        for i in range(param.shape[0]):
            for j in range(param.shape[1]):
                pp, pm = param.copy(), param.copy()
                pp[i, j] += eps
                pm[i, j] -= eps
                args = (pp, rel) if which == "h" else (h, pp)
                args_m = (pm, rel) if which == "h" else (h, pm)
                num[i, j] = (loss(*args) - loss(*args_m)) / (2 * eps)
        rel_err = np.abs(num - anal).max() / np.abs(num).max()
        assert rel_err < 1e-6, (which, rel_err)


def test_rrea_sgd_trains_and_is_deterministic():
    from largeea_spark.operators.trainer import train_embeddings_rrea_sgd_np

    rng = np.random.default_rng(7)
    n = 120
    ids = np.arange(n, dtype=np.int64)
    edges = [(v, rng.integers(0, 4), rng.integers(0, v)) for v in range(1, n)]
    tri = np.array(edges, dtype=np.int64)
    seeds = np.stack([np.arange(0, n, 4)] * 2, 1)
    emb1 = rng.standard_normal((n, 8))
    emb2 = rng.standard_normal((n, 8))

    # training from the reference-faithful random init pulls seed pairs
    # together in the structure space (anchor init starts them already
    # tied, so the from-scratch variant is the probe)
    sw, sd_ = 0.5, 32
    s = seeds[:, 0]
    t1, t2 = train_embeddings_rrea_sgd_np(
        ids, emb1, ids, emb2, tri, tri.copy(), seeds, init="hashed",
        epochs=30)
    d_pair = np.linalg.norm(t1[s, :sd_] - t2[s, :sd_], axis=1).mean() / sw
    u1, u2 = train_embeddings_rrea_sgd_np(
        ids, emb1, ids, emb2, tri, tri.copy(), seeds, init="hashed",
        epochs=0)
    d_init = np.linalg.norm(u1[s, :sd_] - u2[s, :sd_], axis=1).mean() / sw
    assert d_pair < d_init * 0.8, (d_pair, d_init)

    r1, r2 = train_embeddings_rrea_sgd_np(
        ids, emb1, ids, emb2, tri, tri.copy(), seeds)

    # determinism: shuffling triple/seed row order changes nothing
    # (edges are sorted before accumulation; init is value-hashed)
    p = rng.permutation(len(tri))
    q = rng.permutation(len(seeds))
    b1, b2 = train_embeddings_rrea_sgd_np(
        ids, emb1, ids, emb2, tri[p], tri.copy(), seeds[q])
    assert np.array_equal(r1, b1) and np.array_equal(r2, b2)

    # hashed init is the reference-faithful variant and stays available
    h1, h2 = train_embeddings_rrea_sgd_np(
        ids, emb1, ids, emb2, tri, tri.copy(), seeds, init="hashed",
        epochs=5)
    assert h1.shape == (n, 32 + 8) and h2.shape == (n, 32 + 8)


def test_rrea_sgd_dispatch_through_train_batches(spark):  # noqa: F811
    import pandas as pd
    from largeea_spark.operators.trainer import train_batches

    rows = []
    for i in range(6):
        rows.append((0, "e1", i, None, None, [float(i), 1.0]))
        rows.append((0, "e2", i, None, None, [float(i), -1.0]))
    rows += [(0, "t1", 0, 0, 1, None), (0, "t2", 0, 0, 1, None),
             (0, "seed", 0, 0, None, None), (0, "seed", 2, 2, None, None)]
    payload = spark.createDataFrame(
        pd.DataFrame(rows, columns=["batch", "kind", "a", "b", "c", "vec"]))
    out = train_batches(payload, algo="rrea_sgd").collect()
    assert len(out) == 12
    assert all(len(r.emb) == 4 for r in out)  # concat(struct d=2, name d=2)


# ---------------------------------------------------------------------------
# VERDICT r4 #6: PNG codec via stdlib zlib. Fixtures are hand-crafted
# with the FORWARD filters applied independently, so the decoder's
# unfiltering math is cross-checked, not round-tripped against itself.
# ---------------------------------------------------------------------------

def _png_chunks(ihdr_fields, idat_raw, plte=None):
    import struct
    import zlib

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(idat_raw)) + chunk(b"IEND", b"")


def _forward_filter(img, filters):
    """Apply PNG forward filters (spec §9) row by row; independent
    implementation of the inverse the decoder performs."""
    h, w, ch = img.shape
    px = img.reshape(h, w * ch).astype(np.int64)
    out = b""
    for y, f in enumerate(filters):
        row = px[y]
        prior = px[y - 1] if y else np.zeros(w * ch, dtype=np.int64)
        filt = np.zeros(w * ch, dtype=np.int64)
        for x in range(w * ch):
            left = row[x - ch] if x >= ch else 0
            up = prior[x]
            ul = prior[x - ch] if x >= ch else 0
            if f == 0:
                filt[x] = row[x]
            elif f == 1:
                filt[x] = row[x] - left
            elif f == 2:
                filt[x] = row[x] - up
            elif f == 3:
                filt[x] = row[x] - (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                filt[x] = row[x] - pred
        out += bytes([f]) + bytes((filt % 256).astype(np.uint8).tolist())
    return out


def test_png_decode_all_filters_rgb():
    from largeea_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 4, 3)).astype(np.uint8)
    # one row per filter type: None, Sub, Up, Average, Paeth
    raw = _forward_filter(img, [0, 1, 2, 3, 4])
    png = _png_chunks((4, 5, 8, 2, 0, 0, 0), raw)
    assert np.array_equal(decode_image(png), img)


def test_png_decode_gray_palette_rgba():
    from largeea_spark.operators.multimodal import decode_image

    # grayscale (type 0) replicates to RGB
    g = np.array([[0, 128], [255, 7]], dtype=np.uint8)[:, :, None]
    png_g = _png_chunks((2, 2, 8, 0, 0, 0, 0), _forward_filter(g, [0, 2]))
    out = decode_image(png_g)
    assert out.shape == (2, 2, 3) and np.array_equal(out[:, :, 0], g[:, :, 0])
    assert np.array_equal(out[:, :, 0], out[:, :, 2])

    # palette (type 3)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)[:, :, None]
    png_p = _png_chunks((2, 2, 8, 3, 0, 0, 0), _forward_filter(idx, [0, 0]), plte)
    out = decode_image(png_p)
    assert np.array_equal(out[0, 0], [255, 0, 0]) and np.array_equal(out[1, 0], [0, 0, 255])

    # RGBA (type 6): alpha dropped
    rgba = np.dstack([np.full((2, 2), 9, np.uint8), np.full((2, 2), 8, np.uint8),
                      np.full((2, 2), 7, np.uint8), np.full((2, 2), 128, np.uint8)])
    png_a = _png_chunks((2, 2, 8, 6, 0, 0, 0), _forward_filter(rgba, [1, 4]))
    assert np.array_equal(decode_image(png_a), rgba[:, :, :3])


def test_png_decode_full_path_and_seam():
    from largeea_spark.operators.multimodal import (
        decode_image, image_features, resize_nn)

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 12, 3)).astype(np.uint8)
    png = _png_chunks((12, 16, 8, 2, 0, 0, 0),
                      _forward_filter(img, [1, 2, 3, 4] * 4))
    # decode → resize → features on real PNG bytes, end-to-end
    dec = decode_image(png)
    assert np.array_equal(dec, img)
    small = resize_nn(dec, 4, 4)
    assert small.shape == (4, 4, 3)
    feats = image_features(dec)
    assert np.isfinite(feats).all()

    # 16-bit / interlaced stay behind the documented seam
    with pytest.raises(NotImplementedError, match="bitdepth"):
        decode_image(_png_chunks((2, 2, 16, 2, 0, 0, 0), b"\x00" * 26))


# ---------------------------------------------------------------------------
# VERDICT r4 #5: pinned-weights mini-transformer through the
# model_name_encoder seam, vs the closed-form numpy oracle — bitwise.
# Also pins the reference's mask+max-pool semantics (emb_loader.py
# minus_mask): the intended -1e30 mask makes padding invisible; the
# reference's literal 1e-30 constant leaks padding (documented quirk).
# ---------------------------------------------------------------------------

def test_minibert_seam_matches_numpy_oracle_bitwise(spark):  # noqa: F811
    from largeea_spark.functions.minibert import (
        MiniTransformerEncoder, mini_transformer_loader)
    from largeea_spark.functions.vectors import encode_names

    names = ["Alice_Springs", "Berlin", "", "Łódź_Voivodeship",
             "a" * 500,  # exercises the 382-byte truncation
             "Nürnberg", "東京", "x"]
    df = spark.createDataFrame([(i, n) for i, n in enumerate(names)],
                               "id long, name string").repartition(3)
    got = {r.id: np.array(r.emb, dtype=np.float32) for r in
           encode_names(df, "name",
                        encoder=mini_transformer_loader()).collect()}

    oracle = MiniTransformerEncoder()
    want = oracle.encode(names).astype(np.float32)
    for i in range(len(names)):
        assert np.array_equal(got[i], want[i]), i  # BITWISE


def test_minibert_mask_semantics():
    from largeea_spark.functions.minibert import MiniTransformerEncoder

    enc = MiniTransformerEncoder()
    texts = ["short", "a_much_longer_entity_name_for_padding"]
    unpadded = enc.encode(texts)
    masked = enc.encode_padded(texts)  # attention mask + -1e30 pool mask
    # intended mask: padding is invisible → the batch-padded path
    # agrees with the per-sentence path
    assert np.allclose(masked, unpadded, atol=1e-9)

    # the reference's LITERAL path (no attention mask inside the
    # model, 1e-30 pool "mask" that does not mask) — the short
    # sentence's result changes with batch padding (the quirk we
    # deviate from, made visible)
    literal = enc.encode_padded(texts, mask_value=1e-30, attn_mask=False)
    assert not np.allclose(literal[0], unpadded[0], atol=1e-9)
    # the longest sentence has no padding: identical under any mask
    assert np.allclose(literal[1], unpadded[1], atol=1e-9)


def test_minibert_tokenizer_contract():
    from largeea_spark.functions.minibert import (
        CLS, SEP, MiniTransformerEncoder)

    enc = MiniTransformerEncoder()
    ids = enc.tokenize("ab")
    assert ids[0] == CLS and ids[-1] == SEP
    assert ids[1:-1] == [3 + ord("a"), 3 + ord("b")]
    # truncation at 382 body bytes, like the reference's [:382]
    long = enc.tokenize("z" * 1000)
    assert len(long) == 384 and long[-1] == SEP


# ---------------------------------------------------------------------------
# SURVEY §2 M7: KGE decoders (TransE / DistMult / RotatE + align seed
# loss). Gradient correctness by central finite differences against the
# closed-form loss; determinism across row order; dispatch contract.
# ---------------------------------------------------------------------------

def _tiny_kge_setup(decoder_dim=6):
    rng = np.random.default_rng(11)
    n_ent, n_rel = 8, 3
    ent = rng.standard_normal((n_ent, decoder_dim)) * 0.3
    rel = rng.standard_normal((n_rel, decoder_dim)) * 0.3
    tri = np.array([[0, 0, 1], [1, 1, 2], [2, 2, 3], [3, 0, 4],
                    [4, 1, 5], [5, 2, 6], [6, 0, 7]], dtype=np.int64)
    s1 = np.array([0, 2], dtype=np.int64)
    s2 = np.array([4, 6], dtype=np.int64)
    return ent, rel, tri, s1, s2


@pytest.mark.parametrize("decoder", ["transe", "distmult", "rotate"])
def test_kge_gradients_match_finite_differences(decoder):
    from largeea_spark.operators.kge import kge_grads_np, kge_loss_np

    ent, rel, tri, s1, s2 = _tiny_kge_setup()
    # margin=5 keeps every hinge strictly active (scores are O(1)), so
    # the loss is smooth at the evaluation point and FD is valid
    kw = dict(decoder=decoder, margin=5.0, n_neg=2, align_weight=3.0, ep=1)
    ge, gr = kge_grads_np(ent, rel, tri, s1, s2, **kw)

    eps = 1e-6
    for anal, which in ((ge, "ent"), (gr, "rel")):
        param = ent if which == "ent" else rel
        num = np.zeros_like(param)
        for i in range(param.shape[0]):
            for j in range(param.shape[1]):
                pp, pm = param.copy(), param.copy()
                pp[i, j] += eps
                pm[i, j] -= eps
                lp = kge_loss_np(pp if which == "ent" else ent,
                                 pp if which == "rel" else rel,
                                 tri, s1, s2, **kw)
                lm = kge_loss_np(pm if which == "ent" else ent,
                                 pm if which == "rel" else rel,
                                 tri, s1, s2, **kw)
                num[i, j] = (lp - lm) / (2 * eps)
        denom = max(np.abs(num).max(), 1e-12)
        rel_err = np.abs(num - anal).max() / denom
        assert rel_err < 1e-5, (decoder, which, rel_err)


@pytest.mark.parametrize("decoder", ["transe", "distmult", "rotate"])
def test_kge_trains_pulls_seeds_and_is_deterministic(decoder):
    from largeea_spark.operators.kge import train_embeddings_kge_np

    rng = np.random.default_rng(5)
    n = 60
    ids = np.arange(n, dtype=np.int64)
    tri = np.array(
        [(v, rng.integers(0, 3), rng.integers(0, v)) for v in range(1, n)],
        dtype=np.int64)
    seeds = np.stack([np.arange(0, n, 3)] * 2, 1)
    emb1 = rng.standard_normal((n, 4))
    emb2 = rng.standard_normal((n, 4))
    kw = dict(decoder=decoder, dim=16, struct_weight=0.5)
    s = seeds[:, 0]

    t1, t2 = train_embeddings_kge_np(
        ids, emb1, ids, emb2, tri, tri.copy(), seeds, epochs=40, **kw)
    u1, u2 = train_embeddings_kge_np(
        ids, emb1, ids, emb2, tri, tri.copy(), seeds, epochs=0, **kw)
    # the align pull moves seed pairs together in the KGE block
    d_tr = np.linalg.norm(t1[s, :16] - t2[s, :16], axis=1).mean()
    d_in = np.linalg.norm(u1[s, :16] - u2[s, :16], axis=1).mean()
    assert d_tr < d_in * 0.8, (decoder, d_tr, d_in)

    # deterministic under triple/seed row-order shuffles (sorted
    # assembly + value-hashed init)
    p = rng.permutation(len(tri))
    q = rng.permutation(len(seeds))
    b1, b2 = train_embeddings_kge_np(
        ids, emb1, ids, emb2, tri[p], tri.copy(), seeds[q], epochs=40, **kw)
    assert np.array_equal(t1, b1) and np.array_equal(t2, b2)


def test_kge_dispatch_through_train_batches(spark):  # noqa: F811
    import pandas as pd
    from largeea_spark.operators.trainer import train_batches

    rows = []
    for i in range(6):
        rows.append((0, "e1", i, None, None, [float(i), 1.0]))
        rows.append((0, "e2", i, None, None, [float(i), -1.0]))
    rows += [(0, "t1", 0, 0, 1, None), (0, "t2", 0, 0, 1, None),
             (0, "seed", 0, 0, None, None), (0, "seed", 2, 2, None, None)]
    payload = spark.createDataFrame(
        pd.DataFrame(rows, columns=["batch", "kind", "a", "b", "c", "vec"]))
    out = train_batches(payload, algo="kge_transe").collect()
    assert len(out) == 12
    assert all(len(r.emb) == 66 for r in out)  # concat(kge d=64, name d=2)


# ---------------------------------------------------------------------------
# Round-5 construct-path optimizations: window-free dense ids and
# hash-keyed triple encoding (fact side shuffles 8-byte longs, not URIs).
# ---------------------------------------------------------------------------

def test_assign_dense_ids_window_free_is_dense_and_stable(spark):  # noqa: F811
    """Ids must equal the lexicographic rank at ANY shuffle-partition
    count (the local[8]-vs-local[32] stability requirement) after the
    window-exchange removal."""
    from pyspark.sql import functions as F

    from largeea_spark.operators.ids import assign_dense_ids

    keys = sorted({f"k{(i * 2654435761) % 100000:06d}" for i in range(4000)})
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    want = [(k, i) for i, k in enumerate(keys)]

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n_part in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            got = sorted(
                (r["key"], r["id"])
                for r in assign_dense_ids(df, "key").collect()
            )
            assert got == want, f"dense ids wrong at {n_part} partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    # plan must NOT contain a window (the removed third exchange)
    plan = assign_dense_ids(df, "key")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_encode_column_via_hash_matches_string_join(spark):  # noqa: F811
    from largeea_spark.operators.ids import dict_encode, encode_column

    df = spark.createDataFrame(
        [(f"uri/{i % 37}", i) for i in range(500)], "k string, v int"
    )
    dim = dict_encode(df.select("k"), "k")
    want = sorted(
        (r["v"], r["kid"])
        for r in encode_column(df, dim, "k", "kid").collect()
    )
    got = sorted(
        (r["v"], r["kid"])
        for r in encode_column(df, dim, "k", "kid", via_hash=True).collect()
    )
    assert got == want and len(got) == 500


def test_encode_column_hash_collision_falls_back_to_exact(spark):  # noqa: F811
    """Force EVERY key onto one hash value: the result must still be the
    exact string-join answer (the dirty branch carries correctness)."""
    from pyspark.sql import functions as F

    from largeea_spark.operators.ids import dict_encode, encode_column

    df = spark.createDataFrame(
        [(f"uri/{i % 11}", i) for i in range(200)], "k string, v int"
    )
    dim = dict_encode(df.select("k"), "k")
    want = sorted(
        (r["v"], r["kid"])
        for r in encode_column(df, dim, "k", "kid").collect()
    )
    got = sorted(
        (r["v"], r["kid"])
        for r in encode_column(
            df, dim, "k", "kid", via_hash=True,
            _hash_fn=lambda c: F.lit(7).cast("long"),
        ).collect()
    )
    assert got == want and len(got) == 200


def test_encode_graph_hash_keyed_matches_string_path(spark):  # noqa: F811
    """Hash-keyed triple encoding ≡ string-keyed encoding, decoded back
    to URI space; and the forced-collision fallback gives the same."""
    from pyspark.sql import functions as F

    from largeea_spark.sources.kg import encode_graph

    rows = [
        (f"ent/{(i * 7) % 50}", f"rel/{i % 5}", f"ent/{(i * 13 + 1) % 50}")
        for i in range(400)
    ] + [(None, "rel/0", "ent/1"), ("ent/2", "rel/1", None)]
    raw = spark.createDataFrame(rows, "s string, p string, o string")

    def decoded(kg):
        e = kg.ent
        r = kg.rel
        t = (
            kg.triples
            .join(e.select(F.col("id").alias("src"), F.col("uri").alias("s")), "src")
            .join(e.select(F.col("id").alias("dst"), F.col("uri").alias("o")), "dst")
            .join(r.select(F.col("id").alias("rel"), F.col("uri").alias("p")), "rel")
        )
        return sorted((x["s"], x["p"], x["o"]) for x in t.collect())

    want = sorted((s, p, o) for s, p, o in rows if s is not None and o is not None)
    kg_hash = encode_graph(raw)
    assert decoded(kg_hash) == want
    kg_coll = encode_graph(raw, _hash_fn=lambda c: F.lit(3).cast("long"))
    assert decoded(kg_coll) == want
    # dims themselves identical either way
    assert sorted(map(tuple, kg_hash.ent.collect())) == sorted(
        map(tuple, kg_coll.ent.collect())
    )


# ---------------------------------------------------------------------------
# Round-5 baseline JPEG codec (jpeg.py): pure numpy + stdlib, closing
# the dominant web-image format. Encoder exists to synthesize REAL
# JPEG bytes deterministically; the decoder reads tables from the file.
# ---------------------------------------------------------------------------

def _smooth_img(h=45, w=62):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 / w, yy * 255 / h,
        127 + 120 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
    ], axis=-1).clip(0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-12))


@pytest.mark.parametrize("subsample,dri,min_psnr", [
    ("444", 0, 40.0), ("444", 3, 40.0), ("420", 0, 33.0), ("420", 2, 33.0),
])
def test_jpeg_roundtrip_psnr(subsample, dri, min_psnr):
    from largeea_spark.operators.jpeg import (
        decode_jpeg_baseline, encode_jpeg_baseline,
    )

    img = _smooth_img()          # non-multiple-of-8/16 dims on purpose
    b = encode_jpeg_baseline(img, 90, subsample=subsample,
                             restart_interval=dri)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    out = decode_jpeg_baseline(b)
    assert out.shape == img.shape
    assert _psnr(img, out) >= min_psnr


def test_jpeg_encoder_deterministic_and_quality_monotone():
    from largeea_spark.operators.jpeg import (
        decode_jpeg_baseline, encode_jpeg_baseline,
    )

    img = _smooth_img(24, 40)
    assert encode_jpeg_baseline(img, 75) == encode_jpeg_baseline(img, 75)
    psnrs = [
        _psnr(img, decode_jpeg_baseline(encode_jpeg_baseline(img, q)))
        for q in (25, 50, 90)
    ]
    assert psnrs == sorted(psnrs), f"PSNR not monotone in quality: {psnrs}"


def test_jpeg_non_baseline_raises_pil_seam():
    from largeea_spark.operators.jpeg import (
        decode_jpeg_baseline, encode_jpeg_baseline,
    )

    b = bytearray(encode_jpeg_baseline(_smooth_img(16, 16), 90))
    i = b.find(b"\xff\xc0")      # SOF0 → SOF2 (progressive)
    b[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive|non-baseline"):
        decode_jpeg_baseline(bytes(b))
    with pytest.raises(NotImplementedError, match="SOI"):
        decode_jpeg_baseline(b"\x00\x01\x02")


def test_jpeg_through_decode_image_and_media_pipeline(spark):  # noqa: F811
    """decode_image dispatches on the FFD8 magic, and the synth media
    fixture's JPEG rows flow through the real mapInPandas
    decode→resize→features path with sane outputs."""
    from largeea_spark.operators.jpeg import encode_jpeg_baseline
    from largeea_spark.operators.multimodal import (
        decode_image, extract_features, resize_images, synth_image_media,
    )

    img = _smooth_img(20, 28)
    out = decode_image(encode_jpeg_baseline(img, 95))
    assert out.shape == img.shape and _psnr(img, out) > 35

    media = synth_image_media(spark, n=9)
    assert media.where("mime = 'image/jpeg'").count() == 3
    feats = extract_features(media, dim=16, use_real_codec=True).collect()
    assert len(feats) == 9 and all(len(r["feature"]) == 16 for r in feats)
    small = resize_images(media, 8, 8, use_real_codec=True).collect()
    assert len(small) == 9


# ---------------------------------------------------------------------------
# Round-5 real audio (WAV PCM, audio.py) and video (MJPEG AVI, avi.py):
# all three modalities now decode for real in-sandbox.
# ---------------------------------------------------------------------------

def test_wav_roundtrip_and_centroid():
    from largeea_spark.operators.audio import (
        audio_features, decode_wav, encode_wav, spectral_centroid_hz,
    )

    sr = 8000
    t = np.arange(sr) / sr  # 1 s
    for f in (440.0, 1200.0):
        x = 0.8 * np.sin(2 * np.pi * f * t)
        samples, rate = decode_wav(encode_wav(x, sr))
        assert rate == sr and len(samples) == len(x)
        assert np.max(np.abs(samples - x)) < 2 / 32768  # 16-bit quantization
        c = spectral_centroid_hz(samples, rate)
        assert abs(c - f) < 60, f"centroid {c} for pure tone {f}"
    v = audio_features(samples, sr, dim=24)
    assert v.shape == (24,) and v.dtype == np.float32
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    # determinism + tone discrimination
    x2 = 0.8 * np.sin(2 * np.pi * 440.0 * t)
    a = audio_features(x2, sr, dim=24)
    assert np.array_equal(a, audio_features(x2.copy(), sr, dim=24))
    assert not np.array_equal(a, v)


def test_wav_stereo_downmix_and_8bit_and_seams():
    from largeea_spark.operators.audio import decode_wav, encode_wav

    sr = 4000
    t = np.arange(sr // 2) / sr
    left = np.sin(2 * np.pi * 300 * t)
    stereo = np.stack([left, -left], axis=1)       # downmix → silence
    samples, _ = decode_wav(encode_wav(stereo, sr))
    assert np.max(np.abs(samples)) < 2 / 32768

    # 8-bit unsigned PCM path (hand-built container)
    pcm8 = (np.clip(left, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + sr.to_bytes(4, "little") + sr.to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(pcm8).to_bytes(4, "little") + pcm8)
    wav8 = b"RIFF" + len(body).to_bytes(4, "little") + body
    s8, r8 = decode_wav(wav8)
    assert r8 == sr and np.max(np.abs(s8 - left)) < 2 / 128

    with pytest.raises(NotImplementedError, match="WAV"):
        decode_wav(b"OggS" + b"\0" * 40)
    # float32 WAV (format 3) hits the librosa seam, not a wrong decode
    bad = bytearray(wav8)
    fmt_off = wav8.find(b"fmt ") + 8
    bad[fmt_off:fmt_off + 2] = (3).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="format=3"):
        decode_wav(bytes(bad))


def test_mjpeg_avi_roundtrip_and_seams():
    from largeea_spark.operators.avi import (
        decode_avi_frames, decode_frame_at, encode_mjpeg_avi,
    )

    frames = [_smooth_img(24, 32) for _ in range(5)]
    for k, f in enumerate(frames):
        frames[k] = np.roll(f, k * 5, axis=1)      # distinguishable frames
    b = encode_mjpeg_avi(frames, fps=10, quality=92)
    jpegs, fps = decode_avi_frames(b)
    assert len(jpegs) == 5 and fps == 10.0
    assert all(j[:2] == b"\xff\xd8" for j in jpegs)
    # frame addressed by timestamp decodes to the RIGHT frame's pixels
    for ts, k in ((0, 0), (200, 2), (400, 4), (9999, 4)):
        img = decode_frame_at(b, ts)
        assert img.shape == frames[k].shape
        assert _psnr(frames[k], img) > 28
        if k != 2:
            assert _psnr(frames[2], img) < 25 or k == 2

    with pytest.raises(NotImplementedError, match="AVI"):
        decode_avi_frames(b"\x00" * 16)
    hacked = bytearray(b)
    i = hacked.find(b"vids") + 4
    hacked[i:i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="codec"):
        decode_avi_frames(bytes(hacked))


def test_all_three_modalities_real_through_spark(spark):  # noqa: F811
    """extract_features(use_real_codec=True) runs REAL decode kernels
    for image, audio and video rows in one DataFrame, and
    sample_frames(use_real_codec=True) decodes actual AVI frames."""
    from pyspark.sql import functions as F

    from largeea_spark.operators.multimodal import (
        extract_features, sample_frames, synth_audio_media,
        synth_image_media, synth_video_media,
    )

    media = (
        synth_image_media(spark, n=3)
        .unionByName(synth_audio_media(spark, n=3)
                     .withColumn("media_id", F.col("media_id") + 100))
        .unionByName(synth_video_media(spark, n=3)
                     .withColumn("media_id", F.col("media_id") + 200))
    )
    feats = extract_features(media, dim=16, use_real_codec=True).collect()
    assert len(feats) == 9
    by_kind = {}
    for r in feats:
        v = np.array(r["feature"], dtype=np.float32)
        assert v.shape == (16,) and abs(np.linalg.norm(v) - 1) < 1e-4
        by_kind.setdefault(r["kind"], []).append(v)
    assert set(by_kind) == {"image", "audio", "video"}

    sampled = sample_frames(
        media, every_ms=150, max_frames=4, use_real_codec=True
    ).collect()
    assert len(sampled) > 0
    vids = media.where("kind = 'video'").count()
    assert len(sampled) <= vids * 4
    for r in sampled:
        assert len(r["frame_feature"]) == 32

    # cross-run determinism of the full real-codec feature path
    feats2 = extract_features(media, dim=16, use_real_codec=True).collect()
    assert sorted((r["media_id"], tuple(r["feature"])) for r in feats) == \
        sorted((r["media_id"], tuple(r["feature"])) for r in feats2)


# ---------------------------------------------------------------------------
# Round-5 real BPE subword tokenizer (F5 upgraded from hashed stand-in)
# ---------------------------------------------------------------------------

def test_bpe_training_matches_sennrich_example():
    from largeea_spark.functions.bpe import encode_word, train_bpe_merges

    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_merges(wf, 10)
    # the canonical first merges with the </w> convention: ('e','s') and
    # ('es','t</w>') both count 9 (newest 6 + widest 3), tie and then
    # chain; the full list is pinned — training is deterministic
    assert merges[:3] == [("e", "s"), ("es", "t</w>"), ("l", "o")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("low", ranks) == ["low</w>"]
    assert encode_word("lowest", ranks) == ["lo", "w", "est</w>"]
    # unseen characters fall back to single symbols, never crash
    assert encode_word("xyz", ranks) == ["x", "y", "z</w>"]
    # merges stop when no pair repeats: tiny vocab → short list
    assert train_bpe_merges([("ab", 1)], 50) == []


def test_bpe_spark_train_and_tokenize(spark):  # noqa: F811
    from pyspark.sql import functions as F

    from largeea_spark.functions.bpe import (
        bpe_token_count, bpe_tokenizer, bpe_vocabulary, train_bpe,
    )

    texts = (["the lowest low", "newest widest lower", "the newest"] * 40
             + ["The LOWEST", "the lowest", None, ""])
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = train_bpe(df, "text", n_merges=40, max_words=1000)
    assert ("e", "s") in merges
    # same corpus → identical merges at a different shuffle width
    assert merges == train_bpe(df.repartition(7), "text",
                               n_merges=40, max_words=1000)

    out = df.select("doc_id", bpe_tokenizer(merges)(F.col("text"))
                    .alias("toks")).collect()
    by_id = {r["doc_id"]: r["toks"] for r in out}
    assert by_id[0][:1] == ["the</w>"]           # frequent word → one token
    # case-folding: "The LOWEST" tokenizes identically to "the lowest",
    # and both are a non-empty prefix of doc 0's tokens
    n = len(texts)
    assert by_id[n - 4] == by_id[n - 3] != []
    assert by_id[0][: len(by_id[n - 3])] == by_id[n - 3]
    assert by_id[n - 2] == [] and by_id[n - 1] == []

    ids_df = df.select(bpe_tokenizer(merges, as_ids=True)(F.col("text"))
                       .alias("ids"))
    vocab = bpe_vocabulary(merges)
    all_ids = [i for r in ids_df.collect() for i in r["ids"]]
    assert all_ids and all(-1 <= i < len(vocab) for i in all_ids)

    counts = df.select(bpe_token_count("text", merges).alias("n")).collect()
    assert counts[0]["n"] == len(by_id[0])
