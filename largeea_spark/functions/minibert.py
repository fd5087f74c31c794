"""Pinned-weights mini-transformer encoder (VERDICT r4 #5): a pure
numpy 2-layer BERT-shaped model with a byte-level vocab that executes
the reference's full tokenize → encode → layer-1 hidden state →
mask+max-pool path (`src/emb_loader.py:119-205`) through the engine's
``model_name_encoder`` seam — so the seam's plumbing is proven against
a closed-form oracle (the same forward run driver-side), bitwise.

What it pins that the round-2..4 mock seam could not:

* tokenizer contract: [CLS] + ids (truncated to 382) + [SEP]
  (`emb_loader.py:193-196`), byte-level vocab standing in for BPE;
* layer selection: ``hidden_states[layer]`` with layer=1 — "For entity
  alignment, the best layer is 1" (`emb_loader.py:142-143`);
* pooling: mask then max over the sequence dim
  (`pooled_bert_encode`, `emb_loader.py:172-182`).

Masking note, documented deviation: the reference's ``minus_mask``
multiplies the pad mask by the literal constant ``1e-30``
(`emb_loader.py:135-136`) — an additive nudge of 1e-30, which does NOT
exclude padded positions from the max (almost certainly a typo for
-1e30; LargeEA's published numbers ship with it, and with it results
depend on batch composition). This engine is deterministic by
contract, so :meth:`MiniTransformerEncoder.encode` runs PER-SENTENCE
(no cross-sentence padding → nothing to mask → batch-invariant,
bitwise-reproducible at any Arrow batching), and
:meth:`encode_padded` exposes the batch-padded path with
``mask_value`` selectable between the intended ``-1e30`` (proven
equal to the unpadded path in tests/test_round5.py) and the
reference's literal ``1e-30`` (shown there to leak padding — the
quirk, made visible instead of silently inherited).

All weights are drawn from a seeded PCG64 generator at construction —
pinned, reproducible on driver and executors alike, no model files.
"""

from __future__ import annotations

import numpy as np

CLS, SEP, PAD = 0, 1, 2
_VOCAB = 3 + 256  # byte-level: id = 3 + byte value
_MAX_BODY = 382   # reference truncation (`emb_loader.py:193`)


def _layernorm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-12) * g + b


def _gelu(x: np.ndarray) -> np.ndarray:
    """tanh-approximation GELU (the BERT paper's form)."""
    return 0.5 * x * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


class MiniTransformerEncoder:
    """2-layer, 2-head BERT-shaped encoder over a byte vocab with
    pinned seeded weights; exposes the sentence-transformers-style
    ``encode(texts) -> ndarray`` the ``model_name_encoder`` seam
    expects."""

    def __init__(self, dim: int = 32, n_layers: int = 2, n_heads: int = 2,
                 ffn: int = 64, layer: int = 1, seed: int = 20260817,
                 max_len: int = _MAX_BODY + 2):
        assert dim % n_heads == 0
        self.dim, self.n_layers, self.n_heads = dim, n_layers, n_heads
        self.layer, self.max_len = layer, max_len
        rng = np.random.default_rng(seed)
        s = 1.0 / np.sqrt(dim)

        def mat(*shape):
            return rng.standard_normal(shape) * s

        self.tok_emb = mat(_VOCAB, dim)
        self.pos_emb = mat(max_len, dim)
        self.ln_emb = (np.ones(dim), np.zeros(dim))
        self.blocks = []
        for _ in range(n_layers):
            self.blocks.append({
                "wq": mat(dim, dim), "bq": mat(dim),
                "wk": mat(dim, dim), "bk": mat(dim),
                "wv": mat(dim, dim), "bv": mat(dim),
                "wo": mat(dim, dim), "bo": mat(dim),
                "ln1": (np.ones(dim), np.zeros(dim)),
                "w1": mat(dim, ffn), "b1": mat(ffn),
                "w2": mat(ffn, dim), "b2": mat(dim),
                "ln2": (np.ones(dim), np.zeros(dim)),
            })

    # -- tokenizer ---------------------------------------------------------
    def tokenize(self, text: str) -> list[int]:
        """[CLS] + byte ids truncated to 382 + [SEP] — the reference's
        assembly (`emb_loader.py:193-196`) over a byte-level vocab."""
        body = [3 + b for b in text.encode("utf-8")[:_MAX_BODY]]
        return [CLS] + body + [SEP]

    # -- forward -----------------------------------------------------------
    def _hidden(self, ids: np.ndarray,
                n_real: int | None = None) -> np.ndarray:
        """(L,) ids → hidden_states[self.layer] of shape (L, dim).
        hidden_states[0] is the embedding output, [k] the output of
        block k — the HuggingFace indexing the reference relies on.

        ``n_real``: when set, attention logits to key positions ≥
        n_real get −1e30 (a proper attention mask, so padding cannot
        influence real positions). The reference calls the model with
        NO attention mask (`emb_loader.py:201` — ``self.model(
        sentences)`` only), so its padded positions DO perturb real
        hidden states; ``None`` replicates that."""
        L = len(ids)
        x = _layernorm(self.tok_emb[ids] + self.pos_emb[:L], *self.ln_emb)
        if self.layer == 0:
            return x
        H, dh = self.n_heads, self.dim // self.n_heads
        amask = None
        if n_real is not None and n_real < L:
            amask = np.where(np.arange(L) >= n_real, -1e30, 0.0)
        for k, blk in enumerate(self.blocks, start=1):
            q = (x @ blk["wq"] + blk["bq"]).reshape(L, H, dh)
            kk = (x @ blk["wk"] + blk["bk"]).reshape(L, H, dh)
            v = (x @ blk["wv"] + blk["bv"]).reshape(L, H, dh)
            logits = np.einsum("ihd,jhd->hij", q, kk) / np.sqrt(dh)
            if amask is not None:
                logits = logits + amask[None, None, :]
            att = _softmax(logits, axis=-1)
            ctx = np.einsum("hij,jhd->ihd", att, v).reshape(L, self.dim)
            x = _layernorm(x + ctx @ blk["wo"] + blk["bo"], *blk["ln1"])
            f = _gelu(x @ blk["w1"] + blk["b1"]) @ blk["w2"] + blk["b2"]
            x = _layernorm(x + f, *blk["ln2"])
            if k == self.layer:
                return x
        return x

    def encode(self, texts: list[str]) -> np.ndarray:
        """Per-sentence forward + max-pool over positions — the
        batch-invariant path the seam uses (see module docstring)."""
        out = np.empty((len(texts), self.dim), dtype=np.float64)
        for i, t in enumerate(texts):
            ids = np.array(self.tokenize("" if t is None else t))
            out[i] = self._hidden(ids).max(axis=0)
        return out

    def encode_padded(self, texts: list[str], mask_value: float = -1e30,
                      attn_mask: bool = True) -> np.ndarray:
        """The reference's batch-padded path (`bert_encode` +
        ``minus_mask``): pad every sentence to the batch max length
        with PAD, run the forward over the padded sequence, add
        ``mask_value`` at padded positions, max-pool.

        Defaults give the INTENDED semantics — attention mask on and
        pool mask −1e30, under which padding is invisible and the
        result equals :meth:`encode` up to shape-dependent float
        rounding. ``attn_mask=False, mask_value=1e-30`` replicates the
        reference literally (`emb_loader.py:135,201`): no attention
        mask inside the model and a 1e-30 "mask" that does not mask —
        padded hidden states both perturb real positions and leak
        straight into the max-pool."""
        toks = [self.tokenize("" if t is None else t) for t in texts]
        lens = [len(t) for t in toks]
        mx = max(lens)
        out = np.empty((len(texts), self.dim), dtype=np.float64)
        for i, (t, ln) in enumerate(zip(toks, lens)):
            ids = np.array(t + [PAD] * (mx - ln))
            hid = self._hidden(ids, n_real=ln if attn_mask else None)
            mask = (np.arange(mx) >= ln).astype(np.float64)[:, None]
            out[i] = (hid + mask * mask_value).max(axis=0)
        return out


def mini_transformer_loader(**kw):
    """Zero-arg loader factory for ``model_name_encoder``/
    ``encode_names`` — ships only the constructor kwargs through the
    closure; weights regenerate deterministically on each executor."""
    def load():
        return MiniTransformerEncoder(**kw)
    return load
