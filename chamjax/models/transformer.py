"""Pure-JAX transformer decoder / encoder-decoder with explicit KV caches.

Replaces the reference's entire fairseq-fork dependency (SURVEY.md §2.3:
the *used surface* is ``TransformerDecoder/TransformerEncoder`` forward with
``incremental_state`` and access to the last hidden state) with ~600 lines
of TPU-first JAX:

- layers are **stacked** along a leading axis and driven by ``lax.scan`` so
  compile time is O(1) in depth (Dec-L has 96 layers);
- the KV cache is an explicit pytree updated with ``dynamic_update_slice``
  (the functional mirror of fairseq's ``incremental_state`` dict);
- weights live in bfloat16 (MXU-native), layernorm/softmax run in f32;
- tensor-parallel sharding is applied externally by constraining the head
  and FFN dims to a mesh axis (see ``chamjax/parallel``).

Model shapes mirror ``experiments/config/{Dec-S,Dec-L,EncDec-S,EncDec-L}.yaml``
via ``chamjax.config.MODEL_PRESETS``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from chamjax.config import ModelConfig

Pytree = Any


class KVCache(NamedTuple):
    """Self-attention cache: one stacked buffer per stack of layers."""

    k: jax.Array          # (layers, b, max_len, heads, head_dim)
    v: jax.Array          # (layers, b, max_len, heads, head_dim)
    idx: jax.Array        # () int32 — number of cached positions


class TransformerParams(NamedTuple):
    embed: jax.Array             # (vocab, d)
    pos: jax.Array               # (max_len, d)
    layers: Pytree               # dict of (L, ...) stacked arrays
    ln_f: Pytree                 # {"scale","bias"}
    out_proj: jax.Array          # (d, vocab)
    cross_layers: Optional[Pytree] = None   # enc-dec decoders only


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_layer_stack(key, cfg: ModelConfig, n_layers: int, dtype) -> Dict:
    d, f = cfg.embed_dim, cfg.ffn_embed_dim
    ks = jax.random.split(key, 6)
    scale = d ** -0.5

    def w(k, shape, s):
        return (jax.random.normal(k, (n_layers,) + shape, jnp.float32) * s
                ).astype(dtype)

    return {
        "ln1_scale": jnp.ones((n_layers, d), dtype),
        "ln1_bias": jnp.zeros((n_layers, d), dtype),
        "wqkv": w(ks[0], (d, 3 * d), scale),
        "wo": w(ks[1], (d, d), scale),
        "ln2_scale": jnp.ones((n_layers, d), dtype),
        "ln2_bias": jnp.zeros((n_layers, d), dtype),
        "w1": w(ks[2], (d, f), scale),
        "b1": jnp.zeros((n_layers, f), dtype),
        "w2": w(ks[3], (f, d), f ** -0.5),
        "b2": jnp.zeros((n_layers, d), dtype),
    }


def _init_cross_stack(key, cfg: ModelConfig, n_layers: int, dtype) -> Dict:
    d = cfg.embed_dim
    ks = jax.random.split(key, 4)
    scale = d ** -0.5

    def w(k, shape, s):
        return (jax.random.normal(k, (n_layers,) + shape, jnp.float32) * s
                ).astype(dtype)

    return {
        "ln_scale": jnp.ones((n_layers, d), dtype),
        "ln_bias": jnp.zeros((n_layers, d), dtype),
        "wq": w(ks[0], (d, d), scale),
        "wkv": w(ks[1], (d, 2 * d), scale),
        "wo": w(ks[2], (d, d), scale),
    }


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def init_decoder(key, cfg: ModelConfig, cross_attention: bool = False
                 ) -> TransformerParams:
    dtype = _dtype(cfg)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    d = cfg.embed_dim
    return TransformerParams(
        embed=(jax.random.normal(k1, (cfg.vocab_size, d), jnp.float32)
               * d ** -0.5).astype(dtype),
        pos=(jax.random.normal(k2, (cfg.max_seq_len, d), jnp.float32)
             * 0.02).astype(dtype),
        layers=_init_layer_stack(k3, cfg, cfg.layers, dtype),
        ln_f={"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        out_proj=(jax.random.normal(k4, (d, cfg.vocab_size), jnp.float32)
                  * d ** -0.5).astype(dtype),
        cross_layers=(_init_cross_stack(k5, cfg, cfg.layers, dtype)
                      if cross_attention else None),
    )


def init_encoder(key, cfg: ModelConfig) -> TransformerParams:
    enc_cfg = cfg
    dtype = _dtype(cfg)
    k1, k2, k3 = jax.random.split(key, 3)
    d = cfg.embed_dim
    return TransformerParams(
        embed=(jax.random.normal(k1, (cfg.vocab_size, d), jnp.float32)
               * d ** -0.5).astype(dtype),
        pos=(jax.random.normal(k2, (cfg.max_seq_len, d), jnp.float32)
             * 0.02).astype(dtype),
        layers=_init_layer_stack(k3, enc_cfg, cfg.encoder_layers, dtype),
        ln_f={"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        out_proj=jnp.zeros((d, 1), dtype),   # encoders emit hidden states only
    )


def init_encoder_decoder(key, cfg: ModelConfig
                         ) -> Tuple[TransformerParams, TransformerParams]:
    k1, k2 = jax.random.split(key)
    return init_encoder(k1, cfg), init_decoder(k2, cfg, cross_attention=True)


def init_kv_cache(cfg: ModelConfig, batch: int,
                  max_len: Optional[int] = None) -> KVCache:
    h = cfg.attention_heads
    hd = cfg.embed_dim // h
    T = max_len or cfg.max_seq_len
    dtype = _dtype(cfg)
    shape = (cfg.layers, batch, T, h, hd)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   idx=jnp.int32(0))


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale + bias


def _split_heads(x, h):
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h)


def _attn_full(q, k, v, causal: bool, valid_len=None):
    """q,k,v: (b, t, h, hd) → (b, t, h, hd); softmax in f32."""
    hd = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * hd ** -0.5
    tq, tk = q.shape[1], k.shape[1]
    if causal:
        mask = jnp.tril(jnp.ones((tq, tk), bool), tk - tq)
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    if valid_len is not None:   # per-batch key padding mask (b,)
        pos = jnp.arange(tk)[None, None, None, :]
        scores = jnp.where(pos < valid_len[:, None, None, None],
                           scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _decoder_layers_full(layers, x, h):
    """Full-sequence causal self-attention over stacked layers via scan."""

    def body(x, lp):
        y = _ln(x, lp["ln1_scale"], lp["ln1_bias"])
        qkv = y @ lp["wqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = _attn_full(_split_heads(q, h), _split_heads(k, h),
                       _split_heads(v, h), causal=True)
        x = x + a.reshape(x.shape) @ lp["wo"]
        y = _ln(x, lp["ln2_scale"], lp["ln2_bias"])
        x = x + (jax.nn.gelu(y @ lp["w1"] + lp["b1"])) @ lp["w2"] + lp["b2"]
        return x, None

    x, _ = jax.lax.scan(body, x, layers)
    return x


@functools.partial(jax.jit, static_argnames=("heads",))
def decoder_prefill(
    params: TransformerParams,
    tokens: jax.Array,            # (b, t) int32
    cache: KVCache,
    heads: int,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Process a whole prompt; fill the cache. Returns
    ``(logits (b,t,V), hidden (b,t,d), cache)``."""
    b, t = tokens.shape
    h = heads
    x = params.embed[tokens] + params.pos[:t][None]

    def body(x, inp):
        lp, kc, vc = inp
        y = _ln(x, lp["ln1_scale"], lp["ln1_bias"])
        q, k, v = jnp.split(y @ lp["wqkv"], 3, axis=-1)
        qh, kh, vh = (_split_heads(z, h) for z in (q, k, v))
        a = _attn_full(qh, kh, vh, causal=True)
        x = x + a.reshape(x.shape) @ lp["wo"]
        y = _ln(x, lp["ln2_scale"], lp["ln2_bias"])
        x = x + (jax.nn.gelu(y @ lp["w1"] + lp["b1"])) @ lp["w2"] + lp["b2"]
        kc = jax.lax.dynamic_update_slice(kc, kh, (0, 0, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, vh, (0, 0, 0, 0))
        return x, (kc, vc)

    x, (ks, vs) = jax.lax.scan(body, x, (params.layers, cache.k, cache.v))
    hidden = _ln(x, params.ln_f["scale"], params.ln_f["bias"])
    logits = hidden @ params.out_proj
    return logits, hidden, KVCache(k=ks, v=vs, idx=jnp.int32(t))


@functools.partial(jax.jit, static_argnames=("heads",),
                   donate_argnames=("cache",))
def decoder_step(
    params: TransformerParams,
    tokens: jax.Array,            # (b,) int32 — one new token per sequence
    cache: KVCache,
    heads: int,
    cross_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cross_valid_len: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """One incremental decode step (the hot loop of RALM generation,
    reference ``ralm/ralm/ralm.py:85-146``). Returns
    ``(logits (b,V), hidden (b,d), cache)``.

    ``cross_kv``: stacked (layers, b, s, h, hd) K/V over retrieved-context
    encoder output — enc-dec mode only.
    """
    b = tokens.shape[0]
    h = heads
    T = cache.k.shape[2]
    idx = cache.idx
    x = params.embed[tokens] + params.pos[idx][None]      # (b, d)
    x = x[:, None, :]                                     # (b, 1, d)

    has_cross = cross_kv is not None
    xs = (params.layers, cache.k, cache.v)
    if has_cross:
        xs = xs + (params.cross_layers, cross_kv[0], cross_kv[1])

    # The cache is read-only inside the layer scan (scan xs are views, never
    # copied); the current token's self-attention term is computed
    # separately, and the new K/V columns are stacked (tiny: (layers, b, 1,
    # h, hd)) and written into the full cache with ONE thin
    # dynamic_update_slice afterwards — in place, since the cache is
    # donated.  Re-stacking per-layer caches as scan outputs instead would
    # copy the whole multi-GB cache every step (33 ms vs ~3 ms per step for
    # Dec-S at batch 64).
    strict_mask = jnp.arange(T)[None, None, :] < idx      # cached pos < idx

    def body(x, inp):
        if has_cross:
            lp, kc, vc, cp, ck, cv = inp
        else:
            lp, kc, vc = inp
        y = _ln(x, lp["ln1_scale"], lp["ln1_bias"])
        q, k, v = jnp.split(y @ lp["wqkv"], 3, axis=-1)
        qh = _split_heads(q, h)                           # (b, 1, h, hd)
        kh = _split_heads(k, h)
        vh = _split_heads(v, h)
        hd = qh.shape[-1]
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kc,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        scores = jnp.where(strict_mask.reshape(1, 1, 1, T), scores, -jnp.inf)
        self_score = jnp.sum(qh * kh, axis=-1,
                             dtype=jnp.float32) * hd ** -0.5  # (b, 1, h)
        self_score = self_score.transpose(0, 2, 1)[:, :, :, None]  # (b,h,1,1)
        all_scores = jnp.concatenate([scores, self_score], axis=-1)
        p = jax.nn.softmax(all_scores, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhqk,bkhd->bqhd", p[..., :T], vc) \
            + p[..., T:].transpose(0, 2, 1, 3) * vh       # (b, 1, h, hd)
        x = x + a.reshape(x.shape) @ lp["wo"]
        if has_cross:
            y = _ln(x, cp["ln_scale"], cp["ln_bias"])
            cq = _split_heads(y @ cp["wq"], h)
            ca = _attn_full(cq, ck, cv, causal=False,
                            valid_len=cross_valid_len)
            x = x + ca.reshape(x.shape) @ cp["wo"]
        y = _ln(x, lp["ln2_scale"], lp["ln2_bias"])
        x = x + (jax.nn.gelu(y @ lp["w1"] + lp["b1"])) @ lp["w2"] + lp["b2"]
        return x, (kh, vh)

    x, (ks_new, vs_new) = jax.lax.scan(body, x, xs)
    ks = jax.lax.dynamic_update_slice(cache.k, ks_new, (0, 0, idx, 0, 0))
    vs = jax.lax.dynamic_update_slice(cache.v, vs_new, (0, 0, idx, 0, 0))
    hidden = _ln(x[:, 0, :], params.ln_f["scale"], params.ln_f["bias"])
    logits = hidden @ params.out_proj
    return logits, hidden, KVCache(k=ks, v=vs, idx=idx + 1)


# ---------------------------------------------------------------------------
# Encoder (enc-dec mode: encodes query tokens / retrieved tokens,
# reference ``ralm/ralm/ralm.py:307-344``)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("heads",))
def encoder_forward(
    params: TransformerParams,
    tokens: jax.Array,            # (b, s) int32
    heads: int,
    valid_len: Optional[jax.Array] = None,
) -> jax.Array:
    """Bidirectional encoder → hidden states (b, s, d)."""
    b, s = tokens.shape
    h = heads
    x = params.embed[tokens] + params.pos[:s][None]

    def body(x, lp):
        y = _ln(x, lp["ln1_scale"], lp["ln1_bias"])
        q, k, v = jnp.split(y @ lp["wqkv"], 3, axis=-1)
        a = _attn_full(_split_heads(q, h), _split_heads(k, h),
                       _split_heads(v, h), causal=False, valid_len=valid_len)
        x = x + a.reshape(x.shape) @ lp["wo"]
        y = _ln(x, lp["ln2_scale"], lp["ln2_bias"])
        x = x + (jax.nn.gelu(y @ lp["w1"] + lp["b1"])) @ lp["w2"] + lp["b2"]
        return x, None

    x, _ = jax.lax.scan(body, x, params.layers)
    return _ln(x, params.ln_f["scale"], params.ln_f["bias"])


@functools.partial(jax.jit, static_argnames=("heads",))
def build_cross_kv(
    dec_params: TransformerParams,
    enc_out: jax.Array,           # (b, s, d)
    heads: int,
) -> Tuple[jax.Array, jax.Array]:
    """Precompute per-decoder-layer cross-attention K/V over encoder output
    (done once per retrieval step, reused for ``retrieval_interval`` decode
    steps — mirrors the reference's cached ``encoder_out_dict``)."""
    h = heads

    def body(_, cp):
        kv = enc_out @ cp["wkv"]
        k, v = jnp.split(kv, 2, axis=-1)
        return None, (_split_heads(k, h), _split_heads(v, h))

    _, (ks, vs) = jax.lax.scan(body, None, dec_params.cross_layers)
    return ks, vs                  # (layers, b, s, h, hd) each
