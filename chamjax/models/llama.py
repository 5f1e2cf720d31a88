"""Llama-family decoder: RMSNorm + rotary positions + SwiGLU + GQA.

The reference scaffolds a llama RALM variant (``ralm/ralm/ralm.py:433-618``
``ralmDecoder_llama`` — a duplicate of the fairseq loop intended for HF
llama).  Here the family is a first-class TPU model: same stacked-layer
``lax.scan`` + donated-KV-cache discipline as ``transformer.py`` (compile
time O(1) in depth, one thin cache-column write per decode step), with the
llama-specific blocks:

- RMSNorm (no mean subtraction, no bias), computed in f32;
- rotary position embeddings applied to q/k at attention time; cached K is
  stored pre-rotated so incremental steps never re-rotate history;
- SwiGLU FFN (``silu(x@w1) * (x@w3) @ w2``), no biases anywhere;
- grouped-query attention: ``kv_heads ≤ attention_heads`` K/V heads, each
  shared by ``attention_heads // kv_heads`` query heads (cache memory and
  decode bandwidth shrink proportionally — the TPU-relevant win).

Works with the same ``RalmDecoder``/tik-tok serving loops via the
``llama_prefill``/``llama_step`` entry points (signature-compatible with
``decoder_prefill``/``decoder_step``).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from chamjax.config import ModelConfig
from chamjax.models.transformer import KVCache, _dtype


def _kv_heads(cfg: ModelConfig) -> int:
    kv = cfg.kv_heads or cfg.attention_heads
    assert cfg.attention_heads % kv == 0, (cfg.attention_heads, kv)
    return kv


def init_llama(key, cfg: ModelConfig) -> Dict:
    """Parameter pytree; layers stacked on a leading (L, ...) axis."""
    d, f, h = cfg.embed_dim, cfg.ffn_embed_dim, cfg.attention_heads
    kv = _kv_heads(cfg)
    hd = d // h
    L = cfg.layers
    dtype = _dtype(cfg)
    ks = jax.random.split(key, 8)
    scale = d ** -0.5

    # generate at the target dtype: a 7B stack's f32 intermediates would
    # double the init's transient HBM footprint for no statistical benefit
    def w(k, shape, s=scale):
        return jax.random.normal(k, (L,) + shape, dtype) * jnp.asarray(
            s, dtype)

    return {
        "embed": jax.random.normal(ks[0], (cfg.vocab_size, d), dtype)
        * jnp.asarray(scale, dtype),
        "layers": {
            "ln1": jnp.ones((L, d), dtype),
            "wq": w(ks[1], (d, h * hd)),
            "wk": w(ks[2], (d, kv * hd)),
            "wv": w(ks[3], (d, kv * hd)),
            "wo": w(ks[4], (h * hd, d)),
            "ln2": jnp.ones((L, d), dtype),
            "w1": w(ks[5], (d, f)),
            "w3": w(ks[6], (d, f)),
            "w2": w(ks[7], (f, d), f ** -0.5),
        },
        "ln_f": jnp.ones((d,), dtype),
        "out_proj": jax.random.normal(
            jax.random.fold_in(key, 99), (d, cfg.vocab_size), dtype)
        * jnp.asarray(scale, dtype),
    }


def init_llama_kv_cache(cfg: ModelConfig, batch: int,
                        max_len: Optional[int] = None) -> KVCache:
    kv = _kv_heads(cfg)
    hd = cfg.embed_dim // cfg.attention_heads
    T = max_len or cfg.max_seq_len
    dtype = _dtype(cfg)
    shape = (cfg.layers, batch, T, kv, hd)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   idx=jnp.int32(0))


# ---------------------------------------------------------------------------
# rotary helpers
# ---------------------------------------------------------------------------


def _rope_tables(positions: jax.Array, hd: int, theta: float):
    """cos/sin (…, hd/2) for the rotate-half convention, f32."""
    inv = theta ** (-jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    ang = positions.astype(jnp.float32)[..., None] * inv      # (..., hd/2)
    return jnp.cos(ang), jnp.sin(ang)


def _rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (b, t, h, hd); cos/sin broadcastable to (b, t, 1, hd/2)."""
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


def _gqa_scores(qh, kh, groups: int):
    """qh (b,tq,h,hd) × kh (b,tk,kv,hd) → (b, h, tq, tk) f32."""
    b, tq, h, hd = qh.shape
    kvh = kh.shape[2]
    qg = qh.reshape(b, tq, kvh, groups, hd)
    s = jnp.einsum("bqkgd,bskd->bkgqs", qg, kh,
                   preferred_element_type=jnp.float32)
    return s.reshape(b, h, tq, kh.shape[1]) * hd ** -0.5


def _gqa_mix(p, vh, groups: int):
    """p (b,h,tq,tk) × vh (b,tk,kv,hd) → (b, tq, h, hd)."""
    b, h, tq, tk = p.shape
    kvh = vh.shape[2]
    pg = p.reshape(b, kvh, groups, tq, tk)
    a = jnp.einsum("bkgqs,bskd->bqkgd", pg, vh)
    return a.reshape(b, tq, h, a.shape[-1])


def _rms(x, scale, eps=1e-5):
    xf = x.astype(jnp.float32)
    nrm = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * nrm).astype(x.dtype) * scale


# ---------------------------------------------------------------------------
# prefill / step
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("heads", "kv_heads", "theta"))
def llama_prefill(params: Dict, tokens: jax.Array, cache: KVCache,
                  heads: int, kv_heads: int = 0, theta: float = 10000.0
                  ) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Whole-prompt pass; fills the cache with pre-rotated K.

    Returns ``(logits (b,t,V), hidden (b,t,d), cache)``."""
    b, t = tokens.shape
    h = heads
    kv = kv_heads or heads
    groups = h // kv
    d = params["embed"].shape[1]
    hd = d // h
    x = params["embed"][tokens]
    cos, sin = _rope_tables(jnp.arange(t), hd, theta)         # (t, hd/2)
    cos, sin = cos[None, :, None, :], sin[None, :, None, :]

    def body(x, inp):
        lp, kc, vc = inp
        y = _rms(x, lp["ln1"])
        qh = _rope((y @ lp["wq"]).reshape(b, t, h, hd), cos, sin)
        kh = _rope((y @ lp["wk"]).reshape(b, t, kv, hd), cos, sin)
        vh = (y @ lp["wv"]).reshape(b, t, kv, hd)
        s = _gqa_scores(qh, kh, groups)
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        a = _gqa_mix(p, vh, groups)
        x = x + a.reshape(b, t, h * hd) @ lp["wo"]
        y = _rms(x, lp["ln2"])
        x = x + (jax.nn.silu(y @ lp["w1"]) * (y @ lp["w3"])) @ lp["w2"]
        kc = jax.lax.dynamic_update_slice(kc, kh, (0, 0, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, vh, (0, 0, 0, 0))
        return x, (kc, vc)

    x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
    hidden = _rms(x, params["ln_f"])
    logits = hidden @ params["out_proj"]
    return logits, hidden, KVCache(k=ks, v=vs, idx=jnp.int32(t))


@functools.partial(jax.jit, static_argnames=("heads", "kv_heads", "theta"),
                   donate_argnames=("cache",))
def llama_step(params: Dict, tokens: jax.Array, cache: KVCache,
               heads: int, kv_heads: int = 0, theta: float = 10000.0
               ) -> Tuple[jax.Array, jax.Array, KVCache]:
    """One incremental decode step; same cache discipline as
    ``decoder_step`` (read-only scan over the cache + one thin donated
    column write).  Returns ``(logits (b,V), hidden (b,d), cache)``."""
    b = tokens.shape[0]
    h = heads
    kv = kv_heads or heads
    groups = h // kv
    d = params["embed"].shape[1]
    hd = d // h
    T = cache.k.shape[2]
    idx = cache.idx
    x = params["embed"][tokens][:, None, :]                   # (b, 1, d)
    cos, sin = _rope_tables(idx[None], hd, theta)             # (1, hd/2)
    cos, sin = cos[None, :, None, :], sin[None, :, None, :]   # (1,1,1,hd/2)
    strict = jnp.arange(T)[None, None, None, :] < idx         # (1,1,1,T)

    def body(x, inp):
        lp, kc, vc = inp
        y = _rms(x, lp["ln1"])
        qh = _rope((y @ lp["wq"]).reshape(b, 1, h, hd), cos, sin)
        kh = _rope((y @ lp["wk"]).reshape(b, 1, kv, hd), cos, sin)
        vh = (y @ lp["wv"]).reshape(b, 1, kv, hd)
        s_hist = _gqa_scores(qh, kc, groups)                  # (b,h,1,T)
        s_hist = jnp.where(strict, s_hist, -jnp.inf)
        s_self = jnp.sum(
            qh.reshape(b, 1, kv, groups, hd) * kh[:, :, :, None, :],
            axis=-1, dtype=jnp.float32).reshape(b, 1, h) * hd ** -0.5
        s_all = jnp.concatenate(
            [s_hist, s_self.transpose(0, 2, 1)[:, :, :, None]], axis=-1)
        p = jax.nn.softmax(s_all, axis=-1).astype(x.dtype)
        a = _gqa_mix(p[..., :T], vc, groups) \
            + (p[..., T:].transpose(0, 2, 1, 3)
               .reshape(b, 1, kv, groups, 1) * vh[:, :, :, None, :]
               ).reshape(b, 1, h, hd)
        x = x + a.reshape(b, 1, h * hd) @ lp["wo"]
        y = _rms(x, lp["ln2"])
        x = x + (jax.nn.silu(y @ lp["w1"]) * (y @ lp["w3"])) @ lp["w2"]
        return x, (kh, vh)

    x, (ks_new, vs_new) = jax.lax.scan(body, x, (params["layers"],
                                                 cache.k, cache.v))
    ks = jax.lax.dynamic_update_slice(cache.k, ks_new, (0, 0, idx, 0, 0))
    vs = jax.lax.dynamic_update_slice(cache.v, vs_new, (0, 0, idx, 0, 0))
    hidden = _rms(x[:, 0, :], params["ln_f"])
    logits = hidden @ params["out_proj"]
    return logits, hidden, KVCache(k=ks, v=vs, idx=idx + 1)
