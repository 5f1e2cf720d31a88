"""Tensor-parallel model sharding equivalence (VERDICT r2 weak #4).

Pins that placing decoder / llama params and KV caches on a (dp=2, tp=2)
mesh (``parallel/sharded_model.py``) leaves every output numerically
equal to the unsharded single-device run — GSPMD may re-tile and insert
collectives, but the math must not change (tolerance for f32 reduction
order only).  Also drives a multi-step RALM serving loop on the mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chamjax.config import ModelConfig
from chamjax.models import init_decoder, init_kv_cache
from chamjax.models.llama import init_llama, init_llama_kv_cache, llama_step
from chamjax.models.transformer import decoder_prefill, decoder_step
from chamjax.parallel import make_mesh
from chamjax.parallel.sharded_model import (
    shard_decoder_params, shard_kv_cache, shard_llama_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs a 4-device mesh")


def _mesh():
    return make_mesh((("dp", 2), ("tp", 2)), devices=jax.devices()[:4])


def _dec_cfg(**over):
    kw = dict(model_type="decoder", embed_dim=64, ffn_embed_dim=128,
              layers=2, attention_heads=4, vocab_size=128, max_seq_len=16,
              dtype="float32")
    kw.update(over)
    return ModelConfig(**kw)


def _tree_allclose(a, b, atol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), atol=atol)


def test_tp_decoder_step_matches_unsharded():
    cfg = _dec_cfg()
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    b = 4
    prompt = jax.random.randint(jax.random.PRNGKey(1), (b, 6), 0,
                                cfg.vocab_size, jnp.int32)
    tok = jnp.full((b,), 3, jnp.int32)

    # unsharded reference: prefill then two incremental steps
    _l0, _h0, cache = decoder_prefill(params, prompt,
                                      init_kv_cache(cfg, b),
                                      cfg.attention_heads)
    ref = []
    for _ in range(2):
        logits, hidden, cache = decoder_step(params, tok, cache,
                                             cfg.attention_heads)
        ref.append((np.asarray(logits), np.asarray(hidden)))
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    cache_ref = jax.tree_util.tree_map(np.asarray, cache)

    mesh = _mesh()
    sp = shard_decoder_params(params, mesh)
    _l0, _h0, scache = decoder_prefill(sp, prompt,
                                       shard_kv_cache(
                                           init_kv_cache(cfg, b), mesh),
                                       cfg.attention_heads)
    tok = jnp.full((b,), 3, jnp.int32)
    for step in range(2):
        logits, hidden, scache = decoder_step(sp, tok, scache,
                                              cfg.attention_heads)
        np.testing.assert_allclose(np.asarray(logits), ref[step][0],
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(hidden), ref[step][1],
                                   atol=2e-4)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    _tree_allclose(scache, cache_ref, atol=2e-4)


def test_tp_llama_step_matches_unsharded():
    cfg = _dec_cfg(model_type="llama", kv_heads=2)
    params = init_llama(jax.random.PRNGKey(0), cfg)
    b = 4
    tok = jnp.full((b,), 5, jnp.int32)

    cache = init_llama_kv_cache(cfg, b)
    ref = []
    for _ in range(3):
        logits, hidden, cache = llama_step(
            params, tok, cache, heads=cfg.attention_heads,
            kv_heads=cfg.kv_heads, theta=cfg.rope_theta)
        ref.append((np.asarray(logits), np.asarray(hidden)))
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    mesh = _mesh()
    sp = shard_llama_params(params, mesh, kv_heads=cfg.kv_heads)
    scache = shard_kv_cache(init_llama_kv_cache(cfg, b), mesh)
    tok = jnp.full((b,), 5, jnp.int32)
    for step in range(3):
        logits, hidden, scache = llama_step(
            sp, tok, scache, heads=cfg.attention_heads,
            kv_heads=cfg.kv_heads, theta=cfg.rope_theta)
        np.testing.assert_allclose(np.asarray(logits), ref[step][0],
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(hidden), ref[step][1],
                                   atol=2e-4)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)


def test_tp_gqa_kv_cache_replicates_odd_heads():
    # kv_heads=1 doesn't divide tp=2 → the cache helper must fall back to
    # replicated heads instead of requesting an uneven GSPMD tile
    cfg = _dec_cfg(model_type="llama", kv_heads=1)
    mesh = _mesh()
    scache = shard_kv_cache(init_llama_kv_cache(cfg, 4), mesh)
    spec = scache.k.sharding.spec
    assert spec[3] is None


def test_tp_gqa_kv_proj_replicates_odd_heads():
    # kv_heads=1 with a tp-divisible head_dim: the flattened wk/wv output
    # dim IS divisible by tp, but column-sharding it would split the single
    # KV head's projection mid-head — the placement must mirror
    # shard_kv_cache and replicate (ADVICE r3)
    cfg = _dec_cfg(model_type="llama", kv_heads=1)
    params = init_llama(jax.random.PRNGKey(0), cfg)
    mesh = _mesh()
    sp = shard_llama_params(params, mesh, kv_heads=cfg.kv_heads)
    for w in ("wk", "wv"):
        assert sp["layers"][w].sharding.spec[-1] is None, w
    # q heads divide tp → wq stays column-sharded
    assert sp["layers"]["wq"].sharding.spec[-1] == "tp"
    # unknown kv_heads + differing widths (GQA detected) also replicates
    sp2 = shard_llama_params(params, mesh)
    assert sp2["layers"]["wk"].sharding.spec[-1] is None


def test_tp_ralm_decoder_multistep_on_mesh():
    from chamjax.retrieval.interface import DummyRetriever
    from chamjax.serving.ralm import RalmDecoder

    cfg = _dec_cfg(retrieval_interval=2, k=4)
    params = init_decoder(jax.random.PRNGKey(0), cfg)

    def run(p, mesh=None):
        dec = RalmDecoder(p, cfg, DummyRetriever(), batch_size=4,
                          retrieval_interval=2, k=4)
        if mesh is not None:
            dec.cache = shard_kv_cache(dec.cache, mesh)
        dec.batch_inference(num_step=6)
        return np.asarray(dec.tokens)

    toks_ref = run(params)
    mesh = _mesh()
    toks_tp = run(shard_decoder_params(params, mesh), mesh)
    np.testing.assert_array_equal(toks_ref, toks_tp)
