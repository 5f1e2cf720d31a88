"""Llama-family model tests: step/prefill equivalence (with rotary + GQA),
cache discipline, and the RALM serving loop running the family end-to-end.
Reference scaffold being completed: ``ralm/ralm/ralm.py:433-618``."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chamjax.config import MODEL_PRESETS, ModelConfig
from chamjax.models import (
    init_llama, init_llama_kv_cache, llama_prefill, llama_step,
)

CFG = ModelConfig(model_type="llama", embed_dim=64, ffn_embed_dim=160,
                  layers=3, attention_heads=4, kv_heads=2, vocab_size=97,
                  max_seq_len=16, dtype="float32")


@pytest.fixture(scope="module")
def params():
    return init_llama(jax.random.PRNGKey(0), CFG)


def test_prefill_step_consistency(params):
    """Incremental decode (pre-rotated cached K, GQA) must reproduce the
    full causal forward exactly."""
    b, t = 2, 8
    toks = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, CFG.vocab_size)
    cache = init_llama_kv_cache(CFG, b)
    logits_full, hidden_full, _ = llama_prefill(
        params, toks, cache, CFG.attention_heads, CFG.kv_heads)

    cache = init_llama_kv_cache(CFG, b)
    outs = []
    for i in range(t):
        lg, hid, cache = llama_step(params, toks[:, i], cache,
                                    CFG.attention_heads, CFG.kv_heads)
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(
        np.stack(outs, 1), np.asarray(logits_full), rtol=2e-4, atol=2e-4)
    assert int(cache.idx) == t


def test_gqa_cache_is_kv_heads_sized(params):
    cache = init_llama_kv_cache(CFG, batch=3)
    assert cache.k.shape == (CFG.layers, 3, CFG.max_seq_len, CFG.kv_heads,
                             CFG.embed_dim // CFG.attention_heads)


def test_mha_equals_gqa_when_groups_is_one():
    """kv_heads == heads degenerates to plain MHA (same code path)."""
    cfg = ModelConfig(model_type="llama", embed_dim=32, ffn_embed_dim=64,
                      layers=2, attention_heads=4, kv_heads=4, vocab_size=31,
                      max_seq_len=8, dtype="float32")
    p = init_llama(jax.random.PRNGKey(3), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(4), (2, 5), 0, 31)
    lg1, _, _ = llama_prefill(p, toks, init_llama_kv_cache(cfg, 2),
                              cfg.attention_heads, cfg.kv_heads)
    lg2, _, _ = llama_prefill(p, toks, init_llama_kv_cache(cfg, 2),
                              cfg.attention_heads, 0)    # 0 → MHA default
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                               rtol=1e-6, atol=1e-6)


def test_rope_is_norm_preserving_rotation():
    """Rotary must be the identity at position 0, preserve vector norms at
    every position, and make q·k depend only on relative offset."""
    from chamjax.models.llama import _rope, _rope_tables
    hd = 8
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 2, hd))
    cos, sin = _rope_tables(jnp.arange(5), hd, 10000.0)
    cos, sin = cos[None, :, None, :], sin[None, :, None, :]
    y = _rope(x, cos, sin)
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(x[:, 0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5, atol=1e-5)
    # relative-position property: <R_i q, R_j k> == <R_{i+s} q, R_{j+s} k>
    q = jax.random.normal(jax.random.PRNGKey(3), (hd,))
    k = jax.random.normal(jax.random.PRNGKey(4), (hd,))

    def rot(v, pos):
        c, s = _rope_tables(jnp.asarray([pos]), hd, 10000.0)
        return _rope(v[None, None, None, :], c[None, :, None, :],
                     s[None, :, None, :])[0, 0, 0]
    d1 = float(jnp.dot(rot(q, 3), rot(k, 1)))
    d2 = float(jnp.dot(rot(q, 9), rot(k, 7)))
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-5)


def test_llama_presets_exist():
    for name in ("Llama-S", "Llama-L", "Llama-7B"):
        cfg = MODEL_PRESETS[name]
        assert cfg.model_type == "llama"
        assert cfg.attention_heads % (cfg.kv_heads or cfg.attention_heads) == 0


def test_ralm_loop_runs_llama_family():
    from chamjax.retrieval.interface import DummyRetriever
    from chamjax.serving.ralm import RalmDecoder
    cfg = ModelConfig(model_type="llama", embed_dim=64, ffn_embed_dim=160,
                      layers=2, attention_heads=4, kv_heads=2, vocab_size=97,
                      max_seq_len=16, dtype="float32", retrieval_interval=4)
    params = init_llama(jax.random.PRNGKey(5), cfg)
    ralm = RalmDecoder(params, cfg, DummyRetriever(), batch_size=2)
    ralm.batch_inference(num_step=8)
    assert ralm.step_count == 8
    prof = ralm.get_profiling()
    assert len(prof["time_model"]) == 8
    assert ralm.throughput_tokens_per_sec(8) > 0
