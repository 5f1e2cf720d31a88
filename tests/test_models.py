"""Transformer unit tests: prefill/step consistency is the core invariant
(the KV cache must make incremental decoding exactly equal full forward)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chamjax.config import ModelConfig
from chamjax.models import (
    init_decoder, init_encoder_decoder, init_kv_cache,
    decoder_prefill, decoder_step, encoder_forward,
)
from chamjax.models.transformer import build_cross_kv

CFG = ModelConfig(model_type="decoder", embed_dim=64, ffn_embed_dim=128,
                  layers=3, attention_heads=4, vocab_size=97, max_seq_len=16,
                  dtype="float32")


@pytest.fixture(scope="module")
def dec_params():
    return init_decoder(jax.random.PRNGKey(0), CFG)


def test_prefill_step_consistency(dec_params):
    """Incremental decoding must reproduce the full causal forward."""
    b, t = 2, 8
    toks = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, CFG.vocab_size)
    cache = init_kv_cache(CFG, b)
    logits_full, hidden_full, _ = decoder_prefill(
        dec_params, toks, cache, CFG.attention_heads)

    cache = init_kv_cache(CFG, b)
    step_logits = []
    for i in range(t):
        lg, hid, cache = decoder_step(dec_params, toks[:, i], cache,
                                      CFG.attention_heads)
        step_logits.append(np.asarray(lg))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(logits_full),
                               rtol=2e-4, atol=2e-4)
    assert int(cache.idx) == t


def test_step_shapes_and_cache_growth(dec_params):
    b = 4
    cache = init_kv_cache(CFG, b)
    toks = jnp.zeros((b,), jnp.int32)
    lg, hid, cache = decoder_step(dec_params, toks, cache, CFG.attention_heads)
    assert lg.shape == (b, CFG.vocab_size)
    assert hid.shape == (b, CFG.embed_dim)
    assert int(cache.idx) == 1
    # cached K row 0 must be non-zero, row 1 still zero
    assert float(jnp.abs(cache.k[:, :, 0]).sum()) > 0
    assert float(jnp.abs(cache.k[:, :, 1]).sum()) == 0


def test_encoder_decoder_cross_attention():
    cfg = ModelConfig(model_type="encoder-decoder", embed_dim=64,
                      ffn_embed_dim=128, layers=2, attention_heads=4,
                      encoder_layers=2, vocab_size=97, max_seq_len=16,
                      dtype="float32")
    enc, dec = init_encoder_decoder(jax.random.PRNGKey(2), cfg)
    b, s = 2, 6
    src = jax.random.randint(jax.random.PRNGKey(3), (b, s), 0, cfg.vocab_size)
    enc_out = encoder_forward(enc, src, cfg.attention_heads)
    assert enc_out.shape == (b, s, cfg.embed_dim)
    ckv = build_cross_kv(dec, enc_out, cfg.attention_heads)
    cache = init_kv_cache(cfg, b)
    lg, hid, cache = decoder_step(dec, jnp.zeros((b,), jnp.int32), cache,
                                  cfg.attention_heads, cross_kv=ckv)
    assert lg.shape == (b, cfg.vocab_size)
    # changing the encoder input must change decoder logits (cross-attn live)
    src2 = src.at[:, 0].set((src[:, 0] + 1) % cfg.vocab_size)
    enc_out2 = encoder_forward(enc, src2, cfg.attention_heads)
    ckv2 = build_cross_kv(dec, enc_out2, cfg.attention_heads)
    lg2, _, _ = decoder_step(dec, jnp.zeros((b,), jnp.int32),
                             init_kv_cache(cfg, b),
                             cfg.attention_heads, cross_kv=ckv2)
    assert not np.allclose(np.asarray(lg), np.asarray(lg2))


def test_encoder_padding_mask():
    cfg = ModelConfig(embed_dim=64, ffn_embed_dim=128, layers=2,
                      attention_heads=4, encoder_layers=2, vocab_size=97,
                      max_seq_len=16, dtype="float32")
    enc, dec = init_encoder_decoder(jax.random.PRNGKey(4), cfg)
    b, s = 2, 8
    src = jax.random.randint(jax.random.PRNGKey(5), (b, s), 1, cfg.vocab_size)
    valid = jnp.array([5, 8], jnp.int32)
    out = encoder_forward(enc, src, cfg.attention_heads, valid_len=valid)
    # tokens beyond valid_len must not influence valid positions
    src_tail = src.at[0, 6].set((src[0, 6] + 3) % cfg.vocab_size)
    out2 = encoder_forward(enc, src_tail, cfg.attention_heads, valid_len=valid)
    np.testing.assert_allclose(np.asarray(out[0, :5]), np.asarray(out2[0, :5]),
                               rtol=1e-5, atol=1e-5)
