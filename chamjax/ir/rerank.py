"""Reranking stage: late-interaction MaxSim (ColBERT-style) + cross-encoder.

Parity with the reference's rerank surface:
- ``beir/beir/reranking/rerank.py`` + ``models/`` (CrossEncoder, MonoT5),
- the ColBERTv2 rerank step in the advanced-RAG demo
  (``reranker_hf/advanced_rag.py:210-212, 244-249`` via RAGatouille).

The TPU-native reranker is **MaxSim late interaction**: queries and docs
encode to per-token vectors; score = sum over query tokens of the max
similarity to any doc token.  On TPU that's one batched einsum + max + sum —
MXU-shaped, no per-pair cross-attention.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def maxsim_scores(q_tok: jax.Array, d_tok: jax.Array, d_mask: jax.Array
                  ) -> jax.Array:
    """q_tok (nq_tok, dim); d_tok (n_docs, nd_tok, dim); d_mask (n_docs,
    nd_tok).  Returns (n_docs,) MaxSim scores."""
    sim = jnp.einsum("td,nsd->nts", q_tok, d_tok,
                     precision=jax.lax.Precision.HIGHEST)
    sim = jnp.where(d_mask[:, None, :] > 0, sim, -jnp.inf)
    per_q_tok = jnp.max(sim, axis=-1)                    # (n_docs, nq_tok)
    per_q_tok = jnp.where(jnp.isfinite(per_q_tok), per_q_tok, 0.0)
    return jnp.sum(per_q_tok, axis=-1)


class MaxSimReranker:
    """Late-interaction reranker over a token-level encoder.

    ``token_encoder`` must expose ``encode_tokens(texts) ->
    (tok_emb (n, max_tok, dim) float32, mask (n, max_tok))``.  The default
    hashing token encoder makes the stage hermetic; plug an HF checkpoint
    for real quality.
    """

    def __init__(self, token_encoder=None, max_tokens: int = 64,
                 dim: int = 128):
        self.enc = token_encoder or HashingTokenEncoder(dim=dim,
                                                        max_tokens=max_tokens)

    def rerank(self, corpus: Dict[str, Dict[str, str]],
               queries: Dict[str, str],
               results: Dict[str, Dict[str, float]], top_k: int
               ) -> Dict[str, Dict[str, float]]:
        out: Dict[str, Dict[str, float]] = {}
        for qid, doc_scores in results.items():
            cand = sorted(doc_scores, key=doc_scores.get, reverse=True)
            if not cand:
                out[qid] = {}
                continue
            q_tok, q_mask = self.enc.encode_tokens([queries[qid]])
            d_texts = [(corpus[d].get("title", "") + " "
                        + corpus[d].get("text", "")).strip() for d in cand]
            d_tok, d_mask = self.enc.encode_tokens(d_texts)
            scores = np.asarray(maxsim_scores(
                jnp.asarray(q_tok[0] * q_mask[0][:, None], jnp.float32),
                jnp.asarray(d_tok, jnp.float32),
                jnp.asarray(d_mask, jnp.float32)))
            order = np.argsort(-scores)[:top_k]
            out[qid] = {cand[int(i)]: float(scores[int(i)]) for i in order}
        return out


class Rerank:
    """Two-stage retrieve→rerank wrapper (reference
    ``beir/beir/reranking/rerank.py``): takes first-stage results, scores
    (query, doc) pairs with a cross-encoder-style scorer, returns re-scored
    top-k.  ``cross_encoder`` must expose ``predict(pairs) -> scores``."""

    def __init__(self, cross_encoder, batch_size: int = 128):
        self.model = cross_encoder
        self.batch_size = batch_size

    def rerank(self, corpus, queries, results, top_k: int
               ) -> Dict[str, Dict[str, float]]:
        out: Dict[str, Dict[str, float]] = {}
        for qid, doc_scores in results.items():
            cand = sorted(doc_scores, key=doc_scores.get, reverse=True)
            pairs = [(queries[qid],
                      (corpus[d].get("title", "") + " "
                       + corpus[d].get("text", "")).strip()) for d in cand]
            scores = []
            for i in range(0, len(pairs), self.batch_size):
                scores.extend(self.model.predict(pairs[i:i + self.batch_size]))
            order = np.argsort(-np.asarray(scores))[:top_k]
            out[qid] = {cand[int(i)]: float(scores[int(i)]) for i in order}
        return out


class HashingTokenEncoder:
    """Per-token hashing embeddings (hermetic ColBERT stand-in)."""

    def __init__(self, dim: int = 128, max_tokens: int = 64):
        self.dim = dim
        self.max_tokens = max_tokens
        self._cache: Dict[str, np.ndarray] = {}

    def _tok_vec(self, tok: str) -> np.ndarray:
        v = self._cache.get(tok)
        if v is None:
            import zlib
            seed = zlib.crc32(tok.encode()) & 0x7FFFFFFF
            v = np.random.default_rng(seed).standard_normal(self.dim)
            v /= np.linalg.norm(v) + 1e-9
            self._cache[tok] = v.astype(np.float32)
        return self._cache[tok]

    def encode_tokens(self, texts: List[str]):
        n = len(texts)
        emb = np.zeros((n, self.max_tokens, self.dim), np.float32)
        mask = np.zeros((n, self.max_tokens), np.float32)
        for i, t in enumerate(texts):
            toks = t.lower().split()[: self.max_tokens]
            for j, tok in enumerate(toks):
                emb[i, j] = self._tok_vec(tok)
                mask[i, j] = 1.0
        return emb, mask


class HFCrossEncoder:
    """Cross-encoder scorer over a HuggingFace sequence-classification
    checkpoint (the reference's ``beir/beir/reranking/models/cross_encoder``
    — e.g. ms-marco MiniLM).  Optional heavyweight path: needs
    transformers+torch and downloads weights; plugs into ``Rerank``."""

    def __init__(self, model_name: str =
                 "cross-encoder/ms-marco-MiniLM-L-6-v2",
                 device: str = "cpu", max_length: int = 256):
        from transformers import (                     # gated import
            AutoModelForSequenceClassification, AutoTokenizer,
        )
        self.tok = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModelForSequenceClassification.from_pretrained(
            model_name).to(device).eval()
        self.device = device
        self.max_length = max_length

    def predict(self, pairs, batch_size: int = 32):
        import torch
        out = []
        with torch.no_grad():
            for i in range(0, len(pairs), batch_size):
                batch = pairs[i:i + batch_size]
                enc = self.tok([p[0] for p in batch], [p[1] for p in batch],
                               padding=True, truncation=True,
                               max_length=self.max_length,
                               return_tensors="pt").to(self.device)
                logits = self.model(**enc).logits
                score = logits[:, 0] if logits.shape[-1] == 1 else \
                    torch.softmax(logits, dim=-1)[:, -1]
                out.extend(score.cpu().numpy().tolist())
        return out


class Seq2SeqReranker:
    """MonoT5-style pointwise seq2seq reranker on the chamjax enc-dec.

    Parity target: ``beir/beir/reranking/models/mono_t5.py`` — score a
    (query, doc) pair as the "true"-vs-"false" first-token log-odds of a
    seq2seq model fed "Query: q Document: d Relevant:".  Here the model is
    the TPU-native encoder-decoder from ``chamjax.models`` (hash-tokenized,
    random weights → hermetic and deterministic; load trained weights into
    the same pytree for real quality).  Exposes the ``predict(pairs)``
    contract, so it plugs into ``Rerank`` interchangeably with
    ``HFCrossEncoder``.
    """

    TRUE_TOK, FALSE_TOK = 2, 3
    BOS = 1

    def __init__(self, cfg=None, seed: int = 0, max_len: int = 64):
        from chamjax.config import ModelConfig
        from chamjax.models import init_encoder_decoder
        self.cfg = cfg or ModelConfig(
            model_type="encoder-decoder", embed_dim=128, ffn_embed_dim=256,
            layers=2, attention_heads=4, encoder_layers=2, vocab_size=4096,
            max_seq_len=max_len, dtype="float32")
        self.max_len = min(max_len, self.cfg.max_seq_len)
        self.enc_params, self.dec_params = init_encoder_decoder(
            jax.random.PRNGKey(seed), self.cfg)

    def _tokens(self, texts) -> np.ndarray:
        import zlib
        out = np.zeros((len(texts), self.max_len), np.int32)
        for i, t in enumerate(texts):
            toks = t.lower().split()[: self.max_len]
            for j, tok in enumerate(toks):
                out[i, j] = 4 + (zlib.crc32(tok.encode()) %
                                 (self.cfg.vocab_size - 4))
        return out

    def predict(self, pairs, batch_size: int = 64):
        from chamjax.models import encoder_forward, decoder_step
        from chamjax.models.transformer import build_cross_kv, init_kv_cache
        scores = []
        for i in range(0, len(pairs), batch_size):
            batch = pairs[i:i + batch_size]
            texts = [f"query: {q} document: {d} relevant:"
                     for q, d in batch]
            toks = jnp.asarray(self._tokens(texts))
            valid = jnp.asarray(
                (np.asarray(toks) != 0).sum(axis=1), jnp.int32)
            enc_out = encoder_forward(self.enc_params, toks,
                                      self.cfg.attention_heads,
                                      valid_len=valid)
            ck, cv = build_cross_kv(self.dec_params, enc_out,
                                    self.cfg.attention_heads)
            cache = init_kv_cache(self.cfg, len(batch), max_len=2)
            logits, _, _ = decoder_step(
                self.dec_params,
                jnp.full((len(batch),), self.BOS, jnp.int32), cache,
                self.cfg.attention_heads, cross_kv=(ck, cv),
                cross_valid_len=valid)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            s = lp[:, self.TRUE_TOK] - lp[:, self.FALSE_TOK]
            scores.extend(np.asarray(s).tolist())
        return scores
