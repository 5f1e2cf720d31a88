"""Training-side utilities for dense retrievers: losses + query generation.

Parity with the reference BEIR fork's training surface
(``beir/beir/losses/`` — MultipleNegativesRankingLoss, MarginMSELoss, BPR
losses — and ``beir/beir/generation/`` QGen): the losses are pure JAX
functions usable in any optax training loop over a dual encoder; query
generation wraps a HF seq2seq model (gated import, needs weights).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def cos_sim(a: jax.Array, b: jax.Array) -> jax.Array:
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-9)
    b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-9)
    return jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)


def multiple_negatives_ranking_loss(
    q_emb: jax.Array,        # (b, d) query embeddings
    pos_emb: jax.Array,      # (b, d) positive doc embeddings
    scale: float = 20.0,
) -> jax.Array:
    """In-batch negatives InfoNCE (reference
    ``losses/MultipleNegativesRankingLoss``): row i's positive is column i;
    every other column is a negative."""
    scores = cos_sim(q_emb, pos_emb) * scale        # (b, b)
    labels = jnp.arange(scores.shape[0])
    logp = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(logp[labels, labels])


def margin_mse_loss(
    q_emb: jax.Array,        # (b, d)
    pos_emb: jax.Array,      # (b, d)
    neg_emb: jax.Array,      # (b, d)
    teacher_margin: jax.Array,   # (b,) teacher score(pos) - score(neg)
) -> jax.Array:
    """Distillation loss (reference ``losses/MarginMSELoss``): student's
    dot-product margin regresses the cross-encoder teacher's margin."""
    s_pos = jnp.sum(q_emb * pos_emb, axis=-1)
    s_neg = jnp.sum(q_emb * neg_emb, axis=-1)
    return jnp.mean((s_pos - s_neg - teacher_margin) ** 2)


def bpr_loss(
    q_emb: jax.Array, pos_emb: jax.Array, neg_emb: jax.Array
) -> jax.Array:
    """Bayesian personalized ranking (reference BPR models): -log sigmoid of
    the positive-negative margin."""
    margin = (jnp.sum(q_emb * pos_emb, axis=-1)
              - jnp.sum(q_emb * neg_emb, axis=-1))
    return -jnp.mean(jax.nn.log_sigmoid(margin))


class QueryGenerator:
    """Synthetic-query generation over a corpus (reference ``generation/``
    QGen, docT5query-style).  Needs a seq2seq checkpoint — gated import."""

    def __init__(self, model_name: str = "BeIR/query-gen-msmarco-t5-base-v1",
                 device: str = "cpu"):
        from transformers import AutoModelForSeq2SeqLM, AutoTokenizer
        self.tok = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModelForSeq2SeqLM.from_pretrained(model_name
                                                           ).to(device)
        self.device = device

    def generate(self, texts: List[str], queries_per_doc: int = 3,
                 max_length: int = 64,
                 top_p: float = 0.95) -> List[List[str]]:
        import torch
        out: List[List[str]] = []
        with torch.no_grad():
            for t in texts:
                enc = self.tok(t, truncation=True, max_length=512,
                               return_tensors="pt").to(self.device)
                gen = self.model.generate(
                    **enc, do_sample=True, top_p=top_p,
                    max_length=max_length,
                    num_return_sequences=queries_per_doc)
                out.append([self.tok.decode(g, skip_special_tokens=True)
                            for g in gen])
        return out
