"""Trainable JAX encoder models for the IR harness.

The reference ships a zoo of pretrained encoder families
(``beir/beir/retrieval/models/__init__.py``: SBERT, DPR dual encoders,
SPLADE/UniCOIL learned-sparse, BPR, TLDR).  This environment has no
weight downloads, so the zoo's *trainable* members are rebuilt as compact
JAX models over a hashed vocabulary, trained with the loss surface of
``chamjax/ir/train.py`` (the JAX twins of ``beir/beir/losses/``):

- ``JaxDualEncoder``   — DPR-style two-tower dense encoder (shared hashed
  embedding, per-tower MLP heads, L2-normalized outputs), trained with
  in-batch-negatives InfoNCE (``multiple_negatives_ranking_loss``).
  Duck-types ``encode_queries``/``encode_corpus`` for
  ``DenseRetrievalExactSearch`` exactly like the reference's
  ``models.SentenceBERT``.
- ``JaxSparseEncoder`` — SPLADE-style learned-sparse encoder
  (``log1p(relu(E @ head))`` with max-pooling over positions), trained
  with the same InfoNCE over sparse dot products plus SPLADE's FLOPS
  regularizer; emits weighted bucket dicts for ``SparseSearch``.

Both train in seconds on CPU for test-scale corpora and scale to the MXU
unchanged (the train step is one jitted program).
"""

from __future__ import annotations

import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chamjax.ir.train import multiple_negatives_ranking_loss


def _hash_token(tok: str, vocab: int) -> int:
    return zlib.crc32(tok.encode()) % vocab


def tokenize_ids(text: str, vocab: int, max_len: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Whitespace-lowercase tokens → (ids (max_len,), mask (max_len,))."""
    toks = text.lower().split()[:max_len]
    ids = np.zeros(max_len, np.int32)
    mask = np.zeros(max_len, np.float32)
    for i, t in enumerate(toks):
        ids[i] = _hash_token(t, vocab)
        mask[i] = 1.0
    return ids, mask


def _batch_ids(texts: Sequence[str], vocab: int, max_len: int):
    ids = np.zeros((len(texts), max_len), np.int32)
    mask = np.zeros((len(texts), max_len), np.float32)
    for i, t in enumerate(texts):
        ids[i], mask[i] = tokenize_ids(t, vocab, max_len)
    return jnp.asarray(ids), jnp.asarray(mask)


def _doc_text(d) -> str:
    if isinstance(d, dict):
        return (d.get("title", "") + " " + d.get("text", "")).strip()
    return str(d)


def training_pairs(queries: Dict[str, str], qrels: Dict[str, Dict[str, int]],
                   corpus: Dict[str, Dict[str, str]],
                   min_score: int = 0,
                   ) -> List[Tuple[str, str]]:
    """(query text, positive doc text) pairs from BEIR-format qrels — the
    input shape of the reference's ``TrainRetriever`` dataloader.

    ``min_score``: with graded qrels, train on positives of at least this
    grade.  0 keeps every judged-positive doc (binary datasets); on
    graded corpora pass the top grade — InfoNCE pulls every "positive"
    onto the query, so grade-1 (topically related) positives teach the
    encoder topic-level geometry and dilute the fine-grained ranking the
    top grades define (MS-MARCO practice: train on THE relevant passage,
    not the related pool)."""
    pairs = []
    for qid, rel in qrels.items():
        if qid not in queries:
            continue
        for did, score in rel.items():
            # min_score=0 keeps every judged-POSITIVE doc (score > 0,
            # fractional grades included); min_score>0 is an inclusive
            # grade floor
            keep = score > 0 if min_score <= 0 else score >= min_score
            if keep and did in corpus:
                pairs.append((queries[qid], _doc_text(corpus[did])))
    return pairs


class JaxDualEncoder:
    """DPR-style dual encoder: shared hashed embedding, two MLP towers.

    Reference anchor: ``beir/beir/retrieval/models/sentence_bert.py`` (the
    duck-typed surface) + ``models/dpr.py`` (the two-tower structure);
    trained like ``beir/examples/retrieval/training/train_sbert.py`` but
    with the JAX loss (``ir/train.py``)."""

    def __init__(self, vocab: int = 8192, dim: int = 128,
                 emb_dim: int = 64, max_len: int = 32, seed: int = 0,
                 shared_towers: bool = False):
        self.vocab = vocab
        self.dim = dim
        self.max_len = max_len
        self.shared = shared_towers
        k = jax.random.PRNGKey(seed)
        ke, k1, k2 = jax.random.split(k, 3)

        def tower(key):
            ka, kb = jax.random.split(key)
            return {
                "w1": jax.random.normal(ka, (emb_dim, dim), jnp.float32)
                * emb_dim ** -0.5,
                "b1": jnp.zeros((dim,), jnp.float32),
                "w2": jax.random.normal(kb, (dim, dim), jnp.float32)
                * dim ** -0.5,
                "b2": jnp.zeros((dim,), jnp.float32),
            }

        self.params = {
            "embed": jax.random.normal(ke, (vocab, emb_dim), jnp.float32)
            * emb_dim ** -0.5,
            "q": tower(k1),
            "d": tower(k1 if shared_towers else k2),
        }

    @staticmethod
    def _encode(params, tower, ids, mask):
        e = params["embed"][ids]                       # (b, L, emb)
        denom = jnp.sum(mask, axis=1, keepdims=True) + 1e-9
        pooled = jnp.sum(e * mask[..., None], axis=1) / denom
        t = params[tower]
        h = jax.nn.gelu(pooled @ t["w1"] + t["b1"])
        out = h @ t["w2"] + t["b2"]
        return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-9)

    def fit(self, pairs: Sequence[Tuple[str, str]], *, steps: int = 200,
            batch: int = 32, lr: float = 3e-3, seed: int = 0,
            scale: float = 20.0, verbose: bool = False,
            neg_tokens=None, neg_idx: Optional[np.ndarray] = None,
            ) -> List[float]:
        """Train with in-batch-negatives InfoNCE; returns the loss curve.

        ``neg_tokens=(ids (n_docs,L), mask (n_docs,L))`` +
        ``neg_idx (n_pairs, H)`` appends H *mined hard negatives* per pair
        to the candidate pool: the InfoNCE denominator becomes the B
        in-batch positives plus the batch's B·H mined docs (MS-MARCO hard-
        negative practice, ``beir/examples/.../train_sbert_hard_negatives``
        lineage).  Negative token arrays are indexed per minibatch on the
        host — the corpus is tokenized ONCE, not per pair."""
        import optax

        q_ids, q_mask = _batch_ids([p[0] for p in pairs], self.vocab,
                                   self.max_len)
        d_ids, d_mask = _batch_ids([p[1] for p in pairs], self.vocab,
                                   self.max_len)
        n = len(pairs)
        batch = min(batch, n)
        opt = optax.adam(lr)
        opt_state = opt.init(self.params)

        # pair arrays stay HOST numpy and each minibatch is sliced on the
        # host and passed as a jit ARGUMENT: closing over the full
        # tokenized pair set captures it as a compiled constant (measured
        # 3.8 GB of captured constants at 7M pairs — and this
        # environment's remote compile service rejects ~100 MB bodies)
        q_ids, q_mask = np.asarray(q_ids), np.asarray(q_mask)
        d_ids, d_mask = np.asarray(d_ids), np.asarray(d_mask)
        if neg_idx is not None:
            nt_ids, nt_mask = (np.asarray(neg_tokens[0]),
                               np.asarray(neg_tokens[1]))
            neg_idx = np.asarray(neg_idx, np.int64)
            H = neg_idx.shape[1]

        @jax.jit
        def step(params, opt_state, q_i, q_m, d_i, d_m):
            def loss_fn(p):
                qe = self._encode(p, "q", q_i, q_m)
                de = self._encode(p, "d", d_i, d_m)
                return multiple_negatives_ranking_loss(qe, de, scale=scale)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def step_hard(params, opt_state, q_i, q_m, d_i, d_m, n_i, n_m):
            def loss_fn(p):
                qe = self._encode(p, "q", q_i, q_m)       # (B, dim)
                de = self._encode(p, "d", d_i, d_m)       # (B, dim)
                ne = self._encode(p, "d", n_i, n_m)       # (B*H, dim)
                cand = jnp.concatenate([de, ne], axis=0)  # (B+B*H, dim)
                scores = scale * qe @ cand.T
                labels = jnp.arange(scores.shape[0])
                logp = jax.nn.log_softmax(scores, axis=-1)
                return -jnp.mean(logp[labels, labels])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        rng = np.random.default_rng(seed)
        curve = []
        for i in range(steps):
            sel = rng.choice(n, size=batch, replace=batch > n // 2)
            if neg_idx is not None:
                ni = neg_idx[sel].reshape(-1)             # (B*H,)
                self.params, opt_state, loss = step_hard(
                    self.params, opt_state, q_ids[sel], q_mask[sel],
                    d_ids[sel], d_mask[sel], nt_ids[ni], nt_mask[ni])
            else:
                self.params, opt_state, loss = step(
                    self.params, opt_state, q_ids[sel], q_mask[sel],
                    d_ids[sel], d_mask[sel])
            curve.append(float(loss))
            if verbose and i % 50 == 0:
                print(f"  dual-encoder step {i}: loss {curve[-1]:.4f}")
        return curve

    def mine_hard_negatives(self, queries: Sequence[str],
                            doc_tokens, *, positives: Sequence[set],
                            n_neg: int = 4, depth: int = 32,
                            use_ivfpq: bool = True,
                            encode_batch: int = 8192,
                            seed: int = 0) -> np.ndarray:
        """Top-ranked non-judged docs per query under the CURRENT model —
        mined with the repo's own IVF-PQ engine (the reference pipeline
        mines hard negatives with its retriever between epochs).

        ``doc_tokens=(ids (n_docs,L), mask)`` is the once-tokenized
        corpus; ``positives[i]`` is the set of judged doc indices for
        ``queries[i]`` (excluded — judged docs of ANY grade are not
        negatives).  Returns ``(n_queries, n_neg) int64`` doc indices."""
        nd = doc_tokens[0].shape[0]
        demb = np.empty((nd, int(self.params["d"]["w2"].shape[1])),
                        np.float32)
        for s in range(0, nd, encode_batch):
            e = self._encode(self.params, "d",
                             jnp.asarray(doc_tokens[0][s:s + encode_batch]),
                             jnp.asarray(doc_tokens[1][s:s + encode_batch]))
            demb[s:s + encode_batch] = np.asarray(e)
        qemb = self._embed_texts(list(queries), "q")

        if use_ivfpq and nd >= 4096 and jax.default_backend() == "tpu":
            # the repo's own ANN engine — TPU only: on any other backend
            # the seg kernel runs INTERPRETED (searcher.py:188) and 1.5k
            # queries over a 100k-doc index take ~30 min instead of ~1 s
            from chamjax.config import IndexConfig, SearchConfig
            from chamjax.index import build_ivfpq
            from chamjax.searcher import IVFSearcher
            d = demb.shape[1]
            cfg = IndexConfig(dim=d, nlist=max(16, min(1024, nd // 64)),
                              m=max(4, d // 16))
            idx = build_ivfpq(demb, cfg, kmeans_iters=6, pq_iters=6)
            s = IVFSearcher(idx, SearchConfig(
                nprobe=min(32, cfg.nlist), k=depth + 16))
            _dd, ii = s.search(qemb)
            ranked = np.asarray(ii, np.int64)
        else:           # exact (cosine — embeddings are L2-normalized)
            scores = qemb @ demb.T
            top = min(depth + 16, nd)
            part = np.argpartition(-scores, top - 1, axis=1)[:, :top]
            order = np.argsort(
                -np.take_along_axis(scores, part, axis=1), axis=1)
            ranked = np.take_along_axis(part, order, axis=1)

        rng = np.random.default_rng(seed)
        out = np.zeros((len(queries), n_neg), np.int64)
        for qi in range(len(queries)):
            cand = [d_ for d_ in ranked[qi][:depth]
                    if d_ >= 0 and d_ not in positives[qi]]
            if len(cand) < n_neg:      # pad with random non-judged docs
                pool = rng.integers(0, nd, size=4 * n_neg)
                cand += [int(d_) for d_ in pool
                         if d_ not in positives[qi]][: n_neg - len(cand)]
            out[qi] = np.asarray(cand[:n_neg], np.int64)
        return out

    # --- DenseRetrievalExactSearch duck-typed surface ---

    def _embed_texts(self, texts: List[str], tower: str) -> np.ndarray:
        ids, mask = _batch_ids(texts, self.vocab, self.max_len)
        return np.asarray(self._encode(self.params, tower, ids, mask))

    def encode_queries(self, texts: List[str], batch_size: int = 0,
                       **kw) -> np.ndarray:
        return self._embed_texts(list(texts), "q")

    def encode_corpus(self, docs, batch_size: int = 0, **kw) -> np.ndarray:
        return self._embed_texts([_doc_text(d) for d in docs], "d")


class DualEncoderTokenAdapter:
    """Token-level view of a trained :class:`JaxDualEncoder` for the
    late-interaction reranker (``rerank.MaxSimReranker``).

    The dual encoder's shared hashed embedding table is where surface-form
    associations are learned (both towers read it); exposing normalized
    per-token rows of that table gives MaxSim a *trained* token space —
    fine-grained concept matching that the pooled sentence vector blurs,
    and that the hermetic hashing token encoder (pure lexical) cannot
    provide.  Reference analogue: ColBERT reranking over a trained
    checkpoint (``beir/beir/reranking/models``)."""

    def __init__(self, dual: "JaxDualEncoder", max_tokens: int = 48):
        self.dual = dual
        self.max_tokens = max_tokens

    def encode_tokens(self, texts: Sequence[str]):
        ids, mask = _batch_ids(list(texts), self.dual.vocab,
                               self.max_tokens)
        e = self.dual.params["embed"][ids]               # (n, L, emb)
        e = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-9)
        return np.asarray(e, np.float32), np.asarray(mask, np.float32)


class JaxSparseEncoder:
    """SPLADE-style trainable learned-sparse encoder.

    Reference anchor: ``beir/beir/retrieval/models/splade.py`` /
    ``unicoil.py``.  Activation ``max_pool_t(log1p(relu(E[tok] @ head)))``
    over vocab buckets; trained with the same in-batch InfoNCE as the
    dense tower plus the SPLADE FLOPS regularizer
    ``λ·Σ_j (mean_i a_ij)²`` that drives bucket sparsity."""

    def __init__(self, vocab: int = 8192, n_buckets: int = 1024,
                 latent: int = 64, max_len: int = 32,
                 max_expansion: int = 64, seed: int = 3):
        self.vocab = vocab
        self.n_buckets = n_buckets
        self.max_len = max_len
        self.max_expansion = max_expansion
        ke, kh = jax.random.split(jax.random.PRNGKey(seed))
        self.params = {
            "embed": jax.random.normal(ke, (vocab, latent), jnp.float32)
            * latent ** -0.5,
            "head": jax.random.normal(kh, (latent, n_buckets), jnp.float32)
            * latent ** -0.5,
        }

    @staticmethod
    def _activate(params, ids, mask):
        e = params["embed"][ids]                        # (b, L, latent)
        a = jnp.log1p(jax.nn.relu(
            e @ params["head"]))                        # (b, L, buckets)
        return jnp.max(a * mask[..., None], axis=1)     # (b, buckets)

    def fit(self, pairs: Sequence[Tuple[str, str]], *, steps: int = 200,
            batch: int = 32, lr: float = 3e-3, flops_lambda: float = 1e-3,
            seed: int = 0, verbose: bool = False) -> List[float]:
        import optax

        q_ids, q_mask = _batch_ids([p[0] for p in pairs], self.vocab,
                                   self.max_len)
        d_ids, d_mask = _batch_ids([p[1] for p in pairs], self.vocab,
                                   self.max_len)
        n = len(pairs)
        batch = min(batch, n)
        opt = optax.adam(lr)
        opt_state = opt.init(self.params)

        # host-resident pair arrays, minibatches passed as jit ARGUMENTS
        # (see JaxDualEncoder.fit — closed-over pair sets become multi-GB
        # captured compile constants)
        q_ids, q_mask = np.asarray(q_ids), np.asarray(q_mask)
        d_ids, d_mask = np.asarray(d_ids), np.asarray(d_mask)

        @jax.jit
        def step(params, opt_state, q_i, q_m, d_i, d_m):
            def loss_fn(p):
                qa = self._activate(p, q_i, q_m)
                da = self._activate(p, d_i, d_m)
                scores = qa @ da.T            # sparse dot, (b, b)
                labels = jnp.arange(scores.shape[0])
                logp = jax.nn.log_softmax(scores, axis=-1)
                nce = -jnp.mean(logp[labels, labels])
                flops = (jnp.sum(jnp.mean(qa, axis=0) ** 2)
                         + jnp.sum(jnp.mean(da, axis=0) ** 2))
                return nce + flops_lambda * flops

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        rng = np.random.default_rng(seed)
        curve = []
        for i in range(steps):
            sel = rng.choice(n, size=batch, replace=batch > n // 2)
            self.params, opt_state, loss = step(
                self.params, opt_state, q_ids[sel], q_mask[sel],
                d_ids[sel], d_mask[sel])
            curve.append(float(loss))
            if verbose and i % 50 == 0:
                print(f"  sparse-encoder step {i}: loss {curve[-1]:.4f}")
        return curve

    # --- SparseSearch duck-typed surface (weighted bucket dicts) ---

    def _expand(self, text: str) -> Dict[str, float]:
        ids, mask = _batch_ids([text], self.vocab, self.max_len)
        act = np.asarray(self._activate(self.params, ids, mask))[0]
        top = np.argsort(-act)[: self.max_expansion]
        return {f"b{int(i)}": float(act[i]) for i in top if act[i] > 0}

    def encode_corpus(self, docs) -> List[Dict[str, float]]:
        return [self._expand(_doc_text(d)) for d in docs]

    def encode_query(self, text: str) -> Dict[str, float]:
        return self._expand(text)
