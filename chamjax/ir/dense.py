"""Dense exact retrieval: chunked TPU matmul top-k.

Parity with the reference's ``DenseRetrievalExactSearch``
(``beir/beir/retrieval/search/dense/exact_search.py:12-93``): encode queries
and corpus with a duck-typed model (``encode_queries`` / ``encode_corpus``),
score by cosine or dot product in corpus chunks, keep a running top-k.  The
chunk matmul + top-k runs as one jitted XLA program on the MXU; the running
merge stays on device (vs the reference's per-chunk torch.topk on GPU).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("top_k", "cosine"))
def _chunk_scores(q: jax.Array, c: jax.Array, top_k: int, cosine: bool):
    """Scores (b, chunk) → per-chunk top-k (vals, idx)."""
    if cosine:
        q = q / (jnp.linalg.norm(q, axis=1, keepdims=True) + 1e-9)
        c = c / (jnp.linalg.norm(c, axis=1, keepdims=True) + 1e-9)
    s = jnp.dot(q, c.T, precision=jax.lax.Precision.HIGHEST)
    k = min(top_k, s.shape[1])
    vals, idx = jax.lax.top_k(s, k)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("top_k",))
def _merge_topk(vals_a, idx_a, vals_b, idx_b, top_k: int):
    vals = jnp.concatenate([vals_a, vals_b], axis=1)
    idx = jnp.concatenate([idx_a, idx_b], axis=1)
    v, sel = jax.lax.top_k(vals, min(top_k, vals.shape[1]))
    return v, jnp.take_along_axis(idx, sel, axis=1)


class DenseRetrievalExactSearch:
    def __init__(self, model, batch_size: int = 128,
                 corpus_chunk_size: int = 50_000):
        self.model = model
        self.batch_size = batch_size
        self.corpus_chunk_size = corpus_chunk_size

    def search(self, corpus: Dict[str, Dict[str, str]],
               queries: Dict[str, str], top_k: int,
               score_function: str = "cos_sim", **kwargs
               ) -> Dict[str, Dict[str, float]]:
        assert score_function in ("cos_sim", "dot")
        cosine = score_function == "cos_sim"
        qids = list(queries.keys())
        dids = list(corpus.keys())
        q_emb = jnp.asarray(self.model.encode_queries(
            [queries[q] for q in qids], batch_size=self.batch_size),
            jnp.float32)

        best_v = best_i = None
        for start in range(0, len(dids), self.corpus_chunk_size):
            chunk_ids = dids[start:start + self.corpus_chunk_size]
            c_emb = jnp.asarray(self.model.encode_corpus(
                [corpus[d] for d in chunk_ids], batch_size=self.batch_size),
                jnp.float32)
            v, i = _chunk_scores(q_emb, c_emb, top_k, cosine)
            i = i + start
            if best_v is None:
                best_v, best_i = v, i
            else:
                best_v, best_i = _merge_topk(best_v, best_i, v, i, top_k)

        best_v = np.asarray(best_v)
        best_i = np.asarray(best_i)
        results: Dict[str, Dict[str, float]] = {}
        for qi, qid in enumerate(qids):
            results[qid] = {
                dids[int(di)]: float(sv)
                for di, sv in zip(best_i[qi], best_v[qi])
                if dids[int(di)] != qid   # BEIR drops self-retrieval
            }
        return results


class HashingEncoder:
    """Deterministic text → vector encoder with no model weights.

    Token-hash random-feature embedding: each whitespace token seeds an RNG
    that draws a unit vector; a text embeds as the normalized sum.  Shares
    tokens ⇒ nearby embeddings, so retrieval quality is meaningfully testable
    hermetically (the reference's test bed relies on downloadable SBERT
    weights instead).
    """

    def __init__(self, dim: int = 256):
        self.dim = dim
        self._cache: Dict[str, np.ndarray] = {}

    def _token_vec(self, tok: str) -> np.ndarray:
        v = self._cache.get(tok)
        if v is None:
            import zlib
            # crc32, not hash(): hash() is salted per process
            seed = zlib.crc32(tok.encode()) & 0x7FFFFFFF
            v = np.random.default_rng(seed).standard_normal(self.dim)
            v /= np.linalg.norm(v) + 1e-9
            self._cache[tok] = v
        return v

    def _embed(self, text: str) -> np.ndarray:
        toks = text.lower().split()
        if not toks:
            return np.zeros(self.dim, np.float32)
        v = np.sum([self._token_vec(t) for t in toks], axis=0)
        return (v / (np.linalg.norm(v) + 1e-9)).astype(np.float32)

    def encode_queries(self, texts: List[str], batch_size: int = 0,
                       **kw) -> np.ndarray:
        return np.stack([self._embed(t) for t in texts])

    def encode_corpus(self, docs, batch_size: int = 0, **kw) -> np.ndarray:
        texts = [(d.get("title", "") + " " + d.get("text", "")).strip()
                 if isinstance(d, dict) else str(d) for d in docs]
        return np.stack([self._embed(t) for t in texts])


class HFEncoder:
    """Sentence-embedding adapter over a HuggingFace model (mean pooling).

    Optional heavyweight path (needs transformers+torch, downloads weights);
    the reference's SBERT-model equivalent (``beir/beir/retrieval/models/``).
    """

    def __init__(self, model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
                 device: str = "cpu", max_length: int = 256):
        from transformers import AutoModel, AutoTokenizer   # gated import
        self.tok = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModel.from_pretrained(model_name).to(device).eval()
        self.device = device
        self.max_length = max_length

    def _encode(self, texts: List[str], batch_size: int) -> np.ndarray:
        import torch
        out = []
        with torch.no_grad():
            for i in range(0, len(texts), batch_size):
                enc = self.tok(texts[i:i + batch_size], padding=True,
                               truncation=True, max_length=self.max_length,
                               return_tensors="pt").to(self.device)
                h = self.model(**enc).last_hidden_state
                mask = enc["attention_mask"].unsqueeze(-1)
                emb = (h * mask).sum(1) / mask.sum(1).clamp(min=1)
                out.append(emb.cpu().numpy())
        return np.concatenate(out, axis=0).astype(np.float32)

    def encode_queries(self, texts, batch_size: int = 32, **kw):
        return self._encode(list(texts), batch_size)

    def encode_corpus(self, docs, batch_size: int = 32, **kw):
        texts = [(d.get("title", "") + " " + d.get("text", "")).strip()
                 if isinstance(d, dict) else str(d) for d in docs]
        return self._encode(texts, batch_size)


class DenseRetrievalExactSearchMulti:
    """Mesh-parallel exact search — the reference's multi-GPU variant
    (``beir/beir/retrieval/search/dense/exact_search_multi_gpu.py``).

    The corpus embedding matrix is sharded row-wise across a mesh axis
    (each device scores its shard and keeps a local top-k); the global
    merge is a gather of k·n_devices candidates — the same shard-then-merge
    shape as the IVF list-sharded path (parallel/sharded_search.py), on the
    exact scorer.
    """

    def __init__(self, model, mesh=None, axis: str = "shard",
                 batch_size: int = 128):
        import jax
        from jax.sharding import Mesh
        import numpy as np_

        self.model = model
        self.batch_size = batch_size
        self.axis = axis
        if mesh is None:
            devs = np_.asarray(jax.devices())
            mesh = Mesh(devs, (axis,))
        self.mesh = mesh

    def search(self, corpus: Dict[str, Dict[str, str]],
               queries: Dict[str, str], top_k: int,
               score_function: str = "cos_sim", **kwargs
               ) -> Dict[str, Dict[str, float]]:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert score_function in ("cos_sim", "dot")
        cosine = score_function == "cos_sim"
        qids = list(queries.keys())
        dids = list(corpus.keys())
        q = np.asarray(self.model.encode_queries(
            [queries[qq] for qq in qids], batch_size=self.batch_size),
            np.float32)
        emb = np.asarray(self.model.encode_corpus(
            [corpus[dd] for dd in dids], batch_size=self.batch_size),
            np.float32)
        n_dev = self.mesh.devices.size
        n_pad = -(-emb.shape[0] // n_dev) * n_dev
        if n_pad != emb.shape[0]:                     # pad rows score -inf
            emb = np.pad(emb, ((0, n_pad - emb.shape[0]), (0, 0)))
        valid = np.zeros(n_pad, bool)
        valid[:len(dids)] = True

        emb_s = jax.device_put(
            emb, NamedSharding(self.mesh, P(self.axis, None)))
        valid_s = jax.device_put(
            valid, NamedSharding(self.mesh, P(self.axis)))
        q_d = jax.device_put(jnp.asarray(q),
                             NamedSharding(self.mesh, P()))

        @functools.partial(jax.jit, static_argnames=("top_k", "cosine"),
                           out_shardings=None)
        def scan(qd, c, v, top_k: int, cosine: bool):
            if cosine:
                qd = qd / (jnp.linalg.norm(qd, axis=1, keepdims=True) + 1e-9)
                c = c / (jnp.linalg.norm(c, axis=1, keepdims=True) + 1e-9)
            s = jnp.dot(qd, c.T, precision=jax.lax.Precision.HIGHEST)
            s = jnp.where(v[None, :], s, -jnp.inf)
            # XLA partitions the matmul by corpus rows (c's sharding) and
            # all-gathers only the k candidates per shard for the top-k.
            return jax.lax.top_k(s, min(top_k, s.shape[1]))

        v, i = scan(q_d, emb_s, valid_s, top_k, cosine)
        v, i = np.asarray(v), np.asarray(i)
        results: Dict[str, Dict[str, float]] = {}
        for qi, qid in enumerate(qids):
            results[qid] = {
                dids[int(di)]: float(sv)
                for di, sv in zip(i[qi], v[qi])
                if di < len(dids) and np.isfinite(sv)
                and dids[int(di)] != qid
            }
        return results
