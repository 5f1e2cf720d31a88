"""ANN retrieval over chamjax quantized indexes for IR benchmarks.

Parity with the reference's Faiss-backed search family
(``beir/beir/retrieval/search/dense/faiss_search.py:14-458`` — each variant
with index/save/load/search):

- ``DenseRetrievalIVFPQSearch``  ↔ IVF-PQ through the serving engine
- ``FlatIPSearch``               ↔ ``FlatIPFaissSearch`` (exact, chunked MXU)
- ``PQSearch``                   ↔ ``PQFaissSearch`` (whole-corpus ADC)
- ``SQSearch``                   ↔ ``SQFaissSearch`` (per-dim affine uint8)
- ``PCASearch``                  ↔ ``PCAFaissSearch`` (PCA → base search)
- ``BinarySearch``               ↔ ``BinaryFaissSearch`` (sign bits, hamming
  scan via ``lax.population_count``, float rescore of the candidate pool)

L2 distance over normalized embeddings is rank-equivalent to cosine.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from chamjax.config import IndexConfig, SearchConfig
from chamjax.index import build_ivfpq
from chamjax.index.ivf import PackedIVF
from chamjax.index.pq import train_pq, pq_encode
from chamjax.ir.dense import _merge_topk
from chamjax.searcher import IVFSearcher


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-9)


class DenseRetrievalIVFPQSearch:
    """BEIR-style search backed by the chamjax IVF-PQ engine."""

    def __init__(self, model, index_cfg: Optional[IndexConfig] = None,
                 nprobe: int = 32, batch_size: int = 128,
                 normalize: bool = True):
        self.model = model
        self.index_cfg = index_cfg
        self.nprobe = nprobe
        self.batch_size = batch_size
        self.normalize = normalize
        self.index: Optional[PackedIVF] = None
        self.searcher: Optional[IVFSearcher] = None
        self._dids: list = []

    # --- index lifecycle (reference faiss_search index/save/load) ---------

    def index_corpus(self, corpus: Dict[str, Dict[str, str]]) -> None:
        self._dids = list(corpus.keys())
        emb = np.asarray(self.model.encode_corpus(
            [corpus[d] for d in self._dids], batch_size=self.batch_size),
            np.float32)
        if self.normalize:
            emb = _normalize(emb)
        d = emb.shape[1]
        cfg = self.index_cfg or IndexConfig(
            dim=d, nlist=max(16, min(4096, len(self._dids) // 64)),
            m=max(4, d // 16))
        self.index = build_ivfpq(emb, cfg)

    def save(self, output_dir: str, prefix: str = "ivfpq") -> None:
        assert self.index is not None
        os.makedirs(output_dir, exist_ok=True)
        self.index.save(os.path.join(output_dir, f"{prefix}.npz"))
        np.save(os.path.join(output_dir, f"{prefix}_dids.npy"),
                np.asarray(self._dids, dtype=object), allow_pickle=True)

    def load(self, input_dir: str, prefix: str = "ivfpq") -> None:
        self.index = PackedIVF.load(os.path.join(input_dir, f"{prefix}.npz"))
        self._dids = list(np.load(os.path.join(
            input_dir, f"{prefix}_dids.npy"), allow_pickle=True))
        self.searcher = None

    # --- search -------------------------------------------------------------

    def search(self, corpus, queries: Dict[str, str], top_k: int,
               score_function: str = "cos_sim", **kwargs
               ) -> Dict[str, Dict[str, float]]:
        if self.index is None:
            self.index_corpus(corpus)
        if self.searcher is None:
            self.searcher = IVFSearcher(
                self.index, SearchConfig(nprobe=self.nprobe, k=top_k))
        qids = list(queries.keys())
        q = np.asarray(self.model.encode_queries(
            [queries[qid] for qid in qids], batch_size=self.batch_size),
            np.float32)
        if self.normalize:
            q = _normalize(q)
        dists, ids = self.searcher.search(q, k=top_k)
        results: Dict[str, Dict[str, float]] = {}
        for qi, qid in enumerate(qids):
            row = {}
            for di, dist in zip(ids[qi], dists[qi]):
                if 0 <= di < len(self._dids):
                    did = self._dids[int(di)]
                    if did != qid:
                        # negate L2: higher = better, rank-equivalent to
                        # cosine on normalized vectors
                        row[did] = float(-dist)
            results[qid] = row
        return results


# --- quantized / flat search family -----------------------------------------


class _EncodedSearchBase:
    """Shared encode → build → score → results plumbing.

    Mirrors the shape of the reference's ``DenseRetrievalFaissSearch`` base
    (``faiss_search.py:14-100``): subclasses provide ``_build(emb)``,
    ``_score_all(q, top_k) -> (scores, idx)`` (higher = better), and the
    ``_state()/_restore(state)`` pair used by save/load.
    """

    _prefix = "encoded"

    def __init__(self, model, batch_size: int = 128, normalize: bool = True,
                 corpus_chunk_size: int = 16384):
        self.model = model
        self.batch_size = batch_size
        self.normalize = normalize
        self.corpus_chunk_size = corpus_chunk_size
        self._dids: List[str] = []

    # -- index lifecycle ----------------------------------------------------

    def index_corpus(self, corpus: Dict[str, Dict[str, str]]) -> None:
        self._dids = list(corpus.keys())
        emb = np.asarray(self.model.encode_corpus(
            [corpus[d] for d in self._dids], batch_size=self.batch_size),
            np.float32)
        if self.normalize:
            emb = _normalize(emb)
        self._build(emb)

    def save(self, output_dir: str, prefix: Optional[str] = None) -> None:
        prefix = prefix or self._prefix
        os.makedirs(output_dir, exist_ok=True)
        state = {k: np.asarray(v) for k, v in self._state().items()}
        np.savez_compressed(
            os.path.join(output_dir, f"{prefix}.npz"), **state)
        np.save(os.path.join(output_dir, f"{prefix}_dids.npy"),
                np.asarray(self._dids, dtype=object), allow_pickle=True)

    def load(self, input_dir: str, prefix: Optional[str] = None) -> None:
        prefix = prefix or self._prefix
        z = np.load(os.path.join(input_dir, f"{prefix}.npz"))
        self._restore({k: z[k] for k in z.files})
        self._dids = list(np.load(os.path.join(
            input_dir, f"{prefix}_dids.npy"), allow_pickle=True))

    # -- search ---------------------------------------------------------------

    def search(self, corpus, queries: Dict[str, str], top_k: int,
               score_function: str = "cos_sim", **kwargs
               ) -> Dict[str, Dict[str, float]]:
        if not self._dids:
            self.index_corpus(corpus)
        qids = list(queries.keys())
        q = np.asarray(self.model.encode_queries(
            [queries[qid] for qid in qids], batch_size=self.batch_size),
            np.float32)
        if self.normalize:
            q = _normalize(q)
        scores, idx = self._score_all(q, top_k)
        scores, idx = np.asarray(scores), np.asarray(idx)
        results: Dict[str, Dict[str, float]] = {}
        for qi, qid in enumerate(qids):
            row = {}
            for di, sv in zip(idx[qi], scores[qi]):
                if 0 <= di < len(self._dids):
                    did = self._dids[int(di)]
                    if did != qid:            # BEIR drops self-retrieval
                        row[did] = float(sv)
            results[qid] = row
        return results

    # -- subclass hooks -------------------------------------------------------

    def _build(self, emb: np.ndarray) -> None:
        raise NotImplementedError

    def _score_all(self, q: np.ndarray, top_k: int):
        raise NotImplementedError

    def _state(self) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def _restore(self, state: Dict[str, np.ndarray]) -> None:
        raise NotImplementedError


@functools.partial(jax.jit, static_argnames=("top_k",))
def _ip_chunk_topk(q: jax.Array, c: jax.Array, top_k: int):
    s = jnp.dot(q, c.T, precision=jax.lax.Precision.HIGHEST)
    return jax.lax.top_k(s, min(top_k, s.shape[1]))


def _chunked_topk(q: np.ndarray, n_total: int, chunk: int, score_fn,
                  top_k: int):
    """Running top-k merge over corpus chunks (higher = better)."""
    qd = jnp.asarray(q)
    best_v = best_i = None
    for start in range(0, n_total, chunk):
        v, i = score_fn(qd, start, min(chunk, n_total - start), top_k)
        i = i + start
        if best_v is None:
            best_v, best_i = v, i
        else:
            best_v, best_i = _merge_topk(best_v, best_i, v, i, top_k)
    return best_v, best_i


class FlatIPSearch(_EncodedSearchBase):
    """Exact inner-product search (``FlatIPFaissSearch``): the corpus matrix
    lives on device; scoring = chunked MXU matmul + running top-k."""

    _prefix = "flat_ip"

    def _build(self, emb: np.ndarray) -> None:
        self._emb = emb

    def _score_all(self, q: np.ndarray, top_k: int):
        emb = jnp.asarray(self._emb)
        return _chunked_topk(
            q, emb.shape[0], self.corpus_chunk_size,
            lambda qd, s, n, k: _ip_chunk_topk(
                qd, jax.lax.dynamic_slice_in_dim(emb, s, n, 0), k),
            top_k)

    def _state(self):
        return {"emb": self._emb}

    def _restore(self, state):
        self._emb = state["emb"]


@functools.partial(jax.jit, static_argnames=("top_k",))
def _adc_chunk_topk(luts: jax.Array, codes: jax.Array, top_k: int):
    """ADC scoring of one corpus chunk: ``luts (b, m, 256)`` f32 (higher =
    better, i.e. negated L2), ``codes (C, m)`` uint8 → per-chunk top-k."""
    # (b, m, C) gather then reduce over m — VPU-bound, chunk-sized working set
    g = jnp.take_along_axis(
        luts, codes.T[None].astype(jnp.int32), axis=2)
    s = g.sum(axis=1)
    return jax.lax.top_k(s, min(top_k, s.shape[1]))


class PQSearch(_EncodedSearchBase):
    """Whole-corpus PQ with ADC scoring (``PQFaissSearch``): no coarse
    quantizer — every query scans all N codes through its LUT, the moral
    equivalent of the reference's non-IVF PQ index."""

    _prefix = "pq"

    def __init__(self, model, m: int = 16, nbits: int = 8, **kw):
        super().__init__(model, **kw)
        self.m, self.nbits = m, nbits

    def _build(self, emb: np.ndarray) -> None:
        self._codebooks = train_pq(emb, self.m, nbits=self.nbits, iters=12)
        self._codes = pq_encode(emb, self._codebooks)

    def _score_all(self, q: np.ndarray, top_k: int):
        m, ksub, dsub = self._codebooks.shape
        qs = q.reshape(q.shape[0], m, 1, dsub)
        cb = self._codebooks[None]                       # (1, m, ksub, dsub)
        # negated squared L2 per subspace → higher = better
        luts = jnp.asarray(-((qs - cb) ** 2).sum(-1))    # (b, m, ksub)
        codes = jnp.asarray(self._codes)
        return _chunked_topk(
            q, codes.shape[0], self.corpus_chunk_size,
            lambda qd, s, n, k: _adc_chunk_topk(
                luts, jax.lax.dynamic_slice_in_dim(codes, s, n, 0), k),
            top_k)

    def _state(self):
        return {"codebooks": self._codebooks, "codes": self._codes}

    def _restore(self, state):
        self._codebooks, self._codes = state["codebooks"], state["codes"]


@functools.partial(jax.jit, static_argnames=("top_k",))
def _sq_chunk_topk(q_scaled: jax.Array, q_off: jax.Array, codes: jax.Array,
                   top_k: int):
    s = jnp.dot(q_scaled, codes.T.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST) + q_off[:, None]
    return jax.lax.top_k(s, min(top_k, s.shape[1]))


class SQSearch(_EncodedSearchBase):
    """Scalar-quantized flat search (``SQFaissSearch``, QT_8bit): per-dim
    affine uint8 codes, 4× smaller than f32.  IP against the decode is exact
    in the quantized domain: ``q·(vmin + scale∘c) = q·vmin + (q∘scale)·c``,
    so scoring is one uint8-matmul per chunk — no decode materialized."""

    _prefix = "sq8"

    def _build(self, emb: np.ndarray) -> None:
        self._vmin = emb.min(axis=0)
        scale = (emb.max(axis=0) - self._vmin) / 255.0
        self._scale = np.where(scale > 0, scale, 1.0).astype(np.float32)
        self._codes = np.clip(np.rint(
            (emb - self._vmin) / self._scale), 0, 255).astype(np.uint8)

    def _score_all(self, q: np.ndarray, top_k: int):
        q_scaled = jnp.asarray(q * self._scale)
        q_off = jnp.asarray(q @ self._vmin)
        codes = jnp.asarray(self._codes)
        return _chunked_topk(
            q, codes.shape[0], self.corpus_chunk_size,
            lambda qd, s, n, k: _sq_chunk_topk(
                q_scaled, q_off,
                jax.lax.dynamic_slice_in_dim(codes, s, n, 0), k),
            top_k)

    def _state(self):
        return {"vmin": self._vmin, "scale": self._scale,
                "codes": self._codes}

    def _restore(self, state):
        self._vmin, self._scale = state["vmin"], state["scale"]
        self._codes = state["codes"]


class PCASearch(FlatIPSearch):
    """PCA dimensionality reduction in front of flat search
    (``PCAFaissSearch``: PCAMatrix → base index).  Fit = centered SVD on the
    corpus sample; queries are projected through the same matrix."""

    _prefix = "pca"

    def __init__(self, model, output_dim: int = 64, fit_sample: int = 65536,
                 **kw):
        super().__init__(model, **kw)
        self.output_dim = output_dim
        self.fit_sample = fit_sample

    def _build(self, emb: np.ndarray) -> None:
        rs = np.random.default_rng(0)
        sample = emb if emb.shape[0] <= self.fit_sample else \
            emb[rs.choice(emb.shape[0], self.fit_sample, replace=False)]
        self._mean = sample.mean(axis=0)
        _, _, vt = np.linalg.svd(sample - self._mean, full_matrices=False)
        self._components = vt[:self.output_dim].T.astype(np.float32)
        self._emb = (emb - self._mean) @ self._components

    def _score_all(self, q: np.ndarray, top_k: int):
        q_r = (q - self._mean) @ self._components
        return super()._score_all(q_r, top_k)

    def _state(self):
        return {"emb": self._emb, "mean": self._mean,
                "components": self._components}

    def _restore(self, state):
        self._emb = state["emb"]
        self._mean, self._components = state["mean"], state["components"]


@functools.partial(jax.jit, static_argnames=("top_k",))
def _hamming_chunk_topk(q_bits: jax.Array, c_bits: jax.Array, top_k: int):
    pop = jax.lax.population_count(
        jnp.bitwise_xor(q_bits[:, None, :], c_bits[None]))
    s = -pop.astype(jnp.int32).sum(axis=-1)              # higher = closer
    return jax.lax.top_k(s, min(top_k, s.shape[1]))


@functools.partial(jax.jit, static_argnames=())
def _binary_rescore(q: jax.Array, cand_bits: jax.Array, mean: jax.Array,
                    scale: jax.Array):
    """Float query · sign-decode of candidate bits (the reference rescores
    hamming candidates against ``index.reconstruct``)."""
    b, r, nbytes = cand_bits.shape
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (cand_bits[..., None] >> shifts) & jnp.uint8(1)   # (b, r, bytes, 8)
    dec = mean + scale * (bits.reshape(b, r, nbytes * 8)[..., :q.shape[1]]
                          .astype(jnp.float32) * 2.0 - 1.0)
    return jnp.einsum("bd,brd->br", q, dec,
                      precision=jax.lax.Precision.HIGHEST)


class BinarySearch(_EncodedSearchBase):
    """Sign-binarized search (``BinaryFaissSearch``): per-dim mean-centered
    sign bits packed 8/byte (32× smaller than f32); candidate generation by
    hamming scan (`lax.population_count` on the VPU), then float rescoring of
    a ``rescore_factor·top_k`` pool, exactly the reference's two-phase
    binary flow."""

    _prefix = "binary"

    def __init__(self, model, rescore_factor: int = 8, **kw):
        super().__init__(model, **kw)
        self.rescore_factor = rescore_factor

    def _build(self, emb: np.ndarray) -> None:
        self._mean = emb.mean(axis=0)
        centered = emb - self._mean
        self._sigma = np.abs(centered).mean(axis=0).astype(np.float32)
        bits = (centered > 0).astype(np.uint8)
        pad = (-bits.shape[1]) % 8
        if pad:
            bits = np.pad(bits, ((0, 0), (0, pad)))
        self._bits = np.packbits(bits, axis=1, bitorder="little")

    def _score_all(self, q: np.ndarray, top_k: int):
        bits = jnp.asarray(self._bits)
        q_bits_np = (q - self._mean > 0).astype(np.uint8)
        pad = (-q_bits_np.shape[1]) % 8
        if pad:
            q_bits_np = np.pad(q_bits_np, ((0, 0), (0, pad)))
        q_bits = jnp.asarray(
            np.packbits(q_bits_np, axis=1, bitorder="little"))
        pool = min(self._bits.shape[0], max(top_k * self.rescore_factor,
                                            top_k))
        _, cand = _chunked_topk(
            q, bits.shape[0], self.corpus_chunk_size,
            lambda qd, s, n, k: _hamming_chunk_topk(
                q_bits, jax.lax.dynamic_slice_in_dim(bits, s, n, 0), k),
            pool)
        scores = _binary_rescore(
            jnp.asarray(q), bits[cand], jnp.asarray(self._mean),
            jnp.asarray(self._sigma))
        v, sel = jax.lax.top_k(scores, min(top_k, scores.shape[1]))
        return v, jnp.take_along_axis(cand, sel, axis=1)

    def _state(self):
        return {"bits": self._bits, "mean": self._mean,
                "sigma": self._sigma}

    def _restore(self, state):
        self._bits, self._mean = state["bits"], state["mean"]
        self._sigma = state["sigma"]


class HNSWSearch(_EncodedSearchBase):
    """Graph-ANN search (``HNSWFaissSearch``) on the native HNSW index
    (``chamjax/native/src/hnsw.cpp`` — the capability the reference vendors
    hnswlib for).  Host-side C++: the graph walk is pointer-chasing, the one
    ANN shape that does NOT map to the MXU, so it stays native."""

    _prefix = "hnsw"

    def __init__(self, model, M: int = 16, ef_construction: int = 200,
                 ef_search: int = 128, **kw):
        super().__init__(model, **kw)
        self.M, self.efc, self.ef_search = M, ef_construction, ef_search
        self._index = None

    def _build(self, emb: np.ndarray) -> None:
        from chamjax.native import HNSWIndex
        self._dim = emb.shape[1]
        self._index = HNSWIndex(self._dim, M=self.M,
                                ef_construction=self.efc)
        self._index.add(emb)

    def _score_all(self, q: np.ndarray, top_k: int):
        labels, dists = self._index.search(
            q, k=top_k, ef=max(self.ef_search, top_k))
        return -dists, labels          # negate L2: higher = better

    # HNSW has its own binary format — override save/load wholesale.
    def save(self, output_dir: str, prefix: Optional[str] = None) -> None:
        prefix = prefix or self._prefix
        os.makedirs(output_dir, exist_ok=True)
        self._index.save(os.path.join(output_dir, f"{prefix}.hnsw"))
        np.save(os.path.join(output_dir, f"{prefix}_meta.npy"),
                np.asarray([self._dim], np.int64))
        np.save(os.path.join(output_dir, f"{prefix}_dids.npy"),
                np.asarray(self._dids, dtype=object), allow_pickle=True)

    def load(self, input_dir: str, prefix: Optional[str] = None) -> None:
        from chamjax.native import HNSWIndex
        prefix = prefix or self._prefix
        self._dim = int(np.load(os.path.join(
            input_dir, f"{prefix}_meta.npy"))[0])
        self._index = HNSWIndex.load_file(
            os.path.join(input_dir, f"{prefix}.hnsw"), self._dim)
        self._dids = list(np.load(os.path.join(
            input_dir, f"{prefix}_dids.npy"), allow_pickle=True))


class HNSWSQSearch(HNSWSearch):
    """Scalar-quantized HNSW (``HNSWSQFaissSearch``): embeddings pass
    through the 8-bit per-dim affine quantizer before entering the graph, so
    the stored vectors (and the saved artifact) carry SQ8 precision."""

    _prefix = "hnsw_sq"

    def _build(self, emb: np.ndarray) -> None:
        vmin = emb.min(axis=0)
        scale = (emb.max(axis=0) - vmin) / 255.0
        scale = np.where(scale > 0, scale, 1.0).astype(np.float32)
        codes = np.clip(np.rint((emb - vmin) / scale), 0, 255)
        super()._build((codes * scale + vmin).astype(np.float32))
