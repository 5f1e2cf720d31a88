"""ANN retrieval over the chamjax IVF-PQ index for IR benchmarks.

Parity with the reference's Faiss-backed search family
(``beir/beir/retrieval/search/dense/faiss_search.py:14-458`` —
``PQFaissSearch`` / ``FlatIPFaissSearch`` etc., each with
index/save/load/search): encode the corpus, build the TPU IVF-PQ index, and
answer queries through the same jitted search path the serving system uses.
L2 distance over normalized embeddings is rank-equivalent to cosine.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from chamjax.config import IndexConfig, SearchConfig
from chamjax.index import build_ivfpq
from chamjax.index.ivf import PackedIVF
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
