"""Embedding vector store for RAG pipelines.

Parity with the reference's LangChain-FAISS store
(``reranker_hf/advanced_rag.py:138-148``: GTE-small embeddings, normalized,
cosine): encode chunks once, keep embeddings on device, answer
``similarity_search`` with one jitted matmul+top-k (exact) or through the
IVF-PQ engine (``backend="ivfpq"``) when the corpus is large.  Save/load
mirrors the reference's prebuilt ``advanced_rag_example/chunk_size_*``
stores.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from chamjax.ir.dense import _chunk_scores  # jitted matmul top-k


class VectorStore:
    def __init__(self, encoder, backend: str = "exact",
                 index_cfg=None, nprobe: int = 32):
        self.encoder = encoder
        self.backend = backend
        self.index_cfg = index_cfg
        self.nprobe = nprobe
        self.docs: List[Dict[str, str]] = []
        self.emb: Optional[np.ndarray] = None
        self._searcher = None

    # --- build ---------------------------------------------------------

    @staticmethod
    def from_documents(docs: List[Dict[str, str]], encoder,
                       backend: str = "exact", **kw) -> "VectorStore":
        store = VectorStore(encoder, backend=backend, **kw)
        store.add_documents(docs)
        return store

    def add_documents(self, docs: List[Dict[str, str]]) -> None:
        emb = np.asarray(self.encoder.encode_corpus(docs), np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9
        self.docs.extend(docs)
        self.emb = emb if self.emb is None else np.vstack([self.emb, emb])
        self._searcher = None

    def _build_ann(self):
        from chamjax.config import IndexConfig, SearchConfig
        from chamjax.index import build_ivfpq
        from chamjax.searcher import IVFSearcher
        n, d = self.emb.shape
        cfg = self.index_cfg or IndexConfig(
            dim=d, nlist=max(16, min(4096, n // 64)), m=max(4, d // 16))
        idx = build_ivfpq(self.emb, cfg)
        self._searcher = IVFSearcher(
            idx, SearchConfig(nprobe=self.nprobe, k=100))

    # --- query ---------------------------------------------------------

    def similarity_search(self, query: str, k: int = 5
                          ) -> List[Tuple[Dict[str, str], float]]:
        """Returns [(doc, score)] best-first, cosine similarity."""
        import jax.numpy as jnp
        q = np.asarray(self.encoder.encode_queries([query]), np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True) + 1e-9
        if self.backend == "ivfpq":
            if self._searcher is None:
                self._build_ann()
            dists, ids = self._searcher.search(q, k=min(k, len(self.docs)))
            # L2 on unit vectors → cosine = 1 - d/2
            return [(self.docs[int(i)], float(1.0 - d_ / 2.0))
                    for i, d_ in zip(ids[0], dists[0]) if i >= 0]
        v, i = _chunk_scores(jnp.asarray(q), jnp.asarray(self.emb),
                             min(k, len(self.docs)), True)
        v, i = np.asarray(v), np.asarray(i)
        return [(self.docs[int(di)], float(sv))
                for di, sv in zip(i[0], v[0])]

    # --- persistence (reference prebuilt stores) ------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "embeddings.npy"), self.emb)
        with open(os.path.join(path, "docs.jsonl"), "w") as f:
            for d in self.docs:
                f.write(json.dumps(d) + "\n")

    @staticmethod
    def load(path: str, encoder, **kw) -> "VectorStore":
        store = VectorStore(encoder, **kw)
        store.emb = np.load(os.path.join(path, "embeddings.npy"))
        with open(os.path.join(path, "docs.jsonl")) as f:
            store.docs = [json.loads(line) for line in f]
        return store
