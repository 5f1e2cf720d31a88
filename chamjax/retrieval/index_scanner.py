"""IVF coarse scanner + the disaggregated index server.

Parity with the reference's vector-DB-mode components:
- ``IndexScanner`` (``ralm/index_scanner/index_scanner.py:16-77``): the
  coarse quantizer as a standalone service component — one jitted matmul +
  top-k over the centroid table (the reference uses a Faiss ``IndexFlatL2``
  on CPU/GPU; the FPGA needs this run off-chip, which is the whole
  "disaggregated" design).
- ``IndexServer`` (``ralm/index_scanner/index_server.py:18-184``): pairs the
  scanner with a remote PQ engine through ``retrieve_with_lists``; sync
  ``search_multi_batch`` (latency mode) and pipelined
  ``search_multi_batch_tiktok`` (throughput mode) with per-batch profiling.
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from chamjax.ops.coarse import select_probes
from chamjax.retrieval.interface import BaseRetriever, RetrievalResult


class IndexScanner:
    def __init__(self, centroids: np.ndarray, nprobe: int = 32,
                 coarse_cand: int = -1):
        """``coarse_cand``: two-stage probe selection shortlist width
        (``SearchConfig.coarse_cand`` semantics: -1 auto — engages at
        large nlist where the full-sort top_k dominates; 0 exact)."""
        from chamjax.searcher import resolve_coarse_cand
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.nprobe = nprobe
        self._cfg_cand = coarse_cand
        self._resolve = resolve_coarse_cand

    def search(self, queries: np.ndarray, nprobe: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns ``(list_ids (b, nprobe) int64, dists (b, nprobe))``."""
        np_ = nprobe or self.nprobe
        cand = self._resolve(self._cfg_cand, self.centroids.shape[0], np_)
        lids, dists = select_probes(jnp.asarray(queries, jnp.float32),
                                    self.centroids, np_, coarse_cand=cand)
        return np.asarray(lids, np.int64), np.asarray(dists)


class IndexServer:
    """Coarse scan locally, PQ scan remotely — the CPU/GPU↔FPGA pairing."""

    def __init__(self, scanner: IndexScanner, retriever: BaseRetriever,
                 k: int = 100):
        self.scanner = scanner
        self.retriever = retriever
        self.k = k
        self.batch_latency_s: List[float] = []

    def search(self, queries: np.ndarray, k: Optional[int] = None
               ) -> RetrievalResult:
        lids, _ = self.scanner.search(queries)
        return self.retriever.retrieve_with_lists(queries, lids, k or self.k)

    def search_multi_batch(self, query_batches: List[np.ndarray],
                           k: Optional[int] = None) -> List[RetrievalResult]:
        """Latency mode: strictly sequential (reference :84-110)."""
        out = []
        self.batch_latency_s.clear()
        for q in query_batches:
            t0 = time.perf_counter()
            out.append(self.search(q, k))
            self.batch_latency_s.append(time.perf_counter() - t0)
        return out

    def search_multi_batch_tiktok(self, query_batches: List[np.ndarray],
                                  k: Optional[int] = None
                                  ) -> List[RetrievalResult]:
        """Throughput mode: coarse scan of batch i+1 overlaps the remote PQ
        scan of batch i (reference :113-173 — the same tik-tok state machine
        applied to pure vector search)."""
        k = k or self.k
        out: List[Optional[RetrievalResult]] = [None] * len(query_batches)
        t_start = time.perf_counter()
        pending = None   # index of the batch whose answer is outstanding
        for i, q in enumerate(query_batches):
            lids, _ = self.scanner.search(q)          # overlaps remote scan
            if pending is not None:
                out[pending] = self.retriever.retrieve_recv(
                    query_batches[pending].shape[0], k)
            self.retriever.retrieve_with_lists_send(q, lids, k)
            pending = i
        if pending is not None:
            out[pending] = self.retriever.retrieve_recv(
                query_batches[pending].shape[0], k)
        self.total_time_s = time.perf_counter() - t_start
        return out   # type: ignore[return-value]

    # profiling parity (reference :93-110, :175-184)
    def latency_stats_ms(self):
        a = np.asarray(self.batch_latency_s) * 1e3
        return {"p50": float(np.median(a)), "p95": float(np.percentile(a, 95))}

    def throughput_qps(self, query_batches) -> float:
        n = sum(q.shape[0] for q in query_batches)
        return n / self.total_time_s
