"""In-process retriever backed by the jitted TPU search path.

The analogue of the reference's ``LocalFaissRetriever``
(``ralm/retriever/faiss_retriever.py:18-275``) with the Faiss index replaced
by ``IVFSearcher`` — including the ``cpu-gpu``-style split mode where the
coarse scan happens externally and only the PQ scan runs here
(``search_preassigned`` parity)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from chamjax.config import SearchConfig
from chamjax.index.ivf import PackedIVF
from chamjax.retrieval.interface import BaseRetriever, RetrievalResult
from chamjax.searcher import IVFSearcher


class LocalRetriever(BaseRetriever):
    def __init__(self, index: PackedIVF, search_cfg: Optional[SearchConfig] = None,
                 **searcher_kwargs):
        self._searcher_kwargs = searcher_kwargs
        self.searcher = IVFSearcher(index, search_cfg or SearchConfig(),
                                    **searcher_kwargs)

    @staticmethod
    def from_file(path: str, search_cfg: Optional[SearchConfig] = None
                  ) -> "LocalRetriever":
        return LocalRetriever(PackedIVF.load(path), search_cfg)

    def set_nprobe(self, nprobe: int) -> None:
        """Parity with reference ``set_nprobe`` (``faiss_retriever.py``).
        Rebuilds the searcher so window budgets resize with nprobe —
        keeping the constructor's scan_quantile/device kwargs (dropping
        them would silently re-pin the index to the default device)."""
        import dataclasses
        self.searcher = IVFSearcher(
            self.searcher.packed,
            dataclasses.replace(self.searcher.scfg, nprobe=nprobe),
            **self._searcher_kwargs)

    def retrieve(self, queries: np.ndarray, nprobe: int, k: int
                 ) -> RetrievalResult:
        dists, ids = self.searcher.search(queries, nprobe=nprobe, k=k)
        return RetrievalResult(ids=ids, dists=dists)

    def retrieve_device(self, queries, nprobe: int, k: int
                        ) -> RetrievalResult:
        """Fused path: device arrays in, device arrays out — the RALM loop
        chains decode → search without any host transfer (the reference's
        per-step GPU→host→socket hop, ``ralm.py:123-133``, eliminated)."""
        from chamjax.searcher import ivfpq_search
        s = self.searcher
        np_ = nprobe or s.scfg.nprobe
        # window budget must track an nprobe override (IVFSearcher.search
        # does the same) — a budget sized for scfg.nprobe silently
        # truncates the scan when the caller probes more lists
        W = s.windows if np_ == s.scfg.nprobe else s._auto_windows(np_)
        d, i = ivfpq_search(
            s.dev, queries,
            nprobe=np_, k=k or s.scfg.k,
            scan_len=s.scan_len, windows=W, seg=s.seg,
            group=s.group, probe_chunk=s.scfg.probe_chunk,
            by_residual=s.cfg.by_residual,
            use_approx=s.scfg.use_approx_topk,
            recall_target=s.scfg.approx_recall_target,
            backend=s.backend, tile=s.tile, interpret=s.interpret,
            coarse_approx=s.scfg.coarse_approx and not s.interpret,
            coarse_cand=s._coarse_cand(np_),
            lut_bf16=s.scfg.lut_bf16, select_l1=s.scfg.select_l1,
            lane_l1=s.scfg.lane_l1,
        )
        return RetrievalResult(ids=i, dists=d)

    def retrieve_with_lists(self, queries: np.ndarray, list_ids: np.ndarray,
                            k: int) -> RetrievalResult:
        dists, ids = self.searcher.search_preassigned(queries, list_ids, k=k)
        return RetrievalResult(ids=ids, dists=dists)


class DeviceRetriever(BaseRetriever):
    """Retriever over an already-device-resident index (streamed builds).

    ``build_ivfpq_device`` produces a :class:`~chamjax.searcher.DeviceIVF`
    with no host ``PackedIVF`` behind it (100M-scale indexes must never
    cross the host link); this wrapper carries the device index plus the
    small host list-length table the window auto-sizing needs.  Same
    contract as ``LocalRetriever`` including the fused ``retrieve_device``
    path the RALM loop uses."""

    def __init__(self, dev, list_len: np.ndarray,
                 search_cfg: Optional[SearchConfig] = None):
        import jax
        from chamjax.searcher import auto_seg, auto_windows
        self.dev = dev
        self.list_len = np.asarray(list_len)
        self.scfg = search_cfg or SearchConfig()
        if self.scfg.backend != "seg":
            # this tier has no PackedIVF behind it, so the xla/pallas
            # backends' scan_len sizing is unavailable — say so instead of
            # silently running a different kernel than the config names
            import warnings
            warnings.warn(
                f"DeviceRetriever always uses backend='seg' (no host "
                f"PackedIVF to size scan_len for "
                f"backend={self.scfg.backend!r})", stacklevel=2)
        # a tiled build fixes seg at its tile size (a mismatched seg would
        # silently fall back to the flat manual-DMA kernel); otherwise the
        # config's seg, or auto-size from the built length distribution
        self.seg = (int(dev.codes_tiled.shape[2])
                    if dev.codes_tiled is not None
                    else self.scfg.seg or auto_seg(self.list_len))
        self.windows = auto_windows(self.list_len, self.seg, self.scfg.nprobe)
        self.interpret = jax.default_backend() != "tpu"

    def _search(self, q, nprobe, k):
        from chamjax.searcher import (auto_windows, ivfpq_search,
                                      resolve_coarse_cand)
        np_ = nprobe or self.scfg.nprobe
        W = (self.windows if np_ == self.scfg.nprobe
             else auto_windows(self.list_len, self.seg, np_))
        return ivfpq_search(
            self.dev, q, nprobe=np_, k=k or self.scfg.k,
            windows=W, seg=self.seg, group=self.scfg.seg_group,
            probe_chunk=self.scfg.probe_chunk,
            by_residual=True, use_approx=self.scfg.use_approx_topk,
            recall_target=self.scfg.approx_recall_target,
            backend="seg", interpret=self.interpret,
            coarse_approx=self.scfg.coarse_approx and not self.interpret,
            coarse_cand=resolve_coarse_cand(
                self.scfg.coarse_cand, self.dev.centroids.shape[0], np_),
            lut_bf16=self.scfg.lut_bf16, select_l1=self.scfg.select_l1,
            lane_l1=self.scfg.lane_l1)

    def retrieve(self, queries: np.ndarray, nprobe: int, k: int
                 ) -> RetrievalResult:
        import jax.numpy as jnp
        d, i = self._search(jnp.asarray(queries, jnp.float32), nprobe, k)
        return RetrievalResult(ids=np.asarray(i, np.int64),
                               dists=np.asarray(d))

    def retrieve_device(self, queries, nprobe: int, k: int
                        ) -> RetrievalResult:
        d, i = self._search(queries, nprobe, k)
        return RetrievalResult(ids=i, dists=d)


class MeshRetriever(BaseRetriever):
    """Multi-chip retriever over a mesh-sharded index — the serving-class
    face of ``parallel/sharded_search``.

    Holds a placed :class:`~chamjax.parallel.sharded_search.ShardedIVF`
    (inverted lists over the ``lists`` axis, optionally batch-parallel
    over a data axis) and exposes the same retriever contract as
    ``LocalRetriever``/``DeviceRetriever`` including the fused
    ``retrieve_device`` path — so the RALM/tik-tok loops serve from a
    v5e-pod-scale index with zero code changes (reference analogue:
    the coordinator+multi-FPGA tier behind ``ExternalRetriever``,
    collapsed into one jitted mesh program)."""

    def __init__(self, sh, mesh, list_len: np.ndarray,
                 search_cfg: Optional[SearchConfig] = None,
                 axis: str = "lists", batch_axis: Optional[str] = None):
        import jax
        from chamjax.searcher import auto_seg, auto_windows
        self.sh = sh
        self.mesh = mesh
        self.axis = axis
        self.batch_axis = batch_axis
        self.list_len = np.asarray(list_len)
        self.scfg = search_cfg or SearchConfig()
        self.seg = (self.scfg.seg
                    or (int(sh.codes_tiled.shape[-1])
                        if sh.codes_tiled is not None
                        else auto_seg(self.list_len)))
        self.windows = self.scfg.scan_windows or auto_windows(
            self.list_len, self.seg, self.scfg.nprobe)
        self.group = max(1, self.scfg.seg_group)
        self.windows += (-self.windows) % self.group
        self.interpret = jax.default_backend() != "tpu"

    def _search(self, q, nprobe, k):
        from chamjax.parallel.sharded_search import (
            sharded_search, sharded_search_2d,
        )
        from chamjax.searcher import auto_windows, resolve_coarse_cand
        np_ = nprobe or self.scfg.nprobe
        W = (self.windows if np_ == self.scfg.nprobe
             else auto_windows(self.list_len, self.seg, np_))
        W += (-W) % self.group
        kw = dict(mesh=self.mesh, axis=self.axis, nprobe=np_,
                  k=k or self.scfg.k, windows=W, seg=self.seg,
                  group=self.group, use_approx=self.scfg.use_approx_topk,
                  backend="seg", interpret=self.interpret,
                  lut_bf16=self.scfg.lut_bf16,
                  select_l1=self.scfg.select_l1,
                  lane_l1=self.scfg.lane_l1,
                  coarse_cand=resolve_coarse_cand(
                      self.scfg.coarse_cand, self.sh.centroids.shape[0],
                      np_))
        if self.batch_axis:
            return sharded_search_2d(self.sh, q,
                                     batch_axis=self.batch_axis, **kw)
        return sharded_search(self.sh, q, **kw)

    def retrieve(self, queries: np.ndarray, nprobe: int, k: int
                 ) -> RetrievalResult:
        import jax.numpy as jnp
        d, i = self._search(jnp.asarray(queries, jnp.float32), nprobe, k)
        return RetrievalResult(ids=np.asarray(i, np.int64),
                               dists=np.asarray(d))

    def retrieve_device(self, queries, nprobe: int, k: int
                        ) -> RetrievalResult:
        d, i = self._search(queries, nprobe, k)
        return RetrievalResult(ids=i, dists=d)


class NativeCPURetriever(BaseRetriever):
    """Serving-grade host (C++) engine behind the retriever contract —
    the reference's ``FaissServer`` cpu mode (``LocalFaissRetriever``
    with a CPU index).  Same packed index, same distances as
    ``LocalRetriever`` to float tolerance; no accelerator required."""

    def __init__(self, index: PackedIVF, search_cfg: Optional[SearchConfig] = None):
        from chamjax import native
        self.engine = native.NativeIVFPQ(index)
        self.scfg = search_cfg or SearchConfig()

    def set_nprobe(self, nprobe: int) -> None:
        import dataclasses
        self.scfg = dataclasses.replace(self.scfg, nprobe=nprobe)

    def retrieve(self, queries: np.ndarray, nprobe: int, k: int
                 ) -> RetrievalResult:
        dists, ids = self.engine.search(queries, nprobe or self.scfg.nprobe,
                                        k or self.scfg.k)
        return RetrievalResult(ids=ids, dists=dists)

    def retrieve_with_lists(self, queries: np.ndarray, list_ids: np.ndarray,
                            k: int) -> RetrievalResult:
        dists, ids = self.engine.search_preassigned(queries, list_ids,
                                                    k or self.scfg.k)
        return RetrievalResult(ids=ids, dists=dists)

    def close(self) -> None:
        self.engine.close()
