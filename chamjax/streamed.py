"""Host-streamed IVF-PQ serving: corpora larger than HBM.

The TPU realization of the FPGA's DRAM-streaming scan — the reference
keeps PQ codes in the U250's DRAM banks and streams only the probed
lists through the ADC pipeline (``SRC/DRAM_utils.hpp:104-185``).  Here
the packed code/id arrays stay in **host RAM** (or an on-disk memmap,
``chamjax/index/ondisk.py``); HBM holds only the small artifacts
(centroids, codebooks, list tables) plus each batch's *staged window
slabs*:

    coarse scan (device) → expand windows (device) → pull (starts,lens)
    → host gathers the probed ``(bW, seg)`` code/id slabs → device_put
    → segmented ADC kernel over the staged slab → top-k (device)

Capacity: 1B × PQ16 = 16 GB codes + 4 GB int32 ids — far beyond one
v5e's 16 GB HBM but trivially host-RAM-resident.  Per-batch traffic is
``bW·seg·(m+4)`` bytes (e.g. b=128, nprobe=32, 1B/65536 lists ⇒ ~1 GB
per batch at seg=2048): on a real PCIe host this is the design's
bandwidth ceiling (~2.5-6k QPS at Gen4 ×16); through the axon tunnel
(~2 MB/s) it measures the tunnel, not the design — see RESULTS.md for
both numbers.  The scale-out answer is mesh sharding
(``parallel/sharded_search.py``); this tier is the single-chip capacity
answer.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chamjax.config import SearchConfig
from chamjax.index.ivf import PackedIVF
from chamjax.ops.coarse import select_probes
from chamjax.ops.lut import build_luts
from chamjax.ops.scan_seg import expand_windows
from chamjax.ops.scan_seg_multi import adc_scan_segments_multi
from chamjax.ops.topk import select_topk
from chamjax.searcher import auto_seg, auto_windows, resolve_coarse_cand


@functools.partial(
    jax.jit, static_argnames=("nprobe", "windows", "seg", "coarse_cand",
                              "use_approx"))
def plan_windows(
    queries: jax.Array,          # (b, d) f32
    centroids: jax.Array,        # (nlist, d) f32
    list_start: jax.Array,       # (nlist,) i32
    list_len: jax.Array,         # (nlist,) i32
    opq_R: Optional[jax.Array],
    *,
    nprobe: int,
    windows: int,
    seg: int,
    coarse_cand: int = 0,
    use_approx: bool = False,
):
    """Device phase 1: coarse scan + window table.  Returns
    ``(starts, lens, probe, list_ids, q_rot)`` — starts/lens are *global*
    row offsets into the host-resident packed arrays.

    ``coarse_cand`` > 0 selects probes with the two-stage coarse scan
    (``ops/coarse.py::coarse_scan_2stage``) — the 1B configs run at
    nlist ≥ 65536 where the HIGHEST matmul dominates this phase."""
    q = queries
    if opq_R is not None:
        q = jnp.dot(q, opq_R, precision=jax.lax.Precision.HIGHEST)
    list_ids, _ = select_probes(q, centroids, nprobe,
                                coarse_cand=coarse_cand,
                                use_approx=use_approx)
    starts, lens, probe, _valid = expand_windows(
        list_ids, list_start, list_len, windows=windows, seg=seg)
    return starts, lens, probe, list_ids, q


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "k", "seg", "group", "use_approx",
                     "recall_target", "interpret", "by_residual",
                     "lut_bf16", "select_l1"),
)
def scan_staged(
    slab_codes: jax.Array,       # (bW, seg, m) uint8 — staged windows
    slab_ids: jax.Array,         # (bW, seg) int32
    lens: jax.Array,             # (b, W) int32
    probe: jax.Array,            # (b, W) int32
    list_ids: jax.Array,         # (b, nprobe) int32
    q_rot: jax.Array,            # (b, d) f32 (already OPQ-rotated)
    centroids: jax.Array,
    codebooks: jax.Array,
    *,
    nprobe: int,
    k: int,
    seg: int,
    group: int,
    use_approx: bool = True,
    recall_target: float = 0.99,
    interpret: bool = False,
    by_residual: bool = True,
    lut_bf16: bool = False,
    select_l1: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Device phase 2: ADC over the staged slab + selection.

    The staged slab becomes a *virtual* packed array: window w's rows
    live at columns ``[w·seg, (w+1)·seg)`` of ``codes_t``, so the
    production multi-window kernel runs unchanged with
    ``starts = iota·seg``."""
    b, W = lens.shape
    bw = b * W
    m = slab_codes.shape[-1]
    luts = build_luts(q_rot, centroids, codebooks, list_ids,
                      by_residual=by_residual)       # (b, nprobe, 256, m)
    codes_t = slab_codes.transpose(2, 0, 1).reshape(m, bw * seg)
    from chamjax.ops.scan_seg import MAX_SEG, prepare_luts
    codes_t = jnp.pad(codes_t, ((0, 0), (0, MAX_SEG)))
    v_starts = (jnp.arange(bw, dtype=jnp.int32) * seg)
    luts_k, lut_idx = prepare_luts(luts, probe, lut_bf16=lut_bf16)
    dists = adc_scan_segments_multi(
        codes_t, v_starts, lens.reshape(-1), lut_idx, luts_k,
        seg=seg, group=group, interpret=interpret, lut_bf16=lut_bf16)
    flat = dists.reshape(b, W * seg)
    best_d, pos = select_topk(flat, k, use_approx=use_approx,
                              recall_target=recall_target, l1=select_l1)
    best_i = jnp.take_along_axis(
        slab_ids.reshape(b, W * seg), pos, axis=1)
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    return best_d, best_i


class HostStreamedSearcher:
    """Numpy-in/numpy-out searcher over a host-RAM-resident packed index.

    ``packed.codes``/``packed.ids`` may be plain arrays or read-only
    memmaps (``load_ondisk``) — nothing corpus-sized is ever uploaded
    whole; only the per-batch probed windows cross the host↔device link.
    """

    def __init__(self, packed: PackedIVF, scfg: SearchConfig,
                 seg: int = 0, device=None):
        self.packed = packed
        self.scfg = scfg
        self.cfg = packed.cfg
        if packed.cfg.nbits != 8:
            # the segmented kernel is specialized for 8-bit PQ and this
            # tier has no XLA fallback (IVFSearcher warns + falls back;
            # here the failure would be an opaque kernel assert mid-jit)
            raise ValueError(
                f"HostStreamedSearcher requires nbits=8 PQ codes (got "
                f"nbits={packed.cfg.nbits}); use IVFSearcher's XLA "
                "backend for nbits != 8")
        if scfg.lane_l1:
            # the staged kernel writes full seg rows per window; the
            # in-kernel lane-L1 reduction is not plumbed through this tier
            import warnings
            warnings.warn(
                "HostStreamedSearcher ignores SearchConfig.lane_l1 (not "
                "supported by the staged kernel path)", stacklevel=2)
        self.seg = seg or scfg.seg or auto_seg(packed.list_len)
        self.windows = scfg.scan_windows or auto_windows(
            packed.list_len, self.seg, scfg.nprobe)
        self.group = max(1, scfg.seg_group)   # 0/neg = no grouping
        self.windows += (-self.windows) % self.group
        put = functools.partial(jax.device_put, device=device)
        self.centroids = put(jnp.asarray(packed.centroids, jnp.float32))
        self.codebooks = put(jnp.asarray(packed.codebooks, jnp.float32))
        self.list_start = put(jnp.asarray(packed.list_start, jnp.int32))
        self.list_len = put(jnp.asarray(packed.list_len, jnp.int32))
        self.opq_R = (put(jnp.asarray(packed.opq_R, jnp.float32))
                      if packed.opq_R is not None else None)
        self.interpret = jax.default_backend() != "tpu"
        # codes stay (n_pad, m) row-major: a window slab is a contiguous
        # row range — one memcpy per window on the host gather
        self.codes = packed.codes
        self.ids = packed.ids
        self.n_pad = packed.codes.shape[0]
        # native slab gather runs at memcpy speed (the Python loop pays
        # ~5 us of interpreter overhead per 32 KB window — it, not the
        # memory system, bounds the measured gather bandwidth)
        from chamjax import native
        self._native = native.available()
        self._ids_i32 = None

    def warm(self, chunk_rows: int = 1 << 20) -> None:
        """Touch the code/id arrays sequentially to populate the page
        cache (memmap) / fault-in RAM.  Cold random window reads measure
        ~0.3 GiB/s on virtualized hosts vs multi-GiB/s warm (RESULTS.md);
        one sequential pass costs seconds and removes that cliff for
        serving."""
        m = self.codes.shape[1]
        code_stride = max(1, 4096 // m)     # ≥1 touch per 4 KiB page
        acc = 0
        for s in range(0, self.n_pad, chunk_rows):
            e = min(s + chunk_rows, self.n_pad)
            acc += int(self.codes[s:e:code_stride, 0].sum())
            acc += int(self.ids[s:e:1024].sum())
        self._warmed = acc  # keep the dependency alive

    def _stage(self, starts: np.ndarray, lens: np.ndarray):
        """Host gather of the probed windows (the PQ-code streamer's host
        half).  Returns ``(slab_codes (bW, seg, m) u8, slab_ids (bW, seg)
        i32)``."""
        if self._native:
            from chamjax import native
            if self._ids_i32 is None:   # one-time dtype normalization
                self._ids_i32 = (self.ids if self.ids.dtype == np.int32
                                 else np.asarray(self.ids, np.int32))
            return native.gather_windows(
                self.codes, self._ids_i32, starts, lens, self.seg)
        bw = starts.size
        seg = self.seg
        m = self.cfg.m
        slab_c = np.zeros((bw, seg, m), np.uint8)
        slab_i = np.full((bw, seg), -1, np.int32)
        flat_s = starts.reshape(-1)
        flat_l = lens.reshape(-1)
        for w in range(bw):
            ln = int(flat_l[w])
            if ln <= 0:
                continue
            s = int(flat_s[w])
            e = min(s + seg, self.n_pad)
            slab_c[w, : e - s] = self.codes[s:e]
            slab_i[w, : e - s] = self.ids[s:e]
        return slab_c, slab_i

    def _plan(self, queries: np.ndarray):
        q = jnp.asarray(queries, jnp.float32)
        return plan_windows(
            q, self.centroids, self.list_start, self.list_len, self.opq_R,
            nprobe=self.scfg.nprobe, windows=self.windows, seg=self.seg,
            coarse_cand=resolve_coarse_cand(
                self.scfg.coarse_cand, self.centroids.shape[0],
                self.scfg.nprobe),
            use_approx=self.scfg.coarse_approx and not self.interpret)

    def _scan(self, slab_c, slab_i, lens, probe, list_ids, q_rot, k: int):
        return scan_staged(
            jnp.asarray(slab_c), jnp.asarray(slab_i), lens, probe,
            list_ids, q_rot, self.centroids, self.codebooks,
            nprobe=self.scfg.nprobe, k=k, seg=self.seg, group=self.group,
            use_approx=self.scfg.use_approx_topk,
            recall_target=self.scfg.approx_recall_target,
            interpret=self.interpret, by_residual=self.cfg.by_residual,
            lut_bf16=self.scfg.lut_bf16, select_l1=self.scfg.select_l1)

    def search(self, queries: np.ndarray, k: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        k = k or self.scfg.k
        starts, lens, probe, list_ids, q_rot = self._plan(queries)
        slab_c, slab_i = self._stage(np.asarray(starts), np.asarray(lens))
        d, i = self._scan(slab_c, slab_i, lens, probe, list_ids, q_rot, k)
        return np.asarray(d), np.asarray(i, np.int64)

    def search_pipelined(self, batches, k: Optional[int] = None):
        """Double-buffered serving over a stream of query batches: batch
        i+1's host gather overlaps batch i's staged device scan — the TPU
        twin of the FPGA's double-buffered LUT-load/scan overlap
        (``SRC/ADC.hpp:105-257``).

        Scheduling: batch i+1's ``plan_windows`` is dispatched *before*
        batch i's ``scan_staged``, so pulling its (starts, lens) never
        waits behind the scan in the device FIFO; the host then gathers
        i+1's slabs while the device executes scan i (JAX dispatch is
        async, so nothing here blocks on device completion except the
        two small plan pulls).  Results are pulled once at the end.
        Returns a list of ``(dists, ids)`` numpy pairs, identical to
        mapping :meth:`search` over ``batches``.
        """
        k = k or self.scfg.k
        batches = list(batches)
        if not batches:
            return []
        outs = []
        plan = self._plan(batches[0])
        slab = self._stage(np.asarray(plan[0]), np.asarray(plan[1]))
        for i in range(len(batches)):
            # pull batch i+1's window table BEFORE dispatching scan i: a
            # pull issued after the scan dispatch queues behind the
            # scan's multi-MiB slab upload on serialized links (measured
            # 1.5× slower through the axon tunnel); pulled first it costs
            # one small round-trip and the gather below still overlaps
            # the scan
            next_windows = None
            if i + 1 < len(batches):
                next_plan = self._plan(batches[i + 1])
                next_windows = (np.asarray(next_plan[0]),
                                np.asarray(next_plan[1]))
            starts, lens, probe, list_ids, q_rot = plan
            outs.append(self._scan(slab[0], slab[1], lens, probe,
                                   list_ids, q_rot, k))
            if next_windows is not None:
                # host gather overlaps the scan dispatched above
                slab = self._stage(*next_windows)
                plan = next_plan
        return [(np.asarray(d), np.asarray(i, np.int64)) for d, i in outs]
