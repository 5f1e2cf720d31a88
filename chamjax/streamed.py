"""Host-streamed IVF-PQ serving: corpora larger than HBM.

The TPU realization of the FPGA's DRAM-streaming scan — the reference
keeps PQ codes in the U250's DRAM banks and streams only the probed
lists through the ADC pipeline (``SRC/DRAM_utils.hpp:104-185``).  Here
the packed code/id arrays stay in **host RAM** (or an on-disk memmap,
``chamjax/index/ondisk.py``); HBM holds only the small artifacts
(centroids, codebooks, list tables) plus each batch's *staged window
slabs*:

    coarse scan (device) → expand windows (device) → pull (starts,lens)
    → host gathers the probed ``(bW, seg)`` code slabs → device_put
    → segmented ADC kernel over the staged slab → top-k (device)
    → host maps top-k POSITIONS back to ids

Ids never cross the host↔device link (round 4): the device scan returns
top-k *positions* into the staged slab; the host maps ``pos → window →
global row → id`` against its own resident id array — which may be
int64 or a read-only memmap with no shadow copy (the old design staged
(bW, seg) int32 id slabs: +4 bytes/row of upload AND a full int32 copy
of 1B int64 ids = +4 GB host RAM).

Capacity: 1B × PQ16 = 16 GB codes + 4-8 GB ids — far beyond one
v5e's 16 GB HBM but trivially host-RAM-resident.  Per-batch traffic is
``bW·seg·m`` bytes (e.g. b=128, nprobe=32, 1B/65536 lists ⇒ ~0.8 GB
per batch at seg=2048): on a real PCIe host this is the design's
bandwidth ceiling (~3-7k QPS at Gen4 ×16); through the axon tunnel
(~2 MB/s) it measures the tunnel, not the design — see RESULTS.md for
both numbers.  The scale-out answer is mesh sharding
(``parallel/sharded_search.py``); this tier is the single-chip capacity
answer.

The device scan runs the BlockSpec-pipelined kernel by default
(``SearchConfig.tiled``): each staged window IS one ``(m, seg)`` tile,
so the slab in tile-major form feeds ``adc_scan_tiles`` with
``tile_idx = arange(bW)`` — the same production kernel as the resident
and mesh tiers (one-kernel-everywhere).  ``tiled=False`` falls back to
the manual-DMA multi-window kernel.
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
from chamjax.ops.scan_seg_block import adc_scan_tiles
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
                     "lut_bf16", "select_l1", "tiled"),
)
def scan_staged(
    slab_codes: jax.Array,       # (bW, seg, m) uint8 — staged windows
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
    tiled: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Device phase 2: ADC over the staged slab + selection.

    Returns ``(best_d (b, k) f32, pos (b, k) i32)`` where ``pos`` indexes
    the per-query ``W·seg`` virtual candidate row space (window-major) —
    the host maps positions back to ids (padding slots carry +inf
    distance; the host masks them to -1).

    ``tiled``: each staged window is one ``(m, seg)`` tile, so the slab
    transposed tile-major feeds the BlockSpec-pipelined production kernel
    (``adc_scan_tiles``, tile_idx = iota) — the ``scan_lists_seg_block``
    path of the resident tier, minus the tile indirection.  ``False``
    reshapes to a virtual flat packed array for the manual-DMA kernel."""
    b, W = lens.shape
    bw = b * W
    m = slab_codes.shape[-1]
    luts = build_luts(q_rot, centroids, codebooks, list_ids,
                      by_residual=by_residual)       # (b, nprobe, 256, m)
    from chamjax.ops.scan_seg import MAX_SEG, prepare_luts
    luts_k, lut_idx = prepare_luts(luts, probe, lut_bf16=lut_bf16)
    if tiled:
        tiles = slab_codes.transpose(0, 2, 1)        # (bW, m, seg)
        dists = adc_scan_tiles(
            tiles, jnp.arange(bw, dtype=jnp.int32), lens.reshape(-1),
            lut_idx, luts_k, seg=seg, group=group, interpret=interpret,
            lut_bf16=lut_bf16)
    else:
        codes_t = slab_codes.transpose(2, 0, 1).reshape(m, bw * seg)
        codes_t = jnp.pad(codes_t, ((0, 0), (0, MAX_SEG)))
        v_starts = (jnp.arange(bw, dtype=jnp.int32) * seg)
        dists = adc_scan_segments_multi(
            codes_t, v_starts, lens.reshape(-1), lut_idx, luts_k,
            seg=seg, group=group, interpret=interpret, lut_bf16=lut_bf16)
    flat = dists.reshape(b, W * seg)
    best_d, pos = select_topk(flat, k, use_approx=use_approx,
                              recall_target=recall_target, l1=select_l1)
    return best_d, pos.astype(jnp.int32)


class HostStreamedSearcher:
    """Numpy-in/numpy-out searcher over a host-RAM-resident packed index.

    ``packed.codes``/``packed.ids`` may be plain arrays or read-only
    memmaps (``load_ondisk``) — nothing corpus-sized is ever uploaded
    whole; only the per-batch probed code windows cross the host↔device
    link.  ``packed.ids`` keeps its dtype (int32/int64): the position
    protocol (see module docstring) means ids are only ever touched by
    the final ``(b, k)`` host lookup.
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
        self.tiled = bool(scfg.tiled)
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
        self.ids = packed.ids          # original dtype, never copied
        self.n_pad = packed.codes.shape[0]
        # native slab gather runs at memcpy speed (the Python loop pays
        # ~5 us of interpreter overhead per 32 KB window — it, not the
        # memory system, bounds the measured gather bandwidth)
        from chamjax import native
        self._native = native.available()

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

    def _stage(self, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """Host gather of the probed code windows (the PQ-code streamer's
        host half).  Returns ``slab_codes (bW, seg, m) u8``."""
        if self._native:
            from chamjax import native
            return native.gather_codes(self.codes, starts, lens, self.seg)
        bw = starts.size
        seg = self.seg
        m = self.cfg.m
        slab_c = np.zeros((bw, seg, m), np.uint8)
        flat_s = starts.reshape(-1)
        flat_l = lens.reshape(-1)
        for w in range(bw):
            ln = int(flat_l[w])
            if ln <= 0:
                continue
            s = int(flat_s[w])
            e = min(s + seg, self.n_pad)
            slab_c[w, : e - s] = self.codes[s:e]
        return slab_c

    def _plan(self, queries: np.ndarray):
        q = jnp.asarray(queries, jnp.float32)
        return plan_windows(
            q, self.centroids, self.list_start, self.list_len, self.opq_R,
            nprobe=self.scfg.nprobe, windows=self.windows, seg=self.seg,
            coarse_cand=resolve_coarse_cand(
                self.scfg.coarse_cand, self.centroids.shape[0],
                self.scfg.nprobe),
            use_approx=self.scfg.coarse_approx and not self.interpret)

    def _scan(self, slab_c, lens, probe, list_ids, q_rot, k: int):
        return scan_staged(
            jnp.asarray(slab_c), lens, probe,
            list_ids, q_rot, self.centroids, self.codebooks,
            nprobe=self.scfg.nprobe, k=k, seg=self.seg, group=self.group,
            use_approx=self.scfg.use_approx_topk,
            recall_target=self.scfg.approx_recall_target,
            interpret=self.interpret, by_residual=self.cfg.by_residual,
            lut_bf16=self.scfg.lut_bf16, select_l1=self.scfg.select_l1,
            tiled=self.tiled)

    def _map_ids(self, d: np.ndarray, pos: np.ndarray,
                 starts: np.ndarray) -> np.ndarray:
        """Host side of the position protocol: ``pos`` (b, k) indexes the
        per-query window-major candidate space; map through the window
        table to global rows and look ids up in their native dtype."""
        win = pos // self.seg
        off = pos % self.seg
        rows = np.take_along_axis(starts.astype(np.int64), win, axis=1) + off
        rows = np.clip(rows, 0, self.n_pad - 1)
        ids = np.asarray(self.ids[rows.reshape(-1)], np.int64)
        ids = ids.reshape(pos.shape)
        return np.where(np.isfinite(d), ids, -1)

    def search(self, queries: np.ndarray, k: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        k = k or self.scfg.k
        starts, lens, probe, list_ids, q_rot = self._plan(queries)
        starts_h = np.asarray(starts)
        slab_c = self._stage(starts_h, np.asarray(lens))
        d, pos = self._scan(slab_c, lens, probe, list_ids, q_rot, k)
        d = np.asarray(d)
        return d, self._map_ids(d, np.asarray(pos), starts_h)

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
        starts_h = np.asarray(plan[0])
        slab = self._stage(starts_h, np.asarray(plan[1]))
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
            _starts, lens, probe, list_ids, q_rot = plan
            outs.append((self._scan(slab, lens, probe, list_ids, q_rot, k),
                         starts_h))
            if next_windows is not None:
                # host gather overlaps the scan dispatched above
                starts_h = next_windows[0]
                slab = self._stage(*next_windows)
                plan = next_plan
        res = []
        for (d, pos), st_h in outs:
            d = np.asarray(d)
            res.append((d, self._map_ids(d, np.asarray(pos), st_h)))
        return res
