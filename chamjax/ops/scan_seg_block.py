"""Segmented ADC scan with BlockSpec-pipelined code fetches.

Round-3 rework of the multi-window kernel (``scan_seg_multi.py``), from
the measured fixed-cost decomposition (``benchmarks/kernel_variants.py``,
v5e, seg=512/bw=4096/group=8):

    full kernel 0.799 ms = compute 0.316 + manual codes-DMA 0.48
    dma_only        0.303 ms   (the manual async-copy machinery alone)
    --same-lut      Δ≈0        (BlockSpec-pipelined LUT fetches are free)

The per-window fixed cost (F·R ≈ 2048 row-equivalents — 80 % of every
seg=512 window) is the manually issued ``make_async_copy`` per window:
~150 ns of scalar-core issue/wait per 8 KB strided copy, poorly
overlapped with compute.  The fix is layout + fetch-path:

- codes are stored **seg-tiled**: ``(n_tiles, m, seg)`` with every
  inverted list starting on a tile boundary (list_pad == seg), so a
  window is ONE contiguous m·seg-byte tile;
- each window's tile is fetched through a **scalar-prefetched BlockSpec
  index map** — exactly how the LUT blocks already ride the Pallas
  pipeline — so Mosaic's generated pipeline issues/double-buffers the
  copies and the kernel body has no DMA code at all.

FPGA lineage unchanged (``SRC/ADC.hpp:33-102`` M-banked LUT PEs,
``DRAM_utils.hpp:104-185`` per-cell streaming); see ``scan_seg.py`` for
the window/expansion design.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chamjax.ops.scan_seg import _adc_tile, expand_windows, prepare_luts
from chamjax.ops.topk import select_topk

LANES = 128


def _adc_block_kernel(tiles_ref, lens_ref, lutidx_ref, *rest,
                      seg: int, group: int, lut_bf16: bool,
                      lane_l1: bool = False, dist_bf16: bool = False,
                      debug_ablate: str = ""):
    lut_refs = rest[:group]
    code_refs = rest[group:2 * group]
    out_ref = rest[2 * group]
    i = pl.program_id(0)
    if debug_ablate:
        # measurement-only bodies (benchmarks/kernel_roofline.py): the
        # BlockSpec pipeline still fetches every operand block, so
        # "copy" prices the pure DMA/grid machinery and "nogather" adds
        # the sublane reduction but ablates the LUT gather+decode —
        # separating DMA-bound from VPU-compute-bound regimes.
        for j in range(group):
            # u8→i32 first: Mosaic has no direct u8→f32 cast
            codes = code_refs[j][0].astype(jnp.int32)     # (m, seg)
            for t in range(seg // LANES):
                cc = codes[:, t * LANES:(t + 1) * LANES]
                if debug_ablate == "copy":
                    out_ref[j, t, :] = cc[0].astype(jnp.float32)
                else:                                     # "nogather"
                    out_ref[j, t, :] = jnp.sum(cc, axis=0).astype(
                        jnp.float32)
        return
    for j in range(group):
        ln = lens_ref[i * group + j]
        lut = lut_refs[j][0]
        if lut_bf16:
            lut_lo = lut_hi = None
            lut_p = jax.lax.bitcast_convert_type(lut, jnp.float32)
        else:
            lut_lo = lut[:, :LANES]
            lut_hi = lut[:, LANES:]
            lut_p = None

        # no ln-conditional branches: the ``pos < ln`` mask already writes
        # all-inf for empty/padding windows (ln == 0 masks every lane), so
        # the body runs unconditionally — two fewer when-blocks of
        # per-window control overhead than the manual-DMA kernel
        codes = code_refs[j][0].astype(jnp.int32)          # (m, seg)
        if lane_l1:
            # in-kernel per-(window, lane) L1 min + winning tile — the
            # FPGA's per-PE L1 queue next to the ADC PEs
            # (hierarchical_priority_queue.hpp), as in scan_seg_multi.py
            # but on the pipelined fetch path
            best = jnp.full((LANES,), jnp.inf, jnp.float32)
            best_t = jnp.zeros((LANES,), jnp.int32)
            for t in range(seg // LANES):
                cc = codes[:, t * LANES:(t + 1) * LANES]
                dist = _adc_tile(lut_lo, lut_hi, lut_p, cc, lut_bf16)
                pos = t * LANES + jax.lax.broadcasted_iota(
                    jnp.int32, (LANES,), 0)
                dist = jnp.where(pos < ln, dist, jnp.inf)
                take = dist < best
                best = jnp.where(take, dist, best)
                best_t = jnp.where(take, t, best_t)
            out_ref[j, 0, :] = best
            out_ref[j, 1, :] = jax.lax.bitcast_convert_type(
                best_t, jnp.float32)
        else:
            for t in range(seg // LANES):
                cc = codes[:, t * LANES:(t + 1) * LANES]
                dist = _adc_tile(lut_lo, lut_hi, lut_p, cc, lut_bf16)
                pos = t * LANES + jax.lax.broadcasted_iota(
                    jnp.int32, (LANES,), 0)
                dist = jnp.where(pos < ln, dist, jnp.inf)
                # bf16 distance output halves the candidate buffer's HBM
                # write AND the selection pass's read (rounding 2^-8
                # relative — same regime as the packed-bf16 LUTs)
                out_ref[j, t, :] = (dist.astype(jnp.bfloat16)
                                    if dist_bf16 else dist)


@functools.partial(jax.jit,
                   static_argnames=("seg", "group", "interpret", "lut_bf16",
                                    "lane_l1", "dist_bf16", "debug_ablate"))
def adc_scan_tiles(
    codes_tiled: jax.Array,  # (n_tiles, m, seg) uint8 — tile-major
    tile_idx: jax.Array,     # (bW,) int32 — tile row per window
    lens: jax.Array,         # (bW,) int32 — valid rows (0 = skip)
    lut_idx: jax.Array,      # (bW,) int32
    luts: jax.Array,         # (n_lut, m, 256) f32 | (n_lut, m, 128) i32
    *,
    seg: int,
    group: int = 8,
    interpret: bool = False,
    lut_bf16: bool = False,
    lane_l1: bool = False,
    dist_bf16: bool = False,
    debug_ablate: str = "",
) -> jax.Array:
    """Returns ``dists (bW, seg) float32`` (+inf on padding/skips) —
    bfloat16 with ``dist_bf16`` (halves the candidate buffer's HBM
    traffic; incompatible with ``lane_l1``, whose second row bitcasts
    int32 through the f32 output) — or, with ``lane_l1``,
    ``(bW, 2, 128)``: per-lane min + winning tile index (bitcast
    int32)."""
    assert not (lane_l1 and dist_bf16)
    bw = tile_idx.shape[0]
    _n_tiles, m, seg_t = codes_tiled.shape
    _n_lut, _m2, ksub = luts.shape
    assert seg_t == seg, (seg_t, seg)
    assert ksub == (128 if lut_bf16 else 256)
    assert seg % LANES == 0
    assert bw % group == 0, (bw, group)
    out_rows = 2 if lane_l1 else seg // LANES

    def lut_spec(j):
        return pl.BlockSpec(
            (1, m, ksub),
            lambda i, tiles, lens, lutidx, j=j: (lutidx[i * group + j],
                                                 0, 0),
            memory_space=pltpu.VMEM)

    def code_spec(j):
        return pl.BlockSpec(
            (1, m, seg),
            lambda i, tiles, lens, lutidx, j=j: (tiles[i * group + j],
                                                 0, 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,           # tile_idx, lens, lut_idx
        grid=(bw // group,),
        in_specs=[lut_spec(j) for j in range(group)]
        + [code_spec(j) for j in range(group)],
        out_specs=pl.BlockSpec(
            (group, out_rows, LANES),
            lambda i, tiles, lens, lutidx: (i, 0, 0),
            memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_adc_block_kernel, seg=seg, group=group,
                          lut_bf16=lut_bf16, lane_l1=lane_l1,
                          dist_bf16=dist_bf16, debug_ablate=debug_ablate),
        out_shape=jax.ShapeDtypeStruct(
            (bw, out_rows, LANES),
            jnp.bfloat16 if dist_bf16 else jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_idx, lens, lut_idx,
      *([luts] * group), *([codes_tiled] * group))
    if lane_l1:
        return out
    return out.reshape(bw, seg)


@functools.partial(
    jax.jit,
    static_argnames=("windows", "seg", "group", "k", "use_approx",
                     "recall_target", "interpret", "lut_bf16", "select_l1",
                     "lane_l1", "dist_bf16", "slot_major"),
)
def scan_lists_seg_block(
    codes_tiled: jax.Array,  # (n_tiles, m, seg) uint8
    ids: jax.Array,          # (n_tiles * seg,) int32 — tiled id layout
    list_start: jax.Array,   # (nlist,) int32 — multiples of seg
    list_len: jax.Array,     # (nlist,) int32
    luts: jax.Array,         # (b, nprobe, ksub, m)
    list_ids: jax.Array,     # (b, nprobe)
    *,
    windows: int,
    seg: int,
    group: int = 8,
    k: int,
    use_approx: bool = True,
    recall_target: float = 0.99,
    interpret: bool = False,
    lut_bf16: bool = False,
    select_l1: int = 0,
    lane_l1: bool = False,
    dist_bf16: bool = False,
    slot_major: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Tiled-layout segmented scan + selection (drop-in for
    ``scan_lists_seg_multi`` given a tile-aligned packing).  ``dist_bf16``
    keeps the (bW, seg) candidate buffer bfloat16 through selection and
    upcasts only the final (b, k) result."""
    b = luts.shape[0]
    windows = -(-windows // group) * group
    starts, lens, probe, _valid = expand_windows(
        list_ids, list_start, list_len, windows=windows, seg=seg)
    if slot_major and group > 1:
        # Slot-major window permutation (round 5): the grid hands flat
        # window i·G+j to pipeline slot j, so the probe-major expansion
        # sends consecutive segments of one list to DIFFERENT slots and
        # every window pays a fresh LUT block fetch (m·ksub·4 bytes ≈
        # 25% of the seg=2048 code bytes).  Re-ordering each query's
        # windows as w' = i·G+j ← w = j·(W/G)+i makes every slot walk
        # consecutive windows, so a multi-segment list's LUT index
        # repeats across that slot's consecutive grid steps and the
        # Pallas pipeline's equal-index refetch skip elides the copy
        # (tile fetches also become HBM-sequential within a run).
        # Selection is order-invariant: ``starts`` is permuted with the
        # windows, so the pos→row mapping below stays consistent.
        def pm(x):
            return (x.reshape(b, group, windows // group)
                    .swapaxes(1, 2).reshape(b, windows))
        starts, lens, probe = pm(starts), pm(lens), pm(probe)
    luts_k, lut_idx = prepare_luts(luts, probe, lut_bf16=lut_bf16)
    dists = adc_scan_tiles(
        codes_tiled, (starts // seg).reshape(-1), lens.reshape(-1),
        lut_idx, luts_k, seg=seg, group=group, interpret=interpret,
        lut_bf16=lut_bf16, lane_l1=lane_l1,
        dist_bf16=dist_bf16 and not lane_l1)
    if lane_l1:
        flat = dists[:, 0, :].reshape(b, windows * LANES)
        tile_idx = jax.lax.bitcast_convert_type(
            dists[:, 1, :], jnp.int32).reshape(b, windows * LANES)
        best_d, pos = select_topk(
            flat, k, use_approx=use_approx, recall_target=recall_target,
            l1=select_l1)
        win = pos // LANES
        lane = pos % LANES
        t_sel = jnp.take_along_axis(tile_idx, pos, axis=1)
        row = (jnp.take_along_axis(starts, win, axis=1)
               + t_sel * LANES + lane)
        best_i = ids[row]
        best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
        return best_d, best_i
    flat = dists.reshape(b, windows * seg)
    best_d, pos = select_topk(
        flat, k, use_approx=use_approx, recall_target=recall_target,
        l1=select_l1)
    best_d = best_d.astype(jnp.float32)
    win = pos // seg
    off = pos % seg
    row = jnp.take_along_axis(starts, win, axis=1) + off
    best_i = ids[row]
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    return best_d, best_i
