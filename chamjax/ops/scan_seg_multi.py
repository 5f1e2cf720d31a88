"""Multi-window segmented ADC scan: G windows per grid step.

The single-window kernel (``scan_seg.py``) pays a fixed ~200ns per grid
step (output-block machinery + sequencing), which dominates once segments
are small.  This variant processes ``G`` windows per step — G code-slab
DMAs in flight per step (double-buffered across steps ⇒ 2G slots), G LUT
blocks bound through G scalar-prefetched index maps — amortizing the fixed
cost G-fold.  Structure otherwise identical to ``scan_seg.py`` (see its
docstring for the FPGA lineage).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chamjax.ops.scan_seg import (
    MAX_SEG, _adc_tile, expand_windows, pack_luts_bf16, prepare_luts,
)
from chamjax.ops.topk import select_topk

LANES = 128


def _adc_multi_kernel(starts_ref, lens_ref, lutidx_ref, *rest,
                      seg: int, group: int, lut_bf16: bool = False,
                      lane_l1: bool = False):
    lut_refs = rest[:group]
    codes_hbm = rest[group]
    out_ref = rest[group + 1]
    scratch, sems = rest[group + 2], rest[group + 3]
    i = pl.program_id(0)
    nw = pl.num_programs(0)

    def dma(slot, w):
        start = pl.multiple_of(starts_ref[w], LANES)
        return pltpu.make_async_copy(
            codes_hbm.at[:, pl.ds(start, seg)],
            scratch.at[slot],
            sems.at[slot],
        )

    # prologue: step 0 issues its own G DMAs
    @pl.when(i == 0)
    def _():
        for j in range(group):
            @pl.when(lens_ref[j] > 0)
            def _(j=j):
                dma(j, j).start()

    # cross-step prefetch: issue step i+1's G DMAs now
    @pl.when(i + 1 < nw)
    def _():
        for sl in (0, 1):
            @pl.when((i + 1) % 2 == sl)
            def _(sl=sl):
                for j in range(group):
                    w = (i + 1) * group + j

                    @pl.when(lens_ref[w] > 0)
                    def _(j=j, w=w):
                        dma(sl * group + j, w).start()

    for sl in (0, 1):
        @pl.when(i % 2 == sl)
        def _(sl=sl):
            for j in range(group):
                w = i * group + j
                ln = lens_ref[w]
                lut = lut_refs[j][0]        # (m, 256) f32 | (m, 128) packed
                if lut_bf16:
                    lut_lo = lut_hi = None
                    lut_p = jax.lax.bitcast_convert_type(lut, jnp.float32)
                else:
                    lut_lo = lut[:, :LANES]
                    lut_hi = lut[:, LANES:]
                    lut_p = None

                @pl.when(ln > 0)
                def _(j=j, w=w, ln=ln, lut_lo=lut_lo, lut_hi=lut_hi,
                      lut_p=lut_p):
                    dma(sl * group + j, w).wait()
                    codes = scratch[sl * group + j].astype(jnp.int32)
                    if lane_l1:
                        # in-kernel L1: each lane keeps its min across the
                        # window's tiles (+ winning tile index) — the
                        # FPGA's per-PE L1 queue next to the ADC PEs
                        # (hierarchical_priority_queue.hpp), realized as a
                        # running elementwise min over the 128 VPU lanes
                        best = jnp.full((LANES,), jnp.inf, jnp.float32)
                        best_t = jnp.zeros((LANES,), jnp.int32)
                        for t in range(seg // LANES):
                            cc = codes[:, t * LANES:(t + 1) * LANES]
                            dist = _adc_tile(lut_lo, lut_hi, lut_p, cc,
                                             lut_bf16)
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
                            dist = _adc_tile(lut_lo, lut_hi, lut_p, cc,
                                             lut_bf16)
                            pos = t * LANES + jax.lax.broadcasted_iota(
                                jnp.int32, (LANES,), 0)
                            out_ref[j, t, :] = jnp.where(pos < ln, dist,
                                                         jnp.inf)

                @pl.when(ln <= 0)
                def _(j=j):
                    if lane_l1:
                        out_ref[j, 0, :] = jnp.full((LANES,), jnp.inf,
                                                    jnp.float32)
                        out_ref[j, 1, :] = jnp.zeros((LANES,), jnp.float32)
                    else:
                        out_ref[j] = jnp.full((seg // LANES, LANES),
                                              jnp.inf, jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("seg", "group", "interpret",
                                    "lut_bf16", "lane_l1"))
def adc_scan_segments_multi(
    codes_t: jax.Array,      # (m, n_pad_seg) uint8 — MAX_SEG-overread-padded
    starts: jax.Array,       # (bW,) int32 — bW % group == 0
    lens: jax.Array,         # (bW,) int32
    lut_idx: jax.Array,      # (bW,) int32
    luts: jax.Array,         # (n_lut, m, 256) f32 | (n_lut, m, 128) i32
    *,
    seg: int,
    group: int = 4,
    interpret: bool = False,
    lut_bf16: bool = False,
    lane_l1: bool = False,
) -> jax.Array:
    """Returns ``dists (bW, seg) float32`` (+inf on padding/skips), or —
    with ``lane_l1`` — ``(bW, 2, 128) float32``: row 0 the per-lane min
    over the window's tiles, row 1 the winning tile index (bitcast
    int32)."""
    bw = starts.shape[0]
    _n_lut, m, ksub = luts.shape
    assert ksub == (128 if lut_bf16 else 256)
    assert seg % LANES == 0 and seg <= MAX_SEG
    assert bw % group == 0, (bw, group)
    out_rows = 2 if lane_l1 else seg // LANES

    def lut_spec(j):
        return pl.BlockSpec(
            (1, m, ksub),
            lambda i, starts, lens, lutidx, j=j: (lutidx[i * group + j], 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bw // group,),
        in_specs=[lut_spec(j) for j in range(group)] + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (group, out_rows, LANES),
            lambda i, starts, lens, lutidx: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * group, m, seg), jnp.uint8),
            pltpu.SemaphoreType.DMA((2 * group,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_adc_multi_kernel, seg=seg, group=group,
                          lut_bf16=lut_bf16, lane_l1=lane_l1),
        out_shape=jax.ShapeDtypeStruct((bw, out_rows, LANES),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, lens, lut_idx, *([luts] * group), codes_t)
    if lane_l1:
        return out
    return out.reshape(bw, seg)


@functools.partial(
    jax.jit,
    static_argnames=("windows", "seg", "group", "k", "use_approx",
                     "recall_target", "interpret", "lut_bf16",
                     "select_l1", "lane_l1"),
)
def scan_lists_seg_multi(
    codes_t: jax.Array,
    ids: jax.Array,
    list_start: jax.Array,
    list_len: jax.Array,
    luts: jax.Array,         # (b, nprobe, ksub, m)
    list_ids: jax.Array,     # (b, nprobe)
    *,
    windows: int,
    seg: int,
    group: int = 4,
    k: int,
    use_approx: bool = True,
    recall_target: float = 0.99,
    interpret: bool = False,
    lut_bf16: bool = False,
    select_l1: int = 0,
    lane_l1: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Segmented multi-window scan + selection.

    ``lane_l1``: the kernel itself reduces each (window, lane) bucket of
    ``seg/128`` rows to its min (the FPGA's per-PE L1 queues of the
    hierarchical selector, kept next to the ADC PEs) — the host-side
    selection then runs over ``W·128`` candidates instead of ``W·seg``,
    and the kernel writes 2 rows/window instead of ``seg/128``.  Loss is
    bucket-collision-bounded: two true top-k rows in one (window, lane)
    bucket keep only the better (``index/sizing.py::lane_l1_loss``)."""
    b = luts.shape[0]
    windows = -(-windows // group) * group      # round W up to group multiple
    starts, lens, probe, _valid = expand_windows(
        list_ids, list_start, list_len, windows=windows, seg=seg)
    luts_k, lut_idx = prepare_luts(luts, probe, lut_bf16=lut_bf16)
    dists = adc_scan_segments_multi(
        codes_t, starts.reshape(-1), lens.reshape(-1), lut_idx, luts_k,
        seg=seg, group=group, interpret=interpret, lut_bf16=lut_bf16,
        lane_l1=lane_l1,
    )
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
    win = pos // seg
    off = pos % seg
    row = jnp.take_along_axis(starts, win, axis=1) + off
    best_i = ids[row]
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    return best_d, best_i
