"""Segmented Pallas ADC scan — work proportional to true list length.

The padded-window kernel (``scan_pallas.py``) scans a fixed ``scan_len`` per
probe, so imbalanced k-means lists force 3-5x wasted work (the p99 list sets
the window).  This kernel is the TPU realization of the FPGA's per-cell
iteration table (``DRAM_utils.hpp:45-102``: iterations = ceil(num_vec/PE)):

- every inverted list is viewed as ``ceil(len/SEG)`` uniform SEG-row
  *segments*;
- a query's probed lists expand into a flat window list (probe-major, so
  nearest centroids claim windows first), padded/truncated to a static
  budget ``W`` per query — the scan budget is global per query instead of
  per list, which both balances work and degrades gracefully (far probes
  drop first);
- grid = one program per window; the *next* window's code slab DMA is
  issued one grid step ahead (cross-step double buffering — the FPGA's
  double-buffered ADC, ``ADC.hpp:105-257``), so HBM latency never sits on
  the critical path;
- LUT blocks are indexed through a scalar-prefetched ``lut_idx`` map, so
  consecutive segments of the same probe reuse the already-resident LUT
  block (Pallas skips equal-index refetches).

Distance compute per 128-lane tile: two dynamic lane gathers (low/high LUT
half, index = code & 127) + select + sublane-sum — the VPU equivalent of the
FPGA's M-banked BRAM lookup PEs (``ADC.hpp:33-102``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chamjax.ops.topk import select_topk

LANES = 128
SEG = 1024            # default rows per segment (one (8, 128) f32 block)
MAX_SEG = 4096        # DeviceIVF overread padding covers any seg <= this

# Measured v5e window cost model (benchmarks/kernel_variants.py, packed-bf16
# kernel, min-of-3 chained slopes): a window costs F + seg/R with marginal
# rate R ≈ 15-28 Grows/s and F·R ≈ 2k rows — i.e. every window carries a
# fixed cost worth ~2048 row-slots regardless of fill.  auto_seg uses this
# to trade windows-per-list against padding slots.
WINDOW_FIXED_ROWS = 2048


def pack_luts_bf16(luts: jax.Array) -> jax.Array:
    """(..., m, 256) f32 LUTs → (..., m, 128) int32, entries (2c, 2c+1)
    packed as a bf16 pair per lane.

    Halves the LUT VMEM footprint and — the real win — halves the ADC
    inner loop's dynamic lane-gathers: one gather + a constant shift/mask
    replaces the lo/hi gather pair + select.  bf16 entry rounding is ~0.4%
    relative — far below PQ quantization error, so ranking is unaffected
    (tested).  The kernel gathers through a bitcast-f32 view (int32
    lane-gathers lower incorrectly on Mosaic as of this writing)."""
    b16 = luts.astype(jnp.bfloat16)
    u16 = jax.lax.bitcast_convert_type(b16, jnp.uint16)
    lo = u16[..., 0::2].astype(jnp.uint32)
    hi = u16[..., 1::2].astype(jnp.uint32)
    return (lo | (hi << 16)).astype(jnp.int32)


def prepare_luts(luts: jax.Array, probe: jax.Array, *, lut_bf16: bool):
    """(b, nprobe, ksub, m) XLA-layout LUTs + (b, W) window→probe map →
    ``(luts_k (b·nprobe, m, ksub|128), lut_idx (b·W,) int32)`` in the
    kernel's layout.  Shared by the resident scan wrappers and the
    host-streamed tier — the wire layout between LUT build and the ADC
    kernel lives HERE only."""
    b, nprobe, ksub, m = luts.shape
    lut_idx = (jnp.arange(b, dtype=jnp.int32)[:, None] * nprobe
               + probe).reshape(-1)
    luts_k = luts.transpose(0, 1, 3, 2).reshape(b * nprobe, m, ksub)
    if lut_bf16:
        luts_k = pack_luts_bf16(luts_k)
    return luts_k, lut_idx


def _adc_tile(lut_lo, lut_hi, lut_packed, cc, lut_bf16: bool):
    """Distances for one 128-lane tile of codes ``cc`` (m, 128) int32."""
    if lut_bf16:
        # 3-op decode (constant shifts only): even code takes the low bf16
        # half shifted up, odd keeps the high half in place — measured
        # 2.3-2.7x the f32 path on v5e, where the original 4-op decode
        # (variable where+mask+shift chain) was a de-optimization
        # (benchmarks/kernel_variants.py).
        vf = jnp.take_along_axis(lut_packed, cc >> 1, axis=1)
        v = jax.lax.bitcast_convert_type(vf, jnp.int32)
        hi = v & jnp.int32(-65536)
        g = jax.lax.bitcast_convert_type(
            jnp.where((cc & 1) == 1, hi, v << 16), jnp.float32)
    else:
        idx = cc & (LANES - 1)
        glo = jnp.take_along_axis(lut_lo, idx, axis=1)
        ghi = jnp.take_along_axis(lut_hi, idx, axis=1)
        g = jnp.where(cc < LANES, glo, ghi)
    return jnp.sum(g, axis=0)                  # (128,)


def _adc_seg_kernel(starts_ref, lens_ref, lutidx_ref, lut_ref, codes_hbm,
                    out_ref, scratch, sems, *, seg: int,
                    lut_bf16: bool = False):
    i = pl.program_id(0)
    nw = pl.num_programs(0)
    ln = lens_ref[i]

    def dma(slot, w):
        start = pl.multiple_of(starts_ref[w], LANES)
        return pltpu.make_async_copy(
            codes_hbm.at[:, pl.ds(start, seg)],
            scratch.at[slot],
            sems.at[slot],
        )

    # prologue: the first window issues its own DMA
    for sl in (0, 1):
        @pl.when((i == 0) & (i % 2 == sl) & (ln > 0))
        def _(sl=sl):
            dma(sl, i).start()

    # cross-step prefetch: issue window i+1's DMA now
    @pl.when(i + 1 < nw)
    def _():
        nxt_ln = lens_ref[i + 1]
        for sl in (0, 1):
            @pl.when(((i + 1) % 2 == sl) & (nxt_ln > 0))
            def _(sl=sl):
                dma(sl, i + 1).start()

    lut = lut_ref[0]                 # (m, 256) f32 | (m, 128) i32 packed
    if lut_bf16:
        lut_lo = lut_hi = None
        lut_packed = jax.lax.bitcast_convert_type(lut, jnp.float32)
    else:
        lut_lo = lut[:, :LANES]
        lut_hi = lut[:, LANES:]
        lut_packed = None

    for sl in (0, 1):
        @pl.when((i % 2 == sl) & (ln > 0))
        def _(sl=sl):
            dma(sl, i).wait()
            codes = scratch[sl].astype(jnp.int32)          # (m, seg)
            for t in range(seg // LANES):
                cc = codes[:, t * LANES:(t + 1) * LANES]
                dist = _adc_tile(lut_lo, lut_hi, lut_packed, cc, lut_bf16)
                pos = t * LANES + jax.lax.broadcasted_iota(
                    jnp.int32, (LANES,), 0)
                out_ref[0, t, :] = jnp.where(pos < ln, dist, jnp.inf)

    @pl.when(ln <= 0)
    def _():
        out_ref[0] = jnp.full((seg // LANES, LANES), jnp.inf, jnp.float32)


@functools.partial(jax.jit, static_argnames=("seg", "interpret", "lut_bf16"))
def adc_scan_segments(
    codes_t: jax.Array,      # (m, n_pad_seg) uint8 — MAX_SEG-overread-padded
    starts: jax.Array,       # (bW,) int32 — window start columns
    lens: jax.Array,         # (bW,) int32 — valid rows (0 = skip)
    lut_idx: jax.Array,      # (bW,) int32 — row into luts per window
    luts: jax.Array,         # (n_lut, m, 256) f32 | (n_lut, m, 128) i32
    *,
    seg: int = SEG,
    interpret: bool = False,
    lut_bf16: bool = False,
) -> jax.Array:
    """Returns ``dists (bW, seg) float32`` (+inf on padding/skips)."""
    bw = starts.shape[0]
    _n_lut, m, ksub = luts.shape
    assert ksub == (128 if lut_bf16 else 256), \
        "kernel is specialized for 8-bit PQ"
    assert seg % LANES == 0 and seg <= MAX_SEG, seg

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,           # starts, lens, lut_idx
        grid=(bw,),
        in_specs=[
            pl.BlockSpec(
                (1, m, ksub),
                lambda i, starts, lens, lutidx: (lutidx[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),      # codes stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, seg // LANES, LANES),
            lambda i, starts, lens, lutidx: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, m, seg), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_adc_seg_kernel, seg=seg, lut_bf16=lut_bf16),
        out_shape=jax.ShapeDtypeStruct((bw, seg // LANES, LANES),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, lens, lut_idx, luts, codes_t)
    return out.reshape(bw, seg)


def expand_windows(
    list_ids: jax.Array,     # (b, nprobe) int32 — probed cells, rank order
    list_start: jax.Array,   # (nlist,) int32
    list_len: jax.Array,     # (nlist,) int32
    *,
    windows: int,            # W — static per-query window budget
    seg: int = SEG,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Probe list → flat window table (probe-major, trailing pads len=0).

    Returns ``(starts (b,W), lens (b,W), probe (b,W), valid (b,W))``.
    """
    b, nprobe = list_ids.shape
    seg_cnt = (list_len[list_ids] + seg - 1) // seg        # (b, nprobe)
    off = jnp.cumsum(seg_cnt, axis=1)                      # inclusive
    w = jnp.arange(windows, dtype=off.dtype)
    # searchsorted(off, w, 'right') as a broadcast compare-count: the
    # sequential binary-search lowering costs ~0.45 ms at b=128 on v5e,
    # the (b, nprobe, W) count is VPU-trivial
    probe = jnp.sum(w[None, None, :] >= off[:, :, None], axis=1)
    valid = w[None, :] < off[:, -1:]
    probe_c = jnp.minimum(probe, nprobe - 1).astype(jnp.int32)
    base = jnp.where(probe_c > 0,
                     jnp.take_along_axis(
                         off, jnp.maximum(probe_c - 1, 0), axis=1), 0)
    seg_within = (w[None, :] - base).astype(jnp.int32)
    lid = jnp.take_along_axis(list_ids, probe_c, axis=1)
    starts = (list_start[lid] + seg_within * seg).astype(jnp.int32)
    lens = jnp.clip(list_len[lid] - seg_within * seg, 0, seg)
    lens = jnp.where(valid, lens, 0).astype(jnp.int32)
    starts = jnp.where(valid, starts, 0).astype(jnp.int32)
    return starts, lens, probe_c, valid


@functools.partial(
    jax.jit,
    static_argnames=("windows", "seg", "k", "use_approx", "recall_target",
                     "interpret", "lut_bf16", "select_l1"),
)
def scan_lists_seg(
    codes_t: jax.Array,      # (m, n_pad_seg) uint8
    ids: jax.Array,          # (n_pad_seg,) int32
    list_start: jax.Array,   # (nlist,) int32
    list_len: jax.Array,     # (nlist,) int32
    luts: jax.Array,         # (b, nprobe, ksub, m) float32 (XLA layout)
    list_ids: jax.Array,     # (b, nprobe) int32
    *,
    windows: int,
    seg: int = SEG,
    k: int,
    use_approx: bool = True,
    recall_target: float = 0.99,
    interpret: bool = False,
    lut_bf16: bool = False,
    select_l1: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Segmented scan + selection. Returns ``(dists (b,k), ids (b,k))``."""
    b = luts.shape[0]
    starts, lens, probe, _valid = expand_windows(
        list_ids, list_start, list_len, windows=windows, seg=seg)
    luts_k, lut_idx = prepare_luts(luts, probe, lut_bf16=lut_bf16)
    dists = adc_scan_segments(
        codes_t, starts.reshape(-1), lens.reshape(-1), lut_idx, luts_k,
        seg=seg, interpret=interpret, lut_bf16=lut_bf16,
    )                                                   # (bW, seg)
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
