"""Fused Pallas ADC scan kernel — the hot op of the framework.

TPU rebuild of the FPGA's streamed PQ-code scan
(``SRC/DRAM_utils.hpp:104-185`` PQ streamer + ``SRC/ADC.hpp:33-102`` ADC PE
array).  One grid program per (query, probe) pair:

- the probed inverted list streams from HBM in ``CHUNK``-column slabs via
  manually double-buffered async DMA (the FPGA's double-buffered LUT/scan
  overlap, ``ADC.hpp:105-257``);
- chunks beyond the list's true length are *skipped entirely* — work is
  proportional to actual list length, the analogue of the FPGA's per-cell
  iteration table (``DRAM_utils.hpp:45-102``), so imbalanced k-means lists
  don't cost a fixed worst-case scan;
- the 256-entry LUT lookup — the FPGA uses M BRAM-banked sub-PEs — maps
  onto the VPU's dynamic *lane* gather: LUT laid out ``(m, 256)``, one
  sub-quantizer table per sublane row, split into two 128-lane halves
  selected by the code byte;
- codes are stored transposed ``(m, n_pad) uint8`` (structure-of-arrays,
  the same per-sub-quantizer streaming order as the FPGA's DRAM banks), so
  a list window is a contiguous 2-D slab;
- padding lanes (row ≥ list_len) are masked to +inf exactly as the FPGA
  tags invalid lanes with LARGE_NUM.

Selection afterwards is XLA ``approx_min_k`` + exact merge
(``chamjax/ops/topk.py``) — the hierarchical L1/L2 priority-queue
equivalent.

Output layout: ``(bp, groups, 8, 128)`` f32 (Mosaic-aligned blocks) whose
flat index equals the natural row offset, so a reshape recovers
``(bp, scan_len)`` exactly.
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
GROUP = 1024          # rows per (8, 128) output slab
N_BUF = 2             # DMA double-buffering slots


def _adc_kernel(starts_ref, lens_ref, lut_ref, codes_hbm, out_ref,
                scratch, sems, *, scan_len: int, chunk: int):
    """Distances for one (query, probe) window of ``scan_len`` rows."""
    i = pl.program_id(0)
    # list starts are list_pad (≥128)-aligned by construction; the hint lets
    # Mosaic prove the DMA slice lands on a lane-tile boundary
    start = pl.multiple_of(starts_ref[i], LANES)
    ln = lens_ref[i]

    lut = lut_ref[0]                       # (m, 256) f32
    lut_lo = lut[:, :LANES]
    lut_hi = lut[:, LANES:]

    n_chunks = scan_len // chunk

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            codes_hbm.at[:, pl.ds(start + c * chunk, chunk)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(ln > 0)
    def _():
        get_dma(0, 0).start()

    for c in range(n_chunks):              # static unroll (few chunks)
        base = c * chunk
        active = base < ln

        @pl.when(active)
        def _(c=c, base=base):
            @pl.when((c + 1 < n_chunks) & (base + chunk < ln))
            def _():
                get_dma((c + 1) % N_BUF, c + 1).start()

            get_dma(c % N_BUF, c).wait()
            codes = scratch[c % N_BUF].astype(jnp.int32)   # (m, chunk)
            for t in range(chunk // LANES):
                cc = codes[:, t * LANES:(t + 1) * LANES]
                is_lo = cc < LANES
                g = jnp.where(
                    is_lo,
                    jnp.take_along_axis(lut_lo, jnp.where(is_lo, cc, 0),
                                        axis=1),
                    jnp.take_along_axis(lut_hi,
                                        jnp.where(is_lo, 0, cc - LANES),
                                        axis=1),
                )                                           # (m, 128) f32
                dist = jnp.sum(g, axis=0, keepdims=True)    # (1, 128)
                pos = base + t * LANES + jax.lax.broadcasted_iota(
                    jnp.int32, (1, LANES), 1)
                dist = jnp.where(pos < ln, dist, jnp.inf)
                row = base + t * LANES
                out_ref[0, row // GROUP, (row // LANES) % 8, :] = dist[0]

        @pl.when(jnp.logical_not(active))
        def _(c=c, base=base):
            # skipped chunk: no DMA, just flood the slab with +inf
            for t in range(chunk // LANES):
                row = base + t * LANES
                out_ref[0, row // GROUP, (row // LANES) % 8, :] = jnp.full(
                    (LANES,), jnp.inf, jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("scan_len", "chunk", "interpret")
)
def adc_scan_distances(
    codes_t: jax.Array,      # (m, n_pad) uint8 — transposed packed codes
    starts: jax.Array,       # (bp,) int32 — window start column per program
    lens: jax.Array,         # (bp,) int32 — valid rows per window
    luts: jax.Array,         # (bp, m, 256) float32
    *,
    scan_len: int,
    chunk: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Returns ``dists (bp, scan_len) float32`` (+inf on padding).

    Requires ``scan_len % chunk == 0``, ``chunk % GROUP == 0``; ``starts``
    may be any 128-multiple (the DMA slab start is unconstrained).
    """
    bp, m, ksub = luts.shape
    assert ksub == 256, "kernel is specialized for 8-bit PQ"
    assert scan_len % GROUP == 0, f"scan_len {scan_len} must be a multiple of {GROUP}"
    if chunk <= 0 or scan_len % chunk or chunk % GROUP:
        chunk = GROUP          # auto: largest power-of-two slab that divides
        for c in (4096, 2048):
            if scan_len % c == 0:
                chunk = c
                break          # largest first — don't overwrite with 2048
    chunk = min(chunk, scan_len)
    n_groups = scan_len // GROUP

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,           # starts, lens
        grid=(bp,),
        in_specs=[
            pl.BlockSpec(
                (1, m, 256),
                lambda i, starts, lens: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),      # codes stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, n_groups, 8, LANES),
            lambda i, starts, lens: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, m, min(chunk, scan_len)), jnp.uint8),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_adc_kernel, scan_len=scan_len, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((bp, n_groups, 8, LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, lens, luts, codes_t)
    return out.reshape(bp, scan_len)


@functools.partial(
    jax.jit,
    static_argnames=("scan_len", "tile", "k", "use_approx", "recall_target",
                     "interpret"),
)
def scan_lists_pallas(
    codes_t: jax.Array,      # (m, n_pad) uint8
    ids: jax.Array,          # (n_pad,) int32
    list_start: jax.Array,   # (nlist,) int32
    list_len: jax.Array,     # (nlist,) int32
    luts: jax.Array,         # (b, nprobe, ksub, m) float32 (XLA layout)
    list_ids: jax.Array,     # (b, nprobe) int32
    *,
    scan_len: int,
    tile: int = 2048,        # DMA chunk columns
    k: int,
    use_approx: bool = True,
    recall_target: float = 0.99,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Full scan + selection. Returns ``(dists (b,k), ids (b,k) int32)``."""
    b, nprobe, ksub, m = luts.shape
    starts = list_start[list_ids].reshape(-1)          # (bp,)
    lens = jnp.minimum(list_len[list_ids], scan_len).reshape(-1)
    # kernel wants (bp, m, 256)
    luts_k = luts.transpose(0, 1, 3, 2).reshape(b * nprobe, m, ksub)
    dists = adc_scan_distances(
        codes_t, starts, lens, luts_k,
        scan_len=scan_len, chunk=tile, interpret=interpret,
    )                                                   # (bp, L)
    flat = dists.reshape(b, nprobe * scan_len)
    best_d, pos = select_topk(
        flat, k, use_approx=use_approx, recall_target=recall_target
    )                                                   # (b, k)
    probe = pos // scan_len
    off = pos % scan_len
    row = jnp.take_along_axis(
        starts.reshape(b, nprobe), probe, axis=1
    ) + off                                             # (b, k) global rows
    best_i = ids[row]
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    return best_d, best_i
