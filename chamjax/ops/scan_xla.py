"""Inverted-list ADC scan — pure-XLA reference path.

The rebuild of the FPGA's PQ-code streamer + ADC PE array
(``SRC/DRAM_utils.hpp:104-185`` + ``SRC/ADC.hpp:33-102``): for each
(query, probe) pair, read a fixed-length window of packed uint8 codes
starting at the probed list's offset, accumulate ``dist = Σ_m LUT[m][code_m]``
(here one ``take_along_axis`` + sum, vectorized over the whole window), mask
padding lanes to +inf exactly as the FPGA tags invalid lanes with LARGE_NUM,
and keep a running top-k.  Probes are processed in chunks under ``lax.scan``
to bound live HBM traffic; this is also the correctness oracle for the
fused Pallas kernel (``chamjax/ops/scan_pallas.py``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from chamjax.ops.topk import select_topk, merge_topk

INVALID = jnp.float32(jnp.inf)


@functools.partial(
    jax.jit,
    static_argnames=("scan_len", "probe_chunk", "k", "use_approx", "recall_target"),
)
def scan_lists_xla(
    codes_t: jax.Array,      # (m, n_pad) uint8 — transposed packed codes
    ids: jax.Array,          # (n_pad,) int32, -1 = padding
    list_start: jax.Array,   # (nlist,) int32
    list_len: jax.Array,     # (nlist,) int32
    luts: jax.Array,         # (b, nprobe, ksub, m) float32
    list_ids: jax.Array,     # (b, nprobe) int32
    *,
    scan_len: int,
    probe_chunk: int,
    k: int,
    use_approx: bool = True,
    recall_target: float = 0.99,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(dists (b, k), ids (b, k) int32)``; unfilled slots are
    (+inf, -1)."""
    b, nprobe = list_ids.shape
    m = codes_t.shape[0]
    pc = min(probe_chunk, nprobe)
    nchunks = -(-nprobe // pc)
    pad = nchunks * pc - nprobe

    # Pad the probe axis; padded probes are masked invalid.
    probe_valid = jnp.concatenate(
        [jnp.ones((b, nprobe), bool), jnp.zeros((b, pad), bool)], axis=1
    )
    list_ids_p = jnp.concatenate(
        [list_ids, jnp.zeros((b, pad), list_ids.dtype)], axis=1
    )
    luts_p = jnp.concatenate(
        [luts, jnp.zeros((b, pad) + luts.shape[2:], luts.dtype)], axis=1
    )

    # (nchunks, b, pc, ...) scan inputs
    xs = (
        list_ids_p.reshape(b, nchunks, pc).transpose(1, 0, 2),
        luts_p.reshape(b, nchunks, pc, *luts.shape[2:]).transpose(1, 0, 2, 3, 4),
        probe_valid.reshape(b, nchunks, pc).transpose(1, 0, 2),
    )

    slice_codes = jax.vmap(
        jax.vmap(
            lambda s: jax.lax.dynamic_slice(codes_t, (0, s), (m, scan_len)).T
        )
    )
    slice_ids = jax.vmap(
        jax.vmap(lambda s: jax.lax.dynamic_slice(ids, (s,), (scan_len,)))
    )

    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, scan_len), 2)

    n_pad = codes_t.shape[1]

    def step(carry, x):
        best_d, best_i = carry
        lids, lut_c, pvalid = x                       # (b,pc), (b,pc,ksub,m), (b,pc)
        starts = list_start[lids]                     # (b, pc)
        lens = list_len[lids]                         # (b, pc)
        # dynamic_slice CLAMPS an out-of-range start backwards — a short
        # list near the packed tail would silently read rows of EARLIER
        # lists and score them as its own.  Clamp explicitly and shift the
        # valid mask by the clamp delta instead (foreign head rows masked).
        s_cl = jnp.clip(starts, 0, max(n_pad - scan_len, 0))
        delta = starts - s_cl                         # (b, pc) ≥ 0
        w_codes = slice_codes(s_cl)                   # (b, pc, L, m) uint8
        w_ids = slice_ids(s_cl)                       # (b, pc, L) int32
        # ADC accumulate: dist[b,p,l] = Σ_m lut[b,p,code[b,p,l,m],m]
        contrib = jnp.take_along_axis(
            lut_c, w_codes.astype(jnp.int32), axis=2
        )                                             # (b, pc, L, m)
        dist = jnp.sum(contrib, axis=-1)              # (b, pc, L)
        valid = ((pos >= delta[:, :, None])
                 & (pos < (delta + lens)[:, :, None]) & pvalid[:, :, None])
        dist = jnp.where(valid, dist, INVALID)
        flat_d = dist.reshape(b, pc * scan_len)
        flat_i = w_ids.reshape(b, pc * scan_len)
        cd, cpos = select_topk(
            flat_d, k, use_approx=use_approx, recall_target=recall_target
        )
        ci = jnp.take_along_axis(flat_i, cpos.astype(jnp.int32), axis=1)
        ci = jnp.where(jnp.isfinite(cd), ci, -1)
        return merge_topk(best_d, best_i, cd, ci, k), None

    init = (
        jnp.full((b, k), INVALID, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(step, init, xs)
    return best_d, best_i
