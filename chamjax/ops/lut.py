"""ADC lookup-table construction as one batched einsum.

The TPU rebuild of the FPGA's M LUT-construction sub-PEs
(``SRC/LUT_construction.hpp:140-212``): per (query, probe) compute the
residual ``r = q - centroid`` and, for every sub-quantizer m and codeword j,
``LUT[m, j] = ||r_m - cb[m, j]||²``.  On TPU all (batch, nprobe, M, ksub)
entries come out of a single MXU einsum plus rank-broadcast norm terms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("by_residual",))
def build_luts(
    queries: jax.Array,      # (b, d) float32
    centroids: jax.Array,    # (nlist, d) float32
    codebooks: jax.Array,    # (m, ksub, dsub) float32
    list_ids: jax.Array,     # (b, nprobe) int32
    by_residual: bool = True,
) -> jax.Array:
    """Returns LUTs ``(b, nprobe, ksub, m) float32``.

    Layout note: ksub on the second-to-last axis and m last, so the scan
    stage's per-code gather (take_along_axis over the 256-entry axis) is a
    sublane gather with m riding the 128-lane axis.
    """
    b, d = queries.shape
    m, ksub, dsub = codebooks.shape
    if by_residual:
        probed = centroids[list_ids]               # (b, p, d)
        r = queries[:, None, :] - probed           # (b, p, d)
    else:
        r = jnp.broadcast_to(queries[:, None, :], (b, list_ids.shape[1], d))
    rs = r.reshape(b, -1, m, dsub)                 # (b, p, m, dsub)
    cross = jnp.einsum(
        "bpmd,mjd->bpjm", rs, codebooks,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # LUT accuracy feeds recall
    )
    rn = jnp.sum(rs * rs, axis=-1)                 # (b, p, m)
    cbn = jnp.sum(codebooks * codebooks, axis=-1)  # (m, ksub)
    return rn[:, :, None, :] - 2.0 * cross + cbn.T[None, None, :, :]
