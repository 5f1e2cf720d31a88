"""IVF coarse scan: one MXU matmul + top-k over the centroid table.

The TPU rebuild of the reference's ``IndexScanner``
(``ralm/index_scanner/index_scanner.py:16-77``, a Faiss ``IndexFlatL2`` over
nlist centroids on CPU/GPU) and of the FPGA host's hnswlib centroid search
(``SRC/host.cpp:516-556``).  Distances use the L2 expansion so the scan is a
single ``(b, d) @ (d, nlist)`` matmul that XLA tiles onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("nprobe", "use_approx"))
def coarse_scan(
    queries: jax.Array,      # (b, d) float32
    centroids: jax.Array,    # (nlist, d) float32
    nprobe: int,
    use_approx: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(list_ids (b, nprobe) int32, dists (b, nprobe) float32)``,
    nearest-first.  Distances are true squared L2.

    ``use_approx``: select probes with the TPU-native ``approx_max_k``
    (recall_target 0.98) instead of exact ``top_k`` — an occasional swapped
    *marginal* probe, which the multi-probe search absorbs; measured
    recall-neutral at nprobe=32 on the 1M benchmark corpus."""
    cn = jnp.sum(centroids * centroids, axis=1)
    # HIGHEST: full-f32 matmul passes — the coarse scan is tiny next to the
    # list scan, and centroid ranking precision feeds recall directly.
    scores = (
        2.0 * jnp.dot(queries, centroids.T,
                      precision=jax.lax.Precision.HIGHEST)
        - cn[None, :]
    )  # = ||q||² - d²
    if use_approx:
        top, idx = jax.lax.approx_max_k(scores, nprobe, recall_target=0.98)
    else:
        top, idx = jax.lax.top_k(scores, nprobe)
    qn = jnp.sum(queries * queries, axis=1, keepdims=True)
    return idx.astype(jnp.int32), qn - top
