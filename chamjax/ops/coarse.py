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


@functools.partial(jax.jit, static_argnames=("nprobe", "cand"))
def coarse_scan_2stage(
    queries: jax.Array,      # (b, d) float32
    centroids: jax.Array,    # (nlist, d) float32
    nprobe: int,
    cand: int,
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage coarse scan: approx shortlist + exact re-sort.

    Same contract as :func:`coarse_scan` — ``(list_ids, d²)`` nearest-first,
    exact squared-L2 distances over exact HIGHEST-precision scores.  The
    exact path's cost at large nlist is NOT the matmul but the full-sort
    ``top_k`` over ``(b, nlist)`` (measured on v5e at b=128: 1.02 ms at
    nlist=65536 of which the HIGHEST matmul is ≤0.1 ms); this variant
    replaces it with the TPU-native partial reduction ``approx_max_k`` kept
    ``cand``-wide (2-4× ``nprobe`` oversampling), then exactly re-sorts the
    retained scores — 0.090 ms at 65536, 0.356 ms at 262144 (11× the exact
    scan).  The approximation is the shortlist pass itself:
    ``approx_max_k`` keeps per-partition maxima, so a bin collision can in
    principle drop a probe of any rank but the global max — the guarantee
    is empirical, not structural: measured true-probe overlap 0.996 with
    4× oversampling even on worst-case random-Gaussian centroids, and
    R@10 equal to the exact-coarse oracle on the on-device gate
    (``bench.py --matrix`` row ``seg_coarse_2stage``).  Compared to
    ``use_approx`` (which truncates at ``nprobe`` directly), the retained
    probes here are exactly ordered and drawn from a 4× deeper pool.
    """
    assert nprobe <= cand <= centroids.shape[0], (nprobe, cand)
    cn = jnp.sum(centroids * centroids, axis=1)
    # Ranking precision feeds recall directly (CLAUDE.md invariant): the
    # DEFAULT single bf16 pass (2^-8 relative) is what silently collapses
    # recall and is never used here.  HIGHEST (6-pass fp32 emulation) is
    # the default; at very large nlist the matmul dominates the stage and
    # HIGH (bf16_3x, ~2^-21 relative — fp32-class) halves its passes:
    # measured 0.437 → 0.325 ms at nlist=262144 with 0.9998 probe
    # agreement, while at 65536 HIGH is *slower* (pass overhead on the
    # smaller matmul) — hence the size gate.
    prec = (jax.lax.Precision.HIGH if centroids.shape[0] >= 131072
            else jax.lax.Precision.HIGHEST)
    scores = (
        2.0 * jnp.dot(queries, centroids.T, precision=prec)
        - cn[None, :]
    )  # = ||q||² - d²
    vals, short = jax.lax.approx_max_k(scores, cand, recall_target=0.95)
    top, order = jax.lax.top_k(vals, nprobe)        # exact re-sort, (b,cand)
    idx = jnp.take_along_axis(short, order, axis=1)
    qn = jnp.sum(queries * queries, axis=1, keepdims=True)
    return idx.astype(jnp.int32), qn - top


def select_probes(
    queries: jax.Array,      # (b, d) float32
    centroids: jax.Array,    # (nlist, d) float32
    nprobe: int,
    coarse_cand: int = 0,
    use_approx: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """THE probe-selection dispatch, shared by every search tier
    (fused searcher, preassigned/diagnose, streamed planner, sharded
    shard_fn, IndexScanner): ``coarse_cand`` > 0 → two-stage scan with
    the width clamped to [nprobe, nlist]; else exact (or ``use_approx``)
    :func:`coarse_scan`.  Centralized so precedence and clamping cannot
    drift between call sites."""
    if coarse_cand > 0:
        cand = min(max(coarse_cand, nprobe), centroids.shape[0])
        return coarse_scan_2stage(queries, centroids, nprobe, cand=cand)
    return coarse_scan(queries, centroids, nprobe, use_approx=use_approx)
