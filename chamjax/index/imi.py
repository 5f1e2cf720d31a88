"""Inverted multi-index (IMI) coarse quantizer.

TPU rebuild of the reference's IMI training sweeps
(``Faiss_experiments/train_cpu.py`` / ``train_gpu.py`` sweep
{IVF,IMI}×{OPQ,¬OPQ}×PQ; Faiss key ``"IMI2xB,PQm"``): the coarse quantizer
is the cartesian product of two 2^B-way sub-quantizers, one per vector
half, giving nlist = 4^B cells from only 2·2^B trained centroids.

Because a product centroid is the concatenation ``c_(i,j) = [a_i ‖ b_j]``,
squared L2 decomposes per half::

    ||x − c_(i,j)||² = ||x₁ − a_i||² + ||x₂ − b_j||²

so both assignment (two small argmins) and the coarse scan (two small
matmuls + a broadcast add, instead of one (b, 4^B, d) matmul) are factored —
the IMI trade the reference uses to reach huge nlist cheaply, mapped to the
MXU.  Downstream (packing, LUTs, ADC scan) sees ordinary materialized
centroids, so the whole search stack works unchanged.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chamjax.index.kmeans import kmeans


def train_imi(
    xt: np.ndarray,
    bits: int,
    iters: int = 15,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Train the two half-space codebooks ``(a (2^bits, d/2), b (...))``."""
    xt = np.ascontiguousarray(xt, np.float32)
    d = xt.shape[1]
    assert d % 2 == 0, f"IMI needs even dim, got {d}"
    h = d // 2
    k = 1 << bits
    cents_a = kmeans(xt[:, :h], k, iters=iters, seed=seed)
    cents_b = kmeans(xt[:, h:], k, iters=iters, seed=seed + 1)
    return cents_a, cents_b


def imi_centroids(cents_a: np.ndarray, cents_b: np.ndarray) -> np.ndarray:
    """Materialize the product grid ``(K², d)``: row i·K+j = [a_i ‖ b_j]."""
    k, h = cents_a.shape
    grid_a = np.repeat(cents_a, k, axis=0)          # (K², h)
    grid_b = np.tile(cents_b, (k, 1))               # (K², h)
    return np.concatenate([grid_a, grid_b], axis=1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=())
def _half_assign(x: jax.Array, cents: jax.Array) -> jax.Array:
    cn = jnp.sum(cents * cents, axis=1)
    scores = 2.0 * jnp.dot(x, cents.T,
                           precision=jax.lax.Precision.HIGHEST) - cn[None]
    return jnp.argmax(scores, axis=1).astype(jnp.int32)


def assign_imi(x: np.ndarray, cents_a: np.ndarray, cents_b: np.ndarray,
               chunk: int = 1 << 18) -> np.ndarray:
    """Factored assignment: cell id = argmin_a · K + argmin_b."""
    x = np.ascontiguousarray(x, np.float32)
    k, h = cents_a.shape
    ca, cb = jnp.asarray(cents_a), jnp.asarray(cents_b)
    out = np.empty(x.shape[0], np.int64)
    for s in range(0, x.shape[0], chunk):
        xs = jnp.asarray(x[s:s + chunk])
        ia = _half_assign(xs[:, :h], ca)
        ib = _half_assign(xs[:, h:], cb)
        out[s:s + xs.shape[0]] = np.asarray(ia, np.int64) * k + \
            np.asarray(ib, np.int64)
    return out


@functools.partial(jax.jit, static_argnames=("nprobe",))
def coarse_scan_imi(
    queries: jax.Array,      # (b, d) float32
    cents_a: jax.Array,      # (K, d/2) float32
    cents_b: jax.Array,      # (K, d/2) float32
    nprobe: int,
) -> Tuple[jax.Array, jax.Array]:
    """Factored IMI coarse scan → ``(list_ids (b, nprobe) int32, dists)``.

    Same contract as ``ops.coarse.coarse_scan`` over the materialized grid
    (true squared L2, nearest-first), but costs two (b, K, d/2) matmuls plus
    a (b, K, K) add instead of one (b, K², d) matmul.
    """
    k, h = cents_a.shape
    qa, qb = queries[:, :h], queries[:, h:]
    da = (jnp.sum(qa * qa, axis=1, keepdims=True)
          - 2.0 * jnp.dot(qa, cents_a.T, precision=jax.lax.Precision.HIGHEST)
          + jnp.sum(cents_a * cents_a, axis=1)[None])      # (b, K)
    db = (jnp.sum(qb * qb, axis=1, keepdims=True)
          - 2.0 * jnp.dot(qb, cents_b.T, precision=jax.lax.Precision.HIGHEST)
          + jnp.sum(cents_b * cents_b, axis=1)[None])      # (b, K)
    full = (da[:, :, None] + db[:, None, :]).reshape(queries.shape[0], k * k)
    neg, idx = jax.lax.top_k(-full, nprobe)
    return idx.astype(jnp.int32), -neg
