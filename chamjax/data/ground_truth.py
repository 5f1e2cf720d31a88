"""Exact k-NN ground truth, computed as chunked jitted brute force.

Parity with ``Chameleon/Faiss_experiments/compute_ground_truth.py`` — but as
one XLA program per query chunk (matmul + running top-k merge) instead of a
Faiss flat index, so it runs at MXU speed on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _chunk_topk(xq: jax.Array, xb_chunk: jax.Array, base_id: jax.Array, k: int):
    """Exact top-k of one database chunk: returns (dists (q,k), ids (q,k))."""
    # Squared L2 via the expansion; ||q||^2 omitted (rank-invariant per query).
    # HIGHEST precision: TPU matmuls default to bf16, which corrupts
    # nearest-neighbour ranking — this is the ground-truth oracle.
    d = (
        jnp.sum(xb_chunk * xb_chunk, axis=1)[None, :]
        - 2.0 * jnp.dot(xq, xb_chunk.T, precision=jax.lax.Precision.HIGHEST)
    )
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx.astype(jnp.int32) + base_id


@functools.partial(jax.jit, static_argnames=("k",))
def _merge(d1, i1, d2, i2, k: int):
    d = jnp.concatenate([d1, d2], axis=1)
    i = jnp.concatenate([i1, i2], axis=1)
    neg, pos = jax.lax.top_k(-d, k)
    return -neg, jnp.take_along_axis(i, pos, axis=1)


def compute_ground_truth(
    xb: np.ndarray,
    xq: np.ndarray,
    k: int = 100,
    chunk: int = 1_000_000,
    query_chunk: int = 4096,
):
    """Exact squared-L2 top-k over the full database.

    Returns ``(ids (nq, k) int64, dists (nq, k) float32)`` with true squared
    distances (the per-query ``||q||^2`` term added back).
    """
    nq = xq.shape[0]
    all_ids, all_d = [], []
    for q0 in range(0, nq, query_chunk):
        q = jnp.asarray(xq[q0 : q0 + query_chunk], jnp.float32)
        best_d = best_i = None
        for b0 in range(0, xb.shape[0], chunk):
            db = jnp.asarray(xb[b0 : b0 + chunk], jnp.float32)
            cd, ci = _chunk_topk(q, db, jnp.int32(b0), k=min(k, db.shape[0]))
            if best_d is None:
                best_d, best_i = cd, ci
            else:
                best_d, best_i = _merge(best_d, best_i, cd, ci, k=k)
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        all_d.append(np.asarray(best_d + qn))
        all_ids.append(np.asarray(best_i, np.int64))
    return np.concatenate(all_ids, 0), np.concatenate(all_d, 0)
