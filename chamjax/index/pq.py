"""Product quantization: codebook training, encode/decode, OPQ rotation.

Replaces the Faiss PQ/OPQ training the reference drives through index keys
like ``"OPQ16,IVF4096,PQ16"`` (``Faiss_experiments/bench_polysemous_1bn.py``).
All M sub-quantizers train simultaneously as one vmapped Lloyd program
(M parallel k-means over (n, dsub) slices) — the training-time mirror of the
FPGA's M LUT-construction sub-PEs (``SRC/LUT_construction.hpp:140-212``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("ksub",))
def _pq_lloyd_iter(xs: jax.Array, cent: jax.Array, ksub: int):
    """One Lloyd iteration for all M subspaces at once.

    xs: (M, n, dsub); cent: (M, ksub, dsub) → (sums, counts) per subspace.
    """

    def one(x_m, c_m):
        scores = (
            2.0 * jnp.dot(x_m, c_m.T, precision=jax.lax.Precision.HIGHEST)
            - jnp.sum(c_m * c_m, axis=1)[None, :]
        )
        a = jnp.argmax(scores, axis=1).astype(jnp.int32)
        sums = jax.ops.segment_sum(x_m, a, num_segments=ksub)
        counts = jax.ops.segment_sum(
            jnp.ones((x_m.shape[0],), jnp.float32), a, num_segments=ksub
        )
        return sums, counts

    return jax.vmap(one)(xs, cent)


@jax.jit
def _pq_encode_chunk(xs: jax.Array, cent: jax.Array) -> jax.Array:
    """xs: (M, n, dsub), cent: (M, ksub, dsub) → codes (n, M) uint8."""

    def one(x_m, c_m):
        scores = (
            2.0 * jnp.dot(x_m, c_m.T, precision=jax.lax.Precision.HIGHEST)
            - jnp.sum(c_m * c_m, axis=1)[None, :]
        )
        return jnp.argmax(scores, axis=1)

    codes = jax.vmap(one)(xs, cent)  # (M, n)
    return codes.T.astype(jnp.uint8)


def _to_subspaces(x, m: int):
    """(n, d) → (M, n, dsub).  Device arrays stay on device (no host pull —
    the tunnel moves ~2 MB/s, so a silent ``np.ascontiguousarray`` on a
    corpus-sized jax array costs minutes)."""
    n, d = x.shape
    if isinstance(x, jax.Array):
        return jnp.transpose(
            x.reshape(n, m, d // m), (1, 0, 2)).astype(jnp.float32)
    return np.ascontiguousarray(
        x.reshape(n, m, d // m).transpose(1, 0, 2), dtype=np.float32
    )


def train_pq(
    x: np.ndarray,
    m: int,
    nbits: int = 8,
    iters: int = 20,
    seed: int = 0,
    max_train: int = 1 << 18,
) -> np.ndarray:
    """Train PQ codebooks. Returns ``(m, 2**nbits, d//m) float32``."""
    ksub = 1 << nbits
    n, d = x.shape
    assert d % m == 0
    rng = np.random.default_rng(seed)
    if n > max_train:
        x = x[np.sort(rng.choice(n, size=max_train, replace=False))]
        n = max_train
    xs = jnp.asarray(_to_subspaces(x, m))  # (M, n, dsub)
    idx = rng.choice(n, size=min(ksub, n), replace=False)
    cent = np.ascontiguousarray(xs[:, np.sort(idx), :])
    if cent.shape[1] < ksub:
        pad = rng.standard_normal((m, ksub - cent.shape[1], d // m)).astype(np.float32)
        cent = np.concatenate([cent, pad], axis=1)
    cent = jnp.asarray(cent)
    for _ in range(iters):
        sums, counts = _pq_lloyd_iter(xs, cent, ksub)
        counts_np = np.asarray(counts)
        new_cent = np.asarray(sums) / np.maximum(counts_np, 1.0)[..., None]
        # re-seed empty codewords per subspace from the heaviest codeword
        for mm in range(m):
            empty = np.where(counts_np[mm] == 0)[0]
            if empty.size:
                heavy = np.argsort(-counts_np[mm])[: empty.size]
                jit = rng.standard_normal((empty.size, d // m)).astype(np.float32)
                new_cent[mm, empty] = new_cent[mm, heavy] + jit * 1e-3
        cent = jnp.asarray(new_cent)
    return np.asarray(cent)


def pq_encode(
    x: np.ndarray, codebooks: np.ndarray, chunk: int = 1 << 18
) -> np.ndarray:
    """Encode rows of ``x`` → ``(n, m) uint8`` codes (chunked, jitted)."""
    m = codebooks.shape[0]
    cent = jnp.asarray(codebooks)
    out = np.empty((x.shape[0], m), np.uint8)
    for i in range(0, x.shape[0], chunk):
        xi = x[i : i + chunk]
        if not isinstance(xi, jax.Array):
            xi = np.asarray(xi)
        xs = jnp.asarray(_to_subspaces(xi, m))
        out[i : i + xs.shape[1]] = np.asarray(_pq_encode_chunk(xs, cent))
    return out


def pq_decode(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """codes (n, m) uint8 → reconstructed (n, d) float32."""
    m, ksub, dsub = codebooks.shape
    picked = codebooks[np.arange(m)[None, :], codes.astype(np.int64)]  # (n,m,dsub)
    return picked.reshape(codes.shape[0], m * dsub)


def _eig_alloc_init(x: np.ndarray, m: int) -> np.ndarray:
    """Eigenvalue-allocation OPQ init (the OPQ paper's parametric solution):
    PCA-rotate, then greedily deal eigen-directions (descending eigenvalue)
    to the subspace with the smallest eigenvalue *product* so each of the M
    codebooks faces equal variance.  On anisotropic data this beats a Haar-
    random start by several recall points and converges in fewer alternations.
    """
    d = x.shape[1]
    dsub = d // m
    cov = np.cov(x.astype(np.float64), rowvar=False)
    w, v = np.linalg.eigh(cov)                    # ascending
    w, v = w[::-1], v[:, ::-1]                    # descending
    logs = np.log(np.maximum(w, 1e-12))
    buckets = [[] for _ in range(m)]
    sums = np.zeros(m)
    for j in range(d):
        for b in np.argsort(sums):
            if len(buckets[b]) < dsub:
                buckets[b].append(j)
                sums[b] += logs[j]
                break
    perm = [j for b in buckets for j in b]
    return np.ascontiguousarray(v[:, perm], np.float32)


def train_opq(
    x: np.ndarray,
    m: int,
    nbits: int = 8,
    outer_iters: int = 8,
    pq_iters: int = 8,
    seed: int = 0,
    max_train: int = 1 << 17,
    init: str = "eig",
) -> Tuple[np.ndarray, np.ndarray]:
    """OPQ: alternate PQ training with an orthogonal-Procrustes rotation
    update (the ``OPQ{m}`` prefix of reference index keys).

    ``init``: ``"eig"`` (eigenvalue-allocation, default) or ``"random"``
    (Haar).  Train on the vectors PQ will actually encode — for a
    ``by_residual`` IVF that means coarse *residuals*, not raw vectors
    (``build_ivfpq`` does this).

    Returns ``(R (d, d) float32, codebooks (m, 2**nbits, d//m))``; apply as
    ``x @ R`` before encoding/search.
    """
    rng = np.random.default_rng(seed)
    n, d = x.shape
    if n > max_train:
        x = x[np.sort(rng.choice(n, size=max_train, replace=False))]
    x = np.ascontiguousarray(x, np.float32)
    if init == "eig":
        R = _eig_alloc_init(x, m)
    else:
        A = rng.standard_normal((d, d)).astype(np.float32)
        Q, _ = np.linalg.qr(A)
        R = Q.astype(np.float32)
    codebooks = None
    for _ in range(outer_iters):
        xr = x @ R
        codebooks = train_pq(xr, m, nbits=nbits, iters=pq_iters, seed=seed)
        xhat = pq_decode(pq_encode(xr, codebooks), codebooks)
        # Procrustes: argmin_R ||x R - xhat||_F, R orthogonal.
        u, _, vt = np.linalg.svd(x.T @ xhat)
        R = (u @ vt).astype(np.float32)
    # final codebooks consistent with final R
    codebooks = train_pq(x @ R, m, nbits=nbits, iters=pq_iters, seed=seed)
    return R, codebooks
