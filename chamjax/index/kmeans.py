"""K-means as jitted Lloyd iterations (MXU assignment + segment-sum update).

Replaces the reference's Faiss ``train`` calls
(``Faiss_experiments/train_cpu.py`` / ``train_gpu.py`` /
``bench_polysemous_1bn.py``) with pure XLA: the assignment step is one
``(chunk, d) @ (d, k)`` matmul + argmin, the update step a segment-sum.
Data is streamed in fixed-size chunks so the same compiled program serves
any corpus size; empty clusters are re-seeded by splitting heavy ones
(Faiss-style).
"""

from __future__ import annotations

import functools
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnums=())
def _assign_chunk(x: jax.Array, cent: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Nearest centroid per row. Returns (assignment (n,), min_dist (n,))."""
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row.
    # HIGHEST: assignment ranking must not run through bf16 MXU passes.
    logits = jnp.dot(x, cent.T, precision=jax.lax.Precision.HIGHEST)
    cn = jnp.sum(cent * cent, axis=1)
    scores = 2.0 * logits - cn[None, :]
    a = jnp.argmax(scores, axis=1)
    xn = jnp.sum(x * x, axis=1)
    return a.astype(jnp.int32), xn - jnp.max(scores, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def _accumulate_chunk(x: jax.Array, a: jax.Array, k: int):
    sums = jax.ops.segment_sum(x, a, num_segments=k)
    counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32), a, num_segments=k)
    return sums, counts


def _cap_chunk(chunk: int, k: int) -> int:
    """Bound the (chunk, k) score matrix to ~1 GB f32 so assignment fits
    HBM at any nlist."""
    return max(4096, min(chunk, (1 << 28) // max(k, 1)))


def assign(x: np.ndarray, centroids: np.ndarray, chunk: int = 1 << 18) -> np.ndarray:
    """Chunked nearest-centroid assignment (host-resident data)."""
    cent = jnp.asarray(centroids, jnp.float32)
    chunk = _cap_chunk(chunk, centroids.shape[0])
    out = np.empty((x.shape[0],), np.int32)
    for i in range(0, x.shape[0], chunk):
        xi = jnp.asarray(x[i : i + chunk], jnp.float32)
        out[i : i + xi.shape[0]] = np.asarray(_assign_chunk(xi, cent)[0])
    return out


@functools.partial(jax.jit, static_argnames=("c",))
def _topc_chunk(x: jax.Array, cent: jax.Array, c: int):
    logits = jnp.dot(x, cent.T, precision=jax.lax.Precision.HIGHEST)
    cn = jnp.sum(cent * cent, axis=1)
    scores = 2.0 * logits - cn[None, :]
    vals, idx = jax.lax.top_k(scores, c)
    return idx.astype(jnp.int32), -vals     # (n, c) ids, partial distances


def assign_balanced(
    x: np.ndarray,
    centroids: np.ndarray,
    cap: Optional[int] = None,
    n_cand: int = 8,
    chunk: int = 1 << 18,
    hard: bool = False,
) -> np.ndarray:
    """Capacity-constrained assignment: each point goes to its nearest
    centroid *with room*, among its ``n_cand`` nearest.

    Probed inverted lists are length-biased (queries land in heavy cells),
    so imbalance directly multiplies scan work; capping list size bounds
    that factor.  A point displaced to its j-th nearest cell
    (j < n_cand ≪ nprobe) is still found because that cell is almost
    surely probed.  Points are processed confident-first (smallest
    best-distance), so boundary points — the ones cheapest to displace —
    move.

    Overflow (all ``n_cand`` candidates full) is where recall and scan
    cost trade off, so it is explicit:

    - ``hard=False`` (default): overflow rows go to their nearest cell —
      the cap is a soft target and hot cells may exceed it (a 4096-cell
      1M bench build measured max list 8.4× cap), but no point is ever
      displaced far, so recall matches the unbalanced build.
    - ``hard=True``: overflow retries with a widening candidate list;
      since k·cap ≥ n there is always a cell with room, so the cap is
      exact.  A hard cap lets the searcher's worst-query window budget
      collapse to nprobe·ceil(cap/seg) (``searcher.auto_windows``) —
      worth ~25% QPS on the flagship bench — but when the cap binds
      against large natural clusters the displaced points land in cells
      the query may not probe: a 256-list build over 512 natural
      clusters at cap=1.31×mean measured R@10 0.67 vs 0.98 unbalanced.
      Use it only with cap comfortably above the natural cluster size
      (e.g. nlist ≈ corpus mode count); a warning fires when >0.5% of
      points overflow the first-pass candidates.
    """
    n = x.shape[0]
    k = centroids.shape[0]
    if cap is None:
        cap = int(np.ceil(n / k * 1.3))
    if hard and k * cap < n:
        raise ValueError(
            f"assign_balanced(hard=True): infeasible cap — k*cap = "
            f"{k}*{cap} = {k * cap} < n = {n}; every cell fills before "
            f"all points are placed. Raise cap (balance_factor ≥ 1.0) "
            f"or nlist.")
    cent = jnp.asarray(centroids, jnp.float32)
    chunk = _cap_chunk(chunk, k)
    n_cand = min(n_cand, k)
    cand = np.empty((n, n_cand), np.int32)
    best_d = np.empty((n,), np.float32)
    for i in range(0, n, chunk):
        xi = jnp.asarray(x[i : i + chunk], jnp.float32)
        ids, dd = _topc_chunk(xi, cent, n_cand)
        cand[i : i + xi.shape[0]] = np.asarray(ids)
        best_d[i : i + xi.shape[0]] = np.asarray(dd[:, 0])
    order = np.argsort(best_d, kind="stable")
    counts = np.zeros(k, np.int64)
    out = np.full(n, -1, np.int32)
    cand_ordered = cand[order]
    for row, cands in zip(order.tolist(), cand_ordered.tolist()):
        for cl in cands:
            if counts[cl] < cap:
                out[row] = cl
                counts[cl] += 1
                break
    overflow = int((out < 0).sum())
    if not hard:
        if overflow:
            warnings.warn(
                f"assign_balanced: {overflow}/{n} points overflowed all "
                f"{n_cand} candidate cells and fell back to their nearest "
                f"cell — the cap ({cap}) is soft and max list size may "
                f"exceed it (auto_windows' worst-query bound will not "
                f"collapse). Pass hard=True / IndexConfig.balance_hard "
                f"for an exact cap.", stacklevel=2)
            rows = np.flatnonzero(out < 0)
            out[rows] = cand[rows, 0]
            np.add.at(counts, cand[rows, 0], 1)
        return out
    if overflow > max(1, n // 200):
        warnings.warn(
            f"assign_balanced(hard=True): {overflow}/{n} points "
            f"({100.0 * overflow / n:.1f}%) overflowed all {n_cand} "
            f"nearest cells — the cap ({cap}) binds against natural "
            f"cluster sizes and hard displacement at this rate costs "
            f"recall. Raise balance_factor or nlist.", stacklevel=2)
    # Widening retry for overflow rows.  Each round quadruples the
    # candidate width for the (shrinking) set of unplaced points; at
    # width == k the scan sees every cell and k·cap ≥ n guarantees one
    # has room.
    width = n_cand
    while width < k and (out < 0).any():
        width = min(width * 4, k)
        rows = np.flatnonzero(out < 0)
        rchunk = _cap_chunk(chunk, max(width, k))
        for i in range(0, rows.size, rchunk):
            ri = rows[i : i + rchunk]
            xi = jnp.asarray(x[ri], jnp.float32)
            ids = np.asarray(_topc_chunk(xi, cent, width)[0])
            for r, cands in zip(ri.tolist(), ids.tolist()):
                for cl in cands:
                    if counts[cl] < cap:
                        out[r] = cl
                        counts[cl] += 1
                        break
    assert (out >= 0).all(), "assign_balanced: capacity accounting bug"
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def _kmeanspp_init(x: jax.Array, k: int, key: jax.Array) -> jax.Array:
    """k-means++ (D²-sampling) seeding as one compiled fori_loop."""
    n, d = x.shape
    first = jax.random.randint(key, (), 0, n)
    c0 = x[first]
    min_d = jnp.sum((x - c0) ** 2, axis=1)
    cents = jnp.zeros((k, d), x.dtype).at[0].set(c0)

    def body(i, carry):
        cents, min_d = carry
        ki = jax.random.fold_in(key, i)
        # D² sampling via the Gumbel-max trick (one pass, no cumsum search)
        logits = jnp.log(jnp.maximum(min_d, 1e-30))
        idx = jnp.argmax(logits + jax.random.gumbel(ki, (n,)))
        c = x[idx]
        cents = cents.at[i].set(c)
        min_d = jnp.minimum(min_d, jnp.sum((x - c) ** 2, axis=1))
        return cents, min_d

    cents, _ = jax.lax.fori_loop(1, k, body, (cents, min_d))
    return cents


def kmeans(
    x: np.ndarray,
    k: int,
    iters: int = 15,
    seed: int = 0,
    chunk: int = 1 << 18,
    init_sample: int = 1 << 17,
    verbose: bool = False,
) -> np.ndarray:
    """Lloyd k-means with k-means++ seeding. Returns centroids ``(k, d)``.

    Deterministic given (x, k, iters, seed).  Seeding runs on a subsample of
    ``init_sample`` points; empty clusters during Lloyd are re-seeded from
    the heaviest cluster's centroid plus a small deterministic jitter.
    """
    n, d = x.shape
    rng = np.random.default_rng(seed)
    if k >= n:
        cent = np.ascontiguousarray(x, dtype=np.float32)
        pad = rng.standard_normal((k - n, d)).astype(np.float32)
        cent_dev = jnp.asarray(np.concatenate([cent, pad], axis=0))
    else:
        sample = x if n <= init_sample else x[
            np.sort(rng.choice(n, size=init_sample, replace=False))
        ]
        cent_dev = _kmeanspp_init(
            jnp.asarray(sample, jnp.float32), k, jax.random.PRNGKey(seed)
        )

    chunk = _cap_chunk(chunk, k)
    for it in range(iters):
        sums = jnp.zeros((k, d), jnp.float32)
        counts = jnp.zeros((k,), jnp.float32)
        sse = 0.0
        for i in range(0, n, chunk):
            xi = jnp.asarray(x[i : i + chunk], jnp.float32)
            a, dmin = _assign_chunk(xi, cent_dev)
            s, c = _accumulate_chunk(xi, a, k)
            sums = sums + s
            counts = counts + c
            sse += float(jnp.sum(dmin))
        counts_np = np.asarray(counts)
        new_cent = np.asarray(sums) / np.maximum(counts_np, 1.0)[:, None]
        empty = np.where(counts_np == 0)[0]
        if empty.size:
            heavy = np.argsort(-counts_np)[: empty.size]
            jitter = rng.standard_normal((empty.size, d)).astype(np.float32)
            scale = np.abs(new_cent[heavy]).mean(axis=1, keepdims=True) * 1e-3 + 1e-6
            new_cent[empty] = new_cent[heavy] + jitter * scale
        cent_dev = jnp.asarray(new_cent)
        if verbose:
            print(f"kmeans iter {it}: sse={sse:.4e} empty={empty.size}", flush=True)
    return np.asarray(cent_dev)
