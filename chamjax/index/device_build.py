"""Fully device-resident IVF-PQ build for corpora beyond fp32-in-HBM scale.

The reference builds billion-scale indexes offline on big-RAM CPU servers
(Faiss train/populate, SURVEY.md §3.5: ``Faiss_experiments/
bench_polysemous_1bn.py`` → ``extract_Enzian_U250_required_data.py``) and
ships raw memory images to the FPGA.  The TPU-native constraint is
different: the slow wire is host↔device (the axon tunnel moves ~2 MB/s, so
even the *packed* 100M-scale index — ~2 GB — must never cross it).  This
module therefore streams deterministic corpus chunks from a ``draw``
function, and trains / assigns / encodes / **packs** entirely on device,
producing a :class:`~chamjax.searcher.DeviceIVF` whose arrays are born in
HBM.

Assignment uses a two-stage scheme: a fast default-precision (bf16 on TPU)
candidate matmul → top-``cand`` shortlist → exact fp32 re-rank.  Build-time
assignment only decides which inverted list a point lives in (the query
probes ``nprobe`` lists, so near-tie flips are recoverable); the shortlist
re-rank removes essentially all bf16 flips at ~1% of the fp32 matmul cost.
Search-time ranking math stays ``precision=HIGHEST`` throughout
(see ``chamjax/ops``).
"""

from __future__ import annotations

import functools
import os
import time
import warnings
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chamjax.config import IndexConfig

DrawFn = Callable[[int, int], jax.Array]   # (start, count) -> (count, d) f32


# ---------------------------------------------------------------------------
# two-stage exact assignment
# ---------------------------------------------------------------------------

def _assign_exact_2stage(x: jax.Array, cent: jax.Array, cand: int
                         ) -> jax.Array:
    """argmin_c ||x - cent_c||² via bf16 shortlist + fp32 re-rank.

    x: (b, d) f32; cent: (nlist, d) f32 → (b,) int32.
    """
    cn = jnp.sum(cent * cent, axis=1)
    # stage 1: default precision (bf16 MXU passes) — shortlist only.
    # approx_max_k is the TPU-native partial reduction (exact on CPU); a
    # rare shortlist miss only moves a point to a near-tie list, which the
    # query-side nprobe recovers.
    scores = 2.0 * jnp.dot(x, cent.T) - cn[None, :]
    _, top = jax.lax.approx_max_k(scores, cand, recall_target=0.95)
    # stage 2: exact fp32 over the shortlist
    cc = cent[top]                                          # (b, cand, d)
    d2 = (jnp.sum(cc * cc, axis=2)
          - 2.0 * jnp.einsum("bd,bcd->bc", x, cc,
                             precision=jax.lax.Precision.HIGHEST))
    best = jnp.argmin(d2, axis=1)
    return jnp.take_along_axis(top, best[:, None], axis=1)[:, 0].astype(
        jnp.int32)


# ---------------------------------------------------------------------------
# device Lloyd (training sample resident in HBM)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("block", "cand"))
def _lloyd_iter(xb: jax.Array, cent: jax.Array, key: jax.Array,
                block: int, cand: int):
    n, d = xb.shape
    k = cent.shape[0]
    n_use = (n // block) * block
    xr = xb[:n_use].reshape(-1, block, d)

    def body(carry, x_blk):
        sums, counts = carry
        a = _assign_exact_2stage(x_blk, cent, cand)
        sums = sums.at[a].add(x_blk)
        counts = counts.at[a].add(1.0)
        return (sums, counts), None

    (sums, counts), _ = jax.lax.scan(
        body, (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32)),
        xr)
    if n_use != n:
        # the n % block tail must contribute too: dropping it biases every
        # iteration's statistics, and with n < block the scan would run
        # over ZERO blocks and Lloyd would degenerate to pure jitter
        tail = xb[n_use:]
        a_t = _assign_exact_2stage(tail, cent, cand)
        sums = sums.at[a_t].add(tail)
        counts = counts.at[a_t].add(1.0)
    new = jnp.where(counts[:, None] > 0,
                    sums / jnp.maximum(counts, 1.0)[:, None], cent)
    # empty clusters: reseed near the heaviest clusters' centroids (jittered
    # split — the same repair the host `kmeans` does, computed on device)
    empty = counts <= 0
    heavy = jnp.argsort(-counts)
    rank = jnp.cumsum(empty.astype(jnp.int32)) - 1          # index among empties
    donor = heavy[rank % k]
    scale = jnp.mean(jnp.abs(new[donor]), axis=1, keepdims=True) * 1e-3 + 1e-6
    jitter = jax.random.normal(key, (k, d), jnp.float32) * scale
    new = jnp.where(empty[:, None], new[donor] + jitter, new)
    return new, counts


@jax.jit
def _update_from_assignment(x: jax.Array, a: jax.Array, nat: jax.Array,
                            cent: jax.Array, key: jax.Array, cap: jax.Array,
                            split: jax.Array, deadband: jax.Array):
    """Centroid update for a GIVEN assignment — the balanced-Lloyd step.

    The mean update uses the capacity-constrained assignment ``a``
    (Malinen-Fränti pressure: overflow drags neighboring centroids toward
    dense regions).  With ``split`` truthy, cells whose NATURAL demand
    exceeds the cap are additionally *split at the source*: cell j needs
    ``ceil(nat_count_j/cap) - 1`` extra centroids, and that many of the
    lightest cells are killed and respawned at the over-demand donors
    (jittered by the global intra-cell RMS so the twins separate real
    sub-structure at the next assignment).  Demand must come from the
    UNCONSTRAINED nearest-cell counts ``nat`` — constrained counts are
    ≤ cap by construction, so they can never signal where density beats
    capacity.  Capacity pressure alone migrates centroids far too slowly
    on smooth skewed densities: measured at 100M/65536 (spectrum_tau=8),
    3 pressure-only iterations left max cell at 6x cap and 18% of the
    corpus as rebalance stragglers.  Empty cells beyond the split budget
    fall back to the legacy heavy-donor reseed.
    """
    k, d = cent.shape
    sums = jnp.zeros((k, d), jnp.float32).at[a].add(x)
    counts = jnp.zeros((k,), jnp.float32).at[a].add(1.0)
    nat_counts = jnp.zeros((k,), jnp.float32).at[nat].add(1.0)
    new = jnp.where(counts[:, None] > 0,
                    sums / jnp.maximum(counts, 1.0)[:, None], cent)
    empty = counts <= 0
    cap = jnp.maximum(cap, 1.0)
    # Split only what the eviction rounds genuinely cannot absorb
    # (deadband at 1.75x cap): at small counts/cell, Poisson noise alone
    # puts a few % of cells slightly over cap — chasing those with splits
    # churns more mass than it relieves (measured divergent at 65536
    # cells x 30 pts/cell: max cell 253 -> 3027 in two iterations).
    needed = jnp.where(nat_counts > cap * deadband,
                       jnp.ceil(nat_counts / cap) - 1.0, 0.0) * split
    # per-iteration seed budget keeps the churn bounded
    n_seeds = jnp.minimum(jnp.sum(needed), jnp.float32(max(k // 8, 1)))
    # victims: lightest NATURAL demand first, but only cells light enough
    # (< cap/2) that their reflowing mass cannot create a new over-cap cell
    victim_key = jnp.where(nat_counts < cap * 0.5, nat_counts, jnp.inf)
    order = jnp.argsort(victim_key)
    inv = jnp.zeros((k,), jnp.int32).at[order].set(
        jnp.arange(k, dtype=jnp.int32))               # eligibility rank
    n_seeds = jnp.minimum(n_seeds, jnp.sum(nat_counts < cap * 0.5))
    rank_f = inv.astype(jnp.float32)
    is_victim = (rank_f < n_seeds) | empty
    # donor per victim rank: over-demand cells enumerated with multiplicity
    # ``needed`` (searchsorted over the demand-sorted cumsum)
    heavy = jnp.argsort(-nat_counts)
    cum = jnp.cumsum(needed[heavy])
    pos = jnp.minimum(jnp.searchsorted(cum, rank_f, side="right"), k - 1)
    seed_donor = heavy[pos]
    erank = jnp.cumsum(empty.astype(jnp.int32)) - 1   # legacy empty reseed
    legacy_donor = heavy[erank % k]
    donor = jnp.where(rank_f < n_seeds, seed_donor, legacy_donor)
    # Respawn each twin AT A REAL MEMBER POINT of its donor cell, spread
    # across the cell's distance-sorted run.  A jittered copy of the donor
    # centroid does NOT work in high d: a random jitter direction is
    # near-orthogonal to every (x - centroid), so the twin is farther from
    # every point than the donor and captures nothing (measured at d=128:
    # 8149 of 8553 jitter-twins landed empty and were recycled as victims
    # forever).  A member point captures at least its own neighborhood.
    n = x.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    dist2 = jnp.sum((x - cent[nat]) ** 2, axis=1)
    _sa, _sd, sidx = jax.lax.sort(
        (nat, dist2, iota), num_keys=2)               # members grouped/sorted
    run_start = jnp.full((k,), n - 1, jnp.int32).at[_sa].min(iota)
    c_donor = nat_counts[donor]
    # seed s-within-donor → member at quantile (s+1)/(needed+1); legacy
    # empties cycle members by empty-rank
    cum_prev = jnp.where(pos > 0, cum[jnp.maximum(pos - 1, 0)], 0.0)
    s_within = jnp.where(rank_f < n_seeds, rank_f - cum_prev,
                         (erank % k).astype(jnp.float32))
    denom = jnp.where(rank_f < n_seeds, needed[donor] + 1.0,
                      jnp.maximum(c_donor, 1.0))
    off = jnp.floor((s_within + 1.0) * c_donor / jnp.maximum(denom, 1.0))
    off = jnp.clip(off, 0.0, jnp.maximum(c_donor - 1.0, 0.0)).astype(
        jnp.int32)
    seed_point = x[sidx[jnp.clip(run_start[donor] + off, 0, n - 1)]]
    return jnp.where(is_victim[:, None], seed_point, new), counts


def lloyd_device(x: jax.Array, k: int, iters: int = 10, seed: int = 0,
                 block: int = 4096, cand: int = 8, init: str = "auto",
                 init_sample: int = 1 << 17,
                 balance_cap: int = 0, balance_iters: int = 0,
                 balance_cand: int = 16, balance_deadband: float = 1.75,
                 verbose: bool = False) -> jax.Array:
    """Device-resident Lloyd k-means; centroids never visit the host.

    ``init``: ``"kmeans++"`` (sequential seeding on a subsample — O(k·n·d),
    only affordable for small k), ``"random"`` (distinct sample rows, the
    Faiss default for large nlist — empties are reseeded per iteration), or
    ``"auto"`` (k-means++ below 4096 clusters).  Returns (k, d) f32 on
    device.

    ``balance_cap > 0`` appends ``balance_iters`` *balanced* Lloyd
    iterations: the assignment step is capacity-constrained
    (``rebalance_assignment_device`` at ``balance_cap`` points/cell over
    the top-``balance_cand`` candidates) before the centroid update, so
    overflow from dense regions pulls neighboring centroids in and heavy
    cells split at the source (Malinen-Fränti-style balanced k-means).
    Plain Lloyd on this corpus family leaves a heavy tail (measured 8M/8192:
    max cell 33k vs mean 1k) that no post-hoc capped assignment can fix —
    18% of points had every candidate cell full.
    """
    n = x.shape[0]
    assert n >= k, (n, k)
    key = jax.random.PRNGKey(seed)
    if init == "auto":
        init = "kmeans++" if k <= 4096 else "random"
    if init == "kmeans++":
        from chamjax.index.kmeans import _kmeanspp_init
        sample = x if n <= init_sample else x[
            jax.random.permutation(key, n)[:init_sample]]
        cent = _kmeanspp_init(sample, k, key)
    else:
        perm = jax.random.permutation(key, n)[:k]
        cent = x[perm]
    for it in range(iters):
        cent, counts = _lloyd_iter(x, cent, jax.random.fold_in(key, it),
                                   block=block, cand=cand)
        if verbose:
            nz = int(jnp.sum(counts > 0))
            print(f"[lloyd] iter {it}: nonempty {nz}/{k}", flush=True)
    if balance_cap and balance_iters:
        for it in range(balance_iters):
            cells, d2 = _topc_blocked(x, cent, block=block, c=balance_cand)
            a = rebalance_assignment_device(cells, d2, balance_cap,
                                            nlist=k, hard=True, warn=False)
            nat = cells[:, 0]
            del cells, d2
            # last iteration: no split-reseed — end on an assignment-
            # validated centroid state, not freshly respawned twins
            split = jnp.float32(it < balance_iters - 1)
            cent, counts = _update_from_assignment(
                x, a, nat, cent, jax.random.fold_in(key, 1000 + it),
                jnp.float32(balance_cap), split,
                jnp.float32(balance_deadband))
            if verbose:
                mx = int(jnp.max(counts))
                print(f"[lloyd] balance iter {it}: max cell {mx} "
                      f"(cap {balance_cap})", flush=True)
    return cent


# ---------------------------------------------------------------------------
# device-native capacity-balanced assignment
# ---------------------------------------------------------------------------

def _topc_exact_2stage(x: jax.Array, cent: jax.Array, c: int) -> Tuple[
        jax.Array, jax.Array]:
    """Top-``c`` nearest cells + exact squared distances per row.

    Same bf16-shortlist + fp32-re-rank scheme as ``_assign_exact_2stage``
    (shortlist 2c wide so the exact top-c survives bf16 flips); returns
    ``(cells (b, c) i32, d2 (b, c) f32)`` ordered nearest-first with TRUE
    ||x-cent||² values — per-cell eviction compares distances of different
    points to one cell, so the ||x||² term must be present.
    """
    cn = jnp.sum(cent * cent, axis=1)
    scores = 2.0 * jnp.dot(x, cent.T) - cn[None, :]
    _, top = jax.lax.approx_max_k(scores, 2 * c, recall_target=0.95)
    cc = cent[top]                                          # (b, 2c, d)
    d2 = (jnp.sum(cc * cc, axis=2)
          - 2.0 * jnp.einsum("bd,bcd->bc", x, cc,
                             precision=jax.lax.Precision.HIGHEST))
    best_d, best = jax.lax.top_k(-d2, c)
    cells = jnp.take_along_axis(top, best, axis=1).astype(jnp.int32)
    xn = jnp.sum(x * x, axis=1, keepdims=True)
    return cells, xn - best_d


@functools.partial(jax.jit, static_argnames=("block", "c"))
def _topc_blocked(x: jax.Array, cent: jax.Array, block: int, c: int):
    """Blocked ``_topc_exact_2stage``: (n, d) → ((n, c) i32, (n, c) f32)."""
    n, d = x.shape
    n_use = (n // block) * block
    xr = x[:n_use].reshape(-1, block, d)
    _, (cells, d2) = jax.lax.scan(
        lambda _, xb: (None, _topc_exact_2stage(xb, cent, c)), None, xr)
    cells, d2 = cells.reshape(n_use, c), d2.reshape(n_use, c)
    if n_use != n:
        ct, dt = _topc_exact_2stage(x[n_use:], cent, c)
        cells = jnp.concatenate([cells, ct])
        d2 = jnp.concatenate([d2, dt])
    return cells, d2


@functools.partial(jax.jit, donate_argnums=(0,))
def _rebalance_round(r: jax.Array, cand: jax.Array, cd: jax.Array,
                     cap: jax.Array):
    """One keep-cap-best eviction round with τ-threshold skipping.

    Every point claims its rank-``r`` candidate cell; each cell keeps its
    ``cap`` nearest claimants (one global (cell, dist) sort).  Evicted
    points jump to their first LATER candidate whose cell could still
    accept them: the sort also yields each cell's current cap-th-best
    distance τ, and since kept members never leave a cell, τ only
    *tightens* in later rounds — a candidate with ``d > τ`` now is
    rejected forever, so skipping it is exact (same deferred-acceptance
    fixpoint, far fewer rounds).  The pre-τ version bumped ``r`` by one
    per round and needed ~30 full-table sorts at 33M rows (the profiled
    92% of balanced-build time); τ-skipping converges in a handful.

    Returns ``(r', moved, overflow)`` — ``moved`` is this round's bump
    count (0 ⇒ fixpoint), ``overflow`` the claimants still beyond some
    cell's cap (stragglers when ``moved`` hits 0: they exhausted their
    candidate list).
    """
    n, c = cand.shape
    nlist = cap.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    a = jnp.take_along_axis(cand, r[:, None], axis=1)[:, 0]
    d = jnp.take_along_axis(cd, r[:, None], axis=1)[:, 0]
    sa, sd, sidx = jax.lax.sort((a, d, iota), num_keys=2)
    # position within the cell's sorted run: iota - (run start), run starts
    # where the sorted cell id changes (cummax of the boundary positions)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), sa[1:] != sa[:-1]])
    run_start = jax.lax.cummax(jnp.where(boundary, iota, 0))
    pos_in_run = iota - run_start
    evict_sorted = pos_in_run >= cap[sa]
    evict = jnp.zeros((n,), bool).at[sidx].set(evict_sorted)
    # τ per cell: the cap-th best claimed distance (inf = under-full cell
    # accepts anything; cap==0 cells reject everything)
    is_tau = pos_in_run == cap[sa] - 1
    tau = jnp.full((nlist,), jnp.inf, cd.dtype).at[sa].min(
        jnp.where(is_tau, sd, jnp.inf))
    tau = jnp.where(cap <= 0, -jnp.inf, tau)
    can_move = evict & (r < c - 1)
    # first later candidate that τ does not certainly reject — computed
    # with (n,)-shaped ops only: an (n, c) f32 temporary inside jit is
    # laid out T(8,128) (minor dim 8 → 128 lanes, 16× padding) and OOMed
    # HBM at 33M rows
    first_ok = jnp.full((n,), c - 1, jnp.int32)
    has = jnp.zeros((n,), bool)
    for j in range(c - 1, 0, -1):      # keep the LOWEST qualifying j
        okj = (cd[:, j] <= tau[cand[:, j]]) & (j > r)
        first_ok = jnp.where(okj, jnp.int32(j), first_ok)
        has = has | okj
    r_new = jnp.where(can_move,
                      jnp.where(has, first_ok, jnp.int32(c - 1)), r)
    return (r_new, jnp.sum(can_move & (r_new != r)), jnp.sum(evict))


def rebalance_assignment_device(
    cand: jax.Array,          # (n, c) i32 — nearest-first candidate cells
    cd: jax.Array,            # (n, c) f32 — exact ||x - cent||² per cell
    cap,                      # int scalar or (nlist,) per-cell capacities
    *,
    nlist: Optional[int] = None,
    hard: bool = True,
    max_rounds: int = 32,
    warn: bool = True,
    verbose: bool = False,
    return_stats: bool = False,
) -> jax.Array:
    """Capacity-balanced assignment from a candidate table, on device.

    The device analogue of ``kmeans.assign_balanced``: the host version's
    confident-first greedy loop is inherently sequential, so this uses
    parallel eviction rounds instead — every point claims its best
    not-yet-refused candidate, overfull cells keep their ``cap`` nearest
    claimants, losers move on.  Converges when no point moves (each round's
    bumps strictly grow the rank vector, bounded by ``c``).

    ``cap`` may be per-cell (a (nlist,) int array) — the part-split corpus
    path hands each part the cells' REMAINING capacity, which wastes none
    of the budget a scalar cap/parts would strand.  A scalar cap needs
    ``nlist`` to build the array (falls back to max(cand)+1).

    Stragglers (evicted from all ``c`` candidates) revert to their
    NEAREST cell in both modes — every candidate is full, so the cap is
    exceeded wherever they sit, and the nearest cell costs nothing extra
    while keeping them findable; ``hard`` mode additionally warns that
    the cap was not met.  With cap ≥ ~1.3× mean and nlist ≈ corpus mode
    count, stragglers measure zero (see RESULTS.md).
    """
    n, c = cand.shape
    cap_desc = "per-cell"
    if np.ndim(cap) == 0:
        cap_desc = str(int(cap))
        if nlist is None:
            nlist = int(jnp.max(cand)) + 1
        cap = jnp.full((nlist,), int(cap), jnp.int32)
    else:
        cap = jnp.asarray(cap, jnp.int32)
    r = jnp.zeros((n,), jnp.int32)
    overflow = 0
    # tail cutoff: each round costs a full (n, 3)-array device sort (the
    # dominant build primitive); once movers fall below ~1e-5·n the round
    # moves a few hundred points for the same sort — stop and let the
    # soft fallback settle them at their nearest cell (cap exceedance
    # ≤ the cutoff, far below the straggler allowance).  thr=0 at small n
    # keeps test-scale runs exact.
    thr = int(n * 1e-5)
    for rnd in range(max_rounds):
        r, moved, overflow = _rebalance_round(r, cand, cd, cap)
        moved, overflow = int(moved), int(overflow)
        if verbose:
            print(f"[rebalance] round {rnd}: moved {moved} "
                  f"overflow {overflow}", flush=True)
        if moved == 0 or (moved < thr and rnd >= 2):
            break
    a = jnp.take_along_axis(cand, r[:, None], axis=1)[:, 0]
    if overflow:
        if hard and warn:
            warnings.warn(
                f"rebalance_assignment_device: {overflow}/{n} points "
                f"exhausted all {c} candidate cells — the cap ({cap_desc}) "
                f"binds against natural cluster sizes; those cells exceed "
                f"the cap and auto_windows' worst-query bound will not "
                f"fully collapse. Raise balance_factor, nlist, or cand — "
                f"or train with balanced Lloyd iterations (lloyd_device "
                f"balance_cap), which removes the heavy cells at the "
                f"source.", stacklevel=2)
        # Stragglers go home to their NEAREST cell in both modes: every
        # candidate is full, so the cap is exceeded wherever they sit —
        # the nearest cell costs nothing extra and keeps them findable.
        a = jnp.where(_evicted_mask(r, cand, cd, cap), cand[:, 0], a)
    a = a.astype(jnp.int32)
    return (a, overflow) if return_stats else a


@jax.jit
def _evicted_mask(r: jax.Array, cand: jax.Array, cd: jax.Array,
                  cap: jax.Array):
    """Recompute the fixpoint's evicted set (soft-fallback selection)."""
    n, _c = cand.shape
    iota = jnp.arange(n, dtype=jnp.int32)
    a = jnp.take_along_axis(cand, r[:, None], axis=1)[:, 0]
    d = jnp.take_along_axis(cd, r[:, None], axis=1)[:, 0]
    sa, _sd, sidx = jax.lax.sort((a, d, iota), num_keys=2)
    boundary = jnp.concatenate([jnp.ones((1,), bool), sa[1:] != sa[:-1]])
    run_start = jax.lax.cummax(jnp.where(boundary, iota, 0))
    evict_sorted = (iota - run_start) >= cap[sa]
    return jnp.zeros((n,), bool).at[sidx].set(evict_sorted)


# ---------------------------------------------------------------------------
# streamed assign + PQ encode
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("block", "cand"))
def _assign_blocked(x: jax.Array, cent: jax.Array, block: int, cand: int
                    ) -> jax.Array:
    """Blocked two-stage assignment: (n, d) → (n,) int32 without ever
    materializing the full (n, nlist) score matrix."""
    n, d = x.shape
    n_use = (n // block) * block
    xr = x[:n_use].reshape(-1, block, d)
    _, a = jax.lax.scan(
        lambda _, xb: (None, _assign_exact_2stage(xb, cent, cand)), None, xr)
    a = a.reshape(n_use)
    if n_use != n:
        a = jnp.concatenate([a, _assign_exact_2stage(x[n_use:], cent, cand)])
    return a


@functools.partial(jax.jit, static_argnames=("block", "cand", "by_residual"))
def _assign_encode_chunk(x: jax.Array, cent: jax.Array, cbooks: jax.Array,
                         block: int, cand: int, by_residual: bool):
    """x: (C, d) → (assignment (C,) i32, codes (C, m) u8), C % block == 0."""
    C, d = x.shape
    m, ksub, dsub = cbooks.shape
    xr = x.reshape(-1, block, d)
    cb_n = jnp.sum(cbooks * cbooks, axis=2)                 # (m, ksub)

    def body(_, x_blk):
        a = _assign_exact_2stage(x_blk, cent, cand)
        v = x_blk - cent[a] if by_residual else x_blk
        xs = jnp.transpose(v.reshape(block, m, dsub), (1, 0, 2))
        scores = (2.0 * jnp.einsum(
            "mnd,mkd->mnk", xs, cbooks,
            precision=jax.lax.Precision.HIGHEST) - cb_n[:, None, :])
        codes = jnp.argmax(scores, axis=2).T.astype(jnp.uint8)  # (block, m)
        return None, (a, codes)

    _, (a, codes) = jax.lax.scan(body, None, xr)
    return a.reshape(C), codes.reshape(C, m)


@functools.partial(jax.jit, static_argnames=("block", "by_residual"))
def _encode_assigned_chunk(x: jax.Array, a: jax.Array, cent: jax.Array,
                           cbooks: jax.Array, block: int, by_residual: bool):
    """PQ-encode against a FIXED assignment (the balanced two-pass path):
    x (C, d), a (C,) i32 → codes (C, m) u8, C % block == 0."""
    C, d = x.shape
    m, ksub, dsub = cbooks.shape
    xr = x.reshape(-1, block, d)
    ar = a.reshape(-1, block)
    cb_n = jnp.sum(cbooks * cbooks, axis=2)                 # (m, ksub)

    def body(_, inp):
        x_blk, a_blk = inp
        v = x_blk - cent[a_blk] if by_residual else x_blk
        xs = jnp.transpose(v.reshape(block, m, dsub), (1, 0, 2))
        scores = (2.0 * jnp.einsum(
            "mnd,mkd->mnk", xs, cbooks,
            precision=jax.lax.Precision.HIGHEST) - cb_n[:, None, :])
        return None, jnp.argmax(scores, axis=2).T.astype(jnp.uint8)

    _, codes = jax.lax.scan(body, None, (xr, ar))
    return codes.reshape(C, m)


# ---------------------------------------------------------------------------
# device packing (CSR layout with per-list padding, computed on device)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("list_pad", "cap"))
def _pack_layout_core(order: jax.Array, list_len: jax.Array,
                      src_start: jax.Array, own: jax.Array,
                      list_pad: int, cap: int):
    """Gather map into a padded CSR layout covering the ``own``-masked lists.

    ``order``/``src_start`` index the globally sorted corpus; lists outside
    ``own`` collapse to zero width (the full-size start/len tables keep
    their slots — the sharded-search convention, foreign lists scan as
    empty).  Owned lists pad to ``list_pad`` multiples (min one block).
    The boundary-mark trick tolerates the zero-width lists: multiple lists
    may "start" at one slot, and cumsum resolves to the last (the owned
    one).
    """
    n = order.shape[0]
    eff = jnp.where(own, list_len, 0).astype(jnp.int32)
    padded = jnp.where(
        own,
        jnp.maximum(((eff + list_pad - 1) // list_pad) * list_pad, list_pad),
        0).astype(jnp.int32)
    list_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    mark = jnp.zeros((cap,), jnp.int32).at[list_start].add(1)
    list_of = jnp.cumsum(mark) - 1
    offset = jnp.arange(cap, dtype=jnp.int32) - list_start[list_of]
    valid = offset < eff[list_of]
    src = jnp.clip(src_start[list_of] + offset, 0, n - 1)
    gather_ids = jnp.where(valid, order[src], jnp.int32(-1))
    return gather_ids, list_start, eff


@functools.partial(jax.jit, static_argnames=("nlist", "list_pad", "cap"))
def _pack_layout(assignment: jax.Array, nlist: int, list_pad: int, cap: int):
    """Sorted order + gather map into the padded CSR layout.

    Mirrors the host ``_pack_lists`` (``chamjax/index/ivf.py``) — same
    invariants (per-list padding to ``list_pad`` multiples, id -1 padding) —
    but shapes are static: the packed capacity ``cap`` over-allocates the
    worst-case padding (< ``list_pad`` waste per list) instead of using the
    data-dependent exact total.
    """
    order = jnp.argsort(assignment, stable=True).astype(jnp.int32)
    list_len = jnp.bincount(assignment, length=nlist).astype(jnp.int32)
    src_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(list_len)[:-1].astype(jnp.int32)])
    own = jnp.ones((nlist,), bool)
    return _pack_layout_core(order, list_len, src_start, own,
                             list_pad=list_pad, cap=cap)


@jax.jit
def _pack_codes_t_oneshot(codes: jax.Array, gather_ids: jax.Array
                          ) -> jax.Array:
    g = jnp.maximum(gather_ids, 0)
    packed = jnp.where(gather_ids[:, None] >= 0, codes[g], jnp.uint8(0))
    return packed.T


@functools.partial(jax.jit, donate_argnums=(0,))
def _pack_codes_t_chunk(acc: jax.Array, codes: jax.Array,
                        gidx: jax.Array, start) -> jax.Array:
    g = jnp.maximum(gidx, 0)
    part = jnp.where(gidx[:, None] >= 0, codes[g], jnp.uint8(0)).T
    return jax.lax.dynamic_update_slice(acc, part, (0, start))


# Above this many packed bytes, gather in column chunks through a donated
# accumulator: the one-shot pack's live set is codes (n·m) + the (cap, m)
# gather + the (m, cap) transpose — ~3× the corpus — which OOMs a 16 GB
# chip near 256M rows; chunked peak is codes + accumulator + one chunk.
_PACK_CHUNK_BYTES = 1 << 30
_PACK_CHUNK_COLS = 1 << 24


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("seg",))
def _pack_codes_tiled_chunk(acc: jax.Array, codes: jax.Array,
                            gidx: jax.Array, tile0, seg: int) -> jax.Array:
    g = jnp.maximum(gidx, 0)
    part = jnp.where(gidx[:, None] >= 0, codes[g], jnp.uint8(0)).T  # (m, c)
    m = part.shape[0]
    part = part.reshape(m, part.shape[1] // seg, seg).transpose(1, 0, 2)
    return jax.lax.dynamic_update_slice(acc, part, (tile0, 0, 0))


def _pack_codes_tiled(codes: jax.Array, gather_ids: jax.Array,
                      seg: int) -> jax.Array:
    """codes (n, m) u8 + seg-aligned gather map (cap_t,) → tiled packed
    (cap_t/seg, m, seg) u8, gathered DIRECTLY into tile-major layout.

    The flat-then-retile path peaks at 2× the packed slab (codes_t plus
    its transpose both resident) — which is what OOMed the 1B PQ32 shard
    build on a 16 GB chip.  Gathering straight into the tiled
    accumulator (donated per chunk) peaks at codes + ONE slab + a chunk."""
    n, m = codes.shape
    cap = gather_ids.shape[0]
    assert cap % seg == 0, (cap, seg)
    acc = jnp.zeros((cap // seg, m, seg), jnp.uint8)
    # bytes-based chunk: the gather+transpose temps pad ~2x in XLA, and a
    # fixed 16M-column chunk at m=64 compiles to >4 GB of HLO temps
    # (compile-time OOM on the PQ64 shard); ~256 MB parts keep temps ~1 GB
    step = max(seg, ((256 << 20) // m // seg) * seg)
    for s in range(0, cap, step):
        e = min(s + step, cap)
        acc = _pack_codes_tiled_chunk(acc, codes, gather_ids[s:e],
                                      s // seg, seg)
    return acc


def _pack_codes_t(codes: jax.Array, gather_ids: jax.Array) -> jax.Array:
    """codes (n, m) u8 + gather map (cap,) → transposed packed (m, cap) u8.

    No donation of ``codes``: the (n, m) input aval can never alias the
    (m, cap) output (and the sharded builder re-packs the same codes per
    shard).  Callers that care about peak HBM must ``del``/``.delete()``
    the codes buffer after the last pack instead."""
    n, m = codes.shape
    cap = gather_ids.shape[0]
    if cap * m <= _PACK_CHUNK_BYTES:
        return _pack_codes_t_oneshot(codes, gather_ids)
    acc = jnp.zeros((m, cap), jnp.uint8)
    # two compiles total: the full-chunk shape + (maybe) one tail shape;
    # every update slab fits exactly, so dynamic_update_slice never clamps
    for s in range(0, cap, _PACK_CHUNK_COLS):
        e = min(s + _PACK_CHUNK_COLS, cap)
        acc = _pack_codes_t_chunk(acc, codes, gather_ids[s:e], s)
    return acc


# ---------------------------------------------------------------------------
# the full streamed build
# ---------------------------------------------------------------------------

def _train_encode_stream(draw, n, cfg, xt, *, kmeans_iters, pq_iters, seed,
                         chunk, block, cand, verbose, quantizers=None):
    """Shared front half of the streamed builders: (optionally OPQ-)train
    quantizers and stream-assign/encode the corpus.  Returns
    ``(cent, cbooks, opq_R, assignment, codes)`` — all device arrays.

    ``quantizers=(cent, cbooks, opq_R)`` skips training entirely and
    encodes against the given arrays — the shard-at-a-time 1B path trains
    once globally, then row-shards every list across sequential builds
    (the FPGA's own 4-bank round-robin list split,
    ``extract_Enzian_U250_required_data.py:296-360``, scaled up)."""
    from chamjax.index.pq import train_opq, train_pq

    # chunk must be a block multiple: every full-chunk encode call
    # reshapes (-1, block, d) — round down (min one block) rather than
    # crash on an opaque reshape error inside jit (same rule as
    # streamed_ground_truth)
    chunk = max((chunk // block) * block, block)

    assert cfg.nbits == 8, "streamed device build is specialized for 8-bit PQ"
    if quantizers is not None:
        cent, cbooks, opq_R = quantizers
        cent = jnp.asarray(cent, jnp.float32)
        cbooks = jnp.asarray(cbooks, jnp.float32)
        if opq_R is not None:
            opq_R = jnp.asarray(opq_R, jnp.float32)
            base_draw = draw

            def draw(s, c, _base=base_draw, _R=opq_R):   # noqa: F811
                return jnp.dot(_base(s, c), _R,
                               precision=jax.lax.Precision.HIGHEST)
    else:
        if callable(xt):
            # lazy sample: materialized here and freed right after
            # training, so a multi-GB (nt, d) sample doesn't sit in HBM
            # through the pack
            xt = xt()
        xt = xt.astype(jnp.float32)

        opq_R = None
        if cfg.opq:
            # OPQ trains host-side on a small subsample — the single host
            # pull this builder allows (≤131k rows).
            sample = np.asarray(xt[: 1 << 17])
            if verbose:
                print(f"[build-dev] OPQ on {sample.shape}", flush=True)
            R_host, _ = train_opq(sample, cfg.m, nbits=cfg.nbits, seed=seed)
            opq_R = jnp.asarray(R_host)
            xt = jnp.dot(xt, opq_R, precision=jax.lax.Precision.HIGHEST)
            base_draw = draw

            def draw(s, c, _base=base_draw, _R=opq_R):   # noqa: F811
                return jnp.dot(_base(s, c), _R,
                               precision=jax.lax.Precision.HIGHEST)
        if verbose:
            print(f"[build-dev] lloyd nlist={cfg.nlist} on {xt.shape}",
                  flush=True)
        # balanced builds finish training with balanced-Lloyd iterations
        # (sample-scaled cap): heavy cells split at the source, so the
        # corpus-side rebalance below rarely hits stragglers
        bal_cap = (int(np.ceil(xt.shape[0] / cfg.nlist
                               * cfg.balance_factor))
                   if cfg.balanced else 0)
        cent = lloyd_device(xt, cfg.nlist, iters=kmeans_iters, seed=seed,
                            block=block, cand=cand, verbose=verbose,
                            balance_cap=bal_cap,
                            balance_iters=(cfg.balance_train_iters
                                           if bal_cap else 0),
                            balance_deadband=cfg.balance_deadband)

        # PQ trains on (residuals of) the training sample — train_pq keeps
        # device arrays on device, pulling (m, 256, dsub) per iteration.
        a_t = _assign_blocked(xt, cent, block=block, cand=cand)
        train_vecs = xt - cent[a_t] if cfg.by_residual else xt
        if verbose:
            print(f"[build-dev] PQ m={cfg.m}", flush=True)
        cbooks = jnp.asarray(train_pq(train_vecs, cfg.m, nbits=cfg.nbits,
                                      iters=pq_iters, seed=seed))
        del xt, train_vecs, a_t      # free the training sample before the
        #                              corpus-sized encode/pack buffers

    n_use = (n // block) * block
    tail = n - n_use

    if cfg.balanced:
        # Stage profiling (VERDICT r3 #9): CHAMJAX_BUILD_PROFILE=1 syncs
        # the device after each stage (one-element pull — program order ⇒
        # the pull lands after all prior work, the only honest sync under
        # the axon tunnel) and reports per-stage seconds in the stats
        # dict.  Unprofiled builds never sync (stages overlap as usual).
        prof = os.environ.get("CHAMJAX_BUILD_PROFILE", "0") == "1"
        stage_s = {"candidates": 0.0, "rebalance": 0.0, "encode": 0.0}

        def _sync(arr):
            if prof:
                # index, don't ravel: ravel of a (n, cand) T(8,128)-tiled
                # array compiles a full padded relayout copy (measured
                # 16 GB HLO temp at 33M rows — an instant OOM)
                np.asarray(arr[(0,) * arr.ndim])

        _t_stage = time.perf_counter()

        def _lap(name, arr):
            nonlocal _t_stage
            _sync(arr)
            stage_s[name] += time.perf_counter() - _t_stage
            _t_stage = time.perf_counter()

        # Two-pass balanced build: pass 1 streams the corpus into a
        # top-``cand`` candidate table (cells + exact d²), the parallel
        # eviction rounds rebalance it under the cap, pass 2 re-streams to
        # encode residuals against the FINAL cells.  Costs one extra draw
        # pass (device-PRNG, cheap) over the single-pass path; the prize
        # is a hard-capped list table that collapses auto_windows'
        # worst-query budget to ~nprobe windows (see RESULTS.md).
        cap_list = int(np.ceil(n / cfg.nlist * cfg.balance_factor))
        # Peak-HBM bound: the (n, cand) i32+f32 candidate table plus the
        # eviction sort transients OOM a 16 GB chip past ~110M rows.  Split
        # the corpus into contiguous part ranges, each rebalanced under the
        # cells' REMAINING capacity (cumulative proportional budget) —
        # draws are iid row streams, so every part is a random sample
        # (measured OOM: 134M-row 1B shard, table 8.6 GB + sorts).
        parts = cfg.balance_parts or max(1, -(-(n * cand * 8) // (7 << 30)))
        ranges = [(s, min(chunk, n_use - s)) for s in range(0, n_use, chunk)]
        if tail:
            ranges.append((n_use, tail))
        groups = [g for g in np.array_split(np.arange(len(ranges)), parts)
                  if len(g)]
        assignment, n_stragglers = [], 0
        # the (block, nlist) stage-1 scores are the other transient hog:
        # bound them to ~1 GB (at nlist=65536 this keeps the full block)
        blk_t = min(block, max(256, (1 << 30) // (4 * cfg.nlist)))
        # per-cell REMAINING capacity: part i is budgeted the cumulative
        # proportional cap minus what earlier parts used, so no cell
        # strands budget the way a scalar cap/parts would (a part only
        # sees ~n/parts rows, but its dense cells can still fill up to the
        # whole remaining cap)
        used = jnp.zeros((cfg.nlist,), jnp.int32)
        rows_done = 0
        for g in groups:
            cands, cds = [], []
            for gi in g:
                s, c = ranges[gi]
                x = draw(s, c)
                # always block at blk_t: _topc_blocked handles the
                # c % blk_t tail internally (one sub-blk_t call), while
                # block=c would materialize the full (c, nlist) scores
                cell_c, d2_c = _topc_blocked(x, cent, block=blk_t, c=cand)
                cands.append(cell_c)
                cds.append(d2_c)
                del x
                if verbose:
                    print(f"[build-dev] candidates {s + c}/{n}", flush=True)
            cand_t = jnp.concatenate(cands) if len(cands) > 1 else cands[0]
            cd_t = jnp.concatenate(cds) if len(cds) > 1 else cds[0]
            del cands, cds
            _lap("candidates", cand_t)
            rows_done += int(cand_t.shape[0])
            budget = int(np.ceil(cap_list * rows_done / n))
            cap_arr = jnp.maximum(jnp.minimum(budget, cap_list) - used, 0)
            a_part, strag = rebalance_assignment_device(
                cand_t, cd_t, cap_arr, hard=cfg.balance_hard,
                verbose=verbose, return_stats=True)
            del cand_t, cd_t
            _lap("rebalance", a_part)
            assignment.append(a_part)
            n_stragglers += strag
            if len(groups) > 1:
                used = used + jnp.bincount(
                    a_part, length=cfg.nlist).astype(jnp.int32)
        assignment = (jnp.concatenate(assignment) if len(assignment) > 1
                      else assignment[0])
        codes = []
        for s in range(0, n_use, chunk):
            c = min(chunk, n_use - s)
            x = draw(s, c)
            codes.append(_encode_assigned_chunk(
                x, assignment[s:s + c], cent, cbooks, block=block,
                by_residual=cfg.by_residual))
            del x
            if verbose:
                print(f"[build-dev] encoded {s + c}/{n}", flush=True)
        if tail:
            codes.append(_encode_assigned_chunk(
                draw(n_use, tail), assignment[n_use:], cent, cbooks,
                block=tail, by_residual=cfg.by_residual))
        codes = jnp.concatenate(codes) if len(codes) > 1 else codes[0]
        _lap("encode", codes)
        stats = {"stragglers": n_stragglers, "cap": cap_list}
        if prof:
            stats["stage_s"] = {k: round(v, 2) for k, v in stage_s.items()}
            if verbose:
                print(f"[build-dev] stage profile: {stats['stage_s']}",
                      flush=True)
        return cent, cbooks, opq_R, assignment, codes, stats

    # streamed assign + encode; the non-block-aligned tail runs as one
    # extra small-shape call (one extra compile, zero dropped rows)
    assigns, codes = [], []
    for s in range(0, n_use, chunk):
        c = min(chunk, n_use - s)
        x = draw(s, c)
        a_c, code_c = _assign_encode_chunk(
            x, cent, cbooks, block=block, cand=cand,
            by_residual=cfg.by_residual)
        assigns.append(a_c)
        codes.append(code_c)
        del x
        if verbose:
            print(f"[build-dev] encoded {s + c}/{n}", flush=True)
    if tail:
        a_c, code_c = _assign_encode_chunk(
            draw(n_use, tail), cent, cbooks, block=tail, cand=cand,
            by_residual=cfg.by_residual)
        assigns.append(a_c)
        codes.append(code_c)
    assignment = jnp.concatenate(assigns) if len(assigns) > 1 else assigns[0]
    codes = jnp.concatenate(codes) if len(codes) > 1 else codes[0]
    return cent, cbooks, opq_R, assignment, codes, {}


def build_ivfpq_device(
    draw: DrawFn,
    n: int,
    cfg: IndexConfig,
    xt: jax.Array,
    *,
    kmeans_iters: int = 10,
    pq_iters: int = 10,
    seed: int = 0,
    chunk: int = 1 << 22,
    block: int = 4096,
    cand: int = 8,
    tail_pad: Optional[int] = None,
    verbose: bool = False,
    quantizers=None,
    tile_seg: int = 0,
    tile_only: bool = False,
):
    """Train + populate an IVF-PQ index without ever materializing the
    corpus (neither on host nor fully in HBM).

    ``draw(start, count)`` must return corpus rows ``[start, start+count)``
    as a device f32 array, deterministically.  Returns ``(DeviceIVF,
    info)`` where ``info`` carries host copies of the (small) list tables
    for searcher auto-sizing.

    Streamed parity point for the reference's offline pipeline at the
    100M–1B scale it targets (SIFT100M/1000M, ``BASELINE.md``).  OPQ is
    supported: ``cfg.opq`` host-trains the rotation on a ≤131k-row sample
    inside ``_train_encode_stream`` and folds it into ``draw``; only the
    *sharded* builder asserts it away.

    ``quantizers=(centroids, codebooks, opq_R)`` populates against preset
    quantizers (no training) — the shard-at-a-time path for corpora beyond
    one chip's HBM (``benchmarks/bench_1b.py``).
    """
    from chamjax.ops.scan_seg import MAX_SEG
    from chamjax.searcher import DeviceIVF

    # resident-tier int32 id space (reference ids are uint64 end-to-end,
    # SRC/types.hpp): the padded capacity below must fit int32 or row
    # addressing wraps silently — shard past this (bench_1b's per-shard
    # local ids) or serve from the int64-native streamed tier
    assert n + cfg.nlist * max(cfg.list_pad, tile_seg, 1) < 2 ** 31, (
        f"{n} rows + worst-case pad overflow the int32 id space; shard "
        "the corpus or use the streamed tier")
    if tile_seg:
        # tile-aligned pack: list_pad = lcm(list_pad, tile_seg) puts every
        # list on a tile boundary, so the seg-tiled twin for the
        # BlockSpec-pipelined scan is ONE reshape+transpose of codes_t —
        # no corpus-sized gather (whose fresh compile OOM-killed the
        # remote compile helper; see searcher.retile_device_ivf notes)
        import dataclasses
        import math
        cfg = dataclasses.replace(
            cfg, list_pad=math.lcm(max(cfg.list_pad, 1), tile_seg))
    if tail_pad is None:
        tail_pad = 8192
    cent, cbooks, opq_R, assignment, codes, binfo = _train_encode_stream(
        draw, n, cfg, xt, kmeans_iters=kmeans_iters, pq_iters=pq_iters,
        seed=seed, chunk=chunk, block=block, cand=cand, verbose=verbose,
        quantizers=quantizers)
    n_use = n

    # device pack into the searcher's CSR layout (+MAX_SEG overread pad)
    cap = n_use + cfg.nlist * cfg.list_pad + tail_pad
    gather_ids, list_start, list_len = _pack_layout(
        assignment, nlist=cfg.nlist, list_pad=cfg.list_pad, cap=cap)
    del assignment
    # pad the gather map BEFORE packing so the kernel-overread tail
    # (MAX_SEG zero rows / -1 ids) is written in place — a post-pack
    # concatenate doubles the corpus-sized codes_t at peak, which is what
    # OOMed the 256M fine-nlist build on a 16 GB chip
    ids = jnp.concatenate(
        [gather_ids, jnp.full((MAX_SEG,), -1, jnp.int32)])
    del gather_ids

    codes_tiled = None
    if tile_seg and tile_only:
        # PQ32/PQ64 shards at 1B scale: gather straight into the tiled
        # layout — no flat twin, no 2×-slab retile peak
        cap_t = -(-cap // tile_seg) * tile_seg     # ≤ cap + MAX_SEG tail
        codes_tiled = _pack_codes_tiled(codes, ids[:cap_t], tile_seg)
        del codes
        codes_t = None
        jax.block_until_ready(codes_tiled)
        if verbose:
            print(f"[build-dev] packed tiled cap={cap} "
                  f"({cap / max(n_use, 1):.3f}x)", flush=True)
    else:
        codes_t = _pack_codes_t(codes, ids)
        del codes
        if verbose:
            print(f"[build-dev] packed cap={cap} "
                  f"({cap / max(n_use, 1):.3f}x)", flush=True)
        if tile_seg:
            cap_t = -(-cap // tile_seg) * tile_seg
            codes_tiled = (codes_t[:, :cap_t]
                           .reshape(codes_t.shape[0], cap_t // tile_seg,
                                    tile_seg).transpose(1, 0, 2))
    dev = DeviceIVF(centroids=cent, codebooks=cbooks, codes_t=codes_t,
                    ids=ids, list_start=list_start, list_len=list_len,
                    opq_R=opq_R, codes_tiled=codes_tiled)
    info = {
        "list_len": np.asarray(list_len),
        "list_start": np.asarray(list_start),
        "ntotal": n_use,
        "n_pad": cap,
        **binfo,
    }
    return dev, info


# ---------------------------------------------------------------------------
# streamed exact ground truth (same draw stream as the build)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "block"))
def _gt_chunk(xq: jax.Array, x: jax.Array, start: jax.Array,
              best_d: jax.Array, best_i: jax.Array, k: int, block: int):
    C, d = x.shape
    xr = x.reshape(-1, block, d)

    def body(carry, inp):
        bd, bi = carry
        x_blk, b0 = inp
        d2 = (jnp.sum(x_blk * x_blk, axis=1)[None, :]
              - 2.0 * jnp.dot(xq, x_blk.T,
                              precision=jax.lax.Precision.HIGHEST))
        cd, ci = jax.lax.top_k(-d2, min(k, block))
        ci = ci.astype(jnp.int32) + b0
        dall = jnp.concatenate([bd, -cd], axis=1)
        iall = jnp.concatenate([bi, ci], axis=1)
        neg, pos = jax.lax.top_k(-dall, k)
        return (-neg, jnp.take_along_axis(iall, pos, axis=1)), None

    offs = start + jnp.arange(xr.shape[0], dtype=jnp.int32) * block
    (best_d, best_i), _ = jax.lax.scan(body, (best_d, best_i), (xr, offs))
    return best_d, best_i


def compute_ground_truth_streamed(
    draw: DrawFn, n: int, xq: jax.Array, k: int = 10,
    chunk: int = 1 << 22, block: int = 1 << 20,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact squared-L2 top-k over a streamed corpus (HIGHEST precision).

    Returns ``(ids (nq, k) int64, dists (nq, k) float32)`` with true squared
    distances.  Parity: ``Faiss_experiments/compute_ground_truth.py``.
    """
    xq = xq.astype(jnp.float32)
    nq = xq.shape[0]
    best_d = jnp.full((nq, k), jnp.inf, jnp.float32)
    best_i = jnp.full((nq, k), -1, jnp.int32)
    n_use = (n // block) * block
    chunk = max((chunk // block) * block, block)
    for s in range(0, n_use, chunk):
        c = min(chunk, n_use - s)
        x = draw(s, c)
        best_d, best_i = _gt_chunk(xq, x, jnp.int32(s), best_d, best_i,
                                   k=k, block=min(block, c))
        del x
    tail = n - n_use
    if tail:    # non-aligned tail: one extra small-shape call
        best_d, best_i = _gt_chunk(xq, draw(n_use, tail), jnp.int32(n_use),
                                   best_d, best_i, k=k, block=tail)
    qn = jnp.sum(xq * xq, axis=1, keepdims=True)
    return (np.asarray(best_i, np.int64), np.asarray(best_d + qn))


def build_ivfpq_device_sharded(
    draw: DrawFn,
    n: int,
    cfg: IndexConfig,
    xt: jax.Array,
    n_shards: int,
    *,
    kmeans_iters: int = 10,
    pq_iters: int = 10,
    seed: int = 0,
    chunk: int = 1 << 22,
    block: int = 4096,
    cand: int = 8,
    tail_pad: int = 8192,
    verbose: bool = False,
    tile_seg: int = 0,
):
    """Streamed build directly into the mesh-sharded layout.

    Produces a :class:`~chamjax.parallel.sharded_search.ShardedIVF`
    (shards stacked on axis 0, ready for ``place_sharded`` over a
    ``lists`` mesh axis) without the corpus or any shard ever visiting the
    host — the 1B-scale growth path: one v5e holds ~100M×PQ16, a pod slice
    holds the reference's SIFT1000M working set as 8-16 such shards.
    List→shard assignment is the same longest-first greedy row balance as
    the host ``shard_index``; the only host round-trip is the (nlist,)
    length table used to size the static shard capacity.

    ``tile_seg`` > 0 packs every list on ``tile_seg`` boundaries and emits
    the seg-tiled ``codes_tiled`` layout for the BlockSpec-pipelined scan
    (the flat ``codes_t`` twin is dropped — one resident layout per shard,
    like the single-chip ``build_ivfpq_device(tile_seg=)`` path).
    """
    from chamjax.ops.scan_seg import MAX_SEG
    from chamjax.parallel.sharded_search import ShardedIVF

    if tile_seg:
        import dataclasses
        import math
        cfg = dataclasses.replace(
            cfg, list_pad=math.lcm(max(cfg.list_pad, 1), tile_seg))
    cent, cbooks, opq_R, assignment, codes, binfo = _train_encode_stream(
        draw, n, cfg, xt, kmeans_iters=kmeans_iters, pq_iters=pq_iters,
        seed=seed, chunk=chunk, block=block, cand=cand, verbose=verbose)

    nlist, pad = cfg.nlist, cfg.list_pad
    order = jnp.argsort(assignment, stable=True).astype(jnp.int32)
    list_len = jnp.bincount(assignment, length=nlist).astype(jnp.int32)
    src_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(list_len)[:-1].astype(jnp.int32)])
    del assignment

    # greedy longest-first row balance (host: the table is (nlist,) ints)
    ll = np.asarray(list_len)
    padded = (np.maximum(-(-np.maximum(ll, 1) // pad), 1) * pad).astype(
        np.int64)
    owner = np.zeros(nlist, np.int32)
    loads = np.zeros(n_shards, np.int64)
    for l in np.argsort(-ll, kind="stable"):
        s = int(np.argmin(loads))
        owner[l] = s
        loads[s] += int(padded[l])
    cap = int(loads.max()) + tail_pad
    if tile_seg:
        cap = -(-cap // tile_seg) * tile_seg
    if verbose:
        print(f"[build-dev] shard loads rows={loads.tolist()} cap={cap}",
              flush=True)

    codes_s, ids_s, starts_s, lens_s = [], [], [], []
    owner_dev = jnp.asarray(owner)
    for s in range(n_shards):
        g_ids, st, ln = _pack_layout_core(
            order, list_len, src_start, owner_dev == s,
            list_pad=pad, cap=cap)
        # pad the gather map BEFORE packing (same trick as the non-sharded
        # path above): a post-pack concatenate transiently doubles the
        # shard's codes_t at peak HBM, alongside the still-live corpus-
        # sized `codes` buffer
        g_ids = jnp.concatenate(
            [g_ids, jnp.full((MAX_SEG,), -1, jnp.int32)])
        ids_s.append(g_ids)
        packed_t = _pack_codes_t(codes, g_ids)
        if tile_seg:
            # list_pad is a tile_seg multiple and cap is tile-rounded, so
            # the seg-tiled twin is ONE reshape+transpose (no gather)
            m = packed_t.shape[0]
            packed_t = (packed_t[:, :cap]
                        .reshape(m, cap // tile_seg, tile_seg)
                        .transpose(1, 0, 2))
        codes_s.append(packed_t)
        starts_s.append(st)
        lens_s.append(ln)
    del codes, order

    sharded = ShardedIVF(
        centroids=cent,
        codebooks=cbooks,
        codes_t=None if tile_seg else jnp.stack(codes_s),
        ids=jnp.stack(ids_s),
        list_start=jnp.stack(starts_s),
        list_len=jnp.stack(lens_s),
        codes_tiled=jnp.stack(codes_s) if tile_seg else None,
        opq_R=opq_R,
    )
    info = {
        "list_len": ll,
        "owner": owner,
        "shard_rows": loads,
        "ntotal": n,
        "n_pad": cap,
    }
    return sharded, info
