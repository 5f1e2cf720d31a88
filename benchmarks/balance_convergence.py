#!/usr/bin/env python
"""Balanced-Lloyd convergence experiment: deadband / iteration sweep.

Measures, at the flagship 100M *training* shape (2M-point sample,
nlist=65536, tau-8 anisotropic corpus — see ``bench_large.py``), how far
split-heavy reseeding can push the residual training imbalance, and what
that costs in stragglers at a follow-up hard rebalance (the corpus-side
proxy).  Full W collapse at 100M needs max list ≤ seg=2048 ⇒ training
natural max ≲ 1.05×cap; the production default (deadband 1.75, 8 iters)
plateaus at ~1.9×cap (RESULTS.md "Device-native balanced build").

Usage: python benchmarks/balance_convergence.py --deadbands 1.75,1.4,1.25 \
           --iters 12 [--nlist 65536] [--nt 1998848]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadbands", type=str, default="1.75,1.4,1.25")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--nlist", type=int, default=65536)
    ap.add_argument("--nt", type=int, default=1998848)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--tau", type=float, default=8.0)
    ap.add_argument("--factor", type=float, default=1.30)
    ap.add_argument("--cand", type=int, default=8,
                    help="candidate width of the follow-up rebalance "
                         "(the corpus pass uses 8)")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")
    from chamjax.index.device_build import (
        _topc_blocked, lloyd_device, rebalance_assignment_device,
    )

    d, rank, k = args.d, max(4, args.d // 4), args.nlist
    key = jax.random.PRNGKey(args.seed)
    k_c, k_p = jax.random.split(key)
    centers = jax.random.normal(k_c, (k, d), jnp.float32) * 4.0
    proj = jax.random.normal(k_p, (rank, d), jnp.float32) / np.sqrt(rank)
    if args.tau > 0:
        lam = jnp.exp(-jnp.arange(rank, dtype=jnp.float32) / args.tau)
        lam = lam * jnp.sqrt(rank / jnp.sum(lam * lam))
        proj = proj * lam[:, None]
    GEN = 1 << 20

    @functools.partial(jax.jit, static_argnames=("n",))
    def _gen(kk, cents, pr, n):
        k1, k2, k3 = jax.random.split(kk, 3)
        asg = jax.random.randint(k1, (n,), 0, cents.shape[0])
        z = jax.random.normal(k2, (n, rank), jnp.float32)
        return cents[asg] + jnp.dot(z, pr) \
            + jax.random.normal(k3, (n, d), jnp.float32) * 0.05

    n_draw = -(-args.nt // GEN) * GEN
    x = jnp.concatenate([_gen(jax.random.fold_in(key, 10 + i), centers,
                              proj, GEN)
                         for i in range(n_draw // GEN)])[: args.nt]
    cap = int(np.ceil(x.shape[0] / k * args.factor))
    print(f"# n={x.shape[0]} k={k} cap={cap} iters={args.iters}",
          flush=True)

    for db in (float(v) for v in args.deadbands.split(",")):
        cent = lloyd_device(x, k, iters=8, seed=0, block=4096,
                            balance_cap=cap, balance_iters=args.iters,
                            balance_deadband=db)
        cells, d2 = _topc_blocked(x, cent, block=4096, c=args.cand)
        nat = np.bincount(np.asarray(cells[:, 0]), minlength=k)
        a, strag = rebalance_assignment_device(
            cells, d2, cap, hard=True, warn=False, return_stats=True)
        counts = np.bincount(np.asarray(a), minlength=k)
        print(f"deadband {db}: natmax {nat.max()} "
              f"({nat.max() / cap:.2f}x cap)  rebalanced max {counts.max()} "
              f"stragglers {strag} ({strag / x.shape[0] * 100:.2f}%)",
              flush=True)


if __name__ == "__main__":
    main()
