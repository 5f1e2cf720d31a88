#!/usr/bin/env python
"""Billion-vector IVF-PQ benchmark: the reference's headline scale.

Every Chameleon headline is a 1000M corpus (SIFT1000M/Deep1000M search,
RALM-S/L-1000M serving — ``BASELINE.md``; FPGA analytic QPS ≈ 2,048 at
nprobe=32/nlist=32768, measured 1,911-1,932).  1B×PQ16 is ~16 GB codes +
4 GB ids — beyond one v5e's 16 GB HBM — so this driver realizes the two
designed 1B paths and measures both at TRUE 1B shapes on one chip:

1. **Row-sharded HBM serving** (the scale-out design): the corpus splits
   into ``--shards`` row ranges; ONE global coarse/product quantizer is
   trained, then every shard is built against it — i.e. each inverted
   list's rows split across shards exactly like the FPGA splits every
   list round-robin across its 4 DRAM banks
   (``extract_Enzian_U250_required_data.py:296-360``).  A query probes
   the same global lists in every shard; merged top-k is bit-equivalent
   to a single giant index.  The chip builds+serves each shard
   SEQUENTIALLY (swap-in/swap-out), measuring per-shard scan latency at
   the real per-chip working set — the per-chip number an 8-chip mesh
   (``parallel/sharded_search.py``, driver-validated by
   ``__graft_entry__.dryrun_multichip``) sustains in parallel; recall is
   measured against exact 1B ground truth computed the same streamed way.
2. **Host-streamed serving** (the single-chip capacity design,
   ``chamjax/streamed.py``): codes/ids host-resident, probed windows
   staged per batch.  Measured separately in RESULTS.md — through this
   environment's ~2 MB/s axon tunnel it measures the tunnel; the design
   ceiling on a PCIe host is the slab bandwidth.

Usage (real TPU, ~30-40 min):
    python benchmarks/bench_1b.py                 # 2^30 rows in 8 shards
    python benchmarks/bench_1b.py --shards 2 --shard-rows 8388608  # smoke
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.time()


def note(msg: str) -> None:
    print(f"[1b +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chamjax.config import IndexConfig
    from chamjax.utils.energy import tpu_efficiency
    from chamjax.eval import recall_at_k
    from chamjax.index import build_ivfpq_device, compute_ground_truth_streamed
    from chamjax.index.device_build import lloyd_device, _assign_blocked
    from chamjax.index.pq import train_pq
    from chamjax.searcher import (auto_seg, auto_windows, ivfpq_search,
                                  resolve_coarse_cand)

    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--shard-rows", type=int, default=128 * (1 << 20),
                    help="rows per shard (default 2^27 -> 2^30 total)")
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nlist", type=int, default=65536)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nprobes", type=str, default="8,32")
    ap.add_argument("--nq-gt", type=int, default=128)
    ap.add_argument("--seg", type=int, default=0)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--n-clusters", type=int, default=65536)
    ap.add_argument("--spectrum-tau", type=float, default=0.0)
    ap.add_argument("--nt", type=int, default=0,
                    help="coarse/PQ training sample; 0 = auto "
                         "max(2M, 32*nlist) capped at 8M (HBM) — 2M at "
                         "nlist=262144 is 7.6 pts/centroid and was "
                         "measured to cost ~6 R@10 points vs 32/centroid")
    ap.add_argument("--chunk", type=int, default=1 << 22)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--kmeans-iters", type=int, default=8)
    ap.add_argument("--pq-iters", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--opq", action="store_true",
                    help="train a global OPQ rotation (reference key "
                         "'OPQ16,IVF...,PQ16'); queries are rotated inside "
                         "ivfpq_search, ground truth stays in raw space")
    ap.add_argument("--recall-target", type=float, default=0.99)
    ap.add_argument("--tiled", type=int, default=1,
                    help="1 = per-shard device retile for the BlockSpec-"
                         "pipelined scan; 0 = flat manual-DMA kernel"),
    ap.add_argument("--coarse-cand", type=int, default=-1,
                    help="SearchConfig.coarse_cand semantics "
                         "(-1 auto, 0 exact full-sort, >0 explicit)")
    ap.add_argument("--balance", type=float, default=0.0,
                    help="> 0: balanced-Lloyd global training + hard-capped "
                         "per-shard rebalance at cap = "
                         "ceil(shard_rows/nlist * BALANCE)")
    ap.add_argument("--hard", action="store_true",
                    help="hard-mode corpus (chamjax/data/hard.py): "
                         "non-saturating nprobe→recall, Zipf mass, "
                         "jittered-row queries (pair with --n-clusters "
                         "well above --nlist)")
    ap.add_argument("--hard-jitter", type=float, default=-1.0,
                    help="<0: independent query draws (SIFT-like); >=0: jittered corpus rows")
    ap.add_argument("--zipf-a", type=float, default=1.05)
    ap.add_argument("--center-scale", type=float, default=1.25)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")
    note(f"backend {jax.default_backend()} {jax.devices()}")

    d = args.d
    nb_total = args.shards * args.shard_rows
    GEN = 1 << 20
    assert args.shard_rows % GEN == 0 and args.chunk % GEN == 0
    nt_req = args.nt or min(max(2_000_000, 32 * args.nlist), 8_388_608)
    nt = (nt_req // args.block) * args.block

    if args.hard:
        from chamjax.data.hard import make_hard_corpus
        hc = make_hard_corpus(
            d=d, n_clusters=args.n_clusters, seed=args.seed,
            zipf_a=args.zipf_a, center_scale=args.center_scale,
            spectrum_tau=args.spectrum_tau)
        draw_b = hc.draw_base
        xt = jnp.concatenate(
            [hc.draw_train(i, GEN)
             for i in range(0, nt + GEN - 1, GEN)])[:nt]
        xq = hc.queries(args.nq_gt, jitter=args.hard_jitter)
        note(f"HARD corpus: n_clusters={args.n_clusters} "
             f"zipf_a={args.zipf_a} center_scale={args.center_scale} "
             f"jitter={args.hard_jitter}")
    else:
        rank = max(4, d // 4)
        key = jax.random.PRNGKey(args.seed)
        k_c, k_p = jax.random.split(key)
        centers = jax.random.normal(k_c, (args.n_clusters, d),
                                    jnp.float32) * 4.0
        proj = jax.random.normal(k_p, (rank, d), jnp.float32) / np.sqrt(rank)
        if args.spectrum_tau > 0:
            lam = jnp.exp(-jnp.arange(rank, dtype=jnp.float32)
                          / args.spectrum_tau)
            lam = lam * jnp.sqrt(rank / jnp.sum(lam * lam))
            proj = proj * lam[:, None]

        # centers/proj are jit ARGUMENTS, not closures: at n_clusters=262144
        # the (n_clusters, d) table is 134 MB and a closed-over constant
        # would exceed the remote compile service's ~100 MB request cap
        # (RESULTS.md, environment findings)
        @functools.partial(jax.jit, static_argnames=("n",))
        def _gen_impl(k, cents, pr, n):
            k1, k2, k3 = jax.random.split(k, 3)
            asg = jax.random.randint(k1, (n,), 0, cents.shape[0])
            z = jax.random.normal(k2, (n, rank), jnp.float32)
            noise = jax.random.normal(k3, (n, d), jnp.float32) * 0.05
            return cents[asg] + jnp.dot(z, pr) + noise

        def _gen(k, n):
            return _gen_impl(k, centers, proj, n)

        def draw_global(salt):
            base = jax.random.fold_in(key, salt)

            def draw(s, c):
                assert s % GEN == 0 and c % GEN == 0, (s, c)
                parts = [_gen(jax.random.fold_in(base, s + i), GEN)
                         for i in range(0, c, GEN)]
                return (parts[0] if len(parts) == 1
                        else jnp.concatenate(parts))
            return draw

        draw_b = draw_global(1)
        xt = jnp.concatenate(
            [_gen(jax.random.fold_in(jax.random.fold_in(key, 2), i), GEN)
             for i in range(0, nt + GEN - 1, GEN)])[:nt]
        xq = _gen(jax.random.fold_in(key, 3), GEN)[: args.nq_gt]
    note(f"train sample {xt.shape}, queries {xq.shape}")

    # -------- global quantizers: trained ONCE, shared by all shards ------
    cfg = IndexConfig(dim=d, nlist=args.nlist, m=args.m, list_pad=128,
                      balanced=args.balance > 0, balance_hard=True,
                      balance_factor=args.balance or 1.3)
    t0 = time.time()
    opq_R = None
    if args.opq:
        from chamjax.index.pq import train_opq
        sample = np.asarray(xt[: 1 << 17])
        R_host, _ = train_opq(sample, cfg.m, nbits=8, seed=args.seed)
        opq_R = jnp.asarray(R_host)
        xt = jnp.dot(xt, opq_R, precision=jax.lax.Precision.HIGHEST)
        note(f"OPQ rotation trained on {sample.shape} "
             f"in {time.time() - t0:.1f}s")
    # --balance: finish global training with balanced-Lloyd iterations
    # (sample-scaled cap) so the per-shard hard-cap rebalance below rarely
    # hits stragglers — shards reuse these centroids via quantizers=()
    bal_cap = (int(np.ceil(xt.shape[0] / cfg.nlist * cfg.balance_factor))
               if cfg.balanced else 0)
    cent = lloyd_device(xt, cfg.nlist, iters=args.kmeans_iters,
                        seed=args.seed, block=args.block, cand=8,
                        balance_cap=bal_cap,
                        balance_iters=(cfg.balance_train_iters
                                       if bal_cap else 0),
                        balance_deadband=cfg.balance_deadband)
    a_t = _assign_blocked(xt, cent, block=args.block, cand=8)
    cbooks = jnp.asarray(train_pq(xt - cent[a_t], cfg.m, nbits=8,
                                  iters=args.pq_iters, seed=args.seed))
    del a_t, xt   # the 128M-row shard rebalance needs the HBM headroom
    note(f"global quantizers trained in {time.time() - t0:.1f}s "
         f"(nlist={cfg.nlist}, m={cfg.m})")

    nprobes = [int(x) for x in args.nprobes.split(",")]
    per_shard = {np_: [] for np_ in nprobes}   # (d, i) host results
    shard_ms = {np_: [] for np_ in nprobes}
    gt_d_parts, gt_i_parts = [], []
    build_s_total = 0.0
    seg_w = {}          # fixed after shard 0 so compiled programs reuse
    chain_cache = {}    # one chained-slope program per kw signature

    def get_chain(kw):
        ck = tuple(sorted(kw.items()))
        if ck not in chain_cache:
            @jax.jit
            def chain(steps, dev, q):
                def body(_i, acc):
                    dd, _ = ivfpq_search(dev, q + acc, **kw)
                    return dd[0, 0] * 0.0
                return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))
            chain_cache[ck] = chain
        return chain_cache[ck]

    for s in range(args.shards):
        row0 = s * args.shard_rows

        def draw_shard(a, c, _row0=row0):
            return draw_b(_row0 + a, c)

        t0 = time.time()
        # tiled: tile-aligned pack at build time (pre-estimated seg; the
        # post-build device retile's fresh gather compile OOM-kills the
        # remote compile helper at shard scale)
        if args.tiled and "tile" not in seg_w:
            seg_w["tile"] = args.seg or auto_seg(
                np.full(cfg.nlist, max(args.shard_rows // cfg.nlist, 1)))
        dev, info = build_ivfpq_device(
            draw_shard, args.shard_rows, cfg, None,
            chunk=args.chunk, block=args.block,
            quantizers=(cent, cbooks, opq_R), verbose=False,
            tile_seg=seg_w.get("tile", 0) if args.tiled else 0,
            # one resident layout per shard: PQ32/PQ64 code slabs don't
            # fit a flat twin next to the tiled one
            tile_only=bool(args.tiled))
        jax.block_until_ready(dev.codes_tiled if args.tiled
                              else dev.codes_t)
        lens = info["list_len"]
        b_s = time.time() - t0
        build_s_total += b_s
        note(f"shard {s}: built {args.shard_rows} rows in {b_s:.1f}s; "
             f"list p50/p99/max="
             f"{np.percentile(lens, [50, 99, 100]).astype(int).tolist()}")

        # exact GT over this shard (streamed, same generator)
        t0 = time.time()
        g_i, g_d = compute_ground_truth_streamed(
            draw_shard, args.shard_rows, xq, k=10, chunk=args.chunk)
        gt_i_parts.append(np.asarray(g_i, np.int64) + row0)
        gt_d_parts.append(np.asarray(g_d))
        note(f"shard {s}: ground truth in {time.time() - t0:.1f}s")

        for np_ in nprobes:
            if np_ not in seg_w:
                seg0 = seg_w.get("tile") or args.seg or auto_seg(lens)
                W0 = auto_windows(lens, seg0, np_)
                W0 += (-W0) % args.group
                seg_w[np_] = (seg0, W0)
                note(f"nprobe={np_}: seg={seg0} windows={W0}")
            seg, W = seg_w[np_]
            kw = dict(nprobe=np_, k=args.k, windows=W, seg=seg,
                      group=args.group, use_approx=True,
                      recall_target=args.recall_target, backend="seg",
                      lut_bf16=True,
                      # two-stage coarse (ops/coarse.py): the full-sort
                      # top_k over (b, 65536) repeated per shard was ~1 ms
                      # of each shard's batch
                      coarse_cand=resolve_coarse_cand(
                          args.coarse_cand, cfg.nlist, np_))
            d_r, i_r = ivfpq_search(dev, xq, **kw)
            d_h = np.asarray(d_r)
            i_h = np.asarray(i_r, np.int64)
            i_h = np.where(i_h >= 0, i_h + row0, -1)
            per_shard[np_].append((d_h, i_h))

            # per-shard scan latency: chained fori_loop slope (one compile
            # per kw, reused across shards; index passed as a jit ARG --
            # closed-over buffers overflow the remote compile service)
            chain = get_chain(kw)
            qb = xq[: args.batch] if args.batch <= xq.shape[0] else \
                jnp.tile(xq, (args.batch // xq.shape[0] + 1, 1))[: args.batch]
            for st in (2, 10):
                np.asarray(chain(st, dev, qb))
            ts = {}
            for st in (2, 10):
                t0 = time.perf_counter()
                np.asarray(chain(st, dev, qb))
                ts[st] = time.perf_counter() - t0
            ms = (ts[10] - ts[2]) / 8 * 1e3
            shard_ms[np_].append(ms)
            note(f"shard {s} nprobe={np_}: {ms:.2f} ms/batch{args.batch}")
        del dev

    # -------- merge: exact 1B ground truth + per-shard answers -----------
    gt_d = np.concatenate(gt_d_parts, axis=1)
    gt_i = np.concatenate(gt_i_parts, axis=1)
    order = np.argsort(gt_d, axis=1, kind="stable")[:, :10]
    gt_1b = np.take_along_axis(gt_i, order, axis=1)

    results = []
    for np_ in nprobes:
        dd = np.concatenate([p[0] for p in per_shard[np_]], axis=1)
        ii = np.concatenate([p[1] for p in per_shard[np_]], axis=1)
        order = np.argsort(dd, axis=1, kind="stable")[:, : args.k]
        ii_k = np.take_along_axis(ii, order, axis=1)
        r1 = recall_at_k(ii_k, gt_1b, 1)
        r10 = recall_at_k(ii_k, gt_1b, 10)
        # R@100 ("nn" mode needs only gt column 0): the reference's sizing
        # targets are R@1/10/100 (Faiss_experiments/README.md:160-177)
        r100 = recall_at_k(ii_k, gt_1b, min(100, args.k))
        ms_max = max(shard_ms[np_])
        ms_sum = sum(shard_ms[np_])
        res = {
            "nb": nb_total, "shards": args.shards, "nprobe": np_,
            "hard": bool(args.hard),
            "k": args.k, "batch": args.batch, "opq": args.opq,
            "spectrum_tau": args.spectrum_tau,
            "R@1": round(float(r1), 4), "R@10": round(float(r10), 4),
            "R@100": round(float(r100), 4),
            "per_shard_ms_max": round(ms_max, 3),
            "per_shard_ms_mean": round(ms_sum / args.shards, 3),
            # an n-chip mesh runs shards in parallel; merge (all_gather of
            # (shards, b, k) + top-k) is sub-ms at these shapes
            "projected_mesh_qps": round(args.batch / ms_max * 1e3, 1),
            "sequential_1chip_qps": round(args.batch / ms_sum * 1e3, 1),
            # mesh efficiency: n shard-chips busy; sequential: one chip
            "mesh_qps_per_watt": tpu_efficiency(
                args.batch / ms_max * 1e3, n_chips=args.shards)[
                "qps_per_watt"],
            "build_s_total": round(build_s_total, 1),
        }
        results.append(res)
        print(json.dumps(res), flush=True)

    note("reference anchor: FPGA 1,911-1,932 QPS / analytic 2,048 QPS at "
         "SIFT1000M nprobe=32 (BASELINE.md)")


if __name__ == "__main__":
    main()
