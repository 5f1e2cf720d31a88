"""Within-process A/B of kernel knobs at the EXACT headline bench config.

Cross-run comparisons on this chip are contaminated by multi-x tunnel/chip
contention drift (RESULTS.md "verify" notes); this driver measures every
variant with interleaved chained-``fori_loop`` reps inside ONE process, so
relative numbers are trustworthy.  The config mirrors ``bench.py`` exactly
(1M x 128d, IVF4096 hard-balanced cap=seg=512, PQ16, nprobe=32, k=100,
b=128, group=8, coarse_approx, rt=0.9) — the driver-recorded headline.

    python benchmarks/headline_ab.py \
        --variants prod,f32,bf16_lane,f32_lane

Each variant prints ms/batch + QPS + R@10 (256 held-out queries vs exact
ground truth); the winner is the knob set bench.py should default to.
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

VARIANTS = {
    # _dev: which device twin the variant runs on — "tiled" (seg-tiled
    # BlockSpec-pipelined scan, the production default) or "flat" (manual
    # -DMA multi-window kernel)
    "prod": dict(lut_bf16=True, _dev="tiled"),        # bench.py default
    "flat": dict(lut_bf16=True, _dev="flat"),
    "f32": dict(lut_bf16=False, _dev="tiled"),
    "lane": dict(lut_bf16=True, lane_l1=True, _dev="tiled"),
    "flat_lane": dict(lut_bf16=True, lane_l1=True, _dev="flat"),
    "sel512": dict(lut_bf16=True, select_l1=512, _dev="tiled"),
    "sel1024": dict(lut_bf16=True, select_l1=1024, _dev="tiled"),
    "rt99": dict(lut_bf16=True, recall_target=0.99, _dev="tiled"),
    "exact_sel": dict(lut_bf16=True, use_approx=False, _dev="tiled"),
    # group sweep on the pipelined kernel
    "g4": dict(lut_bf16=True, group=4, _dev="tiled"),
    "g16": dict(lut_bf16=True, group=16, _dev="tiled"),
    "g32": dict(lut_bf16=True, group=32, _dev="tiled"),
    # seg=1024: fewer, larger windows (tiled twin retiled to match)
    "seg1024": dict(lut_bf16=True, seg=1024, _dev="tiled1024"),
    "flat_seg1024": dict(lut_bf16=True, seg=1024, _dev="flat"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="prod,flat,lane,sel512,g16")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--steps", type=int, default=48,
                    help="long-chain length (short chain is 8)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")

    from chamjax.config import IndexConfig
    from chamjax.data import synthetic_dataset_device
    from chamjax.data.ground_truth import compute_ground_truth
    from chamjax.eval import recall_at_k
    from chamjax.index import build_ivfpq, PackedIVF
    from chamjax.searcher import (
        DeviceIVF, auto_windows, ivfpq_search,
    )

    nb, d, nlist, m = 1_000_000, 128, 4096, 16
    batch, nprobe, k, seg, group = 128, 32, 100, 512, 8

    # v8 = the round-3 OPQ + hard-cap flagship artifact (bench.py key)
    nq_bench = batch * 65 + 256
    bench_cache = (f"/tmp/chamjax_bench_idx_v8_{nb}_{d}_{nlist}_{m}"
                   f"_{nq_bench}.npz")
    cache = bench_cache
    cold = not os.path.exists(cache)
    ds = synthetic_dataset_device(
        nb=nb, nq=nq_bench, nt=100_000, d=d, seed=42, n_clusters=4096,
        parts=(("xb", "xt", "xq") if cold else ("xb", "xq")),
        to_host=False)
    if cold:
        idx = build_ivfpq(ds.xb, IndexConfig(
            dim=d, nlist=nlist, m=m, list_pad=128, opq=True, balanced=True,
            balance_hard=True, balance_factor=seg * nlist / nb),
            xt=ds.xt, kmeans_iters=10, pq_iters=10)
        idx.save(cache)
    else:
        idx = PackedIVF.load(cache)
    devs = {
        "flat": DeviceIVF.from_packed(idx),
        "tiled": DeviceIVF.from_packed(idx, tile_seg=seg),
        "tiled1024": DeviceIVF.from_packed(idx, tile_seg=1024),
    }
    dev = devs["tiled"]
    W = auto_windows(idx.list_len, seg, nprobe)

    gt_cache = bench_cache.replace(".npz", "_gt.npy")
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
    else:
        gt, _ = compute_ground_truth(ds.xb, ds.xq[:256], k=10)
        np.save(gt_cache, gt)

    base = dict(nprobe=nprobe, k=k, windows=W, seg=seg, group=group,
                by_residual=True, use_approx=True, recall_target=0.9,
                backend="seg", coarse_approx=True)
    names = [v for v in args.variants.split(",") if v]
    qgate = jnp.asarray(ds.xq[:256])
    q0 = jnp.asarray(ds.xq[256:256 + batch])

    runners, r10s, kws, dev_of = {}, {}, {}, {}
    for name in names:
        kw = dict(base)
        kw.update(VARIANTS[name])
        dev_v = devs[kw.pop("_dev", "tiled")]
        dev_of[name] = dev_v
        if kw["seg"] != seg:
            kw["windows"] = auto_windows(idx.list_len, kw["seg"], nprobe)
        if kw["windows"] % kw["group"]:
            kw["windows"] += -kw["windows"] % kw["group"]

        @jax.jit
        def chain(dv, q, steps, _kw=kw):
            # traced trip count: ONE Mosaic compile per variant (a static
            # scan length recompiles the kernel per chain length — see
            # profiling_stages.chained_ms)
            def body(_i, acc):
                dd, _ii = ivfpq_search(dv, q + acc, **_kw)
                return dd[0, 0] * 0.0
            return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

        _d, i_r = ivfpq_search(dev_v, qgate, **kw)
        r10s[name] = recall_at_k(np.asarray(i_r), gt, 10)
        for s in (8, args.steps):
            np.asarray(chain(dev_v, q0, s))            # compile + warm
        runners[name] = chain
        kws[name] = kw
        print(f"[ab] compiled {name} (R@10 {r10s[name]:.4f})",
              file=sys.stderr, flush=True)

    ts = {n: {8: [], args.steps: []} for n in names}
    for _rep in range(args.reps):
        for name in names:                       # interleave: shared drift
            for s in (8, args.steps):
                t0 = time.perf_counter()
                np.asarray(runners[name](dev_of[name], q0, s))
                ts[name][s].append(time.perf_counter() - t0)

    for name in names:
        ms = (min(ts[name][args.steps]) - min(ts[name][8])) / (
            args.steps - 8) * 1e3
        print(json.dumps({
            "variant": name, "ms_per_batch128": round(ms, 4),
            "qps": round(batch / ms * 1e3, 1),
            "recall_at_10": round(float(r10s[name]), 4),
            "windows": kws[name]["windows"], "seg": kws[name]["seg"],
            "group": kws[name]["group"],
        }), flush=True)


if __name__ == "__main__":
    main()
