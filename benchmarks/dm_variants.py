"""On-device QPS + recall for the reference's six (D, M) accelerator builds.

The reference ships six *separate FPGA bitstreams* differing only in the
compile-time constants (D, M) (`retrieval_accelerator/entire_accelerator_
final_*/src/constants.hpp`, SURVEY.md §2.1): SIFT_M16 (128,16), SIFT_M32
(128,32), Deep_M16 (96,16), Deep_M32 (96,32), GNN_M64 (256,64), SBERT_M64
(384,64).  chamjax compiles the same variants as jit parameters; this
driver validates each on the real chip — build, exact ground truth, R@10
gate, and batch-128 throughput — the on-hardware rung of the reference's
per-variant host verification (`SRC/host.cpp:806-845`).

    python benchmarks/dm_variants.py            # all six
    python benchmarks/dm_variants.py --variants SIFT_M16,SBERT_M64

One JSON line per variant; a final summary line aggregates.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (D, M) table from the reference's six final builds (constants.hpp)
VARIANTS = {
    "SIFT_M16": (128, 16),
    "SIFT_M32": (128, 32),
    "Deep_M16": (96, 16),
    "Deep_M32": (96, 32),
    "GNN_M64": (256, 64),
    "SBERT_M64": (384, 64),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--nb", type=int, default=1_000_000)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")

    from chamjax.config import IndexConfig
    from chamjax.data import synthetic_dataset_device
    from chamjax.data.ground_truth import compute_ground_truth
    from chamjax.eval import recall_at_k
    from chamjax.index import build_ivfpq, PackedIVF
    from chamjax.searcher import DeviceIVF, auto_windows, ivfpq_search

    nb, nlist, nprobe, k, batch = (args.nb, args.nlist, args.nprobe,
                                   args.k, args.batch)
    seg, group = 512, 8
    t0 = time.time()

    def note(msg):
        print(f"[dm +{time.time() - t0:7.1f}s] {msg}", file=sys.stderr,
              flush=True)

    rows = []
    for name in args.variants.split(","):
        d, m = VARIANTS[name]
        cache = f"/tmp/chamjax_dm_{name}_{nb}_{nlist}.npz"
        nq = batch * 40 + 256
        ds = synthetic_dataset_device(
            nb=nb, nq=nq, nt=100_000, d=d, seed=42, n_clusters=nlist,
            parts=(("xq",) if os.path.exists(cache) else
                   ("xb", "xt", "xq")),
            to_host=False)
        t_build = 0.0
        if os.path.exists(cache):
            idx = PackedIVF.load(cache)
        else:
            tb = time.time()
            idx = build_ivfpq(ds.xb, IndexConfig(
                dim=d, nlist=nlist, m=m, list_pad=128, balanced=True,
                balance_hard=True, balance_factor=seg * nlist / nb),
                xt=ds.xt, kmeans_iters=10, pq_iters=10)
            np.asarray(idx.list_len)          # settle before timing ends
            t_build = time.time() - tb
            idx.save(cache)
        note(f"{name}: index ready (build {t_build:.0f}s)")

        gt_cache = cache.replace(".npz", "_gt.npy")
        if os.path.exists(gt_cache):
            gt = np.load(gt_cache)
        else:
            gt, _ = compute_ground_truth(ds.xb, ds.xq[:256], k=10)
            np.save(gt_cache, gt)

        dev = DeviceIVF.from_packed(idx)
        W = auto_windows(idx.list_len, seg, nprobe)
        kw = dict(nprobe=nprobe, k=k, windows=W, seg=seg, group=group,
                  by_residual=True, use_approx=True, recall_target=0.9,
                  backend="seg", coarse_approx=True, lut_bf16=True)

        _d, i_r = ivfpq_search(dev, jnp.asarray(ds.xq[:256]), **kw)
        r10 = recall_at_k(np.asarray(i_r), gt, 10)
        note(f"{name}: R@10 {r10:.4f}")

        @jax.jit
        def chain(dv, q, steps, _kw=kw):
            def body(_i, acc):
                dd, _ii = ivfpq_search(dv, q + acc, **_kw)
                return dd[0, 0] * 0.0
            return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

        q0 = jnp.asarray(ds.xq[256:256 + batch])
        for s in (8, 40):
            np.asarray(chain(dev, q0, s))
        ts = {8: [], 40: []}
        for _ in range(args.reps):
            for s in (8, 40):
                tt = time.perf_counter()
                np.asarray(chain(dev, q0, s))
                ts[s].append(time.perf_counter() - tt)
        ms = (min(ts[40]) - min(ts[8])) / 32 * 1e3
        row = {
            "variant": name, "d": d, "m": m,
            "qps_b128": round(batch / ms * 1e3, 1),
            "ms_per_batch128": round(ms, 4),
            "recall_at_10": round(float(r10), 4),
            "bytes_per_vec": m, "windows": W,
            **({"build_s": round(t_build, 1)} if t_build else {}),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "metric": "dm_variant_matrix", "n_variants": len(rows),
        "min_recall_at_10": min(r["recall_at_10"] for r in rows),
        "min_qps_b128": min(r["qps_b128"] for r in rows),
    }), flush=True)


if __name__ == "__main__":
    main()
