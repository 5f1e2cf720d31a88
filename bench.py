#!/usr/bin/env python
"""Headline benchmark: IVF-PQ vector-search throughput on one TPU chip.

Mirrors the reference's flagship measurement (BASELINE.md: SIFT-class
index, k=100, nprobe=32, batch-128 queries — 1FPGA-1GPU sustains ~1.9k QPS,
p50 26 ms at batch 128; b=1 p50 1.09 ms), scaled to the corpus that fits
this environment (1M × 128-d, IVF4096, PQ16).

Methodology: the axon tunnel acks dispatches before execution, so
``block_until_ready`` alone under-measures; device time is taken as the
slope between N=small and N=large back-to-back dispatch runs, each closed
by pulling one element of the LAST result (program order ⇒ the pull
completes only after every prior step).  Recall gate: R@10 on 256 held-out
queries vs exact ground truth.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

import numpy as np

_T0 = time.time()


def _note(msg: str) -> None:
    """Stage progress to stderr (stdout stays the single JSON line)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _slope_ms(run, n_small=4, n_large=36):
    """Device ms/call via two-point dispatch-slope measurement."""
    ts = {}
    for n in (n_small, n_large):
        t0 = time.perf_counter()
        run(n)
        ts[n] = time.perf_counter() - t0
    return (ts[n_large] - ts[n_small]) / (n_large - n_small) * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chamjax.config import IndexConfig
    from chamjax.data import synthetic_dataset_device
    from chamjax.data.ground_truth import compute_ground_truth
    from chamjax.eval import recall_at_k
    from chamjax.index import build_ivfpq, PackedIVF
    from chamjax.searcher import DeviceIVF, ivfpq_search

    jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")

    nb, d, nlist, m = 1_000_000, 128, 4096, 16
    batch, nprobe, k = 128, 32, 100

    nq = batch * 65 + 256
    # v5: dataset draws moved to the on-device generator (deterministic JAX
    # PRNG stream — different stream than the old numpy one, hence the key
    # bump) so cold runs don't pay minutes of host-CPU normal sampling.
    key = f"v5_{nb}_{d}_{nlist}_{m}_{nq}"
    cache = os.environ.get("CHAMJAX_BENCH_INDEX",
                           f"/tmp/chamjax_bench_idx_{key}.npz")
    gt_cache = cache.replace(".npz", "_gt.npy")
    cold = not (os.path.exists(cache) and os.path.exists(gt_cache))
    parts = ("xb", "xt", "xq") if cold else ("xq",)
    _note(f"drawing dataset parts={parts} (cold={cold})")
    # to_host=False: splits stay in HBM; with the device-resident
    # build_ivfpq path the 512 MB corpus never crosses the ~2 MB/s tunnel.
    ds = synthetic_dataset_device(nb=nb, nq=nq, nt=100_000, d=d, seed=42,
                                  n_clusters=4096, parts=parts,
                                  to_host=False)
    _note("dataset ready")
    if os.path.exists(cache):
        idx = PackedIVF.load(cache)
        _note("index loaded from cache")
    else:
        idx = build_ivfpq(
            ds.xb, IndexConfig(dim=d, nlist=nlist, m=m, list_pad=128,
                               balanced=True, balance_factor=1.3),
            xt=ds.xt, kmeans_iters=10, pq_iters=10, verbose=True,
        )
        idx.save(cache)
        _note("index built + cached")

    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
    else:
        gt, _ = compute_ground_truth(ds.xb, ds.xq[:256], k=10)
        np.save(gt_cache, gt)
        _note("ground truth computed + cached")

    dev = DeviceIVF.from_packed(idx)
    # window budget: length-weighted mean segments per probe + headroom
    # (defaults measured best on v5e; env knobs for tuning experiments)
    seg = int(os.environ.get("CHAMJAX_SEG", "512"))
    group = int(os.environ.get("CHAMJAX_GROUP", "8"))
    lens = idx.list_len.astype(np.float64)
    w_mean = float((lens * np.ceil(lens / seg)).sum() / lens.sum())
    W = int(np.ceil(nprobe * w_mean * 1.2)) + 4
    kw = dict(nprobe=nprobe, k=k, windows=W, seg=seg, group=group,
              by_residual=True, use_approx=True, recall_target=0.9,
              backend="seg",
              coarse_approx=os.environ.get("CHAMJAX_COARSE_APPROX",
                                           "1") == "1",
              lut_bf16=os.environ.get("CHAMJAX_LUT_BF16", "0") == "1")

    # quality gate: recall@10 on 256 held-out queries
    d_r, i_r = ivfpq_search(dev, jnp.asarray(ds.xq[:256]), **kw)
    r10 = recall_at_k(np.asarray(i_r), gt, 10)
    _note(f"recall gate done: R@10={r10:.4f}")

    # throughput at batch=128 (dispatch-slope)
    qs = [jnp.asarray(ds.xq[256 + i * batch: 256 + (i + 1) * batch])
          for i in range(40)]
    _ = np.asarray(qs[-1][0, 0])
    out = ivfpq_search(dev, qs[0], **kw)
    _ = np.asarray(out[0][0, 0])                     # compile + settle

    def run_b128(n):
        outs = [ivfpq_search(dev, q, **kw) for q in qs[:n]]
        np.asarray(outs[-1][0][0, 0])
    ms_batch = _slope_ms(run_b128)
    qps = batch / ms_batch * 1e3
    _note(f"b128 slope done: {ms_batch:.3f} ms/batch")

    # batch=1 device latency: chain S sequential searches inside ONE
    # compiled lax.scan (carry-dependent), so dispatch overhead amortizes
    # away and the slope over S is pure per-query device time.
    import functools as ft

    @ft.partial(jax.jit, static_argnames=("steps",))
    def chained_b1(dev, qstack, steps):
        def body(acc, q):
            dd, _ii = ivfpq_search(dev, q[None, :] + acc, **kw)
            return dd[0, 0] * 0.0, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), qstack[:steps])
        return acc

    qstack = jnp.asarray(ds.xq[256:256 + 80])
    for steps in (8, 72):
        _ = np.asarray(chained_b1(dev, qstack, steps))   # compile
    t = {}
    for steps in (8, 72):
        t0 = time.perf_counter()
        np.asarray(chained_b1(dev, qstack, steps))
        t[steps] = time.perf_counter() - t0
    ms_b1 = (t[72] - t[8]) / 64 * 1e3

    baseline_qps = 1932.0   # reference 1FPGA-1GPU tik-tok b=128 (BASELINE.md)
    result = {
        "metric": "ivfpq_search_qps_b128_d128_m16_nprobe32_1M",
        "value": round(qps, 1),
        "unit": "QPS",
        "vs_baseline": round(qps / baseline_qps, 3),
        "ms_per_batch128": round(ms_batch, 3),
        "ms_per_query_b1": round(ms_b1, 4),
        "recall_at_10": round(float(r10), 4),
        "windows": W,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
