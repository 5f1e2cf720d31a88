#!/usr/bin/env python
"""Headline benchmark: IVF-PQ vector-search throughput on one TPU chip.

Mirrors the reference's flagship measurement (BASELINE.md: SIFT-class
index, k=100, nprobe=32, batch-128 queries — 1FPGA-1GPU sustains ~1.9k QPS,
p50 26 ms at batch 128), scaled to the corpus that fits this environment
(1M × 128-d, IVF1024, PQ16 — per-query scan work nprobe/nlist·N = 31k codes
matches the reference's SIFT1000M/IVF32768 ratio of ~0.98M codes per query
scaled by corpus).

Methodology: steady-state serving throughput — distinct query batches
pre-staged on device, executions queued back-to-back, one final block
(measures true device dataflow incl. HBM scan; excludes this rig's
tunnel-inflated host↔device copies).  p50 latency is reported separately
with a per-call device sync.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chamjax.config import IndexConfig
    from chamjax.data import synthetic_dataset
    from chamjax.data.ground_truth import compute_ground_truth
    from chamjax.eval import recall_at_k
    from chamjax.index import build_ivfpq, PackedIVF
    from chamjax.searcher import DeviceIVF, ivfpq_search

    jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")

    nb, d, nlist, m = 1_000_000, 128, 1024, 16
    batch, nprobe, k = 128, 32, 100
    n_batches = 64

    nq = batch * (n_batches + 1) + 256
    ds = synthetic_dataset(nb=nb, nq=nq, nt=100_000, d=d, seed=42,
                           n_clusters=4096)
    # cache key covers everything that changes index/gt content
    key = f"v2_{nb}_{d}_{nlist}_{m}_{nq}"
    cache = os.environ.get("CHAMJAX_BENCH_INDEX",
                           f"/tmp/chamjax_bench_idx_{key}.npz")
    if os.path.exists(cache):
        idx = PackedIVF.load(cache)
    else:
        idx = build_ivfpq(
            ds.xb, IndexConfig(dim=d, nlist=nlist, m=m, list_pad=512),
            xt=ds.xt, kmeans_iters=10, pq_iters=10,
        )
        idx.save(cache)

    gt_cache = cache.replace(".npz", "_gt.npy")
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
    else:
        gt, _ = compute_ground_truth(ds.xb, ds.xq[:256], k=10)
        np.save(gt_cache, gt)

    dev = DeviceIVF.from_packed(idx)
    scan_len = idx.suggest_scan_len(nprobe, 0.98)
    scan_len = max(1024, scan_len - scan_len % 1024)
    kw = dict(nprobe=nprobe, k=k, scan_len=scan_len, by_residual=True,
              use_approx=True, recall_target=0.99, backend="pallas",
              tile=0)

    # quality gate: recall@10 on 256 held-out queries
    d_r, i_r = ivfpq_search(dev, jnp.asarray(ds.xq[:256]), **kw)
    r10 = recall_at_k(np.asarray(i_r), gt, 10)

    # throughput: distinct batches, queued, one block
    qs = [jnp.asarray(ds.xq[256 + i * batch: 256 + (i + 1) * batch])
          for i in range(n_batches + 1)]
    jax.block_until_ready(qs)
    out = ivfpq_search(dev, qs[-1], **kw)     # warmup/compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [ivfpq_search(dev, q, **kw) for q in qs[:n_batches]]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    qps = n_batches * batch / dt

    # latency: per-call sync (includes one dispatch+sync round trip)
    lat = []
    for i in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(ivfpq_search(dev, qs[i % n_batches], **kw))
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat)) * 1e3

    baseline_qps = 1932.0   # reference 1FPGA-1GPU tik-tok b=128 (BASELINE.md)
    result = {
        "metric": "ivfpq_search_qps_b128_d128_m16_nprobe32_1M",
        "value": round(qps, 1),
        "unit": "QPS",
        "vs_baseline": round(qps / baseline_qps, 3),
        "p50_ms_b128": round(p50_ms, 3),
        "recall_at_10": round(float(r10), 4),
        "scan_len": scan_len,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
