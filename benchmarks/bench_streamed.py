"""Host-streamed serving tier: measured stage costs + design-ceiling math.

The single-chip larger-than-HBM path (``chamjax/streamed.py``): codes/ids
host-RAM- or memmap-resident, per-batch probed windows staged to HBM.  The
TPU analogue of the FPGA's DRAM-streaming scan (``SRC/DRAM_utils.hpp``).

What this measures (and why separately):

- **host gather bandwidth** — the numpy window-slab gather, the host half
  of the PQ-code streamer.  This is real on any host.
- **device plan+scan time** — coarse scan/window table (phase 1) and the
  staged-slab ADC+top-k (phase 2), dispatch-slope timed.
- **end-to-end QPS through the axon tunnel** — honest but tunnel-bound
  (~2 MB/s host→device): it measures this environment's link, not the
  design.  The design ceiling on a PCIe host is
  ``min(host_gather_BW, PCIe_BW) / slab_bytes_per_query`` and is printed
  from the *measured* gather bandwidth + Gen4 x16 (~24 GB/s effective).

Usage (real TPU): python benchmarks/bench_streamed.py [--nb 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chamjax.config import IndexConfig, SearchConfig
    from chamjax.data import load_dataset
    from chamjax.data.ground_truth import compute_ground_truth
    from chamjax.eval import recall_at_k
    from chamjax.index import build_ivfpq
    from chamjax.index.ivf import PackedIVF
    from chamjax.streamed import HostStreamedSearcher, plan_windows

    ap = argparse.ArgumentParser()
    ap.add_argument("--dbname", default="SYN1M")
    ap.add_argument("--nb", type=int, default=0,
                    help="> 0: device-exported hard-mode corpus of this "
                         "many rows instead of --dbname (the tier's design "
                         "scale is 100M-1B on one chip; quantizers train "
                         "on device, populate_on_disk_device exports m+4 "
                         "bytes/row, the host serves the memmap — implies "
                         "--ondisk)")
    ap.add_argument("--n-clusters", type=int, default=262144)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n_batches", type=int, default=8)
    ap.add_argument("--index_dir", default="data/indexes")
    ap.add_argument("--ondisk", action="store_true",
                    help="serve from an on-disk memmap index "
                         "(populate_on_disk/load_ondisk) instead of RAM — "
                         "measures warm() and the memmap gather path")
    ap.add_argument("--ab-tiled", action="store_true",
                    help="within-process A/B: staged scan with the "
                         "BlockSpec tiled kernel vs the manual-DMA kernel")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")

    if args.nb:
        # ---- design-scale mode: device-built hard corpus, on-disk serve.
        # Quantizers train on device (bench_1b's recipe), the export
        # crosses the link once at m+4 bytes/row, the serve path is the
        # stock ondisk/streamed tier below.
        from chamjax.data.hard import make_hard_corpus, GEN
        from chamjax.index import compute_ground_truth_streamed
        from chamjax.index.device_build import lloyd_device, _assign_blocked
        from chamjax.index.factory import TrainedQuantizers
        from chamjax.index.ondisk import load_ondisk, populate_on_disk_device
        from chamjax.index.pq import train_pq

        d = 128
        nb = (args.nb // GEN) * GEN
        hc = make_hard_corpus(d=d, n_clusters=args.n_clusters, seed=42)
        cfg = IndexConfig(dim=d, nlist=args.nlist, m=args.m, list_pad=128)
        od_dir = os.path.join(
            args.index_dir,
            f"hard{nb // (1 << 20)}M_ondisk_{cfg.key.replace(',', '_')}")
        gt_cache = od_dir + "_gt.npy"
        xq = np.asarray(hc.queries(256, jitter=-1.0))
        t0 = time.perf_counter()
        if not os.path.exists(os.path.join(od_dir, "ondisk.json")):
            nt = 2_000_000
            xt = jnp.concatenate([hc.draw_train(i, GEN)
                                  for i in range(0, nt, GEN)])
            cent = lloyd_device(xt, cfg.nlist, iters=8, seed=42,
                                block=4096, cand=8)
            a_t = _assign_blocked(xt, cent, block=4096, cand=8)
            books = train_pq(xt - cent[a_t], cfg.m, nbits=8, iters=8,
                             seed=42)
            del xt, a_t
            trained = TrainedQuantizers(cfg=cfg,
                                        centroids=np.asarray(cent),
                                        codebooks=np.asarray(books),
                                        opq_R=None)
            print(f"[streamed] quantizers trained "
                  f"(+{time.perf_counter() - t0:.0f}s); exporting {nb} "
                  "rows (m+4 B/row over the link)", file=sys.stderr,
                  flush=True)
            populate_on_disk_device(hc.draw_base, nb, trained, od_dir,
                                    chunk=4 * GEN, verbose=True)
        if os.path.exists(gt_cache):
            gt = np.load(gt_cache)
        else:
            gt, _ = compute_ground_truth_streamed(
                hc.draw_base, nb, jnp.asarray(xq), k=10, chunk=4 * GEN)
            gt = np.asarray(gt)
            np.save(gt_cache, gt)
        packed = load_ondisk(od_dir)
        ds_xq = xq
        args.ondisk = True
        print(f"[streamed] design-scale index ready "
              f"(+{time.perf_counter() - t0:.0f}s): nb={nb} "
              f"nlist={args.nlist} m={args.m}", file=sys.stderr, flush=True)
    else:
        ds = load_dataset(args.dbname)
        cfg = IndexConfig(dim=ds.d, nlist=args.nlist, m=args.m)
        cache = os.path.join(args.index_dir,
                             f"{args.dbname}_{cfg.key.replace(',', '_')}.npz")
        if os.path.exists(cache):
            packed = PackedIVF.load(cache)
        else:
            packed = build_ivfpq(ds.xb, cfg, xt=ds.xt)
            os.makedirs(args.index_dir, exist_ok=True)
            packed.save(cache)
        gt, _ = compute_ground_truth(ds.xb, ds.xq[:256], k=10)
        ds_xq = ds.xq

    warm_s = None
    if args.ondisk and not args.nb:
        from chamjax.index.factory import TrainedQuantizers
        from chamjax.index.ondisk import load_ondisk, populate_on_disk
        od_dir = os.path.join(args.index_dir,
                              f"{args.dbname}_ondisk_{cfg.key.replace(',', '_')}")
        if not os.path.exists(os.path.join(od_dir, "meta.json")):
            trained = TrainedQuantizers(
                cfg=packed.cfg, centroids=packed.centroids,
                codebooks=packed.codebooks, opq_R=packed.opq_R)
            populate_on_disk(ds.xb, trained, od_dir)
        packed = load_ondisk(od_dir)
        assert isinstance(packed.codes, np.memmap)
        print(f"[streamed] ondisk memmap index at {od_dir}",
              file=sys.stderr, flush=True)

    scfg = SearchConfig(nprobe=args.nprobe, k=args.k)
    st = HostStreamedSearcher(packed, scfg)
    t0 = time.perf_counter()
    st.warm()      # prefault codes/ids (cold random reads ~0.3 GiB/s here)
    warm_s = time.perf_counter() - t0
    b = args.batch
    m = cfg.m
    seg, W = st.seg, st.windows
    # codes only: the round-4 position protocol never stages/uploads ids
    slab_bytes = b * W * seg * m
    print(f"[streamed] seg={seg} W={W} slab={slab_bytes / 2**20:.1f} MiB "
          f"per batch{b} ({slab_bytes / b / 2**20:.2f} MiB/query)",
          file=sys.stderr, flush=True)

    # ---- correctness + end-to-end wall (tunnel-bound) -------------------
    qs = np.resize(ds_xq[:256], (max(256, b), packed.cfg.dim))
    d0, i0 = st.search(qs[:b])                     # compile + warm
    batches = [qs[(i * b) % 128:][:b] for i in range(args.n_batches)]
    t0 = time.perf_counter()
    ids_all = []
    for qb in batches:
        _d, ii = st.search(qb)
        ids_all.append(ii)
    e2e_s = (time.perf_counter() - t0) / args.n_batches
    ids = np.concatenate(ids_all)[: min(256, args.n_batches * b)]
    r10 = float(recall_at_k(ids, gt[: ids.shape[0]], 10))

    # ---- pipelined serving (gather overlapped with device scan) ---------
    st.search_pipelined(batches[:2])               # warm the piped path
    t0 = time.perf_counter()
    piped = st.search_pipelined(batches)
    pipe_s = (time.perf_counter() - t0) / args.n_batches
    ids_p = np.concatenate([ii for _d, ii in piped])[: ids.shape[0]]
    r10_pipe = float(recall_at_k(ids_p, gt[: ids_p.shape[0]], 10))

    # ---- host gather bandwidth (the real-host number) -------------------
    q = jnp.asarray(qs[:b], jnp.float32)
    starts, lens, probe, list_ids, q_rot = plan_windows(
        q, st.centroids, st.list_start, st.list_len, st.opq_R,
        nprobe=args.nprobe, windows=W, seg=seg)
    starts_h, lens_h = np.asarray(starts), np.asarray(lens)
    st._stage(starts_h, lens_h)                    # warm page cache
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        st._stage(starts_h, lens_h)
    gather_s = (time.perf_counter() - t0) / reps
    gather_gbs = slab_bytes / gather_s / 2**30

    # ---- design ceiling -------------------------------------------------
    pcie_gbs = 24.0                                # Gen4 x16 effective
    eff_gbs = min(gather_gbs, pcie_gbs)
    per_query = slab_bytes / b
    ceiling_qps = eff_gbs * 2**30 / per_query

    out = {
        "tier": "host_streamed", "nb": int(packed.ntotal),
        "nprobe": args.nprobe, "batch": b, "seg": seg, "windows": W,
        "R@10": round(r10, 4),
        "slab_MiB_per_query": round(per_query / 2**20, 3),
        "host_gather_GBs": round(gather_gbs, 2),
        "e2e_ms_per_batch_tunnel": round(e2e_s * 1e3, 1),
        "e2e_qps_tunnel": round(b / e2e_s, 1),
        "e2e_ms_per_batch_pipelined": round(pipe_s * 1e3, 1),
        "e2e_qps_pipelined": round(b / pipe_s, 1),
        "R@10_pipelined": round(r10_pipe, 4),
        "design_ceiling_qps_pcie": round(ceiling_qps, 1),
        "ondisk": bool(args.ondisk),
        "warm_s": round(warm_s, 2),
    }
    print(json.dumps(out), flush=True)

    if args.ab_tiled:
        # within-process A/B (cross-run deltas are contention-bound on
        # this tunnel): same packed index, same batches, staged scan via
        # the BlockSpec tiled kernel vs the manual-DMA multi-window kernel
        import dataclasses
        res = {}
        for tiled in (True, False):
            sti = HostStreamedSearcher(
                packed, dataclasses.replace(scfg, tiled=tiled))
            sti.search(qs[:b])                       # compile + warm
            t0 = time.perf_counter()
            for qb in batches:
                sti.search(qb)
            res[tiled] = (time.perf_counter() - t0) / args.n_batches
        ab = {"ab": "staged_tiled_vs_dma",
              "tiled_ms": round(res[True] * 1e3, 1),
              "dma_ms": round(res[False] * 1e3, 1),
              "tiled_speedup": round(res[False] / res[True], 3)}
        print(json.dumps(ab), flush=True)


if __name__ == "__main__":
    main()
