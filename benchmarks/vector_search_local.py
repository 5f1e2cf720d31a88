"""Standalone vector-search benchmark: local (in-process) TPU searcher.

Parity driver for the reference's CPU/GPU baseline sweep
(``experiments/vector_search_baseline.py`` and
``Faiss_experiments/bench_cpu_performance_OSDI.py:1-60``): sweeps
(batch, nprobe), records recall@{1,10,100}, QPS, p50/p95 latency into a
resumable nested ResultStore keyed ``[dbname][index_key][arch][k][nprobe][batch]``.

Usage:
    python benchmarks/vector_search_local.py --dbname SIFT1M \
        --nlist 1024 --m 16 --nprobe 1 8 32 --batch 1 32 128 \
        --out results/vector_search_local.pkl
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --backend cpu is a host-only run (the reference's Faiss-CPU arch row):
# keep jax off the accelerator BEFORE any chamjax import — importing the
# Pallas modules initializes a backend, and the axon plugin both ignores
# JAX_PLATFORMS and hangs import when the tunnel is unavailable.


def _cpu_backend_requested(argv) -> bool:
    for i, a in enumerate(argv):
        if a == "--backend" and i + 1 < len(argv) and argv[i + 1] == "cpu":
            return True
        if a == "--backend=cpu":
            return True
    return False


if _cpu_backend_requested(sys.argv[1:]):
    import jax

    jax.config.update("jax_platforms", "cpu")

from chamjax.config import IndexConfig, SearchConfig          # noqa: E402
from chamjax.data import load_dataset                          # noqa: E402
from chamjax.data.ground_truth import compute_ground_truth     # noqa: E402
from chamjax.eval import recall_at_k                           # noqa: E402
from chamjax.index import build_ivfpq                          # noqa: E402
from chamjax.index.ivf import PackedIVF                        # noqa: E402
from chamjax.searcher import IVFSearcher                       # noqa: E402
from chamjax.utils import ResultStore                          # noqa: E402


def get_or_build_index(args, ds) -> PackedIVF:
    cfg = IndexConfig(dim=ds.d, nlist=args.nlist, m=args.m, nbits=args.nbits,
                      opq=args.opq)
    cache = os.path.join(args.index_dir,
                         f"{args.dbname}_{cfg.key.replace(',', '_')}.npz")
    if os.path.exists(cache) and not args.rebuild:
        print(f"loading index {cache}", flush=True)
        return PackedIVF.load(cache)
    print(f"building index {cfg.key} for {args.dbname}", flush=True)
    idx = build_ivfpq(ds.xb, cfg, xt=ds.xt)
    os.makedirs(args.index_dir, exist_ok=True)
    idx.save(cache)
    return idx


def bench_point(searcher: IVFSearcher, xq, gt, batch: int, nprobe: int,
                k: int, n_warmup: int = 2, n_rounds: int = 3,
                max_batches: int = 64) -> dict:
    nq = xq.shape[0]
    batches = [xq[i:i + batch] for i in range(0, nq - batch + 1, batch)]
    if not batches:
        batches = [np.resize(xq, (batch, xq.shape[1]))]
    batches = batches[:max_batches]
    # warmup (compile)
    for b in batches[:n_warmup] or batches[:1]:
        searcher.search(b[:batch], nprobe=nprobe, k=k)
    lat = []
    ids_all = []
    t_all = time.perf_counter()
    for _ in range(n_rounds):
        ids_round = []
        for b in batches:
            t = time.perf_counter()
            _, ids = searcher.search(b, nprobe=nprobe, k=k)
            lat.append(time.perf_counter() - t)
            ids_round.append(ids)
        ids_all = ids_round
    wall = time.perf_counter() - t_all
    lat = np.asarray(lat)
    ids = np.concatenate(ids_all, axis=0)
    n_eval = min(ids.shape[0], gt.shape[0])
    out = {
        "QPS": len(batches) * n_rounds * batch / wall,
        "latency_ms_p50": float(np.median(lat) * 1e3),
        "latency_ms_p95": float(np.percentile(lat, 95) * 1e3),
        "latency_ms_mean": float(lat.mean() * 1e3),
    }
    for kk in (1, 10, 100):
        if kk <= k:
            out[f"R@{kk}"] = float(recall_at_k(ids[:n_eval], gt[:n_eval], kk))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dbname", default="SIFT1M")
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--index_dir", default="data/indexes")
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--nbits", type=int, default=8)
    ap.add_argument("--opq", action="store_true")
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--nprobe", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 32, 128])
    ap.add_argument("--backend", default="seg",
                    choices=["seg", "pallas", "xla", "cpu"],
                    help="cpu = native C++ host engine (no accelerator; "
                         "the reference's Faiss-CPU arch row)")
    ap.add_argument("--out", default="results/vector_search_local.pkl")
    ap.add_argument("--load_dict", type=int, default=1)
    ap.add_argument("--overwrite", type=int, default=0)
    args = ap.parse_args()

    if args.backend == "cpu":
        import multiprocessing
        arch = f"{multiprocessing.cpu_count()}coreCPU-native"
    else:
        import jax
        arch = (f"1x{jax.devices()[0].device_kind.replace(' ', '')}"
                f"-{args.backend}")

    ds = load_dataset(args.dbname, data_dir=args.data_dir)
    idx = get_or_build_index(args, ds)
    gt = ds.gt
    if gt is None:
        gt, _ = compute_ground_truth(ds.xb, ds.xq, k=args.k)

    class _CpuSearcher:
        """IVFSearcher-shaped facade over the native host engine."""

        def __init__(self, packed):
            from chamjax.native import NativeIVFPQ
            self.engine = NativeIVFPQ(packed)

        def search(self, q, nprobe, k):
            return self.engine.search(q, nprobe, k)

    store = ResultStore(args.out, load=bool(args.load_dict),
                        overwrite=bool(args.overwrite))
    cpu_searcher = _CpuSearcher(idx) if args.backend == "cpu" else None
    for nprobe in args.nprobe:
        searcher = cpu_searcher or IVFSearcher(
            idx, SearchConfig(nprobe=nprobe, k=args.k, backend=args.backend))
        for batch in args.batch:
            key = (args.dbname, idx.cfg.key, arch, args.k, nprobe, batch)
            if not store.should_run(key):
                print(f"skip {key} (cached)", flush=True)
                continue
            res = bench_point(searcher, ds.xq, gt, batch, nprobe, args.k)
            store.put(key, res)
            store.save()
            print(f"{key} -> {res}", flush=True)


if __name__ == "__main__":
    main()
