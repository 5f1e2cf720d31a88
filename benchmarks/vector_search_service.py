"""Disaggregated vector-search benchmark: coarse scanner + remote PQ engine.

Parity driver for the reference's accelerated path
(``experiments/vector_search_FPGA.py:1-100``): an ``IndexServer`` (coarse
IVF scan, here a jitted TPU matmul+top-k) forwards ``retrieve_with_lists``
over TCP to a PQ-scan engine process; ``--mode latency`` runs synchronous
batches, ``--mode throughput`` runs the tik-tok pipelined scheduler that
overlaps the network+scan of one batch with the coarse scan of the next
(reference ``index_server.py:113-173``).

The engine subprocess serves the packed index through ``RetrievalServer`` —
the stand-in for the FPGA+coordinator tier, same wire format.
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --backend cpu = host-only topology (native C++ engine + CPU coarse
# scanner): force the CPU platform BEFORE chamjax imports — importing the
# Pallas modules initializes a backend, and the axon plugin both ignores
# JAX_PLATFORMS and hangs import when the tunnel is unavailable.  The
# env var covers mp-spawn children, whose argv is the bootstrap's.


def _cpu_backend_requested(argv) -> bool:
    for i, a in enumerate(argv):
        if a == "--backend" and i + 1 < len(argv) and argv[i + 1] == "cpu":
            return True
        if a == "--backend=cpu":
            return True
    return False


if _cpu_backend_requested(sys.argv[1:]) or os.environ.get("CHAMJAX_FORCE_CPU"):
    os.environ["CHAMJAX_FORCE_CPU"] = "1"   # inherited by engine procs
    import jax

    jax.config.update("jax_platforms", "cpu")

from chamjax.config import IndexConfig, SearchConfig          # noqa: E402
from chamjax.data import load_dataset                          # noqa: E402
from chamjax.data.ground_truth import compute_ground_truth     # noqa: E402
from chamjax.eval import recall_at_k                           # noqa: E402
from chamjax.index import build_ivfpq                          # noqa: E402
from chamjax.retrieval.external import ExternalRetriever       # noqa: E402
from chamjax.retrieval.index_scanner import (                  # noqa: E402
    IndexScanner, IndexServer,
)
from chamjax.utils import ResultStore                          # noqa: E402


def _engine_proc(index_path: str, host: str, port: int, batch: int,
                 dim: int, k: int, backend: str) -> None:
    """PQ-engine process: packed index served over the wire format.
    Serves one connection until the client closes (EOF)."""
    from chamjax.retrieval.server import RetrievalServer

    if backend == "cpu":
        from chamjax.index.ivf import PackedIVF
        from chamjax.retrieval.local import NativeCPURetriever
        retr = NativeCPURetriever(PackedIVF.load(index_path),
                                  SearchConfig(k=k))
    else:
        from chamjax.retrieval.local import LocalRetriever
        retr = LocalRetriever.from_file(
            index_path, SearchConfig(k=k, backend=backend))
    srv = RetrievalServer(retr, host, port, batch, dim, nprobe=32)
    srv.start(n_connections=1, with_lists=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dbname", default="SIFT1M")
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--index_dir", default="data/indexes")
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 32, 128])
    ap.add_argument("--n_batches", type=int, default=20)
    ap.add_argument("--mode", choices=["latency", "throughput"],
                    default="latency")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--out", default="results/vector_search_service.pkl")
    ap.add_argument("--load_dict", type=int, default=1)
    ap.add_argument("--overwrite", type=int, default=0)
    args = ap.parse_args()
    port = args.port or (26000 + os.getpid() % 2000)

    ds = load_dataset(args.dbname, data_dir=args.data_dir)
    cfg = IndexConfig(dim=ds.d, nlist=args.nlist, m=args.m)
    cache = os.path.join(args.index_dir,
                         f"{args.dbname}_{cfg.key.replace(',', '_')}.npz")
    if not os.path.exists(cache):
        os.makedirs(args.index_dir, exist_ok=True)
        build_ivfpq(ds.xb, cfg, xt=ds.xt).save(cache)
    from chamjax.index.ivf import PackedIVF
    idx = PackedIVF.load(cache)
    gt = ds.gt
    if gt is None:
        gt_cache = cache.replace(".npz", f"_gt{args.k}.npy")
        if os.path.exists(gt_cache):
            gt = np.load(gt_cache)
        else:
            gt, _ = compute_ground_truth(ds.xb, ds.xq, k=args.k)
            np.save(gt_cache, gt)

    arch = f"scanner+engine-{args.backend}"
    store = ResultStore(args.out, load=bool(args.load_dict),
                        overwrite=bool(args.overwrite))

    for batch in args.batch:
        key = (args.dbname, cfg.key, arch, args.k, args.nprobe, batch,
               args.mode)
        if not store.should_run(key):
            print(f"skip {key} (cached)", flush=True)
            continue
        eng = mp.Process(
            target=_engine_proc,
            args=(cache, args.host, port, batch, ds.d, args.k, args.backend),
            daemon=True)
        eng.start()
        # the engine's first jit through the TPU compile service can take
        # minutes (see .claude/skills/verify/SKILL.md) — retry the connect
        retr = None
        deadline = time.time() + 600
        while retr is None:
            try:
                retr = ExternalRetriever(args.host, port, batch, ds.d,
                                         args.k, nprobe=args.nprobe)
            except (ConnectionRefusedError, OSError):
                if time.time() > deadline or not eng.is_alive():
                    raise
                time.sleep(2.0)
        scanner = IndexScanner(idx.centroids, nprobe=args.nprobe)
        server = IndexServer(scanner, retr, k=args.k)

        nq = ds.xq.shape[0]
        qb = [ds.xq[(i * batch) % max(nq - batch, 1):][:batch]
              for i in range(args.n_batches)]
        qb = [np.resize(b, (batch, ds.d)) for b in qb]
        server.search(qb[0])   # warmup / compile
        server.search(qb[0])
        t0 = time.perf_counter()
        if args.mode == "latency":
            results = server.search_multi_batch(qb)
        else:
            results = server.search_multi_batch_tiktok(qb)
        wall = time.perf_counter() - t0
        ids = np.concatenate([r.ids for r in results], axis=0)
        res = {"QPS": args.n_batches * batch / wall}
        if args.mode == "latency":
            res.update({f"latency_ms_{p}": v for p, v in
                        server.latency_stats_ms().items()})
        n_eval = min(ids.shape[0], gt.shape[0])
        for kk in (1, 10, 100):
            if kk <= args.k:
                res[f"R@{kk}"] = float(
                    recall_at_k(ids[:n_eval], gt[:n_eval], kk))
        retr.close()
        eng.join(timeout=10)
        if eng.is_alive():
            eng.terminate()
        store.put(key, res)
        store.save()
        print(f"{key} -> {res}", flush=True)
        port += 1


if __name__ == "__main__":
    mp.set_start_method("spawn", force=True)
    main()
