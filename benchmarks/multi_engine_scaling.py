"""Multi-engine scale-out through the coordinator: QPS(N engines)/QPS(1).

Parity driver for the reference's multi-FPGA throughput story: the
coordinator scatters fixed-size query batches **round-robin** across N
retrieval-engine processes (reference
``ralm/coordinator/retriever_coordinator_server.py:236-246``) and routes
answers back to the owning client FIFO-per-engine.  The reference measures
engine scale-out exactly this way — one client, the coordinator, N engine
servers; the deliverable is the *scaling ratio*, not the absolute QPS
(which on this host measures the axon tunnel's per-process dispatch RTT —
the very cost that overlapping engines hide).

Topology per measurement (all loopback TCP, separate processes):

    client (pipelined window) -> RetrieveCoordinator -> N x RetrievalServer
                                                          (full IVF-PQ
                                                           search on TPU)

Usage (real TPU, ~5-10 min — first engine jit pays the compile service):
    python benchmarks/multi_engine_scaling.py --engines 1 2
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import socket
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.config import IndexConfig, SearchConfig          # noqa: E402
from chamjax.data import load_dataset                          # noqa: E402
from chamjax.data.ground_truth import compute_ground_truth     # noqa: E402
from chamjax.eval import recall_at_k                           # noqa: E402
from chamjax.index import build_ivfpq                          # noqa: E402
from chamjax.retrieval.external import ExternalRetriever       # noqa: E402


def _engine_proc(index_path: str, host: str, port: int, batch: int,
                 dim: int, k: int, nprobe: int) -> None:
    """Full-search engine: coarse + PQ scan on the chip, one connection
    (the coordinator's), plain-request flavor."""
    from chamjax.retrieval.local import LocalRetriever
    from chamjax.retrieval.server import RetrievalServer

    retr = LocalRetriever.from_file(index_path, SearchConfig(k=k))
    srv = RetrievalServer(retr, host, port, batch, dim, nprobe=nprobe)
    srv.start(n_connections=1, with_lists=False)


def _coord_proc(host: str, port: int, batch: int, dim: int, k: int,
                engine_addrs, total: int) -> None:
    from chamjax.retrieval.coordinator import RetrieveCoordinator

    co = RetrieveCoordinator(host, port, n_clients=1, batch_size=batch,
                             dim=dim, k=k, engine_addrs=engine_addrs,
                             queries_per_client=total)
    co.start()


def _wait_port(host: str, port: int, proc: mp.Process,
               deadline_s: float = 600.0) -> None:
    t0 = time.time()
    while True:
        try:
            socket.create_connection((host, port), timeout=1.0).close()
            return
        except OSError:
            if not proc.is_alive():
                raise RuntimeError(f"process for port {port} died")
            if time.time() - t0 > deadline_s:
                raise TimeoutError(f"port {port} never opened")
            time.sleep(0.5)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dbname", default="SYN1M")
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--index_dir", default="data/indexes")
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n_batches", type=int, default=64)
    ap.add_argument("--n_warmup", type=int, default=12)
    ap.add_argument("--window", type=int, default=8,
                    help="client pipelining depth (inflight requests); "
                         "round-robin only overlaps engines if >1 request "
                         "is in flight")
    ap.add_argument("--engines", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args()

    base_port = 52000 + os.getpid() % 1000 * 8   # disjoint from test ranges

    ds = load_dataset(args.dbname, data_dir=args.data_dir)
    cfg = IndexConfig(dim=ds.d, nlist=args.nlist, m=args.m)
    cache = os.path.join(args.index_dir,
                         f"{args.dbname}_{cfg.key.replace(',', '_')}.npz")
    if not os.path.exists(cache):
        os.makedirs(args.index_dir, exist_ok=True)
        build_ivfpq(ds.xb, cfg, xt=ds.xt).save(cache)
    gt = ds.gt
    if gt is None:
        gt_cache = cache.replace(".npz", f"_gt{args.k}.npy")
        if os.path.exists(gt_cache):
            gt = np.load(gt_cache)
        else:
            gt, _ = compute_ground_truth(ds.xb, ds.xq, k=args.k)
            np.save(gt_cache, gt)

    nq = ds.xq.shape[0]
    total = args.n_warmup + args.n_batches
    qb = [np.resize(ds.xq[(i * args.batch) % max(nq - args.batch, 1):]
                    [: args.batch], (args.batch, ds.d))
          for i in range(total)]

    rows = []
    port = base_port
    for n_eng in args.engines:
        eng_addrs = [(args.host, port + 1 + e) for e in range(n_eng)]
        engines = []
        for _, (h, p) in enumerate(eng_addrs):
            pr = mp.Process(target=_engine_proc,
                            args=(cache, h, p, args.batch, ds.d, args.k,
                                  args.nprobe), daemon=True)
            pr.start()
            engines.append(pr)
        for pr, (h, p) in zip(engines, eng_addrs):
            _wait_port(h, p, pr)
        coord = mp.Process(target=_coord_proc,
                           args=(args.host, port, args.batch, ds.d, args.k,
                                 eng_addrs, total), daemon=True)
        coord.start()
        _wait_port(args.host, port, coord)

        cli = ExternalRetriever(args.host, port, args.batch, ds.d, args.k,
                                nprobe=args.nprobe, timeout=900.0)
        cli.sync_with_coordinator()
        ids_all = []
        t_meas = None
        sent = 0
        # fill the pipeline, then lock-step send/recv; timestamp after the
        # last warmup answer so engine first-jit never lands in the window
        for _ in range(min(args.window, total)):
            cli.retrieve_send(qb[sent], args.nprobe, args.k)
            sent += 1
        for done in range(total):
            res = cli.retrieve_recv()
            ids_all.append(res.ids)
            if done + 1 == args.n_warmup:
                t_meas = time.perf_counter()
            if sent < total:
                cli.retrieve_send(qb[sent], args.nprobe, args.k)
                sent += 1
        wall = time.perf_counter() - t_meas
        cli.close()
        coord.join(timeout=30)
        for pr in engines:
            pr.join(timeout=10)
            if pr.is_alive():
                pr.terminate()

        qps = (total - args.n_warmup) * args.batch / wall
        ids = np.concatenate(ids_all[args.n_warmup:], axis=0)
        n_eval = min(ids.shape[0], gt.shape[0])
        r10 = float(recall_at_k(ids[:n_eval], gt[:n_eval], 10))
        row = {"engines": n_eng, "QPS": round(qps, 1), "R@10": round(r10, 4),
               "batch": args.batch, "window": args.window,
               "nprobe": args.nprobe}
        rows.append(row)
        print(json.dumps(row), flush=True)
        port += 1 + n_eng + 2

    if len(rows) >= 2 and rows[0]["engines"] == 1:
        for r in rows[1:]:
            print(json.dumps({
                "scaling": f'{r["engines"]}x_vs_1',
                "ratio": round(r["QPS"] / rows[0]["QPS"], 2)}), flush=True)


if __name__ == "__main__":
    mp.set_start_method("spawn", force=True)
    main()
