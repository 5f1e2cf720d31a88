"""Multi-engine scale-out through the coordinator (reference parity:
``retriever_coordinator_server.py:236-246`` round-robins query batches
across n retrieval engines — the multi-FPGA throughput story).

Topology:  client ──► coordinator ──round-robin──► n × engine process
(each engine = ``RetrievalServer`` over a ``LocalRetriever`` on the TPU;
on this host every engine shares the one chip through the axon tunnel,
so absolute QPS measures the tunnel — the deliverable is the *scaling
ratio* n=2 vs n=1, which exercises the coordinator's scatter/origin-
gather and the engines' overlapped serialization).

The client keeps ``n_engines`` requests in flight (depth-n pipelining —
the tik-tok generalization), otherwise round-robin can never run two
engines concurrently.

    python benchmarks/vector_search_multiengine.py --n_engines 1 2
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.config import IndexConfig, SearchConfig           # noqa: E402
from chamjax.data import load_dataset                          # noqa: E402
from chamjax.index import build_ivfpq                          # noqa: E402
from chamjax.retrieval.coordinator import RetrieveCoordinator  # noqa: E402
from chamjax.retrieval.external import ExternalRetriever       # noqa: E402
from chamjax.utils import ResultStore                          # noqa: E402


def _engine_proc(index_path: str, host: str, port: int, batch: int,
                 dim: int, k: int, nprobe: int, backend: str) -> None:
    from chamjax.retrieval.local import LocalRetriever
    from chamjax.retrieval.server import RetrievalServer

    retr = LocalRetriever.from_file(
        index_path, SearchConfig(k=k, nprobe=nprobe, backend=backend))
    srv = RetrievalServer(retr, host, port, batch, dim, nprobe=nprobe)
    srv.start(n_connections=1, with_lists=False)


def run_config(n_engines: int, cache: str, args, dim: int,
               xq: np.ndarray) -> float:
    host = args.host
    base = args.port or (28000 + os.getpid() % 2000)
    e_ports = [base + 1 + i for i in range(n_engines)]
    c_port = base

    engines = []
    for p in e_ports:
        e = mp.Process(target=_engine_proc,
                       args=(cache, host, p, args.batch, dim, args.k,
                             args.nprobe, args.backend), daemon=True)
        e.start()
        engines.append(e)

    total = args.n_batches
    coord = RetrieveCoordinator(
        host, c_port, n_clients=1, batch_size=args.batch, dim=dim,
        k=args.k, engine_addrs=[(host, p) for p in e_ports],
        queries_per_client=total + 2 * n_engines + 2)
    # coordinator connects to engines inside start(); engine jit warmup can
    # take minutes through the compile service — run it in a thread and let
    # the client connect retry
    ct = threading.Thread(target=coord.start, daemon=True)
    ct.start()

    retr = None
    deadline = time.time() + 900
    while retr is None:
        try:
            retr = ExternalRetriever(host, c_port, args.batch, dim, args.k,
                                     nprobe=args.nprobe)
        except (ConnectionRefusedError, OSError):
            if time.time() > deadline:
                raise
            time.sleep(2.0)
    retr.sync_with_coordinator()

    q = np.resize(xq[: args.batch], (args.batch, dim)).astype(np.float32)
    # warmup: one round per engine so every engine has compiled + settled
    for _ in range(2 * n_engines):
        retr.retrieve(q, nprobe=args.nprobe, k=args.k)

    depth = n_engines
    t0 = time.perf_counter()
    inflight = 0
    done = 0
    sent = 0
    while done < total:
        while inflight < depth and sent < total:
            retr.retrieve_send(q, nprobe=args.nprobe, k=args.k)
            sent += 1
            inflight += 1
        retr.retrieve_recv()
        done += 1
        inflight -= 1
    wall = time.perf_counter() - t0
    qps = total * args.batch / wall

    retr.close()
    for e in engines:
        e.join(timeout=10)
        if e.is_alive():
            e.terminate()
    ct.join(timeout=10)
    return qps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dbname", default="SIFT1M")
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--index_dir", default="data/indexes")
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n_batches", type=int, default=24)
    ap.add_argument("--n_engines", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--backend", default="seg")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--out", default="results/vector_search_multiengine.pkl")
    args = ap.parse_args()

    ds = load_dataset(args.dbname, data_dir=args.data_dir)
    cfg = IndexConfig(dim=ds.d, nlist=args.nlist, m=args.m)
    cache = os.path.join(args.index_dir,
                         f"{args.dbname}_{cfg.key.replace(',', '_')}.npz")
    if not os.path.exists(cache):
        os.makedirs(args.index_dir, exist_ok=True)
        build_ivfpq(ds.xb, cfg, xt=ds.xt).save(cache)

    store = ResultStore(args.out, load=True, overwrite=True)
    qps_by_n = {}
    for n in args.n_engines:
        qps = run_config(n, cache, args, ds.d, ds.xq)
        qps_by_n[n] = qps
        store.put((args.dbname, cfg.key, f"{n}engine", args.k,
                   args.nprobe, args.batch), {"QPS": qps})
        store.save()
        print(f"n_engines={n}: {qps:.1f} QPS", flush=True)
    if len(qps_by_n) > 1:
        ns = sorted(qps_by_n)
        print(f"scaling {ns[0]}->{ns[-1]} engines: "
              f"{qps_by_n[ns[-1]] / qps_by_n[ns[0]]:.2f}x", flush=True)


if __name__ == "__main__":
    mp.set_start_method("spawn", force=True)
    main()
