"""Process launcher: coordinator + retrieval engine + N RALM workers.

Parity with the reference's experiment launcher
(``experiments/start_coordinator_and_GPU.py:87-121``): reads the YAML
config, computes ``num_queries_per_worker = ceil(seq_len/interval) ·
(n_batches + warmup)`` (×2 for tik-tok — two in-flight micro-batches), then
spawns the coordinator, a retrieval engine (RandomAnswerServer by default,
or a real TPU engine), and ``n_workers`` RALM worker processes, each with
its own log file under ``logs/``.

The whole multi-node topology runs on 127.0.0.1 loopback — the same
"multi-node on one machine" methodology the reference documents in
``ralm/README.md``.
"""

from __future__ import annotations

import argparse
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.config import ExperimentConfig                   # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/Dec-S.yaml")
    ap.add_argument("--n_workers", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq_len", type=int, default=32)
    ap.add_argument("--interval", type=int, default=1)
    ap.add_argument("--scheduler", default="sequential",
                    choices=["sequential", "tiktok"])
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--engine", default="random",
                    choices=["random", "dummy_coordinator", "external"],
                    help="external: a REAL engine process already listens "
                         "on --engine_port (benchmarks/ralm_engine.py) — "
                         "the reference's faiss_server/FPGA methodology; "
                         "this launcher then spawns only coordinator + "
                         "workers")
    ap.add_argument("--engine_port", type=int, default=0,
                    help="external engine port (default coordinator+100)")
    ap.add_argument("--engine_delay_ms", type=float, default=0.0)
    ap.add_argument("--logs", default="logs")
    ap.add_argument("--out", default="results/ralm.pkl")
    ap.add_argument("--sweep", default="",
                    help="comma list of scheduler:interval configs run "
                         "back-to-back by the SAME worker processes (TPU "
                         "init + model compile paid once); a fresh "
                         "coordinator is spawned per config")
    args = ap.parse_args()

    cfg = ExperimentConfig.from_yaml(args.config)
    host = cfg.service.coordinator_host
    port = cfg.service.coordinator_port
    dim = cfg.model.embed_dim
    k = cfg.model.k

    sweep = ([tuple(c.split(":")) for c in args.sweep.split(",") if c]
             if args.sweep else [(args.scheduler, str(args.interval))])

    def queries_for(scheduler: str, interval: int) -> int:
        retrievals_per_run = math.ceil(args.seq_len / interval)
        n_inflight = 2 if scheduler == "tiktok" else 1
        return (retrievals_per_run + math.ceil(
            args.warmup / interval)) * n_inflight

    queries_per_worker = queries_for(*[(s, int(i)) for s, i in sweep][0])
    os.makedirs(args.logs, exist_ok=True)
    env = dict(os.environ)
    py = sys.executable
    procs = []

    # --- retrieval engine (optional: coordinator can answer itself) ---
    engine_port = args.engine_port or port + 100
    if args.engine == "external":
        # wait for the already-running real engine to accept (its index
        # build can take minutes; poll rather than racing the coordinator)
        import socket
        deadline = time.time() + 600
        while True:
            try:
                socket.create_connection((host, engine_port),
                                         timeout=2).close()
                break
            except OSError:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"no engine listening on {host}:{engine_port}")
                time.sleep(2)
        print(f"external engine up on {host}:{engine_port}", flush=True)
    if args.engine == "random":
        engine_code = (
            "from chamjax.retrieval.server import RandomAnswerServer; "
            f"RandomAnswerServer('{host}', {engine_port}, {args.batch}, "
            f"{dim}, delay_ms={args.engine_delay_ms})"
            f".start(n_connections={len(sweep)})")
        procs.append(subprocess.Popen(
            [py, "-c", f"import sys; sys.path.insert(0, '.'); {engine_code}"],
            stdout=open(f"{args.logs}/engine.log", "w"),
            stderr=subprocess.STDOUT, env=env))

    # --- coordinator (one per sweep config; exits when workers disconnect) --
    def spawn_coordinator(scheduler: str, interval: int, tag: int):
        qpw = queries_for(scheduler, interval)
        if args.engine == "dummy_coordinator":
            coord_code = (
                "from chamjax.retrieval.coordinator import "
                "RetrieveCoordinator; "
                f"RetrieveCoordinator('{host}', {port}, {args.n_workers}, "
                f"{args.batch}, {dim}, {k}, "
                f"queries_per_client={qpw})"
                f".start_dummy_answer(delay_ms={args.engine_delay_ms})")
        else:
            coord_code = (
                "from chamjax.retrieval.coordinator import "
                "RetrieveCoordinator; "
                f"RetrieveCoordinator('{host}', {port}, {args.n_workers}, "
                f"{args.batch}, {dim}, {k}, "
                f"engine_addrs=[('{host}', {engine_port})], "
                f"queries_per_client={qpw}).start()")
        return subprocess.Popen(
            [py, "-c", f"import sys; sys.path.insert(0, '.'); {coord_code}"],
            stdout=open(f"{args.logs}/coordinator_{tag}.log", "w"),
            stderr=subprocess.STDOUT, env=env)

    coord = spawn_coordinator(sweep[0][0], int(sweep[0][1]), 0)
    time.sleep(1.5)

    # --- workers (spawned ONCE; sweep configs run inside each process) ---
    workers = []
    for i in range(args.n_workers):
        cmd = [py, "benchmarks/ralm_worker.py",
               "--config", args.config, "--retriever", "external",
               "--scheduler", args.scheduler,
               "--batch", str(args.batch), "--seq_len", str(args.seq_len),
               "--interval", str(args.interval),
               "--warmup", str(args.warmup),
               "--worker_id", str(i), "--out", args.out]
        if args.sweep:
            cmd += ["--sweep", args.sweep]
        workers.append(subprocess.Popen(
            cmd, stdout=open(f"{args.logs}/worker_{i}.log", "w"),
            stderr=subprocess.STDOUT, env=env))
        print(f"launched worker {i} -> {args.logs}/worker_{i}.log",
              flush=True)

    for ci in range(1, len(sweep)):
        coord.wait()
        print(f"config {ci - 1} ({sweep[ci - 1]}) coordinator done",
              flush=True)
        coord = spawn_coordinator(sweep[ci][0], int(sweep[ci][1]), ci)

    rc = 0
    for i, w in enumerate(workers):
        w.wait()
        rc |= w.returncode
        print(f"worker {i} exited rc={w.returncode}", flush=True)
    coord.wait(timeout=60)
    for p in procs:
        p.wait(timeout=30)
    print(f"all workers done; results in {args.out}", flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
