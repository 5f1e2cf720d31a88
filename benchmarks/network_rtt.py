"""Minimal TCP round-trip-time probe (server + client in one script).

Parity with the reference's RTT accounting probes
(``Faiss_experiments/network_RTT_{client,server}.py:1-25``): a TCP echo
pair measuring p50/p95 RTT for a given payload size — used to attribute
the network share of disaggregated-search latency.

    python benchmarks/network_rtt.py server --port 27001
    python benchmarks/network_rtt.py client --port 27001 --bytes 4096 -n 200
"""

from __future__ import annotations

import argparse
import os
import socket
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.retrieval.external import recv_exact, send_all    # noqa: E402


def run_server(host: str, port: int, payload: int) -> None:
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind((host, port))
    s.listen(1)
    print(f"echo server on {host}:{port}", flush=True)
    conn, _ = s.accept()
    conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    try:
        while True:
            buf = recv_exact(conn, payload)
            send_all(conn, buf)
    except (ConnectionError, OSError):
        pass
    finally:
        conn.close()
        s.close()


def run_client(host: str, port: int, payload: int, n: int) -> None:
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    s.connect((host, port))
    data = os.urandom(payload)
    rtts = []
    for _ in range(n):
        t0 = time.perf_counter()
        send_all(s, data)
        recv_exact(s, payload)
        rtts.append(time.perf_counter() - t0)
    s.close()
    a = np.asarray(rtts[max(1, n // 10):]) * 1e6   # drop warmup, -> us
    print(f"payload={payload}B n={len(a)}: "
          f"p50={np.median(a):.1f}us p95={np.percentile(a, 95):.1f}us "
          f"min={a.min():.1f}us", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("role", choices=["server", "client"])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=27001)
    ap.add_argument("--bytes", type=int, default=4096)
    ap.add_argument("-n", type=int, default=200)
    args = ap.parse_args()
    if args.role == "server":
        run_server(args.host, args.port, args.bytes)
    else:
        run_client(args.host, args.port, args.bytes, args.n)


if __name__ == "__main__":
    main()
