#!/usr/bin/env python
"""Real retrieval engine process for the disaggregated RALM topology.

The reference's end-to-end RALM numbers put a REAL vector-search engine
behind the coordinator (``ralm/server/faiss_server.py`` serving the
1000M indexes; FPGA mode via ``vector_search_FPGA.py`` throughput mode) —
not the latency-injection ``RandomAnswerServer``.  This process is that
engine for chamjax: it builds a hard-mode corpus index device-resident
(nothing corpus-sized crosses the host link) and serves it behind the
wire protocol (``chamjax/retrieval/server.py::RetrievalServer``) until
``--n-connections`` clients have come and gone.

Run it once, then point ``launch_ralm.py --engine external
--engine_port PORT`` at it for each (model, scheduler, interval) config —
the index build (~minutes at 100M) is paid once per engine process, like
the reference loads its index once per server process.

    python benchmarks/ralm_engine.py --nb 100663296 --port 25101 &
    # wait for "ENGINE READY" in the log, then:
    python benchmarks/launch_ralm.py --engine external --engine_port 25101 \
        --scheduler tiktok ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.time()


def note(msg: str) -> None:
    print(f"[engine +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=25101)
    ap.add_argument("--batch", type=int, default=8,
                    help="wire batch size (must match the RALM workers')")
    ap.add_argument("--d", type=int, default=512,
                    help="query/corpus dim = the RALM model's embed_dim")
    ap.add_argument("--nb", type=int, default=96 * (1 << 20),
                    help="corpus rows (default ~100.7M — the per-chip "
                         "share of the reference's 1000M RALM corpora)")
    ap.add_argument("--nlist", type=int, default=32768,
                    help="reference RALM keys are IVF32768 "
                         "(experiments/config/*.yaml)")
    ap.add_argument("--m", type=int, default=32,
                    help="PQ bytes/row (reference RALM-S1000M: PQ32)")
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--n-clusters", type=int, default=262144)
    ap.add_argument("--nt", type=int, default=2_000_000)
    ap.add_argument("--chunk", type=int, default=0,
                    help="builder chunk rows (0: auto-size to ~1 GB f32 "
                         "draws — d=512 corpora can't afford 4 GB chunks "
                         "next to the code slabs)")
    ap.add_argument("--kmeans-iters", type=int, default=6)
    ap.add_argument("--pq-iters", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n-connections", type=int, default=64)
    ap.add_argument("--easy", action="store_true",
                    help="clustered low-rank corpus instead of hard-mode")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")
    note(f"backend {jax.default_backend()} {jax.devices()}")

    from chamjax.config import IndexConfig, SearchConfig
    from chamjax.index import build_ivfpq_device
    from chamjax.retrieval.local import DeviceRetriever
    from chamjax.retrieval.server import RetrievalServer

    GEN = 1 << 20
    nb = (args.nb // GEN) * GEN
    nt = (args.nt // 4096) * 4096
    if args.easy:
        key = jax.random.PRNGKey(args.seed)
        k_c, k_p = jax.random.split(key)
        rank = max(4, args.d // 4)
        centers = jax.random.normal(k_c, (args.n_clusters, args.d),
                                    jnp.float32) * 4.0
        proj = (jax.random.normal(k_p, (rank, args.d), jnp.float32)
                / np.sqrt(rank))

        import functools

        @functools.partial(jax.jit, static_argnames=("n",))
        def _gen(k, cents, pr, n):
            k1, k2, k3 = jax.random.split(k, 3)
            asg = jax.random.randint(k1, (n,), 0, cents.shape[0])
            z = jax.random.normal(k2, (n, rank), jnp.float32)
            return (cents[asg] + jnp.dot(z, pr)
                    + jax.random.normal(k3, (n, args.d), jnp.float32) * 0.05)

        def draw_b(s, c):
            parts = [_gen(jax.random.fold_in(key, 1000 + s + i),
                          centers, proj, GEN)
                     for i in range(0, c, GEN)]
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

        xt = jnp.concatenate([
            _gen(jax.random.fold_in(key, 2_000_000 + i), centers, proj, GEN)
            for i in range(0, nt + GEN - 1, GEN)])[:nt]
    else:
        from chamjax.data.hard import make_hard_corpus
        hc = make_hard_corpus(d=args.d, n_clusters=args.n_clusters,
                              seed=args.seed)
        draw_b = hc.draw_base
        xt = jnp.concatenate([hc.draw_train(i, GEN)
                              for i in range(0, nt + GEN - 1, GEN)])[:nt]
    note(f"corpus family ready (hard={not args.easy}, d={args.d}, nb={nb})")

    cfg = IndexConfig(dim=args.d, nlist=args.nlist, m=args.m, list_pad=128,
                      balanced=True, balance_hard=True, balance_factor=1.3)
    from chamjax.searcher import auto_seg
    seg_est = auto_seg(np.full(args.nlist, max(nb // args.nlist, 1)))
    t0 = time.time()
    xt_box = [xt]
    del xt

    def xt_lazy():
        v = xt_box[0]
        xt_box[0] = None
        return v

    # hard-mode draws are GEN-granular (1M rows); at d=512 one GEN chunk
    # is already 2 GB f32 — the floor, not the target
    chunk = args.chunk or max(GEN, ((1 << 28) // args.d // GEN) * GEN)
    dev, info = build_ivfpq_device(
        draw_b, nb, cfg, xt_lazy, kmeans_iters=args.kmeans_iters,
        pq_iters=args.pq_iters, seed=args.seed, chunk=chunk,
        verbose=True, tile_seg=seg_est,
        # one resident layout: the serving path is the tiled kernel, and
        # m=32 at ~100M rows can't afford the flat twin next to it
        tile_only=True)
    jax.block_until_ready(dev.codes_t)
    note(f"index built in {time.time() - t0:.1f}s "
         f"(nlist={args.nlist}, m={args.m}, seg={seg_est})")

    retriever = DeviceRetriever(
        dev, info["list_len"],
        SearchConfig(nprobe=args.nprobe, k=10, seg=seg_est))
    # warm the serving jit at the wire batch so the first client request
    # doesn't pay a multi-second remote compile
    warm_q = np.zeros((args.batch, args.d), np.float32)
    r = retriever.retrieve(warm_q, args.nprobe, 10)
    note(f"serving path warm (ids[0,0]={r.ids[0, 0]})")

    srv = RetrievalServer(retriever, args.host, args.port, args.batch,
                          args.d, nprobe=args.nprobe)
    print("ENGINE READY", flush=True)
    note(f"ENGINE READY on {args.host}:{args.port} "
         f"(batch={args.batch}, up to {args.n_connections} connections)")
    srv.start(n_connections=args.n_connections)


if __name__ == "__main__":
    main()
