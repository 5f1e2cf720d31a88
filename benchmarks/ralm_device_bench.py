#!/usr/bin/env python
"""Fused device-resident RALM benchmark: decode + retrieval on one chip.

The measurement behind RESULTS.md's RALM table.  Builds a synthetic
corpus + IVF-PQ index at the model's hidden dimension entirely on device,
wires a ``LocalRetriever`` (whose ``retrieve_device`` keeps queries/results
in HBM), and times ``batch_inference`` wall-clock over the whole fused
chain — the rebuild of the reference's RALM experiment
(``experiments/GPU_process.py`` timing loop, where each step instead paid a
GPU→host→socket→CPU/FPGA round trip).

Usage: python benchmarks/ralm_device_bench.py --preset Llama-S --batch 64
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="Dec-S")
    ap.add_argument("--presets", type=str, default="",
                    help="comma list of presets sharing ONE index build "
                         "(must all have the same embed_dim); overrides "
                         "--preset")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--interval", type=int, default=1)
    ap.add_argument("--intervals", type=str, default="",
                    help="comma list of retrieval intervals to sweep in ONE "
                         "process (the index build + model init are paid "
                         "once); overrides --interval")
    ap.add_argument("--nb", type=int, default=1_000_000)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--streamed", action="store_true",
                    help="build the corpus via the streamed device builder "
                         "(100M-scale; never materializes the corpus)")
    ap.add_argument("--hard", action="store_true",
                    help="streamed: hard-mode corpus family "
                         "(chamjax/data/hard.py) at the model's hidden "
                         "dim — the retrieval leg does real work instead "
                         "of saturating on an easy clustered draw")
    ap.add_argument("--n-clusters", type=int, default=0,
                    help="corpus cluster count (0: nlist for the easy "
                         "draw, 4*nlist for --hard)")
    ap.add_argument("--balance", type=float, default=0.0,
                    help="> 0: hard-capped balanced assignment at cap = "
                         "ceil(nb/nlist * BALANCE) in the streamed builder "
                         "(collapses auto_windows to ~nprobe; see "
                         "RESULTS.md hard-cap section)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")

    from chamjax.config import (
        IndexConfig, MODEL_PRESETS, SearchConfig,
    )
    from chamjax.data import synthetic_dataset_device
    from chamjax.index import build_ivfpq
    from chamjax.models import init_decoder, init_encoder_decoder, init_llama
    from chamjax.retrieval.local import LocalRetriever
    from chamjax.serving.ralm import RalmDecoder, RalmEncoderDecoder

    import dataclasses
    presets = ([p for p in args.presets.split(",") if p]
               if args.presets else [args.preset])
    mcfgs = {}
    for p in presets:
        m_ = MODEL_PRESETS[p]
        # KV cache is allocated at max_seq_len; clamp it to the measured
        # steps (13.5 GB of Llama-7B params leave no room for a 512-slot
        # cache)
        mcfgs[p] = dataclasses.replace(
            m_, max_seq_len=min(m_.max_seq_len,
                                args.steps + args.warmup + 8))
    dims = {m_.embed_dim for m_ in mcfgs.values()}
    assert len(dims) == 1, f"--presets must share embed_dim, got {dims}"
    mcfg = next(iter(mcfgs.values()))
    d = mcfg.embed_dim
    t0 = time.time()
    if args.streamed:
        # 100M-scale: stream deterministic device draws through the
        # device-resident builder (the corpus never materializes anywhere)
        import functools
        import jax.numpy as jnp
        from chamjax.index import build_ivfpq_device
        from chamjax.retrieval.local import DeviceRetriever

        GEN = max(8192, (1 << 26) // d)
        if args.hard:
            from chamjax.data.hard import make_hard_corpus
            hc = make_hard_corpus(
                d=d, n_clusters=args.n_clusters or 4 * args.nlist, seed=11)

            # hard.draw_base works at 1M granularity; adapt to GEN chunks
            HGEN = 1 << 20
            nb = args.nb = (args.nb // HGEN) * HGEN

            def draw(s, c):
                return hc.draw_base(s, c)

            nt = min(2_000_000, nb)

            def draw_xt():
                return jnp.concatenate(
                    [hc.draw_train(i, HGEN)
                     for i in range(0, nt + HGEN - 1, HGEN)])[:nt]

            # 1M-row granularity; at d=512 one chunk is already 2 GB f32
            chunk = HGEN
        else:
            rank = max(4, d // 4)
            key = jax.random.PRNGKey(11)
            k_c, k_p = jax.random.split(key)
            centers = jax.random.normal(
                k_c, (args.n_clusters or args.nlist, d), jnp.float32) * 4.0
            proj = (jax.random.normal(k_p, (rank, d), jnp.float32)
                    / np.sqrt(rank))

            @functools.partial(jax.jit, static_argnames=("n",))
            def _gen(k, n):
                k1, k2, k3 = jax.random.split(k, 3)
                asg = jax.random.randint(k1, (n,), 0, centers.shape[0])
                z = jax.random.normal(k2, (n, rank), jnp.float32)
                noise = jax.random.normal(k3, (n, d), jnp.float32) * 0.05
                return centers[asg] + jnp.dot(z, proj) + noise

            def draw(s, c):
                parts = [_gen(jax.random.fold_in(key, 1_000_000 + s + i),
                              GEN)
                         for i in range(0, c, GEN)]
                return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

            nb = args.nb = (args.nb // GEN) * GEN
            nt = min(2_000_000, nb)

            def draw_xt():   # lazy: freed inside the builder after training
                return jnp.concatenate(
                    [_gen(jax.random.fold_in(key, 2_000_000 + i), GEN)
                     for i in range(0, nt + GEN - 1, GEN)])[:nt]

            chunk = 8 * GEN

        # tile-aligned pack → the BlockSpec-pipelined production scan in
        # the fused retrieval leg (the resident LocalRetriever path tiles
        # via IVFSearcher; this streamed path must ask at build time)
        from chamjax.searcher import auto_seg
        seg_est = auto_seg(np.full(args.nlist, max(nb // args.nlist, 1)))
        dev, info = build_ivfpq_device(
            draw, nb, IndexConfig(dim=d, nlist=args.nlist, m=args.m,
                                  list_pad=128,
                                  balanced=args.balance > 0,
                                  balance_hard=True,
                                  balance_factor=args.balance or 1.3),
            draw_xt, kmeans_iters=8, pq_iters=8, chunk=chunk,
            verbose=True, tile_seg=seg_est,
            # serving uses the tiled kernel only; skip the flat twin so
            # d=512/m=32 100M builds fit next to the model params
            tile_only=True)
        retriever = DeviceRetriever(
            dev, info["list_len"],
            SearchConfig(nprobe=args.nprobe, k=args.k, seg=seg_est,
                         approx_recall_target=0.99))
    else:
        # generator chunk sized to ~256 MB so very wide models (Llama-7B,
        # d=4096) don't materialize multi-GB draw chunks next to params
        ds = synthetic_dataset_device(nb=args.nb, nq=8,
                                      nt=min(100_000, args.nb),
                                      d=d, seed=11, n_clusters=args.nlist,
                                      chunk=max(8192, (1 << 26) // d),
                                      parts=("xb", "xt"), to_host=False)
        idx = build_ivfpq(
            ds.xb, IndexConfig(dim=d, nlist=args.nlist, m=args.m,
                               list_pad=128, balanced=True,
                               balance_factor=1.3),
            xt=ds.xt, kmeans_iters=8, pq_iters=8)
        retriever = LocalRetriever(idx, SearchConfig(nprobe=args.nprobe,
                                                     k=args.k))
        del ds, idx     # drop the HBM corpus before the params allocate
    print(f"index ready in {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)

    key = jax.random.PRNGKey(0)
    intervals = ([int(s) for s in args.intervals.split(",") if s]
                 if args.intervals else [args.interval])
    for preset in presets:
        mcfg = mcfgs[preset]
        if mcfg.model_type == "encoder-decoder":
            enc_dec = init_encoder_decoder(key, mcfg)
            params = None
        else:
            enc_dec = None
            params = (init_llama(key, mcfg) if mcfg.model_type == "llama"
                      else init_decoder(key, mcfg))

        for interval in intervals:
            if enc_dec is not None:
                loop = RalmEncoderDecoder(*enc_dec, mcfg, retriever,
                                          args.batch,
                                          retrieval_interval=interval,
                                          nprobe=args.nprobe, k=args.k)
            else:
                loop = RalmDecoder(params, mcfg, retriever, args.batch,
                                   retrieval_interval=interval,
                                   nprobe=args.nprobe, k=args.k)

            loop.batch_inference(args.warmup)
            loop.reset_inference_state()
            loop.batch_inference(args.steps)
            tps = loop.throughput_tokens_per_sec(args.steps)
            ms_step = loop.total_wall_s / args.steps * 1e3
            print(json.dumps({
                "preset": preset, "batch": args.batch,
                "interval": interval, "nprobe": args.nprobe, "k": args.k,
                "steps": args.steps, "tok_per_s": round(tps, 1),
                "ms_per_step": round(ms_step, 3),
                "nb": args.nb, "m": args.m,
            }), flush=True)
            del loop
        del params, enc_dec


if __name__ == "__main__":
    main()
