"""Stage-level profiling study of the IVF-PQ search pipeline.

Parity with the reference's kernel-stage classification suite
(``Faiss_experiments/MICRO_GPU_profiling/profiling_stages.py`` — nsys-style
decomposition of Faiss GPU kernels vs batch/nlist/nprobe/topK): measures
each pipeline stage (coarse scan, LUT construction, window expansion, ADC
scan, top-k selection) with dispatch-slope timing, sweeps a config axis,
and compares against the analytic roofline (``chamjax.perf_model``).

    python benchmarks/profiling_stages.py --sweep batch --values 8 32 128
    python benchmarks/profiling_stages.py --sweep nprobe --values 8 16 32 64
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.utils import ResultStore                          # noqa: E402


def chained_ms(make_step, arrays=(), steps_small=8, steps_large=40, reps=3):
    """Per-call device ms via a carry-dependent chain: the stage runs
    `steps` times inside ONE dispatch (``make_step(acc, *arrays) -> acc``;
    the scalar carry perturbs an input, serializing iterations), so tunnel
    jitter amortizes away.

    Two remote-compile-service constraints shape this helper (see
    kernel_variants.py / the verify skill): the trip count is a *traced*
    fori_loop bound — a static-length lax.scan recompiles the whole Mosaic
    kernel per chain length — and ``arrays`` must be explicit jit ARGUMENTS,
    never closed over: closed-over device arrays ship as constants inside
    the compile request, which the service rejects past ~100 MB (at the
    100M config codes_t alone is 1.6 GB).  min over reps: contention only
    adds time."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(steps, *arrays):
        return jax.lax.fori_loop(
            0, steps, lambda _i, acc: make_step(acc, *arrays),
            jnp.float32(0.0))

    for s in (steps_small, steps_large):
        np.asarray(run(s, *arrays))              # compile + warm
    ts = {steps_small: [], steps_large: []}
    for _ in range(reps):
        for s in (steps_small, steps_large):
            t0 = time.perf_counter()
            np.asarray(run(s, *arrays))
            ts[s].append(time.perf_counter() - t0)
    return (min(ts[steps_large]) - min(ts[steps_small])) / (
        steps_large - steps_small) * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chamjax import perf_model as pm
    from chamjax.config import IndexConfig
    from chamjax.data import synthetic_dataset_device as synthetic_dataset
    from chamjax.index import build_ivfpq, PackedIVF
    from chamjax.ops.coarse import coarse_scan, coarse_scan_2stage
    from chamjax.ops.lut import build_luts
    from chamjax.ops.scan_seg import expand_windows
    from chamjax.ops.scan_seg_multi import (
        adc_scan_segments_multi, scan_lists_seg_multi,
    )
    from chamjax.ops.topk import select_topk
    from chamjax.searcher import DeviceIVF

    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--sweep", choices=["batch", "nprobe", "k"],
                    default="batch")
    ap.add_argument("--values", type=int, nargs="+", default=[8, 32, 128])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--seg", type=int, default=512)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--synthetic", action="store_true",
                    help="balanced random index at full shape (no build): "
                         "profile 100M/1B configs in seconds")
    ap.add_argument("--lane-l1", action="store_true",
                    help="also time the full pipeline with the in-kernel "
                         "lane-L1 reduction (SearchConfig.lane_l1)")
    ap.add_argument("--lut-bf16", action="store_true",
                    help="also time the packed-bf16 ADC scan (the "
                         "production default path)")
    ap.add_argument("--coarse-cand", type=int, default=0,
                    help="also time the two-stage coarse scan at this "
                         "shortlist width, and use it in the full path "
                         "(SearchConfig.coarse_cand)")
    ap.add_argument("--select-l1", type=int, default=0,
                    help="also time the full path with hierarchical "
                         "oversized-L1 selection at this L1 length "
                         "(SearchConfig.select_l1)")
    ap.add_argument("--tiled", type=int, default=1,
                    help="1 = seg-tiled codes + BlockSpec-pipelined scan "
                         "(scan_seg_block); 0 = manual-DMA multi kernel")
    ap.add_argument("--out", default="results/profiling_stages.pkl")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")
    if args.synthetic:
        # Stage *timings* depend only on shapes, never on data values —
        # a balanced random index at full (nb, nlist, m) shape profiles
        # the 100M/1B configs in seconds with no k-means build.
        from chamjax.ops.scan_seg import MAX_SEG
        from chamjax.searcher import DeviceIVF as _DIVF

        L = args.nb // args.nlist
        Lpad = -(-L // 128) * 128
        n_pad = args.nlist * Lpad + MAX_SEG
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        if args.tiled:
            # synthetic tiled twin: lists padded to seg boundaries
            Lpad = -(-L // args.seg) * args.seg
            n_pad = args.nlist * Lpad + MAX_SEG
            codes_t = jax.random.randint(ks[2], (args.m, n_pad), 0, 256,
                                         jnp.uint8)
            codes_tiled = (codes_t[:, :args.nlist * Lpad]
                           .reshape(args.m, -1, args.seg)
                           .transpose(1, 0, 2))
        else:
            codes_t = jax.random.randint(ks[2], (args.m, n_pad), 0, 256,
                                         jnp.uint8)
            codes_tiled = None
        dev = _DIVF(
            centroids=jax.random.normal(ks[0], (args.nlist, args.d),
                                        jnp.float32),
            codebooks=jax.random.normal(
                ks[1], (args.m, 256, args.d // args.m), jnp.float32),
            codes_t=codes_t,
            ids=jnp.arange(n_pad, dtype=jnp.int32),
            list_start=jnp.arange(args.nlist, dtype=jnp.int32) * Lpad,
            list_len=jnp.full((args.nlist,), L, jnp.int32),
            opq_R=None,
            codes_tiled=codes_tiled,
        )
        ds = synthetic_dataset(nb=1, nq=8192, nt=1, d=args.d, seed=42,
                               n_clusters=64, parts=("xq",), to_host=False)
        lens = np.full((args.nlist,), float(L))
    else:
        # Reuse bench.py's cached index when the shapes match (same
        # generator stream + build params), else build device-resident
        # (the tunnel moves ~2 MB/s — host-resident corpora cost minutes
        # per pass).
        nq_bench = 128 * 65 + 256
        bench_cache = (f"/tmp/chamjax_bench_idx_v7_{args.nb}_{args.d}"
                       f"_{args.nlist}_{args.m}_{nq_bench}.npz")
        cache = bench_cache if os.path.exists(bench_cache) else (
            f"/tmp/chamjax_prof_idx_v7_{args.nb}_{args.d}_{args.nlist}"
            f"_{args.m}.npz")
        cold = not os.path.exists(cache)
        ds = synthetic_dataset(nb=args.nb, nq=8192, nt=100_000, d=args.d,
                               seed=42, n_clusters=4096,
                               parts=(("xb", "xt", "xq") if cold
                                      else ("xq",)),
                               to_host=False)
        if not cold:
            idx = PackedIVF.load(cache)
        else:
            # hard cap == seg, mirroring bench.py: single-segment lists
            # let auto_windows collapse W to nprobe at unchanged recall
            idx = build_ivfpq(ds.xb, IndexConfig(
                dim=args.d, nlist=args.nlist, m=args.m, balanced=True,
                balance_hard=True,
                balance_factor=args.seg * args.nlist / args.nb,
                list_pad=128),
                xt=ds.xt, kmeans_iters=10, pq_iters=10)
            idx.save(cache)
        dev = DeviceIVF.from_packed(
            idx, tile_seg=args.seg if args.tiled else 0)
        lens = idx.list_len.astype(np.float64)
    store = ResultStore(args.out, load=True, overwrite=True)

    for v in args.values:
        batch = v if args.sweep == "batch" else args.batch
        nprobe = v if args.sweep == "nprobe" else args.nprobe
        k = v if args.sweep == "k" else args.k
        segs = np.ceil(lens / args.seg)
        w_mean = float((lens * segs).sum() / lens.sum())
        W = int(np.ceil(nprobe * w_mean * 1.2)) + 4
        W = -(-W // args.group) * args.group

        q0 = jnp.asarray(np.resize(ds.xq[:batch], (batch, args.d)))
        li, _ = coarse_scan(q0, dev.centroids, nprobe)
        luts0 = build_luts(q0, dev.centroids, dev.codebooks, li,
                           by_residual=True)
        starts, lens_w, probe, _ = expand_windows(
            li, dev.list_start, dev.list_len, windows=W, seg=args.seg)
        lut_idx = (jnp.arange(batch, dtype=jnp.int32)[:, None] * nprobe
                   + probe).reshape(-1)
        luts_k0 = luts0.transpose(0, 1, 3, 2).reshape(
            batch * nprobe, args.m, 256)
        dists0 = adc_scan_segments_multi(
            dev.codes_t, starts.reshape(-1), lens_w.reshape(-1), lut_idx,
            luts_k0, seg=args.seg, group=args.group).reshape(batch, -1)

        def dep(out):
            return out.reshape(-1)[0].astype(jnp.float32) * 0.0

        starts_f = starts.reshape(-1)
        lens_f = lens_w.reshape(-1)
        t_coarse = chained_ms(
            lambda acc, q, c: dep(coarse_scan(q + acc, c, nprobe)[1]),
            (q0, dev.centroids))
        t_coarse2 = None
        if args.coarse_cand > 0:
            t_coarse2 = chained_ms(
                lambda acc, q, c: dep(coarse_scan_2stage(
                    q + acc, c, nprobe, cand=args.coarse_cand)[1]),
                (q0, dev.centroids))
        t_lut = chained_ms(
            lambda acc, q, c, cb, li_: dep(build_luts(
                q + acc, c, cb, li_, by_residual=True)),
            (q0, dev.centroids, dev.codebooks, li))
        t_scan = chained_ms(
            lambda acc, ct, st, ln, lx, lk: dep(adc_scan_segments_multi(
                ct, st, ln, lx, lk + acc, seg=args.seg, group=args.group)),
            (dev.codes_t, starts_f, lens_f, lut_idx, luts_k0))
        t_scan_bf16 = None
        if args.lut_bf16:
            from chamjax.ops.scan_seg import pack_luts_bf16
            t_scan_bf16 = chained_ms(
                lambda acc, ct, st, ln, lx, lk: dep(adc_scan_segments_multi(
                    ct, st, ln, lx, pack_luts_bf16(lk + acc),
                    seg=args.seg, group=args.group, lut_bf16=True)),
                (dev.codes_t, starts_f, lens_f, lut_idx, luts_k0))
        t_topk = chained_ms(
            lambda acc, d0: dep(select_topk(d0 + acc, k)[0]), (dists0,))
        t_expand = chained_ms(
            lambda acc, li_, ls, ll: dep(expand_windows(
                (li_ + acc.astype(jnp.int32)) % dev.centroids.shape[0],
                ls, ll, windows=W, seg=args.seg)[0].astype(jnp.float32)),
            (li, dev.list_start, dev.list_len))

        def full_step(acc, ct, ids_, ls, ll, q, c, cb, lane_l1=False,
                      select_l1=0):
            if args.coarse_cand > 0:
                li2 = coarse_scan_2stage(q + acc, c, nprobe,
                                         cand=args.coarse_cand)[0]
            else:
                li2 = coarse_scan(q + acc, c, nprobe)[0]
            return dep(scan_lists_seg_multi(
                ct, ids_, ls, ll,
                build_luts(q + acc, c, cb, li2, by_residual=True), li2,
                windows=W, seg=args.seg, group=args.group, k=k,
                lut_bf16=args.lut_bf16, lane_l1=lane_l1,
                select_l1=select_l1)[0])

        full_arrays = (dev.codes_t, dev.ids, dev.list_start, dev.list_len,
                       q0, dev.centroids, dev.codebooks)
        t_full = chained_ms(full_step, full_arrays)
        t_full_lane = None
        if args.lane_l1:
            t_full_lane = chained_ms(
                functools.partial(full_step, lane_l1=True), full_arrays)
        t_full_sl1 = None
        if args.select_l1 > 0:
            t_full_sl1 = chained_ms(
                functools.partial(full_step, select_l1=args.select_l1),
                full_arrays)

        model = pm.search_latency_model(
            args.nb, args.nlist, nprobe, args.m, args.d, batch,
            lut_bf16=bool(args.lut_bf16), seg=args.seg, windows=W,
            coarse_2stage=args.coarse_cand > 0)
        res = {
            "coarse_ms": round(t_coarse, 4),
            **({"coarse2_ms": round(t_coarse2, 4)}
               if t_coarse2 is not None else {}),
            "lut_ms": round(t_lut, 4),
            "scan_ms": round(t_scan, 4),
            **({"scan_bf16_ms": round(t_scan_bf16, 4)}
               if t_scan_bf16 is not None else {}),
            "topk_ms": round(t_topk, 4),
            "expand_ms": round(t_expand, 4),
            "full_ms": round(t_full, 4),
            **({"full_lane_l1_ms": round(t_full_lane, 4)}
               if t_full_lane is not None else {}),
            **({"full_select_l1_ms": round(t_full_sl1, 4)}
               if t_full_sl1 is not None else {}),
            "model_total_ms": round(model["t_total_s"] * 1e3, 4),
            "qps": round(batch / t_full * 1e3, 1),
        }
        store.put((f"nb{args.nb}", args.sweep, v), res)
        store.save()
        print(f"{args.sweep}={v} (b={batch} nprobe={nprobe} k={k} W={W}): "
              f"{res}", flush=True)


if __name__ == "__main__":
    main()
