"""ADC-kernel roofline study: raw/useful rows/s vs the HBM bound.

The FPGA reference is bandwidth-bound by design (QPS = 32 GB/s /
(rows/query · m), ``performance_modeling/perf_model.py:39-46``); this
harness measures where the TPU kernel sits against the v5e's ~819 GB/s
HBM and the VPU instruction budget, on *full* windows (the 1B-config
regime: nlist=65536 average lists are ~15k rows, so windows carry no
padding and raw == useful).

Synthetic workload — no index needed: a big (m, N) u8 code slab, random
128-aligned window starts, full lens, random LUT assignment.  Timing via
the chained-scan dispatch slope (block_until_ready lies under axon, see
.claude/skills/verify/SKILL.md).

    python benchmarks/kernel_roofline.py            # default matrix
    python benchmarks/kernel_roofline.py --variants seg_f32 seg_bf16
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0          # v5e spec


def chained_ms(make_step, arrays, steps_small=4, steps_large=16):
    import jax
    import jax.numpy as jnp

    # fori_loop with a traced trip count: ONE compile serves both chain
    # lengths (static-length scan would recompile the Mosaic kernel per
    # length — minutes each through the remote compile service)
    @jax.jit
    def run(steps, *arrays):
        return jax.lax.fori_loop(
            0, steps, lambda _i, acc: make_step(acc, *arrays),
            jnp.float32(0.0))

    for s in (steps_small, steps_large):
        np.asarray(run(s, *arrays))
    ts = {}
    for s in (steps_small, steps_large):
        t0 = time.perf_counter()
        np.asarray(run(s, *arrays))
        ts[s] = time.perf_counter() - t0
    return (ts[steps_large] - ts[steps_small]) / (
        steps_large - steps_small) * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chamjax.ops.scan_seg import pack_luts_bf16
    from chamjax.ops.scan_seg_block import adc_scan_tiles
    from chamjax.ops.scan_seg_multi import adc_scan_segments_multi

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16_000_000,
                    help="code rows in the slab (16M x m16 = 256 MB); use "
                         "~134M for the per-chip 1B-shard working set")
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--bw", type=int, default=4096,
                    help="windows per call (b*W)")
    ap.add_argument("--n_lut", type=int, default=4096)
    ap.add_argument("--segs", type=int, nargs="+", default=[1024, 2048])
    ap.add_argument("--groups", type=int, nargs="+", default=[8])
    ap.add_argument("--variants", nargs="+",
                    default=["seg_f32", "seg_bf16", "block_f32",
                             "block_bf16"],
                    help="seg_* = manual-DMA multi-window kernel; block_* "
                         "= BlockSpec-pipelined tiled kernel "
                         "(scan_seg_block, the production scan)")
    ap.add_argument("--reps", type=int, default=1,
                    help="interleaved repetitions of the whole matrix; "
                         "per-config MIN is reported (trial-order warmup "
                         "and tunnel contention bias single passes)")
    ap.add_argument("--runlen", type=int, nargs="+", default=[0],
                    help="> 0: windows arrive in runs of L consecutive "
                         "tiles sharing one LUT — the production "
                         "distribution after the slot-major window "
                         "permutation (a multi-segment list's windows hit "
                         "one slot back-to-back, so the Pallas equal-"
                         "index refetch skip elides the LUT copies and "
                         "tile fetches go sequential).  0 = fully random "
                         "(worst case).")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")
    assert jax.default_backend() == "tpu", jax.default_backend()

    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    m, n, bw = args.m, args.n, args.bw
    codes_t = jax.random.randint(k1, (m, n), 0, 256, jnp.uint8)
    luts = jax.random.uniform(k2, (args.n_lut, m, 256), jnp.float32)
    luts_p = pack_luts_bf16(luts)
    lut_idx = jax.random.randint(k3, (bw,), 0, args.n_lut, jnp.int32)

    best_ms = {}
    rows = []
    for rep in range(args.reps):
      for seg in args.segs:
        max_start = (n - seg) // 128
        starts = (jax.random.randint(k4, (bw,), 0, max_start, jnp.int32)
                  * 128)
        lens = jnp.full((bw,), seg, jnp.int32)
        total_rows = bw * seg
        # seg-tiled twin for the block variants: same bytes, tile-major
        # layout; random TILE indices span the full slab (no cache help)
        n_tiles = n // seg
        needs_block = any(v.startswith("block") for v in args.variants)
        codes_tiled = (codes_t[:, : n_tiles * seg]
                       .reshape(m, n_tiles, seg).transpose(1, 0, 2)
                       if needs_block else None)
        tile_idx = jax.random.randint(k4, (bw,), 0, n_tiles, jnp.int32)

        def run_streams(G, L):
            """Slot-major run layout: slot j (flat indices i*G+j) walks
            runs of L consecutive tiles sharing one LUT back-to-back —
            the distribution the production slot-major window permutation
            produces for multi-segment lists."""
            steps = bw // G
            n_runs = -(-steps // L)
            rt = jax.random.randint(k4, (G, n_runs), 0,
                                    max(n_tiles - L, 1), jnp.int32)
            rl = jax.random.randint(k3, (G, n_runs), 0, args.n_lut,
                                    jnp.int32)
            i = jnp.arange(steps, dtype=jnp.int32)
            st = rt[:, i // L] + (i % L)[None, :]          # (G, steps)
            sl = rl[:, i // L]
            return (st.T.reshape(-1), sl.T.reshape(-1))
        for group in args.groups:
          for runlen in args.runlen:
            ti_g, li_g = ((tile_idx, lut_idx) if runlen <= 1
                          else run_streams(group, runlen))
            for variant in args.variants:
                lut_bf16 = "bf16" in variant
                lt = luts_p if lut_bf16 else luts

                if variant.startswith("block"):
                    dist_bf16 = variant.endswith("bf16d")
                    ablate = ("copy" if variant.endswith("copy") else
                              "nogather" if variant.endswith("nogather")
                              else "")

                    def step(acc, codes_tiled, tile_idx, lens, lut_idx, lt,
                             seg=seg, group=group, lut_bf16=lut_bf16,
                             dist_bf16=dist_bf16, ablate=ablate):
                        iacc = jnp.int32(acc)
                        out = adc_scan_tiles(
                            codes_tiled, tile_idx ^ iacc, lens,
                            lut_idx ^ iacc, lt, seg=seg, group=group,
                            lut_bf16=lut_bf16, dist_bf16=dist_bf16,
                            debug_ablate=ablate)
                        return (out.reshape(-1)[0].astype(jnp.float32)
                                * 0.0 + acc)

                    ms = chained_ms(step, (codes_tiled, ti_g, lens,
                                           li_g, lt))
                else:
                    def step(acc, codes_t, starts, lens, lut_idx, lt,
                             seg=seg, group=group, lut_bf16=lut_bf16):
                        iacc = jnp.int32(acc)   # real data dep, 0 at runtime
                        out = adc_scan_segments_multi(
                            codes_t, starts ^ iacc, lens, lut_idx ^ iacc,
                            lt, seg=seg, group=group, lut_bf16=lut_bf16)
                        return out.reshape(-1)[0] * 0.0 + acc

                    ms = chained_ms(step,
                                    (codes_t, starts, lens, lut_idx, lt))
                key_ = (variant, seg, group, runlen)
                if ms > 0:      # a tunnel hiccup mid-slope can go negative
                    best_ms[key_] = min(best_ms.get(key_, ms), ms)
                grows = total_rows / ms / 1e6
                gbs = grows * m
                rows.append(dict(variant=variant, seg=seg, group=group,
                                 runlen=runlen, rep=rep,
                                 ms=round(ms, 3), grows=round(grows, 3),
                                 code_gbs=round(gbs, 1),
                                 pct_hbm=round(100 * gbs / HBM_GBPS, 1)))
                print(json.dumps(rows[-1]), flush=True)
        del codes_tiled
    if args.reps > 1:
        print("--- per-config min over "
              f"{args.reps} interleaved reps ---", flush=True)
        for (variant, seg, group, runlen), ms in sorted(best_ms.items()):
            total_rows = bw * seg
            grows = total_rows / ms / 1e6
            gbs = grows * m
            print(json.dumps(dict(
                variant=variant, seg=seg, group=group, runlen=runlen,
                best_ms=round(ms, 3),
                grows=round(grows, 3), code_gbs=round(gbs, 1),
                pct_hbm=round(100 * gbs / HBM_GBPS, 1))), flush=True)
    # headline from the hiccup-filtered per-config minima (raw rows can
    # carry a spuriously tiny positive slope from a tunnel glitch)
    def grows_of(item):
        (variant, seg, group, runlen), ms = item
        return bw * seg / ms / 1e6

    (bv, bs, bg, brl), bms = max(best_ms.items(), key=grows_of)
    best = dict(variant=bv, seg=bs, group=bg, runlen=brl,
                best_ms=round(bms, 3),
                grows=round(bw * bs / bms / 1e6, 3),
                pct_hbm=round(100 * bw * bs / bms / 1e6 * m / HBM_GBPS, 1))
    print("BEST:", json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
