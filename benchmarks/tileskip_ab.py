"""Within-process A/B of a masked-tile skip in the ADC kernel. REJECTED.

Hypothesis: the production kernels compute every ``seg/128`` tile of a
window and mask invalid rows to +inf; real list-length tables rarely fill
the segment (the headline build averages ~48% fill), so branching out
(``pl.when``) tiles wholly past ``len`` should save their gather/unpack/
sum.

OUTCOME (v5e, 2026-08-19, one process, chained fori_loop slopes):
per-tile ``pl.when`` made the kernel 1.8-5.7x SLOWER everywhere — even
at the partial-fill profile it was built for:

    full_seg512      skip 2.130 ms   vs  all-tiles 0.869 ms
    headline_fill    skip 1.546 ms   vs  all-tiles 0.868 ms
    full_seg2048     skip 7.615 ms   vs  all-tiles 1.334 ms

Mosaic's ``scf.if`` regions serialize the tile bodies and break the
cross-tile software pipeline of the lane-gathers — exactly the
instruction stream that is the kernel's measured floor.  The masked
straight-line schedule stays production; this harness is kept as the
record (the kernels' ``tile_skip`` flag was removed again — rebuild it
from this file's git history if re-testing on a future Mosaic).

    python benchmarks/tileskip_ab.py   # (needs the flag restored)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from chamjax.ops.scan_seg import pack_luts_bf16               # noqa: E402
from chamjax.ops.scan_seg_multi import adc_scan_segments_multi  # noqa: E402
from benchmarks.kernel_variants import chained_ms             # noqa: E402


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/chamjax_jax_cache")
    assert jax.default_backend() == "tpu"

    m, n, bw, group = 16, 16_000_000, 4096, 8
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    codes = jax.random.randint(k1, (m, n), 0, 256, jnp.uint8)
    luts = pack_luts_bf16(
        jax.random.uniform(k2, (bw, m, 256), jnp.float32))
    lut_idx = jnp.arange(bw, dtype=jnp.int32)
    np.asarray(lut_idx[0])
    print(f"[data ready] n={n} m={m} bw={bw}", file=sys.stderr, flush=True)

    cases = []
    for seg in (512, 2048):
        starts = (jax.random.randint(k4, (bw,), 0, (n - seg) // 512,
                                     jnp.int32) * 512)
        full = jnp.full((bw,), seg, jnp.int32)
        cases.append((f"full_seg{seg}", seg, starts, full))
        if seg == 512:
            part = jax.random.randint(k5, (bw,), 32, seg + 1, jnp.int32)
            cases.append((f"headline_fill_seg{seg}", seg, starts, part))

    for name, seg, starts, lens in cases:
        useful = int(np.asarray(jnp.sum(lens)))
        for skip in (True, False):
            def step(acc, cd, st, ln, li, lt, seg=seg, skip=skip):
                iacc = jnp.int32(acc)
                out = adc_scan_segments_multi(
                    cd, st ^ iacc, ln, li ^ iacc, lt,
                    seg=seg, group=group, lut_bf16=True, tile_skip=skip)
                return out.reshape(-1)[0] * 0.0 + acc

            ms = chained_ms(step, (codes, starts, lens, lut_idx, luts))
            print(json.dumps({
                "case": name, "tile_skip": skip, "ms": round(ms, 4),
                "useful_grows": round(useful / ms / 1e6, 2),
                "slot_grows": round(bw * seg / ms / 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()
