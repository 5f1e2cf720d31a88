"""Recall-loss decomposition for IVF-PQ search.

Answers "*why* did recall stop at X?" by classifying every missed
ground-truth neighbour into the stage that lost it:

- ``probe``     — its inverted list was not among the ``nprobe`` probed
  cells (coarse-quantizer loss; more probes would help);
- ``window``    — its list was probed but the static window budget W
  truncated the scan before reaching it (raise ``windows``/headroom);
- ``quant``     — it was scanned, but its ADC distance ranks beyond k
  (PQ reconstruction loss; more PQ bytes / OPQ would help);
- ``select``    — its ADC distance ranks within k yet it was not returned
  (approximate top-k truncation; raise ``recall_target``).

This is the measurement twin of the reference's probabilistic queue-sizing
argument (``python_probablistic_priority_queue/probablistic_priority_queue
.py`` bounds the ``select`` class analytically) and of its recall tables
(``Faiss_experiments/README.md``).  Used on the 100M corpus it showed
recall flat in nprobe (probe≈0) and dominated by ``quant`` — which is what
motivated the PQ32/OPQ operating points in RESULTS.md.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from chamjax.ops.coarse import select_probes
from chamjax.ops.lut import build_luts
from chamjax.ops.scan_seg import expand_windows
from chamjax.searcher import DeviceIVF


@functools.partial(jax.jit, static_argnames=("by_residual",))
def _adc_of_rows(index: DeviceIVF, q: jax.Array, rows: jax.Array,
                 lists_of_rows: jax.Array, by_residual: bool = True
                 ) -> jax.Array:
    """ADC distance of specific packed rows. q (b, d); rows (b, g) int32
    positions into the packed arrays; lists_of_rows (b, g) their cells."""
    codes = index.codes_t[:, rows]                    # (m, b, g)
    luts = build_luts(q, index.centroids, index.codebooks,
                      lists_of_rows, by_residual=by_residual)  # (b,g,256,m)
    m = codes.shape[0]
    g = jnp.transpose(codes, (1, 2, 0)).astype(jnp.int32)   # (b, g, m)
    lut_bgm = jnp.take_along_axis(
        luts, g[:, :, None, :], axis=2)[:, :, 0, :]          # (b, g, m)
    return jnp.sum(lut_bgm, axis=-1)


def recall_diagnosis(
    index: DeviceIVF,
    queries: np.ndarray,          # (b, d)
    gt_ids: np.ndarray,           # (b, kg) int64 ground-truth neighbours
    result_ids: np.ndarray,       # (b, k) returned ids
    result_dists: np.ndarray,     # (b, k) returned ADC distances
    *,
    nprobe: int,
    windows: int,
    seg: int,
    group: int = 1,
    at: int = 10,
    by_residual: bool = True,
    coarse_approx: bool = False,
    coarse_cand: int = 0,
) -> Dict[str, float]:
    """Fractions of gt@``at`` items by outcome:
    ``found`` + ``probe`` + ``window`` + ``quant`` + ``select`` = 1.

    ``coarse_approx``/``coarse_cand`` must mirror the settings the
    diagnosed search ran with — otherwise misses caused by an
    approx-dropped (or shortlist-dropped) probe are misclassified into the
    window/quant/select buckets."""
    b = queries.shape[0]
    gt = gt_ids[:, :at].astype(np.int64)

    # packed row position + owning list of every corpus id
    ids = np.asarray(index.ids)
    n_pad = ids.shape[0]
    valid = ids >= 0
    inv = np.full(int(ids[valid].max()) + 1, -1, np.int64)
    inv[ids[valid]] = np.nonzero(valid)[0]
    list_start = np.asarray(index.list_start)
    list_len = np.asarray(index.list_len)
    # list_of via searchsorted over starts (padding rows belong to the gap
    # after their list; gt rows are always real rows)
    rows = inv[gt]                                        # (b, at)
    list_of = np.searchsorted(list_start, rows, side="right") - 1

    q = jnp.asarray(queries, jnp.float32)
    if index.opq_R is not None:
        q = jnp.dot(q, index.opq_R, precision=jax.lax.Precision.HIGHEST)
    # resolve -1 (auto) the same way every search tier does, so passing
    # the searcher's SearchConfig value verbatim reproduces its probe set
    from chamjax.searcher import resolve_coarse_cand
    coarse_cand = resolve_coarse_cand(
        coarse_cand, int(index.centroids.shape[0]), nprobe)
    probe_ids, _ = select_probes(q, index.centroids, nprobe,
                                 coarse_cand=coarse_cand,
                                 use_approx=coarse_approx)
    probe_ids = np.asarray(probe_ids)                     # (b, nprobe)

    probed = (probe_ids[:, None, :] == list_of[:, :, None]).any(-1)

    # window reach: which probe rank, and does the budget cover the row's
    # segment?  Mirror expand_windows' probe-major packing exactly —
    # including the group round-up the grouped scan applies
    # (scan_lists_seg_multi: windows = ceil(W/group)*group), or a gt row
    # scanned in the rounded-up tail would be misreported as window loss
    windows = -(-windows // max(group, 1)) * max(group, 1)
    starts_w, lens_w, probe_w, valid_w = (np.asarray(a) for a in
                                          expand_windows(
        jnp.asarray(probe_ids), index.list_start, index.list_len,
        windows=windows, seg=seg))
    # a gt row is reachable iff some window [start, start+len) contains it
    reach = np.zeros((b, at), bool)
    for bi in range(b):
        s, ln = starts_w[bi], lens_w[bi]
        r = rows[bi]
        reach[bi] = ((r[:, None] >= s[None, :])
                     & (r[:, None] < (s + ln)[None, :])).any(-1)

    # ADC distance of gt rows (true quantized rank proxy): compare against
    # the kth returned distance
    adc = np.asarray(_adc_of_rows(
        index, q, jnp.asarray(rows, jnp.int32),
        jnp.asarray(list_of, jnp.int32), by_residual=by_residual))
    kth = result_dists[:, -1][:, None]

    found = (result_ids[:, :, None] == gt[:, None, :]).any(1)
    miss = ~found
    probe_loss = miss & ~probed
    window_loss = miss & probed & ~reach
    quant_loss = miss & reach & (adc > kth)
    select_loss = miss & reach & (adc <= kth)

    total = float(gt.size)
    return {
        "found": float(found.sum()) / total,
        "probe": float(probe_loss.sum()) / total,
        "window": float(window_loss.sum()) / total,
        "quant": float(quant_loss.sum()) / total,
        "select": float(select_loss.sum()) / total,
    }
