"""End-to-end IVF-PQ search: one jitted XLA program per (batch, nprobe, k).

Composes the query path of SURVEY.md §3.3 — coarse scan → LUT construction →
list scan → top-k — into a single compiled function over a device-resident
index, the TPU rebuild of the reference's distributed
scanner→coordinator→FPGA pipeline collapsed into one chip's dataflow.
"""

from __future__ import annotations

import functools
import warnings
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chamjax.config import SearchConfig
from chamjax.index.ivf import PackedIVF
from chamjax.ops.coarse import select_probes
from chamjax.ops.lut import build_luts
from chamjax.ops.scan_pallas import scan_lists_pallas
from chamjax.ops.scan_seg import scan_lists_seg
from chamjax.ops.scan_seg_block import scan_lists_seg_block
from chamjax.ops.scan_seg_multi import scan_lists_seg_multi
from chamjax.ops.scan_xla import scan_lists_xla


class DeviceIVF(NamedTuple):
    """Device-resident index arrays (a pytree — jit/pjit friendly).

    ``codes_t``/``ids`` carry ``SEG`` extra padding rows so the segmented
    kernel's fixed-size window DMAs may overread past the last list
    (results there are masked by the per-window length).

    ``codes_tiled`` (optional, ``from_packed(tile_seg=...)``): the same
    codes seg-TILED as ``(n_tiles, m, seg)`` with every list starting on
    a tile boundary — the layout of the BlockSpec-pipelined scan
    (``ops/scan_seg_block.py``).  When present, ``ids``/``list_start``
    are in the tile-aligned coordinate system (shared by the flat twin,
    which is repacked to the same offsets so every backend agrees).
    """

    centroids: jax.Array     # (nlist, d) f32
    codebooks: jax.Array     # (m, ksub, dsub) f32
    codes_t: jax.Array       # (m, n_pad + SEG) uint8 — transposed (SoA) codes
    ids: jax.Array           # (n_pad + SEG,) int32
    list_start: jax.Array    # (nlist,) int32
    list_len: jax.Array      # (nlist,) int32
    opq_R: Optional[jax.Array] = None  # (d, d) f32 or None
    codes_tiled: Optional[jax.Array] = None   # (n_tiles, m, seg) uint8

    @staticmethod
    def from_packed(index: PackedIVF, device=None,
                    tile_seg: int = 0) -> "DeviceIVF":
        from chamjax.ops.scan_seg import MAX_SEG
        put = functools.partial(jax.device_put, device=device)
        # int32 id/row space: the resident tier addresses rows and carries
        # vector ids as int32 (the reference carries uint64 ids end-to-end,
        # SRC/types.hpp) — past ~2.1B padded rows per id space it would
        # wrap SILENTLY.  Shard (per-shard local ids, sharded_search.py) or
        # use the streamed tier (int64-native) beyond that.
        worst_pad = (int(index.list_len.shape[0]) * max(int(tile_seg), 1)
                     + MAX_SEG)
        assert int(index.codes.shape[0]) + worst_pad < 2 ** 31, (
            f"{index.codes.shape[0]} rows (+{worst_pad} padding) overflow "
            "the resident tier's int32 id space; shard the corpus "
            "(parallel/sharded_search.py) or serve it from the streamed "
            "tier (chamjax/streamed.py, int64-native)")
        codes_tiled = None
        if tile_seg:
            # Re-pack every list onto tile_seg boundaries (host-side, one
            # pass) so both layouts share one coordinate system.
            seg = int(tile_seg)
            lens = np.asarray(index.list_len, np.int64)
            tiles_per = np.maximum(1, -(-lens // seg))
            new_start = (np.concatenate(
                [[0], np.cumsum(tiles_per)[:-1]]) * seg).astype(np.int64)
            n = int(tiles_per.sum()) * seg
            codes_flat = np.zeros((n + MAX_SEG, index.codes.shape[1]),
                                  np.uint8)
            ids_new = np.full(n + MAX_SEG, -1, np.int32)
            old_start = np.asarray(index.list_start, np.int64)
            for li in range(lens.shape[0]):
                ln = int(lens[li])
                if ln == 0:
                    continue
                so, sn = int(old_start[li]), int(new_start[li])
                codes_flat[sn:sn + ln] = index.codes[so:so + ln]
                ids_new[sn:sn + ln] = index.ids[so:so + ln]
            codes_t = np.ascontiguousarray(codes_flat.T)
            ids = ids_new
            list_start = new_start.astype(np.int32)
            codes_tiled = np.ascontiguousarray(
                codes_flat[:n].reshape(-1, seg, index.codes.shape[1])
                .transpose(0, 2, 1))
        else:
            codes_t = np.ascontiguousarray(index.codes.T)
            codes_t = np.pad(codes_t, ((0, 0), (0, MAX_SEG)))
            ids = np.pad(index.ids, (0, MAX_SEG), constant_values=-1)
            list_start = index.list_start
        return DeviceIVF(
            centroids=put(index.centroids),
            codebooks=put(index.codebooks),
            codes_t=put(codes_t),
            ids=put(ids),
            list_start=put(list_start),
            list_len=put(index.list_len),
            opq_R=put(index.opq_R) if index.opq_R is not None else None,
            codes_tiled=(put(codes_tiled) if codes_tiled is not None
                         else None),
        )


@functools.partial(jax.jit, static_argnames=("seg", "cap_new"))
def _retile_core(codes_t, ids, list_start, list_len, *, seg: int,
                 cap_new: int):
    """Device-side repack of a flat CSR layout onto ``seg`` boundaries.

    The boundary-mark construction (``device_build._pack_layout_core``)
    runs at TILE granularity — every new-layout tile belongs to exactly
    one list, so the scatter/cumsum tables are ``cap_new/seg`` long, not
    ``cap_new`` (a corpus-length scatter+cummax graph SIGKILLed the
    remote compile helper at 33M rows).  Per-element work is then two
    small-table gathers.  Everything stays on device — at 100M+ scale
    nothing corpus-sized may cross the host link.
    """
    nlist = list_len.shape[0]
    eff = list_len.astype(jnp.int32)
    tiles_per = jnp.maximum((eff + seg - 1) // seg, 1)
    tile_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(tiles_per)[:-1].astype(jnp.int32)])
    new_start = tile_start * seg
    n_tiles = cap_new // seg
    mark = jnp.zeros((n_tiles,), jnp.int32).at[tile_start].add(1)
    list_of_tile = jnp.minimum(jnp.cumsum(mark) - 1, nlist - 1)
    # all corpus-sized work in (n_tiles, seg) shape with data-dependent
    # values: a corpus-length constant iota chain was constant-folded by
    # the XLA compiler into hundreds of MB of host buffers and OOM-killed
    # the remote compile helper
    t_iota = jnp.arange(n_tiles, dtype=jnp.int32)
    base = t_iota * seg - new_start[list_of_tile]       # (T,) offset base
    off2d = base[:, None] + jnp.arange(seg, dtype=jnp.int32)[None, :]
    eff_t = eff[list_of_tile]
    valid2d = (off2d >= 0) & (off2d < eff_t[:, None])
    src2d = jnp.clip(list_start[list_of_tile][:, None] + off2d,
                     0, codes_t.shape[1] - 1)
    ids_new = jnp.where(valid2d, ids[src2d], jnp.int32(-1)).reshape(-1)
    m = codes_t.shape[0]
    codes_new = jnp.take(codes_t, src2d.reshape(-1), axis=1)
    codes_tiled = (codes_new.reshape(m, n_tiles, seg).transpose(1, 0, 2))
    return codes_new, ids_new, new_start, codes_tiled


def retile_device_ivf(dev: DeviceIVF, seg: int,
                      list_len_host: Optional[np.ndarray] = None
                      ) -> DeviceIVF:
    """Re-pack a device-resident index onto ``seg`` tile boundaries and
    attach the ``codes_tiled`` twin (the BlockSpec-pipelined scan's
    layout) — the post-build path for ``build_ivfpq_device`` indexes whose
    ``seg`` is auto-sized from the built list-length distribution.

    Pulls only the (nlist,) length table to size the static capacity;
    codes/ids are re-gathered on device (transient ~3× codes HBM).
    """
    from chamjax.ops.scan_seg import MAX_SEG
    ll = (np.asarray(dev.list_len) if list_len_host is None
          else np.asarray(list_len_host))
    padded = (np.maximum(np.ceil(ll / seg), 1) * seg).astype(np.int64)
    cap_new = int(padded.sum()) + max(MAX_SEG, seg)
    cap_new = -(-cap_new // seg) * seg
    codes_new, ids_new, new_start, codes_tiled = _retile_core(
        dev.codes_t, dev.ids, dev.list_start, dev.list_len,
        seg=seg, cap_new=cap_new)
    return dev._replace(codes_t=codes_new, ids=ids_new,
                        list_start=new_start, codes_tiled=codes_tiled)


def _dispatch_scan(index: DeviceIVF, luts, list_ids, *, k, scan_len,
                   windows, seg, group, probe_chunk, use_approx,
                   recall_target, backend, tile, interpret,
                   lut_bf16=False, select_l1=0, lane_l1=False,
                   slot_major=True):
    # Pallas kernels only compile for TPU; anywhere else run interpreted
    # (tests / debugging) — backend choice stays explicit.
    interpret = interpret or jax.default_backend() != "tpu"
    if backend == "seg":
        if (index.codes_tiled is not None
                and index.codes_tiled.shape[2] == seg):
            return scan_lists_seg_block(
                index.codes_tiled, index.ids, index.list_start,
                index.list_len, luts, list_ids,
                windows=windows, seg=seg, group=max(group, 1), k=k,
                use_approx=use_approx, recall_target=recall_target,
                interpret=interpret, lut_bf16=lut_bf16,
                select_l1=select_l1, lane_l1=lane_l1,
                slot_major=slot_major,
            )
        if group > 1:
            return scan_lists_seg_multi(
                index.codes_t, index.ids, index.list_start, index.list_len,
                luts, list_ids,
                windows=windows, seg=seg, group=group, k=k,
                use_approx=use_approx, recall_target=recall_target,
                interpret=interpret, lut_bf16=lut_bf16,
                select_l1=select_l1, lane_l1=lane_l1,
            )
        return scan_lists_seg(
            index.codes_t, index.ids, index.list_start, index.list_len,
            luts, list_ids,
            windows=windows, seg=seg, k=k,
            use_approx=use_approx, recall_target=recall_target,
            interpret=interpret, lut_bf16=lut_bf16, select_l1=select_l1,
        )
    if backend == "pallas":
        return scan_lists_pallas(
            index.codes_t, index.ids, index.list_start, index.list_len,
            luts, list_ids,
            scan_len=scan_len, tile=tile, k=k,
            use_approx=use_approx, recall_target=recall_target,
            interpret=interpret,
        )
    return scan_lists_xla(
        index.codes_t, index.ids, index.list_start, index.list_len,
        luts, list_ids,
        scan_len=scan_len, probe_chunk=probe_chunk, k=k,
        use_approx=use_approx, recall_target=recall_target,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "nprobe", "k", "scan_len", "windows", "seg", "group", "probe_chunk",
        "by_residual", "use_approx", "recall_target", "backend", "tile",
        "interpret", "coarse_approx", "coarse_cand", "lut_bf16", "select_l1",
        "lane_l1", "slot_major",
    ),
)
def ivfpq_search(
    index: DeviceIVF,
    queries: jax.Array,          # (b, d) float32
    *,
    nprobe: int,
    k: int,
    scan_len: int = 0,
    windows: int = 0,
    seg: int = 1024,
    group: int = 1,
    probe_chunk: int = 8,
    by_residual: bool = True,
    use_approx: bool = True,
    recall_target: float = 0.99,
    backend: str = "seg",
    tile: int = 0,
    interpret: bool = False,
    coarse_approx: bool = False,
    coarse_cand: int = 0,
    lut_bf16: bool = False,
    select_l1: int = 0,
    lane_l1: bool = False,
    slot_major: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Full IVF-PQ search. Returns ``(dists (b, k) f32, ids (b, k) int32)``.

    ``lut_bf16``: pack ADC LUTs as bf16 pairs (seg backends) — halves the
    inner loop's lane-gathers; entry rounding ≪ PQ error.
    ``select_l1``: >k enables the hierarchical (oversized-L1) selection
    (``ops/topk.py::select_topk``) on the seg backends.
    ``lane_l1``: in-kernel per-(window, lane) min reduction (seg backend,
    ``group>1`` only) — see ``scan_lists_seg_multi``.
    ``coarse_cand``: >0 selects probes with the two-stage coarse scan
    (approx shortlist of this width over exact scores + exact re-sort,
    ``ops/coarse.py::coarse_scan_2stage``) — the large-nlist fast path;
    takes precedence over ``coarse_approx``."""
    from chamjax.ops.scan_pallas import GROUP
    if backend == "seg" and windows <= 0:
        windows = 2 * nprobe       # conservative default; searcher sizes it
    if backend == "pallas" and scan_len % GROUP:
        warnings.warn(
            f"backend='pallas' needs scan_len % {GROUP} == 0 (kernel output "
            f"slabs cover GROUP rows); got scan_len={scan_len} — falling "
            "back to the XLA scan", stacklevel=2)
        backend = "xla"
    q = queries
    if index.opq_R is not None:
        q = jnp.dot(q, index.opq_R, precision=jax.lax.Precision.HIGHEST)
    # coarse_cand > 0 → two-stage probe selection (approx shortlist +
    # exact re-sort), taking precedence over coarse_approx — ops/coarse.py
    list_ids, _ = select_probes(q, index.centroids, nprobe,
                                coarse_cand=coarse_cand,
                                use_approx=coarse_approx)
    luts = build_luts(q, index.centroids, index.codebooks, list_ids,
                      by_residual=by_residual)
    return _dispatch_scan(
        index, luts, list_ids, k=k, scan_len=scan_len, windows=windows,
        seg=seg, group=group, probe_chunk=probe_chunk, use_approx=use_approx,
        recall_target=recall_target, backend=backend, tile=tile,
        interpret=interpret, lut_bf16=lut_bf16 and backend == "seg",
        select_l1=select_l1, lane_l1=lane_l1 and group > 1,
        slot_major=slot_major)


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "scan_len", "windows", "seg", "group",
                     "by_residual", "use_approx", "recall_target", "backend",
                     "tile", "interpret", "lut_bf16", "select_l1",
                     "lane_l1"),
)
def ivfpq_search_preassigned(
    index: DeviceIVF,
    queries: jax.Array,
    list_ids: jax.Array,         # (b, nprobe) int32 — external coarse scan
    *,
    k: int,
    nprobe: int,
    scan_len: int = 4096,
    windows: int = 0,
    seg: int = 1024,
    group: int = 1,
    by_residual: bool = True,
    use_approx: bool = True,
    recall_target: float = 0.99,
    backend: str = "seg",
    tile: int = 0,
    interpret: bool = False,
    lut_bf16: bool = False,
    select_l1: int = 0,
    lane_l1: bool = False,
):
    """Search with externally supplied IVF cells — the disaggregated-path
    contract (reference ``retrieve_with_lists`` /
    ``faiss.contrib.ivf_tools.search_preassigned``)."""
    from chamjax.ops.scan_pallas import GROUP
    if backend == "seg" and windows <= 0:
        windows = 2 * nprobe
    if backend == "pallas" and scan_len % GROUP:
        warnings.warn(
            f"backend='pallas' needs scan_len % {GROUP} == 0 (kernel output "
            f"slabs cover GROUP rows); got scan_len={scan_len} — falling "
            "back to the XLA scan", stacklevel=2)
        backend = "xla"
    q = queries
    if index.opq_R is not None:
        q = jnp.dot(q, index.opq_R, precision=jax.lax.Precision.HIGHEST)
    luts = build_luts(q, index.centroids, index.codebooks, list_ids,
                      by_residual=by_residual)
    return _dispatch_scan(
        index, luts, list_ids, k=k, scan_len=scan_len, windows=windows,
        seg=seg, group=group, probe_chunk=min(8, nprobe),
        use_approx=use_approx, recall_target=recall_target, backend=backend,
        tile=tile, interpret=interpret,
        lut_bf16=lut_bf16 and backend == "seg", select_l1=select_l1,
        lane_l1=lane_l1 and group > 1)


def resolve_coarse_cand(cfg_cand: int, nlist: int, nprobe: int) -> int:
    """Resolve ``SearchConfig.coarse_cand`` to a concrete shortlist width.

    -1 (auto) enables the two-stage coarse scan only at large nlist and
    nprobe ≥ 8 — the regimes where the full-sort top_k dominates the
    coarse stage and a shortlist miss is absorbed by multi-probe.  An
    explicit width is floored at nprobe (a narrower shortlist cannot
    yield nprobe probes — without the floor, a runtime nprobe override
    above a configured width crashed the kernel-side assert) and capped
    at nlist."""
    if cfg_cand < 0:
        cfg_cand = (max(4 * nprobe, 64)
                    if nlist >= 32768 and nprobe >= 8 else 0)
    if cfg_cand <= 0:
        return 0
    return min(max(cfg_cand, nprobe), nlist)


def auto_seg(list_len: np.ndarray) -> int:
    """Segment size minimizing the modeled scan time.

    A window costs ``F + seg/R`` on device regardless of fill — every slot
    is scanned; ``kernel_variants.py`` measures the fixed cost at
    ``F·R = WINDOW_FIXED_ROWS ≈ 2k`` row-equivalents per window.  Probed
    lists are length-biased (the ``auto_windows`` argument), so pick the
    power-of-two seg minimizing the length-weighted expected cost
    ``Σ wᵢ·ceil(lenᵢ/seg)·(F_ROWS + seg)``: long lists amortize the fixed
    cost into fewer, bigger windows; short lists avoid padding slots."""
    from chamjax.ops.scan_seg import MAX_SEG, WINDOW_FIXED_ROWS
    lens = np.asarray(list_len, np.float64)
    total = lens.sum()
    if total <= 0:
        return 256
    w = lens / total
    best, best_cost = 256, np.inf
    seg = 256
    while seg <= MAX_SEG:
        cost = float((w * np.ceil(lens / seg)).sum()
                     * (WINDOW_FIXED_ROWS + seg))
        if cost < best_cost:
            best, best_cost = seg, cost
        seg *= 2
    return best


def auto_windows(list_len: np.ndarray, seg: int, nprobe: int,
                 headroom: float = 1.2, slack: int = 4,
                 z: float = 0.0) -> int:
    """Static per-query window budget for the segmented backend.

    Probed lists are length-biased (a query lands in heavy cells more
    often), so per-probe segments is the *length-weighted* distribution of
    ceil(len/seg) — the same argument the reference's iteration table
    realizes per cell (``DRAM_utils.hpp:45-102``).  ``headroom``/``slack``
    pad the mean; ``z`` > 0 additionally covers the per-query tail with a
    normal approximation of S = Σ_probes ceil(L/seg)
    (``W = nprobe·μ_lb + z·σ_lb·√nprobe``; 2.33 ≈ 99th percentile).
    z defaults OFF: `eval/diagnose.py` window-loss was measured ≈ 0 at
    the mean budget on both the 100M and 1B skewed builds, while z=2.33
    cost 13% QPS at 100M/nprobe=8 (W 21 → 25) — use it only when a
    diagnose run actually shows window loss.
    """
    lens = np.asarray(list_len, np.float64)
    segs = np.ceil(lens / seg)
    total = lens.sum()
    if not total:
        return slack
    w_mean = float((lens * segs).sum() / total)
    w_var = max(0.0, float((lens * segs * segs).sum() / total) - w_mean ** 2)
    # max(mean-headroom, mean + z·σ·√nprobe); the z-term is opt-in tail
    # coverage (see docstring) and a no-op at the z=0 default.
    w = int(np.ceil(max(
        nprobe * w_mean * headroom,
        nprobe * w_mean + z * np.sqrt(w_var * nprobe)))) + slack
    # nprobe·max(segs) covers the WORST query exactly — on balanced builds
    # (every list one segment) this collapses the budget to nprobe itself:
    # headroom windows there are pure fixed-cost waste (a window costs
    # F ≈ 2k row-equivalents regardless of fill, scan_seg.py), measured
    # 25% of the 1M-flagship scan stage.
    w_upper = int(nprobe * segs.max()) if segs.size else w
    return min(w, w_upper, int(segs.sum()))


class IVFSearcher:
    """Convenience host-facing wrapper: holds the device index + static
    search config, exposes numpy-in/numpy-out ``search``."""

    def __init__(self, index: PackedIVF, search_cfg: SearchConfig,
                 scan_quantile: float = 1.0, device=None):
        self.packed = index
        self.cfg = index.cfg
        self.scfg = search_cfg
        self.backend = search_cfg.backend
        self.tile = search_cfg.tile
        if self.backend in ("pallas", "seg") and index.cfg.nbits != 8:
            warnings.warn(
                f"backend='{self.backend}' kernels are specialized for "
                f"8-bit PQ; index has nbits={index.cfg.nbits} — falling "
                "back to the XLA scan", stacklevel=2)
            self.backend = "xla"
        # interpret mode lets the kernel run on CPU (tests / debugging)
        self.interpret = jax.default_backend() != "tpu"
        self.seg = search_cfg.seg or self._auto_seg()
        # seg-tiled twin for the BlockSpec-pipelined scan (scan_seg_block)
        self.dev = DeviceIVF.from_packed(
            index, device=device,
            tile_seg=(self.seg if search_cfg.tiled
                      and self.backend == "seg" else 0))
        # multi-window steps amortize per-step machinery; 8 is the sweet
        # spot measured on v5e (scan_seg_multi.py)
        self.group = search_cfg.seg_group
        self.windows = search_cfg.scan_windows or self._auto_windows(
            search_cfg.nprobe)
        self.scan_len = index.suggest_scan_len(search_cfg.nprobe, scan_quantile)
        # never let a window run past the packed array's tail padding
        max_scan = index.n_pad - int(index.list_start.max())
        self.scan_len = min(self.scan_len, max_scan)
        if self.backend == "pallas":
            # kernel output slabs cover GROUP=1024 rows; round up if the
            # tail padding allows, else down (never below one group)
            from chamjax.ops.scan_pallas import GROUP
            up = -(-self.scan_len // GROUP) * GROUP
            if up <= max_scan:
                self.scan_len = up
            else:
                self.scan_len = max(GROUP, self.scan_len - self.scan_len % GROUP)
            if self.tile == 0:  # DMA chunk: largest power-of-2 slab ≤ 4096
                for c in (4096, 2048, 1024):
                    if self.scan_len % c == 0:
                        self.tile = c
                        break

    def _auto_seg(self) -> int:
        return auto_seg(self.packed.list_len)

    def _auto_windows(self, nprobe: int) -> int:
        return auto_windows(self.packed.list_len, self.seg, nprobe)

    def _coarse_cand(self, nprobe: int) -> int:
        return resolve_coarse_cand(self.scfg.coarse_cand, self.cfg.nlist,
                                   nprobe)

    def search(self, queries: np.ndarray,
               nprobe: Optional[int] = None,
               k: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Returns ``(dists (b,k) f32, ids (b,k) int64)`` — the system-wide
        ``(queries) → (ids, dists)`` contract of SURVEY.md §0."""
        q = jnp.asarray(queries, jnp.float32)
        np_ = nprobe or self.scfg.nprobe
        d, i = ivfpq_search(
            self.dev, q,
            nprobe=np_,
            k=k or self.scfg.k,
            scan_len=self.scan_len,
            windows=(self.windows if np_ == self.scfg.nprobe
                     else self._auto_windows(np_)),
            seg=self.seg, group=self.group,
            probe_chunk=self.scfg.probe_chunk,
            by_residual=self.cfg.by_residual,
            use_approx=self.scfg.use_approx_topk,
            recall_target=self.scfg.approx_recall_target,
            backend=self.backend, tile=self.tile, interpret=self.interpret,
            coarse_approx=self.scfg.coarse_approx and not self.interpret,
            coarse_cand=self._coarse_cand(np_),
            lut_bf16=self.scfg.lut_bf16,
            select_l1=self.scfg.select_l1,
            lane_l1=self.scfg.lane_l1,
        )
        return np.asarray(d), np.asarray(i, np.int64)

    def search_preassigned(self, queries: np.ndarray, list_ids: np.ndarray,
                           k: Optional[int] = None):
        q = jnp.asarray(queries, jnp.float32)
        li = jnp.asarray(list_ids, jnp.int32)
        np_ = li.shape[1]
        d, i = ivfpq_search_preassigned(
            self.dev, q, li,
            k=k or self.scfg.k, nprobe=np_,
            scan_len=self.scan_len,
            windows=(self.windows if np_ == self.scfg.nprobe
                     else self._auto_windows(np_)),
            seg=self.seg, group=self.group,
            by_residual=self.cfg.by_residual,
            use_approx=self.scfg.use_approx_topk,
            recall_target=self.scfg.approx_recall_target,
            backend=self.backend, tile=self.tile, interpret=self.interpret,
            lut_bf16=self.scfg.lut_bf16,
            select_l1=self.scfg.select_l1,
            lane_l1=self.scfg.lane_l1,
        )
        return np.asarray(d), np.asarray(i, np.int64)
