"""Mesh-sharded IVF-PQ search: per-shard scan + collective top-k merge.

The TPU-native rebuild of every scale-out mechanism in the reference:
- the FPGA's 4 DRAM banks (codes striped over channels,
  ``extract_Enzian_U250_required_data.py:296-360``),
- multi-FPGA index sharding (``extract_FPGA_required_data_multi_FPGA.py``),
- and the coordinator's round-robin scatter + origin-tracked gather
  (``retriever_coordinator_server.py:236-274``)

— all become one ``shard_map`` over a ``lists`` mesh axis: inverted lists
are assigned round-robin to shards (load balance, like the reference's
round-robin bank split), each shard keeps a full-size ``(nlist,)``
start/len table in which foreign lists have length 0 (so the scan kernel's
early-exit skips them for free), every shard scans its share of the probed
lists, takes a local top-k, and a single ``all_gather`` over ICI + exact
merge produces the global top-k.  Queries and centroids are replicated;
only the big code/id arrays are sharded.

Coarse probe selection + LUT construction run ONCE, outside ``shard_map``
(the coordinator computes nothing per engine — engines receive the query
exactly once, ``retriever_coordinator_server.py:236-246``): in the 2-D
layout GSPMD shards that matmul over the batch axis, so no device ever
computes coarse scores for queries it does not own; in the 1-D layout the
inputs are replicated and XLA keeps it one logical computation.

``codes_tiled`` (``shard_index(tile_seg=...)`` or
``build_ivfpq_device_sharded(tile_seg=...)``) stores each shard seg-TILED
as ``(n_tiles, m, seg)`` with every list on a tile boundary — the layout
of the production BlockSpec-pipelined kernel (``ops/scan_seg_block.py``),
so the mesh tier runs the same kernel as the single-chip resident tier
(the reference's one-kernel-everywhere discipline: the same vadd kernel
backs single- and multi-FPGA deployments).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chamjax.index.ivf import PackedIVF
from chamjax.ops.lut import build_luts
from chamjax.ops.coarse import select_probes
from chamjax.ops.scan_xla import scan_lists_xla
from chamjax.ops.scan_pallas import scan_lists_pallas
from chamjax.ops.scan_seg_block import scan_lists_seg_block
from chamjax.ops.scan_seg_multi import scan_lists_seg_multi


class ShardedIVF(NamedTuple):
    """Per-shard index arrays, stacked on a leading shard axis.

    Exactly one of ``codes_t`` (flat CSR, manual-DMA kernels) /
    ``codes_tiled`` (seg-tiled, BlockSpec-pipelined kernel) may be None;
    tiled builds drop the flat twin rather than double the sharded HBM
    footprint.  ``list_start`` is in whichever coordinate system the
    resident layout uses (tile-aligned when tiled).
    """

    centroids: jax.Array     # (nlist, d) — replicated
    codebooks: jax.Array     # (m, ksub, dsub) — replicated
    codes_t: Optional[jax.Array]      # (S, m, n_pad_sh) — sharded on axis 0
    ids: jax.Array           # (S, n_pad_sh)
    list_start: jax.Array    # (S, nlist) — full table, 0 for foreign lists
    list_len: jax.Array      # (S, nlist) — 0 for foreign lists
    codes_tiled: Optional[jax.Array] = None   # (S, n_tiles, m, seg)
    opq_R: Optional[jax.Array] = None         # (d, d) — replicated


def shard_index(index: PackedIVF, n_shards: int, tail_pad: int = 8192,
                tile_seg: int = 0) -> ShardedIVF:
    """Split a packed index into ``n_shards`` row-balanced shards.

    Lists are assigned greedily (longest-first) to the currently lightest
    shard — the moral equivalent of the reference's round-robin bank split,
    but balanced by rows rather than list count.

    ``tile_seg`` > 0 packs every list onto ``tile_seg`` boundaries and
    emits the seg-tiled ``codes_tiled`` layout (dropping the flat twin) —
    the production mesh path."""
    from chamjax.ops.scan_seg import MAX_SEG

    nlist = index.cfg.nlist
    pad_unit = tile_seg if tile_seg else index.cfg.list_pad
    tail = max(tail_pad, MAX_SEG)
    order = np.argsort(-index.list_len, kind="stable")
    loads = np.zeros(n_shards, np.int64)
    owner = np.zeros(nlist, np.int32)
    for l in order:
        s = int(np.argmin(loads))
        owner[l] = s
        # max(ln, 1): the pack loop below advances one pad_unit slot even
        # for an empty list — counting them as 0 here both under-sizes
        # n_pad_sh (overrun crash when one shard collects many empties)
        # and piles every empty list onto a single shard (argmin never
        # moves on +0)
        loads[s] += int(-(-max(int(index.list_len[l]), 1)
                          // pad_unit) * pad_unit)
    n_pad_sh = int(loads.max()) + tail
    if tile_seg:
        n_pad_sh = -(-n_pad_sh // tile_seg) * tile_seg
    # int32 id space is PER SHARD here (each shard carries local row ids);
    # the global id is reconstructed from shard-local ids at merge.  A
    # single shard past ~2.1B padded rows would wrap silently — assert
    # (the streamed tier is int64-native for that regime).
    assert n_pad_sh < 2 ** 31, (
        f"shard of {n_pad_sh} padded rows overflows the int32 id space; "
        "raise n_shards or use the streamed tier (int64-native)")

    m = index.codes.shape[1]
    codes_t = np.zeros((n_shards, m, n_pad_sh), np.uint8)
    ids = np.full((n_shards, n_pad_sh), -1, np.int32)
    list_start = np.zeros((n_shards, nlist), np.int32)
    list_len = np.zeros((n_shards, nlist), np.int32)
    cursor = np.zeros(n_shards, np.int64)
    for l in range(nlist):
        s = int(owner[l])
        src, ln = int(index.list_start[l]), int(index.list_len[l])
        padded = int(-(-max(ln, 1) // pad_unit) * pad_unit)
        dst = int(cursor[s])
        codes_t[s, :, dst:dst + ln] = index.codes[src:src + ln].T
        ids[s, dst:dst + ln] = index.ids[src:src + ln]
        list_start[s, l] = dst
        list_len[s, l] = ln
        cursor[s] += padded
    codes_tiled = None
    if tile_seg:
        codes_tiled = np.ascontiguousarray(
            codes_t.reshape(n_shards, m, n_pad_sh // tile_seg, tile_seg)
            .transpose(0, 2, 1, 3))
        codes_t = None
    return ShardedIVF(
        centroids=jnp.asarray(index.centroids),
        codebooks=jnp.asarray(index.codebooks),
        codes_t=jnp.asarray(codes_t) if codes_t is not None else None,
        ids=jnp.asarray(ids),
        list_start=jnp.asarray(list_start),
        list_len=jnp.asarray(list_len),
        codes_tiled=(jnp.asarray(codes_tiled)
                     if codes_tiled is not None else None),
        opq_R=(jnp.asarray(index.opq_R)
               if index.opq_R is not None else None),
    )


def _shard_window_budget(windows: int, windows_shard: int, nprobe: int,
                         group: int) -> int:
    """Static per-shard window budget.

    Default (``windows_shard=0``) is the FULL global budget: foreign lists
    are len-0 ⇒ zero segments (``expand_windows``), so a shard's window
    demand for any query is a subset of the global demand — the global
    budget can never truncate more locally than it would globally.  A
    divided budget (global/n_shards style) silently drops windows for
    queries whose probes concentrate on one shard (shard assignment is by
    list size, uncorrelated with query locality).  Pass ``windows_shard``
    explicitly to trade that risk for per-shard fixed-cost savings when
    the build is balanced (every list one segment ⇒ demand ≤ nprobe)."""
    if windows_shard:
        return max(group, windows_shard)
    return max(group, windows, nprobe)


def place_sharded(sh: ShardedIVF, mesh: Mesh, axis: str = "lists"
                  ) -> ShardedIVF:
    """Pin the shard axis of the big arrays to the mesh; replicate the rest."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return ShardedIVF(
        centroids=put(sh.centroids, P()),
        codebooks=put(sh.codebooks, P()),
        codes_t=(put(sh.codes_t, P(axis))
                 if sh.codes_t is not None else None),
        ids=put(sh.ids, P(axis)),
        list_start=put(sh.list_start, P(axis)),
        list_len=put(sh.list_len, P(axis)),
        codes_tiled=(put(sh.codes_tiled, P(axis))
                     if sh.codes_tiled is not None else None),
        opq_R=(put(sh.opq_R, P()) if sh.opq_R is not None else None),
    )


def _search_impl(
    sh: ShardedIVF,
    queries: jax.Array,
    *,
    mesh: Mesh,
    axis: str,
    batch_axis: Optional[str],
    nprobe: int,
    k: int,
    scan_len: int,
    windows: int,
    windows_shard: int,
    seg: int,
    group: int,
    by_residual: bool,
    use_approx: bool,
    backend: str,
    interpret: bool,
    lut_bf16: bool,
    select_l1: int,
    lane_l1: bool,
    coarse_cand: int,
) -> Tuple[jax.Array, jax.Array]:
    tiled = sh.codes_tiled is not None and backend == "seg"
    if backend != "seg" and sh.codes_t is None:
        raise ValueError(
            f"backend={backend!r} needs the flat codes_t layout, but this "
            "ShardedIVF is tiled-only (built with tile_seg>0)")
    bspec = P(batch_axis) if batch_axis else P()

    # --- coarse scan + LUTs: ONCE, outside shard_map ----------------------
    # 2-D layout: queries arrive sharded over batch_axis; the constraints
    # keep the HIGHEST coarse matmul and the LUT einsum sharded over it
    # (each device computes only its own queries' probes — no per-shard
    # replicated redo).  1-D layout: replicated compute, one logical op.
    q = jax.lax.with_sharding_constraint(queries, NamedSharding(mesh, bspec))
    if sh.opq_R is not None:
        # OPQ rotation (centroids/codebooks live in rotated space); the
        # ground truth / caller space stays unrotated — ivfpq_search parity
        q = jnp.dot(q, sh.opq_R, precision=jax.lax.Precision.HIGHEST)
    list_ids, _ = select_probes(q, sh.centroids, nprobe,
                                coarse_cand=coarse_cand)
    luts = build_luts(q, sh.centroids, sh.codebooks, list_ids,
                      by_residual=by_residual)
    list_ids = jax.lax.with_sharding_constraint(
        list_ids, NamedSharding(mesh, bspec))
    luts = jax.lax.with_sharding_constraint(luts, NamedSharding(mesh, bspec))

    big = sh.codes_tiled if tiled else sh.codes_t

    def shard_fn(big, ids, list_start, list_len, luts, list_ids):
        # leading shard axis of size 1 inside shard_map → drop it
        big_l = big[0]
        ids_l = ids[0]
        list_start_l = list_start[0]
        list_len_l = list_len[0]
        if tiled:
            w_sh = _shard_window_budget(windows, windows_shard, nprobe,
                                        group)
            local_d, local_i = scan_lists_seg_block(
                big_l, ids_l, list_start_l, list_len_l, luts, list_ids,
                windows=w_sh, seg=seg, group=max(group, 1), k=k,
                use_approx=use_approx, interpret=interpret,
                lut_bf16=lut_bf16, select_l1=select_l1, lane_l1=lane_l1)
        elif backend == "seg":
            w_sh = _shard_window_budget(windows, windows_shard, nprobe,
                                        group)
            local_d, local_i = scan_lists_seg_multi(
                big_l, ids_l, list_start_l, list_len_l, luts, list_ids,
                windows=w_sh, seg=seg, group=group, k=k,
                use_approx=use_approx, interpret=interpret,
                lut_bf16=lut_bf16, select_l1=select_l1, lane_l1=lane_l1)
        elif backend == "pallas":
            local_d, local_i = scan_lists_pallas(
                big_l, ids_l, list_start_l, list_len_l, luts, list_ids,
                scan_len=scan_len, k=k, use_approx=use_approx,
                interpret=interpret)
        else:
            local_d, local_i = scan_lists_xla(
                big_l, ids_l, list_start_l, list_len_l, luts, list_ids,
                scan_len=scan_len, probe_chunk=8, k=k,
                use_approx=use_approx)
        # merge across shards: gather all candidates, exact top-k (the L2
        # queue).  In the 2-D layout queries never move — ICI traffic per
        # chip is b/D_data · k · D_lists candidate rows.
        all_d = jax.lax.all_gather(local_d, axis)     # (S, b_local, k)
        all_i = jax.lax.all_gather(local_i, axis)
        S = all_d.shape[0]
        b = all_d.shape[1]
        flat_d = jnp.moveaxis(all_d, 0, 1).reshape(b, S * k)
        flat_i = jnp.moveaxis(all_i, 0, 1).reshape(b, S * k)
        neg, pos = jax.lax.top_k(-flat_d, k)
        return -neg, jnp.take_along_axis(flat_i, pos, axis=1)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), bspec, bspec),
        out_specs=(bspec, bspec),
        check_vma=False,
    )
    return fn(big, sh.ids, sh.list_start, sh.list_len, luts, list_ids)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "nprobe", "k", "scan_len", "windows",
                     "windows_shard", "seg", "group", "by_residual",
                     "use_approx", "backend", "interpret", "lut_bf16",
                     "select_l1", "lane_l1", "coarse_cand"),
)
def sharded_search(
    sh: ShardedIVF,
    queries: jax.Array,          # (b, d) — replicated
    *,
    mesh: Mesh,
    axis: str = "lists",
    nprobe: int,
    k: int,
    scan_len: int = 0,
    windows: int = 0,
    windows_shard: int = 0,
    seg: int = 512,
    group: int = 8,
    by_residual: bool = True,
    use_approx: bool = True,
    backend: str = "pallas",
    interpret: bool = False,
    lut_bf16: bool = False,
    select_l1: int = 0,
    lane_l1: bool = False,
    coarse_cand: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Full sharded search. Returns replicated ``(dists (b,k), ids (b,k))``.

    Coarse scan + LUTs are computed once outside ``shard_map`` (replicated
    compute on the 1-D mesh); the scan runs on shard-local lists only; the
    merge is one ``all_gather`` over ICI + an exact top-k (the L2 queue).
    A tiled ``ShardedIVF`` (``codes_tiled``) dispatches the seg backend to
    the BlockSpec-pipelined production kernel."""
    return _search_impl(
        sh, queries, mesh=mesh, axis=axis, batch_axis=None, nprobe=nprobe,
        k=k, scan_len=scan_len, windows=windows,
        windows_shard=windows_shard, seg=seg, group=group,
        by_residual=by_residual, use_approx=use_approx, backend=backend,
        interpret=interpret, lut_bf16=lut_bf16, select_l1=select_l1,
        lane_l1=lane_l1, coarse_cand=coarse_cand)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "batch_axis", "nprobe", "k", "scan_len",
                     "windows", "windows_shard", "seg", "group",
                     "by_residual", "use_approx", "backend", "interpret",
                     "lut_bf16", "select_l1", "lane_l1", "coarse_cand"),
)
def sharded_search_2d(
    sh: ShardedIVF,
    queries: jax.Array,          # (b, d) — sharded over batch_axis
    *,
    mesh: Mesh,
    axis: str = "lists",
    batch_axis: str = "data",
    nprobe: int,
    k: int,
    scan_len: int = 0,
    windows: int = 0,
    windows_shard: int = 0,
    seg: int = 512,
    group: int = 8,
    by_residual: bool = True,
    use_approx: bool = True,
    backend: str = "seg",
    interpret: bool = False,
    lut_bf16: bool = False,
    select_l1: int = 0,
    lane_l1: bool = False,
    coarse_cand: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """2-D mesh search: queries split over ``batch_axis`` (data parallel),
    inverted lists split over ``axis`` — the multi-chip serving layout.

    Coarse + LUTs are computed once under GSPMD, sharded over
    ``batch_axis`` (each device does b/D_data of the HIGHEST matmul, not a
    full-batch replicated copy per list shard).  Each (data, lists) device
    then scans its list shard for its query shard; the top-k merge
    all-gathers only along ``axis`` (queries never move).  Returns
    ``(dists, ids)`` sharded over ``batch_axis``."""
    return _search_impl(
        sh, queries, mesh=mesh, axis=axis, batch_axis=batch_axis,
        nprobe=nprobe, k=k, scan_len=scan_len, windows=windows,
        windows_shard=windows_shard, seg=seg, group=group,
        by_residual=by_residual, use_approx=use_approx, backend=backend,
        interpret=interpret, lut_bf16=lut_bf16, select_l1=select_l1,
        lane_l1=lane_l1, coarse_cand=coarse_cand)
