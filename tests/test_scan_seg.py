"""Segmented-scan tests: window expansion vs a numpy oracle, full seg search
vs brute-force ADC (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from chamjax.config import IndexConfig, SearchConfig
from chamjax.data import synthetic_dataset
from chamjax.index import build_ivfpq
from chamjax.ops.scan_seg import SEG, expand_windows
from chamjax.searcher import DeviceIVF, IVFSearcher, ivfpq_search


def test_expand_windows_oracle():
    rng = np.random.default_rng(0)
    nlist = 16
    list_len = rng.integers(0, 3 * SEG, nlist).astype(np.int32)
    list_len[3] = 0                      # empty cell
    list_start = np.zeros(nlist, np.int32)
    pos = 0
    for i in range(nlist):
        list_start[i] = pos
        pos += int(np.ceil(max(list_len[i], 1) / 128) * 128)
    b, nprobe, W = 3, 5, 12
    list_ids = np.stack([rng.permutation(nlist)[:nprobe] for _ in range(b)])

    starts, lens, probe, valid = map(np.asarray, expand_windows(
        jnp.asarray(list_ids, jnp.int32), jnp.asarray(list_start),
        jnp.asarray(list_len), windows=W))

    for r in range(b):
        # oracle: probe-major enumeration of SEG-row segments
        exp = []
        for p, lid in enumerate(list_ids[r]):
            ln = int(list_len[lid])
            for s in range(int(np.ceil(ln / SEG))):
                exp.append((list_start[lid] + s * SEG,
                            min(SEG, ln - s * SEG), p))
        exp = exp[:W]
        got = [(starts[r, w], lens[r, w], probe[r, w])
               for w in range(W) if valid[r, w]]
        assert got == [tuple(map(int, e)) for e in exp]
        # padding windows are len-0
        for w in range(len(exp), W):
            assert lens[r, w] == 0


@pytest.fixture(scope="module")
def small_index():
    ds = synthetic_dataset(nb=20_000, nq=32, nt=5000, d=32, seed=3,
                           n_clusters=64)
    idx = build_ivfpq(ds.xb, IndexConfig(dim=32, nlist=32, m=8, list_pad=128),
                      xt=ds.xt, kmeans_iters=4, pq_iters=4)
    return ds, idx


def _adc_oracle(idx, q, list_ids, k):
    """Exact ADC over the probed lists in numpy."""
    from chamjax.ops.lut import build_luts
    luts = np.asarray(build_luts(
        jnp.asarray(q), jnp.asarray(idx.centroids),
        jnp.asarray(idx.codebooks), jnp.asarray(list_ids),
        by_residual=True))
    out_i = []
    for r in range(q.shape[0]):
        cand_d, cand_i = [], []
        for p, lid in enumerate(list_ids[r]):
            s, ln = int(idx.list_start[lid]), int(idx.list_len[lid])
            c = idx.codes[s:s + ln]
            lut = luts[r, p]
            d = lut[c, np.arange(c.shape[1])[None, :]].sum(1)
            cand_d.append(d)
            cand_i.append(idx.ids[s:s + ln])
        cand_d = np.concatenate(cand_d)
        cand_i = np.concatenate(cand_i)
        out_i.append(cand_i[np.argsort(cand_d, kind="stable")[:k]])
    return np.stack(out_i)


def test_seg_search_matches_adc_oracle(small_index):
    ds, idx = small_index
    dev = DeviceIVF.from_packed(idx)
    nprobe, k = 8, 10
    from chamjax.ops.coarse import coarse_scan
    list_ids = np.asarray(coarse_scan(
        jnp.asarray(ds.xq), dev.centroids, nprobe)[0])
    oracle = _adc_oracle(idx, ds.xq, list_ids, k)
    d, i = ivfpq_search(dev, jnp.asarray(ds.xq), nprobe=nprobe, k=k,
                        windows=64, use_approx=False, backend="seg",
                        interpret=True)
    i = np.asarray(i)
    overlap = np.mean([len(set(i[r]) & set(oracle[r])) / k
                       for r in range(i.shape[0])])
    assert overlap > 0.99, f"seg scan disagrees with ADC oracle: {overlap}"
    assert np.all(np.diff(np.asarray(d), axis=1) >= 0)


def test_searcher_seg_backend_recall(small_index):
    ds, idx = small_index
    from chamjax.data.ground_truth import compute_ground_truth
    from chamjax.eval import recall_at_k
    gt, _ = compute_ground_truth(ds.xb, ds.xq, k=10)
    s = IVFSearcher(idx, SearchConfig(nprobe=16, k=10, backend="seg"))
    assert s.backend == "seg" and s.windows >= 16
    d, i = s.search(ds.xq)
    assert recall_at_k(i, gt, 10) > 0.7


@pytest.fixture(scope="module")
def seg_setup(small_index):
    from chamjax.ops.coarse import coarse_scan
    from chamjax.ops.lut import build_luts
    ds, idx = small_index
    dev = DeviceIVF.from_packed(idx)
    q = jnp.asarray(ds.xq[:8], jnp.float32)
    list_ids, _ = coarse_scan(q, dev.centroids, 8)
    luts = build_luts(q, dev.centroids, dev.codebooks, list_ids)
    return dev, luts, list_ids, 10


def test_lut_bf16_pack_roundtrip(rng):
    """Packed bf16 pairs must decode to exactly the bf16-rounded entries."""
    import jax
    import jax.numpy as jnp
    from chamjax.ops.scan_seg import pack_luts_bf16
    luts = rng.standard_normal((3, 4, 256)).astype(np.float32)
    packed = np.asarray(pack_luts_bf16(jnp.asarray(luts)))
    # decode on host
    lo = (packed & 0xFFFF).astype(np.uint32) << 16
    hi = (packed.astype(np.uint32) >> 16) << 16
    dec = np.empty_like(luts)
    dec[..., 0::2] = lo.view(np.float32)
    dec[..., 1::2] = hi.view(np.float32)
    expect = luts.astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(dec, expect)


@pytest.mark.parametrize("group", [1, 4])
def test_scan_lut_bf16_matches_f32_within_rounding(seg_setup, group):
    """lut_bf16 scan must equal the f32 scan up to bf16 entry rounding:
    identical candidate sets, distances within ~1% relative."""
    import jax.numpy as jnp
    from chamjax.ops.scan_seg import scan_lists_seg
    from chamjax.ops.scan_seg_multi import scan_lists_seg_multi
    dev, luts, list_ids, k = seg_setup
    kw = dict(windows=24, seg=256, k=k, use_approx=False, interpret=True)
    if group > 1:
        f = lambda **o: scan_lists_seg_multi(
            dev.codes_t, dev.ids, dev.list_start, dev.list_len,
            luts, list_ids, group=group, **kw, **o)
    else:
        f = lambda **o: scan_lists_seg(
            dev.codes_t, dev.ids, dev.list_start, dev.list_len,
            luts, list_ids, **kw, **o)
    d32, i32 = f()
    dbf, ibf = f(lut_bf16=True)
    d32, i32, dbf, ibf = map(np.asarray, (d32, i32, dbf, ibf))
    finite = np.isfinite(d32) & np.isfinite(dbf)
    np.testing.assert_allclose(dbf[finite], d32[finite], rtol=2e-2,
                               atol=2e-2)
    # ranking: ≥90% of top-k ids agree (bf16 rounding may swap near-ties)
    agree = np.mean([np.isin(ibf[q], i32[q]).mean()
                     for q in range(i32.shape[0])])
    assert agree >= 0.9, agree


def test_auto_seg_cost_model():
    """auto_seg trades the measured fixed window cost against padding:
    tiny lists pick the smallest seg, window-filling lists pick their own
    size, long lists amortize into MAX_SEG windows."""
    import numpy as np
    from chamjax.ops.scan_seg import MAX_SEG
    from chamjax.searcher import auto_seg
    assert auto_seg(np.full(1024, 100)) == 256          # 1M/4096-like
    assert auto_seg(np.full(64, 1536)) == 2048          # 100M/65536-like
    assert auto_seg(np.full(64, 16384)) == MAX_SEG      # 1B host-streamed
    # a 2500-row list: two 2048-windows (4096 slots + 2 fixed costs) lose
    # to one 4096-window (4096 slots + 1 fixed cost)
    assert auto_seg(np.full(64, 2500)) == 4096
    assert auto_seg(np.zeros(8)) == 256                 # degenerate

def test_search_cfg_seg_override(small_index):
    import numpy as np
    from chamjax.config import SearchConfig
    from chamjax.searcher import IVFSearcher
    ds, idx = small_index
    # exact selection: approx_min_k survivors are window-layout-sensitive
    a = IVFSearcher(idx, SearchConfig(nprobe=8, k=5, use_approx_topk=False))
    b = IVFSearcher(idx, SearchConfig(nprobe=8, k=5, seg=512,
                                      use_approx_topk=False))
    assert b.seg == 512
    da, ia = a.search(ds.xq[:4])
    db, ib = b.search(ds.xq[:4])
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(da, db, atol=1e-4)


def test_lane_l1_kernel_matches_full_reduction(small_index):
    """lane_l1=True output == per-(window, lane) min of the full kernel's
    distances, with tile indices pointing at the achieving rows."""
    import jax
    from chamjax.ops.lut import build_luts
    from chamjax.ops.coarse import coarse_scan
    from chamjax.ops.scan_seg import expand_windows
    from chamjax.ops.scan_seg_multi import adc_scan_segments_multi
    ds, idx = small_index
    from chamjax.searcher import DeviceIVF
    dev = DeviceIVF.from_packed(idx)
    b, nprobe, seg, W, group = 8, 8, 256, 16, 4
    q = jnp.asarray(ds.xq[:b])
    li, _ = coarse_scan(q, dev.centroids, nprobe)
    luts = build_luts(q, dev.centroids, dev.codebooks, li, by_residual=True)
    starts, lens, probe, _ = expand_windows(
        li, dev.list_start, dev.list_len, windows=W, seg=seg)
    lut_idx = (jnp.arange(b, dtype=jnp.int32)[:, None] * nprobe
               + probe).reshape(-1)
    luts_k = luts.transpose(0, 1, 3, 2).reshape(b * nprobe, idx.cfg.m, 256)
    full = adc_scan_segments_multi(
        dev.codes_t, starts.reshape(-1), lens.reshape(-1), lut_idx, luts_k,
        seg=seg, group=group, interpret=True)           # (bW, seg)
    red = adc_scan_segments_multi(
        dev.codes_t, starts.reshape(-1), lens.reshape(-1), lut_idx, luts_k,
        seg=seg, group=group, interpret=True, lane_l1=True)  # (bW, 2, 128)
    tiles = np.asarray(full).reshape(-1, seg // 128, 128)
    want = tiles.min(axis=1)
    got = np.asarray(red[:, 0, :])
    np.testing.assert_allclose(got, want, atol=1e-5)
    # winning tile index achieves the min wherever it is finite
    t_idx = np.asarray(
        jax.lax.bitcast_convert_type(red[:, 1, :], jnp.int32))
    lanes = np.arange(128)
    achieved = tiles[np.arange(tiles.shape[0])[:, None], t_idx, lanes]
    finite = np.isfinite(want)
    np.testing.assert_allclose(achieved[finite], want[finite], atol=1e-5)


def test_lane_l1_search_end_to_end(small_index):
    """IVFSearcher(lane_l1=True) returns the exact top-k of the
    lane-reduced candidate set, with correctly mapped ids."""
    from chamjax.eval import recall_at_k
    from chamjax.data.ground_truth import compute_ground_truth
    ds, idx = small_index
    k = 5
    base = IVFSearcher(idx, SearchConfig(nprobe=16, k=k,
                                         use_approx_topk=False))
    l1 = IVFSearcher(idx, SearchConfig(nprobe=16, k=k, lane_l1=True,
                                       use_approx_topk=False))
    gt, _ = compute_ground_truth(ds.xb, ds.xq, k=k)
    db, ib = base.search(ds.xq)
    dl, il = l1.search(ds.xq)
    # ids must be real rows and distances self-consistent (sorted)
    assert (il >= -1).all() and (il < ds.xb.shape[0]).all()
    assert (np.diff(dl, axis=1) >= -1e-6).all()
    # collision loss at k=5 over W·128 buckets is ~C(5,2)/buckets < 1e-3:
    # recall must match the exact path to within one hit per query set
    r_base = recall_at_k(ib, gt, k)
    r_l1 = recall_at_k(il, gt, k)
    assert r_l1 >= r_base - 1.0 / (k * len(ds.xq))


def test_lane_l1_loss_model():
    from chamjax.index.sizing import lane_l1_loss
    # k=100, W=69 buckets=8832: ~0.56% of top-100 lost
    loss = lane_l1_loss(100, 69)
    assert 0.004 < loss < 0.007
    assert lane_l1_loss(10, 69) < loss          # fewer pairs, less loss
    assert lane_l1_loss(100, 138) < loss        # more buckets, less loss
    assert lane_l1_loss(100, 0) == 1.0


def test_scan_xla_short_tail_list_no_foreign_rows():
    """dynamic_slice clamps an out-of-range window start BACKWARDS: a
    short list near the packed tail used to have earlier lists' rows
    scored under its own LUT (wrong neighbors, silently).  The clamp
    delta must shift the valid mask instead."""
    import numpy as np
    from chamjax.ops.scan_xla import scan_lists_xla

    rng = np.random.default_rng(0)
    m, ksub = 4, 256
    # list 0: rows [0, 100) — ADC distance ~0 under ANY lut (codes=0 and
    # lut row 0 set to 0 would be degenerate; instead give list-0 rows the
    # code value 1 whose lut entry we make tiny, so a leak would WIN top-k)
    n_pad = 112                         # list1 start=100, len=4, tail=8
    codes_t = np.zeros((m, n_pad), np.uint8)
    codes_t[:, :100] = 1                # foreign rows: lut[1] = 0.0 → best
    codes_t[:, 100:104] = 2             # true rows:    lut[2] = 1.0
    ids = np.arange(n_pad, dtype=np.int32)
    ids[104:] = -1
    list_start = np.asarray([0, 100], np.int32)
    list_len = np.asarray([100, 4], np.int32)
    luts = np.full((1, 1, ksub, m), 9.0, np.float32)
    luts[:, :, 1, :] = 0.0              # foreign code → would dominate
    luts[:, :, 2, :] = 1.0
    list_ids = np.asarray([[1]], np.int32)   # probe ONLY the tail list
    d, i = scan_lists_xla(
        jnp.asarray(codes_t), jnp.asarray(ids), jnp.asarray(list_start),
        jnp.asarray(list_len), jnp.asarray(luts), jnp.asarray(list_ids),
        scan_len=64, probe_chunk=1, k=8, use_approx=False)
    i, d = np.asarray(i), np.asarray(d)
    got = set(i[0][i[0] >= 0].tolist())
    assert got == {100, 101, 102, 103}, got        # no foreign rows
    np.testing.assert_allclose(d[0][:4], 4.0)      # m * lut[2]


# ---------------------------------------------------------------------------
# BlockSpec-pipelined tiled scan (ops/scan_seg_block.py, round 3)
# ---------------------------------------------------------------------------


def test_tiled_searcher_matches_flat_and_xla():
    from chamjax.config import IndexConfig, SearchConfig
    from chamjax.data import synthetic_dataset
    from chamjax.index import build_ivfpq
    from chamjax.searcher import IVFSearcher
    import dataclasses

    ds = synthetic_dataset(nb=12000, nq=16, nt=6000, d=32, seed=7,
                           n_clusters=32)
    idx = build_ivfpq(ds.xb, IndexConfig(dim=32, nlist=32, m=8, list_pad=64),
                      xt=ds.xt, kmeans_iters=4, pq_iters=4)
    # lut_bf16 off: the equality claim is about the fetch path; the packed
    # LUT's ~0.2% entry rounding is gated elsewhere
    base = SearchConfig(nprobe=8, k=10, use_approx_topk=False,
                        coarse_cand=0, lut_bf16=False)
    s_tiled = IVFSearcher(idx, base)                       # tiled default ON
    assert s_tiled.dev.codes_tiled is not None
    assert s_tiled.dev.codes_tiled.shape[1:] == (8, s_tiled.seg)
    s_flat = IVFSearcher(idx, dataclasses.replace(base, tiled=False))
    assert s_flat.dev.codes_tiled is None
    s_xla = IVFSearcher(idx, dataclasses.replace(base, backend="xla"))

    d_t, i_t = s_tiled.search(ds.xq)
    d_f, i_f = s_flat.search(ds.xq)
    d_x, i_x = s_xla.search(ds.xq)
    np.testing.assert_allclose(d_t, d_f, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(d_t, d_x, rtol=1e-4, atol=1e-4)
    for a, b, da, db in ((i_t, i_f, d_t, d_f), (i_t, i_x, d_t, d_x)):
        agree = a == b
        close = np.abs(da - db) < 1e-4     # id ties among equal distances
        assert np.all(agree | close)


def test_tiled_dist_bf16_close_to_f32():
    """dist_bf16 (bf16 candidate buffer through selection) must match the
    f32 path within bf16 rounding — distances 2^-8 relative, top-k ids
    identical except among near-ties.  (Kernel-level A/B measured ±noise
    on device — kept as an opt-in capability, not a default.)"""
    from chamjax.config import IndexConfig, SearchConfig
    from chamjax.data import synthetic_dataset
    from chamjax.index import build_ivfpq
    from chamjax.ops.scan_seg_block import scan_lists_seg_block
    from chamjax.searcher import IVFSearcher

    ds = synthetic_dataset(nb=12000, nq=16, nt=6000, d=32, seed=7,
                           n_clusters=32)
    idx = build_ivfpq(ds.xb, IndexConfig(dim=32, nlist=32, m=8, list_pad=64),
                      xt=ds.xt, kmeans_iters=4, pq_iters=4)
    s = IVFSearcher(idx, SearchConfig(nprobe=8, k=10, use_approx_topk=False,
                                      coarse_cand=0, lut_bf16=False))
    dev = s.dev
    import jax.numpy as jnp
    from chamjax.ops.coarse import select_probes
    from chamjax.ops.lut import build_luts
    q = jnp.asarray(ds.xq, jnp.float32)
    list_ids, _ = select_probes(q, dev.centroids, 8)
    luts = build_luts(q, dev.centroids, dev.codebooks, list_ids)
    kw = dict(windows=s.windows + (-s.windows) % 4, seg=s.seg, group=4,
              k=10, use_approx=False, interpret=True)
    d32, i32 = scan_lists_seg_block(dev.codes_tiled, dev.ids,
                                    dev.list_start, dev.list_len, luts,
                                    list_ids, dist_bf16=False, **kw)
    d16, i16 = scan_lists_seg_block(dev.codes_tiled, dev.ids,
                                    dev.list_start, dev.list_len, luts,
                                    list_ids, dist_bf16=True, **kw)
    assert d16.dtype == np.float32          # upcast at the boundary
    d16h, d32h = np.asarray(d16), np.asarray(d32)
    np.testing.assert_allclose(d16h, d32h, rtol=1e-2, atol=1e-2)
    # bf16 rounding (2^-8 relative) may swap ranks among candidates whose
    # true gap is below ~0.4% of the distance magnitude — allow id
    # disagreements wherever the distances are that close
    agree = np.asarray(i16) == np.asarray(i32)
    close = np.abs(d16h - d32h) < 0.01 * np.abs(d32h) + 0.05
    assert np.mean(agree | close) == 1.0
    assert np.mean(agree) > 0.9


def test_tiled_repack_coordinates():
    """The tiled repack must keep every (list, row) pair intact: flat twin
    and tiled twin carry the same codes at the shared offsets."""
    from chamjax.config import IndexConfig
    from chamjax.data import synthetic_dataset
    from chamjax.index import build_ivfpq
    from chamjax.searcher import DeviceIVF

    ds = synthetic_dataset(nb=3000, nq=4, nt=2000, d=16, seed=9,
                           n_clusters=16)
    idx = build_ivfpq(ds.xb, IndexConfig(dim=16, nlist=16, m=4, list_pad=64),
                      xt=ds.xt, kmeans_iters=3, pq_iters=3)
    seg = 128
    dev = DeviceIVF.from_packed(idx, tile_seg=seg)
    starts = np.asarray(dev.list_start)
    assert np.all(starts % seg == 0)
    codes_t = np.asarray(dev.codes_t)
    tiled = np.asarray(dev.codes_tiled)      # (n_tiles, m, seg)
    ids_dev = np.asarray(dev.ids)
    for li in range(16):
        ln = int(idx.list_len[li])
        so, sn = int(idx.list_start[li]), int(starts[li])
        np.testing.assert_array_equal(
            ids_dev[sn:sn + ln], idx.ids[so:so + ln])
        np.testing.assert_array_equal(
            codes_t[:, sn:sn + ln], idx.codes[so:so + ln].T)
        for r in range(0, ln, 37):
            t, off = (sn + r) // seg, (sn + r) % seg
            np.testing.assert_array_equal(tiled[t, :, off],
                                          idx.codes[so + r])


def test_tiled_lane_l1_recall_close():
    """Block-kernel lane-L1: per-(window,lane) min reduction keeps recall
    within its collision bound on a small corpus."""
    from chamjax.config import IndexConfig, SearchConfig
    from chamjax.data import synthetic_dataset
    from chamjax.data.ground_truth import compute_ground_truth
    from chamjax.eval import recall_at_k
    from chamjax.index import build_ivfpq
    from chamjax.searcher import IVFSearcher
    import dataclasses

    ds = synthetic_dataset(nb=12000, nq=32, nt=6000, d=32, seed=7,
                           n_clusters=32)
    idx = build_ivfpq(ds.xb, IndexConfig(dim=32, nlist=32, m=8, list_pad=64),
                      xt=ds.xt, kmeans_iters=4, pq_iters=4)
    gt, _ = compute_ground_truth(ds.xb, ds.xq, k=10)
    base = SearchConfig(nprobe=8, k=10, use_approx_topk=False,
                        coarse_cand=0, lut_bf16=False)
    s_plain = IVFSearcher(idx, base)
    s_l1 = IVFSearcher(idx, dataclasses.replace(base, lane_l1=True))
    assert s_l1.dev.codes_tiled is not None
    _d, i_p = s_plain.search(ds.xq)
    _d, i_l = s_l1.search(ds.xq)
    r_p = recall_at_k(i_p, gt, 10)
    r_l = recall_at_k(i_l, gt, 10)
    assert r_l >= r_p - 0.05, (r_l, r_p)


def test_retile_device_ivf_matches_flat():
    """Device-side retiling must agree with the host-side tiled repack:
    same search results as the flat index, tiled twin attached."""
    from chamjax.config import IndexConfig, SearchConfig
    from chamjax.data import synthetic_dataset
    from chamjax.index import build_ivfpq
    from chamjax.searcher import (
        DeviceIVF, IVFSearcher, ivfpq_search, retile_device_ivf,
    )
    import dataclasses

    ds = synthetic_dataset(nb=12000, nq=16, nt=6000, d=32, seed=7,
                           n_clusters=32)
    idx = build_ivfpq(ds.xb, IndexConfig(dim=32, nlist=32, m=8, list_pad=64),
                      xt=ds.xt, kmeans_iters=4, pq_iters=4)
    seg = 128
    dev_flat = DeviceIVF.from_packed(idx)
    dev_ret = retile_device_ivf(dev_flat, seg)
    assert dev_ret.codes_tiled is not None
    assert np.all(np.asarray(dev_ret.list_start) % seg == 0)
    kw = dict(nprobe=8, k=10, windows=32, seg=seg, group=8,
              use_approx=False, coarse_cand=0, interpret=True)
    d_f, i_f = ivfpq_search(dev_flat, jnp.asarray(ds.xq), **kw)
    d_r, i_r = ivfpq_search(dev_ret, jnp.asarray(ds.xq), **kw)
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(d_f),
                               rtol=1e-5, atol=1e-5)
    agree = np.asarray(i_r) == np.asarray(i_f)
    close = np.abs(np.asarray(d_r) - np.asarray(d_f)) < 1e-4
    assert np.all(agree | close)
