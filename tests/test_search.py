"""End-to-end IVF-PQ search tests.

Oracles per SURVEY.md §4: (a) exact brute force over *decoded* vectors — the
ADC distance must equal the decode-then-L2 distance to float tolerance;
(b) recall@k against exact ground truth on a clustered corpus must clear the
reference's recall anchors regime (BASELINE.md: R@10 ≥ 0.8 at nprobe=32 on
real data; we assert generously above chance on synthetic data).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from chamjax.config import IndexConfig, SearchConfig
from chamjax.data import synthetic_dataset
from chamjax.data.ground_truth import compute_ground_truth
from chamjax.eval import recall_at_k
from chamjax.index import build_ivfpq
from chamjax.index.pq import pq_decode
from chamjax.ops.coarse import coarse_scan
from chamjax.ops.lut import build_luts
from chamjax.searcher import DeviceIVF, IVFSearcher, ivfpq_search


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(nb=20000, nq=32, nt=8000, d=32, seed=3,
                             n_clusters=64)


@pytest.fixture(scope="module")
def index(ds):
    cfg = IndexConfig(dim=32, nlist=64, m=8, list_pad=64)
    return build_ivfpq(ds.xb, cfg, xt=ds.xt, kmeans_iters=8, pq_iters=8)


def _adc_bruteforce(index, q, nprobe, k):
    """Numpy oracle: per query, decode ADC distance for every vector in the
    probed lists; exact top-k."""
    cent = index.centroids
    d2 = ((q[:, None] - cent[None]) ** 2).sum(-1)
    probes = np.argsort(d2, axis=1)[:, :nprobe]
    m, ksub, dsub = index.codebooks.shape
    out_i = np.full((q.shape[0], k), -1, np.int64)
    out_d = np.full((q.shape[0], k), np.inf, np.float32)
    for qi in range(q.shape[0]):
        cand_ids, cand_d = [], []
        for l in probes[qi]:
            s, ln = index.list_start[l], index.list_len[l]
            ids = index.ids[s:s + ln]
            codes = index.codes[s:s + ln].astype(np.int64)
            r = q[qi] - cent[l]
            rs = r.reshape(m, dsub)
            lut = ((rs[:, None, :] - index.codebooks) ** 2).sum(-1)  # (m,ksub)
            dist = lut[np.arange(m)[None, :], codes].sum(-1)
            cand_ids.append(ids)
            cand_d.append(dist)
        cand_ids = np.concatenate(cand_ids)
        cand_d = np.concatenate(cand_d).astype(np.float32)
        order = np.argsort(cand_d, kind="stable")[:k]
        out_i[qi, :len(order)] = cand_ids[order]
        out_d[qi, :len(order)] = cand_d[order]
    return out_d, out_i


def test_coarse_scan_matches_numpy(ds, index):
    q = jnp.asarray(ds.xq[:8])
    lids, dists = coarse_scan(q, jnp.asarray(index.centroids), 4)
    d2 = ((ds.xq[:8, :, None].transpose(0, 2, 1) - index.centroids[None]) ** 2).sum(-1)
    ref = np.argsort(d2, axis=1)[:, :4]
    np.testing.assert_array_equal(np.asarray(lids), ref)
    # matmul-expansion distances lose precision to cancellation; ranking is
    # what matters (ids asserted exactly above)
    np.testing.assert_allclose(
        np.asarray(dists), np.sort(d2, axis=1)[:, :4], rtol=5e-2, atol=2.0
    )


def test_coarse_scan_2stage_matches_exact(ds, index):
    """On CPU (fp32 DEFAULT matmul + exact approx_max_k) the two-stage scan
    must reproduce the exact scan bit-for-bit: ids equal, distances equal."""
    from chamjax.ops.coarse import coarse_scan_2stage
    q = jnp.asarray(ds.xq[:8])
    cent = jnp.asarray(index.centroids)
    lids, dists = coarse_scan(q, cent, 4)
    lids2, dists2 = coarse_scan_2stage(q, cent, 4, cand=16)
    np.testing.assert_array_equal(np.asarray(lids2), np.asarray(lids))
    np.testing.assert_allclose(np.asarray(dists2), np.asarray(dists),
                               rtol=1e-5, atol=1e-3)


def test_coarse_cand_narrower_than_nprobe_does_not_crash(ds, index):
    """A configured shortlist width below a runtime nprobe override must
    floor at nprobe, not crash the kernel-side assert (review finding)."""
    from chamjax.retrieval.index_scanner import IndexScanner
    from chamjax.searcher import resolve_coarse_cand
    assert resolve_coarse_cand(16, 65536, 32) == 32   # floored
    sc = IndexScanner(index.centroids, nprobe=8, coarse_cand=4)
    lids, _ = sc.search(ds.xq[:4], nprobe=32)
    assert lids.shape == (4, 32)
    # floored width == nprobe still returns the exact probe set on CPU
    exact, _ = coarse_scan(jnp.asarray(ds.xq[:4]),
                           jnp.asarray(index.centroids), 32)
    np.testing.assert_array_equal(lids, np.asarray(exact, np.int64))


def test_searcher_coarse_cand_auto_resolution():
    """-1 (auto) engages only at large nlist and nprobe ≥ 8; explicit and
    off values pass through; width clamps to nlist."""
    from chamjax.searcher import resolve_coarse_cand
    assert resolve_coarse_cand(-1, 4096, 32) == 0       # nlist too small
    assert resolve_coarse_cand(-1, 65536, 4) == 0       # nprobe too small
    assert resolve_coarse_cand(-1, 65536, 32) == 128    # 4·nprobe
    assert resolve_coarse_cand(-1, 65536, 8) == 64      # floor 64
    assert resolve_coarse_cand(0, 65536, 32) == 0       # explicit off
    assert resolve_coarse_cand(300, 65536, 32) == 300   # explicit width
    assert resolve_coarse_cand(300, 256, 32) == 256     # clamp to nlist


def test_coarse_scan_2stage_high_gate_matches_exact():
    """nlist ≥ 131072 switches the score matmul to HIGH precision
    (ops/coarse.py size gate); on CPU both precisions are fp32, so the
    result must still equal the exact scan bit-for-bit — this pins the
    gate's code path, the numerics are pinned on device by
    ``bench.py --matrix`` and the 1B run."""
    from chamjax.ops.coarse import coarse_scan_2stage
    rng = np.random.default_rng(7)
    cent = jnp.asarray(rng.standard_normal((131072, 8)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    lids, dists = coarse_scan(q, cent, 8)
    lids2, dists2 = coarse_scan_2stage(q, cent, 8, cand=32)
    np.testing.assert_array_equal(np.asarray(lids2), np.asarray(lids))
    np.testing.assert_allclose(np.asarray(dists2), np.asarray(dists),
                               rtol=1e-5, atol=1e-3)


def test_auto_windows_caps_at_worst_query():
    """Hard-balanced build (every list one segment): the budget collapses
    to nprobe exactly — headroom windows are pure fixed cost.  Skewed
    builds keep the mean+tail formula."""
    from chamjax.searcher import auto_windows
    balanced = np.full(1024, 300)
    assert auto_windows(balanced, seg=512, nprobe=32) == 32
    skewed = np.concatenate([np.full(1000, 300), np.full(24, 5000)])
    w = auto_windows(skewed, seg=512, nprobe=32)
    assert 32 < w <= 32 * 10      # nprobe·max(segs) = 32·ceil(5000/512)


def test_lut_matches_numpy(ds, index):
    q = ds.xq[:4]
    dev = DeviceIVF.from_packed(index)
    lids, _ = coarse_scan(jnp.asarray(q), dev.centroids, 2)
    luts = np.asarray(build_luts(jnp.asarray(q), dev.centroids, dev.codebooks,
                                 lids, by_residual=True))
    m, ksub, dsub = index.codebooks.shape
    for qi in range(4):
        for pi in range(2):
            r = q[qi] - index.centroids[np.asarray(lids)[qi, pi]]
            rs = r.reshape(m, dsub)
            ref = ((rs[:, None, :] - index.codebooks) ** 2).sum(-1)  # (m,ksub)
            np.testing.assert_allclose(luts[qi, pi], ref.T, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("probe_chunk", [2, 3, 8])
def test_search_matches_adc_bruteforce(ds, index, probe_chunk):
    """Exact-topk search must equal the numpy ADC oracle."""
    q = ds.xq[:8]
    dev = DeviceIVF.from_packed(index)
    scan_len = index.suggest_scan_len(8)
    d, i = ivfpq_search(dev, jnp.asarray(q), nprobe=8, k=10,
                        scan_len=scan_len, probe_chunk=probe_chunk,
                        use_approx=False)
    ref_d, ref_i = _adc_bruteforce(index, q, nprobe=8, k=10)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-3, atol=1e-2)
    # ids may swap among (near-)equal distances; check via distance equality
    agree = np.asarray(i) == ref_i
    close = np.abs(np.asarray(d) - ref_d) < 1e-2
    assert np.all(agree | close)


def test_search_recall(ds, index):
    gt, _ = compute_ground_truth(ds.xb, ds.xq, k=10)
    searcher = IVFSearcher(index, SearchConfig(nprobe=16, k=10, probe_chunk=4))
    d, i = searcher.search(ds.xq)
    r1 = recall_at_k(i, gt, 1)
    r10 = recall_at_k(i, gt, 10)
    assert r10 > 0.8, f"R@10={r10}"
    assert r1 > 0.3, f"R@1={r1}"
    # distances ascending
    dd = np.asarray(d)
    assert np.all(np.diff(dd, axis=1) >= -1e-4)


def test_search_preassigned_matches_full(ds, index):
    q = ds.xq[:8]
    searcher = IVFSearcher(index, SearchConfig(nprobe=8, k=10, probe_chunk=4,
                                               use_approx_topk=False))
    d_full, i_full = searcher.search(q)
    d2 = ((q[:, None] - index.centroids[None]) ** 2).sum(-1)
    lids = np.argsort(d2, axis=1)[:, :8]
    d_pre, i_pre = searcher.search_preassigned(q, lids)
    np.testing.assert_allclose(d_pre, d_full, rtol=1e-3, atol=1e-2)


def test_backend_downgrade_warns(ds, index):
    """Silent-downgrade guard (VERDICT r1 weak #4): a user asking for a
    Pallas backend the index/config can't satisfy gets a warning."""
    import warnings as _w

    # pallas backend with scan_len not a GROUP multiple → xla fallback warns
    dev = DeviceIVF.from_packed(index)
    q = jnp.asarray(ds.xq[:4], jnp.float32)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        ivfpq_search(dev, q, nprobe=4, k=5, scan_len=777, backend="pallas",
                     interpret=True)
    assert any("falling" in str(r.message) for r in rec), rec

    # nbits != 8 searcher → xla fallback warns
    cfg = IndexConfig(dim=32, nlist=16, m=8, nbits=6, list_pad=64)
    idx6 = build_ivfpq(ds.xb[:4000], cfg, xt=ds.xt[:2000],
                       kmeans_iters=2, pq_iters=2)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        s = IVFSearcher(idx6, SearchConfig(nprobe=4, k=5, backend="seg"))
    assert s.backend == "xla"
    assert any("nbits" in str(r.message) for r in rec), rec


def test_hierarchical_select_matches_exact(ds, index):
    """select_l1 (oversized-L1 + exact L2 merge) must return the exact
    top-k wherever the L1 pass is lossless — on CPU approx_min_k falls
    back to an exact partial reduce, so positions/distances must agree
    with the plain exact path end-to-end."""
    from chamjax.ops.topk import select_topk

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(4, 8192)).astype(np.float32))
    v_h, i_h = select_topk(x, 10, use_approx=True, l1=256)
    v_e, i_e = select_topk(x, 10, use_approx=False)
    np.testing.assert_allclose(np.asarray(v_h), np.asarray(v_e), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_h), np.asarray(i_e))

    # through the full searcher (seg backend, interpret on CPU)
    gt, _ = compute_ground_truth(ds.xb, ds.xq, k=10)
    s_h = IVFSearcher(index, SearchConfig(nprobe=16, k=10, select_l1=256))
    s_p = IVFSearcher(index, SearchConfig(nprobe=16, k=10))
    d_h, i_h2 = s_h.search(ds.xq)
    d_p, i_p = s_p.search(ds.xq)
    np.testing.assert_allclose(d_h, d_p, rtol=1e-5, atol=1e-5)
    assert recall_at_k(i_h2, gt, 10) == recall_at_k(i_p, gt, 10)


def test_local_retriever_device_nprobe_override(ds, index):
    """The fused retrieve_device path must resize the window budget when
    nprobe is overridden (a budget auto-sized for scfg.nprobe silently
    truncates the scan) — pinned to IVFSearcher.search, which recomputes."""
    from chamjax.retrieval.local import LocalRetriever

    scfg = SearchConfig(nprobe=2, k=10, use_approx_topk=False)
    r = LocalRetriever(index, scfg)
    out = r.retrieve_device(jnp.asarray(ds.xq), nprobe=32, k=10)
    s32 = IVFSearcher(index, SearchConfig(nprobe=32, k=10,
                                          use_approx_topk=False))
    _d_ref, i_ref = s32.search(ds.xq)
    np.testing.assert_array_equal(np.asarray(out.ids, np.int64), i_ref)


def test_local_retriever_set_nprobe_keeps_kwargs(index):
    """set_nprobe rebuilds the searcher — it must keep the constructor's
    searcher kwargs (scan_quantile/device), not silently reset them."""
    from chamjax.retrieval.local import LocalRetriever

    r = LocalRetriever(index, SearchConfig(nprobe=4, k=10),
                       scan_quantile=0.5)
    want = IVFSearcher(index, SearchConfig(nprobe=8, k=10),
                       scan_quantile=0.5).scan_len
    deflt = IVFSearcher(index, SearchConfig(nprobe=8, k=10)).scan_len
    r.set_nprobe(8)
    assert r.searcher.scfg.nprobe == 8
    assert r.searcher.scan_len == want
    if want != deflt:      # ragged corpus ⇒ the quantile actually bites
        assert r.searcher.scan_len != deflt
