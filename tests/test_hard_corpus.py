"""Hard-mode corpus generator (chamjax/data/hard.py): determinism, mass
skew, query derivation, and the non-saturation property at test scale —
the corpus family behind the matched-recall headline tables (VERDICT r3
missing #2)."""

import numpy as np
import pytest

from chamjax.data.hard import GEN, make_hard_corpus, synthetic_dataset_hard


@pytest.fixture(scope="module")
def hc():
    return make_hard_corpus(d=32, n_clusters=4096, seed=7)


def test_hard_draw_deterministic_and_chunk_invariant(hc):
    a = np.asarray(hc.draw_base(0, 2 * GEN))
    b0 = np.asarray(hc.draw_base(0, GEN))
    b1 = np.asarray(hc.draw_base(GEN, GEN))
    np.testing.assert_array_equal(a, np.concatenate([b0, b1]))
    # train stream differs from base stream
    t = np.asarray(hc.draw_train(0, GEN))
    assert not np.allclose(t[:100], b0[:100])


def test_hard_draw_rejects_misaligned():
    hc = make_hard_corpus(d=16, n_clusters=256, seed=1)
    with pytest.raises(AssertionError, match="GEN"):
        hc.draw_base(0, 1000)


def test_hard_mass_is_heavy_tailed(hc):
    """Zipf assignment: the cluster-mass CDF the generator samples through
    must be heavy-tailed — the top 1% of clusters hold far more than the
    uniform 1% share (at zipf_a=1.05, ~1/4 of all mass)."""
    cdf = hc.params["mass_cdf"]
    n = cdf.shape[0]
    top1pct_mass = float(cdf[max(n // 100, 1) - 1])
    assert top1pct_mass > 0.15, top1pct_mass
    # and the tail still matters (not a degenerate single-cluster corpus)
    assert top1pct_mass < 0.9, top1pct_mass


def test_hard_queries_are_near_corpus_rows(hc):
    q = np.asarray(hc.queries(64, jitter=0.3))
    base = np.asarray(hc.draw_base(0, GEN))
    # each query's nearest corpus row should be very close (it is the
    # jittered source row), far closer than a random row
    d2 = ((base[None, :2048] - q[:8, None]) ** 2).sum(-1)
    rnd = float(np.median(d2))
    # full scan over the first chunk for the true min
    mins = []
    for i in range(8):
        mins.append(float(((base - q[i]) ** 2).sum(-1).min()))
    assert np.median(mins) < 0.25 * rnd, (np.median(mins), rnd)


def test_hard_dataset_wrapper_shapes():
    ds = synthetic_dataset_hard(nb=1000, nq=16, nt=500, d=16,
                                n_clusters=512, seed=3)
    assert ds.xb.shape == (1000, 16)
    assert ds.xq.shape == (16, 16)
    assert ds.xt.shape == (500, 16)
    assert np.isfinite(ds.xb).all()


def test_hard_recall_does_not_saturate_at_low_nprobe():
    """The defining property: with nlist ≪ n_clusters and overlapping
    clusters, R@10 at nprobe=1 must be meaningfully below the nprobe=16
    point (the easy generator pins both at ~1.0)."""
    from chamjax.config import IndexConfig, SearchConfig
    from chamjax.data.ground_truth import compute_ground_truth
    from chamjax.eval import recall_at_k
    from chamjax.index import build_ivfpq
    from chamjax.searcher import IVFSearcher

    hc = make_hard_corpus(d=32, n_clusters=8192, seed=5)
    xb = np.asarray(hc.draw_base(0, GEN))[:120_000]
    xt = np.asarray(hc.draw_train(0, GEN))[:40_000]
    xq = np.asarray(hc.queries(64, jitter=0.35))
    gt, _ = compute_ground_truth(xb, xq, k=10)
    idx = build_ivfpq(xb, IndexConfig(dim=32, nlist=256, m=8, list_pad=64),
                      xt=xt, kmeans_iters=6, pq_iters=6)
    r = {}
    for nprobe in (1, 16):
        s = IVFSearcher(idx, SearchConfig(nprobe=nprobe, k=10,
                                          use_approx_topk=False))
        _d, i = s.search(xq)
        r[nprobe] = recall_at_k(i, gt, 10)
    assert r[16] - r[1] > 0.1, r
    assert r[1] < 0.85, r
