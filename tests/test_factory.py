"""Index factory tests: key parsing, train/populate split, sharded build +
merge equivalence with the single-shot build."""

import numpy as np
import pytest

from chamjax.config import IndexConfig, SearchConfig
from chamjax.data import synthetic_dataset
from chamjax.index import build_ivfpq
from chamjax.index.factory import (
    TrainedQuantizers, merge_indexes, parse_index_key, populate,
    train_quantizers,
)
from chamjax.searcher import IVFSearcher


def test_parse_index_key():
    cfg = parse_index_key("OPQ16,IVF4096,PQ16", dim=128)
    assert cfg.opq and cfg.nlist == 4096 and cfg.m == 16
    cfg = parse_index_key("IVF1024,PQ32", dim=128)
    assert not cfg.opq and cfg.nlist == 1024 and cfg.m == 32
    assert cfg.key == "IVF1024,PQ32"
    # m must come from the PQ token, not the OPQ prefix width (a whole-key
    # regex match for PQ\d+ lands inside "OPQ32" first)
    cfg = parse_index_key("OPQ32,IVF4096,PQ16", dim=128)
    assert cfg.opq and cfg.m == 16
    with pytest.raises(ValueError):
        parse_index_key("IVF4096", dim=128)


@pytest.fixture(scope="module")
def corpus():
    return synthetic_dataset(nb=12000, nq=16, nt=6000, d=32, seed=5,
                             n_clusters=32)


def test_trained_quantizers_roundtrip(corpus, tmp_path):
    ds = corpus
    cfg = IndexConfig(dim=32, nlist=16, m=8, list_pad=64)
    tq = train_quantizers(ds.xt, cfg, kmeans_iters=4, pq_iters=4)
    p = str(tmp_path / "tq.npz")
    tq.save(p)
    tq2 = TrainedQuantizers.load(p)
    np.testing.assert_array_equal(tq.centroids, tq2.centroids)
    np.testing.assert_array_equal(tq.codebooks, tq2.codebooks)
    assert tq2.opq_R is None


def test_sharded_populate_merge_equals_single(corpus):
    """Populating N slices + merge must give the same search results as a
    single populate over the full corpus."""
    ds = corpus
    cfg = IndexConfig(dim=32, nlist=16, m=8, list_pad=64)
    tq = train_quantizers(ds.xt, cfg, kmeans_iters=4, pq_iters=4)

    single = populate(ds.xb, tq)
    n = ds.nb
    parts = []
    for s in range(3):
        lo, hi = n * s // 3, n * (s + 1) // 3
        parts.append(populate(ds.xb[lo:hi], tq, id_offset=lo))
    merged = merge_indexes(parts)

    assert merged.ntotal == single.ntotal
    np.testing.assert_array_equal(merged.list_len, single.list_len)
    # every id present exactly once
    got = np.sort(merged.ids[merged.ids >= 0])
    np.testing.assert_array_equal(got, np.arange(n))

    s1 = IVFSearcher(single, SearchConfig(nprobe=8, k=10,
                                          use_approx_topk=False))
    s2 = IVFSearcher(merged, SearchConfig(nprobe=8, k=10,
                                          use_approx_topk=False))
    d1, i1 = s1.search(ds.xq)
    d2, i2 = s2.search(ds.xq)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-5)


def test_populate_matches_build_ivfpq(corpus):
    """train_quantizers + populate == build_ivfpq (same seed)."""
    ds = corpus
    cfg = IndexConfig(dim=32, nlist=16, m=8, list_pad=64)
    a = build_ivfpq(ds.xb, cfg, xt=ds.xt, kmeans_iters=4, pq_iters=4)
    tq = train_quantizers(ds.xt, cfg, kmeans_iters=4, pq_iters=4)
    b = populate(ds.xb, tq)
    np.testing.assert_array_equal(a.centroids, b.centroids)
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_array_equal(a.ids, b.ids)


# --- inverted multi-index (IMI2xB) -------------------------------------------

def test_parse_index_key_imi():
    cfg = parse_index_key("IMI2x5,PQ16", dim=128)
    assert cfg.imi == 5 and cfg.nlist == 1024 and cfg.m == 16
    assert cfg.key == "IMI2x5,PQ16"
    cfg = parse_index_key("OPQ8,IMI2x4,PQ8", dim=64)
    assert cfg.opq and cfg.imi == 4 and cfg.nlist == 256


def test_imi_factored_scan_matches_materialized(corpus):
    """The factored IMI coarse scan must rank exactly like a flat scan over
    the materialized product grid."""
    import jax.numpy as jnp
    from chamjax.index.imi import (
        assign_imi, coarse_scan_imi, imi_centroids, train_imi,
    )
    from chamjax.ops.coarse import coarse_scan

    ds = corpus
    cents_a, cents_b = train_imi(ds.xt, bits=3, iters=4)
    grid = imi_centroids(cents_a, cents_b)
    assert grid.shape == (64, 32)
    q = jnp.asarray(ds.xq)
    ids_f, d_f = coarse_scan_imi(q, jnp.asarray(cents_a),
                                 jnp.asarray(cents_b), nprobe=8)
    ids_m, d_m = coarse_scan(q, jnp.asarray(grid), nprobe=8)
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_m))
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_m), atol=1e-3)

    a_fact = assign_imi(ds.xb[:2000], cents_a, cents_b)
    from chamjax.index.kmeans import assign
    a_mat = assign(ds.xb[:2000], grid)
    assert (a_fact == a_mat).mean() > 0.999   # f32 ties may differ


def test_imi_end_to_end_recall(corpus):
    """IMI2x3 (64 cells) index through the standard searcher reaches the
    same recall regime as plain IVF64 on the clustered corpus."""
    from chamjax.data.ground_truth import compute_ground_truth
    from chamjax.eval import recall_at_k

    ds = corpus
    cfg = parse_index_key("IMI2x3,PQ8", dim=32)
    tq = train_quantizers(ds.xt, cfg, kmeans_iters=6, pq_iters=6)
    idx = populate(ds.xb, tq)
    gt, _ = compute_ground_truth(ds.xb, ds.xq, k=10)
    s = IVFSearcher(idx, SearchConfig(nprobe=16, k=10))
    _, ids = s.search(ds.xq)
    r_imi = recall_at_k(ids, gt, 10)

    ivf = build_ivfpq(ds.xb, IndexConfig(dim=32, nlist=64, m=8), xt=ds.xt,
                      kmeans_iters=6, pq_iters=6)
    s2 = IVFSearcher(ivf, SearchConfig(nprobe=16, k=10))
    _, ids2 = s2.search(ds.xq)
    r_ivf = recall_at_k(ids2, gt, 10)
    assert r_imi > 0.6 * r_ivf, (r_imi, r_ivf)


def test_build_ivfpq_imi_routes_to_factory(corpus):
    """build_ivfpq with an IMI config must produce a product-structured
    coarse quantizer (the factory path), not a flat kmeans over 4^B cells
    trained on too few points."""
    from chamjax.data.ground_truth import compute_ground_truth
    from chamjax.eval import recall_at_k

    ds = corpus
    cfg = parse_index_key("IMI2x3,PQ8", dim=32)
    idx = build_ivfpq(ds.xb, cfg, xt=ds.xt, kmeans_iters=6, pq_iters=6)
    assert idx.cfg.imi == 3 and idx.centroids.shape == (64, 32)
    # product structure: row i*8+j = [a_i ‖ b_j]
    k, h = 8, 16
    np.testing.assert_array_equal(idx.centroids[: k, :h],
                                  np.broadcast_to(idx.centroids[0, :h],
                                                  (k, h)))
    gt, _ = compute_ground_truth(ds.xb, ds.xq, k=10)
    s = IVFSearcher(idx, SearchConfig(nprobe=16, k=10))
    _, ids = s.search(ds.xq)
    assert recall_at_k(ids, gt, 10) > 0.4


def test_parse_index_key_requires_coarse_token():
    with pytest.raises(ValueError, match="IVF"):
        parse_index_key("OPQ16,PQ16", dim=128)
