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
