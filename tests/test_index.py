"""Index-build unit tests: k-means, PQ, OPQ, packed layout."""

import numpy as np
import pytest

from chamjax.config import IndexConfig
from chamjax.index import (
    kmeans, kmeans_assign, train_pq, pq_encode, pq_decode, train_opq,
    build_ivfpq, PackedIVF,
)


def test_kmeans_clusters_recoverable(rng):
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 10
    x = (centers[rng.integers(0, 8, 2000)]
         + rng.standard_normal((2000, 16)).astype(np.float32) * 0.1)
    cent = kmeans(x, 8, iters=10, seed=1)
    assert cent.shape == (8, 16)
    # every true center should have a learned centroid nearby
    d = ((centers[:, None] - cent[None]) ** 2).sum(-1).min(1)
    assert np.all(d < 1.0)


def test_kmeans_assign_matches_argmin(rng):
    x = rng.standard_normal((300, 8)).astype(np.float32)
    cent = rng.standard_normal((16, 8)).astype(np.float32)
    a = kmeans_assign(x, cent, chunk=100)
    ref = np.argmin(((x[:, None] - cent[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(a, ref)


def _overflow_corpus(rng):
    """16 cells, 1500 of 1600 points piled onto centroid 0:
    cap=ceil(100·1.3)=130, first-pass capacity of the 8 nearest cells
    = 8·130 = 1040 < 1500 — guaranteed overflow of every first-pass
    candidate."""
    cent = rng.standard_normal((16, 8)).astype(np.float32) * 10
    x = np.concatenate([
        cent[0] + rng.standard_normal((1500, 8)).astype(np.float32) * 0.1,
        cent[rng.integers(1, 16, 100)]
        + rng.standard_normal((100, 8)).astype(np.float32) * 0.1,
    ])
    cap = int(np.ceil(x.shape[0] / 16 * 1.3))
    return x, cent, cap


def test_assign_balanced_hard_cap_is_exact(rng):
    """hard=True must hold the cap even when a dense cluster overflows
    every first-pass candidate: the widening retry guarantees it because
    k·cap ≥ n always leaves a cell with room.  (The soft nearest-cell
    fallback produced 8.4× the cap on the 1M bench build, defeating the
    worst-query window bound in auto_windows.)  Heavy overflow must warn —
    hard displacement at this rate is a measured recall hazard."""
    import warnings as w
    from chamjax.index.kmeans import assign_balanced

    x, cent, cap = _overflow_corpus(rng)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        a = assign_balanced(x, cent, cap=cap, n_cand=8, hard=True)
    counts = np.bincount(a, minlength=16)
    assert counts.max() <= cap
    assert counts.sum() == x.shape[0]
    assert (a >= 0).all()
    assert any("binds against natural cluster" in str(r.message) for r in rec)


def test_assign_balanced_soft_default_keeps_nearest(rng):
    """Default (soft) mode: overflow rows stay in their NEAREST cell (the
    recall-preserving fallback) and a warning says the cap was exceeded."""
    import warnings as w
    from chamjax.index.kmeans import assign_balanced

    x, cent, cap = _overflow_corpus(rng)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        a = assign_balanced(x, cent, cap=cap, n_cand=8)
    assert any("cap" in str(r.message) and "soft" in str(r.message)
               for r in rec)
    counts = np.bincount(a, minlength=16)
    assert counts.sum() == x.shape[0]
    assert counts.max() > cap          # soft: hot cell exceeds the cap
    # soft mode never displaces beyond the first-pass candidates: every
    # point sits in one of its n_cand nearest cells (overflow → cand[0])
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    rank_of_assigned = (d2 < d2[np.arange(x.shape[0]), a][:, None]).sum(1)
    assert rank_of_assigned.max() < 8


def test_pq_reconstruction_beats_random(rng):
    x = rng.standard_normal((4000, 32)).astype(np.float32)
    cb = train_pq(x, m=4, iters=10)
    assert cb.shape == (4, 256, 8)
    codes = pq_encode(x, cb)
    assert codes.shape == (4000, 4) and codes.dtype == np.uint8
    xhat = pq_decode(codes, cb)
    err = ((x - xhat) ** 2).sum(-1).mean()
    base = (x ** 2).sum(-1).mean()
    assert err < 0.7 * base  # quantization must explain real variance


def test_pq_encode_is_nearest_codeword(rng):
    x = rng.standard_normal((200, 16)).astype(np.float32)
    cb = train_pq(x, m=2, iters=5)
    codes = pq_encode(x, cb)
    for mm in range(2):
        sub = x[:, mm * 8:(mm + 1) * 8]
        d = ((sub[:, None] - cb[mm][None]) ** 2).sum(-1)
        # chosen codeword's distance must equal the true minimum to float
        # tolerance (argmin ties may break differently across formulations)
        chosen = d[np.arange(len(sub)), codes[:, mm].astype(np.int64)]
        np.testing.assert_allclose(chosen, d.min(axis=1), rtol=1e-4, atol=1e-4)


def test_opq_reduces_error(rng):
    # correlated dims → OPQ rotation should (weakly) improve reconstruction
    z = rng.standard_normal((3000, 8)).astype(np.float32)
    mix = rng.standard_normal((8, 32)).astype(np.float32)
    x = z @ mix
    R, cb = train_opq(x, m=4, outer_iters=3, pq_iters=5)
    # R orthogonal
    np.testing.assert_allclose(R @ R.T, np.eye(32), atol=1e-3)
    xr = x @ R
    err_opq = ((xr - pq_decode(pq_encode(xr, cb), cb)) ** 2).sum(-1).mean()
    cb0 = train_pq(x, m=4, iters=5)
    err_pq = ((x - pq_decode(pq_encode(x, cb0), cb0)) ** 2).sum(-1).mean()
    assert err_opq < err_pq * 1.05  # allow noise; typically much better


def test_build_packed_layout(rng, tmp_path):
    x = rng.standard_normal((5000, 32)).astype(np.float32)
    cfg = IndexConfig(dim=32, nlist=16, m=4, list_pad=64)
    idx = build_ivfpq(x, cfg, kmeans_iters=5, pq_iters=5)
    assert idx.ntotal == 5000
    assert idx.codes.shape[1] == 4
    # starts aligned, lens consistent, ids partition the dataset
    assert np.all(idx.list_start % 64 == 0)
    assert idx.list_len.sum() == 5000
    valid = idx.ids[idx.ids >= 0]
    assert sorted(valid.tolist()) == list(range(5000))
    # every stored row's code matches its vector's encoding
    for l in [0, 7, 15]:
        s, ln = idx.list_start[l], idx.list_len[l]
        rows = idx.ids[s:s + ln]
        assert np.all(rows >= 0)
    # save/load roundtrip
    p = str(tmp_path / "idx.npz")
    idx.save(p)
    idx2 = PackedIVF.load(p)
    np.testing.assert_array_equal(idx.codes, idx2.codes)
    np.testing.assert_array_equal(idx.ids, idx2.ids)
    assert idx2.cfg == cfg
    assert idx2.opq_R is None


def test_build_ivfpq_device_resident_matches_host():
    """build_ivfpq with device (jax) input must produce the same packed
    index as with host numpy input — the device path exists because the
    host↔device link can be minutes-per-pass slow (bench cold start)."""
    import jax.numpy as jnp
    from chamjax.config import IndexConfig
    from chamjax.data import synthetic_dataset
    from chamjax.index import build_ivfpq

    ds = synthetic_dataset(nb=6000, nq=8, nt=3000, d=32, seed=11,
                           n_clusters=64)
    cfg = IndexConfig(dim=32, nlist=32, m=8, list_pad=64, balanced=True)
    host = build_ivfpq(ds.xb, cfg, xt=ds.xt, kmeans_iters=4, pq_iters=4)
    dev = build_ivfpq(jnp.asarray(ds.xb), cfg, xt=jnp.asarray(ds.xt),
                      kmeans_iters=4, pq_iters=4)
    np.testing.assert_allclose(host.centroids, dev.centroids, atol=1e-5)
    np.testing.assert_array_equal(host.list_len, dev.list_len)
    assert (host.codes == dev.codes).mean() > 0.999   # f32 tie-breaks
    np.testing.assert_array_equal(host.ids, dev.ids)


def test_build_ivfpq_device_resident_opq():
    import jax.numpy as jnp
    from chamjax.config import IndexConfig
    from chamjax.data import synthetic_dataset
    from chamjax.index import build_ivfpq

    ds = synthetic_dataset(nb=3000, nq=8, nt=2000, d=32, seed=12,
                           n_clusters=32)
    cfg = IndexConfig(dim=32, nlist=16, m=8, list_pad=64, opq=True)
    dev = build_ivfpq(jnp.asarray(ds.xb), cfg, xt=jnp.asarray(ds.xt),
                      kmeans_iters=3, pq_iters=3)
    assert dev.opq_R is not None and dev.codes.dtype == np.uint8
    assert int(dev.list_len.sum()) == 3000


def test_opq_subsample_is_uniform_not_head():
    """OPQ training rows must be a uniform subsample — the head slice
    fits the rotation to ordered corpora's head distribution only."""
    from chamjax.index.ivf import _opq_subsample_idx
    n, cap = 1_000_000, 1 << 17
    idx = _opq_subsample_idx(n, seed=0, cap=cap)
    assert idx.shape == (cap,) and len(np.unique(idx)) == cap
    assert np.all(np.diff(idx) > 0)              # sorted, no repeats
    assert idx.max() > n // 2                    # reaches past the head
    small = _opq_subsample_idx(1000, seed=0, cap=cap)
    np.testing.assert_array_equal(small, np.arange(1000))
