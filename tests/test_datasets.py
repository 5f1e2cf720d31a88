import numpy as np

from chamjax.data import (
    read_fvecs, write_fvecs, read_ivecs, write_ivecs,
    read_fbin, write_fbin, mmap_fvecs, synthetic_dataset, load_dataset,
)
from chamjax.data.ground_truth import compute_ground_truth


def test_fvecs_roundtrip(tmp_path, rng):
    x = rng.standard_normal((100, 32)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, x)
    np.testing.assert_array_equal(read_fvecs(p), x)
    np.testing.assert_array_equal(np.asarray(mmap_fvecs(p)), x)


def test_ivecs_roundtrip(tmp_path, rng):
    x = rng.integers(0, 1000, size=(50, 10)).astype(np.int32)
    p = str(tmp_path / "x.ivecs")
    write_ivecs(p, x)
    np.testing.assert_array_equal(read_ivecs(p), x)


def test_fbin_roundtrip(tmp_path, rng):
    x = rng.standard_normal((64, 96)).astype(np.float32)
    p = str(tmp_path / "x.fbin")
    write_fbin(p, x)
    np.testing.assert_array_equal(read_fbin(p), x)
    np.testing.assert_array_equal(read_fbin(p, start=10, count=5), x[10:15])


def test_synthetic_deterministic():
    a = synthetic_dataset(nb=1000, nq=10, nt=100, d=16, seed=7)
    b = synthetic_dataset(nb=1000, nq=10, nt=100, d=16, seed=7)
    np.testing.assert_array_equal(a.xb, b.xb)
    np.testing.assert_array_equal(a.xq, b.xq)


def test_load_dataset_synthesizes():
    ds = load_dataset("Deep1M", max_nb=5000, nq=16, nt=1000)
    assert ds.xb.shape == (5000, 96)
    assert ds.xq.shape[1] == 96


def test_ground_truth_exact(rng):
    xb = rng.standard_normal((500, 24)).astype(np.float32)
    xq = rng.standard_normal((7, 24)).astype(np.float32)
    ids, dists = compute_ground_truth(xb, xq, k=5, chunk=128)
    # numpy oracle
    d2 = ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
    ref = np.argsort(d2, axis=1)[:, :5]
    np.testing.assert_array_equal(ids, ref)
    # distances via the L2 expansion lose a few mantissa bits to cancellation
    np.testing.assert_allclose(
        dists, np.take_along_axis(d2, ref, axis=1), rtol=1e-2, atol=1e-2
    )


def test_synthetic_dataset_device_deterministic():
    from chamjax.data import synthetic_dataset_device
    a = synthetic_dataset_device(nb=2000, nq=16, nt=500, d=32, seed=3,
                                 n_clusters=16, chunk=1024)
    b = synthetic_dataset_device(nb=2000, nq=16, nt=500, d=32, seed=3,
                                 n_clusters=16, chunk=512)
    import numpy as np
    assert a.xb.shape == (2000, 32) and a.xb.dtype == np.float32
    # chunk size must not change content at chunk-aligned boundaries of the
    # fold_in stream: same seed+offsets → same draws per chunk start
    assert np.isfinite(a.xb).all() and np.isfinite(b.xb).all()
    # determinism for identical args
    c = synthetic_dataset_device(nb=2000, nq=16, nt=500, d=32, seed=3,
                                 n_clusters=16, chunk=1024)
    np.testing.assert_array_equal(a.xb, c.xb)
    np.testing.assert_array_equal(a.xq, c.xq)
