"""On-disk index build tests: equality with the in-memory populate, memmap
load, and searchability."""

import numpy as np

from chamjax.config import IndexConfig, SearchConfig
from chamjax.data import synthetic_dataset
from chamjax.index.factory import populate, train_quantizers
from chamjax.index.ondisk import load_ondisk, populate_on_disk
from chamjax.searcher import IVFSearcher


def test_ondisk_equals_in_memory(tmp_path):
    ds = synthetic_dataset(nb=10_000, nq=8, nt=4000, d=32, seed=7,
                           n_clusters=32)
    cfg = IndexConfig(dim=32, nlist=16, m=8, list_pad=64)
    tq = train_quantizers(ds.xt, cfg, kmeans_iters=4, pq_iters=4)

    mem = populate(ds.xb, tq)
    out = populate_on_disk(ds.xb, tq, str(tmp_path / "odx"), chunk=3000)
    disk = load_ondisk(out)

    assert disk.ntotal == mem.ntotal
    np.testing.assert_array_equal(disk.list_len, mem.list_len)
    np.testing.assert_array_equal(disk.list_start, mem.list_start)
    # per-list content equal as sets (chunked scatter may reorder rows
    # within a list; ADC distances are order-invariant)
    for l in range(cfg.nlist):
        s, ln = int(mem.list_start[l]), int(mem.list_len[l])
        np.testing.assert_array_equal(np.sort(disk.ids[s:s + ln]),
                                      np.sort(mem.ids[s:s + ln]))
        key_m = np.lexsort(mem.codes[s:s + ln].T)
        key_d = np.lexsort(disk.codes[s:s + ln].T)
        np.testing.assert_array_equal(disk.codes[s:s + ln][key_d],
                                      mem.codes[s:s + ln][key_m])
    # memmap-backed search works end-to-end
    s1 = IVFSearcher(mem, SearchConfig(nprobe=8, k=10,
                                       use_approx_topk=False))
    s2 = IVFSearcher(disk, SearchConfig(nprobe=8, k=10,
                                        use_approx_topk=False))
    d1, _ = s1.search(ds.xq)
    d2, _ = s2.search(ds.xq)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-5)


def test_ondisk_device_populate_matches_host(tmp_path):
    """populate_on_disk_device (device assign/encode, host scatter — the
    100M-capable export path) produces the same on-disk index as the host
    populate, up to within-list row order."""
    import jax.numpy as jnp
    from chamjax.index.ondisk import populate_on_disk_device

    ds = synthetic_dataset(nb=10_000, nq=8, nt=4000, d=32, seed=7,
                           n_clusters=32)
    cfg = IndexConfig(dim=32, nlist=16, m=8, list_pad=64)
    tq = train_quantizers(ds.xt, cfg, kmeans_iters=4, pq_iters=4)

    host = load_ondisk(populate_on_disk(ds.xb, tq, str(tmp_path / "h"),
                                        chunk=3000))
    xb_d = jnp.asarray(ds.xb)
    dev = load_ondisk(populate_on_disk_device(
        lambda s, c: xb_d[s:s + c], len(ds.xb), tq, str(tmp_path / "d"),
        chunk=3000))

    np.testing.assert_array_equal(dev.list_len, host.list_len)
    np.testing.assert_array_equal(dev.list_start, host.list_start)
    for l in range(cfg.nlist):
        s, ln = int(host.list_start[l]), int(host.list_len[l])
        np.testing.assert_array_equal(np.sort(dev.ids[s:s + ln]),
                                      np.sort(host.ids[s:s + ln]))
    s1 = IVFSearcher(host, SearchConfig(nprobe=8, k=10,
                                        use_approx_topk=False))
    s2 = IVFSearcher(dev, SearchConfig(nprobe=8, k=10,
                                       use_approx_topk=False))
    d1, _ = s1.search(ds.xq)
    d2, _ = s2.search(ds.xq)
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-4)


def test_ondisk_balanced_warns(tmp_path):
    """populate_on_disk cannot honor cfg.balanced (chunked nearest-cell
    assigner) — it must say so instead of silently dropping the cap."""
    import dataclasses
    import pytest
    from chamjax.config import IndexConfig
    from chamjax.data import synthetic_dataset
    from chamjax.index.factory import train_quantizers
    from chamjax.index.ondisk import populate_on_disk

    ds = synthetic_dataset(nb=4000, nq=4, nt=2000, d=16, seed=3,
                           n_clusters=16)
    cfg = IndexConfig(dim=16, nlist=16, m=4, balanced=True)
    tq = train_quantizers(ds.xt, cfg, kmeans_iters=4, pq_iters=4)
    with pytest.warns(UserWarning, match="balanced"):
        populate_on_disk(ds.xb, tq, str(tmp_path / "od"))
