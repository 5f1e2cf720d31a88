"""Native (C++) runtime tests: build+load, vecs IO parity, and the epoll
coordinator relaying a full loopback topology identically to the Python
coordinator."""

import os
import threading
import time

import numpy as np
import pytest

from chamjax import native

HOST = "127.0.0.1"
# 42000+ range: disjoint from test_service's 20000-40000 pid-derived range
_port_counter = [42000 + (os.getpid() % 8000)]


def next_port():
    _port_counter[0] += 1
    return _port_counter[0]


def connect_retry(make, attempts=50):
    for _ in range(attempts):
        try:
            return make()
        except (ConnectionRefusedError, OSError):
            time.sleep(0.05)
    raise ConnectionError("server never came up")


def test_native_builds_and_loads():
    assert native.available(), "libchamnet must compile in this image"
    lib = native.load()
    assert lib.cham_vecs_dim(b"/nonexistent") < 0


def test_native_read_vecs_parity(tmp_path):
    from chamjax.data.datasets import read_fvecs, write_fvecs

    x = np.random.default_rng(0).standard_normal((100, 24)).astype(np.float32)
    path = str(tmp_path / "x.fvecs")
    write_fvecs(path, x)
    # native path
    got = native.read_vecs(path, "f")
    np.testing.assert_array_equal(got, x)
    # the reader integration (read_fvecs now routes through native)
    np.testing.assert_array_equal(read_fvecs(path), x)
    # partial read
    np.testing.assert_array_equal(native.read_vecs(path, "f", max_rows=7),
                                  x[:7])


def test_native_coordinator_relay():
    """2 clients -> native coordinator -> 2 random-answer engines; every
    client must get its own answers back in FIFO order."""
    from chamjax.retrieval.coordinator import NativeCoordinator
    from chamjax.retrieval.external import ExternalRetriever
    from chamjax.retrieval.server import RandomAnswerServer

    batch, dim, k = 4, 16, 10
    n_clients, n_requests = 2, 6
    eng_ports = [next_port(), next_port()]
    coord_port = next_port()

    engines = [RandomAnswerServer(HOST, p, batch_size=batch, dim=dim, seed=s)
               for s, p in enumerate(eng_ports)]
    for e in engines:
        threading.Thread(target=e.start, daemon=True).start()
    time.sleep(0.2)

    coord = NativeCoordinator(
        HOST, coord_port, n_clients, batch, dim, k,
        engine_addrs=[(HOST, p) for p in eng_ports],
        queries_per_client=n_requests)
    ct = threading.Thread(target=coord.start, daemon=True)
    ct.start()

    clients = [connect_retry(
        lambda: ExternalRetriever(HOST, coord_port, batch, dim, k))
        for _ in range(n_clients)]
    for c in clients:
        c.sync_with_coordinator()

    rng = np.random.default_rng(0)
    for _ in range(n_requests):
        for c in clients:
            q = rng.standard_normal((batch, dim)).astype(np.float32)
            res = c.retrieve(q, nprobe=8, k=k)
            assert res.ids.shape == (batch, k)
            assert res.dists.shape == (batch, k)
            assert np.all(np.diff(res.dists, axis=1) >= 0)

    for c in clients:
        c.close()
    ct.join(timeout=10)
    assert not ct.is_alive(), "native coordinator must terminate"
    assert coord.answered_query_cnt == n_clients * n_requests
    for e in engines:
        e.stop()


def test_native_coordinator_runs_until_disconnect():
    """queries_per_client=0 -> relay until clients hang up."""
    from chamjax.retrieval.coordinator import NativeCoordinator
    from chamjax.retrieval.external import ExternalRetriever
    from chamjax.retrieval.server import RandomAnswerServer

    batch, dim, k = 2, 8, 5
    eng_port, coord_port = next_port(), next_port()
    eng = RandomAnswerServer(HOST, eng_port, batch_size=batch, dim=dim)
    threading.Thread(target=eng.start, daemon=True).start()
    time.sleep(0.2)

    coord = NativeCoordinator(HOST, coord_port, 1, batch, dim, k,
                              engine_addrs=[(HOST, eng_port)])
    ct = threading.Thread(target=coord.start, daemon=True)
    ct.start()

    c = connect_retry(
        lambda: ExternalRetriever(HOST, coord_port, batch, dim, k))
    c.sync_with_coordinator()
    q = np.zeros((batch, dim), np.float32)
    res = c.retrieve(q, nprobe=4, k=k)
    assert res.ids.shape == (batch, k)
    c.close()
    ct.join(timeout=10)
    assert not ct.is_alive()
    eng.stop()


# --- native HNSW graph index -------------------------------------------------

def test_hnsw_recall_and_saveload(tmp_path):
    """Graph search ≥0.95 R@10 vs brute force; save/load preserves results;
    incremental adds keep labels."""
    np_rng = np.random.default_rng(7)
    from chamjax.native import HNSWIndex
    xb = np_rng.standard_normal((2500, 24)).astype(np.float32)
    xq = np_rng.standard_normal((40, 24)).astype(np.float32)
    idx = HNSWIndex(24, M=16, ef_construction=120)
    idx.add(xb[:2000])
    idx.add(xb[2000:], labels=np.arange(2000, 2500))
    assert len(idx) == 2500
    lab, dist = idx.search(xq, k=10, ef=120)
    gt = np.argsort(((xq[:, None] - xb[None]) ** 2).sum(-1), axis=1)[:, :10]
    rec = np.mean([len(set(lab[i]) & set(gt[i])) / 10
                   for i in range(len(xq))])
    assert rec >= 0.95, rec
    assert np.all(np.diff(dist, axis=1) >= 0)      # nearest-first
    p = str(tmp_path / "g.hnsw")
    idx.save(p)
    idx2 = HNSWIndex.load_file(p, 24)
    lab2, _ = idx2.search(xq, k=10, ef=120)
    np.testing.assert_array_equal(lab, lab2)


def test_native_ivfpq_matches_device_path():
    """The C++ CPU engine must reproduce IVFSearcher's exact-selection
    results (same packed index, same residual-ADC math) to float
    tolerance, on both the full and preassigned paths."""
    import numpy as np
    from chamjax import native
    from chamjax.config import IndexConfig, SearchConfig
    from chamjax.data import synthetic_dataset
    from chamjax.index import build_ivfpq
    from chamjax.ops.coarse import coarse_scan
    from chamjax.searcher import IVFSearcher

    ds = synthetic_dataset(nb=20000, nq=16, nt=8000, d=32, seed=7,
                           n_clusters=64)
    idx = build_ivfpq(ds.xb, IndexConfig(dim=32, nlist=64, m=8, list_pad=64),
                      xt=ds.xt, kmeans_iters=5, pq_iters=5)
    # lut_bf16=False: the engine is f32-exact; the packed-bf16 default
    # quantizes LUT entries ~0.4% and would dominate the tolerance
    ref = IVFSearcher(idx, SearchConfig(nprobe=8, k=10,
                                        use_approx_topk=False,
                                        lut_bf16=False))
    d_r, i_r = ref.search(ds.xq)

    eng = native.NativeIVFPQ(idx)
    d_n, i_n = eng.search(ds.xq, nprobe=8, k=10)
    np.testing.assert_allclose(d_n, d_r, rtol=1e-4, atol=1e-4)
    agree = i_n == i_r
    close = np.abs(d_n - d_r) < 1e-3   # id ties may swap at equal distance
    assert np.all(agree | close)

    # preassigned path against the device preassigned path
    import jax.numpy as jnp
    lids, _ = coarse_scan(jnp.asarray(ds.xq, jnp.float32),
                          jnp.asarray(idx.centroids), 8)
    d_p, i_p = eng.search_preassigned(ds.xq, np.asarray(lids), k=10)
    np.testing.assert_allclose(d_p, d_r, rtol=1e-4, atol=1e-4)
    agree = i_p == i_r
    close = np.abs(d_p - d_r) < 1e-3
    assert np.all(agree | close)
    eng.close()


def test_native_cpu_retriever_contract():
    import numpy as np
    from chamjax.config import IndexConfig, SearchConfig
    from chamjax.data import synthetic_dataset
    from chamjax.index import build_ivfpq
    from chamjax.retrieval.local import NativeCPURetriever

    ds = synthetic_dataset(nb=8000, nq=4, nt=4000, d=16, seed=1,
                           n_clusters=32)
    idx = build_ivfpq(ds.xb, IndexConfig(dim=16, nlist=32, m=4, list_pad=64),
                      xt=ds.xt, kmeans_iters=3, pq_iters=3)
    r = NativeCPURetriever(idx, SearchConfig(nprobe=4, k=5))
    res = r.retrieve(ds.xq, nprobe=4, k=5)
    assert res.ids.shape == (4, 5) and res.dists.shape == (4, 5)
    assert (np.diff(res.dists, axis=1) >= -1e-5).all()
    # async split inherited from BaseRetriever
    r.retrieve_send(ds.xq, 4, 5)
    assert r.poll()
    res2 = r.retrieve_recv(4, 5)
    np.testing.assert_array_equal(res2.ids, res.ids)
    r.close()


def test_native_engine_behind_tcp_server():
    """NativeCPURetriever served over the binary wire tier: the engine,
    the server loop, and the client codec compose (the host-only
    disaggregated topology of benchmarks/vector_search_service.py)."""
    import numpy as np
    from chamjax.config import IndexConfig, SearchConfig
    from chamjax.data import synthetic_dataset
    from chamjax.index import build_ivfpq
    from chamjax.retrieval.external import ExternalRetriever
    from chamjax.retrieval.local import NativeCPURetriever
    from chamjax.retrieval.server import RetrievalServer

    ds = synthetic_dataset(nb=8000, nq=8, nt=4000, d=16, seed=2,
                           n_clusters=32)
    idx = build_ivfpq(ds.xb, IndexConfig(dim=16, nlist=32, m=4, list_pad=64),
                      xt=ds.xt, kmeans_iters=3, pq_iters=3)
    retr = NativeCPURetriever(idx, SearchConfig(nprobe=4, k=5))
    port = next_port()
    srv = RetrievalServer(retr, "127.0.0.1", port, batch_size=8, dim=16,
                          nprobe=4)
    th = threading.Thread(target=srv.start,
                          kwargs=dict(n_connections=1, with_lists=False),
                          daemon=True)
    th.start()
    cli = connect_retry(
        lambda: ExternalRetriever("127.0.0.1", port, 8, 16, 5, nprobe=4))
    res = cli.retrieve(ds.xq.astype(np.float32), nprobe=4, k=5)
    # must equal the engine's direct answer
    direct = retr.retrieve(ds.xq, nprobe=4, k=5)
    np.testing.assert_array_equal(res.ids, direct.ids)
    np.testing.assert_allclose(res.dists, direct.dists, rtol=1e-6)
    cli.close()
    th.join(timeout=10)


def test_native_ivfpq_opq_rotation():
    """OPQ indexes: the engine must apply the stored rotation to queries
    exactly like the device path does."""
    import numpy as np
    from chamjax import native
    from chamjax.config import IndexConfig, SearchConfig
    from chamjax.data import synthetic_dataset
    from chamjax.index import build_ivfpq
    from chamjax.searcher import IVFSearcher

    ds = synthetic_dataset(nb=10000, nq=8, nt=6000, d=32, seed=13,
                           n_clusters=32)
    idx = build_ivfpq(ds.xb, IndexConfig(dim=32, nlist=32, m=8, list_pad=64,
                                         opq=True),
                      xt=ds.xt, kmeans_iters=4, pq_iters=4)
    assert idx.opq_R is not None
    ref = IVFSearcher(idx, SearchConfig(nprobe=8, k=10,
                                        use_approx_topk=False,
                                        lut_bf16=False))
    d_r, i_r = ref.search(ds.xq)
    eng = native.NativeIVFPQ(idx)
    d_n, i_n = eng.search(ds.xq, nprobe=8, k=10)
    np.testing.assert_allclose(d_n, d_r, rtol=1e-4, atol=1e-4)
    agree = i_n == i_r
    close = np.abs(d_n - d_r) < 1e-3   # id ties may swap at equal distance
    assert np.all(agree | close)
    eng.close()


def test_hnsw_load_rejects_inconsistent_graph(tmp_path):
    """A file whose per-node layer structure is internally inconsistent
    (entry point missing its max_level list, or a neighbor referenced at a
    layer it does not have) must be rejected at load — previously it
    passed the id bounds check and walked links[] out of bounds on the
    first search."""
    import struct as st
    from chamjax.native import HNSWIndex
    np_rng = np.random.default_rng(3)
    idx = HNSWIndex(8, M=4, ef_construction=32)
    idx.add(np_rng.standard_normal((200, 8)).astype(np.float32))
    p = str(tmp_path / "g.hnsw")
    idx.save(p)
    raw = bytearray(open(p, "rb").read())
    # header: [magic, dim, M, Mmax0, efc, n, entry+1, max_level+1] u64le.
    # claim one extra level for the whole graph: the entry node now lacks
    # its top layer list
    (maxl,) = st.unpack_from("<Q", raw, 7 * 8)
    st.pack_into("<Q", raw, 7 * 8, maxl + 1)
    bad = str(tmp_path / "bad.hnsw")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        HNSWIndex.load_file(bad, 8)
    # truncated file still rejected (regression for the header-bounds gate)
    open(bad, "wb").write(bytes(raw[: len(raw) // 2]))
    with pytest.raises(IOError):
        HNSWIndex.load_file(bad, 8)
