"""Loopback service-mesh tests.

The reference tests multi-node on one machine (server + coordinator + N
client processes on 127.0.0.1 — ``ralm/README.md``); its socket tests were
disabled due to lingering sockets.  Here they run green: threads + ephemeral
ports + retry-connect.
"""

import os
import socket
import threading
import time

import numpy as np
import pytest

from chamjax.retrieval.coordinator import RetrieveCoordinator
from chamjax.retrieval.external import ExternalRetriever
from chamjax.retrieval.index_scanner import IndexScanner, IndexServer
from chamjax.retrieval.server import RandomAnswerServer

HOST = "127.0.0.1"
# pid-derived base so a stale test process can never collide on ports
_port_counter = [20000 + (os.getpid() % 20000)]


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


def test_random_server_roundtrip():
    port = next_port()
    srv = RandomAnswerServer(HOST, port, batch_size=4, dim=16)
    t = threading.Thread(target=srv.start, daemon=True)
    t.start()
    r = connect_retry(lambda: ExternalRetriever(HOST, port, 4, 16, k=10))
    q = np.random.default_rng(0).standard_normal((4, 16)).astype(np.float32)
    res = r.retrieve(q, nprobe=8, k=10)
    assert res.ids.shape == (4, 10)
    assert res.dists.shape == (4, 10)
    assert np.all(np.diff(res.dists, axis=1) >= 0)   # sorted answers
    r.close()


def test_send_poll_recv_split_with_delay():
    """The async split the tik-tok scheduler depends on: poll() must be
    False while the (delayed) answer is in flight, then recv drains FIFO."""
    port = next_port()
    srv = RandomAnswerServer(HOST, port, batch_size=2, dim=8, delay_ms=200)
    threading.Thread(target=srv.start, daemon=True).start()
    r = connect_retry(lambda: ExternalRetriever(HOST, port, 2, 8, k=5))
    q = np.zeros((2, 8), np.float32)
    t0 = time.perf_counter()
    r.retrieve_send(q, nprobe=4, k=5)
    assert time.perf_counter() - t0 < 0.1   # send is non-blocking
    assert not r.poll()                      # answer not ready yet
    while not r.poll():
        time.sleep(0.01)
    res = r.retrieve_recv()
    assert res.ids.shape == (2, 5)
    assert time.perf_counter() - t0 >= 0.2   # delay was actually injected
    r.close()


def test_coordinator_round_robin_two_clients_two_engines():
    """Full mesh: 2 clients → coordinator → 2 mock engines; every client
    must get exactly its own answers back (origin routing)."""
    e_ports = [next_port(), next_port()]
    engines = [RandomAnswerServer(HOST, p, batch_size=2, dim=8, seed=i)
               for i, p in enumerate(e_ports)]
    for e in engines:
        threading.Thread(target=e.start, daemon=True).start()
    time.sleep(0.1)

    c_port = next_port()
    coord = RetrieveCoordinator(
        HOST, c_port, n_clients=2, batch_size=2, dim=8, k=5,
        engine_addrs=[(HOST, p) for p in e_ports], queries_per_client=3)
    threading.Thread(target=coord.start, daemon=True).start()

    clients = [
        connect_retry(lambda: ExternalRetriever(HOST, c_port, 2, 8, k=5))
        for _ in range(2)
    ]
    for c in clients:
        c.sync_with_coordinator()

    results = {}

    def run_client(ci):
        q = np.full((2, 8), ci, np.float32)
        out = []
        for _ in range(3):
            out.append(clients[ci].retrieve(q, nprobe=4, k=5))
        results[ci] = out

    ts = [threading.Thread(target=run_client, args=(ci,)) for ci in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=20)
    assert set(results) == {0, 1}
    for ci, outs in results.items():
        assert len(outs) == 3
        for res in outs:
            assert res.ids.shape == (2, 5)
    for c in clients:
        c.close()


def test_coordinator_dummy_answer_mode():
    c_port = next_port()
    coord = RetrieveCoordinator(HOST, c_port, n_clients=1, batch_size=2,
                                dim=8, k=5, queries_per_client=2)
    threading.Thread(target=coord.start_dummy_answer, daemon=True).start()
    c = connect_retry(lambda: ExternalRetriever(HOST, c_port, 2, 8, k=5))
    c.sync_with_coordinator()
    q = np.zeros((2, 8), np.float32)
    for _ in range(2):
        res = c.retrieve(q, nprobe=4, k=5)
        np.testing.assert_array_equal(res.ids[0], np.arange(5))
    c.close()


def test_index_server_tiktok_overlaps_latency():
    """Throughput mode overlaps the coarse scan of batch i+1 with the
    engine's work on batch i.  Asserted as a deterministic event-order
    property — scan(i+1) lands between send(i) and recv(i) — instead of
    wall-clock (which flaked under full-suite CPU load; measured speedups
    live in benchmarks/vector_search_service.py)."""
    port = next_port()
    srv = RandomAnswerServer(HOST, port, batch_size=4, dim=16, delay_ms=20)
    threading.Thread(target=srv.start, kwargs={"with_lists": True},
                     daemon=True).start()
    r = connect_retry(lambda: ExternalRetriever(HOST, port, 4, 16, k=5))

    events = []

    class EventScanner(IndexScanner):
        def search(self, queries, nprobe=None):
            events.append("scan")
            return super().search(queries, nprobe)

    class EventRetriever:
        def __init__(self, inner):
            self._r = inner

        def retrieve_with_lists_send(self, q, lids, k):
            events.append("send")
            return self._r.retrieve_with_lists_send(q, lids, k)

        def retrieve_recv(self, batch, k):
            events.append("recv")
            return self._r.retrieve_recv(batch, k)

    rng = np.random.default_rng(0)
    centroids = rng.standard_normal((32, 16)).astype(np.float32)
    scanner = EventScanner(centroids, nprobe=4)
    server = IndexServer(scanner, EventRetriever(r), k=5)
    batches = [rng.standard_normal((4, 16)).astype(np.float32)
               for _ in range(4)]
    scanner.search(batches[0])       # warm the jitted coarse scan
    events.clear()

    out = server.search_multi_batch_tiktok(batches)
    assert all(o is not None and o.ids.shape == (4, 5) for o in out)
    # expected interleave: scan0 send0 scan1 recv0 send1 scan2 recv1 ...
    n = len(batches)
    sends = [i for i, e in enumerate(events) if e == "send"]
    recvs = [i for i, e in enumerate(events) if e == "recv"]
    scans = [i for i, e in enumerate(events) if e == "scan"]
    assert len(sends) == len(recvs) == len(scans) == n
    for i in range(n - 1):
        # the overlap: batch i+1's coarse scan runs while batch i's answer
        # is still outstanding at the engine
        assert sends[i] < scans[i + 1] < recvs[i], events
    r.close()


def test_coordinator_survives_engine_death():
    """An engine dying mid-run (the reference's documented pitfall class,
    retriever_coordinator_server.py:145-150) must not strand clients: its
    unanswered requests re-issue to the surviving engine."""

    class DyingServer(RandomAnswerServer):
        """Answers one request, then drops the connection on the next."""

        def __init__(self, *args, die_after=1, **kw):
            super().__init__(*args, **kw)
            self._served = 0
            self._die_after = die_after

        def answer(self, queries, k, list_ids=None):
            if self._served >= self._die_after:
                raise ConnectionError("engine crash (injected)")
            self._served += 1
            return super().answer(queries, k, list_ids)

    e_ports = [next_port(), next_port()]
    dying = DyingServer(HOST, e_ports[0], batch_size=2, dim=8, die_after=1)
    healthy = RandomAnswerServer(HOST, e_ports[1], batch_size=2, dim=8)
    threading.Thread(target=dying.start, daemon=True).start()
    threading.Thread(target=healthy.start, daemon=True).start()
    time.sleep(0.1)

    c_port = next_port()
    coord = RetrieveCoordinator(
        HOST, c_port, n_clients=1, batch_size=2, dim=8, k=5,
        engine_addrs=[(HOST, p) for p in e_ports], queries_per_client=6)
    threading.Thread(target=coord.start, daemon=True).start()

    c = connect_retry(lambda: ExternalRetriever(HOST, c_port, 2, 8, k=5))
    c.sync_with_coordinator()
    q = np.zeros((2, 8), np.float32)
    answers = [c.retrieve(q, nprobe=4, k=5) for _ in range(6)]
    assert len(answers) == 6
    for res in answers:
        assert res.ids.shape == (2, 5)
        assert np.all(np.diff(res.dists, axis=1) >= 0)
    c.close()


def test_coordinator_survives_client_death_on_answer():
    """A client that dies with a request in flight must cost only that
    client: the answer-routing send failure is caught and the other
    client's relay keeps running (previously a BrokenPipeError here
    killed the whole coordinator)."""
    e_port = next_port()
    engine = RandomAnswerServer(HOST, e_port, batch_size=2, dim=8,
                                delay_ms=150)
    threading.Thread(target=engine.start, daemon=True).start()
    time.sleep(0.1)

    c_port = next_port()
    coord = RetrieveCoordinator(
        HOST, c_port, n_clients=2, batch_size=2, dim=8, k=5,
        engine_addrs=[(HOST, e_port)])
    ct = threading.Thread(target=coord.start, daemon=True)
    ct.start()

    doomed = connect_retry(lambda: ExternalRetriever(HOST, c_port, 2, 8, k=5))
    survivor = connect_retry(lambda: ExternalRetriever(HOST, c_port, 2, 8,
                                                       k=5))
    for c in (doomed, survivor):
        c.sync_with_coordinator()

    q = np.zeros((2, 8), np.float32)
    # the doomed client sends a request, then dies while it is in flight
    # (the engine's 150 ms delay guarantees the answer arrives after close)
    doomed.retrieve_send(q, nprobe=4, k=5)
    doomed.close()

    # the survivor must keep getting answers straight through the window
    # where the doomed client's answer bounces
    for _ in range(4):
        res = survivor.retrieve(q, nprobe=4, k=5)
        assert res.ids.shape == (2, 5)
    survivor.close()
    ct.join(timeout=10)
    assert not ct.is_alive()          # loop exited when all clients left
    assert coord.answered_query_cnt == 5   # 1 bounced + 4 delivered


def test_coordinator_rejects_k_mismatch():
    """The coordinator frames answers with its configured k; a client
    requesting a different k would desync the engine byte stream — it
    must be dropped loudly, not silently mis-framed."""
    import warnings as _w
    e_port = next_port()
    engine = RandomAnswerServer(HOST, e_port, batch_size=2, dim=8)
    threading.Thread(target=engine.start, daemon=True).start()
    time.sleep(0.1)

    c_port = next_port()
    coord = RetrieveCoordinator(
        HOST, c_port, n_clients=1, batch_size=2, dim=8, k=5,
        engine_addrs=[(HOST, e_port)])
    ct = threading.Thread(target=coord.start, daemon=True)
    ct.start()

    c = connect_retry(lambda: ExternalRetriever(HOST, c_port, 2, 8, k=7))
    c.sync_with_coordinator()
    q = np.zeros((2, 8), np.float32)
    with _w.catch_warnings():
        _w.simplefilter("ignore")     # warning fires on the coord thread
        c.retrieve_send(q, nprobe=4, k=7)
        with pytest.raises((ConnectionError, OSError)):
            c.retrieve_recv()
    c.close()
    ct.join(timeout=10)
    assert not ct.is_alive()
    assert coord.answered_query_cnt == 0
