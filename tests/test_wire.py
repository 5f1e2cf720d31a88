"""Wire-format round-trip tests — parity with the reference's only
always-green test (``tests/test_retriever.py:15 test_serialization_utils``)."""

import numpy as np

from chamjax.retrieval import wire


def test_plain_request_roundtrip(rng):
    q = rng.standard_normal((8, 128)).astype(np.float32)
    buf = wire.encode_request(q, k=100)
    assert len(buf) == wire.request_nbytes(8, 128)
    q2, k = wire.decode_request(buf, batch=8, dim=128)
    assert k == 100
    np.testing.assert_array_equal(q, q2)


def test_request_with_lists_roundtrip(rng):
    q = rng.standard_normal((4, 96)).astype(np.float32)
    lids = rng.integers(0, 32768, size=(4, 32)).astype(np.int64)
    buf = wire.encode_request_with_lists(q, lids, k=10)
    assert len(buf) == wire.request_with_lists_nbytes(4, 96, 32)
    q2, lids2, k = wire.decode_request_with_lists(buf)
    assert k == 10
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(lids, lids2)


def test_answer_roundtrip(rng):
    ids = rng.integers(0, 10**9, size=(8, 100)).astype(np.int64)
    dists = rng.random((8, 100)).astype(np.float32)
    buf = wire.encode_answer(ids, dists)
    assert len(buf) == wire.answer_nbytes(8, 100)
    ids2, dists2 = wire.decode_answer(buf, batch=8, k=100)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_array_equal(dists, dists2)
