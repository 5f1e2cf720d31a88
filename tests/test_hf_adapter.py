"""HF-adapter RALM loop test on a locally-constructed (no-download) GPT-2."""

import numpy as np
import pytest

pytest.importorskip("transformers")
pytest.importorskip("torch")

from chamjax.retrieval.interface import DummyRetriever
from chamjax.serving.hf_adapter import RalmHFDecoder, tiny_hf_model


def test_ralm_hf_decoder_steps():
    model = tiny_hf_model(hidden=32, layers=2, heads=2, vocab=128)
    loop = RalmHFDecoder(model, DummyRetriever(default_k=5), batch_size=3,
                         retrieval_interval=2, k=5)
    loop.batch_inference(5)
    assert loop.step_count == 5
    # KV cache grew to 5 steps
    assert loop.past is not None
    # retrieval fired on steps 0, 2, 4
    prof = loop.get_profiling()
    assert (prof["time_retriever"] > 0).sum() == 3
    assert loop.last_result.ids.shape == (3, 5)
    stats = loop.prof.stats(batch_size=3)
    assert stats["steps"] == 5 and stats["throughput_tokens_per_sec"] > 0

    # reset clears state
    loop.reset_inference_state()
    assert loop.step_count == 0 and loop.past is None


def test_query_vector_pads_narrow_hidden():
    """A model narrower than the index dim must produce a zero-padded
    query of the full width (previously the truncate-only branch passed a
    wrong-width query through to an opaque matmul/wire failure)."""
    model = tiny_hf_model(hidden=32, layers=1, heads=2, vocab=64)

    class ShapeCheckRetriever(DummyRetriever):
        def retrieve(self, queries, nprobe, k):
            assert queries.shape[1] == 48, queries.shape
            np.testing.assert_array_equal(queries[:, 32:], 0.0)
            return super().retrieve(queries, nprobe, k)

    loop = RalmHFDecoder(model, ShapeCheckRetriever(default_k=5),
                         batch_size=2, retrieval_interval=1, k=5,
                         query_dim=48)
    loop.batch_inference(2)
    assert loop.last_result.ids.shape == (2, 5)
