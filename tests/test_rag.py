"""RAG pipeline tests: splitter, vector store (exact + ANN), end-to-end
answer_with_rag with stage profiling."""

import numpy as np

from chamjax.ir.dense import HashingEncoder
from chamjax.ir.rerank import MaxSimReranker
from chamjax.rag import AdvancedRAG, RecursiveTextSplitter, VectorStore
from chamjax.rag.pipeline import EchoReader, JaxDecoderReader


def test_splitter_chunks_and_overlap():
    text = ("para one about cooking.\n\n" + "word " * 100 +
            "\n\npara two about space rockets.\n\n" + "tail " * 50)
    sp = RecursiveTextSplitter(chunk_size=120, chunk_overlap=20)
    chunks = sp.split_text(text)
    assert len(chunks) >= 3
    assert all(len(c) <= 120 + 20 for c in chunks)
    # every non-separator character is retained in order
    joined = "".join(chunks)
    for probe in ("para one", "para two", "tail"):
        assert probe in joined


def test_splitter_dedupes_documents():
    docs = [{"text": "same chunk body", "src": "a"},
            {"text": "same chunk body", "src": "b"},
            {"text": "different body", "src": "c"}]
    out = RecursiveTextSplitter(chunk_size=100).split_documents(docs)
    assert len(out) == 2
    assert {d["src"] for d in out} == {"a", "c"}


def _toy_docs():
    topics = {
        "cooking": "recipe oven bake flour sugar butter pastry",
        "space": "rocket orbit satellite launch astronaut planet",
        "finance": "market stock bond yield portfolio dividend",
    }
    rng = np.random.default_rng(0)
    docs = []
    for topic, vocab in topics.items():
        words = vocab.split()
        for i in range(40):
            docs.append({"title": topic,
                         "text": " ".join(rng.choice(words, size=10))})
    return docs


def test_vector_store_exact_and_save_load(tmp_path):
    docs = _toy_docs()
    enc = HashingEncoder(dim=64)
    store = VectorStore.from_documents(docs, enc)
    hits = store.similarity_search("rocket orbit astronaut", k=5)
    assert len(hits) == 5
    assert all(d["title"] == "space" for d, _ in hits)
    scores = [s for _, s in hits]
    assert scores == sorted(scores, reverse=True)

    store.save(str(tmp_path / "vs"))
    store2 = VectorStore.load(str(tmp_path / "vs"), enc)
    hits2 = store2.similarity_search("rocket orbit astronaut", k=5)
    assert [d["text"] for d, _ in hits] == [d["text"] for d, _ in hits2]


def test_vector_store_ivfpq_backend():
    from chamjax.config import IndexConfig
    docs = _toy_docs()
    enc = HashingEncoder(dim=64)
    store = VectorStore.from_documents(
        docs, enc, backend="ivfpq",
        index_cfg=IndexConfig(dim=64, nlist=8, m=8, list_pad=64), nprobe=8)
    hits = store.similarity_search("flour sugar pastry oven", k=5)
    assert len(hits) == 5
    assert sum(d["title"] == "cooking" for d, _ in hits) >= 4


def test_advanced_rag_end_to_end():
    docs = _toy_docs()
    enc = HashingEncoder(dim=64)
    store = VectorStore.from_documents(docs, enc)
    rag = AdvancedRAG(store, EchoReader(),
                      reranker=MaxSimReranker(dim=32, max_tokens=12),
                      n_retrieved=10, n_final=3)
    answer, ctx = rag.answer("how do I bake pastry with flour and butter")
    assert len(ctx) == 3
    assert all(d["title"] == "cooking" for d in ctx)
    assert answer  # echo reader returns a context line
    stats = rag.timer.stats_ms()
    assert {"retrieval", "rerank", "prompt_build", "generate"} <= set(stats)


def test_jax_decoder_reader_generates():
    r = JaxDecoderReader(max_new_tokens=4)
    out = r.generate("what is a rocket?")
    assert len(out.split()) == 4
    # deterministic for the same prompt
    assert out == r.generate("what is a rocket?")
