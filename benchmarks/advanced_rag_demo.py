"""Advanced-RAG demo & profiling driver.

Parity with the reference's profiled demo (``reranker_hf/advanced_rag.py``):
build a chunked vector store from a document corpus, answer questions with
retrieve(1000→rerank→5)→generate, and print per-stage latency stats.  The
corpus is synthesized unless ``--corpus`` points at a jsonl of
``{"title", "text"}`` docs; readers: ``echo`` (hermetic), ``jax`` (chamjax
decoder, perf-parity), ``hf`` (HuggingFace pipeline, needs weights).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.ir.dense import HashingEncoder                    # noqa: E402
from chamjax.ir.rerank import MaxSimReranker                   # noqa: E402
from chamjax.rag import (                                       # noqa: E402
    AdvancedRAG, RecursiveTextSplitter, VectorStore,
)
from chamjax.rag.pipeline import EchoReader, JaxDecoderReader  # noqa: E402


def synth_corpus(n_docs: int = 200, seed: int = 0):
    topics = {
        "cooking": "recipe oven bake flour sugar butter pastry dough",
        "space": "rocket orbit satellite launch astronaut planet telescope",
        "finance": "market stock bond yield portfolio dividend equity",
        "biology": "cell protein enzyme gene dna membrane organism",
    }
    rng = np.random.default_rng(seed)
    docs = []
    for topic, vocab in topics.items():
        words = vocab.split()
        for _ in range(n_docs // len(topics)):
            body = " ".join(rng.choice(words, size=200))
            docs.append({"title": topic, "text": body})
    return docs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None, help="jsonl of {title,text}")
    ap.add_argument("--chunk_size", type=int, default=512)
    ap.add_argument("--n_retrieved", type=int, default=30)
    ap.add_argument("--n_final", type=int, default=5)
    ap.add_argument("--reader", default="echo", choices=["echo", "jax", "hf"])
    ap.add_argument("--backend", default="exact", choices=["exact", "ivfpq"])
    ap.add_argument("--questions", nargs="+", default=[
        "how do I bake pastry dough in the oven",
        "how does a rocket reach orbit",
        "what drives bond yields in a portfolio",
    ])
    args = ap.parse_args()

    if args.corpus:
        with open(args.corpus) as f:
            raw_docs = [json.loads(line) for line in f]
    else:
        raw_docs = synth_corpus()

    splitter = RecursiveTextSplitter(chunk_size=args.chunk_size)
    chunks = splitter.split_documents(raw_docs)
    print(f"{len(raw_docs)} docs -> {len(chunks)} chunks", flush=True)

    enc = HashingEncoder(dim=256)
    store = VectorStore.from_documents(chunks, enc, backend=args.backend)
    reader = {"echo": EchoReader, "jax": JaxDecoderReader}.get(args.reader)
    if reader is None:
        from transformers import pipeline   # gated heavyweight path

        class HFReader:
            def __init__(self):
                self.pipe = pipeline("text-generation",
                                     model="HuggingFaceH4/zephyr-7b-beta")

            def generate(self, prompt, max_new_tokens=128):
                return self.pipe(prompt, max_new_tokens=max_new_tokens
                                 )[0]["generated_text"]
        reader = HFReader
    rag = AdvancedRAG(store, reader(),
                      reranker=MaxSimReranker(dim=128, max_tokens=32),
                      n_retrieved=args.n_retrieved, n_final=args.n_final)

    for q in args.questions:
        answer, ctx = rag.answer(q)
        print(f"\nQ: {q}\nA: {answer[:200]}\n"
              f"   context topics: {[d.get('title') for d in ctx]}",
              flush=True)
    print("\nstage latency:", flush=True)
    rag.timer.print_stats()


if __name__ == "__main__":
    main()
