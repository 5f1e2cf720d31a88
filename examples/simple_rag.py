"""Simple RAG demo: retrieve → prompt → generate (no rerank stage).

Parity with the reference's basic pipeline
(``reranker_hf/rag_zephyr_langchain.py`` — GitHub-issues RAG with a
LangChain FAISS store + Zephyr reader): the minimal two-stage loop on the
chamjax vector store, with the same pluggable reader contract as the
advanced demo.

    python examples/simple_rag.py --question "how do rockets reach orbit"
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.ir.dense import HashingEncoder                    # noqa: E402
from chamjax.rag import RecursiveTextSplitter, VectorStore     # noqa: E402
from chamjax.rag.pipeline import (                             # noqa: E402
    EchoReader, JaxDecoderReader, PROMPT_TEMPLATE, StageTimer,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None, help="jsonl of {title,text}")
    ap.add_argument("--question", nargs="+",
                    default=["how does a rocket reach orbit"])
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--reader", default="echo", choices=["echo", "jax"])
    args = ap.parse_args()

    if args.corpus:
        with open(args.corpus) as f:
            docs = [json.loads(line) for line in f]
    else:
        from benchmarks.advanced_rag_demo import synth_corpus
        docs = synth_corpus()
    chunks = RecursiveTextSplitter(chunk_size=512).split_documents(docs)
    store = VectorStore.from_documents(chunks, HashingEncoder(dim=256))
    reader = EchoReader() if args.reader == "echo" else JaxDecoderReader()
    timer = StageTimer()

    for q in args.question:
        with timer.span("retrieval"):
            hits = store.similarity_search(q, k=args.k)
        context = "\n".join(f"Document {i}:::\n{d['text'][:300]}"
                            for i, (d, _s) in enumerate(hits))
        prompt = PROMPT_TEMPLATE.format(context=context, question=q)
        with timer.span("generate"):
            answer = reader.generate(prompt)
        print(f"\nQ: {q}\nA: {answer[:200]}\n"
              f"   sources: {[d.get('title') for d, _ in hits]}", flush=True)
    timer.print_stats()


if __name__ == "__main__":
    main()
