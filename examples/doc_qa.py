"""Document QA demo: load a text file / URL / PDF folder, embed, retrieve,
answer.

Parity with the reference's URL + PDF LangChain demo
(``reranker_hf/yt_embeddings_langchain.py``): download or read documents,
chunk with a ``CharacterTextSplitter(chunk_size=1000, chunk_overlap=0)``,
embed into a vector store, then run a stuff-style QA chain (retrieved
chunks packed into the prompt, reader generates) — all hermetic chamjax
components, no LangChain/HF-hub dependency.

    python examples/doc_qa.py --path mydoc.txt  --question "..."
    python examples/doc_qa.py --url file:///path/to/doc.txt
    python examples/doc_qa.py --pdf-dir reports/ --question "..."
"""

from __future__ import annotations

import argparse
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.ir.dense import HashingEncoder                   # noqa: E402
from chamjax.rag import (                                     # noqa: E402
    AdvancedRAG, CharacterTextSplitter, DirectoryLoader, TextLoader,
    URLLoader, VectorStore,
)
from chamjax.rag.pipeline import EchoReader                   # noqa: E402


def wrap_preserve_newlines(text: str, width: int = 110) -> str:
    """The reference demo's pretty-printer (yt_embeddings_langchain.py)."""
    return "\n".join(textwrap.fill(line, width=width)
                     for line in text.split("\n"))


SAMPLE = """chamjax quick facts.

The search core packs inverted lists CSR-style and scans them with a
segmented Pallas kernel; distances come from per-query ADC lookup tables
built on the MXU.

The serving tier speaks a binary wire format shared between the Python
and C++ data planes, with a coordinator that round-robins batches across
retrieval engines.

The index factory trains IVF and OPQ+PQ keys on device and can shard a
billion-vector corpus across a mesh axis.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", help="text file to index")
    ap.add_argument("--url", help="URL to fetch (file:// works offline)")
    ap.add_argument("--pdf-dir", help="folder of PDFs to index")
    ap.add_argument("--question", default="How are inverted lists scanned?")
    ap.add_argument("--chunk-size", type=int, default=1000)
    ap.add_argument("--k", type=int, default=4)
    args = ap.parse_args()

    if args.url:
        docs = URLLoader(args.url).load()
    elif args.pdf_dir:
        docs = DirectoryLoader(args.pdf_dir, "*.pdf").load()
    elif args.path:
        docs = TextLoader(args.path).load()
    else:
        docs = [{"text": SAMPLE, "source": "<builtin sample>"}]
    print(f"loaded {len(docs)} document(s) from "
          f"{', '.join(d['source'] for d in docs)}")

    splitter = CharacterTextSplitter(chunk_size=args.chunk_size,
                                     chunk_overlap=0)
    chunks = splitter.split_documents(docs)
    print(f"split into {len(chunks)} chunks")

    store = VectorStore.from_documents(chunks, HashingEncoder(dim=256))
    rag = AdvancedRAG(store, EchoReader(), reranker=None,
                      n_retrieved=args.k, n_final=args.k)
    answer, context = rag.answer(args.question)

    print(f"\nQ: {args.question}")
    print(f"A: {wrap_preserve_newlines(answer)}")
    print("\ntop context chunk:")
    print(wrap_preserve_newlines(context[0]["text"] if context else "<none>"))
    rag.timer.print_stats()


if __name__ == "__main__":
    main()
