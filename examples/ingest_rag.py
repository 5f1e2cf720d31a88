"""Document-ingestion RAG demo: load files → split → embed → store → query.

Parity with the reference's URL/YouTube embedding demo
(``reranker_hf/yt_embeddings_langchain.py``): that notebook downloads a
text document from a URL (and, in its second half, loads multiple PDF
files), splits it, embeds the chunks with a HuggingFace encoder, builds a
FAISS store, and answers similarity-search queries.  This environment has
no network egress, so the *ingestion source* is local files — everything
downstream (split → embed → vector store → query → save/load) is the same
pipeline on chamjax components:

- ``RecursiveTextSplitter`` ↔ LangChain's ``CharacterTextSplitter``
- ``HashingEncoder`` / ``HFEncoder`` ↔ ``HuggingFaceEmbeddings``
- ``VectorStore`` (exact or IVF-PQ backend) ↔ LangChain ``FAISS``

Usage:
    python examples/ingest_rag.py --files README.md RESULTS.md \
        --question "how fast is the 100M search"
    python examples/ingest_rag.py            # built-in demo document
"""

from __future__ import annotations

import argparse
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.ir.dense import HashingEncoder                    # noqa: E402
from chamjax.rag import RecursiveTextSplitter, VectorStore     # noqa: E402


def load_files(paths) -> list:
    """Local-file stand-in for the reference's URL/PDF loaders: one
    document per file, title = basename."""
    docs = []
    for p in paths:
        with open(p, errors="replace") as f:
            docs.append({"title": os.path.basename(p), "text": f.read()})
    return docs


def wrap(text: str, width: int = 96) -> str:
    return "\n".join(textwrap.fill(ln, width=width)
                     for ln in text.split("\n"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", nargs="+", default=None,
                    help="local files to ingest (URL/PDF stand-in)")
    ap.add_argument("--question", nargs="+",
                    default=["what is the headline search throughput"])
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--chunk-size", type=int, default=1000)
    ap.add_argument("--backend", default="exact", choices=["exact", "ivfpq"])
    ap.add_argument("--encoder-dim", type=int, default=256)
    ap.add_argument("--save", default=None,
                    help="save the store for later reuse (npz path)")
    args = ap.parse_args()

    if args.files:
        docs = load_files(args.files)
    else:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        docs = load_files([os.path.join(root, "README.md")])
    print(f"loaded {len(docs)} document(s), "
          f"{sum(len(d['text']) for d in docs)} chars", flush=True)

    chunks = RecursiveTextSplitter(
        chunk_size=args.chunk_size, chunk_overlap=0).split_documents(docs)
    print(f"split into {len(chunks)} chunks", flush=True)

    enc = HashingEncoder(dim=args.encoder_dim)
    store = VectorStore.from_documents(chunks, enc, backend=args.backend)
    if args.save:
        store.save(args.save)
        print(f"store saved to {args.save}", flush=True)

    for q in args.question:
        hits = store.similarity_search(q, k=args.k)
        print(f"\nQ: {q}")
        for rank, (doc, score) in enumerate(hits):
            head = wrap(doc["text"][:240])
            print(f"  [{rank}] {doc.get('title')} (score {score:.3f})\n"
                  f"{textwrap.indent(head, '      ')}")


if __name__ == "__main__":
    main()
