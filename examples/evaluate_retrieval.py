"""BEIR-style retrieval evaluation over a dataset directory.

Parity with the reference's example scripts
(``beir/examples/retrieval/evaluation/**`` — ``evaluate_faiss_dense.py``,
``evaluate_bm25.py``, rerank variants): load a BEIR-format dataset, run the
chosen retrieval method, print NDCG/MAP/Recall/P@k (+ MRR), optionally
rerank with the late-interaction MaxSim stage.

    python examples/evaluate_retrieval.py --data <beir_dir> --method dense
    python examples/evaluate_retrieval.py --data <beir_dir> --method ivfpq \
        --rerank
    python examples/evaluate_retrieval.py --demo --method bm25
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.ir import (                                        # noqa: E402
    BM25Search, DenseRetrievalExactSearch, DenseRetrievalIVFPQSearch,
    EvaluateRetrieval, GenericDataLoader, MaxSimReranker,
)
from chamjax.ir.dense import HashingEncoder, HFEncoder          # noqa: E402
from chamjax.ir.models import (                                 # noqa: E402
    JaxDualEncoder, JaxSparseEncoder, training_pairs,
)
from chamjax.ir.sparse import SparseSearch                      # noqa: E402


def demo_dataset():
    """Tiny synthetic topical dataset (no downloads)."""
    import numpy as np
    topics = {
        "cooking": "recipe oven bake flour sugar butter pastry dough",
        "space": "rocket orbit satellite launch astronaut planet telescope",
        "finance": "market stock bond yield portfolio dividend equity",
    }
    rng = np.random.default_rng(0)
    corpus, queries, qrels = {}, {}, {}
    for topic, vocab in topics.items():
        words = vocab.split()
        for i in range(50):
            corpus[f"{topic}-{i}"] = {
                "title": topic, "text": " ".join(rng.choice(words, 12))}
        qid = f"q-{topic}"
        queries[qid] = " ".join(rng.choice(words, 6))
        qrels[qid] = {f"{topic}-{i}": 1 for i in range(50)}
    return corpus, queries, qrels


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None, help="BEIR dataset directory")
    ap.add_argument("--split", default="test")
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--method", default="dense",
                    choices=["dense", "ivfpq", "bm25", "sparse"])
    ap.add_argument("--encoder", default="hash",
                    choices=["hash", "hf", "trained"])
    ap.add_argument("--hf_model",
                    default="sentence-transformers/all-MiniLM-L6-v2")
    ap.add_argument("--train_steps", type=int, default=300,
                    help="--encoder trained: optimizer steps")
    ap.add_argument("--rerank", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (skip TPU init — demo "
                         "corpora don't need the chip)")
    ap.add_argument("--k_values", type=int, nargs="+",
                    default=[1, 3, 5, 10, 100])
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.demo or not args.data:
        corpus, queries, qrels = demo_dataset()
    else:
        corpus, queries, qrels = GenericDataLoader(args.data).load(args.split)
    print(f"corpus={len(corpus)} queries={len(queries)}", flush=True)

    def _train_pairs():
        """(query, positive doc) pairs — from the train split when the
        dataset ships one (the reference's ``TrainRetriever`` path), else
        from the eval qrels (demo-scale smoke)."""
        if args.data:
            try:
                _c, tq, tqr = GenericDataLoader(args.data).load("train")
                return training_pairs(tq, tqr, corpus)
            except FileNotFoundError:
                print("no train split; training on eval qrels", flush=True)
        return training_pairs(queries, qrels, corpus)

    if args.method in ("dense", "ivfpq"):
        if args.encoder == "hf":
            enc = HFEncoder(args.hf_model)
        elif args.encoder == "trained":
            enc = JaxDualEncoder()
            enc.fit(_train_pairs(), steps=args.train_steps, verbose=True)
        else:
            enc = HashingEncoder(dim=256)
        retriever = (DenseRetrievalExactSearch(enc) if args.method == "dense"
                     else DenseRetrievalIVFPQSearch(enc))
    elif args.method == "bm25":
        retriever = BM25Search()
    else:
        if args.encoder == "trained":
            senc = JaxSparseEncoder()
            senc.fit(_train_pairs(), steps=args.train_steps, verbose=True)
            retriever = SparseSearch(sparse_encoder=senc)
        else:
            retriever = SparseSearch()

    ev = EvaluateRetrieval(retriever, k_values=args.k_values)
    results = ev.retrieve(corpus, queries)
    if args.rerank:
        results = MaxSimReranker(dim=128, max_tokens=32).rerank(
            corpus, queries, results, top_k=max(args.k_values))

    ndcg, _map, recall, precision = ev.evaluate(qrels, results,
                                                args.k_values)
    mrr = ev.evaluate_custom(qrels, results, args.k_values, "mrr")
    for d in (ndcg, _map, recall, precision, mrr):
        print("  " + "  ".join(f"{k}={v}" for k, v in d.items()), flush=True)


if __name__ == "__main__":
    main()
