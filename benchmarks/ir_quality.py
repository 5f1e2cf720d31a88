#!/usr/bin/env python
"""IR-quality matrix over the hermetic BEIR-shaped corpus.

The reference's quality story is BEIR evaluation on real datasets
(``beir/beir/retrieval/evaluation.py:9-67``); with zero egress this
driver ships its own MS-MARCO-shaped corpus (``chamjax/ir/synth.py``:
topics→entities→concepts, synonym surface forms, graded qrels) and runs
the full ``ir/`` method matrix against it:

    BM25 · dense-hash exact · dense-trained exact · IVFPQ over trained
    embeddings · SPLADE-style learned sparse · MaxSim rerank on the best
    dense candidates

printing NDCG@10 / MAP@100 / R@100 per method.  The corpus's vocabulary
mismatch (queries share *concepts* with relevant docs, only
probabilistically *tokens*) is what lets trained dense beat lexical —
the BEIR phenomenology — rather than fixture construction.

CPU-friendly (no TPU needed): python benchmarks/ir_quality.py
Small smoke:                    python benchmarks/ir_quality.py --n-docs 5000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.time()


def note(msg):
    print(f"[irq +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--n-queries", type=int, default=300)
    ap.add_argument("--n-train", type=int, default=1500)
    ap.add_argument("--train-steps", type=int, default=4000)
    ap.add_argument("--max-len", type=int, default=48,
                    help="encoder token window (docs are ~50 tokens)")
    ap.add_argument("--data-dir", default="data/beir_synth")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--methods", nargs="+",
                    default=["bm25", "dense_hash", "dense_trained",
                             "ivfpq_trained", "sparse", "rerank"])
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--tpu", dest="cpu", action="store_false")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/chamjax_jax_cache")

    from chamjax.ir import (
        BM25Search, DenseRetrievalExactSearch, DenseRetrievalIVFPQSearch,
        EvaluateRetrieval, GenericDataLoader, MaxSimReranker,
    )
    from chamjax.ir.dense import HashingEncoder
    from chamjax.ir.models import (DualEncoderTokenAdapter, JaxDualEncoder,
                                   training_pairs)
    from chamjax.ir.sparse import SparseSearch
    from chamjax.ir.synth import write_beir_dataset

    path = write_beir_dataset(
        args.data_dir, n_docs=args.n_docs, seed=args.seed,
        n_queries=args.n_queries, n_train_queries=args.n_train)
    corpus, queries, qrels = GenericDataLoader(path).load("test")
    _c, tq, tqr = GenericDataLoader(path).load("train")
    note(f"corpus={len(corpus)} queries={len(queries)} train={len(tq)}")

    k_values = [10, 100]
    results_by_method = {}
    table = []
    trained_enc = None

    def run(name, retriever, rerank_of=None):
        nonlocal table
        t0 = time.time()
        ev = EvaluateRetrieval(retriever, k_values=k_values)
        if rerank_of is not None:
            base = results_by_method[rerank_of]
            res = retriever.rerank(corpus, queries, base, top_k=100)
        else:
            res = ev.retrieve(corpus, queries)
        results_by_method[name] = res
        ev0 = EvaluateRetrieval(None, k_values=k_values)
        ndcg, _map, recall, _prec = ev0.evaluate(qrels, res, k_values)
        row = {"method": name,
               "NDCG@10": ndcg.get("NDCG@10"),
               "MAP@100": _map.get("MAP@100"),
               "Recall@100": recall.get("Recall@100"),
               "seconds": round(time.time() - t0, 1)}
        table.append(row)
        print(json.dumps(row), flush=True)

    if "bm25" in args.methods:
        run("bm25", BM25Search())
    if "dense_hash" in args.methods:
        run("dense_hash", DenseRetrievalExactSearch(HashingEncoder(dim=256)))
    if ("dense_trained" in args.methods or "ivfpq_trained" in args.methods
            or "rerank" in args.methods):
        trained_enc = JaxDualEncoder(vocab=32768, dim=192, emb_dim=128,
                                     max_len=args.max_len)
        # graded supervision: upweight the top grade (entity-level) 2×
        # over the full judged pool — see training_pairs(min_score=)
        pairs = (training_pairs(tq, tqr, corpus, min_score=2) * 2
                 + training_pairs(tq, tqr, corpus))
        if len(pairs) > 800_000:      # tokenization is the bottleneck
            import random
            random.Random(0).shuffle(pairs)
            pairs = pairs[:800_000]
        note(f"training dual encoder on {len(pairs)} pairs")
        trained_enc.fit(pairs, steps=args.train_steps, batch=128, lr=3e-3,
                        verbose=False)
    if "dense_trained" in args.methods:
        run("dense_trained", DenseRetrievalExactSearch(trained_enc))
    if "ivfpq_trained" in args.methods:
        run("ivfpq_trained", DenseRetrievalIVFPQSearch(trained_enc))
    if "sparse" in args.methods:
        run("sparse", SparseSearch())
    if "rerank" in args.methods:
        base = ("dense_trained" if "dense_trained" in results_by_method
                else "dense_hash")
        if base not in results_by_method:
            run("dense_hash",
                DenseRetrievalExactSearch(HashingEncoder(dim=256)))
            base = "dense_hash"
        # late interaction over the TRAINED token space (ColBERT-style):
        # MaxSim on the dual encoder's learned embedding table
        run(f"rerank({base})",
            MaxSimReranker(
                token_encoder=DualEncoderTokenAdapter(trained_enc)),
            rerank_of=base)

    print(json.dumps({"table": table}), flush=True)
    by = {r["method"]: r["NDCG@10"] for r in table}
    note(f"NDCG@10 ordering: "
         + " | ".join(f"{m}={v:.4f}" for m, v in
                      sorted(by.items(), key=lambda kv: -kv[1])))


if __name__ == "__main__":
    main()
