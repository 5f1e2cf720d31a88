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

import numpy as np

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
    ap.add_argument("--train-steps", type=int, default=4000,
                    help="warmup steps (in-batch negatives only)")
    ap.add_argument("--hard-negs", type=int, default=4,
                    help="ANN-mined hard negatives per pair (0 = off, the "
                         "pre-round-5 in-batch-only recipe)")
    ap.add_argument("--mine-rounds", type=int, default=2,
                    help="mining rounds; each re-mines with the current "
                         "model and trains --hard-steps more")
    ap.add_argument("--hard-steps", type=int, default=2500)
    ap.add_argument("--hard-lr", type=float, default=1.5e-3)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--emb-dim", type=int, default=192)
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
        trained_enc = JaxDualEncoder(vocab=32768, dim=args.dim,
                                     emb_dim=args.emb_dim,
                                     max_len=args.max_len)
        # graded supervision: upweight the top grade (entity-level) 2×
        # over the full judged pool — see training_pairs(min_score=).
        # Pairs carry their query id so mined negatives stay aligned.
        def pairs_with_qid(min_score):
            out = []
            for qid, rel in tqr.items():
                if qid not in tq:
                    continue
                for did, score in rel.items():
                    keep = (score > 0 if min_score <= 0
                            else score >= min_score)
                    if keep and did in corpus:
                        out.append((qid, did))
            return out
        id_pairs = pairs_with_qid(2) * 2 + pairs_with_qid(0)
        if len(id_pairs) > 800_000:      # tokenization is the bottleneck
            import random
            random.Random(0).shuffle(id_pairs)
            id_pairs = id_pairs[:800_000]

        from chamjax.ir.models import _batch_ids, _doc_text
        doc_ids_list = list(corpus.keys())
        did2idx = {d_: i for i, d_ in enumerate(doc_ids_list)}
        pairs = [(tq[q], _doc_text(corpus[d])) for q, d in id_pairs]
        note(f"training dual encoder on {len(pairs)} pairs "
             f"(dim={args.dim}, warmup {args.train_steps} steps)")
        trained_enc.fit(pairs, steps=args.train_steps, batch=128, lr=3e-3,
                        verbose=False)
        if args.hard_negs > 0 and args.mine_rounds > 0:
            # ANN-mined hard negatives (VERDICT r4 #3): tokenize the
            # corpus ONCE, then alternate mine-with-current-model (via
            # the repo's own IVF-PQ engine) and continued training with
            # the mined pool in the InfoNCE denominator
            qid_list = sorted({q for q, _ in id_pairs})
            q_of = {q: i for i, q in enumerate(qid_list)}
            positives = [set() for _ in qid_list]
            for q, rel in tqr.items():
                if q in q_of:
                    for did, sc in rel.items():
                        if sc > 0 and did in did2idx:
                            positives[q_of[q]].add(did2idx[did])
            t0 = time.time()
            doc_tokens = _batch_ids(
                [_doc_text(corpus[d_]) for d_ in doc_ids_list],
                trained_enc.vocab, args.max_len)
            doc_tokens = (np.asarray(doc_tokens[0]),
                          np.asarray(doc_tokens[1]))
            note(f"corpus tokenized in {time.time() - t0:.1f}s")
            pair_q = np.asarray([q_of[q] for q, _ in id_pairs])
            for r in range(args.mine_rounds):
                t0 = time.time()
                neg = trained_enc.mine_hard_negatives(
                    [tq[q] for q in qid_list], doc_tokens,
                    positives=positives, n_neg=args.hard_negs,
                    depth=8 * args.hard_negs, seed=r)
                note(f"round {r}: mined {neg.shape} negatives in "
                     f"{time.time() - t0:.1f}s")
                trained_enc.fit(pairs, steps=args.hard_steps, batch=128,
                                lr=args.hard_lr, verbose=False,
                                neg_tokens=doc_tokens,
                                neg_idx=neg[pair_q])
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
