"""Sparse retrieval: learned term-weight search (SPARTA-style).

Parity with the reference's sparse search
(``beir/beir/retrieval/search/sparse/sparse_search.py`` — SPARTA: documents
encode to sparse term→weight vectors, queries score by summing their
tokens' weights).  The engine here is a term→(doc, weight) inverted index
scored with numpy, duck-typed over any ``sparse_encoder``:

- ``encode_corpus(docs) -> list[dict[token, weight]]``
- ``encode_query(text) -> list[token]`` (query tokens; weights are looked
  up from the document side, as in SPARTA)

The default ``TfidfSparseEncoder`` makes the stage hermetic; plug a learned
encoder (SPLADE/UniCOIL-style) through the same contract.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List

import numpy as np

from chamjax.ir.lexical import tokenize


class TfidfSparseEncoder:
    """Hermetic sparse encoder: tf·idf document term weights."""

    def fit(self, texts: List[str]) -> None:
        df: Counter = Counter()
        for t in texts:
            df.update(set(tokenize(t)))
        self.n = len(texts)
        self.df = df

    def encode_corpus(self, docs) -> List[Dict[str, float]]:
        texts = [(d.get("title", "") + " " + d.get("text", "")).strip()
                 if isinstance(d, dict) else str(d) for d in docs]
        if not hasattr(self, "df"):
            self.fit(texts)
        out = []
        for t in texts:
            tf = Counter(tokenize(t))
            out.append({
                tok: (1 + math.log(c)) * math.log(
                    1 + self.n / (self.df.get(tok, 1)))
                for tok, c in tf.items()})
        return out

    def encode_query(self, text: str) -> List[str]:
        return tokenize(text)


class SparseSearch:
    """Term-weight retrieval over an inverted index (reference
    ``SparseSearch``)."""

    def __init__(self, sparse_encoder=None, batch_size: int = 128):
        self.encoder = sparse_encoder or TfidfSparseEncoder()
        self.batch_size = batch_size
        self._built = False

    def _build(self, corpus: Dict[str, Dict[str, str]]) -> None:
        self.dids = list(corpus.keys())
        weights = self.encoder.encode_corpus(
            [corpus[d] for d in self.dids])
        postings: Dict[str, Dict[int, float]] = {}
        for i, w in enumerate(weights):
            for tok, val in w.items():
                postings.setdefault(tok, {})[i] = float(val)
        self.postings = {
            t: (np.fromiter(p.keys(), np.int64, len(p)),
                np.fromiter(p.values(), np.float64, len(p)))
            for t, p in postings.items()}
        self._built = True

    def search(self, corpus, queries: Dict[str, str], top_k: int,
               score_function: str = "dot", **kwargs
               ) -> Dict[str, Dict[str, float]]:
        if not self._built:
            self._build(corpus)
        n = len(self.dids)
        results: Dict[str, Dict[str, float]] = {}
        for qid, qtext in queries.items():
            scores = np.zeros(n, np.float64)
            for tok in self.encoder.encode_query(qtext):
                post = self.postings.get(tok)
                if post is not None:
                    idx, w = post
                    scores[idx] += w
            k = min(top_k, n)
            top = np.argpartition(-scores, k - 1)[:k]
            top = top[np.argsort(-scores[top], kind="stable")]
            results[qid] = {self.dids[int(i)]: float(scores[int(i)])
                            for i in top if scores[int(i)] > 0
                            and self.dids[int(i)] != qid}
        return results
