"""Hermetic BEIR-shaped corpus generator (ir/synth.py): format, grading,
vocabulary mismatch, and determinism."""

import numpy as np
import pytest

from chamjax.ir.dataloader import GenericDataLoader
from chamjax.ir.synth import generate_beir_corpus, write_beir_dataset


@pytest.fixture(scope="module")
def small():
    return generate_beir_corpus(n_docs=1200, n_queries=20,
                                n_train_queries=40, n_topics=40,
                                seed=1)


def test_synth_shapes_and_grades(small):
    corpus, queries, qrels, tq, tqr = small
    assert len(corpus) == 1200
    assert len(queries) == 20 and len(tq) == 40
    grades = {s for rel in qrels.values() for s in rel.values()}
    assert grades == {1, 2}, grades
    # every query has at least one top-grade (entity) doc
    assert all(any(s == 2 for s in rel.values()) for rel in qrels.values())


def test_synth_vocabulary_mismatch(small):
    """Queries and their grade-2 docs must share only a minority of
    tokens (the lexical-gap construction) while still sharing some
    (cross_rate > 0)."""
    corpus, queries, qrels, *_ = small
    overlaps = []
    for qid, q in queries.items():
        qtok = set(q.split())
        rel2 = [d for d, s in qrels[qid].items() if s == 2]
        dtok = set()
        for did in rel2[:5]:
            dtok |= set((corpus[did]["title"] + " "
                         + corpus[did]["text"]).split())
        overlaps.append(len(qtok & dtok) / len(qtok))
    mean = float(np.mean(overlaps))
    assert 0.02 < mean < 0.7, mean


def test_synth_deterministic(small):
    again = generate_beir_corpus(n_docs=1200, n_queries=20,
                                 n_train_queries=40, n_topics=40, seed=1)
    corpus, queries, *_ = small
    assert again[0] == corpus
    assert again[1] == queries


def test_synth_roundtrip_via_loader(tmp_path):
    path = write_beir_dataset(str(tmp_path / "ds"), n_docs=300,
                              n_queries=8, n_train_queries=10,
                              n_topics=10, seed=2)
    corpus, queries, qrels = GenericDataLoader(path).load("test")
    _c, tq, tqr = GenericDataLoader(path).load("train")
    assert len(corpus) == 300 and len(queries) == 8 and len(tq) == 10
    assert all(isinstance(s, int) for rel in qrels.values()
               for s in rel.values())
    # idempotent regeneration (marker file)
    assert write_beir_dataset(str(tmp_path / "ds"), n_docs=300,
                              n_queries=8, n_train_queries=10,
                              n_topics=10, seed=2) == path
