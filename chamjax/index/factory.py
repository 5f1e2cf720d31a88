"""Index factory: train/populate split, sharded builds, merging.

Parity with the reference's offline index pipeline (SURVEY.md §3.5):
- ``bench_polysemous_1bn.py`` trains once then populates, with sharded
  variants (``--n_shards/--shard_id``) and ``merge_indexes.py`` gluing
  per-shard populated indexes into one;
- index keys like ``"OPQ16,IVF4096,PQ16"`` name the artifacts
  (``{dbname}_{index_key}_populated.index`` → here ``.npz``).

The train step (k-means + PQ [+ OPQ]) runs once on the training sample;
populate encodes any corpus slice against those quantizers, so a 100M-1B
corpus builds as N independent slice jobs merged at the end.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from chamjax.config import IndexConfig
from chamjax.index.ivf import PackedIVF, _pack_lists, INVALID_ID
from chamjax.index.kmeans import kmeans, assign, assign_balanced
from chamjax.index.pq import train_pq, pq_encode, train_opq


def parse_index_key(key: str, dim: int) -> IndexConfig:
    """Faiss-style key string → IndexConfig: ``"OPQ16,IVF4096,PQ16"`` or the
    multi-index form ``"IMI2x10,PQ16"`` (reference training sweeps,
    ``Faiss_experiments/train_cpu.py``)."""
    # token-wise: re.search(r"PQ(\d+)") over the whole key would match
    # inside the leading "OPQ32" token and silently take m from the OPQ
    # width (e.g. "OPQ32,IVF4096,PQ16" → m=32)
    parts = [p.strip() for p in key.split(",")]
    opq = any(re.fullmatch(r"OPQ\d+", p) for p in parts)
    pq = [re.fullmatch(r"PQ(\d+)", p) for p in parts]
    pq = [p for p in pq if p]
    if not pq:
        raise ValueError(f"index key {key!r} has no PQ<m> token")
    m = int(pq[0].group(1))
    imi = re.search(r"IMI2x(\d+)", key)
    if imi:
        bits = int(imi.group(1))
        return IndexConfig(dim=dim, nlist=1 << (2 * bits), m=m, opq=opq,
                           imi=bits)
    ivf = re.search(r"IVF(\d+)", key)
    if ivf is None:
        raise ValueError(
            f"index key {key!r} has no IVF<nlist>/IMI2x<b> coarse-"
            "quantizer token (flat-PQ keys are not supported)")
    return IndexConfig(dim=dim, nlist=int(ivf.group(1)), m=m, opq=opq)


@dataclass
class TrainedQuantizers:
    """The train-once artifacts: coarse + product quantizer [+ rotation]."""

    cfg: IndexConfig
    centroids: np.ndarray               # (nlist, d)
    codebooks: np.ndarray               # (m, ksub, dsub)
    opq_R: Optional[np.ndarray] = None  # (d, d) or None

    def save(self, path: str) -> None:
        import dataclasses as dc
        np.savez_compressed(
            path, centroids=self.centroids, codebooks=self.codebooks,
            opq_R=(self.opq_R if self.opq_R is not None
                   else np.zeros((0, 0), np.float32)),
            cfg=np.frombuffer(repr(dc.asdict(self.cfg)).encode(), np.uint8))

    @staticmethod
    def load(path: str) -> "TrainedQuantizers":
        import ast
        z = np.load(path, allow_pickle=False)
        cfg = IndexConfig(**ast.literal_eval(bytes(z["cfg"]).decode()))
        opq_R = z["opq_R"]
        return TrainedQuantizers(
            cfg=cfg, centroids=z["centroids"], codebooks=z["codebooks"],
            opq_R=opq_R if opq_R.size else None)


def train_quantizers(
    xt: np.ndarray,
    cfg: IndexConfig,
    seed: int = 0,
    kmeans_iters: int = 15,
    pq_iters: int = 20,
) -> TrainedQuantizers:
    """The reference's ``index.train()`` stage, standalone."""
    xt = np.ascontiguousarray(xt, np.float32)
    opq_R = None
    if cfg.opq:
        opq_R, _ = train_opq(xt, cfg.m, nbits=cfg.nbits, seed=seed)
        xt = xt @ opq_R
    if cfg.imi:
        assert cfg.nlist == 1 << (2 * cfg.imi), (cfg.nlist, cfg.imi)
        from chamjax.index.imi import imi_centroids, train_imi
        cents_a, cents_b = train_imi(xt, cfg.imi, iters=kmeans_iters,
                                     seed=seed)
        centroids = imi_centroids(cents_a, cents_b)
    else:
        centroids = kmeans(xt, cfg.nlist, iters=kmeans_iters, seed=seed)
    a = assign(xt, centroids)
    train_vecs = xt - centroids[a] if cfg.by_residual else xt
    codebooks = train_pq(train_vecs, cfg.m, nbits=cfg.nbits, iters=pq_iters,
                         seed=seed)
    return TrainedQuantizers(cfg=cfg, centroids=centroids,
                             codebooks=codebooks, opq_R=opq_R)


def populate(
    xb: np.ndarray,
    trained: TrainedQuantizers,
    id_offset: int = 0,
    tail_pad: int = 8192,
) -> PackedIVF:
    """Encode a corpus slice against trained quantizers → packed index.

    ``id_offset`` gives the slice's global id base (sharded builds:
    shard i populates rows [i·S, (i+1)·S) with offset i·S)."""
    cfg = trained.cfg
    xb = np.ascontiguousarray(xb, np.float32)
    xb_r = xb @ trained.opq_R if trained.opq_R is not None else xb
    if cfg.balanced:
        cap = int(np.ceil(xb.shape[0] / cfg.nlist * cfg.balance_factor))
        assignment = assign_balanced(xb_r, trained.centroids, cap=cap,
                                     hard=cfg.balance_hard)
    elif cfg.imi:
        # factored assignment: recover the half codebooks from the grid
        # (row i·K+j = [a_i ‖ b_j]) and take two small argmins per vector
        from chamjax.index.imi import assign_imi
        k = 1 << cfg.imi
        h = cfg.dim // 2
        assignment = assign_imi(
            xb_r, trained.centroids[::k, :h], trained.centroids[:k, h:])
    else:
        assignment = assign(xb_r, trained.centroids)
    enc = (xb_r - trained.centroids[assignment] if cfg.by_residual else xb_r)
    codes = pq_encode(enc, trained.codebooks)
    packed_codes, packed_ids, list_start, list_len = _pack_lists(
        assignment, codes, cfg.nlist, cfg.list_pad, tail_pad)
    if id_offset:
        packed_ids = np.where(packed_ids >= 0, packed_ids + id_offset,
                              packed_ids).astype(np.int32)
    return PackedIVF(cfg=cfg, centroids=trained.centroids,
                     codebooks=trained.codebooks, codes=packed_codes,
                     ids=packed_ids, list_start=list_start,
                     list_len=list_len, ntotal=int(xb.shape[0]),
                     opq_R=trained.opq_R)


def merge_indexes(parts: List[PackedIVF], tail_pad: int = 8192) -> PackedIVF:
    """Merge per-slice populated indexes sharing the same quantizers.

    The reference's ``merge_indexes.py`` over ondisk invlists: per cell,
    concatenate every part's list.  Parts must come from ``populate`` with
    disjoint ``id_offset`` ranges."""
    assert parts, "nothing to merge"
    cfg = parts[0].cfg
    for p in parts[1:]:
        assert p.cfg == cfg, "all parts must share one IndexConfig"
        np.testing.assert_array_equal(p.centroids, parts[0].centroids)
    nlist = cfg.nlist
    m = parts[0].codes.shape[1]
    list_len = np.sum([p.list_len for p in parts], axis=0).astype(np.int64)
    padded = (np.maximum(-(-list_len // cfg.list_pad), 1)
              * cfg.list_pad).astype(np.int64)
    list_start = np.zeros(nlist, np.int64)
    list_start[1:] = np.cumsum(padded)[:-1]
    n_pad = int(padded.sum()) + tail_pad
    codes = np.zeros((n_pad, m), np.uint8)
    ids = np.full((n_pad,), INVALID_ID, np.int32)
    cursor = list_start.copy()
    for p in parts:
        for l in range(nlist):
            s, ln = int(p.list_start[l]), int(p.list_len[l])
            d = int(cursor[l])
            codes[d:d + ln] = p.codes[s:s + ln]
            ids[d:d + ln] = p.ids[s:s + ln]
            cursor[l] += ln
    return PackedIVF(cfg=cfg, centroids=parts[0].centroids,
                     codebooks=parts[0].codebooks, codes=codes, ids=ids,
                     list_start=list_start.astype(np.int32),
                     list_len=list_len.astype(np.int32),
                     ntotal=int(sum(p.ntotal for p in parts)),
                     opq_R=parts[0].opq_R)
