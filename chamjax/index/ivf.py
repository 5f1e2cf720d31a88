"""Packed IVF-PQ index: build, padded device layout, save/load.

The device layout is the TPU analogue of the reference's FPGA memory image
(``Faiss_experiments/my_faiss_extract_scripts/extract_Enzian_U250_required_data.py:296-565``):
inverted lists are concatenated into one contiguous, padded code array with a
per-list (start, len) table — there it is split across 4 DDR banks with
64-byte-entry padding; here it is one HBM array padded to ``list_pad``-row
multiples (so XLA slices and Pallas tiles stay aligned) and shardable along
the row axis of a device mesh.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import sys

import numpy as np

from chamjax.config import IndexConfig
from chamjax.index.kmeans import (
    kmeans, assign as kmeans_assign, assign_balanced,
)
from chamjax.index.pq import train_pq, pq_encode, train_opq

INVALID_ID = np.int32(-1)


@dataclass
class PackedIVF:
    """A populated IVF-PQ index in packed (padded CSR) layout.

    Arrays are host numpy; the search path moves them to device (or shards
    them over a mesh) once and keeps them resident.
    """

    cfg: IndexConfig
    centroids: np.ndarray     # (nlist, d)   float32 — coarse quantizer
    codebooks: np.ndarray     # (m, ksub, dsub) float32 — product quantizer
    codes: np.ndarray         # (n_pad, m)   uint8   — grouped by list, padded
    ids: np.ndarray           # (n_pad,)     int32   — INVALID_ID on padding
    list_start: np.ndarray    # (nlist,)     int32   — row offset per list
    list_len: np.ndarray      # (nlist,)     int32   — true rows per list
    ntotal: int
    opq_R: Optional[np.ndarray] = None  # (d, d) float32 — rotation, or None

    # -- stats / sizing ----------------------------------------------------

    @property
    def n_pad(self) -> int:
        return self.codes.shape[0]

    def suggest_scan_len(self, nprobe: int, quantile: float = 1.0) -> int:
        """Static per-probe scan length covering ``quantile`` of lists,
        rounded up to a ``list_pad`` multiple.  The static-shape stand-in for
        the reference's per-cell iteration counts (``DRAM_utils.hpp:45-102``)."""
        q = float(np.quantile(self.list_len, quantile))
        pad = self.cfg.list_pad
        return max(pad, int(-(-q // pad) * pad))

    def memory_bytes(self) -> int:
        return (
            self.codes.nbytes
            + self.ids.nbytes
            + self.centroids.nbytes
            + self.codebooks.nbytes
            + self.list_start.nbytes
            + self.list_len.nbytes
        )

    # -- persistence (the reference's checkpoint unit is the populated
    #    index file, ``faiss_retriever.py:85-94``) --------------------------

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            centroids=self.centroids,
            codebooks=self.codebooks,
            codes=self.codes,
            ids=self.ids,
            list_start=self.list_start,
            list_len=self.list_len,
            ntotal=np.int64(self.ntotal),
            opq_R=self.opq_R if self.opq_R is not None else np.zeros((0, 0), np.float32),
            cfg=np.frombuffer(repr(dataclasses.asdict(self.cfg)).encode(), dtype=np.uint8),
        )

    @staticmethod
    def load(path: str) -> "PackedIVF":
        import ast

        z = np.load(path, allow_pickle=False)
        cfg = IndexConfig(**ast.literal_eval(bytes(z["cfg"]).decode()))
        opq_R = z["opq_R"]
        return PackedIVF(
            cfg=cfg,
            centroids=z["centroids"],
            codebooks=z["codebooks"],
            codes=z["codes"],
            ids=z["ids"],
            list_start=z["list_start"],
            list_len=z["list_len"],
            ntotal=int(z["ntotal"]),
            opq_R=opq_R if opq_R.size else None,
        )


def _pack_lists(
    assignment: np.ndarray,
    codes: np.ndarray,
    nlist: int,
    list_pad: int,
    tail_pad: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Group codes by list with per-list padding to ``list_pad`` multiples.

    Returns (packed_codes, packed_ids, list_start, list_len).  Padding rows
    carry id = INVALID_ID and code 0; ``tail_pad`` extra rows guarantee any
    fixed-length scan window starting inside a list stays in bounds.
    """
    n, m = codes.shape
    order = np.argsort(assignment, kind="stable")
    sorted_codes = codes[order]
    sorted_ids = order.astype(np.int32)
    list_len = np.bincount(assignment, minlength=nlist).astype(np.int32)
    padded_len = ((list_len + list_pad - 1) // list_pad) * list_pad
    padded_len = np.maximum(padded_len, list_pad)
    list_start = np.zeros(nlist, np.int32)
    list_start[1:] = np.cumsum(padded_len)[:-1]
    n_pad = int(padded_len.sum()) + tail_pad

    packed_codes = np.zeros((n_pad, m), np.uint8)
    packed_ids = np.full((n_pad,), INVALID_ID, np.int32)
    src_start = np.zeros(nlist, np.int64)
    src_start[1:] = np.cumsum(list_len.astype(np.int64))[:-1]
    for l in range(nlist):
        s, ln = int(src_start[l]), int(list_len[l])
        ds = int(list_start[l])
        packed_codes[ds : ds + ln] = sorted_codes[s : s + ln]
        packed_ids[ds : ds + ln] = sorted_ids[s : s + ln]
    return packed_codes, packed_ids, list_start, list_len


def _opq_subsample_idx(n: int, seed: int, cap: int = 1 << 17) -> np.ndarray:
    """Uniform OPQ-training row subsample (sorted, for gather locality);
    identity when the training set already fits the cap."""
    if n <= cap:
        return np.arange(n)
    rng = np.random.default_rng(seed)
    return np.sort(rng.choice(n, size=cap, replace=False))


def build_ivfpq(
    xb: np.ndarray,
    cfg: IndexConfig,
    xt: Optional[np.ndarray] = None,
    seed: int = 0,
    kmeans_iters: int = 15,
    pq_iters: int = 20,
    tail_pad: int = 8192,
    verbose: bool = False,
) -> PackedIVF:
    """Train + populate an IVF-PQ index (the reference's offline pipeline,
    §3.5 of SURVEY.md: train → populate → extract memory image — fused here).

    ``xb``/``xt`` may be host numpy OR device jax arrays.  Device input keeps
    the corpus resident in HBM end-to-end (k-means, assignment, residual PQ
    encode all chunk over device slices) and pulls only small artifacts —
    essential when the host↔device link is slow (the axon tunnel moves
    ~2 MB/s; a 1M×128d corpus round-trip costs minutes per pass).
    """
    import jax
    import jax.numpy as jnp

    def _coerce(a):
        return a if isinstance(a, jax.Array) else \
            np.ascontiguousarray(a, np.float32)

    xb = _coerce(xb)
    xt = xb if xt is None else _coerce(xt)
    on_device = isinstance(xb, jax.Array)

    def _rotate(x, R):
        # ranking-relevant transform: TPU's default single-pass bf16
        # matmul would perturb the database side of every distance
        # (CLAUDE.md precision invariant) — queries are rotated at
        # HIGHEST in searcher.py, the corpus must match
        if on_device:
            return jnp.dot(x, R, precision=jax.lax.Precision.HIGHEST)
        return x @ R

    if cfg.imi:
        # IMI coarse quantizers need product-structured training — the
        # factory path owns that (train_imi + imi_centroids + factored
        # assignment); a flat kmeans over 4^B cells here would return
        # mostly-random centroids without warning.  Host-side route (IMI
        # is an experiments feature; device corpora should use IVF).
        from chamjax.index import factory
        trained = factory.train_quantizers(
            np.asarray(xt), cfg, seed=seed, kmeans_iters=kmeans_iters,
            pq_iters=pq_iters)
        return factory.populate(np.asarray(xb), trained,
                                tail_pad=tail_pad)

    opq_R = None
    centroids = None
    train_assign = None
    if cfg.opq:
        if cfg.by_residual:
            # Residual-OPQ: the rotation must minimize PQ error of what PQ
            # actually encodes — the coarse residuals.  L2 is rotation-
            # invariant, so coarse k-means in raw space gives the same
            # cells; train R on a residual sample, then fold the rotation
            # into the centroids (search stays q @ R → coarse → residual).
            if verbose:
                print(f"[build] kmeans nlist={cfg.nlist} (pre-OPQ)",
                      file=sys.stderr, flush=True)
            cent_raw = kmeans(xt, cfg.nlist, iters=kmeans_iters, seed=seed)
            train_assign = kmeans_assign(xt, cent_raw)
            # UNIFORM subsample, not the head slice: ordered training sets
            # (appended per-source/cluster corpora) would otherwise fit the
            # rotation to the head's distribution only
            sub = _opq_subsample_idx(xt.shape[0], seed)
            if on_device:
                resid = (xt[jnp.asarray(sub)]
                         - jnp.asarray(cent_raw)[jnp.asarray(
                             train_assign)[jnp.asarray(sub)]])
                resid = np.asarray(resid)
            else:
                resid = xt[sub] - cent_raw[np.asarray(train_assign)[sub]]
            opq_R, _ = train_opq(resid, cfg.m, nbits=cfg.nbits, seed=seed)
            R = jnp.asarray(opq_R) if on_device else opq_R
            xt_r, xb_r = _rotate(xt, R), _rotate(xb, R)
            centroids = np.asarray(cent_raw) @ opq_R
        else:
            # subsample BEFORE pulling to host (train_opq caps at 2^17
            # rows anyway, and np.asarray of a full device corpus crosses
            # the slow host link) — uniformly, not the head slice
            sub = _opq_subsample_idx(xt.shape[0], seed)
            xt_s = xt[jnp.asarray(sub)] if on_device else xt[sub]
            opq_R, _ = train_opq(np.asarray(xt_s), cfg.m,
                                 nbits=cfg.nbits, seed=seed)
            R = jnp.asarray(opq_R) if on_device else opq_R
            xt_r = _rotate(xt, R)
            xb_r = _rotate(xb, R)
    else:
        xt_r, xb_r = xt, xb

    if centroids is None:
        if verbose:
            print(f"[build] kmeans nlist={cfg.nlist} on {xt_r.shape}",
                  file=sys.stderr, flush=True)
        centroids = kmeans(xt_r, cfg.nlist, iters=kmeans_iters, seed=seed)
        train_assign = kmeans_assign(xt_r, centroids)
    if cfg.by_residual:
        cent_rows = (jnp.asarray(centroids)[jnp.asarray(train_assign)]
                     if on_device else centroids[train_assign])
        train_vecs = xt_r - cent_rows
    else:
        train_vecs = xt_r
    if verbose:
        print(f"[build] PQ m={cfg.m} nbits={cfg.nbits}", file=sys.stderr,
              flush=True)
    codebooks = train_pq(train_vecs, cfg.m, nbits=cfg.nbits, iters=pq_iters, seed=seed)

    if cfg.balanced:
        cap = int(np.ceil(xb.shape[0] / cfg.nlist * cfg.balance_factor))
        assignment = assign_balanced(xb_r, centroids, cap=cap,
                                     hard=cfg.balance_hard)
    else:
        assignment = kmeans_assign(xb_r, centroids)
    if on_device:
        # fused residual + encode, chunked on device: never materialize the
        # (nb, d) residual matrix on host
        cent_dev = jnp.asarray(centroids)
        codes = np.empty((xb_r.shape[0], cfg.m), np.uint8)
        enc_chunk = 1 << 18
        for i in range(0, xb_r.shape[0], enc_chunk):
            xi = xb_r[i:i + enc_chunk]
            if cfg.by_residual:
                xi = xi - cent_dev[jnp.asarray(assignment[i:i + enc_chunk])]
            codes[i:i + xi.shape[0]] = pq_encode(xi, codebooks)
    else:
        enc_vecs = (xb_r - centroids[assignment] if cfg.by_residual
                    else xb_r)
        codes = pq_encode(enc_vecs, codebooks)

    packed_codes, packed_ids, list_start, list_len = _pack_lists(
        assignment, codes, cfg.nlist, cfg.list_pad, tail_pad
    )
    if verbose:
        util = xb.shape[0] / max(packed_codes.shape[0], 1)
        print(f"[build] packed n_pad={packed_codes.shape[0]} "
              f"util={util:.2%}", file=sys.stderr, flush=True)
    return PackedIVF(
        cfg=cfg,
        centroids=centroids,
        codebooks=codebooks,
        codes=packed_codes,
        ids=packed_ids,
        list_start=list_start,
        list_len=list_len,
        ntotal=int(xb.shape[0]),
        opq_R=opq_R,
    )
