"""On-disk index build & load: corpora larger than host RAM.

Parity with the reference's on-disk pipeline
(``Faiss_experiments/build_index_on_disk.py`` /
``bench_on_disk_performance.py`` — ondisk invlists via ivfdata files):
the packed code/id arrays live in raw memmap files; building is two-pass
(pass 1: chunked assignment → list sizes → layout; pass 2: chunked encode →
scatter into per-list cursors), so peak host memory is one chunk regardless
of corpus size.  ``load_ondisk`` returns a ``PackedIVF`` whose big arrays
are read-only memmaps — usable directly by ``DeviceIVF.from_packed`` (which
streams them to HBM) or sliced for mesh sharding.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np

from chamjax.index.factory import TrainedQuantizers
from chamjax.index.ivf import INVALID_ID, PackedIVF
from chamjax.index.kmeans import assign
from chamjax.index.pq import pq_encode


def _chunks(xb: np.ndarray, chunk: int) -> Iterator[tuple]:
    for i in range(0, xb.shape[0], chunk):
        yield i, np.ascontiguousarray(xb[i:i + chunk], np.float32)


def populate_on_disk(
    xb: np.ndarray,                 # may be a memmap (e.g. mmap_bvecs view)
    trained: TrainedQuantizers,
    out_dir: str,
    chunk: int = 1 << 19,
    id_offset: int = 0,
    tail_pad: int = 8192,
) -> str:
    """Two-pass on-disk populate. Returns ``out_dir``.

    Files: ``codes.raw`` (n_pad, m) uint8; ``ids.raw`` (n_pad,) int32;
    ``meta.npz`` (quantizers + list tables); ``ondisk.json`` (shape info).
    """
    cfg = trained.cfg
    os.makedirs(out_dir, exist_ok=True)
    n = xb.shape[0]

    if cfg.balanced:
        import warnings
        warnings.warn(
            "populate_on_disk: cfg.balanced is IGNORED — the chunked "
            "two-pass assigner is nearest-cell only, so the hard-cap list "
            "invariant (auto_windows' worst-query bound) will not hold. "
            "Use factory.populate or the device builder for balanced "
            "builds.", stacklevel=2)

    # pass 1: assignment (chunked) → list sizes → packed layout
    assignment = np.empty(n, np.int32)
    for i, x in _chunks(xb, chunk):
        xr = x @ trained.opq_R if trained.opq_R is not None else x
        if cfg.imi:
            # factored IMI assignment, same recovery as factory.populate
            from chamjax.index.imi import assign_imi
            kk, h = 1 << cfg.imi, cfg.dim // 2
            assignment[i:i + x.shape[0]] = assign_imi(
                xr, trained.centroids[::kk, :h], trained.centroids[:kk, h:])
        else:
            assignment[i:i + x.shape[0]] = assign(xr, trained.centroids)
    list_len = np.bincount(assignment, minlength=cfg.nlist).astype(np.int64)
    padded = (np.maximum(-(-list_len // cfg.list_pad), 1)
              * cfg.list_pad).astype(np.int64)
    list_start = np.zeros(cfg.nlist, np.int64)
    list_start[1:] = np.cumsum(padded)[:-1]
    n_pad = int(padded.sum()) + tail_pad

    m = cfg.m
    codes_mm = np.memmap(os.path.join(out_dir, "codes.raw"), np.uint8,
                         mode="w+", shape=(n_pad, m))
    ids_mm = np.memmap(os.path.join(out_dir, "ids.raw"), np.int32,
                       mode="w+", shape=(n_pad,))
    ids_mm[:] = INVALID_ID

    # pass 2: encode (chunked) → scatter into per-list cursors
    cursor = list_start.copy()
    for i, x in _chunks(xb, chunk):
        xr = x @ trained.opq_R if trained.opq_R is not None else x
        a = assignment[i:i + x.shape[0]]
        enc = xr - trained.centroids[a] if cfg.by_residual else xr
        codes = pq_encode(enc, trained.codebooks)
        order = np.argsort(a, kind="stable")
        a_s = a[order]
        bounds = np.searchsorted(a_s, np.arange(cfg.nlist + 1))
        for l in np.unique(a_s):
            lo, hi = bounds[l], bounds[l + 1]
            d = int(cursor[l])
            rows = order[lo:hi]
            codes_mm[d:d + len(rows)] = codes[rows]
            ids_mm[d:d + len(rows)] = (i + rows + id_offset).astype(np.int32)
            cursor[l] += len(rows)
    codes_mm.flush()
    ids_mm.flush()

    import dataclasses as dc
    np.savez_compressed(
        os.path.join(out_dir, "meta.npz"),
        centroids=trained.centroids, codebooks=trained.codebooks,
        list_start=list_start.astype(np.int32),
        list_len=list_len.astype(np.int32),
        opq_R=(trained.opq_R if trained.opq_R is not None
               else np.zeros((0, 0), np.float32)),
        cfg=np.frombuffer(repr(dc.asdict(cfg)).encode(), np.uint8))
    with open(os.path.join(out_dir, "ondisk.json"), "w") as f:
        json.dump({"n_pad": n_pad, "m": m, "ntotal": int(n)}, f)
    return out_dir


def populate_on_disk_device(
    draw,                           # draw(start, count) -> (count, d) device
    n: int,
    trained: TrainedQuantizers,
    out_dir: str,
    chunk: int = 1 << 20,
    id_offset: int = 0,
    tail_pad: int = 8192,
    verbose: bool = False,
) -> str:
    """Two-pass on-disk populate with DEVICE assignment/encoding.

    The host-side :func:`populate_on_disk` runs k-means assignment on the
    CPU — fine for the reference's Xeon fleet
    (``build_index_on_disk.py``), hopeless at 100M×nlist=65536 on a
    1-vCPU host.  Here each chunk is drawn/assigned/encoded on the TPU
    and only the (n, m) uint8 codes + (n,) int32 assignment cross the
    host link (m+4 bytes/row — the minimum possible export traffic);
    the host just scatters into the memmap layout.  This is the
    build-on-accelerator / serve-from-host flow the streamed tier exists
    for (``chamjax/streamed.py``).
    """
    import time as _time

    import jax
    import jax.numpy as jnp
    from chamjax.index.device_build import _assign_blocked

    cfg = trained.cfg
    os.makedirs(out_dir, exist_ok=True)
    cent_d = jnp.asarray(trained.centroids)
    books_d = jnp.asarray(trained.codebooks)
    R_d = (jnp.asarray(trained.opq_R)
           if trained.opq_R is not None else None)

    @jax.jit
    def encode_codes(x, a, cent, books):
        """PQ codes for pre-assigned rows (device pq_encode twin)."""
        enc = x - cent[a] if cfg.by_residual else x
        m_, ksub, dsub = books.shape
        sub = enc.reshape(enc.shape[0], m_, dsub)
        d2 = (jnp.sum(sub ** 2, axis=-1, keepdims=True)
              - 2.0 * jnp.einsum("nmd,mkd->nmk", sub, books,
                                 precision=jax.lax.Precision.HIGHEST)
              + jnp.sum(books ** 2, axis=-1)[None])
        return jnp.argmin(d2, axis=-1).astype(jnp.uint8)

    def rotated(x):
        return (jnp.dot(x, R_d, precision=jax.lax.Precision.HIGHEST)
                if R_d is not None else x)

    def chunk_assign(x):
        return _assign_blocked(x, cent_d, block=4096, cand=8)

    # pass 1: device assignment only (4 B/row over the link)
    assignment = np.empty(n, np.int32)
    t0 = _time.time()
    for i in range(0, n, chunk):
        c = min(chunk, n - i)
        assignment[i:i + c] = np.asarray(chunk_assign(rotated(draw(i, c))))
        if verbose and (i // chunk) % 8 == 0:
            print(f"[ondisk] pass1 {i + c}/{n} rows "
                  f"(+{_time.time() - t0:.0f}s)", flush=True)
    list_len = np.bincount(assignment, minlength=cfg.nlist).astype(np.int64)
    padded = (np.maximum(-(-list_len // cfg.list_pad), 1)
              * cfg.list_pad).astype(np.int64)
    list_start = np.zeros(cfg.nlist, np.int64)
    list_start[1:] = np.cumsum(padded)[:-1]
    n_pad = int(padded.sum()) + tail_pad

    m = cfg.m
    codes_mm = np.memmap(os.path.join(out_dir, "codes.raw"), np.uint8,
                         mode="w+", shape=(n_pad, m))
    ids_mm = np.memmap(os.path.join(out_dir, "ids.raw"), np.int32,
                       mode="w+", shape=(n_pad,))
    ids_mm[:] = INVALID_ID

    # pass 2: device encode (m B/row over the link) → host scatter.
    # Assignment is re-derived on device (deterministic draw) — cheaper
    # than uploading the host copy back through the link.
    cursor = list_start.copy()
    for i in range(0, n, chunk):
        c = min(chunk, n - i)
        x = rotated(draw(i, c))
        a_d = chunk_assign(x)
        codes = np.asarray(encode_codes(x, a_d, cent_d, books_d))
        a = assignment[i:i + c]
        order = np.argsort(a, kind="stable")
        a_s = a[order]
        bounds = np.searchsorted(a_s, np.arange(cfg.nlist + 1))
        for l in np.unique(a_s):
            lo, hi = bounds[l], bounds[l + 1]
            d = int(cursor[l])
            rows = order[lo:hi]
            codes_mm[d:d + len(rows)] = codes[rows]
            ids_mm[d:d + len(rows)] = (i + rows + id_offset).astype(np.int32)
            cursor[l] += len(rows)
        if verbose and (i // chunk) % 8 == 0:
            print(f"[ondisk] pass2 {i + c}/{n} rows "
                  f"(+{_time.time() - t0:.0f}s)", flush=True)
    codes_mm.flush()
    ids_mm.flush()

    import dataclasses as dc
    np.savez_compressed(
        os.path.join(out_dir, "meta.npz"),
        centroids=np.asarray(trained.centroids),
        codebooks=np.asarray(trained.codebooks),
        list_start=list_start.astype(np.int32),
        list_len=list_len.astype(np.int32),
        opq_R=(np.asarray(trained.opq_R) if trained.opq_R is not None
               else np.zeros((0, 0), np.float32)),
        cfg=np.frombuffer(repr(dc.asdict(cfg)).encode(), np.uint8))
    with open(os.path.join(out_dir, "ondisk.json"), "w") as f:
        json.dump({"n_pad": n_pad, "m": m, "ntotal": int(n)}, f)
    return out_dir


def load_ondisk(out_dir: str) -> PackedIVF:
    """Open an on-disk index; code/id arrays are read-only memmaps."""
    import ast
    from chamjax.config import IndexConfig

    with open(os.path.join(out_dir, "ondisk.json")) as f:
        info = json.load(f)
    z = np.load(os.path.join(out_dir, "meta.npz"), allow_pickle=False)
    cfg = IndexConfig(**ast.literal_eval(bytes(z["cfg"]).decode()))
    codes = np.memmap(os.path.join(out_dir, "codes.raw"), np.uint8,
                      mode="r", shape=(info["n_pad"], info["m"]))
    ids = np.memmap(os.path.join(out_dir, "ids.raw"), np.int32,
                    mode="r", shape=(info["n_pad"],))
    opq_R = z["opq_R"]
    return PackedIVF(
        cfg=cfg, centroids=z["centroids"], codebooks=z["codebooks"],
        codes=codes, ids=ids, list_start=z["list_start"],
        list_len=z["list_len"], ntotal=info["ntotal"],
        opq_R=opq_R if opq_R.size else None)
