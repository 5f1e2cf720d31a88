"""Native (C++) runtime components, bound via ctypes.

The reference's runtime-critical paths are native: the FPGA accelerator and
its OpenCL host program (C++), with only the relay tier in Python.  Here the
TPU compute path is JAX/Pallas; this package supplies the native *runtime*
around it:

- ``cham_coordinator_run``: epoll relay data plane (see ``src/chamnet.cpp``)
  replacing the Python poll loop of ``RetrieveCoordinator``.
- ``cham_read_vecs``: sequential-read vecs-file loader.

The shared library compiles on demand with g++ (cached next to the source);
callers must handle ``NativeUnavailable`` and fall back to the pure-Python
implementations — the Python and native paths are behaviorally identical.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libchamnet.so")

_lock = threading.Lock()
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    srcs = [os.path.join(_SRC_DIR, f)
            for f in ("chamnet.cpp", "hnsw.cpp", "gather.cpp", "ivfpq.cpp")]
    newest = max(os.path.getmtime(s) for s in srcs)
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < newest):
        # -march=native is safe: the library is built on demand on the
        # host it runs on (never shipped).  -O3 autovectorizes the
        # engine's dot-product/LUT loops (~4x on the CPU query engine).
        cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-pthread",
               "-std=c++17", "-shared", "-fPIC", "-o", _LIB_PATH] + srcs
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            detail = getattr(e, "stderr", str(e))
            raise NativeUnavailable(f"chamnet build failed: {detail}") from e
    return _LIB_PATH


def load() -> ctypes.CDLL:
    """Build (if stale) and load libchamnet; raises NativeUnavailable."""
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.cham_coordinator_run.restype = ctypes.c_longlong
            lib.cham_coordinator_run.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_longlong, ctypes.c_longlong,
                ctypes.c_char_p, ctypes.c_longlong,
            ]
            lib.cham_read_vecs.restype = ctypes.c_longlong
            lib.cham_read_vecs.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_longlong,
                ctypes.c_longlong, ctypes.c_void_p,
            ]
            lib.cham_vecs_dim.restype = ctypes.c_longlong
            lib.cham_vecs_dim.argtypes = [ctypes.c_char_p]
            lib.cham_hnsw_create.restype = ctypes.c_longlong
            lib.cham_hnsw_create.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
            lib.cham_hnsw_add.restype = ctypes.c_longlong
            lib.cham_hnsw_add.argtypes = [
                ctypes.c_longlong, ctypes.c_longlong, ctypes.c_void_p,
                ctypes.c_void_p]
            lib.cham_hnsw_search.restype = ctypes.c_longlong
            lib.cham_hnsw_search.argtypes = [
                ctypes.c_longlong, ctypes.c_longlong, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
            lib.cham_hnsw_size.restype = ctypes.c_longlong
            lib.cham_hnsw_size.argtypes = [ctypes.c_longlong]
            lib.cham_hnsw_save.restype = ctypes.c_longlong
            lib.cham_hnsw_save.argtypes = [ctypes.c_longlong,
                                           ctypes.c_char_p]
            lib.cham_hnsw_load.restype = ctypes.c_longlong
            lib.cham_hnsw_load.argtypes = [ctypes.c_char_p]
            lib.cham_hnsw_free.restype = None
            lib.cham_hnsw_free.argtypes = [ctypes.c_longlong]
            lib.cham_gather_windows.restype = ctypes.c_longlong
            lib.cham_gather_windows.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            lib.cham_gather_codes.restype = ctypes.c_longlong
            lib.cham_gather_codes.argtypes = [
                ctypes.c_void_p, ctypes.c_longlong, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_longlong, ctypes.c_void_p,
            ]
            lib.cham_ivfpq_create.restype = ctypes.c_longlong
            lib.cham_ivfpq_create.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_longlong,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_longlong, ctypes.c_int,
            ]
            lib.cham_ivfpq_search.restype = ctypes.c_longlong
            lib.cham_ivfpq_search.argtypes = [
                ctypes.c_longlong, ctypes.c_longlong, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int,
            ]
            lib.cham_ivfpq_search_preassigned.restype = ctypes.c_longlong
            lib.cham_ivfpq_search_preassigned.argtypes = [
                ctypes.c_longlong, ctypes.c_longlong, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.cham_ivfpq_free.restype = None
            lib.cham_ivfpq_free.argtypes = [ctypes.c_longlong]
            _lib = lib
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except NativeUnavailable:
        return False


# --- high-level wrappers -----------------------------------------------------

def coordinator_run(host: str, port: int, n_clients: int,
                    request_bytes: int, answer_bytes: int,
                    engine_addrs, queries_per_client: int = 0) -> int:
    """Blocking native coordinator. engine_addrs: [(host, port), ...].
    Returns total answered queries."""
    lib = load()
    spec = ";".join(f"{h}:{p}" for h, p in engine_addrs)
    rc = lib.cham_coordinator_run(
        host.encode(), port, n_clients, request_bytes, answer_bytes,
        spec.encode(), queries_per_client)
    if rc < 0:
        raise RuntimeError(f"native coordinator failed: code {rc}")
    return int(rc)


def read_vecs(path: str, elem: str = "f", max_rows: int = -1):
    """Read an fvecs/bvecs/ivecs file into a contiguous array natively."""
    import numpy as np

    lib = load()
    dim = lib.cham_vecs_dim(path.encode())
    if dim <= 0:
        raise IOError(f"cannot read vecs header from {path} (code {dim})")
    elem_size, dtype = {"f": (4, np.float32), "b": (1, np.uint8),
                        "i": (4, np.int32)}[elem]
    if max_rows < 0:
        row_bytes = 4 + dim * elem_size
        max_rows = os.path.getsize(path) // row_bytes
    out = np.empty((max_rows, dim), dtype)
    rows = lib.cham_read_vecs(path.encode(), elem_size, dim, max_rows,
                              out.ctypes.data_as(ctypes.c_void_p))
    if rows < 0:
        raise IOError(f"native vecs read failed: code {rows}")
    return out[:rows]


def gather_windows(codes, ids, starts, lens, seg: int):
    """Native window-slab gather (the host half of the PQ-code streamer;
    see ``src/gather.cpp``).  ``codes (n_pad, m) u8`` / ``ids (n_pad,)
    i32`` may be plain arrays or memmaps; returns ``(slab_codes
    (bw, seg, m) u8, slab_ids (bw, seg) i32)`` with tail rows 0 / -1 —
    bit-identical to ``HostStreamedSearcher._stage``'s Python loop."""
    import numpy as np

    lib = load()
    codes = np.ascontiguousarray(codes, np.uint8)
    ids = np.ascontiguousarray(ids, np.int32)
    starts = np.ascontiguousarray(starts, np.int32).reshape(-1)
    lens = np.ascontiguousarray(lens, np.int32).reshape(-1)
    n_pad, m = codes.shape
    assert ids.shape == (n_pad,), (ids.shape, n_pad)
    assert starts.shape == lens.shape
    bw = starts.size
    slab_c = np.empty((bw, seg, m), np.uint8)
    slab_i = np.empty((bw, seg), np.int32)
    rc = lib.cham_gather_windows(
        codes.ctypes.data_as(ctypes.c_void_p),
        ids.ctypes.data_as(ctypes.c_void_p),
        n_pad, m, seg,
        starts.ctypes.data_as(ctypes.c_void_p),
        lens.ctypes.data_as(ctypes.c_void_p),
        bw,
        slab_c.ctypes.data_as(ctypes.c_void_p),
        slab_i.ctypes.data_as(ctypes.c_void_p))
    if rc < 0:
        raise RuntimeError(f"cham_gather_windows failed: code {rc}")
    return slab_c, slab_i


def gather_codes(codes, starts, lens, seg: int):
    """Codes-only native slab gather: the streamed tier's host half after
    the round-4 positions-protocol change (device returns top-k positions;
    ids never cross the link — ``src/gather.cpp::cham_gather_codes``).
    Returns ``slab_codes (bw, seg, m) u8`` with tail rows zero-filled."""
    import numpy as np

    lib = load()
    codes = np.ascontiguousarray(codes, np.uint8)
    starts = np.ascontiguousarray(starts, np.int32).reshape(-1)
    lens = np.ascontiguousarray(lens, np.int32).reshape(-1)
    n_pad, m = codes.shape
    assert starts.shape == lens.shape
    bw = starts.size
    slab_c = np.empty((bw, seg, m), np.uint8)
    rc = lib.cham_gather_codes(
        codes.ctypes.data_as(ctypes.c_void_p),
        n_pad, m, seg,
        starts.ctypes.data_as(ctypes.c_void_p),
        lens.ctypes.data_as(ctypes.c_void_p),
        bw,
        slab_c.ctypes.data_as(ctypes.c_void_p))
    if rc < 0:
        raise RuntimeError(f"cham_gather_codes failed: code {rc}")
    return slab_c


class NativeIVFPQ:
    """Host (CPU) IVF-PQ query engine over the packed CSR index layout
    (``src/ivfpq.cpp``) — the serving-grade CPU tier (the reference's
    Faiss-CPU ``FaissServer`` mode); same math as the device path
    (exact coarse top-nprobe, residual ADC LUTs, exact top-k), squared-L2
    distances matching ``IVFSearcher`` to float tolerance.

    Borrows the PackedIVF arrays (kept alive on the instance).  OPQ
    rotation, when present, is applied to queries here — identical to
    the device path.  A handle is single-threaded.
    """

    def __init__(self, packed):
        import numpy as np

        self._lib = load()
        cfg = packed.cfg
        self.dim, self.m, self.nprobe_max = cfg.dim, cfg.m, cfg.nlist
        assert cfg.nbits == 8, "native engine is specialized for 8-bit PQ"
        # keep contiguous references alive for the handle's lifetime
        self._cent = np.ascontiguousarray(packed.centroids, np.float32)
        self._cb = np.ascontiguousarray(packed.codebooks, np.float32)
        self._codes = np.ascontiguousarray(packed.codes, np.uint8)
        self._ids = np.ascontiguousarray(packed.ids, np.int32)
        self._ls = np.ascontiguousarray(packed.list_start, np.int32)
        self._ll = np.ascontiguousarray(packed.list_len, np.int32)
        self._opq_R = (np.ascontiguousarray(packed.opq_R, np.float32)
                       if packed.opq_R is not None else None)
        self._h = self._lib.cham_ivfpq_create(
            cfg.dim, cfg.m, 256, cfg.nlist,
            self._cent.ctypes.data_as(ctypes.c_void_p),
            self._cb.ctypes.data_as(ctypes.c_void_p),
            self._codes.ctypes.data_as(ctypes.c_void_p),
            self._ids.ctypes.data_as(ctypes.c_void_p),
            self._ls.ctypes.data_as(ctypes.c_void_p),
            self._ll.ctypes.data_as(ctypes.c_void_p),
            self._codes.shape[0], int(cfg.by_residual))
        if self._h < 0:
            raise ValueError("cham_ivfpq_create failed")

    def _prep(self, queries):
        import numpy as np

        q = np.ascontiguousarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        assert q.shape[1] == self.dim, q.shape
        if self._opq_R is not None:
            q = np.ascontiguousarray(q @ self._opq_R)
        return q

    def search(self, queries, nprobe: int, k: int, n_threads: int = 0):
        """Returns ``(dists (nq, k) f32, ids (nq, k) i64)`` ascending.
        ``n_threads``: 0 = all cores (queries fan out over a pool with
        per-thread scratch)."""
        import numpy as np

        q = self._prep(queries)
        nq = q.shape[0]
        out_i = np.empty((nq, k), np.int64)
        out_d = np.empty((nq, k), np.float32)
        rc = self._lib.cham_ivfpq_search(
            self._h, nq, q.ctypes.data_as(ctypes.c_void_p), nprobe, k,
            out_i.ctypes.data_as(ctypes.c_void_p),
            out_d.ctypes.data_as(ctypes.c_void_p), n_threads)
        if rc < 0:
            raise RuntimeError(f"cham_ivfpq_search failed: {rc}")
        return out_d, out_i

    def search_preassigned(self, queries, list_ids, k: int,
                           n_threads: int = 0):
        import numpy as np

        q = self._prep(queries)
        nq = q.shape[0]
        li = np.ascontiguousarray(list_ids, np.int32)
        assert li.shape[0] == nq, (li.shape, nq)
        out_i = np.empty((nq, k), np.int64)
        out_d = np.empty((nq, k), np.float32)
        rc = self._lib.cham_ivfpq_search_preassigned(
            self._h, nq, q.ctypes.data_as(ctypes.c_void_p),
            li.ctypes.data_as(ctypes.c_void_p), li.shape[1], k,
            out_i.ctypes.data_as(ctypes.c_void_p),
            out_d.ctypes.data_as(ctypes.c_void_p), n_threads)
        if rc < 0:
            raise RuntimeError(f"cham_ivfpq_search_preassigned failed: {rc}")
        return out_d, out_i

    def close(self) -> None:
        if getattr(self, "_h", -1) >= 0:
            self._lib.cham_ivfpq_free(self._h)
            self._h = -1

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class HNSWIndex:
    """Host-side HNSW graph index (native C++; see ``src/hnsw.cpp``).

    The capability the reference gets from vendored hnswlib
    (``SRC/host.cpp:516-556`` coarse centroid search; BEIR's
    ``HNSWFaissSearch``), as an original implementation.  L2 metric;
    normalized vectors make it rank-equivalent to cosine.

    A handle is single-threaded: searches share per-index visited-stamp
    scratch (and ctypes releases the GIL) — use one handle per thread.
    """

    def __init__(self, dim: int, M: int = 16, ef_construction: int = 200,
                 seed: int = 42, _handle: int = 0):
        import numpy as np  # noqa: F401  (kept local: ctypes-only module)
        self._lib = load()
        self.dim = dim
        if _handle:
            self._h = _handle
        else:
            self._h = self._lib.cham_hnsw_create(dim, M, ef_construction,
                                                 seed)
            if self._h < 0:
                raise ValueError("cham_hnsw_create failed")

    def __len__(self) -> int:
        return int(self._lib.cham_hnsw_size(self._h))

    def add(self, vecs, labels=None) -> int:
        import numpy as np
        vecs = np.ascontiguousarray(vecs, np.float32)
        assert vecs.ndim == 2 and vecs.shape[1] == self.dim, vecs.shape
        lab_ptr = None
        if labels is not None:
            labels = np.ascontiguousarray(labels, np.int64)
            assert labels.shape == (vecs.shape[0],)
            lab_ptr = labels.ctypes.data_as(ctypes.c_void_p)
        rc = self._lib.cham_hnsw_add(
            self._h, vecs.shape[0], vecs.ctypes.data_as(ctypes.c_void_p),
            lab_ptr)
        if rc < 0:
            raise RuntimeError(f"cham_hnsw_add failed: {rc}")
        return int(rc)

    def search(self, queries, k: int, ef: int = 0):
        """Returns ``(labels (n, k) int64, dists (n, k) float32)``,
        nearest-first (squared L2)."""
        import numpy as np
        queries = np.ascontiguousarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        n = queries.shape[0]
        labels = np.empty((n, k), np.int64)
        dists = np.empty((n, k), np.float32)
        rc = self._lib.cham_hnsw_search(
            self._h, n, queries.ctypes.data_as(ctypes.c_void_p), k,
            ef or max(2 * k, 64), labels.ctypes.data_as(ctypes.c_void_p),
            dists.ctypes.data_as(ctypes.c_void_p))
        if rc < 0:
            raise RuntimeError(f"cham_hnsw_search failed: {rc}")
        return labels, dists

    def save(self, path: str) -> None:
        rc = self._lib.cham_hnsw_save(self._h, path.encode())
        if rc < 0:
            raise IOError(f"cham_hnsw_save failed: {rc}")

    @staticmethod
    def load_file(path: str, dim: int) -> "HNSWIndex":
        lib = load()
        h = lib.cham_hnsw_load(path.encode())
        if h < 0:
            raise IOError(f"cham_hnsw_load failed: {h}")
        return HNSWIndex(dim, _handle=h)

    def close(self) -> None:
        if getattr(self, "_h", 0):
            self._lib.cham_hnsw_free(self._h)
            self._h = 0

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
