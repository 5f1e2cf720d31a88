"""The reference's six (D, M) accelerator variants as jit parameters.

The reference ships six separate FPGA builds differing only in the
compile-time (D, M) constants (`entire_accelerator_final_*/src/
constants.hpp`: SIFT_M16 128/16, SIFT_M32 128/32, Deep_M16 96/16,
Deep_M32 96/32, GNN_M64 256/64, SBERT_M64 384/64).  chamjax compiles the
same shapes as arguments; these tests pin every variant's segmented-kernel
search — f32 LUTs exactly, packed-bf16 LUTs to bf16 tolerance — against
the numpy ADC oracle.  The on-device QPS/recall matrix for the same table
is `benchmarks/dm_variants.py`.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from chamjax.config import IndexConfig
from chamjax.data import synthetic_dataset
from chamjax.index import build_ivfpq
from chamjax.searcher import DeviceIVF, auto_windows, ivfpq_search

# the reference's variant table (name → (D, M)); 128/16 is the default
# shape every other test uses, so it is exercised via its five siblings
DM_TABLE = [
    ("SIFT_M32", 128, 32),
    ("Deep_M16", 96, 16),
    ("Deep_M32", 96, 32),
    ("GNN_M64", 256, 64),
    ("SBERT_M64", 384, 64),
]


def _adc_oracle(index, q, nprobe, k):
    cent = index.centroids
    d2 = ((q[:, None] - cent[None]) ** 2).sum(-1)
    probes = np.argsort(d2, axis=1)[:, :nprobe]
    m, ksub, dsub = index.codebooks.shape
    out_i = np.full((q.shape[0], k), -1, np.int64)
    out_d = np.full((q.shape[0], k), np.inf, np.float32)
    for qi in range(q.shape[0]):
        cand_ids, cand_d = [], []
        for l in probes[qi]:
            s, ln = index.list_start[l], index.list_len[l]
            ids = index.ids[s:s + ln]
            codes = index.codes[s:s + ln].astype(np.int64)
            rs = (q[qi] - cent[l]).reshape(m, dsub)
            lut = ((rs[:, None, :] - index.codebooks) ** 2).sum(-1)
            cand_ids.append(ids)
            cand_d.append(lut[np.arange(m)[None, :], codes].sum(-1))
        cand_ids = np.concatenate(cand_ids)
        cand_d = np.concatenate(cand_d).astype(np.float32)
        order = np.argsort(cand_d, kind="stable")[:k]
        out_i[qi, : len(order)] = cand_ids[order]
        out_d[qi, : len(order)] = cand_d[order]
    return out_d, out_i


@pytest.mark.parametrize("name,d,m", DM_TABLE)
def test_dm_variant_matches_oracle(name, d, m):
    ds = synthetic_dataset(nb=3000, nq=4, nt=1500, d=d, seed=7,
                           n_clusters=16)
    idx = build_ivfpq(ds.xb, IndexConfig(dim=d, nlist=16, m=m, list_pad=128),
                      xt=ds.xt, kmeans_iters=4, pq_iters=4)
    dev = DeviceIVF.from_packed(idx)
    nprobe, k, seg = 4, 10, 128
    W = auto_windows(idx.list_len, seg, nprobe)
    W += -W % 2
    q = jnp.asarray(ds.xq)
    ref_d, ref_i = _adc_oracle(idx, ds.xq, nprobe, k)

    kw = dict(nprobe=nprobe, k=k, windows=W, seg=seg, group=2,
              backend="seg", use_approx=False, coarse_approx=False)
    d_f32, i_f32 = ivfpq_search(dev, q, **kw)
    np.testing.assert_allclose(np.asarray(d_f32), ref_d, rtol=1e-3,
                               atol=1e-2)
    agree = np.asarray(i_f32) == ref_i
    close = np.abs(np.asarray(d_f32) - ref_d) < 1e-2
    assert np.all(agree | close), name

    # packed-bf16 LUTs: each of the m summed entries rounds at ~2^-8
    # relative, so distances match to ~1% and the top-k sets coincide up
    # to near-ties
    d_bf, i_bf = ivfpq_search(dev, q, lut_bf16=True, **kw)
    np.testing.assert_allclose(np.asarray(d_bf), ref_d, rtol=2e-2,
                               atol=5e-2)
    scale = np.maximum(np.abs(ref_d), 1.0)
    agree = np.asarray(i_bf) == ref_i
    close = np.abs(np.asarray(d_bf) - ref_d) / scale < 2e-2
    assert np.all(agree | close), name
