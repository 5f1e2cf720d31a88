"""MeshRetriever: the serving-class face of the sharded mesh tier.

Pins that (a) the retriever contract over a placed ShardedIVF matches the
single-device searcher, and (b) the RALM/tik-tok loops serve from the
mesh tier through the fused device path with zero code changes — the
multi-chip RAG serving story end-to-end on the 8-virtual-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chamjax.config import IndexConfig, ModelConfig, SearchConfig
from chamjax.data import synthetic_dataset
from chamjax.index import build_ivfpq
from chamjax.parallel import make_mesh, shard_index
from chamjax.parallel.sharded_search import place_sharded
from chamjax.retrieval.local import MeshRetriever
from chamjax.searcher import IVFSearcher


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_dataset(nb=16000, nq=8, nt=8000, d=32, seed=9,
                           n_clusters=64)
    idx = build_ivfpq(ds.xb, IndexConfig(dim=32, nlist=64, m=8,
                                         list_pad=128),
                      xt=ds.xt, kmeans_iters=4, pq_iters=4)
    mesh = make_mesh((("lists", 4),), devices=jax.devices()[:4])
    sh = place_sharded(shard_index(idx, 4, tile_seg=256), mesh)
    info = np.asarray(idx.list_len)
    return ds, idx, mesh, sh, info


def test_mesh_retriever_matches_single(setup):
    ds, idx, mesh, sh, list_len = setup
    r = MeshRetriever(sh, mesh, list_len,
                      SearchConfig(nprobe=8, k=10, seg=256, seg_group=2,
                                   use_approx_topk=False))
    res = r.retrieve(ds.xq, nprobe=8, k=10)
    single = IVFSearcher(idx, SearchConfig(nprobe=8, k=10, backend="seg",
                                           use_approx_topk=False))
    d_ref, i_ref = single.search(ds.xq)
    np.testing.assert_allclose(res.dists, d_ref, rtol=1e-4, atol=1e-3)
    agree = res.ids == i_ref
    close = np.abs(res.dists - d_ref) < 1e-2
    assert np.all(agree | close)


def test_mesh_retriever_device_path_in_ralm_loop(setup):
    """Full multi-chip RAG serving: decode (tiny model) + mesh-sharded
    retrieval, fused through retrieve_device — the RalmDecoder runs
    unchanged over the pod-scale tier."""
    from chamjax.models import init_decoder
    from chamjax.serving.ralm import RalmDecoder
    ds, idx, mesh, sh, list_len = setup
    cfg = ModelConfig(model_type="decoder", embed_dim=32, ffn_embed_dim=64,
                      layers=2, attention_heads=2, vocab_size=64,
                      max_seq_len=16, retrieval_interval=2, k=5)
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    r = MeshRetriever(sh, mesh, list_len,
                      SearchConfig(nprobe=4, k=5, seg=256, seg_group=2))
    loop = RalmDecoder(params, cfg, r, batch_size=4, retrieval_interval=2,
                       nprobe=4, k=5)
    assert loop._device_path
    loop.batch_inference(6)
    assert loop.step_count == 6
    ids = np.asarray(loop.last_result.ids)
    assert ids.shape == (4, 5)
    assert (ids >= 0).all()


def test_mesh_retriever_tiktok_fused(setup):
    from chamjax.models import init_decoder
    from chamjax.serving.tiktok import TikTokDecoder
    ds, idx, mesh, sh, list_len = setup
    cfg = ModelConfig(model_type="decoder", embed_dim=32, ffn_embed_dim=64,
                      layers=2, attention_heads=2, vocab_size=64,
                      max_seq_len=16, retrieval_interval=2, k=5)
    params = init_decoder(jax.random.PRNGKey(1), cfg)
    r = MeshRetriever(sh, mesh, list_len,
                      SearchConfig(nprobe=4, k=5, seg=256, seg_group=2))
    tt = TikTokDecoder(params, cfg, r, batch_size=2, retrieval_interval=2,
                       nprobe=4, k=5)
    assert tt._device_path
    tt.batch_inference(6)
    for st in tt.states.values():
        assert st.step >= 6
        assert st.last_result is not None
