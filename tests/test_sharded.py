"""Mesh-sharded search tests on the 8-virtual-device CPU mesh.

Validates the Phase-3 contract (SURVEY.md §7): shard inverted lists over a
mesh axis, per-shard scan + top-k, all_gather merge — results must equal
the single-device search exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chamjax.config import IndexConfig, SearchConfig
from chamjax.data import synthetic_dataset
from chamjax.index import build_ivfpq
from chamjax.parallel import make_mesh, shard_index, sharded_search
from chamjax.parallel.sharded_search import place_sharded
from chamjax.searcher import IVFSearcher


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_dataset(nb=20000, nq=16, nt=8000, d=32, seed=3,
                           n_clusters=64)
    cfg = IndexConfig(dim=32, nlist=64, m=8, list_pad=128)
    idx = build_ivfpq(ds.xb, cfg, xt=ds.xt, kmeans_iters=6, pq_iters=6)
    return ds, idx


def test_shard_index_partitions_everything(setup):
    _, idx = setup
    sh = shard_index(idx, 4)
    assert sh.codes_t.shape[0] == 4
    # every list owned exactly once; lengths preserved
    lens = np.asarray(sh.list_len)
    assert np.all((lens > 0).sum(axis=0) <= 1)
    np.testing.assert_array_equal(lens.sum(axis=0), idx.list_len)
    # all vector ids present exactly once
    all_ids = np.asarray(sh.ids).ravel()
    valid = np.sort(all_ids[all_ids >= 0])
    np.testing.assert_array_equal(valid, np.arange(idx.ntotal))


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_matches_single_device(setup, n_shards):
    ds, idx = setup
    assert len(jax.devices()) >= 8, "conftest must force the 8-dev CPU mesh"
    mesh = make_mesh((("lists", n_shards),),
                     devices=jax.devices()[:n_shards])
    sh = place_sharded(shard_index(idx, n_shards), mesh)
    scan_len = idx.suggest_scan_len(8)
    d_sh, i_sh = sharded_search(
        sh, jnp.asarray(ds.xq), mesh=mesh, nprobe=8, k=10,
        scan_len=scan_len, use_approx=False, backend="xla")

    single = IVFSearcher(idx, SearchConfig(nprobe=8, k=10, backend="xla",
                                           use_approx_topk=False))
    d_1, i_1 = single.search(ds.xq)
    np.testing.assert_allclose(np.asarray(d_sh), d_1, rtol=1e-4, atol=1e-3)
    # id ties may reorder among equal distances only
    same = np.asarray(i_sh) == i_1
    close = np.abs(np.asarray(d_sh) - d_1) < 1e-3
    assert np.all(same | close)


def test_sharded_search_is_replicated(setup):
    ds, idx = setup
    mesh = make_mesh((("lists", 4),), devices=jax.devices()[:4])
    sh = place_sharded(shard_index(idx, 4), mesh)
    d_sh, i_sh = sharded_search(
        sh, jnp.asarray(ds.xq[:4]), mesh=mesh, nprobe=4, k=5,
        scan_len=idx.suggest_scan_len(4), use_approx=False, backend="xla")
    assert d_sh.shape == (4, 5)
    assert np.all(np.diff(np.asarray(d_sh), axis=1) >= -1e-5)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_seg_backend_matches_single_device(setup, n_shards):
    """Segmented kernel under shard_map must agree with the single-device
    seg search (same index, exact top-k)."""
    ds, idx = setup
    mesh = make_mesh((("lists", n_shards),),
                     devices=jax.devices()[:n_shards])
    sh = place_sharded(shard_index(idx, n_shards), mesh)
    d_sh, i_sh = sharded_search(
        sh, jnp.asarray(ds.xq[:8]), mesh=mesh, nprobe=8, k=10,
        windows=32, seg=256, group=4, use_approx=False, backend="seg",
        interpret=True, lut_bf16=True)   # match the production default
    single = IVFSearcher(idx, SearchConfig(nprobe=8, k=10, backend="seg",
                                           use_approx_topk=False))
    d_ref, i_ref = single.search(ds.xq[:8])
    np.testing.assert_allclose(np.asarray(d_sh), d_ref, rtol=1e-4, atol=1e-3)
    agree = np.asarray(i_sh) == i_ref
    close = np.abs(np.asarray(d_sh) - d_ref) < 1e-2
    assert np.all(agree | close)


def test_sharded_coarse_cand_matches_exact(setup):
    """coarse_cand > 0 inside shard_map (two-stage probe selection) must
    equal the exact-coarse sharded search on CPU, where the shortlist
    reduction is exact."""
    ds, idx = setup
    mesh = make_mesh((("lists", 2),), devices=jax.devices()[:2])
    sh = place_sharded(shard_index(idx, 2), mesh)
    kw = dict(mesh=mesh, nprobe=8, k=10, windows=32, seg=256, group=4,
              use_approx=False, backend="seg", interpret=True)
    d_e, i_e = sharded_search(sh, jnp.asarray(ds.xq[:8]), **kw)
    d_2, i_2 = sharded_search(sh, jnp.asarray(ds.xq[:8]), coarse_cand=32,
                              **kw)
    np.testing.assert_allclose(np.asarray(d_2), np.asarray(d_e),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i_2), np.asarray(i_e))


def test_sharded_2d_data_and_lists(setup):
    """2-D mesh (data x lists): batch-sharded queries, list-sharded codes;
    results must match the single-device seg search."""
    from chamjax.parallel.sharded_search import sharded_search_2d
    ds, idx = setup
    mesh = make_mesh((("data", 2), ("lists", 4)), devices=jax.devices()[:8])
    sh = place_sharded(shard_index(idx, 4), mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    q = jax.device_put(jnp.asarray(ds.xq[:8]),
                       NamedSharding(mesh, P("data")))
    d_sh, i_sh = sharded_search_2d(
        sh, q, mesh=mesh, nprobe=8, k=10, windows=32, seg=256, group=4,
        use_approx=False, backend="seg", interpret=True, lut_bf16=True)
    single = IVFSearcher(idx, SearchConfig(nprobe=8, k=10, backend="seg",
                                           use_approx_topk=False))
    d_ref, i_ref = single.search(ds.xq[:8])
    np.testing.assert_allclose(np.asarray(d_sh), d_ref, rtol=1e-4, atol=1e-3)
    agree = np.asarray(i_sh) == i_ref
    close = np.abs(np.asarray(d_sh) - d_ref) < 1e-2
    assert np.all(agree | close)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_tiled_matches_single_device(setup, n_shards):
    """The tile-aligned shard layout must dispatch the seg backend to the
    BlockSpec-pipelined kernel (scan_seg_block) and agree with the
    single-device search — the production one-kernel-everywhere path
    (VERDICT r3 #2)."""
    ds, idx = setup
    mesh = make_mesh((("lists", n_shards),),
                     devices=jax.devices()[:n_shards])
    sh_t = shard_index(idx, n_shards, tile_seg=256)
    assert sh_t.codes_t is None and sh_t.codes_tiled is not None
    assert sh_t.codes_tiled.shape[1:] == (sh_t.codes_tiled.shape[1], 8, 256)
    # tile coordinates: every list starts on a tile boundary
    assert np.all(np.asarray(sh_t.list_start) % 256 == 0)
    sh_t = place_sharded(sh_t, mesh)
    d_sh, i_sh = sharded_search(
        sh_t, jnp.asarray(ds.xq[:8]), mesh=mesh, nprobe=8, k=10,
        windows=32, seg=256, group=4, use_approx=False, backend="seg",
        interpret=True, lut_bf16=True)
    single = IVFSearcher(idx, SearchConfig(nprobe=8, k=10, backend="seg",
                                           use_approx_topk=False))
    d_ref, i_ref = single.search(ds.xq[:8])
    np.testing.assert_allclose(np.asarray(d_sh), d_ref, rtol=1e-4, atol=1e-3)
    agree = np.asarray(i_sh) == i_ref
    close = np.abs(np.asarray(d_sh) - d_ref) < 1e-2
    assert np.all(agree | close)


def test_sharded_2d_tiled_production_layout(setup):
    """The v5e-16 serving layout (north-star config #3): 2-D mesh
    (data × lists), tiled kernel, packed-bf16 LUTs, hierarchical L1
    selection — must match the single-device exact search."""
    from chamjax.parallel.sharded_search import sharded_search_2d
    from jax.sharding import NamedSharding, PartitionSpec as P
    ds, idx = setup
    mesh = make_mesh((("data", 2), ("lists", 4)), devices=jax.devices()[:8])
    sh = place_sharded(shard_index(idx, 4, tile_seg=256), mesh)
    q = jax.device_put(jnp.asarray(ds.xq[:8]),
                       NamedSharding(mesh, P("data")))
    d_sh, i_sh = sharded_search_2d(
        sh, q, mesh=mesh, nprobe=8, k=10, windows=32, seg=256, group=4,
        use_approx=True, backend="seg", interpret=True, lut_bf16=True,
        select_l1=256)
    single = IVFSearcher(idx, SearchConfig(nprobe=8, k=10, backend="seg",
                                           use_approx_topk=False))
    d_ref, i_ref = single.search(ds.xq[:8])
    # approx+L1 selection on CPU interpret is exact at these shapes
    np.testing.assert_allclose(np.asarray(d_sh), d_ref, rtol=1e-4, atol=1e-3)
    agree = np.asarray(i_sh) == i_ref
    close = np.abs(np.asarray(d_sh) - d_ref) < 1e-2
    assert np.all(agree | close)


def test_sharded_2d_coarse_is_batch_sharded(setup):
    """Coarse scan + LUTs are computed ONCE outside shard_map (VERDICT r3
    #5): in the 2-D layout the compiled per-device program must run the
    coarse matmul on its b/dp batch shard, never on the full replicated
    batch (which would redo it lists× across the mesh)."""
    from chamjax.parallel.sharded_search import sharded_search_2d
    from jax.sharding import NamedSharding, PartitionSpec as P
    ds, idx = setup
    mesh = make_mesh((("data", 2), ("lists", 4)), devices=jax.devices()[:8])
    sh = place_sharded(shard_index(idx, 4, tile_seg=256), mesh)
    q = jax.device_put(jnp.asarray(ds.xq[:8]),
                       NamedSharding(mesh, P("data")))
    lowered = sharded_search_2d.lower(
        sh, q, mesh=mesh, nprobe=8, k=10, windows=32, seg=256, group=4,
        use_approx=False, backend="seg", interpret=True, lut_bf16=True)
    txt = lowered.compile().as_text()
    # per-device coarse dot: (b/dp=4, d) × (d, nlist=64).  A full-batch
    # replicated coarse would emit an f32[8,64] dot instead.
    bad = [ln for ln in txt.splitlines()
           if "dot(" in ln and "f32[8,64]" in ln]
    assert not bad, f"coarse matmul runs on the full batch: {bad[:2]}"
    good = [ln for ln in txt.splitlines()
            if "dot(" in ln and "f32[4,64]" in ln]
    assert good, "no batch-sharded coarse dot found in compiled HLO"


def test_sharded_2d_merge_collective_shapes(setup):
    """The 2-D layout's only large collective is the top-k merge: an
    all-gather of each chip's (b_local, k) dists + ids along ``lists``
    (S·b_local·k elements) — the shapes ``perf_model.mesh_search_model``
    prices.  A query/LUT/candidate-buffer gather sneaking into the
    compiled program would show up here as an oversized all-gather."""
    import re
    from chamjax.parallel.sharded_search import sharded_search_2d
    from jax.sharding import NamedSharding, PartitionSpec as P
    ds, idx = setup
    S, dp, b, k = 4, 2, 8, 10
    mesh = make_mesh((("data", dp), ("lists", S)),
                     devices=jax.devices()[:8])
    sh = place_sharded(shard_index(idx, S, tile_seg=256), mesh)
    q = jax.device_put(jnp.asarray(ds.xq[:b]),
                       NamedSharding(mesh, P("data")))
    txt = sharded_search_2d.lower(
        sh, q, mesh=mesh, nprobe=8, k=k, windows=32, seg=256, group=4,
        use_approx=False, backend="seg", interpret=True,
        lut_bf16=True).compile().as_text()
    merge_elems = S * (b // dp) * k                     # model's payload
    ag_shapes = []
    for ln in txt.splitlines():
        if "all-gather" not in ln:
            continue
        for dt, dims in re.findall(r"(f32|s32|u32|bf16)\[([\d,]+)\]", ln):
            n_el = int(np.prod([int(x) for x in dims.split(",")]))
            ag_shapes.append((dt, n_el))
    assert any(dt == "f32" and n == merge_elems for dt, n in ag_shapes), \
        f"no f32 merge all-gather of {merge_elems} elems in {ag_shapes}"
    assert any(dt in ("s32", "u32") and n == merge_elems
               for dt, n in ag_shapes), \
        f"no int merge all-gather of {merge_elems} elems in {ag_shapes}"
    big = [s for s in ag_shapes if s[1] > 4 * merge_elems]
    assert not big, f"oversized collective(s) beyond the modeled merge: {big}"


def test_sharded_device_build_tiled(setup):
    """build_ivfpq_device_sharded(tile_seg=...) emits tile-aligned shards
    that search correctly through the block kernel."""
    from chamjax.index import build_ivfpq_device_sharded
    ds, _ = setup
    xb = jnp.asarray(ds.xb[:8192])
    cfg = IndexConfig(dim=32, nlist=16, m=8, list_pad=64)
    mesh = make_mesh((("lists", 2),), devices=jax.devices()[:2])
    sh, info = build_ivfpq_device_sharded(
        lambda s, c: xb[s:s + c], 8192, cfg, jnp.asarray(ds.xt[:4000]), 2,
        kmeans_iters=2, pq_iters=2, chunk=4096, block=256, tile_seg=256)
    assert sh.codes_t is None and sh.codes_tiled is not None
    assert sh.codes_tiled.shape[0] == 2
    assert sh.codes_tiled.shape[2:] == (8, 256)
    assert np.all(np.asarray(sh.list_start) % 256 == 0)
    # every id present exactly once across shards
    all_ids = np.asarray(sh.ids).ravel()
    valid = np.sort(all_ids[all_ids >= 0])
    np.testing.assert_array_equal(valid, np.arange(8192))
    sh = place_sharded(sh, mesh)
    d_sh, i_sh = sharded_search(
        sh, jnp.asarray(ds.xq[:4]), mesh=mesh, nprobe=4, k=5,
        windows=16, seg=256, group=2, use_approx=False, backend="seg",
        interpret=True)
    assert d_sh.shape == (4, 5)
    assert np.all(np.isfinite(np.asarray(d_sh)))
    assert np.all(np.asarray(i_sh) >= 0)


def test_sharded_opq_matches_single_device(setup):
    """OPQ plumbed through the mesh tier (round 4): shard_index carries
    the rotation, sharded_search rotates queries before the coarse scan —
    results must match the single-device OPQ searcher."""
    ds, _ = setup
    cfg = IndexConfig(dim=32, nlist=64, m=8, list_pad=128, opq=True)
    idx = build_ivfpq(ds.xb, cfg, xt=ds.xt, kmeans_iters=4, pq_iters=4)
    assert idx.opq_R is not None
    mesh = make_mesh((("lists", 2),), devices=jax.devices()[:2])
    sh = place_sharded(shard_index(idx, 2, tile_seg=256), mesh)
    assert sh.opq_R is not None
    d_sh, i_sh = sharded_search(
        sh, jnp.asarray(ds.xq[:8]), mesh=mesh, nprobe=8, k=10,
        windows=32, seg=256, group=4, use_approx=False, backend="seg",
        interpret=True, lut_bf16=True)
    single = IVFSearcher(idx, SearchConfig(nprobe=8, k=10, backend="seg",
                                           use_approx_topk=False))
    d_ref, i_ref = single.search(ds.xq[:8])
    np.testing.assert_allclose(np.asarray(d_sh), d_ref, rtol=1e-4, atol=1e-3)
    agree = np.asarray(i_sh) == i_ref
    close = np.abs(np.asarray(d_sh) - d_ref) < 1e-2
    assert np.all(agree | close)


def test_sharded_device_build_opq(setup):
    """build_ivfpq_device_sharded with cfg.opq trains a global rotation
    and returns it on the ShardedIVF (the assert that forbade this is
    gone)."""
    from chamjax.index import build_ivfpq_device_sharded
    ds, _ = setup
    xb = jnp.asarray(ds.xb[:8192])
    cfg = IndexConfig(dim=32, nlist=16, m=8, list_pad=64, opq=True)
    mesh = make_mesh((("lists", 2),), devices=jax.devices()[:2])
    sh, info = build_ivfpq_device_sharded(
        lambda s, c: xb[s:s + c], 8192, cfg, jnp.asarray(ds.xt[:4000]), 2,
        kmeans_iters=2, pq_iters=2, chunk=4096, block=256, tile_seg=256)
    assert sh.opq_R is not None and sh.opq_R.shape == (32, 32)
    sh = place_sharded(sh, mesh)
    d_sh, i_sh = sharded_search(
        sh, jnp.asarray(ds.xq[:4]), mesh=mesh, nprobe=4, k=5,
        windows=16, seg=256, group=2, use_approx=False, backend="seg",
        interpret=True)
    assert np.all(np.isfinite(np.asarray(d_sh)))
    assert np.all(np.asarray(i_sh) >= 0)


def test_shard_index_many_empty_lists():
    """Empty lists cost one list_pad slot in the pack loop — the load
    accounting must count them identically, or a shard collecting many
    empties overruns its n_pad_sh sizing (numpy broadcast crash) and all
    empties pile onto one shard (argmin never moves on +0)."""
    ds = synthetic_dataset(nb=40_000, nq=4, nt=20_000, d=16, seed=11,
                           n_clusters=512)
    # train centroids on the full spread, then populate with rows from a
    # thin slice of it: most of the 512 lists end up EMPTY (kmeans
    # reseeding can no longer fill them — the corpus itself is narrow)
    from chamjax.index.factory import train_quantizers, populate
    cfg = IndexConfig(dim=16, nlist=512, m=4, list_pad=64)
    tq = train_quantizers(ds.xt, cfg, kmeans_iters=6, pq_iters=4)
    idx = populate(ds.xb[:200], tq)
    assert int((idx.list_len == 0).sum()) > 256   # the regression regime
    sh = shard_index(idx, 4)                      # crashed before the fix
    lens = np.asarray(sh.list_len)
    np.testing.assert_array_equal(lens.sum(axis=0), idx.list_len)
    all_ids = np.asarray(sh.ids).ravel()
    valid = np.sort(all_ids[all_ids >= 0])
    np.testing.assert_array_equal(valid, np.arange(idx.ntotal))
    # empties spread across shards, not all on one
    owner_has_empty = ((lens == 0) & (np.asarray(sh.list_start) >= 0)).sum(1)
    assert int(owner_has_empty.max()) < 512


def test_sharded_seg_probe_concentration_matches_single():
    """Worst-case budget regression: all probes land on multi-segment
    lists that one shard owns — the per-shard window budget must cover
    them (the old global/n_shards heuristic silently truncated the scan
    and dropped true neighbours)."""
    ds = synthetic_dataset(nb=24_000, nq=16, nt=6000, d=16, seed=13,
                           n_clusters=3)
    # 3 giant clusters over 16 lists: a few huge (multi-segment) lists own
    # nearly all rows, and every query's probes concentrate on them
    idx = build_ivfpq(ds.xb, IndexConfig(dim=16, nlist=16, m=4,
                                         list_pad=64),
                      xt=ds.xt, kmeans_iters=4, pq_iters=4)
    from chamjax.searcher import auto_seg, auto_windows
    seg = auto_seg(idx.list_len)
    W = auto_windows(idx.list_len, seg, 4)
    mesh = make_mesh((("lists", 4),), devices=jax.devices()[:4])
    sh = place_sharded(shard_index(idx, 4), mesh)
    d_sh, i_sh = sharded_search(
        sh, jnp.asarray(ds.xq), mesh=mesh, nprobe=4, k=10,
        windows=W, seg=seg, group=2, use_approx=False, backend="seg",
        interpret=True)
    single = IVFSearcher(idx, SearchConfig(nprobe=4, k=10, backend="seg",
                                           seg_group=2, lut_bf16=False,
                                           use_approx_topk=False))
    d_1, i_1 = single.search(ds.xq)
    np.testing.assert_allclose(np.asarray(d_sh), d_1, rtol=1e-4, atol=1e-3)
    same = np.asarray(i_sh) == i_1
    close = np.abs(np.asarray(d_sh) - d_1) < 1e-3
    assert np.all(same | close)
