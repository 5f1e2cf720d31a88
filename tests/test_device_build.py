"""Streamed device-resident build (`chamjax.index.device_build`).

Oracles: the host build path (`build_ivfpq` + `_pack_lists`) and exact
brute-force ground truth — the same verification ladder the reference uses
for its offline pipeline (recall vs GT as the system oracle, SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chamjax.config import IndexConfig, SearchConfig
from chamjax.data import synthetic_dataset
from chamjax.data.ground_truth import compute_ground_truth
from chamjax.eval import recall_at_k
from chamjax.index import build_ivfpq_device, compute_ground_truth_streamed
from chamjax.index.device_build import (
    _assign_exact_2stage, _pack_codes_t, _pack_layout, lloyd_device,
)
from chamjax.index.ivf import _pack_lists
from chamjax.searcher import auto_seg, auto_windows, ivfpq_search


BLOCK = 256


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(nb=20_000, nq=32, nt=6000, d=32, seed=3,
                             n_clusters=64)


def _draw(xb):
    return lambda s, c: jnp.asarray(xb[s:s + c], jnp.float32)


def test_assign_2stage_matches_exact(rng):
    x = rng.standard_normal((512, 16)).astype(np.float32)
    cent = rng.standard_normal((64, 16)).astype(np.float32)
    a = np.asarray(_assign_exact_2stage(
        jnp.asarray(x), jnp.asarray(cent), cand=8))
    ref = np.argmin(((x[:, None] - cent[None]) ** 2).sum(-1), axis=1)
    # CPU stage-1 runs fp32 so the shortlist always holds the argmin
    np.testing.assert_array_equal(a, ref)


def test_lloyd_device_recovers_clusters(rng):
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 10
    x = (centers[rng.integers(0, 8, 2048)]
         + rng.standard_normal((2048, 16)).astype(np.float32) * 0.1)
    cent = np.asarray(lloyd_device(jnp.asarray(x), 8, iters=8, block=BLOCK))
    d = ((centers[:, None] - cent[None]) ** 2).sum(-1).min(1)
    assert np.all(d < 1.0)


def test_lloyd_device_tail_and_small_n(rng):
    """Lloyd must use ALL rows: the n % block tail contributes to every
    iteration's statistics, and n < block (zero full blocks) must still
    train rather than degenerate to jittered random init."""
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 10
    for n in (BLOCK - 56, 2 * BLOCK + 100):     # n < block; ragged tail
        x = (centers[rng.integers(0, 8, n)]
             + rng.standard_normal((n, 16)).astype(np.float32) * 0.1)
        cent = np.asarray(
            lloyd_device(jnp.asarray(x), 8, iters=8, block=BLOCK))
        d = ((centers[:, None] - cent[None]) ** 2).sum(-1).min(1)
        assert np.all(d < 1.0), (n, d)


def test_pack_layout_matches_host_pack(rng):
    n, nlist, m, list_pad = 3000, 16, 4, 32
    assignment = rng.integers(0, nlist, n).astype(np.int32)
    codes = rng.integers(0, 256, (n, m)).astype(np.uint8)
    h_codes, h_ids, h_start, h_len = _pack_lists(
        assignment, codes, nlist, list_pad, tail_pad=0)
    cap = n + nlist * list_pad + 64
    g_ids, d_start, d_len = _pack_layout(
        jnp.asarray(assignment), nlist=nlist, list_pad=list_pad, cap=cap)
    codes_t = np.asarray(_pack_codes_t(jnp.asarray(codes), g_ids))
    g_ids, d_start, d_len = map(np.asarray, (g_ids, d_start, d_len))
    np.testing.assert_array_equal(d_len, h_len)
    np.testing.assert_array_equal(d_start, h_start)
    # per-list contents identical to the host packer
    for l in range(nlist):
        s, ln = h_start[l], h_len[l]
        np.testing.assert_array_equal(g_ids[s:s + ln], h_ids[s:s + ln])
        np.testing.assert_array_equal(codes_t[:, s:s + ln].T,
                                      h_codes[s:s + ln])
    # padding slots are invalid everywhere
    pad_mask = np.ones(cap, bool)
    for l in range(nlist):
        pad_mask[h_start[l]:h_start[l] + h_len[l]] = False
    assert np.all(g_ids[pad_mask] == -1)
    # every row id appears exactly once
    assert np.array_equal(np.sort(g_ids[~pad_mask]), np.arange(n))


def test_pack_codes_t_chunked_matches_oneshot(rng, monkeypatch):
    """The chunked low-peak-HBM pack (engaged past _PACK_CHUNK_BYTES; the
    one-shot pack's ~3x-corpus live set OOMs a 16 GB chip near 256M rows)
    must be byte-identical to the one-shot pack, tail chunk included."""
    from chamjax.index import device_build as db
    n, m, cap = 5000, 4, 6208
    codes = jnp.asarray(rng.integers(0, 256, (n, m)).astype(np.uint8))
    gids = rng.integers(-1, n, cap).astype(np.int32)
    gids[cap - 7:] = -1                      # ragged tail padding
    gids = jnp.asarray(gids)
    one = np.asarray(db._pack_codes_t_oneshot(codes, gids))
    monkeypatch.setattr(db, "_PACK_CHUNK_BYTES", 0)
    monkeypatch.setattr(db, "_PACK_CHUNK_COLS", 1 << 10)  # forces a tail
    chunked = np.asarray(db._pack_codes_t(codes, gids))
    np.testing.assert_array_equal(chunked, one)


def test_pack_codes_tiled_matches_flat_retile(rng, monkeypatch):
    """The direct-to-tiled pack (tile_only builds: no flat twin, no
    2x-slab retile peak — the 1B PQ32 shard OOM fix) must match the
    flat-pack-then-retile layout exactly, across chunk boundaries and
    the tail chunk."""
    from chamjax.index import device_build as db
    n, m, seg = 5000, 4, 64
    cap = 6208                               # 97 tiles
    codes = jnp.asarray(rng.integers(0, 256, (n, m)).astype(np.uint8))
    gids = rng.integers(-1, n, cap).astype(np.int32)
    gids[cap - 7:] = -1
    gids = jnp.asarray(gids)
    flat = np.asarray(db._pack_codes_t_oneshot(codes, gids))
    want = (flat.reshape(m, cap // seg, seg).transpose(1, 0, 2))
    monkeypatch.setattr(db, "_PACK_CHUNK_COLS", 1 << 10)  # multi-chunk+tail
    tiled = np.asarray(db._pack_codes_tiled(codes, gids, seg))
    np.testing.assert_array_equal(tiled, want)


def test_gt_streamed_matches_exact(ds):
    gt, gd = compute_ground_truth(ds.xb, ds.xq, k=10)
    gt_s, gd_s = compute_ground_truth_streamed(
        _draw(ds.xb), ds.nb, jnp.asarray(ds.xq), k=10,
        chunk=4096, block=1024)
    np.testing.assert_array_equal(gt, gt_s)
    np.testing.assert_allclose(gd, gd_s, rtol=1e-4, atol=1e-3)


def test_build_device_end_to_end_recall(ds):
    cfg = IndexConfig(dim=32, nlist=64, m=8, list_pad=64)
    dev, info = build_ivfpq_device(
        _draw(ds.xb), ds.nb, cfg, jnp.asarray(ds.xt),
        kmeans_iters=6, pq_iters=6, chunk=8192, block=BLOCK)
    assert info["ntotal"] == ds.nb
    assert int(info["list_len"].sum()) == info["ntotal"]
    gt, _ = compute_ground_truth(ds.xb, ds.xq, k=10)
    seg = auto_seg(info["list_len"])
    W = auto_windows(info["list_len"], seg, nprobe=16)
    d, i = ivfpq_search(dev, jnp.asarray(ds.xq), nprobe=16, k=10,
                        windows=W, seg=seg, group=2, use_approx=False,
                        backend="seg", interpret=True)
    r = recall_at_k(np.asarray(i), gt, 10)
    # same regime as the host-path build on this corpus (≈ ADC ceiling)
    assert r >= 0.75, r
    # distances are real (finite) and ids valid
    assert np.isfinite(np.asarray(d)).all()
    assert (np.asarray(i) >= 0).all()


def test_build_device_opq_on_anisotropic_data(rng):
    """OPQ in the streamed build: must run end-to-end and not lose recall
    on data with strong cross-subspace correlation (where the learned
    rotation earns its keep)."""
    n, d = 12000, 32
    # anisotropic: low-rank structure + per-dim scaling
    z = rng.standard_normal((n, 6)).astype(np.float32)
    mix = rng.standard_normal((6, d)).astype(np.float32) * 3.0
    x = z @ mix + rng.standard_normal((n, d)).astype(np.float32) * 0.05
    xq = x[:24] + rng.standard_normal((24, d)).astype(np.float32) * 0.02
    gt, _ = compute_ground_truth(x, xq, k=10)

    recalls = {}
    for opq in (False, True):
        cfg = IndexConfig(dim=d, nlist=32, m=8, list_pad=64, opq=opq)
        dev, info = build_ivfpq_device(
            _draw(x), n, cfg, jnp.asarray(x[:4000]),
            kmeans_iters=4, pq_iters=6, chunk=4096, block=BLOCK)
        assert (dev.opq_R is not None) == opq
        seg = auto_seg(info["list_len"])
        W = auto_windows(info["list_len"], seg, nprobe=16)
        _, i = ivfpq_search(dev, jnp.asarray(xq), nprobe=16, k=10,
                            windows=W, seg=seg, group=2, use_approx=False,
                            backend="seg", interpret=True)
        recalls[opq] = recall_at_k(np.asarray(i), gt, 10)
    assert recalls[True] >= recalls[False] - 0.02, recalls
    assert recalls[True] > 0.5, recalls


def test_sharded_streamed_build_matches_unsharded(ds):
    """build_ivfpq_device_sharded → place_sharded → sharded_search must
    reach the recall of the single-device streamed build, with shards
    row-balanced and partitioning all lists."""
    import jax
    from chamjax.index import build_ivfpq_device_sharded
    from chamjax.parallel import make_mesh, sharded_search
    from chamjax.parallel.sharded_search import place_sharded

    n_shards = 4
    cfg = IndexConfig(dim=32, nlist=64, m=8, list_pad=64)
    common = dict(kmeans_iters=6, pq_iters=6, chunk=8192, block=BLOCK)
    sh, info = build_ivfpq_device_sharded(
        _draw(ds.xb), ds.nb, cfg, jnp.asarray(ds.xt), n_shards, **common)
    assert sh.codes_t.shape[0] == n_shards
    # every list owned exactly once; per-shard lens partition the corpus
    assert int(info["list_len"].sum()) == ds.nb
    lens = np.asarray(sh.list_len)
    np.testing.assert_array_equal(lens.sum(axis=0), info["list_len"])
    assert (np.asarray(info["shard_rows"]) > 0).all()
    # balance: no shard exceeds 2x the mean padded load
    rows = np.asarray(info["shard_rows"], np.float64)
    assert rows.max() <= 2.0 * rows.mean()

    mesh = make_mesh((("lists", n_shards),),
                     devices=jax.devices()[:n_shards])
    placed = place_sharded(sh, mesh)
    d_s, i_s = sharded_search(placed, jnp.asarray(ds.xq), mesh=mesh,
                              nprobe=16, k=10, windows=40, seg=256, group=2,
                              use_approx=False, backend="seg",
                              interpret=True)
    gt, _ = compute_ground_truth(ds.xb, ds.xq, k=10)
    r_sh = recall_at_k(np.asarray(i_s), gt, 10)

    dev, dinfo = build_ivfpq_device(
        _draw(ds.xb), ds.nb, cfg, jnp.asarray(ds.xt), **common)
    seg = auto_seg(dinfo["list_len"])
    W = auto_windows(dinfo["list_len"], seg, 16)
    _, i_u = ivfpq_search(dev, jnp.asarray(ds.xq), nprobe=16, k=10,
                          windows=W, seg=seg, group=2, use_approx=False,
                          backend="seg", interpret=True)
    r_un = recall_at_k(np.asarray(i_u), gt, 10)
    assert r_sh >= r_un - 0.02, (r_sh, r_un)


def test_device_retriever_contract(ds):
    from chamjax.config import SearchConfig
    from chamjax.retrieval.local import DeviceRetriever
    cfg = IndexConfig(dim=32, nlist=64, m=8, list_pad=64)
    dev, info = build_ivfpq_device(
        _draw(ds.xb), ds.nb, cfg, jnp.asarray(ds.xt),
        kmeans_iters=4, pq_iters=4, chunk=8192, block=BLOCK)
    r = DeviceRetriever(dev, info["list_len"],
                        SearchConfig(nprobe=16, k=10))
    out = r.retrieve(ds.xq, nprobe=16, k=10)
    assert out.ids.shape == (ds.xq.shape[0], 10)
    gt, _ = compute_ground_truth(ds.xb, ds.xq, k=10)
    assert recall_at_k(out.ids, gt, 10) >= 0.7
    # fused path returns device arrays with the same content
    out_d = r.retrieve_device(jnp.asarray(ds.xq), nprobe=16, k=10)
    np.testing.assert_array_equal(np.asarray(out_d.ids), out.ids)


def test_build_device_preset_quantizers():
    """Shard-at-a-time 1B path: populate against frozen global quantizers
    must equal a normal build that trained them itself."""
    import jax.numpy as jnp
    from chamjax.index.device_build import build_ivfpq_device

    ds = synthetic_dataset(nb=6000, nq=8, nt=3000, d=32, seed=21,
                           n_clusters=32)
    cfg = IndexConfig(dim=32, nlist=32, m=8, list_pad=64)
    xb = jnp.asarray(ds.xb)

    def draw(s, c):
        return xb[s:s + c]

    dev_a, info_a = build_ivfpq_device(
        draw, ds.nb, cfg, jnp.asarray(ds.xt), kmeans_iters=4, pq_iters=4,
        chunk=4096, block=512)
    dev_b, info_b = build_ivfpq_device(
        draw, ds.nb, cfg, None, chunk=4096, block=512,
        quantizers=(dev_a.centroids, dev_a.codebooks, None))
    np.testing.assert_array_equal(np.asarray(dev_a.codes_t),
                                  np.asarray(dev_b.codes_t))
    np.testing.assert_array_equal(np.asarray(dev_a.ids),
                                  np.asarray(dev_b.ids))
    np.testing.assert_array_equal(info_a["list_len"], info_b["list_len"])


def test_rebalance_device_stability_and_cap(rng):
    """Parallel eviction rounds (`rebalance_assignment_device`): the cap is
    exact, every point lands in one of its candidate cells, and the result
    is STABLE — a point sits at rank r > 0 only if every better-ranked
    candidate cell is full of strictly nearer claimants (cells only ever
    trade claimants for nearer ones, so an eviction is never undone)."""
    from chamjax.index.device_build import rebalance_assignment_device

    n, k, C = 4000, 32, 6
    cells = np.stack([rng.permutation(k)[:C] for _ in range(n)]).astype(
        np.int32)
    d2 = np.sort(rng.random((n, C)).astype(np.float32), axis=1)
    cap = int(np.ceil(n / k * 1.1))
    a = np.asarray(rebalance_assignment_device(
        jnp.asarray(cells), jnp.asarray(d2), cap, hard=True))
    counts = np.bincount(a, minlength=k)
    assert counts.max() <= cap and counts.sum() == n
    rank = np.argmax(cells == a[:, None], axis=1)
    assert (cells[np.arange(n), rank] == a).all()   # within candidates
    d_final = d2[np.arange(n), rank]
    for p in np.flatnonzero(rank > 0):
        for j in range(rank[p]):
            cell = cells[p, j]
            assert counts[cell] == cap
            # ... of strictly nearer claimants
            members = np.flatnonzero(a == cell)
            mrank = np.argmax(cells[members] == cell, axis=1)
            md = d2[members, mrank]
            assert (md <= d2[p, j]).all()


def test_rebalance_device_straggler_modes(rng):
    """Overflow beyond every candidate: hard mode warns (the cap cannot
    hold); stragglers go home to their NEAREST cell in both modes — every
    candidate is full anyway, and the nearest cell keeps them findable."""
    import warnings as w
    from chamjax.index.device_build import rebalance_assignment_device

    # 3 cells, cap 2, 9 points all sharing candidate list [0, 1]: only 4
    # placements fit the cap, the other 5 are stragglers.
    n = 9
    cells = np.tile(np.array([[0, 1]], np.int32), (n, 1))
    d2 = np.sort(rng.random((n, 2)).astype(np.float32), axis=1)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        a_hard = np.asarray(rebalance_assignment_device(
            jnp.asarray(cells), jnp.asarray(d2), 2, hard=True))
    assert any("exhausted" in str(r.message) for r in rec)
    counts = np.bincount(a_hard, minlength=3)
    assert counts.sum() == n and counts[2] == 0
    assert counts[0] == 2 + 5       # cap-kept pair + the 5 stragglers home
    assert counts[1] == 2           # cell 1 holds the cap exactly
    # warn=False suppresses the straggler warning (balanced-Lloyd usage)
    with w.catch_warnings(record=True) as rec2:
        w.simplefilter("always")
        a_soft = np.asarray(rebalance_assignment_device(
            jnp.asarray(cells), jnp.asarray(d2), 2, hard=True, warn=False))
    assert not any("exhausted" in str(r.message) for r in rec2)
    np.testing.assert_array_equal(a_soft, a_hard)


def test_build_device_balanced_end_to_end(ds):
    """cfg.balanced + balance_hard through the streamed builder: the packed
    list table honors the cap (so auto_windows' worst-query bound
    collapses) at recall parity with the unbalanced build."""
    cfg_u = IndexConfig(dim=32, nlist=64, m=8, list_pad=64)
    cfg_b = IndexConfig(dim=32, nlist=64, m=8, list_pad=64, balanced=True,
                        balance_hard=True, balance_factor=1.6)
    gt, _ = compute_ground_truth(ds.xb, ds.xq, k=10)
    recalls, Ws = {}, {}
    for tag, cfg in (("unbal", cfg_u), ("bal", cfg_b)):
        dev, info = build_ivfpq_device(
            _draw(ds.xb), ds.nb, cfg, jnp.asarray(ds.xt),
            kmeans_iters=6, pq_iters=6, chunk=8192, block=BLOCK)
        assert int(info["list_len"].sum()) == ds.nb
        seg = auto_seg(info["list_len"])
        W = auto_windows(info["list_len"], seg, nprobe=16)
        d, i = ivfpq_search(dev, jnp.asarray(ds.xq), nprobe=16, k=10,
                            windows=W, seg=seg, group=2, use_approx=False,
                            backend="seg", interpret=True)
        recalls[tag] = recall_at_k(np.asarray(i), gt, 10)
        Ws[tag] = W
        if tag == "bal":
            cap = int(np.ceil(ds.nb / cfg.nlist * cfg.balance_factor))
            # hard mode may exceed the cap only by straggler fallback
            assert int(info["list_len"].max()) <= cap + info["stragglers"]
    # nlist == n_clusters regime: displacement is rare, recall holds
    assert recalls["bal"] >= recalls["unbal"] - 0.03, recalls
    assert Ws["bal"] <= Ws["unbal"], Ws


def test_lloyd_balanced_split_reseed_converges(rng):
    """Balanced-Lloyd with split-heavy reseeding on a SMOOTH skewed density
    (half the mass in a tight blob — the regime where capacity pressure
    alone was measured to stall at 6x cap): max cell must converge to ~cap
    within the builder's iteration budget, and a follow-up hard rebalance
    must place (nearly) everything within candidate cells."""
    from chamjax.index.device_build import (
        _topc_blocked, rebalance_assignment_device,
    )

    n, k, d = 16384, 64, 16
    dense = rng.standard_normal((n // 2, d)).astype(np.float32) * 0.3
    sparse = rng.standard_normal((n // 2, d)).astype(np.float32) * 4.0
    x = jnp.asarray(np.concatenate([dense, sparse]))
    cap = int(np.ceil(n / k * 1.3))
    cent = lloyd_device(x, k, iters=5, seed=0, block=BLOCK,
                        balance_cap=cap, balance_iters=8)
    cells, d2 = _topc_blocked(x, cent, block=BLOCK, c=8)
    a = np.asarray(rebalance_assignment_device(
        jnp.asarray(cells), jnp.asarray(d2), cap, hard=True, warn=False))
    counts = np.bincount(a, minlength=k)
    assert counts.sum() == n
    # marginal overflow from the final mean-update is allowed; the stall
    # mode this guards against left max cell at several-x cap
    assert counts.max() <= int(cap * 1.15), (counts.max(), cap)


def test_update_split_reseed_places_twins_on_member_points(rng):
    """Split-reseed invariants of `_update_from_assignment`: victims (the
    lightest-demand cells) are respawned AT REAL MEMBER POINTS of over-
    demand donor cells (jitter-twins are provably dead in high d — a random
    jitter direction is near-orthogonal to every (x - centroid)), survivors
    get the plain constrained-mean update, and cells inside the deadband
    (< 1.75x cap) are never split."""
    from chamjax.index.device_build import _update_from_assignment

    k, d, cap = 32, 8, 10
    # cell 0: 40 points (4x cap, needs 3 splits ≤ the k//8 = 4 seed
    # budget); cells 1..27: 9 points each (under cap); cells 28..31:
    # 1 point each (the victims)
    sizes = [40] + [9] * 27 + [1] * 4
    cent = rng.standard_normal((k, d)).astype(np.float32) * 10
    xs, nat = [], []
    for j, s in enumerate(sizes):
        xs.append(cent[j] + rng.standard_normal((s, d)).astype(np.float32))
        nat += [j] * s
    x = jnp.asarray(np.concatenate(xs))
    nat = jnp.asarray(np.array(nat, np.int32))
    new, _ = _update_from_assignment(
        x, nat, nat, jnp.asarray(cent), jax.random.PRNGKey(0),
        jnp.float32(cap), jnp.float32(1.0), jnp.float32(1.75))
    new = np.asarray(new)
    x_np = np.asarray(x)
    members0 = x_np[:40]
    for j in range(28, 31):
        # victim respawned exactly at a member point of cell 0
        dmin = np.min(np.linalg.norm(members0 - new[j], axis=1))
        assert dmin < 1e-5, (j, dmin)
    # distinct seeds: the three respawns are three different member points
    seeds = new[28:31]
    assert len({tuple(np.round(s, 4)) for s in seeds}) == 3
    # survivors under cap: plain mean update (cell 1 keeps its own mean)
    np.testing.assert_allclose(new[1], x_np[40:49].mean(axis=0), rtol=1e-5)


def test_build_device_balanced_parts_split(ds):
    """`balance_parts=2` (the peak-HBM part-split used by 1B shards): each
    contiguous part is rebalanced under cap/2, so the combined table still
    honors the full cap, nothing is dropped, and recall stays at parity
    with the single-part build."""
    cfg1 = IndexConfig(dim=32, nlist=64, m=8, list_pad=64, balanced=True,
                       balance_hard=True, balance_factor=1.6)
    cfg2 = IndexConfig(dim=32, nlist=64, m=8, list_pad=64, balanced=True,
                       balance_hard=True, balance_factor=1.6,
                       balance_parts=2)
    gt, _ = compute_ground_truth(ds.xb, ds.xq, k=10)
    recalls = {}
    for tag, cfg in (("p1", cfg1), ("p2", cfg2)):
        dev, info = build_ivfpq_device(
            _draw(ds.xb), ds.nb, cfg, jnp.asarray(ds.xt),
            kmeans_iters=6, pq_iters=6, chunk=8192, block=BLOCK)
        assert int(info["list_len"].sum()) == ds.nb
        cap = int(np.ceil(ds.nb / cfg.nlist * cfg.balance_factor))
        # hard mode may exceed the cap only by straggler fallback
        assert int(info["list_len"].max()) <= cap + info["stragglers"]
        seg = auto_seg(info["list_len"])
        W = auto_windows(info["list_len"], seg, nprobe=16)
        d, i = ivfpq_search(dev, jnp.asarray(ds.xq), nprobe=16, k=10,
                            windows=W, seg=seg, group=2, use_approx=False,
                            backend="seg", interpret=True)
        recalls[tag] = recall_at_k(np.asarray(i), gt, 10)
    assert recalls["p2"] >= recalls["p1"] - 0.03, recalls


def test_rebalance_device_per_cell_caps(rng):
    """Per-cell capacity arrays (the remaining-capacity part-split path):
    a zero-cap cell takes nothing (its would-be members flow to their next
    candidates), cells keep at most their own cap, nothing is dropped."""
    from chamjax.index.device_build import rebalance_assignment_device

    n, k, C = 600, 8, 4
    cells = np.stack([rng.permutation(k)[:C] for _ in range(n)]).astype(
        np.int32)
    d2 = np.sort(rng.random((n, C)).astype(np.float32), axis=1)
    caps = np.array([0, 40, 200, 200, 200, 200, 200, 200], np.int32)
    a = np.asarray(rebalance_assignment_device(
        jnp.asarray(cells), jnp.asarray(d2), jnp.asarray(caps), hard=True,
        warn=False))
    counts = np.bincount(a, minlength=k)
    assert counts.sum() == n
    assert counts[0] == 0          # zero-cap cell stays empty
    assert (counts <= caps).all(), counts


def test_rebalance_tau_skip_matches_one_step_reference():
    """τ-threshold skipping must reach the same deferred-acceptance
    fixpoint as the one-step-per-round reference (strict preferences via
    the iota tiebreak make the stable matching unique)."""
    import jax.numpy as jnp
    from chamjax.index.device_build import rebalance_assignment_device

    rng = np.random.default_rng(5)
    n, nlist, c = 5000, 32, 6
    cd_full = rng.random((n, nlist)).astype(np.float32)
    cand = np.argsort(cd_full, axis=1)[:, :c].astype(np.int32)
    cd = np.take_along_axis(cd_full, cand, axis=1)
    cap = int(np.ceil(n / nlist * 1.1))

    a_new = np.asarray(rebalance_assignment_device(
        jnp.asarray(cand), jnp.asarray(cd), cap, nlist=nlist, hard=True,
        warn=False))

    # reference: literal one-step-per-round eviction loop in numpy
    r = np.zeros(n, np.int64)
    for _ in range(200):
        a = cand[np.arange(n), r]
        d = cd[np.arange(n), r]
        order = np.lexsort((np.arange(n), d, a))
        sa = a[order]
        pos = np.arange(n) - np.maximum.accumulate(
            np.where(np.r_[True, sa[1:] != sa[:-1]], np.arange(n), 0))
        evict = np.zeros(n, bool)
        evict[order] = pos >= cap
        can = evict & (r < c - 1)
        if not can.any():
            break
        r[can] += 1
    a_ref = cand[np.arange(n), r]
    evict_final = np.zeros(n, bool)
    # stragglers revert to nearest in the device version; mirror that
    a = cand[np.arange(n), r]
    d = cd[np.arange(n), r]
    order = np.lexsort((np.arange(n), d, a))
    sa = a[order]
    pos = np.arange(n) - np.maximum.accumulate(
        np.where(np.r_[True, sa[1:] != sa[:-1]], np.arange(n), 0))
    evict_final[order] = pos >= cap
    a_ref = np.where(evict_final, cand[:, 0], a_ref)

    np.testing.assert_array_equal(a_new, a_ref)
    counts = np.bincount(a_new, minlength=nlist)
    assert counts.max() <= cap or evict_final.any()


def test_build_tile_seg_attaches_tiled_twin():
    """build_ivfpq_device(tile_seg=...): tile-aligned pack + codes_tiled,
    search results equal the untiled build."""
    import jax.numpy as jnp
    from chamjax.index.device_build import build_ivfpq_device
    from chamjax.searcher import ivfpq_search

    rng = np.random.default_rng(7)
    n, d, nlist, seg = 6000, 16, 16, 128
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xt = jnp.asarray(xb[:3000])

    def draw(s, c):
        return jnp.asarray(xb[s:s + c])

    cfg = IndexConfig(dim=d, nlist=nlist, m=4, list_pad=64)
    dev_t, info_t = build_ivfpq_device(draw, n, cfg, xt, kmeans_iters=3,
                                       pq_iters=3, tile_seg=seg,
                                       chunk=2048, block=256)
    dev_f, info_f = build_ivfpq_device(draw, n, cfg, xt, kmeans_iters=3,
                                       pq_iters=3, chunk=2048, block=256)
    assert dev_t.codes_tiled is not None
    assert dev_t.codes_tiled.shape[1:] == (4, seg)
    assert np.all(np.asarray(dev_t.list_start) % seg == 0)
    np.testing.assert_array_equal(info_t["list_len"], info_f["list_len"])

    q = jnp.asarray(xb[:8])
    kw = dict(nprobe=8, k=10, windows=32, seg=seg, group=8,
              use_approx=False, coarse_cand=0, interpret=True)
    d_t, i_t = ivfpq_search(dev_t, q, **kw)
    d_f, i_f = ivfpq_search(dev_f, q, **kw)
    np.testing.assert_allclose(np.asarray(d_t), np.asarray(d_f),
                               rtol=1e-5, atol=1e-5)
    agree = np.asarray(i_t) == np.asarray(i_f)
    close = np.abs(np.asarray(d_t) - np.asarray(d_f)) < 1e-4
    assert np.all(agree | close)

    # tile_only: the flat twin is dropped (PQ32/PQ64 1B shards can't
    # afford two resident layouts) and the tiled search still matches
    dev_o, _ = build_ivfpq_device(draw, n, cfg, xt, kmeans_iters=3,
                                  pq_iters=3, tile_seg=seg,
                                  tile_only=True, chunk=2048, block=256)
    assert dev_o.codes_t is None and dev_o.codes_tiled is not None
    d_o, i_o = ivfpq_search(dev_o, q, **kw)
    np.testing.assert_allclose(np.asarray(d_o), np.asarray(d_t),
                               rtol=1e-5, atol=1e-5)
