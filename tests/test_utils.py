"""Tests for the experiment-layer utilities: result store, probabilistic
sizing, analytic perf model."""

import math
import os

import numpy as np
import pytest

from chamjax.index import sizing
from chamjax.utils import ResultStore
from chamjax import perf_model as pm


# --- ResultStore (reference nested-dict pickle contract) -------------------

def test_result_store_roundtrip(tmp_path):
    path = str(tmp_path / "res.pkl")
    s = ResultStore(path)
    key = ("SIFT1M", "IVF1024,PQ16", "1tpu", 100, 32, 8)
    assert s.should_run(key)
    s.put(key, {"QPS": 1000.0, "R@10": 0.9})
    s.save()

    # reload: cached point is skipped unless overwrite
    s2 = ResultStore(path, load=True, overwrite=False)
    assert not s2.should_run(key)
    assert s2.get(key)["QPS"] == 1000.0
    s3 = ResultStore(path, load=True, overwrite=True)
    assert s3.should_run(key)

    # update merges metrics into an existing leaf
    s2.update(key, latency_ms=1.5)
    assert s2.get(key)["latency_ms"] == 1.5
    assert s2.get(key)["R@10"] == 0.9

    # walk yields leaves
    leaves = list(s2.walk())
    assert len(leaves) == 1
    assert leaves[0][0] == tuple(str(k) for k in key)

    # json sidecar written
    assert os.path.exists(path + ".json")


def test_result_store_no_load(tmp_path):
    path = str(tmp_path / "res.pkl")
    ResultStore(path).put(("a",), {"x": 1}) or ResultStore(path).save
    s = ResultStore(path, load=False)
    assert s.d == {}


# --- probabilistic partial-k sizing (reference queue-sizing model) ----------

def test_binom_tail_exact():
    # P(B(2, 0.5) > 0) = 0.75 ; > 1 = 0.25 ; > 2 = 0
    assert math.isclose(sizing.binom_tail(2, 0.5, 0), 0.75, rel_tol=1e-12)
    assert math.isclose(sizing.binom_tail(2, 0.5, 1), 0.25, rel_tol=1e-12)
    assert sizing.binom_tail(2, 0.5, 2) == 0.0


def test_partial_k_matches_reference_regime():
    # The reference's L1 table (constants.hpp:22-31): for topK=100 spread
    # over 2*ADC_PE_NUM queues, truncated lengths are 10-38 — i.e. far less
    # than 100.  Our model must land in the same regime: k_part << k and
    # monotone in n_parts.
    k = 100
    k32 = sizing.partial_k(k, 32, p_fail=1e-4)
    k8 = sizing.partial_k(k, 8, p_fail=1e-4)
    k2 = sizing.partial_k(k, 2, p_fail=1e-4)
    assert k32 < k8 < k2 <= k
    assert 5 <= k32 <= 25          # ~15 expected
    assert sizing.partial_k(k, 1) == k
    # the bound must actually hold
    assert sizing.overflow_probability(k, 32, k32) < 1e-4
    assert sizing.overflow_probability(k, 32, k32 - 2) > 1e-4


def test_expected_recall_loss_small():
    k_part = sizing.partial_k(100, 16, p_fail=1e-4)
    assert sizing.expected_recall_loss(100, 16, k_part) < 1e-4


def test_scan_len_quantile():
    sizes = [100] * 99 + [10_000]
    sl = sizing.scan_len_for_quantile(sizes, nprobe=8, quantile=0.99, pad=128)
    assert sl <= 10_000 and sl % 128 == 0
    assert sizing.truncated_mass(sizes, sl) <= 0.5
    assert sizing.truncated_mass(sizes, 10_000) == 0.0


# --- analytic perf model ----------------------------------------------------

def test_scan_qps_roofline_reference_point():
    # Reference model point (perf_model.py:39-46): SIFT1000M, nlist=32768,
    # nprobe=32, m=16 at 32 GB/s ⇒ ~2048 QPS.  Same formula at the FPGA's
    # bandwidth must reproduce that; v5e HBM must beat it ~25x.
    fpga = pm.TpuSpec(name="u250", hbm_gbps=32.0)
    qps_fpga = pm.scan_qps_roofline(10**9, 32768, 32, 16, spec=fpga)
    assert 1800 < qps_fpga < 2300
    qps_v5e = pm.scan_qps_roofline(10**9, 32768, 32, 16, spec=pm.V5E)
    assert qps_v5e / qps_fpga > 20


def test_search_latency_model_shape():
    out = pm.search_latency_model(10**8, 4096, 32, 16, 128, batch=32)
    assert out["t_total_s"] > 0 and 0 < out["scan_fraction"] < 1
    assert out["qps"] == pytest.approx(32 / out["t_total_s"])
    # at 100M scale the scan dominates LUT+coarse
    assert out["scan_fraction"] > 0.5


def test_ralm_throughput_overlap_gain():
    model = {"embed_dim": 512, "ffn_embed_dim": 2048, "layers": 24,
             "max_seq_len": 512}
    tik = pm.ralm_throughput_model(model, 10**8, 4096, 32, 16, 512,
                                   batch=64, tiktok=True)
    seq = pm.ralm_throughput_model(model, 10**8, 4096, 32, 16, 512,
                                   batch=64, tiktok=False)
    # overlap can only help, and by at most 2x
    assert 1.0 <= seq["t_step_s"] / tik["t_step_s"] <= 2.0
    assert tik["tokens_per_sec"] >= seq["tokens_per_sec"]


def test_search_latency_model_calibration_100m():
    # Round-2 measured point (RESULTS.md 100M A/B): b=128, nprobe=32,
    # nlist=65536, m=16, seg=2048, W=69, packed-bf16 LUTs, rt=0.99 —
    # scan 1.26 ms/batch, select 1.10 ms/batch on the v5e.
    out = pm.search_latency_model(
        96 * (1 << 20), 65536, 32, 16, 128, batch=128,
        lut_bf16=True, recall_target=0.99, seg=2048, windows=69)
    assert out["t_scan_s"] * 1e3 == pytest.approx(1.26, rel=0.15)
    assert out["t_select_s"] * 1e3 == pytest.approx(1.10, rel=0.15)
    # the same point at recall_target 0.9 makes selection near-free
    cheap = pm.search_latency_model(
        96 * (1 << 20), 65536, 32, 16, 128, batch=128,
        lut_bf16=True, recall_target=0.9, seg=2048, windows=69)
    assert cheap["t_select_s"] < 0.15 * out["t_select_s"]


def test_search_latency_model_coarse_selection():
    # Round-2 measured coarse points (RESULTS.md "Two-stage coarse scan"):
    # b=128, nlist=65536 — exact full sort 1.02 ms, two-stage 0.090 ms.
    kw = dict(dbsize=96 * (1 << 20), nlist=65536, nprobe=32, m=16, dim=128,
              batch=128, lut_bf16=True, seg=2048, windows=69)
    sort = pm.search_latency_model(coarse_2stage=False, **kw)
    two = pm.search_latency_model(coarse_2stage=True, **kw)
    assert sort["t_coarse_s"] * 1e3 == pytest.approx(1.02, rel=0.2)
    assert two["t_coarse_s"] * 1e3 == pytest.approx(0.09, rel=0.35)
    assert two["t_total_s"] < sort["t_total_s"]


def test_mesh_search_model_merge_term():
    # 2-D production layout (dp=1, lists=8) at the 1B table's shapes: the
    # merge all-gather must be priced, be a small fraction of the batch,
    # and the predicted mesh QPS must land between the per-shard ideal
    # (zero-cost merge) and a visible fraction of it.
    out = pm.mesh_search_model(1 << 30, 65536, 32, 16, 128, batch=128,
                               n_list_shards=8, dp=1, k=100,
                               lut_bf16=True, recall_target=0.99,
                               seg=2048, windows=69)
    assert out["t_merge_s"] > 0
    assert out["merge_fraction"] < 0.1          # sub-ms vs the ms-scale scan
    ideal = 128 / out["per_chip_t_total_s"]
    assert 0.85 * ideal < out["qps"] < ideal
    # merge time scales with shard count and payload
    big = pm.merge_all_gather_time(100, 16, 128)
    small = pm.merge_all_gather_time(100, 2, 128)
    assert big > small


def test_report_tables_from_result_store(tmp_path):
    """The report layer (benchmarks/report.py) renders markdown/LaTeX
    tables from real ResultStore pickles — previously untested by CI."""
    import sys
    sys.path.insert(0, ".")
    from benchmarks.report import collect, to_markdown, to_latex
    from chamjax.utils import ResultStore

    p = str(tmp_path / "r.pkl")
    store = ResultStore(p, load=False)
    store.put(("SYN1M", "IVF4096,PQ16", "1xv5e-seg", 100, 32, 128),
              {"QPS": 70962.0, "R@10": 0.883})
    store.put(("SYN1M", "IVF4096,PQ16", "cpu-native", 100, 32, 128),
              {"QPS": 713.0, "R@10": 0.883})
    store.save()

    rows = collect([p])
    assert len(rows) == 2
    md = to_markdown(rows, ["QPS", "R@10"])
    assert "| key | QPS | R@10 |" in md and "1xv5e-seg" in md
    assert "70,962" in md or "7.096e+04" in md
    tex = to_latex(rows, ["QPS", "R@10"])
    assert "\\begin{tabular}" in tex and "cpu-native" in tex


def test_plot_results_renders_pngs(tmp_path):
    """plot_results.py renders figures from a ResultStore (smoke; CI-gates
    the previously-untested plotting layer)."""
    import subprocess
    import sys as _sys
    from chamjax.utils import ResultStore

    p = str(tmp_path / "r.pkl")
    store = ResultStore(p, load=False)
    for batch, qps, r10, lat in ((1, 900.0, 0.88, 1.1),
                                 (128, 70000.0, 0.883, 1.8)):
        store.put(("SYN1M", "IVF4096,PQ16", "1xv5e-seg", 100, 32, batch),
                  {"QPS": qps, "R@10": r10, "latency_ms_p50": lat})
    store.save()
    out_dir = str(tmp_path / "figs")
    rc = subprocess.run(
        [_sys.executable, "benchmarks/plot_results.py", p,
         "--out_dir", out_dir],
        capture_output=True, text=True, timeout=240)
    assert rc.returncode == 0, rc.stderr[-2000:]
    import os as _os
    made = _os.listdir(out_dir)
    assert "recall_qps.png" in made and "latency_batch.png" in made
