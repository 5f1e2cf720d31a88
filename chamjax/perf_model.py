"""Analytical performance model for TPU IVF-PQ search and RALM serving.

TPU-native analogue of the reference's closed-form models
(``performance_modeling/perf_model.py:1-80`` — FPGA PQ-scan QPS is
DRAM-bandwidth-bound at ``32 GB/s / (nprobe/nlist · dbsize · m)``;
``performance_modeling/FPGA_LUT_construction.py`` — LUT cycle model).
Here the rooflines are a TPU chip's: HBM bandwidth bounds the PQ-code scan,
the MXU bounds LUT construction and the coarse scan, and ICI bounds the
all-gather merge of per-shard top-k.

Used both for sanity-checking measured numbers (SURVEY.md §6) and for
choosing configs (e.g. expected QPS before building a 1B index).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TpuSpec:
    """Per-chip hardware parameters. Defaults = TPU v5e (one chip)."""

    name: str = "v5e"
    hbm_gbps: float = 819.0        # HBM bandwidth, GB/s
    bf16_tflops: float = 394.0     # MXU peak, bf16
    f32_tflops: float = 98.5       # MXU peak, fp32 (bf16/4 on v5e)
    vmem_mb: float = 128.0
    ici_gbps: float = 400.0        # per-link bidirectional, approx


V5E = TpuSpec()
V5P = TpuSpec(name="v5p", hbm_gbps=2765.0, bf16_tflops=459.0,
              f32_tflops=114.75, ici_gbps=1200.0)


# ---------------------------------------------------------------------------
# Vector search components
# ---------------------------------------------------------------------------

def scan_bytes_per_query(dbsize: int, nlist: int, nprobe: int, m: int
                         ) -> float:
    """HBM bytes touched per query by the PQ-code scan.

    Expected rows scanned = nprobe/nlist · dbsize (uniform-list assumption,
    same as the reference's model); each row reads m code bytes.  Top-k
    candidates additionally read id_bytes per *selected* row, which is
    negligible and ignored (ids are gathered only for ~k rows).
    """
    rows = dbsize * nprobe / nlist
    return rows * m


def scan_qps_roofline(dbsize: int, nlist: int, nprobe: int, m: int,
                      spec: TpuSpec = V5E, efficiency: float = 1.0) -> float:
    """Bandwidth-bound QPS ceiling for the PQ scan on one chip.

    Reference model form: ``QPS = BW / (nprobe/nlist · dbsize · m)``
    (``performance_modeling/perf_model.py:39-46`` with BW=32 GB/s for the
    4-channel FPGA).  A v5e's 819 GB/s is ~25x the U250's scan bandwidth, so
    the same SIFT1000M/PQ16/nprobe32 point's ceiling moves from ~2k QPS to
    ~52k QPS per chip.
    """
    return efficiency * spec.hbm_gbps * 1e9 / scan_bytes_per_query(
        dbsize, nlist, nprobe, m)


def lut_flops_per_query(nprobe: int, m: int, dsub: int, ksub: int = 256
                        ) -> float:
    """LUT construction FLOPs: nprobe · ksub · m · dsub MACs (residual
    distance table). Maps to one batched matmul/einsum on the MXU
    (vs the reference's M spatial sub-PEs, ``LUT_construction.hpp:241-305``).
    """
    return 2.0 * nprobe * ksub * m * dsub


def coarse_flops_per_query(nlist: int, dim: int) -> float:
    """Coarse quantizer scan: one (1 x dim) @ (dim x nlist) matmul."""
    return 2.0 * nlist * dim


# Measured v5e kernel efficiencies (round 2, benchmarks/kernel_variants.py
# + /tmp micro-slopes; see RESULTS.md "kernel roofline" and the 100M A/B):
#   - segmented ADC kernel, packed-bf16 LUTs: 14.4 Grows/s useful at m=16
#     = 230 GB/s code traffic = 28% of HBM (gather-issue-bound, not BW)
#   - same kernel, f32 LUTs: 5.1-5.8 Grows/s = ~90 GB/s = 11% of HBM
#   - approx_min_k selection over the dists array: ~roofline (857 GB/s)
#     at recall_target <= 0.9; ~65 GB/s (8%) at 0.99 (aggregate_to_topk
#     dominates at large reductions)
SCAN_EFF_BF16 = 0.28
SCAN_EFF_F32 = 0.11
SELECT_EFF_LOW_RT = 1.0     # recall_target <= 0.9
SELECT_EFF_HIGH_RT = 0.08   # recall_target ~ 0.99
# Coarse probe selection over the (batch, nlist) scores: the full-sort
# top_k reads the array at ~4% of HBM (measured 1.02 ms at b=128,
# nlist=65536), the two-stage shortlist path (coarse_scan_2stage,
# SearchConfig.coarse_cand) at ~46% (0.090 ms same point) — the measured
# round-2 discovery that the sort, not the matmul, bounds large-nlist
# coarse scans (RESULTS.md "Two-stage coarse scan").
COARSE_SELECT_EFF_SORT = 0.04
COARSE_SELECT_EFF_2STAGE = 0.46


def padded_rows_per_query(dbsize: int, nlist: int, nprobe: int,
                          seg: int = 2048, windows: int = 0,
                          headroom: float = 1.2) -> float:
    """Rows the segmented kernel actually touches per query (window
    padding included — masked lanes cost the same gathers).

    With a measured window budget pass ``windows`` (then = windows x seg,
    exact).  Otherwise a uniform-list estimate: each probe covers
    ceil(avg_len/seg) ~ (avg_len/seg + 0.5) segments, x auto_windows'
    headroom.  Real skewed builds run higher (measured 2.9x useful rows
    at 100M/nlist=65536/nprobe=32) — pass the real (windows, seg) when
    calibrating against hardware.
    """
    if windows:
        return float(windows * seg)
    avg_len = dbsize / nlist
    segs_per_probe = avg_len / seg + 0.5
    return nprobe * max(1.0, segs_per_probe * headroom) * seg


def search_latency_model(dbsize: int, nlist: int, nprobe: int, m: int,
                         dim: int, batch: int, spec: TpuSpec = V5E,
                         scan_efficiency: float = 0.0,
                         mxu_efficiency: float = 0.5,
                         lut_bf16: bool = True,
                         recall_target: float = 0.9,
                         seg: int = 2048, windows: int = 0,
                         coarse_2stage: bool = True) -> dict:
    """Per-batch latency decomposition (seconds) for the fused search.

    Calibrated to the round-2 measured kernel efficiencies (constants
    above); ``scan_efficiency=0`` picks the measured value for the LUT
    mode.  Includes the selection stage (one read of the padded dists
    array at the measured ``approx_min_k`` efficiency for the given
    ``recall_target``) — at 100M-scale reductions with recall_target
    0.99 it rivals the scan itself (measured 1.1 ms vs 1.26 ms at
    b=128, nprobe=32) — and the coarse *probe selection* over the
    (batch, nlist) scores, which dominates the coarse matmul at
    nlist ≥ 65536 (``coarse_2stage`` picks the shortlist-path
    efficiency; False models the exact full-sort)."""
    ksub = 256
    dsub = dim // m
    if not scan_efficiency:
        scan_efficiency = SCAN_EFF_BF16 if lut_bf16 else SCAN_EFF_F32
    sel_eff = (SELECT_EFF_LOW_RT if recall_target <= 0.9
               else SELECT_EFF_HIGH_RT)
    rows_pad = padded_rows_per_query(dbsize, nlist, nprobe, seg=seg,
                                     windows=windows)
    t_coarse = batch * coarse_flops_per_query(nlist, dim) / (
        mxu_efficiency * spec.bf16_tflops * 1e12)
    csel_eff = (COARSE_SELECT_EFF_2STAGE if coarse_2stage
                else COARSE_SELECT_EFF_SORT)
    t_coarse += batch * nlist * 4 / (csel_eff * spec.hbm_gbps * 1e9)
    t_lut = batch * lut_flops_per_query(nprobe, m, dsub, ksub) / (
        mxu_efficiency * spec.f32_tflops * 1e12)
    t_scan = batch * rows_pad * m / (
        scan_efficiency * spec.hbm_gbps * 1e9)
    t_select = batch * rows_pad * 4 / (sel_eff * spec.hbm_gbps * 1e9)
    total = t_coarse + t_lut + t_scan + t_select
    return {
        "t_coarse_s": t_coarse, "t_lut_s": t_lut, "t_scan_s": t_scan,
        "t_select_s": t_select,
        "t_total_s": total, "qps": batch / total,
        "scan_fraction": t_scan / total,
    }


def sharded_merge_bytes(k: int, n_shards: int, batch: int,
                        id_bytes: int = 8, dist_bytes: int = 4) -> float:
    """ICI bytes for all-gathering per-shard top-k before the final merge
    (replaces the reference coordinator's TCP gather,
    ``retriever_coordinator_server.py:252-274``)."""
    return batch * k * n_shards * (id_bytes + dist_bytes)


def merge_all_gather_time(k: int, n_list_shards: int, batch_local: int,
                          spec: TpuSpec = V5E, id_bytes: int = 4,
                          dist_bytes: int = 4,
                          ici_efficiency: float = 0.7) -> float:
    """Seconds for the 2-D layout's top-k merge collective.

    ``sharded_search_2d`` all-gathers each chip's local ``(b_local, k)``
    dists (f32) + ids (i32) along the ``lists`` axis only — queries never
    move.  On a ring all-gather every chip forwards each of the other
    ``S-1`` contributions once, so wire time per chip is
    ``(S-1) · b_local · k · (id+dist bytes) / ICI_BW``.  The final exact
    top-k over ``S·k`` candidates is on-chip and negligible at these
    shapes.  ``ici_efficiency`` derates for protocol/launch overhead on
    small (sub-MB) messages.
    """
    payload = batch_local * k * (id_bytes + dist_bytes)
    return payload * (n_list_shards - 1) / (
        ici_efficiency * spec.ici_gbps * 1e9)


def mesh_search_model(dbsize: int, nlist: int, nprobe: int, m: int,
                      dim: int, batch: int, n_list_shards: int,
                      dp: int = 1, k: int = 100, spec: TpuSpec = V5E,
                      **latency_kw) -> dict:
    """Predicted QPS for the 2-D ``(data=dp, lists=S)`` production mesh.

    Per-chip work = the single-chip latency model over ``dbsize/S`` rows
    and ``batch/dp`` queries (each (data, lists) device scans its list
    shard for its query shard), plus the ``lists``-axis all-gather merge
    (``merge_all_gather_time``).  The moral equivalent of the reference's
    predicted-vs-measured queue cycle counts
    (``priority_queue/hierarchical_priority_queue/README.md:5-11``): the
    dryrun validates the collective SHAPES in HLO
    (``tests/test_sharded.py::test_sharded_2d_merge_collective_shapes``),
    this model prices them.
    """
    b_local = max(1, batch // max(dp, 1))
    per_chip = search_latency_model(
        max(1, dbsize // n_list_shards), nlist, nprobe, m, dim, b_local,
        spec=spec, **latency_kw)
    t_merge = merge_all_gather_time(k, n_list_shards, b_local, spec=spec)
    total = per_chip["t_total_s"] + t_merge
    return {
        **{f"per_chip_{k_}": v for k_, v in per_chip.items()},
        "t_merge_s": t_merge,
        "merge_fraction": t_merge / total,
        "t_total_s": total,
        "qps": batch / total,
    }


# ---------------------------------------------------------------------------
# RALM serving components
# ---------------------------------------------------------------------------

def decoder_step_flops(embed_dim: int, ffn_dim: int, layers: int,
                       batch: int, kv_len: int) -> float:
    """FLOPs for one incremental decode step (per token per batch):
    qkv+out projections (4·d²) + FFN (2·d·ffn) + attention over the KV cache
    (2·d·kv_len), times 2 for MAC→FLOP."""
    per_token = layers * (2.0 * (4 * embed_dim ** 2 + 2 * embed_dim * ffn_dim
                                 + 2 * embed_dim * kv_len))
    return batch * per_token


def decoder_step_latency(embed_dim: int, ffn_dim: int, layers: int,
                         batch: int, kv_len: int, spec: TpuSpec = V5E,
                         dtype_bytes: int = 2) -> dict:
    """Incremental decoding is weight-bandwidth-bound at small batch: every
    step streams all weights from HBM.  Returns both bounds."""
    weight_bytes = layers * (4 * embed_dim ** 2 + 2 * embed_dim * ffn_dim
                             ) * dtype_bytes
    kv_bytes = 2 * layers * batch * kv_len * embed_dim * dtype_bytes
    t_mem = (weight_bytes + kv_bytes) / (spec.hbm_gbps * 1e9)
    t_flops = decoder_step_flops(embed_dim, ffn_dim, layers, batch, kv_len
                                 ) / (spec.bf16_tflops * 1e12)
    t = max(t_mem, t_flops)
    return {"t_mem_s": t_mem, "t_flops_s": t_flops, "t_step_s": t,
            "tokens_per_sec": batch / t}


def ralm_throughput_model(model: dict, dbsize: int, nlist: int, nprobe: int,
                          m: int, dim: int, batch: int,
                          retrieval_interval: int = 1, tiktok: bool = True,
                          spec: TpuSpec = V5E) -> dict:
    """Tokens/sec for the RALM loop: decode step + retrieval every
    ``retrieval_interval`` steps; tik-tok overlaps the two (reference
    ``ralm_tiktok.py:197-239``), so the pipelined step time is
    max(decode, retrieval/interval) instead of the sum."""
    dec = decoder_step_latency(model["embed_dim"], model["ffn_embed_dim"],
                               model["layers"], batch,
                               kv_len=model.get("max_seq_len", 512) // 2,
                               spec=spec)
    ret = search_latency_model(dbsize, nlist, nprobe, m, dim, batch,
                               spec=spec)
    per_step_ret = ret["t_total_s"] / retrieval_interval
    if tiktok:
        t_step = max(dec["t_step_s"], per_step_ret)
    else:
        t_step = dec["t_step_s"] + per_step_ret
    return {"t_decode_s": dec["t_step_s"], "t_retrieval_s": ret["t_total_s"],
            "t_step_s": t_step, "tokens_per_sec": batch / t_step,
            "overlap_gain": (dec["t_step_s"] + per_step_ret) / t_step}
