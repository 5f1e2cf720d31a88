"""Configuration system: typed dataclasses + YAML loading.

The reference configures experiments through YAML files merged into module
globals (``llm_inference_gpu/experiments/start_coordinator_and_GPU.py:79-85``)
plus argparse overrides, and configures the FPGA through compile-time macros
(``retrieval_accelerator/*/src/constants.hpp``).  Here everything is a typed
dataclass; kernel-shape-relevant fields are static per jit compile.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict


def _coerce(cls, d: Dict[str, Any]):
    """Build dataclass ``cls`` from a dict, ignoring unknown keys."""
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})


@dataclass(frozen=True)
class IndexConfig:
    """Static shape/config of an IVF-PQ index.

    Mirrors the reference's compile-time constants
    (``constants.hpp:9-33``: D, M, LUT_ENTRY_NUM=256, NLIST_MAX) and the
    Faiss index-key strings like ``"OPQ16,IVF4096,PQ16"``
    (``Faiss_experiments/bench_polysemous_1bn.py``).
    """

    dim: int = 128           # D  — vector dimensionality
    nlist: int = 1024        # number of IVF cells
    m: int = 16              # M  — PQ sub-quantizers
    nbits: int = 8           # bits per PQ code (256-entry LUTs when 8)
    opq: bool = False        # learned orthogonal rotation before PQ
    by_residual: bool = True # PQ encodes residual to coarse centroid
    # Packed-layout padding: each inverted list padded to a multiple of this
    # many rows so Pallas tiles and XLA slices stay aligned (the analogue of
    # the reference's 64-byte-entry padding,
    # ``extract_Enzian_U250_required_data.py:296-360``).
    list_pad: int = 128
    # Capacity-balanced assignment: cap each list at
    # ceil(ntotal/nlist * balance_factor); boundary points displace to their
    # next-nearest cell with room.  Bounds the probed-list length bias that
    # multiplies scan work (see ops/scan_seg.py).  balance_hard makes the
    # cap exact via a widening candidate retry (lets auto_windows collapse
    # the worst-query window budget to nprobe·ceil(cap/seg)) — recall-safe
    # only when the cap clears natural cluster sizes; the default soft cap
    # falls back to the nearest cell on overflow (see kmeans.assign_balanced).
    balanced: bool = False
    balance_factor: float = 1.3
    balance_hard: bool = False
    # Balanced-Lloyd training knobs (device streamed builder only): number
    # of capacity-constrained + split-reseed iterations appended after
    # plain Lloyd, and the split deadband (only cells with natural demand
    # > deadband * cap are split — chasing noise-level overflow diverges,
    # see device_build._update_from_assignment).
    balance_train_iters: int = 12
    balance_deadband: float = 1.25
    # 0 = auto: split the corpus rebalance into contiguous parts (each
    # budgeted the cells' remaining capacity) when the candidate table
    # would exceed ~7 GB of HBM.
    balance_parts: int = 0
    # Inverted multi-index (the reference's ``IMI2xB,...`` training sweeps,
    # ``Faiss_experiments/train_cpu.py``): the coarse quantizer is the
    # cartesian product of two 2^imi-way sub-quantizers over the two halves
    # of the vector, so nlist = 4^imi.  0 = plain IVF.  L2 to a product
    # centroid decomposes per half, so assignment and the coarse scan are
    # factored (see index/imi.py).
    imi: int = 0

    @property
    def ksub(self) -> int:
        return 1 << self.nbits

    @property
    def dsub(self) -> int:
        assert self.dim % self.m == 0, (self.dim, self.m)
        return self.dim // self.m

    @property
    def key(self) -> str:
        """Faiss-style index key string."""
        prefix = f"OPQ{self.m}," if self.opq else ""
        coarse = f"IMI2x{self.imi}" if self.imi else f"IVF{self.nlist}"
        return f"{prefix}{coarse},PQ{self.m}"


@dataclass(frozen=True)
class SearchConfig:
    """Per-search-compile static parameters."""

    nprobe: int = 32
    k: int = 100                 # TOPK (reference constants.hpp:17)
    batch_size: int = 32
    # Static scan length per probed list (rows).  Lists longer than this are
    # truncated for the fixed-shape path; choose via
    # ``PackedIVF.suggest_scan_len``.  Analogue of the per-cell iteration
    # count table in ``DRAM_utils.hpp:45-102`` — but static for XLA.
    scan_len: int = 4096
    # Probes processed per inner step to bound live memory (chunked scan).
    probe_chunk: int = 8
    # Use TPU-optimized approximate partial top-k (jax.lax.approx_min_k) for
    # the big selection — the moral equivalent of the FPGA's truncated L1
    # priority queues (``hierarchical_priority_queue.hpp``), with recall
    # governed the same way the reference sizes queues probabilistically.
    use_approx_topk: bool = True
    # Per-element selection recall for approx_min_k.  End recall is PQ-noise
    # dominated: measured on the 1M bench, 0.9 here costs zero R@10 vs 0.99
    # while cutting selection time ~12x (see benchmarks/profiling_stages.py).
    approx_recall_target: float = 0.9
    # Distance compute dtype ("float32" | "bfloat16").
    dtype: str = "float32"
    # Scan backend: "seg" (segmented Pallas kernel, work ∝ true list length),
    # "pallas" (padded-window Pallas kernel), or "xla" (gather fallback).
    backend: str = "seg"
    # Pallas code-tile width (columns per DMA block); 0 = auto from list_pad.
    tile: int = 0
    # Segmented backend: static per-query window budget (0 = auto-sized from
    # the index's list-length distribution, IVFSearcher._auto_windows).
    scan_windows: int = 0
    # Segmented backend: rows per window (0 = cost-model auto,
    # ``searcher.auto_seg``; must be a 128-multiple ≤ ops.scan_seg.MAX_SEG).
    seg: int = 0
    # Windows processed per kernel grid step (amortizes per-step machinery;
    # 8 measured best on v5e).
    seg_group: int = 8
    # Packed-bf16 ADC LUTs (seg backends): one lane-gather + 3-op decode
    # per subspace instead of two gathers + select — measured 2.3-2.8x
    # kernel throughput on v5e at full windows, recall-identical (entry
    # rounding ~0.4% relative, far below PQ error; re-gated on device by
    # ``bench.py --matrix``).
    lut_bf16: bool = True
    # Approximate (approx_max_k) probe selection in the coarse scan.  Opt-in
    # (like lut_bf16): a ~2% per-element miss is absorbed by multi-probe at
    # large nprobe (measured recall-neutral at nprobe=32 on the 1M bench),
    # but at nprobe 1-4 a swapped nearest centroid directly costs recall and
    # the reference's coarse selection is exact.
    coarse_approx: bool = False
    # Two-stage coarse scan (``ops/coarse.py::coarse_scan_2stage``): probe
    # selection keeps a shortlist of this width with approx_max_k over the
    # exact HIGHEST-precision scores, then re-sorts the shortlist exactly.
    # The exact path's full-sort top_k over (b, nlist) dominates the coarse
    # stage at nlist ≥ 65536 (measured 11× on v5e; scores stay exact).
    # -1 = auto: 4·nprobe (min 64) when nlist ≥ 32768 and nprobe ≥ 8 —
    # regimes where a dropped deep-boundary probe is absorbed by
    # multi-probe — else off.  0 = off (exact full sort); >0 = explicit
    # shortlist width.  Takes precedence over coarse_approx.
    coarse_cand: int = -1
    # Hierarchical selection: >k runs an oversized raw-PartialReduce L1
    # pass of this length + one exact top-k L2 merge instead of the
    # aggregated approx_min_k (``ops/topk.py::select_topk``) — the
    # oversized-L1-queue design of the FPGA's hierarchical selector.
    # Effective per-element top-k recall ~ 1 - (k-1)/L(l1); l1=1024 ~
    # rt=0.99 at a fraction of the aggregation cost at 100M-scale
    # reductions. 0 = off (use approx_recall_target aggregation).
    select_l1: int = 0
    # In-kernel L1 (seg backend, seg_group>1): each (window, lane) bucket
    # of seg/128 rows is reduced to its min INSIDE the ADC kernel — the
    # per-PE L1 queue of the FPGA's hierarchical selector kept next to the
    # scan PEs.  Host-side selection then sees W·128 candidates instead of
    # W·seg and the kernel writes 2 rows/window instead of seg/128.
    # Bucket-collision loss ≈ C(k,2)/(W·128) of the top-k
    # (``index/sizing.py::lane_l1_loss``); opt-in like lut_bf16.
    lane_l1: bool = False
    # Seg backend: store codes seg-TILED ((n_tiles, m, seg), every list on
    # a tile boundary) and fetch windows through the scalar-prefetched
    # BlockSpec pipeline instead of manual per-window async copies
    # (``ops/scan_seg_block.py``).  Kills the measured ~150 ns/window
    # manual-DMA fixed cost (60% of the seg=512 kernel on v5e).  Costs a
    # second device copy of the codes (the flat layout stays resident for
    # the other backends), so it defaults ON for serving-scale indexes and
    # should be disabled when HBM is the binding constraint.
    tiled: bool = True


@dataclass(frozen=True)
class ModelConfig:
    """Transformer shape, mirroring ``experiments/config/{Dec-S,...}.yaml``."""

    model_type: str = "decoder"      # "decoder" | "encoder-decoder" | "llama"
    embed_dim: int = 512
    ffn_embed_dim: int = 2048
    layers: int = 24
    attention_heads: int = 8
    encoder_layers: int = 2          # enc-dec only
    vocab_size: int = 50000          # reference uses 50k (get_model.py:31)
    max_seq_len: int = 512
    dtype: str = "bfloat16"
    # llama family only (RMSNorm + rotary + SwiGLU, optional GQA)
    kv_heads: int = 0                # 0 → = attention_heads (MHA)
    rope_theta: float = 10000.0
    # retrieval plumbing
    retrieval_interval: int = 1
    retrieval_token_len: int = 64    # enc-dec: tokens per retrieved doc
    k: int = 10                      # neighbours per retrieval


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for sharded search / model parallelism."""

    data: int = 1      # batch-parallel axis
    lists: int = 1     # inverted-list shard axis (reference: 4 DRAM banks /
                       # multi-FPGA shards / coordinator round-robin)
    model: int = 1     # tensor-parallel axis for the LM


@dataclass(frozen=True)
class ServiceConfig:
    """TCP service endpoints (reference experiments/config/*.yaml keys)."""

    host: str = "127.0.0.1"
    port: int = 25000
    coordinator_host: str = "127.0.0.1"
    coordinator_port: int = 25001
    n_clients: int = 1
    n_engines: int = 1
    batch_size: int = 32
    dim: int = 128
    k: int = 100
    nprobe: int = 32


@dataclass(frozen=True)
class ExperimentConfig:
    index: IndexConfig = field(default_factory=IndexConfig)
    search: SearchConfig = field(default_factory=SearchConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    service: ServiceConfig = field(default_factory=ServiceConfig)
    dbname: str = "SIFT1M"
    seed: int = 0

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "ExperimentConfig":
        return ExperimentConfig(
            index=_coerce(IndexConfig, d.get("index", {})),
            search=_coerce(SearchConfig, d.get("search", {})),
            model=_coerce(ModelConfig, d.get("model", {})),
            mesh=_coerce(MeshConfig, d.get("mesh", {})),
            service=_coerce(ServiceConfig, d.get("service", {})),
            dbname=d.get("dbname", "SIFT1M"),
            seed=d.get("seed", 0),
        )

    @staticmethod
    def from_yaml(path: str) -> "ExperimentConfig":
        import yaml

        with open(path) as f:
            return ExperimentConfig.from_dict(yaml.safe_load(f) or {})

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


# Model presets matching the reference experiment shapes
# (``experiments/config/{Dec-S,Dec-L,EncDec-S,EncDec-L}.yaml``).
MODEL_PRESETS: Dict[str, ModelConfig] = {
    "Dec-S": ModelConfig(model_type="decoder", embed_dim=512,
                         ffn_embed_dim=2048, layers=24, attention_heads=8),
    "Dec-L": ModelConfig(model_type="decoder", embed_dim=1024,
                         ffn_embed_dim=4096, layers=96, attention_heads=16),
    "EncDec-S": ModelConfig(model_type="encoder-decoder", embed_dim=512,
                            ffn_embed_dim=2048, layers=24, attention_heads=8,
                            encoder_layers=2, retrieval_interval=8, k=10),
    "EncDec-L": ModelConfig(model_type="encoder-decoder", embed_dim=1024,
                            ffn_embed_dim=4096, layers=96, attention_heads=16,
                            encoder_layers=2, retrieval_interval=8, k=10),
    # llama family (RMSNorm/rotary/SwiGLU/GQA) at the Dec-S / Dec-L scales,
    # plus the canonical 7B shape; reference scaffold: ``ralmDecoder_llama``
    "Llama-S": ModelConfig(model_type="llama", embed_dim=512,
                           ffn_embed_dim=1408, layers=24, attention_heads=8,
                           kv_heads=4),
    "Llama-L": ModelConfig(model_type="llama", embed_dim=1024,
                           ffn_embed_dim=2816, layers=96, attention_heads=16,
                           kv_heads=4),
    "Llama-7B": ModelConfig(model_type="llama", embed_dim=4096,
                            ffn_embed_dim=11008, layers=32,
                            attention_heads=32, kv_heads=32,
                            vocab_size=32000, max_seq_len=512),
}
