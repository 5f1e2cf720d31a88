"""Tensor/data-parallel sharding for the transformer.

The reference's only model-scale story is one replica per GPU (manual DP,
``llm_inference_gpu/README.md``).  The TPU rebuild goes further: decoder
params shard over a ``tp`` mesh axis (attention heads / FFN columns), the
batch over ``dp``, via NamedSharding on the stacked-layer pytree — XLA
inserts the all-reduces over ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chamjax.models.transformer import KVCache, TransformerParams


def shard_decoder_params(params: TransformerParams, mesh: Mesh,
                         tp_axis: str = "tp") -> TransformerParams:
    """Place params: QKV/FFN-in column-sharded, O/FFN-out row-sharded over
    ``tp_axis``; embeddings/vocab replicated (simple; vocab-shard later)."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    layer_specs = {
        "ln1_scale": P(None, None), "ln1_bias": P(None, None),
        "wqkv": P(None, None, tp_axis),     # (L, d, 3d) column-sharded
        "wo": P(None, tp_axis, None),       # (L, d, d) row-sharded
        "ln2_scale": P(None, None), "ln2_bias": P(None, None),
        "w1": P(None, None, tp_axis),       # (L, d, f)
        "b1": P(None, tp_axis),
        "w2": P(None, tp_axis, None),       # (L, f, d)
        "b2": P(None, None),
    }
    cross_specs = {
        "ln_scale": P(None, None), "ln_bias": P(None, None),
        "wq": P(None, None, tp_axis),
        "wkv": P(None, None, tp_axis),
        "wo": P(None, tp_axis, None),
    }
    return TransformerParams(
        embed=put(params.embed, P()),
        pos=put(params.pos, P()),
        layers={k: put(v, layer_specs[k]) for k, v in params.layers.items()},
        ln_f={k: put(v, P(None)) for k, v in params.ln_f.items()},
        out_proj=put(params.out_proj, P(None, None)),
        cross_layers=(
            {k: put(v, cross_specs[k])
             for k, v in params.cross_layers.items()}
            if params.cross_layers is not None else None),
    )


def shard_kv_cache(cache: KVCache, mesh: Mesh, dp_axis: str = "dp",
                   tp_axis: str = "tp") -> KVCache:
    """Cache: batch over dp, heads over tp."""
    tp = mesh.shape.get(tp_axis, 1)
    # GQA caches may carry fewer KV heads than tp; replicate heads then
    # (a head dim that doesn't divide tp would force uneven GSPMD tiles)
    head_ax = tp_axis if cache.k.shape[3] % max(tp, 1) == 0 else None
    spec = P(None, dp_axis, None, head_ax, None)
    put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    return KVCache(k=put(cache.k), v=put(cache.v),
                   idx=jax.device_put(cache.idx, NamedSharding(mesh, P())))


def shard_llama_params(params: dict, mesh: Mesh,
                       tp_axis: str = "tp",
                       kv_heads: int = 0, head_dim: int = 0) -> dict:
    """Megatron-style placement for the llama stack
    (``models/llama.py::init_llama``): Q/K/V and FFN-in (w1/w3) column-
    sharded over ``tp_axis``, O and FFN-out (w2) row-sharded, norms and
    embeddings replicated.  XLA/GSPMD inserts the two per-layer
    all-reduces over ICI; GQA K/V projections whose head count doesn't
    divide tp stay replicated (uneven tiles would cost more than the
    sharding saves).  ``kv_heads`` (0 = infer from the wk/wq width ratio)
    gates that decision on the HEAD count, mirroring ``shard_kv_cache`` —
    testing the flattened ``kv_heads·head_dim`` dim would happily split a
    single head's projection across chips (e.g. kv_heads=1, head_dim
    divisible by tp)."""
    tp = mesh.shape.get(tp_axis, 1)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def col(x):  # (L, d, out) — shard out if divisible
        ax = tp_axis if x.shape[-1] % max(tp, 1) == 0 else None
        return put(x, P(None, None, ax))

    def row(x):  # (L, in, d) — shard in if divisible
        ax = tp_axis if x.shape[1] % max(tp, 1) == 0 else None
        return put(x, P(None, ax, None))

    lp = params["layers"]
    q_out, kv_out = lp["wq"].shape[-1], lp["wk"].shape[-1]

    def col_kv(x):  # K/V: shard only when whole heads land per chip
        if kv_heads:
            ok = kv_heads % max(tp, 1) == 0
        elif kv_out == q_out:
            # MHA (kv_heads == heads): same placement as wq — but gate on
            # the HEAD count when head_dim is known (a flattened-dim test
            # would split a head across chips for e.g. 6 heads × 64 @
            # tp=4, costing the extra attention collectives this function
            # exists to avoid)
            ok = ((q_out // head_dim) % max(tp, 1) == 0 if head_dim
                  else x.shape[-1] % max(tp, 1) == 0)
        else:
            # GQA with unknown head count: replicate — the flattened-dim
            # test would split a single head's projection across chips
            ok = False
        return put(x, P(None, None, tp_axis if ok else None))

    return {
        "embed": put(params["embed"], P()),
        "layers": {
            "ln1": put(lp["ln1"], P(None, None)),
            "wq": col(lp["wq"]), "wk": col_kv(lp["wk"]),
            "wv": col_kv(lp["wv"]),
            "wo": row(lp["wo"]),
            "ln2": put(lp["ln2"], P(None, None)),
            "w1": col(lp["w1"]), "w3": col(lp["w3"]), "w2": row(lp["w2"]),
        },
        "ln_f": put(params["ln_f"], P(None)),
        "out_proj": put(params["out_proj"], P(None, None)),
    }
