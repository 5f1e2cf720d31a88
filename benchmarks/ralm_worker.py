"""RALM worker process — one LM replica in the disaggregated serving mesh.

Parity with the reference's GPU worker (``experiments/GPU_process.py:160-263``):
builds the transformer from a YAML config/preset, connects an
``ExternalRetriever`` to the coordinator (or runs Dummy/Local), barrier-syncs,
runs warmup + timed ``batch_inference`` (sequential or tik-tok), and saves
per-step profiling + summary stats into the shared ResultStore keyed
``[model][architecture][interval][batch]``.

Usage (standalone, dummy retriever):
    python benchmarks/ralm_worker.py --config configs/Dec-S.yaml \
        --retriever dummy --batch 32 --seq_len 64 --scheduler sequential
Under the launcher it gets --retriever external --worker_id i.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.config import ExperimentConfig, MODEL_PRESETS   # noqa: E402
from chamjax.utils import ResultStore                         # noqa: E402


def build_retriever(args, cfg):
    if args.retriever == "dummy":
        from chamjax.retrieval.interface import DummyRetriever
        return DummyRetriever(default_k=cfg.model.k)
    if args.retriever == "external":
        from chamjax.retrieval.external import ExternalRetriever
        r = ExternalRetriever(
            cfg.service.coordinator_host, cfg.service.coordinator_port,
            args.batch, cfg.model.embed_dim, cfg.model.k,
            retry_s=120.0 if args.sweep else 0.0)
        r.sync_with_coordinator()
        return r
    if args.retriever == "local":
        from chamjax.config import IndexConfig, SearchConfig
        from chamjax.data import synthetic_dataset
        from chamjax.index import build_ivfpq
        from chamjax.retrieval.local import LocalRetriever
        ds = synthetic_dataset(nb=args.local_nb, nq=8, nt=args.local_nb // 5,
                               d=cfg.model.embed_dim, seed=0, n_clusters=256)
        idx = build_ivfpq(
            ds.xb, IndexConfig(dim=cfg.model.embed_dim,
                               nlist=min(1024, args.local_nb // 64),
                               m=cfg.model.embed_dim // 32),
            xt=ds.xt)
        return LocalRetriever(idx, SearchConfig(nprobe=args.nprobe,
                                                k=cfg.model.k))
    raise ValueError(args.retriever)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML experiment config")
    ap.add_argument("--preset", default=None,
                    choices=list(MODEL_PRESETS) + [None])
    ap.add_argument("--retriever", default="dummy",
                    choices=["dummy", "external", "local"])
    ap.add_argument("--scheduler", default="sequential",
                    choices=["sequential", "tiktok"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq_len", type=int, default=0,
                    help="steps to generate (0 = model max_seq_len)")
    ap.add_argument("--interval", type=int, default=0,
                    help="retrieval interval override")
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--local_nb", type=int, default=200_000)
    ap.add_argument("--worker_id", type=int, default=0)
    ap.add_argument("--out", default="results/ralm.pkl")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sweep", default="",
                    help="comma list of scheduler:interval configs (e.g. "
                         "'sequential:1,tiktok:1,sequential:8,tiktok:8') "
                         "run back-to-back in THIS process — model params "
                         "and the TPU device init are paid once; the "
                         "launcher restarts the coordinator between "
                         "configs and this worker reconnects")
    args = ap.parse_args()

    import jax
    if os.environ.get("CHAMJAX_CPU"):
        # topology smoke tests: keep the worker off the (shared) TPU chip.
        # JAX_PLATFORMS is ignored under the axon plugin; this is the only
        # way to force CPU (see .claude/skills/verify/SKILL.md)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/chamjax_jax_cache")
    from chamjax.models import (
        init_decoder, init_encoder_decoder, init_llama,
    )
    from chamjax.serving.ralm import RalmDecoder, RalmEncoderDecoder
    from chamjax.serving.tiktok import TikTokDecoder, TikTokEncoderDecoder

    def init_dec_params(key, mcfg):
        return (init_llama(key, mcfg) if mcfg.model_type == "llama"
                else init_decoder(key, mcfg))

    cfg = (ExperimentConfig.from_yaml(args.config) if args.config
           else ExperimentConfig())
    if args.preset:
        cfg = ExperimentConfig(**{**cfg.__dict__, "model":
                                  MODEL_PRESETS[args.preset]})
    mcfg = cfg.model
    seq_len = args.seq_len or mcfg.max_seq_len
    key = jax.random.PRNGKey(args.seed)

    # model params are config-independent: init once, reuse across the sweep
    if mcfg.model_type in ("decoder", "llama"):
        params, enc_dec = init_dec_params(key, mcfg), None
    else:
        params, enc_dec = None, init_encoder_decoder(key, mcfg)

    def run_one(scheduler: str, interval: int, retriever) -> None:
        if scheduler == "tiktok":
            if params is not None:
                loop = TikTokDecoder(params, mcfg, retriever, args.batch,
                                     retrieval_interval=interval,
                                     nprobe=args.nprobe)
            else:
                loop = TikTokEncoderDecoder(*enc_dec, mcfg,
                                            retriever, args.batch,
                                            retrieval_interval=interval,
                                            nprobe=args.nprobe)
            loop.batch_inference(args.warmup)
            loop.reset_inference_state()
            loop.batch_inference(seq_len)
            tps = loop.throughput_tokens_per_sec(seq_len)
        elif params is not None:
            loop = RalmDecoder(params, mcfg, retriever, args.batch,
                               retrieval_interval=interval,
                               nprobe=args.nprobe)
            loop.batch_inference(args.warmup)
            loop.reset_inference_state()
            loop.batch_inference(seq_len)
            tps = loop.throughput_tokens_per_sec(seq_len)
        else:
            loop = RalmEncoderDecoder(*enc_dec, mcfg, retriever,
                                      args.batch, retrieval_interval=interval,
                                      nprobe=args.nprobe)
            loop.multi_steps(args.warmup)
            loop.reset_inference_state()
            loop.batch_inference(seq_len)
            tps = loop.prof.stats(args.batch)["throughput_tokens_per_sec"]

        stats = loop.prof.stats(args.batch)
        print(f"[worker {args.worker_id}] {scheduler} "
              f"{mcfg.model_type} b={args.batch} interval={interval}: "
              f"{tps:.1f} tok/s", flush=True)
        loop.prof.print_stats(args.batch)

        model_name = (args.preset or
                      (os.path.splitext(os.path.basename(args.config))[0]
                       if args.config else "custom"))
        arch = f"{scheduler}-{args.retriever}"
        store = ResultStore(args.out, load=True)
        store.put((model_name, arch, interval, args.batch,
                   f"worker{args.worker_id}"),
                  {**stats, "throughput_tokens_per_sec": tps})
        store.save()

    configs = ([tuple(c.split(":")) for c in args.sweep.split(",") if c]
               if args.sweep
               else [(args.scheduler,
                      str(args.interval or mcfg.retrieval_interval))])
    for ci, (scheduler, interval_s) in enumerate(configs):
        retriever = build_retriever(args, cfg)
        run_one(scheduler, int(interval_s), retriever)
        retriever.close()


if __name__ == "__main__":
    main()
