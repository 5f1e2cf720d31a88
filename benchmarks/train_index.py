"""Index factory CLI: train / populate / merge / evaluate.

Parity with the reference's training drivers
(``Faiss_experiments/train_cpu.py`` / ``train_gpu.py`` /
``bench_polysemous_1bn.py``): takes Faiss-style index keys
(``OPQ16,IVF4096,PQ16``), supports sharded populate
(``--n_shards/--shard_id``), merging (``--merge``), and post-build recall
evaluation, producing ``{out_dir}/{dbname}_{key}_populated.npz`` artifacts
(+ ``_trained.npz`` quantizers).

Examples:
    # train + populate + evaluate in one go
    python benchmarks/train_index.py --dbname SIFT1M \
        --keys IVF4096,PQ16 OPQ16,IVF4096,PQ16 --eval

    # sharded: each shard encodes its slice against the shared quantizers
    python benchmarks/train_index.py --dbname SIFT1M --keys IVF4096,PQ16 \
        --n_shards 4 --shard_id 0
    ... (shards 1-3) ...
    python benchmarks/train_index.py --dbname SIFT1M --keys IVF4096,PQ16 \
        --n_shards 4 --merge
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.data import load_dataset                          # noqa: E402
from chamjax.data.ground_truth import compute_ground_truth     # noqa: E402
from chamjax.eval import recall_at_k                           # noqa: E402
from chamjax.index.factory import (                            # noqa: E402
    TrainedQuantizers, merge_indexes, parse_index_key, populate,
    train_quantizers,
)
from chamjax.index.ivf import PackedIVF                        # noqa: E402


def paths(out_dir, dbname, key, n_shards=0, shard_id=None):
    stem = f"{dbname}_{key.replace(',', '_')}"
    trained = os.path.join(out_dir, f"{stem}_trained.npz")
    if shard_id is not None:
        pop = os.path.join(out_dir,
                           f"{stem}_shard{shard_id}of{n_shards}.npz")
    else:
        pop = os.path.join(out_dir, f"{stem}_populated.npz")
    return trained, pop


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dbname", default="SIFT1M")
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--out_dir", default="data/indexes")
    ap.add_argument("--keys", nargs="+", default=["IVF4096,PQ16"])
    ap.add_argument("--balanced", action="store_true")
    ap.add_argument("--kmeans_iters", type=int, default=15)
    ap.add_argument("--pq_iters", type=int, default=20)
    ap.add_argument("--n_shards", type=int, default=0)
    ap.add_argument("--shard_id", type=int, default=-1)
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--nprobe", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    ds = load_dataset(args.dbname, data_dir=args.data_dir)

    for key in args.keys:
        cfg = parse_index_key(key, ds.d)
        if args.balanced:
            import dataclasses
            cfg = dataclasses.replace(cfg, balanced=True)
        trained_path, pop_path = paths(args.out_dir, args.dbname, key)

        # --- train (once per key; reused by shards) ---
        if os.path.exists(trained_path):
            trained = TrainedQuantizers.load(trained_path)
        else:
            t0 = time.time()
            trained = train_quantizers(
                ds.xt, cfg, seed=args.seed,
                kmeans_iters=args.kmeans_iters, pq_iters=args.pq_iters)
            trained.save(trained_path)
            print(f"[{key}] trained in {time.time()-t0:.1f}s "
                  f"-> {trained_path}", flush=True)

        # --- merge mode ---
        if args.merge:
            assert args.n_shards > 1
            parts = []
            for s in range(args.n_shards):
                _, sp = paths(args.out_dir, args.dbname, key,
                              args.n_shards, s)
                parts.append(PackedIVF.load(sp))
            idx = merge_indexes(parts)
            idx.save(pop_path)
            print(f"[{key}] merged {args.n_shards} shards "
                  f"({idx.ntotal} vectors) -> {pop_path}", flush=True)
        # --- sharded populate ---
        elif args.n_shards > 1 and args.shard_id >= 0:
            n = ds.nb
            lo = n * args.shard_id // args.n_shards
            hi = n * (args.shard_id + 1) // args.n_shards
            t0 = time.time()
            part = populate(ds.xb[lo:hi], trained, id_offset=lo)
            _, sp = paths(args.out_dir, args.dbname, key, args.n_shards,
                          args.shard_id)
            part.save(sp)
            print(f"[{key}] shard {args.shard_id}/{args.n_shards} "
                  f"rows [{lo},{hi}) in {time.time()-t0:.1f}s -> {sp}",
                  flush=True)
            continue
        # --- single-shot populate ---
        elif not os.path.exists(pop_path):
            t0 = time.time()
            idx = populate(ds.xb, trained)
            idx.save(pop_path)
            print(f"[{key}] populated {idx.ntotal} vectors in "
                  f"{time.time()-t0:.1f}s -> {pop_path}", flush=True)

        # --- evaluate ---
        if args.eval and os.path.exists(pop_path):
            from chamjax.config import SearchConfig
            from chamjax.searcher import IVFSearcher
            idx = PackedIVF.load(pop_path)
            gt = ds.gt
            if gt is None:
                gt, _ = compute_ground_truth(ds.xb, ds.xq[:1000], k=100)
            nq = min(gt.shape[0], ds.xq.shape[0], 1000)
            for nprobe in args.nprobe:
                s = IVFSearcher(idx, SearchConfig(nprobe=nprobe, k=100))
                _, ids = s.search(ds.xq[:nq])
                line = " ".join(
                    f"R@{kk}={recall_at_k(ids, gt[:nq], kk):.4f}"
                    for kk in (1, 10, 100))
                print(f"[{key}] nprobe={nprobe}: {line}", flush=True)


if __name__ == "__main__":
    main()
