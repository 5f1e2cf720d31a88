"""Synthetic RALM corpus generator → on-disk fbin/ibin artifacts.

Parity with the reference's SYN pipeline
(``Faiss_experiments/generate_SYN_dataset.py`` / ``train_SYN_dataset.py`` /
``merge_SYN_ground_truth.py``): generate token-embedding-like corpora
(RALM-S 512-d / RALM-L 1024-d) of a given scale, write base/learn/query
splits in the big-ANN fbin layout, and compute exact ground truth in
query chunks (mergeable across machines).

    python benchmarks/generate_syn_dataset.py --name RALM-S --nb 1000000 \
        --out data/RALM-S1M
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.data import synthetic_dataset                     # noqa: E402
from chamjax.data.datasets import write_fbin                   # noqa: E402
from chamjax.data.ground_truth import compute_ground_truth     # noqa: E402

DIMS = {"RALM-S": 512, "RALM-L": 1024}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="RALM-S", choices=list(DIMS))
    ap.add_argument("--nb", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=10_000)
    ap.add_argument("--nt", type=int, default=100_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--clusters", type=int, default=4096,
                    help="0 = iid normal (the reference's SYN recipe)")
    ap.add_argument("--gt_k", type=int, default=100)
    ap.add_argument("--gt_chunk", type=int, default=0,
                    help=">0: only compute GT for this many queries "
                         "starting at --gt_offset (mergeable)")
    ap.add_argument("--gt_offset", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    d = DIMS[args.name]
    os.makedirs(args.out, exist_ok=True)
    ds = synthetic_dataset(name=args.name, nb=args.nb, nq=args.nq,
                           nt=args.nt, d=d, seed=args.seed,
                           n_clusters=args.clusters)
    write_fbin(os.path.join(args.out, "base.fbin"), ds.xb)
    write_fbin(os.path.join(args.out, "learn.fbin"), ds.xt)
    write_fbin(os.path.join(args.out, "query.fbin"), ds.xq)
    print(f"wrote base({ds.nb})/learn({ds.xt.shape[0]})/query({args.nq}) "
          f"d={d} to {args.out}", flush=True)

    if args.gt_chunk >= 0:
        lo = args.gt_offset
        hi = args.nq if args.gt_chunk == 0 else min(args.nq,
                                                    lo + args.gt_chunk)
        gt, gt_d = compute_ground_truth(ds.xb, ds.xq[lo:hi], k=args.gt_k)
        np.save(os.path.join(args.out, f"gt_ids_{lo}_{hi}.npy"), gt)
        np.save(os.path.join(args.out, f"gt_dists_{lo}_{hi}.npy"), gt_d)
        print(f"ground truth rows [{lo},{hi}) k={args.gt_k}", flush=True)


if __name__ == "__main__":
    main()
