"""PQ nbits recall studies: fixed-m and fixed-bytes-per-vector sweeps.

Parity with the reference's nbits experiments
(``Faiss_experiments/nbits_experiments_fix_{m,bytes_per_vec}.py``): how
recall moves with PQ resolution, either holding the sub-quantizer count m
constant (code size varies) or holding total bytes/vector constant
(m·nbits/8 fixed).  nbits≠8 searches run through the XLA backend (the
Pallas kernels are specialized for 256-entry LUTs).

    python benchmarks/nbits_experiment.py --mode fix_m --m 16 --nbits 4 6 8
    python benchmarks/nbits_experiment.py --mode fix_bytes --bytes 16
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.config import IndexConfig, SearchConfig           # noqa: E402
from chamjax.data import load_dataset                          # noqa: E402
from chamjax.data.ground_truth import compute_ground_truth     # noqa: E402
from chamjax.eval import recall_at_k                           # noqa: E402
from chamjax.index import build_ivfpq                          # noqa: E402
from chamjax.searcher import IVFSearcher                       # noqa: E402
from chamjax.utils import ResultStore                          # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dbname", default="SIFT100K")
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--mode", choices=["fix_m", "fix_bytes"], default="fix_m")
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--bytes", type=int, default=16)
    ap.add_argument("--nbits", type=int, nargs="+", default=[4, 6, 8])
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--out", default="results/nbits.pkl")
    args = ap.parse_args()

    ds = load_dataset(args.dbname, data_dir=args.data_dir)
    gt = ds.gt
    nq = min(1000, ds.xq.shape[0])
    if gt is None:
        gt, _ = compute_ground_truth(ds.xb, ds.xq[:nq], k=args.k)
    store = ResultStore(args.out, load=True)

    for nbits in args.nbits:
        if args.mode == "fix_m":
            m = args.m
        else:
            m = max(1, args.bytes * 8 // nbits)
        while ds.d % m:
            m -= 1
        cfg = IndexConfig(dim=ds.d, nlist=args.nlist, m=m, nbits=nbits)
        key = (args.dbname, f"IVF{args.nlist},PQ{m}x{nbits}", args.mode)
        if not store.should_run(key):
            print(f"skip {key}", flush=True)
            continue
        idx = build_ivfpq(ds.xb, cfg, xt=ds.xt)
        s = IVFSearcher(idx, SearchConfig(nprobe=args.nprobe, k=args.k))
        _, ids = s.search(ds.xq[:nq])
        res = {"bytes_per_vec": m * nbits / 8, "m": m, "nbits": nbits,
               **{f"R@{kk}": float(recall_at_k(ids, gt[:nq], kk))
                  for kk in (1, 10, 100) if kk <= args.k}}
        store.put(key, res)
        store.save()
        print(f"{key} -> {res}", flush=True)


if __name__ == "__main__":
    main()
