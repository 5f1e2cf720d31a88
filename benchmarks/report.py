"""Result reporting: ResultStore pickles → markdown / LaTeX tables.

Parity with the reference's plot/report layer
(``experiments/plots/``, ``create_latex_tables.py``): walks one or more
nested result stores and emits comparison tables (rows = key tuples,
columns = selected metrics), in markdown (default) or LaTeX.

    python benchmarks/report.py results/*.pkl --metrics QPS R@10 \
        --format markdown
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chamjax.utils import ResultStore                          # noqa: E402


def collect(paths: List[str]) -> List[Tuple[Tuple[str, ...], Dict]]:
    rows = []
    for p in paths:
        store = ResultStore(p, load=True)
        for key, leaf in store.walk():
            rows.append(((os.path.basename(p).replace(".pkl", ""),) + key,
                         leaf))
    return rows


def fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:,.4g}"
    return str(v)


def to_markdown(rows, metrics: List[str]) -> str:
    header = "| key | " + " | ".join(metrics) + " |"
    sep = "|" + "---|" * (len(metrics) + 1)
    lines = [header, sep]
    for key, leaf in rows:
        cells = [fmt(leaf.get(m, "")) for m in metrics]
        lines.append("| " + "/".join(key) + " | " + " | ".join(cells) + " |")
    return "\n".join(lines)


def to_latex(rows, metrics: List[str]) -> str:
    cols = "l" + "r" * len(metrics)
    lines = [f"\\begin{{tabular}}{{{cols}}}", "\\toprule",
             "key & " + " & ".join(metrics) + " \\\\", "\\midrule"]
    for key, leaf in rows:
        cells = [fmt(leaf.get(m, "")) for m in metrics]
        lines.append("/".join(key).replace("_", "\\_") + " & "
                     + " & ".join(cells) + " \\\\")
    lines += ["\\bottomrule", "\\end{tabular}"]
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("stores", nargs="+", help="ResultStore pickle paths")
    ap.add_argument("--metrics", nargs="+",
                    default=["QPS", "R@10", "latency_ms_p50"])
    ap.add_argument("--format", choices=["markdown", "latex"],
                    default="markdown")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = collect(args.stores)
    text = (to_markdown if args.format == "markdown" else to_latex)(
        rows, args.metrics)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"wrote {args.out} ({len(rows)} rows)", flush=True)
    else:
        print(text)


if __name__ == "__main__":
    main()
