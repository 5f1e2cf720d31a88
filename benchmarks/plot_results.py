"""Benchmark figure generation from ResultStore pickles.

Parity with the reference's plotting layer (``experiments/plots/`` — paper
figures from the archived result pickles). Produces:

- ``recall_qps.png``   — recall@10 vs QPS trade-off, one line per arch
- ``latency_batch.png``— p50 latency vs batch size, one line per arch
- ``stages.png``       — pipeline stage breakdown (from profiling_stages)

Design rules (dataviz method): one axis per chart; categorical colors in a
fixed, pre-validated order (reference palette, adjacent-pair CVD ΔE ≥ 8);
≤ 4 series per figure (beyond that, facet); thin marks, recessive grid,
direct end-labels plus a legend; values in text ink, never series color.

    python benchmarks/plot_results.py results/vector_search_local.pkl \
        --out_dir results/figures
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib                                              # noqa: E402
matplotlib.use("Agg")
import matplotlib.pyplot as plt                                # noqa: E402

from chamjax.utils import ResultStore                          # noqa: E402

# Reference categorical palette (pre-validated fixed order — see the dataviz
# palette doc: worst adjacent CVD dE 9.1, normal-vision 19.6 on light).
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
INK, INK2, GRID = "#0b0b0b", "#52514e", "#e5e4e0"
SURFACE = "#fcfcfb"


def _axes(ax, xlabel, ylabel, title):
    ax.set_facecolor(SURFACE)
    ax.grid(True, color=GRID, linewidth=0.8, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK2)
    ax.tick_params(colors=INK2, labelsize=9)
    ax.set_xlabel(xlabel, color=INK, fontsize=10)
    ax.set_ylabel(ylabel, color=INK, fontsize=10)
    ax.set_title(title, color=INK, fontsize=11, loc="left", pad=10)


def _series_map(rows, x_of, y_of, series_of):
    out = defaultdict(list)
    for key, leaf in rows:
        x, y, s = x_of(key, leaf), y_of(key, leaf), series_of(key, leaf)
        if x is not None and y is not None:
            out[s].append((x, y))
    return {s: sorted(v) for s, v in out.items()}


def _plot_lines(series, xlabel, ylabel, title, path, logx=False):
    if not series:
        return False
    fig, ax = plt.subplots(figsize=(6.4, 4.0), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    names = sorted(series)[:4]          # series cap; facet beyond 4
    for i, name in enumerate(names):
        pts = series[name]
        xs, ys = zip(*pts)
        c = SERIES[i % len(SERIES)]
        ax.plot(xs, ys, color=c, linewidth=1.8, marker="o", markersize=5,
                zorder=3, label=name)
        # direct end-label in text ink, color carried by a leading dash
        ax.annotate(f" {name}", (xs[-1], ys[-1]), color=INK2, fontsize=8,
                    va="center")
    if logx:
        ax.set_xscale("log", base=2)
    _axes(ax, xlabel, ylabel, title)
    if len(names) >= 2:
        ax.legend(frameon=False, fontsize=8, labelcolor=INK2)
    fig.tight_layout()
    fig.savefig(path, facecolor=SURFACE)
    plt.close(fig)
    print(f"wrote {path}", flush=True)
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("stores", nargs="+")
    ap.add_argument("--out_dir", default="results/figures")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    rows = []
    for p in args.stores:
        for key, leaf in ResultStore(p, load=True).walk():
            rows.append((key, leaf))

    # recall vs QPS: key = (db, index, arch, k, nprobe, batch)
    rq = _series_map(
        rows,
        lambda k, v: v.get("QPS"),
        lambda k, v: v.get("R@10"),
        lambda k, v: k[2] if len(k) > 2 else "run")
    _plot_lines(rq, "QPS", "recall@10", "Recall / throughput trade-off",
                os.path.join(args.out_dir, "recall_qps.png"))

    lat = _series_map(
        rows,
        lambda k, v: int(k[5]) if len(k) > 5 and str(k[5]).isdigit() else None,
        lambda k, v: v.get("latency_ms_p50"),
        lambda k, v: k[2] if len(k) > 2 else "run")
    _plot_lines(lat, "batch size", "p50 latency (ms)",
                "Latency vs batch size",
                os.path.join(args.out_dir, "latency_batch.png"), logx=True)

    # stage breakdown (profiling_stages rows carry *_ms fields)
    stage_rows = [(k, v) for k, v in rows if "scan_ms" in v]
    if stage_rows:
        key, leaf = stage_rows[-1]
        stages = [("coarse", leaf["coarse_ms"]), ("LUT", leaf["lut_ms"]),
                  ("ADC scan", leaf["scan_ms"]), ("top-k", leaf["topk_ms"])]
        fig, ax = plt.subplots(figsize=(6.4, 3.2), dpi=150)
        fig.patch.set_facecolor(SURFACE)
        names = [s for s, _ in stages]
        vals = [max(v, 0.0) for _, v in stages]
        ax.barh(names, vals, color=SERIES[0], height=0.55, zorder=3)
        for y, v in enumerate(vals):
            ax.annotate(f" {v:.2f} ms", (v, y), color=INK2, fontsize=8,
                        va="center")
        _axes(ax, "device time (ms)", "",
              f"Pipeline stage breakdown — {'/'.join(key)}")
        ax.invert_yaxis()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir, "stages.png"),
                    facecolor=SURFACE)
        plt.close(fig)
        print(f"wrote {args.out_dir}/stages.png", flush=True)


if __name__ == "__main__":
    main()
