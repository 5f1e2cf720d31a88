"""Energy accounting for benchmark runs.

Parity with the reference's energy-measurement suite
(``Faiss_experiments/energy_measurement/`` — RAPL for CPU, nvidia-smi logs
for GPU, vendor power reports for the FPGA, aggregated by
``ASPLOS_compute_CPU_GPU_FPGA_energy.py``):

- **Host CPU**: Linux powercap/RAPL sysfs counters sampled around a
  workload (``RaplMeter``).
- **TPU**: per-chip power is not exposed to user code on this platform;
  ``tpu_energy_estimate`` applies the published chip TDP × a measured
  duty-cycle, the same methodology the reference applies to its FPGA
  (constant-power × runtime).

Usage:
    with RaplMeter() as m: run()
    joules = m.joules
    est = tpu_energy_estimate(seconds=run_s, duty=0.8, chip="v5e")
"""

from __future__ import annotations

import glob
import os
import time
from typing import Dict, Optional

# Published typical board power (W). The reference uses the same style of
# constant for its FPGA accounting.
TPU_TDP_W = {"v5e": 170.0, "v5p": 350.0, "v4": 220.0}


class RaplMeter:
    """Reads intel-rapl energy_uj counters around a with-block."""

    SYS = "/sys/class/powercap"

    def __init__(self) -> None:
        # top-level PACKAGE domains only (intel-rapl:<n>): subzones like
        # intel-rapl:0:0 (core) / :0:1 (uncore) are subsets of the package
        # counter — glob'ing them too would double-count energy
        self.domains = sorted(
            p for p in glob.glob(
                os.path.join(self.SYS, "intel-rapl:*", "energy_uj"))
            if ":" not in os.path.basename(os.path.dirname(p))
            .split("intel-rapl:", 1)[1])
        self.available = bool(self.domains) and all(
            os.access(p, os.R_OK) for p in self.domains)
        self.joules: Optional[float] = None
        self.seconds: Optional[float] = None

    def _read(self) -> Dict[str, int]:
        out = {}
        for p in self.domains:
            try:
                with open(p) as f:
                    out[p] = int(f.read().strip())
            except OSError:
                pass
        return out

    def __enter__(self) -> "RaplMeter":
        self._t0 = time.perf_counter()
        self._e0 = self._read() if self.available else {}
        return self

    def __exit__(self, *exc) -> bool:
        self.seconds = time.perf_counter() - self._t0
        if self.available:
            e1 = self._read()
            # counters wrap at max_energy_range_uj; ignore wrapped domains
            deltas = [e1[p] - self._e0[p] for p in self._e0
                      if p in e1 and e1[p] >= self._e0[p]]
            self.joules = sum(deltas) / 1e6 if deltas else None
        return False

    @property
    def watts(self) -> Optional[float]:
        if self.joules is None or not self.seconds:
            return None
        return self.joules / self.seconds


def tpu_energy_estimate(seconds: float, duty: float = 1.0,
                        chip: str = "v5e", n_chips: int = 1) -> Dict:
    """Constant-power energy estimate (reference FPGA methodology)."""
    w = TPU_TDP_W.get(chip, 200.0)
    return {
        "chip": chip, "n_chips": n_chips, "seconds": seconds,
        "assumed_watts": w, "duty": duty,
        "joules": w * duty * seconds * n_chips,
    }


def queries_per_joule(qps: float, watts: float) -> float:
    """The reference's headline efficiency metric (queries/J)."""
    return qps / watts if watts else float("nan")


def tpu_efficiency(qps: float, chip: str = "v5e", n_chips: int = 1,
                   duty: float = 1.0) -> Dict:
    """Accelerator-side efficiency block for benchmark JSON lines.

    Same methodology as the reference's FPGA accounting
    (``ASPLOS_compute_CPU_GPU_FPGA_energy.py:74-98``: constant board
    power × busy time — its FPGA draws 36.5-39.3 W and pays
    ``scanned_bytes/32 GB/s`` per query): here published chip TDP × the
    measured busy fraction.  Returns queries/J (== QPS/W) and mJ/query,
    the two efficiency axes the reference reports."""
    w = TPU_TDP_W.get(chip, 200.0) * n_chips * duty
    return {
        "chip": chip, "n_chips": n_chips, "assumed_watts": w,
        "qps_per_watt": round(qps / w, 3) if w else None,
        "mj_per_query": round(w / qps * 1e3, 4) if qps else None,
    }
