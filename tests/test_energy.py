"""Energy accounting tests (RAPL availability is environment-dependent —
the meter must degrade gracefully)."""

import time

from chamjax.utils.energy import (
    RaplMeter, queries_per_joule, tpu_energy_estimate,
)


def test_rapl_meter_graceful():
    with RaplMeter() as m:
        time.sleep(0.02)
    assert m.seconds >= 0.02
    if m.available and m.joules is not None:
        assert m.joules >= 0
        assert m.watts is not None and m.watts >= 0
    else:
        assert m.joules is None


def test_tpu_energy_estimate():
    est = tpu_energy_estimate(seconds=10.0, duty=0.5, chip="v5e", n_chips=2)
    assert est["joules"] == 170.0 * 0.5 * 10.0 * 2
    assert queries_per_joule(1000.0, 100.0) == 10.0
