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


def test_rapl_meter_skips_subzones(tmp_path, monkeypatch):
    """Only package domains count: intel-rapl:0:0/:0:1 subzone counters
    are subsets of the intel-rapl:0 package counter — including them
    double-counts energy."""
    for dom, e in (("intel-rapl:0", 1000), ("intel-rapl:0:0", 600),
                   ("intel-rapl:0:1", 300), ("intel-rapl:1", 2000)):
        d = tmp_path / dom
        d.mkdir()
        (d / "energy_uj").write_text(str(e))
    monkeypatch.setattr(RaplMeter, "SYS", str(tmp_path))
    m = RaplMeter()
    assert m.available
    assert [p.split("/")[-2] for p in m.domains] == ["intel-rapl:0",
                                                     "intel-rapl:1"]
    with m:
        for dom, e in (("intel-rapl:0", 4000), ("intel-rapl:0:0", 2600),
                       ("intel-rapl:1", 5000)):
            (tmp_path / dom / "energy_uj").write_text(str(e))
    assert m.joules == (3000 + 3000) / 1e6


def test_tpu_efficiency_block():
    from chamjax.utils.energy import tpu_efficiency

    eff = tpu_efficiency(85_000.0, chip="v5e")
    assert eff["assumed_watts"] == 170.0
    assert abs(eff["qps_per_watt"] - 500.0) < 0.1
    assert abs(eff["mj_per_query"] - 2.0) < 0.01
    # mesh accounting scales watts with chips
    eff8 = tpu_efficiency(85_000.0, chip="v5e", n_chips=8)
    assert abs(eff8["qps_per_watt"] - 62.5) < 0.1
