"""Scenario driver logic: ephemeris-set advance at the 30 s boundary."""

import numpy as np

from gpssim_tpu.config import SimConfig
from gpssim_tpu.core.ephemeris import read_rinex_nav
from gpssim_tpu.core.gpstime import GpsTime, gps2date
from gpssim_tpu.scenario import Simulation


def test_almanac_download_failure_warns_and_continues(fixtures_dir):
    """Network failure on the almanac fetch must not kill the scenario —
    the reference prints a red status line and runs without almanac pages
    (gps.c:2622-2635)."""
    import pytest

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.3,
        almanac_enable=True, use_ftp=True,
    )
    with pytest.warns(UserWarning, match="almanac download failed"):
        sim = Simulation(cfg)
    assert not sim.alm.valid
    assert next(sim.iter_plans()) is not None


def test_ephemeris_set_advance(fixtures_dir):
    """When the next set's toc comes within 1 h, ieph advances and the
    channels' subframe buffers are rebuilt (gps.c:2878-2906)."""
    nav_file = f"{fixtures_dir}/brdc_test.22n"
    nav = read_rinex_nav(nav_file, version=2)
    assert nav.neph >= 2
    sv1 = int(np.nonzero(nav.sets[1].vflg)[0][0])
    toc1 = GpsTime(int(nav.sets[1].toc_week[sv1]), float(nav.sets[1].toc_sec[sv1]))

    # Start 3585 s before toc1-1h: still selects set 0, and the advance
    # condition dt < 1 h first becomes true at the 30 s boundary ~45 s in.
    start = gps2date(GpsTime(toc1.week, toc1.sec - 3600.0 - 15.0))
    cfg = SimConfig(
        nav_file=nav_file, duration_sec=50.0, almanac_enable=False,
        start=start,
    )
    sim = Simulation(cfg)
    assert sim.ieph == 0
    sbf_before = [
        None if ch.sbf is None else ch.sbf.copy() for ch in sim.channels.chan
    ]

    switched_at = None
    for i, _ in enumerate(sim.iter_plans()):
        if switched_at is None and sim.ieph == 1:
            switched_at = i
    assert sim.ieph == 1, "ephemeris set did not advance"
    # dt drops below 3600 at the second 30 s boundary after start.
    assert switched_at is not None and switched_at < 480

    changed = any(
        b is not None
        and ch.prn > 0
        and not np.array_equal(b, ch.sbf)
        for b, ch in zip(sbf_before, sim.channels.chan)
    )
    assert changed, "subframe buffers were not refreshed from the new set"
