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


def test_nav_parity_corruption_caught_at_allocation(fixtures_dir, monkeypatch):
    """Corrupted nav words must be caught by the UNCONDITIONAL runtime
    parity self-check (reference validate_parityN via computeChecksum,
    gps.c:926-1001, 1070) — default config, no --verbose."""
    import pytest

    from gpssim_tpu.core import channels as chmod

    real = chmod.generate_nav_msg

    def corrupting(g, sbf, dwrd, ipage, init):
        out = real(g, sbf, dwrd, ipage, init)
        dwrd[7] ^= np.uint32(1 << 12)  # flip a data bit post-checksum
        return out

    monkeypatch.setattr(chmod, "generate_nav_msg", corrupting)
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.3,
        almanac_enable=False,
    )
    with pytest.raises(RuntimeError, match="parity"):
        Simulation(cfg)


def test_nav_parity_corruption_caught_at_regen(fixtures_dir, monkeypatch):
    """Same check on the 30 s regeneration path (scenario._post_block)."""
    import pytest

    from gpssim_tpu import scenario as smod

    real = smod.generate_nav_msg

    def corrupting(g, sbf, dwrd, ipage, init):
        out = real(g, sbf, dwrd, ipage, init)
        if not init:  # only corrupt regenerated frames
            dwrd[31] ^= np.uint32(1 << 20)
        return out

    monkeypatch.setattr(smod, "generate_nav_msg", corrupting)
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=32.0,
        almanac_enable=False,
    )
    sim = Simulation(cfg)
    with pytest.raises(RuntimeError, match="parity"):
        for _ in sim.iter_plans():
            pass


def test_kernel_invariants_raise_real_exceptions(fixtures_dir):
    """The args-conversion invariants are ValueErrors, not asserts — they
    guard against silent output corruption and must survive python -O
    (ADVICE/VERDICT r1)."""
    import pytest

    from gpssim_tpu.ops.synth_jax import plan_to_args

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.3,
        almanac_enable=False,
    )
    plan = next(Simulation(cfg).iter_plans())

    slow = type(plan)(**{**plan.__dict__})
    slow.delt = 1.0 / 500_000.0  # below the 128-chip window minimum
    slow.num_samples = 50_000
    with pytest.raises(ValueError, match="sample rate too low"):
        plan_to_args(slow)

    bad = type(plan)(**{**plan.__dict__})
    bad.iword = bad.iword + 59  # data window past the 60-word buffer
    with pytest.raises(ValueError, match="data-bit|60-word"):
        plan_to_args(bad)


def test_ipage_reallocation_quirk_gated_on_parity(fixtures_dir):
    """The reference's allocateChannel never resets a slot's ipage
    (gps.c:2164-2216), so a satellite allocated mid-run continues the
    25-page almanac cycle of the slot's previous occupant. That quirk is
    replicated only under parity_exact; otherwise a fresh allocation
    starts at page 0."""
    for parity, want_ipage in ((True, 8), (False, 1)):
        cfg = SimConfig(
            nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.3,
            almanac_enable=False, parity_exact=parity,
        )
        sim = Simulation(cfg)
        tbl = sim.channels
        slot = tbl.active_slots()[0]
        ch = tbl.chan[slot]
        prn = ch.prn
        # Free the slot as if its occupant set, leaving a stale page
        # counter behind; the same satellite then re-claims it.
        ch.ipage = 7
        tbl.allocated_sat[prn - 1] = -1
        ch.prn = 0
        tbl.allocate(
            sim.alm, sim.nav.sets[sim.ieph], sim.ionoutc, sim.grx,
            sim._xyz_at(0),
        )
        assert tbl.chan[slot].prn == prn
        # generate_nav_msg(init=True) leaves ipage at start+1 (mod 25).
        assert tbl.chan[slot].ipage == want_ipage, parity
