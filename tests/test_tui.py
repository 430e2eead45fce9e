"""TUI key-dispatch and status-log logic (no curses; pure state checks).

Semantics mirror the reference's main-loop key handler (gps-sim.c:332-414):
bearing steps of 127 millideg with wrap, vertical speed ±1 m/s, speed in
0.01 m/s units clamped at 0, gain through the sink's clamp.
"""

import numpy as np
import pytest

from gpssim_tpu.config import SimConfig, SynthBackend
from gpssim_tpu.io.sinks import HackRfSink, PlutoSink
from gpssim_tpu.scenario import Simulation
from gpssim_tpu.tui import StatusLog, TuiApp, format_channel_rows, format_position


@pytest.fixture
def app(fixtures_dir):
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=0.5,
        almanac_enable=False,
        backend=SynthBackend.NUMPY,
        interactive=True,
        tx_gain=46,
    )
    sim = Simulation(cfg)
    return TuiApp(cfg, sim, HackRfSink())


def key(app, ch):
    app.handle_key(ord(ch))


def test_bearing_steps_and_wrap(app):
    ia = app.sim.interactive
    key(app, "d")
    assert ia.bearing_millideg == 127.0
    key(app, "a")
    assert ia.bearing_millideg == 0.0
    key(app, "a")  # below 0 wraps to 360000 (gps-sim.c:365-368)
    assert ia.bearing_millideg == 360000.0
    key(app, "d")  # above 360000 wraps to 0
    assert ia.bearing_millideg == 0.0


def test_speed_units_and_clamp(app):
    ia = app.sim.interactive
    key(app, "e")
    key(app, "e")
    assert ia.velocity == pytest.approx(0.02)  # speed/100 (gps-sim.c:386-393)
    key(app, "q")
    key(app, "q")
    key(app, "q")  # clamped at 0
    assert ia.velocity == 0.0


def test_vertical_speed(app):
    ia = app.sim.interactive
    key(app, "w")
    key(app, "w")
    key(app, "s")
    assert ia.vertical_speed == 1.0


def test_gain_clamped_by_sink(app):
    key(app, "t")
    assert app.gain == 47  # HackRF 0-47 dB (sdr_hackrf.h:19-20)
    key(app, "t")
    assert app.gain == 47
    for _ in range(60):
        key(app, "g")
    assert app.gain == 0

    pluto = PlutoSink()
    assert pluto.set_gain(5) == 0 and pluto.set_gain(-100) == -80


def test_help_popup_toggles(app):
    key(app, "h")
    assert app.show_help
    key(app, "d")  # any key dismisses; the keystroke is swallowed
    assert not app.show_help
    assert app.sim.interactive.bearing_millideg == 0.0


def test_exit_key_sets_stop(app):
    key(app, "x")
    assert app.stop_flag.is_set()


def test_tab_cycles_sky_view_and_fkeys_return(app):
    """TAB cycles panels (gps-sim.c:352-353); F1-F3 select the dashboard
    (the reference's TRACK/LS_FIX/KF_FIX panels, gps-sim.c:355-361)."""
    assert app.view == 0
    app.handle_key(9)  # TAB
    assert app.view == 1
    app.handle_key(9)
    assert app.view == 0
    app.handle_key(9)
    for fkey in (265, 266, 267):
        app.handle_key(fkey)
        assert app.view == 0


def test_sky_rows_cover_all_prns(app):
    """The sky view (reference EPHEMERIS panel, gui.c:203) lists all 32
    PRNs; simulated ones are exactly the allocated channels and carry the
    channel's az/el."""
    from gpssim_tpu.core.constants import R2D
    from gpssim_tpu.tui import format_sky_rows

    rows = format_sky_rows(app.sim)
    assert len(rows) == 32
    sim_prns = {
        int(prn) + 1
        for prn, slot in enumerate(app.sim.channels.allocated_sat)
        if slot >= 0
    }
    assert sim_prns  # scenario has visible satellites
    for prn in range(1, 33):
        row = rows[prn - 1]
        assert row.startswith(f"PRN{prn:3d}")
        assert row.endswith("Y") == (prn in sim_prns)
    # az/el agree with the allocated channel state
    prn = min(sim_prns)
    slot = int(app.sim.channels.allocated_sat[prn - 1])
    az, el = app.sim.channels.chan[slot].azel
    assert f"{az * R2D:5.1f}" in rows[prn - 1]
    assert f"{el * R2D:5.1f}" in rows[prn - 1]


def test_status_log_scrolls():
    log = StatusLog(maxlen=3)
    for i in range(5):
        log.write(f"line {i}")
    assert log.tail(10) == ["line 2", "line 3", "line 4"]
    log.write("a\nb")
    assert log.tail(2) == ["a", "b"]


def test_format_helpers(app):
    next(app.sim.iter_plans())
    pos = format_position(app.sim)
    assert "Lat" in pos and "139." in pos
    rows = format_channel_rows(app.sim)
    assert rows and all("PRN" in r for r in rows)


def test_ppb_offsets_carrier_when_not_parity_exact(fixtures_dir):
    base = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.3,
        almanac_enable=False, backend=SynthBackend.NUMPY,
    )
    p0 = next(Simulation(base).iter_plans())

    shifted = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.3,
        almanac_enable=False, backend=SynthBackend.NUMPY,
        ppb=100, parity_exact=False,
    )
    p1 = next(Simulation(shifted).iter_plans())
    # freq scale (1e7-ppb)/1e7 on the L1 carrier (sdr_hackrf.c:136-138)
    expect = 1_575_420_000.0 * ((1e7 - 100) / 1e7 - 1.0)
    d = p1.f_carr[p1.active] - p0.f_carr[p0.active]
    assert np.allclose(d, expect)

    # In parity mode ppb must not perturb the baseband (reference applies
    # it to the hardware LO only).
    parity = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.3,
        almanac_enable=False, backend=SynthBackend.NUMPY, ppb=100,
    )
    p2 = next(Simulation(parity).iter_plans())
    assert np.array_equal(p2.f_carr, p0.f_carr)


def test_almanac_date_field(app, fixtures_dir):
    """The LS_FIX 'Almanac date' field (reference gps.c:2652-2656):
    last valid SV's toa when an almanac is loaded, disabled notice
    otherwise."""
    from gpssim_tpu.core.almanac import read_sem_almanac
    from gpssim_tpu.core.gpstime import gps2date
    from gpssim_tpu.tui import format_almanac_date

    assert format_almanac_date(app.sim) == "Almanac date: Disabled or invalid."

    alm = read_sem_almanac(f"{fixtures_dir}/almanac_test.sem")
    app.sim.alm = alm
    toa = [a.toa for a in alm.sv if a.valid != 0][-1]
    t = gps2date(toa)
    assert format_almanac_date(app.sim) == (
        f"Almanac date: {t.y:4d}/{t.m:02d}/{t.d:02d},"
        f"{t.hh:02d}:{t.mm:02d}:{t.sec:02.0f}"
    )
