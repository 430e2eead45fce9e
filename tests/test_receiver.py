"""Software-receiver validation: the generated stream must produce a FIX.

The reference's ultimate QA is physical — feed the RF output to a real GPS
receiver and check it fixes at the simulated location (SURVEY §4 item 2).
These tests run the full software receiver chain (gpssim_tpu.receiver) on
generated IQ: acquisition → tracking → bit demodulation → LNAV frame/
ephemeris/iono decode → pseudoranges → RAIM'd Gauss-Newton solution, with
no access to simulator internals beyond the IQ bytes, and assert the fix
lands on the simulated position to meter level.
"""

import numpy as np
import pytest

from tests.helpers import strict_gen_backend

from gpssim_tpu.acquire import load_iq
from gpssim_tpu.config import LocationConfig, SimConfig, SynthBackend
from gpssim_tpu.core.almanac import Almanac
from gpssim_tpu.core.atmosphere import IonoUtc
from gpssim_tpu.core.constants import OMEGA_EARTH, SPEED_OF_LIGHT
from gpssim_tpu.core.ephemeris import read_rinex_nav
from gpssim_tpu.core.gpstime import GpsTime
from gpssim_tpu.core.navmsg import eph2sbf, generate_nav_msg
from gpssim_tpu.core.orbits import EphemerisSet, satpos
from gpssim_tpu.receiver import (
    Observation,
    decode_ephemeris,
    decode_frames,
    decode_iono_utc,
    pvt_solve,
    receiver_fix,
)
from gpssim_tpu.runner import run_simulation
from gpssim_tpu.scenario import Simulation

RATE = 2_600_000

# Broadcast quantization (IS-GPS-200 Table 20-I/III scale factors, as used
# by navmsg.eph2sbf): the decoder must land within one LSB of the RINEX
# originals.
_PI = float(np.pi)
# Angles are broadcast as two's-complement semicircles: a RINEX value
# outside [-pi, pi) decodes 2*pi away (same angle; Kepler is unaffected).
_EPH_ANGULAR = {"m0", "omg0", "inc0", "aop"}

_EPH_LSB = {
    "tgd": 2.0**-31,
    "af0": 2.0**-31,
    "af1": 2.0**-43,
    "af2": 2.0**-55,
    "crs": 2.0**-5,
    "crc": 2.0**-5,
    "cuc": 2.0**-29,
    "cus": 2.0**-29,
    "cic": 2.0**-29,
    "cis": 2.0**-29,
    "deltan": 2.0**-43 * _PI,
    "omgdot": 2.0**-43 * _PI,
    "idot": 2.0**-43 * _PI,
    "m0": 2.0**-31 * _PI,
    "omg0": 2.0**-31 * _PI,
    "inc0": 2.0**-31 * _PI,
    "aop": 2.0**-31 * _PI,
    "ecc": 2.0**-33,
    "sqrta": 2.0**-19,
}


@pytest.fixture(scope="module")
def rx_scenario(fixtures_dir, tmp_path_factory):
    """20 s static scenario (iono off so the fix is geometry-pure: the
    page-18 iono data a receiver would correct with is only transmitted
    in frame 18 of the 25-page cycle, ~9 min into the stream)."""
    out = str(tmp_path_factory.mktemp("rx") / "iq.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=20.0,
        sample_rate=RATE,
        almanac_enable=False,
        ionosphere_enable=False,
        backend=strict_gen_backend(),
        sink="iqfile",
        out_file=out,
        location=LocationConfig(35.681298, 139.766247, 10.0),
    )
    sim = Simulation(cfg)
    truth = np.array(sim.xyz0)
    week, g0_sec = sim.g0.week, sim.g0.sec
    run_simulation(cfg, sim=sim)
    return out, truth, week, g0_sec


def test_position_fix(rx_scenario, fixtures_dir):
    """End-to-end: IQ bytes in, meter-level position + ns-level time out."""
    out, truth, week, g0_sec = rx_scenario
    x = load_iq(out, 8)
    fix, channels, rx_eph, _ = receiver_fix(x, RATE, week_hint=week)

    err = np.linalg.norm(fix.xyz - truth)
    assert err < 5.0, f"position error {err:.2f} m (fix {fix.xyz}, truth {truth})"
    assert fix.residual_rms_m < 1.0, fix.residual_rms_m
    assert fix.nsats >= 5, fix.prns

    # Solved receive time must match the scenario clock to ~ns, and the
    # Doppler-derived velocity must be static to cm/s.
    s_m = (len(x) // channels[0].seg_len - 1) * channels[0].seg_len
    t_rx_true = g0_sec + s_m / RATE
    assert abs(fix.t_rx - t_rx_true) < 200e-9, fix.t_rx - t_rx_true
    assert fix.vel is not None and np.linalg.norm(fix.vel) < 0.5, fix.vel
    assert abs(fix.clock_drift_mps) < 0.5

    # The over-the-air-decoded ephemerides match the RINEX originals to
    # their broadcast quantization (the decoded values are what the
    # simulator transmitted after IS-GPS-200 scaling/truncation).
    nav = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n")
    eph_true = nav.sets[0]
    for ch in channels:
        sv = ch.prn - 1
        assert rx_eph.vflg[sv]
        assert rx_eph.toc_sec[sv] == eph_true.toc_sec[sv]
        assert rx_eph.toe_sec[sv] == eph_true.toe_sec[sv]
        assert rx_eph.iode[sv] == eph_true.iode[sv]
        assert rx_eph.iodc[sv] == eph_true.iodc[sv]
        for name, lsb in _EPH_LSB.items():
            d = getattr(rx_eph, name)[sv] - getattr(eph_true, name)[sv]
            if name in _EPH_ANGULAR:
                d = (d + _PI) % (2.0 * _PI) - _PI
            assert abs(d) <= lsb * 1.0000001, (ch.prn, name)


def test_lnav_decode_roundtrip(fixtures_dir):
    """decode_frames/decode_ephemeris/decode_iono_utc are exact bit
    inverses of the serializer: serialize a frame with page 18 (iono),
    decode it from the raw bit stream, re-encode, compare words."""
    nav = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n")
    eph_true = nav.sets[0]
    assert nav.ionoutc.vflg, "fixture must carry iono data"
    sv = int(np.nonzero(eph_true.vflg)[0][0])
    alm = Almanac()

    sbf = eph2sbf(eph_true, sv, nav.ionoutc, alm)
    g = GpsTime(eph_true.toc_week[sv], 345600.0)
    dwrd = np.zeros(60, dtype=np.uint32)
    generate_nav_msg(g, sbf, dwrd, ipage=17, init=True)  # SF4 = page 18

    bits = np.array(
        [(int(dwrd[w]) >> (29 - b)) & 1 for w in range(60) for b in range(30)],
        dtype=np.uint8,
    )
    frames = decode_frames(bits)

    # Five consecutive subframes (plus the leading subframe 5 page).
    tows = [t for _, t in frames.tows]
    assert all(b - a == 1 for a, b in zip(tows, tows[1:]))
    assert {1, 2, 3} <= set(frames.subframes)
    assert 56 in frames.pages4  # page 18 SV ID

    rx_eph = EphemerisSet()
    decode_ephemeris(frames, sv + 1, int(eph_true.toc_week[sv]), rx_eph)
    rx_eph.finalize()
    assert int(rx_eph.toc_week[sv]) == int(eph_true.toc_week[sv])

    rx_iono = decode_iono_utc(frames)
    assert rx_iono.vflg

    # Extracted data words equal the serialized payloads exactly: word 1
    # (TLM) and data words 3-9; word 2 (HOW) carries the serializer's TOW
    # and words 2/10 get non-information parity bits solved, so word 10 is
    # compared with those two bits masked. Subframe 1 word 3 gets the
    # transmission week OR-ed in at serialization (gps.c:2119-2121).
    wn = int(eph_true.toc_week[sv]) % 1024
    for sfid in (1, 2, 3):
        got = frames.subframes[sfid]
        want = [int(w) >> 6 for w in sbf[sfid - 1]]
        if sfid == 1:
            want[2] |= (wn & 0x3FF) << 14
        assert got[0] == want[0], sfid
        assert got[2:9] == want[2:9], sfid
        assert (got[9] & 0xFFFFFC) == (want[9] & 0xFFFFFC), sfid

    # Decoded physical values within one broadcast LSB of the originals.
    for name, lsb in _EPH_LSB.items():
        d = getattr(rx_eph, name)[sv] - getattr(eph_true, name)[sv]
        if name in _EPH_ANGULAR:
            d = (d + _PI) % (2.0 * _PI) - _PI
        assert abs(d) <= lsb * 1.0000001, name

    # Page 18 re-encodes bit-identically from the decoded iono/UTC values
    # (the iono encode uses round(), stable under the f64 scale round
    # trip, unlike the trunc() ephemeris fields).
    again = eph2sbf(rx_eph, sv, rx_iono, alm)
    assert np.array_equal(again[3 + 17 * 2], sbf[3 + 17 * 2]), "page 18"


def test_almanac_page_decode_roundtrip(fixtures_dir):
    """decode_almanac inverts the almanac page packing: serialize every
    frame of the 25-page cycle, decode the pages, re-encode from the
    decoded almanac, and require bit-identical page words."""
    from gpssim_tpu.core.almanac import read_sem_almanac
    from gpssim_tpu.receiver import DecodedFrames, decode_almanac

    nav = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n")
    eph_true = nav.sets[0]
    sv = int(np.nonzero(eph_true.vflg)[0][0])
    alm = read_sem_almanac(f"{fixtures_dir}/almanac_test.sem")
    assert any(a.svid for a in alm.sv), "fixture almanac empty"

    sbf = eph2sbf(eph_true, sv, nav.ionoutc, alm)
    g = GpsTime(eph_true.toc_week[sv], 345600.0)

    merged = DecodedFrames()
    for page in range(25):
        dwrd = np.zeros(60, dtype=np.uint32)
        generate_nav_msg(g, sbf, dwrd, ipage=page, init=True)
        bits = np.array(
            [
                (int(dwrd[w]) >> (29 - b)) & 1
                for w in range(60)
                for b in range(30)
            ],
            dtype=np.uint8,
        )
        frames = decode_frames(bits)
        merged.pages4.update(frames.pages4)
        merged.pages5.update(frames.pages5)

    week = next(int(a.toa.week) for a in alm.sv if a.svid)
    rx_alm = decode_almanac(merged, week_hint=week)
    assert rx_alm.valid

    again = eph2sbf(eph_true, sv, nav.ionoutc, rx_alm)
    # Almanac rows: SF4 pages 2-5/7-10 and SF5 pages 1-24 + page 25.
    alm_rows = [3 + i * 2 for i in (1, 2, 3, 4, 6, 7, 8, 9)]
    alm_rows += [4 + i * 2 for i in range(25)]
    for r in alm_rows:
        assert np.array_equal(again[r], sbf[r]), f"sbf row {r}"
    # Decoded PRN set matches the SEM file's.
    assert [a.svid for a in rx_alm.sv] == [a.svid for a in alm.sv]


def test_global_bit_inversion_is_transparent(fixtures_dir):
    """A Costas 180° phase ambiguity inverts every demodulated bit; the
    LNAV parity scheme is complement-transparent, so decoding must give
    identical words."""
    nav = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n")
    eph_true = nav.sets[0]
    sv = int(np.nonzero(eph_true.vflg)[0][0])
    sbf = eph2sbf(eph_true, sv, nav.ionoutc, Almanac())
    g = GpsTime(eph_true.toc_week[sv], 345600.0)
    dwrd = np.zeros(60, dtype=np.uint32)
    generate_nav_msg(g, sbf, dwrd, ipage=0, init=True)
    bits = np.array(
        [(int(dwrd[w]) >> (29 - b)) & 1 for w in range(60) for b in range(30)],
        dtype=np.uint8,
    )
    a = decode_frames(bits)
    b = decode_frames(1 - bits)
    assert a.subframes.keys() == b.subframes.keys() and len(a.subframes) >= 3
    for k in a.subframes:
        assert a.subframes[k] == b.subframes[k]


def test_pvt_solver_raim_rejects_outlier(fixtures_dir):
    """Synthetic observations from the forward model; one corrupted by
    30 m. The leave-one-out RAIM must exclude it and recover the truth."""
    nav = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n")
    eph = nav.sets[0]
    truth = np.array([-3959617.482, 3350136.615, 3699531.459])
    t_rx = float(eph.toc_sec[np.nonzero(eph.vflg)[0][0]]) + 1800.0

    svs = np.nonzero(eph.vflg)[0]
    obs = []
    for sv in svs:
        pos, _, _ = satpos(eph, t_rx, np.array([sv]))
        if np.dot(pos[0] - truth, truth) < 0:  # below horizon
            continue
        # Invert the receiver's observation model for tau:
        # c (t_rx - tau) = |sagnac(pos(tau)) - truth| - c*clk(tau)
        tau = t_rx - 0.07
        for _ in range(8):
            pos, _, clk = satpos(eph, tau, np.array([sv]))
            tof = t_rx - tau
            sat = np.array(
                [
                    pos[0, 0] + pos[0, 1] * OMEGA_EARTH * tof,
                    pos[0, 1] - pos[0, 0] * OMEGA_EARTH * tof,
                    pos[0, 2],
                ]
            )
            rho = np.linalg.norm(sat - truth)
            tau = t_rx - rho / SPEED_OF_LIGHT + clk[0, 0]
        obs.append(Observation(int(sv) + 1, float(tau), 0.0))
        if len(obs) == 7:
            break
    assert len(obs) >= 6, "fixture lacks visible satellites"

    t_nom = max(o.tau_sv for o in obs) + 0.076
    for o in obs:
        o.pr_rel = SPEED_OF_LIGHT * (t_nom - o.tau_sv)
    bad = obs[2].prn
    obs[2].pr_rel += 30.0

    iono_off = IonoUtc()
    iono_off.enable = False
    fix = pvt_solve(obs, eph, iono_off, t_nom)
    assert bad not in fix.prns, "outlier not rejected"
    err = np.linalg.norm(fix.xyz - truth)
    assert err < 0.5, err
    assert abs(fix.t_rx - t_rx) < 1e-9


@pytest.mark.slow
def test_moving_receiver_pvt(fixtures_dir, tmp_path):
    """Full PVT on a dynamic platform: the circle-motion scenario (6.3 m/s,
    1.5 m/s² — the reference's canonical motion fixture) must yield a
    meter-level position AND a cm/s-level velocity at the measurement
    instant, from the IQ bytes alone."""
    out = str(tmp_path / "iq.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=20.0,
        sample_rate=RATE,
        almanac_enable=False,
        ionosphere_enable=False,
        backend=strict_gen_backend(),
        sink="iqfile",
        out_file=out,
        motion_file=f"{fixtures_dir}/circle_motion.csv",
    )
    sim = Simulation(cfg)
    week, g0_sec = sim.g0.week, sim.g0.sec
    motion = np.loadtxt(
        f"{fixtures_dir}/circle_motion.csv", delimiter=","
    )[:, 1:4]
    run_simulation(cfg, sim=sim)

    x = load_iq(out, 8)
    fix, channels, _, _ = receiver_fix(x, RATE, week_hint=week)

    s_m = (len(x) // channels[0].seg_len - 1) * channels[0].seg_len
    ep = int(round(s_m / RATE * 10.0))
    truth = motion[ep]
    v_truth = (motion[ep + 1] - motion[ep - 1]) * 5.0  # central difference

    assert np.linalg.norm(fix.xyz - truth) < 10.0, fix.xyz - truth
    assert fix.vel is not None
    assert np.linalg.norm(fix.vel - v_truth) < 0.5, (fix.vel, v_truth)
    assert abs(fix.t_rx - (g0_sec + s_m / RATE)) < 200e-9


@pytest.mark.slow
def test_interactive_command_moves_receiver_fix(fixtures_dir, tmp_path):
    """Close the CONTROL loop end to end: a mid-run interactive motion
    command (the path the TUI 'w/a/d' keys drive, gps.c:2714-2729 /
    gps-sim.c:363-393) must move the position an independent receiver
    observes. The commands land between blocks via on_block — the same
    0.1 s control cadence as the reference's key loop — ramping a held
    'speed' key at 1.5 m/s² (a velocity STEP breaks PLL lock and garbles
    a subframe; a ramp is what held keys produce and matches the circle
    fixture's proven dynamics). The fix at the end of the capture must
    match the integrated trajectory, ~150 m from the start point."""
    from gpssim_tpu.core.motion import InteractiveState

    out = str(tmp_path / "iq.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=20.0,
        sample_rate=RATE,
        almanac_enable=False,
        ionosphere_enable=False,
        backend=strict_gen_backend(),
        sink="iqfile",
        out_file=out,
        interactive=True,
    )
    sim = Simulation(cfg)
    week = sim.g0.week
    xyz0 = np.array(sim.xyz0)

    # Key schedule: from block 50 (t=5 s) ramp 0.15 m/s per 0.1 s block
    # up to 15 m/s at block 150, then hold.
    def vel_after_block(b: int) -> float:
        return 0.15 * min(max(b - 49, 0), 100)

    def on_block(stats, s, plan):
        v = vel_after_block(stats.blocks)
        if v > 0.0:
            s.set_motion(bearing_deg=60.0, velocity=v, vertical_speed=0.0)

    run_simulation(cfg, sim=sim, on_block=on_block)

    x = load_iq(out, 8)
    fix, channels, _, _ = receiver_fix(x, RATE, week_hint=week)
    s_m = (len(x) // channels[0].seg_len - 1) * channels[0].seg_len
    ep = int(round(s_m / RATE * 10.0))

    # Truth: replay the integration the engine performs — epoch e is
    # planned after on_block(blocks=e-1), so it moves at vel_after_block(e-1).
    st = InteractiveState(bearing_millideg=60000.0)
    pos = xyz0.copy()
    track_pts = [pos]
    for e in range(1, ep + 2):
        st.velocity = vel_after_block(e - 1)
        pos = st.step(pos, sim.tmat, 0.1)
        track_pts.append(pos)
    truth = track_pts[ep]
    v_truth = (track_pts[ep + 1] - track_pts[ep - 1]) * 5.0

    moved = np.linalg.norm(truth - xyz0)
    assert moved > 100.0, moved  # the commands produced real displacement
    err = np.linalg.norm(fix.xyz - truth)
    assert err < 10.0, f"fix missed the commanded trajectory by {err:.1f} m"
    # And the fix is nowhere near the start point — the commands took hold.
    assert np.linalg.norm(fix.xyz - xyz0) > moved - 10.0
    # The solved velocity matches the commanded kinematics.
    assert fix.vel is not None
    assert np.linalg.norm(fix.vel - v_truth) < 0.5, (fix.vel, v_truth)


@pytest.mark.slow
def test_fix_on_reference_oracle_output(oracle_bin, fixtures_dir, tmp_path):
    """The software receiver must fix on the *reference C simulator's* own
    IQ bytes — closing the loop against the reference itself, independent
    of this framework's synthesis path (SURVEY §4 item 2)."""
    from gpssim_tpu.core.frames import llh2xyz
    from tests.test_golden import TOKYO, run_oracle

    nav = f"{fixtures_dir}/brdc_test.22n"
    out = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=20, bits=8, iono=0, almanac=0, **TOKYO,
    )
    truth = llh2xyz(
        np.array([np.radians(35.681298), np.radians(139.766247), 10.0])
    )
    nav_data = read_rinex_nav(nav)
    eph0 = nav_data.sets[0]
    week = int(eph0.toc_week[np.nonzero(eph0.vflg)[0][0]])
    x = load_iq(out, 8)
    fix, channels, _, _ = receiver_fix(x, 3_000_000.0, week_hint=week)
    err = np.linalg.norm(fix.xyz - truth)
    assert err < 5.0, f"fix {err:.2f} m off the reference's simulated position"
    assert fix.residual_rms_m < 1.0
    assert fix.nsats >= 5


def test_receiver_cli(rx_scenario, monkeypatch, capsys):
    """CLI prints the fix summary (chain itself covered above)."""
    import gpssim_tpu.receiver as rxmod

    out, truth, week, _ = rx_scenario
    called = {}

    def fake_fix(x, rate, week_hint, **kw):
        from gpssim_tpu.core.frames import xyz2llh

        called["n"] = len(x)
        fix = rxmod.Fix(
            xyz=truth, llh=xyz2llh(truth), clock_bias_m=1.0, t_rx=0.0,
            nsats=7, residual_rms_m=0.2, prns=[1, 2, 3, 4, 5, 6, 7],
        )
        return fix, [], EphemerisSet(), IonoUtc()

    monkeypatch.setattr(rxmod, "receiver_fix", fake_fix)
    assert rxmod.main([out, "--bits", "8", "--rate", str(RATE)]) == 0
    text = capsys.readouterr().out
    assert "fix: lat 35.68" in text and "ECEF" in text
    assert called["n"] > 0


@pytest.mark.slow
def test_fix_from_live_tcp_stream(fixtures_dir, tmp_path):
    """Close the live loop over the wire: the simulator streams IQ
    through the tcp radio sink (the streaming analog of a HackRF/Pluto
    TX) while a receiver consumes the socket — and gets a meter-level
    PVT fix from what arrived.  This is the reference's "feed it to a
    real receiver" QA loop with the TRANSPORT in the path, not just the
    synth output."""
    import socket
    import threading

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    received = bytearray()

    def collector():
        conn, _ = srv.accept()
        with conn:
            while True:
                data = conn.recv(1 << 16)
                if not data:
                    return
                received.extend(data)

    t = threading.Thread(target=collector, daemon=True)
    t.start()

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=20.0,
        sample_rate=RATE,
        almanac_enable=False,
        ionosphere_enable=False,
        backend=strict_gen_backend(),
        sink="tcp",
        tcp_addr=f"127.0.0.1:{port}",
        location=LocationConfig(35.681298, 139.766247, 10.0),
    )
    sim = Simulation(cfg)
    truth = np.array(sim.xyz0)
    week = sim.g0.week
    stats = run_simulation(cfg, sim=sim)
    t.join(timeout=30)
    assert not t.is_alive()
    srv.close()

    # Every streamed byte arrived (the sink's own integrity contract).
    assert len(received) == stats.blocks * 2 * cfg.samples_per_epoch

    iq_path = str(tmp_path / "wire.bin")
    with open(iq_path, "wb") as f:
        f.write(received)
    x = load_iq(iq_path, 8)
    fix, channels, _, _ = receiver_fix(x, RATE, week_hint=week)
    err = np.linalg.norm(fix.xyz - truth)
    assert err < 5.0, f"position error {err:.2f} m over the wire"
    assert fix.nsats >= 5, fix.prns


@pytest.mark.slow
def test_iono_on_fix_with_provided_klobuchar(fixtures_dir, tmp_path):
    """An iono-ON scenario solves to meter level when the receiver is
    given Klobuchar parameters (RINEX warm start — page 18 only
    transmits once per ~12.5 min almanac cycle, so a short capture
    cannot decode them over the air), and measurably worse without:
    the PVT's Klobuchar model (gps.c:1893-1964 parity) cancels the
    simulator's own iono delay."""
    out = str(tmp_path / "iono_on.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=20.0,
        sample_rate=RATE,
        almanac_enable=False,
        ionosphere_enable=True,
        backend=strict_gen_backend(),
        sink="iqfile",
        out_file=out,
        location=LocationConfig(35.681298, 139.766247, 10.0),
    )
    sim = Simulation(cfg)
    truth = np.array(sim.xyz0)
    week = sim.g0.week
    run_simulation(cfg, sim=sim)
    x = load_iq(out, 8)

    nav = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n")
    assert nav.ionoutc.vflg
    fix_cor, _, _, iono_used = receiver_fix(
        x, RATE, week_hint=week, iono=nav.ionoutc
    )
    err_cor = np.linalg.norm(fix_cor.xyz - truth)
    assert iono_used.vflg and iono_used.enable
    assert err_cor < 2.5, f"corrected iono-on fix off by {err_cor:.2f} m"

    fix_raw, _, _, iono_raw = receiver_fix(x, RATE, week_hint=week)
    err_raw = np.linalg.norm(fix_raw.xyz - truth)
    assert not iono_raw.vflg  # page 18 never arrived in 20 s
    assert err_raw > err_cor + 3.0, (err_raw, err_cor)


# ---------------------------------------------------------------------------
# Wide-window kernel rates (VERDICT r2 item 8): the 128-chip four-word
# kernel variants used below ~2.06 Msps must produce RECEIVABLE signal —
# acquire → track → decode → fix, end to end.
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize(
    "rate,err_bound",
    [
        (2_000_000, 5.0),  # ~1.96 samples/chip — wide-window kernel engaged
        (1_200_000, 8.0),  # sub-chip-Nyquist: ~1.17 samples/chip, the
        #                    kernel's deepest wide-window regime; the
        #                    narrower front-end costs correlation SNR, so
        #                    the bound is looser
    ],
)
def test_position_fix_wide_window_rates(fixtures_dir, tmp_path, rate, err_bound):
    out = str(tmp_path / f"wide_{rate}.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=20.0,
        sample_rate=rate,
        almanac_enable=False,
        ionosphere_enable=False,
        backend=strict_gen_backend(),
        sink="iqfile",
        out_file=out,
        location=LocationConfig(35.681298, 139.766247, 10.0),
    )
    from gpssim_tpu.ops.synth_jax import needs_wide_window

    assert needs_wide_window(1.0 / rate), "rate must exercise the wide kernel"
    sim = Simulation(cfg)
    truth = np.array(sim.xyz0)
    week = sim.g0.week
    run_simulation(cfg, sim=sim)

    x = load_iq(out, 8)
    fix, channels, _, _ = receiver_fix(x, rate, week_hint=week)
    err = np.linalg.norm(fix.xyz - truth)
    assert err < err_bound, f"{rate} sps fix off by {err:.2f} m"
    assert fix.nsats >= 4, fix.prns


@pytest.mark.slow
def test_commensurate_rate_2sps_still_receivable(fixtures_dir, tmp_path):
    """fs = exactly 2.046 Msps = 2 samples/chip, the commensurate rate
    every receiver design guide says to avoid: the stream is point-
    sampled (+/-1 chips, no pulse shaping — the reference's own
    signal model, gps.c:2781-2817), so a chip transition between two
    samples carries NO information about where between them it falls.
    Per-SV code phase is therefore only observable to ~±0.25 chip
    (±73 m) until code Doppler slides the transition grid, and the DOP
    amplifies what remains (measured ~200 m here, vs ~2 m at the
    incommensurate 2.0 Msps with the SAME kernels and receiver —
    see test_position_fix_wide_window_rates). This is sampling
    physics, not a framework defect; the test pins the degraded-mode
    contract: everything DIGITAL must still work end to end —
    acquisition, tracking, bit sync, full LNAV ephemeris decode, and a
    bounded fix."""
    rate = 2_046_000
    out = str(tmp_path / "commensurate.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=20.0,
        sample_rate=rate,
        almanac_enable=False,
        ionosphere_enable=False,
        backend=strict_gen_backend(),
        sink="iqfile",
        out_file=out,
        location=LocationConfig(35.681298, 139.766247, 10.0),
    )
    from gpssim_tpu.ops.synth_jax import needs_wide_window

    assert needs_wide_window(1.0 / rate)
    sim = Simulation(cfg)
    truth = np.array(sim.xyz0)
    week = sim.g0.week
    run_simulation(cfg, sim=sim)

    x = load_iq(out, 8)
    fix, channels, _, _ = receiver_fix(x, rate, week_hint=week)
    assert len(channels) >= 4  # full LNAV decode despite the sampling
    err = np.linalg.norm(fix.xyz - truth)
    assert err < 300.0, f"commensurate-rate fix off by {err:.2f} m"
    assert fix.nsats >= 4, fix.prns


@pytest.mark.slow
def test_cold_start_fix_decodes_iono_page18_over_the_air(
    fixtures_dir, tmp_path
):
    """Cold TTFF with NO warm-start data: subframe 4 page 18 is only
    transmitted in frame 18 of the 25-frame page cycle (~9 min into the
    stream, gps.c:805-817 / 2136-2139), so the capture is taken
    mid-stream where that frame airs. The receiver must decode
    ephemeris AND the Klobuchar parameters over the air and solve an
    iono-ON scenario to meter level — the full cold-start path.

    Synthesis cost stays bounded by planning past the first 508 s
    (plans are cheap) and synthesizing only the 38 s window that
    carries frame 18."""
    import itertools

    from gpssim_tpu.ops.synth_numpy import quantize_iq
    from gpssim_tpu.runner import make_synth_fn

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=546.0,
        sample_rate=RATE,
        almanac_enable=False,
        ionosphere_enable=True,
        backend=strict_gen_backend(),
        location=LocationConfig(35.681298, 139.766247, 10.0),
    )
    sim = Simulation(cfg)
    truth = np.array(sim.xyz0)
    week = sim.g0.week
    synth = make_synth_fn(cfg)
    it = sim.iter_plans()
    # Skip to 508 s: frame 18 (ipage 17) airs over [510, 540).
    skipped = sum(1 for _ in itertools.islice(it, 5080))
    assert skipped == 5080
    chunks = [
        quantize_iq(np.asarray(synth(p)), 8)
        for p in itertools.islice(it, 380)
    ]
    raw = np.concatenate(chunks)
    x = (raw[0::2].astype(np.float32)
         + 1j * raw[1::2].astype(np.float32)).astype(np.complex64)

    fix, channels, rx_eph, iono_ota = receiver_fix(x, RATE, week_hint=week)
    assert iono_ota.vflg, "page-18 iono/UTC must decode over the air"
    assert iono_ota.enable
    nav = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n")
    # Decoded alpha/beta match the RINEX originals to page-18 broadcast
    # quantization (IS-GPS-200 Table 20-X scale factors, 8-bit fields;
    # gps.c:805-817).
    alpha_lsb = (2.0**-30, 2.0**-27, 2.0**-24, 2.0**-24)
    beta_lsb = (2.0**11, 2.0**14, 2.0**16, 2.0**16)
    for i in range(4):
        a, b = f"alpha{i}", f"beta{i}"
        assert abs(
            getattr(iono_ota, a) - getattr(nav.ionoutc, a)
        ) <= alpha_lsb[i], a
        assert abs(
            getattr(iono_ota, b) - getattr(nav.ionoutc, b)
        ) <= beta_lsb[i], b
    err = np.linalg.norm(fix.xyz - truth)
    assert err < 3.0, f"cold-start iono-corrected fix off by {err:.2f} m"
    assert fix.nsats >= 4, fix.prns


# ---------------------------------------------------------------------------
# Default-suite smoke variants of the slow matrix (VERDICT r4 item 6):
# every @slow case above has a seconds-scale counterpart here driving the
# SAME code path (motion/interactive planning, oracle bytes, wire
# transport, iono correction, wide/commensurate rates, mid-stream page-18
# decode) at acquisition/track/solver level, so a regression in any of
# those paths fails the default run instead of hiding behind --runslow.
# ---------------------------------------------------------------------------


def _gen(fixtures_dir, out, **kw):
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        almanac_enable=False,
        ionosphere_enable=False,
        backend=strict_gen_backend(),
        sink="iqfile",
        out_file=out,
        **kw,
    )
    sim = Simulation(cfg)
    plans_probe = Simulation(cfg)
    plans = [plans_probe.step() for _ in range(plans_probe.num_blocks)]
    run_simulation(cfg, sim=sim)
    return cfg, sim, plans


def _acq_doppler(dets):
    return {d.prn: d.doppler_hz for d in dets}


def test_smoke_moving_scenario_acquires_at_motion_doppler(
    fixtures_dir, tmp_path
):
    """Moving-platform path (slow: test_moving_receiver_pvt): a 2 s
    circle-motion capture must acquire the planned PRN set at the
    motion-Doppler the planner produced."""
    from gpssim_tpu.acquire import acquire

    out = str(tmp_path / "mv.bin")
    _, _, plans = _gen(
        fixtures_dir, out, duration_sec=2.0, sample_rate=RATE,
        motion_file=f"{fixtures_dir}/circle_motion.csv",
    )
    x = load_iq(out, 8)
    dets = acquire(x, RATE)
    plan = plans[0]
    active = {int(p) for p in plan.prn[plan.active]}
    assert {d.prn for d in dets} == active
    slots = {int(p): i for i, p in enumerate(plan.prn) if plan.active[i]}
    for d in dets:
        assert abs(d.doppler_hz - plan.f_carr[slots[d.prn]]) <= 300.0, d.prn


def test_smoke_interactive_command_shifts_doppler(fixtures_dir, tmp_path):
    """Interactive-control path (slow:
    test_interactive_command_moves_receiver_fix): a commanded velocity
    ramp mid-capture must shift the acquired Doppler by the amount the
    planner integrated."""
    from gpssim_tpu.acquire import acquire

    out = str(tmp_path / "ia.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=4.0,
        sample_rate=RATE, almanac_enable=False, ionosphere_enable=False,
        backend=strict_gen_backend(), sink="iqfile", out_file=out,
        interactive=True,
    )
    sim = Simulation(cfg)

    def on_block(stats, s, plan):
        if stats.blocks >= 10:
            v = min(15.0 * (stats.blocks - 9), 150.0)
            s.set_motion(bearing_deg=60.0, velocity=v, vertical_speed=0.0)

    # Truth replay: identical command schedule on a probe planner.
    probe = Simulation(cfg)
    plans = []
    st = type("S", (), {"blocks": 0})()
    while (p := probe.step()) is not None:
        plans.append(p)
        st.blocks = len(plans)
        on_block(st, probe, p)

    run_simulation(cfg, sim=sim, on_block=on_block)
    x = load_iq(out, 8)
    n1 = RATE  # 1 s windows
    d_a = _acq_doppler(acquire(x[:n1], RATE))
    d_b = _acq_doppler(acquire(x[-n1:], RATE))

    first, last = plans[0], plans[-5]
    slots = {int(p): i for i, p in enumerate(first.prn) if first.active[i]}
    shifts = {
        prn: float(last.f_carr[i] - first.f_carr[i])
        for prn, i in slots.items()
        if prn in d_a and prn in d_b
    }
    prn = max(shifts, key=lambda k: abs(shifts[k]))
    assert abs(shifts[prn]) > 350.0, shifts  # the command really moved us
    measured = d_b[prn] - d_a[prn]
    assert abs(measured - shifts[prn]) <= 300.0, (prn, measured, shifts[prn])


def test_smoke_oracle_output_acquires_like_framework_plan(
    oracle_bin, fixtures_dir, tmp_path
):
    """Reference-bytes path (slow: test_fix_on_reference_oracle_output):
    the receiver front end must find the framework-planned PRN set at
    the planned Doppler/code phase in the REFERENCE C simulator's own
    2 s output (the streams are bit-exact, so the plan IS the truth)."""
    from tests.test_golden import TOKYO, run_oracle

    from gpssim_tpu.acquire import acquire
    from gpssim_tpu.config import LocationConfig

    nav = f"{fixtures_dir}/brdc_test.22n"
    ref = run_oracle(
        oracle_bin, nav, "ref2s.bin", str(tmp_path), fixtures_dir,
        duration=2, bits=8, iono=0, almanac=0, **TOKYO,
    )
    cfg = SimConfig(
        nav_file=nav, duration_sec=2.0, almanac_enable=False,
        ionosphere_enable=False,
        location=LocationConfig(35.681298, 139.766247, 10.0),
    )
    plan = Simulation(cfg).step()
    x = load_iq(ref, 8)
    dets = acquire(x, 3_000_000.0)
    active = {int(p) for p in plan.prn[plan.active]}
    assert {d.prn for d in dets} == active
    slots = {int(p): i for i, p in enumerate(plan.prn) if plan.active[i]}
    for d in dets:
        i = slots[d.prn]
        assert abs(d.doppler_hz - plan.f_carr[i]) <= 300.0, d.prn
        err = (d.code_phase_chips - plan.code_phase[i]) % 1023.0
        assert min(err, 1023.0 - err) <= 2.0, d.prn


def test_smoke_tcp_stream_bytes_acquirable(fixtures_dir, tmp_path):
    """Wire-transport path (slow: test_fix_from_live_tcp_stream): a 2 s
    scenario streamed through the tcp radio arrives byte-complete and
    the arrived bytes acquire the planned PRN set."""
    import socket
    import threading

    from gpssim_tpu.acquire import acquire

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    received = bytearray()

    def collector():
        conn, _ = srv.accept()
        with conn:
            while True:
                data = conn.recv(1 << 16)
                if not data:
                    return
                received.extend(data)

    t = threading.Thread(target=collector, daemon=True)
    t.start()
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=2.0,
        sample_rate=RATE, almanac_enable=False, ionosphere_enable=False,
        backend=strict_gen_backend(), sink="tcp",
        tcp_addr=f"127.0.0.1:{srv.getsockname()[1]}",
        location=LocationConfig(35.681298, 139.766247, 10.0),
    )
    sim = Simulation(cfg)
    plan_probe = Simulation(cfg).step()
    stats = run_simulation(cfg, sim=sim)
    t.join(timeout=30)
    assert not t.is_alive()
    srv.close()
    assert len(received) == stats.blocks * 2 * cfg.samples_per_epoch

    x = (np.frombuffer(bytes(received), dtype=np.int8)[0::2]
         .astype(np.float32)
         + 1j * np.frombuffer(bytes(received), dtype=np.int8)[1::2]
         .astype(np.float32)).astype(np.complex64)
    dets = acquire(x, RATE)
    active = {int(p) for p in plan_probe.prn[plan_probe.active]}
    assert {d.prn for d in dets} == active


def test_smoke_pvt_klobuchar_correction(fixtures_dir):
    """Receiver-side iono path (slow:
    test_iono_on_fix_with_provided_klobuchar): synthetic observations
    carrying the forward-model Klobuchar delay must solve to sub-meter
    WITH the parameters and measurably biased without — pure solver
    math, milliseconds."""
    from gpssim_tpu.core.atmosphere import ionospheric_delay
    from gpssim_tpu.core.frames import ecef2neu, ltcmat, neu2azel, xyz2llh

    nav = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n")
    assert nav.ionoutc.vflg
    eph = nav.sets[0]
    truth = np.array([-3959617.482, 3350136.615, 3699531.459])
    llh = xyz2llh(truth)
    tmat = ltcmat(llh)
    t_rx = float(eph.toc_sec[np.nonzero(eph.vflg)[0][0]]) + 1800.0

    obs = []
    for sv in np.nonzero(eph.vflg)[0]:
        pos, _, _ = satpos(eph, t_rx, np.array([sv]))
        if np.dot(pos[0] - truth, truth) < 0:
            continue
        tau = t_rx - 0.07
        for _ in range(8):
            pos, _, clk = satpos(eph, tau, np.array([sv]))
            tof = t_rx - tau
            sat = np.array([
                pos[0, 0] + pos[0, 1] * OMEGA_EARTH * tof,
                pos[0, 1] - pos[0, 0] * OMEGA_EARTH * tof,
                pos[0, 2],
            ])
            rho = np.linalg.norm(sat - truth)
            tau = t_rx - rho / SPEED_OF_LIGHT + clk[0, 0]
        azel = neu2azel(ecef2neu(sat - truth, tmat))
        delay_m = float(
            ionospheric_delay(nav.ionoutc, t_rx, llh, np.asarray(azel))
        )
        assert delay_m > 1.0  # the scenario really carries iono delay
        obs.append(Observation(int(sv) + 1, float(tau - delay_m /
                                                  SPEED_OF_LIGHT), 0.0))
        if len(obs) == 7:
            break
    assert len(obs) >= 6

    t_nom = max(o.tau_sv for o in obs) + 0.076
    for o in obs:
        o.pr_rel = SPEED_OF_LIGHT * (t_nom - o.tau_sv)

    fix_cor = pvt_solve(obs, eph, nav.ionoutc, t_nom)
    err_cor = np.linalg.norm(fix_cor.xyz - truth)
    assert err_cor < 1.0, err_cor

    off = IonoUtc()
    off.enable = False
    fix_raw = pvt_solve(obs, eph, off, t_nom)
    err_raw = np.linalg.norm(fix_raw.xyz - truth)
    assert err_raw > err_cor + 2.0, (err_raw, err_cor)


@pytest.mark.parametrize("rate", [2_000_000, 1_200_000])
def test_smoke_wide_window_rates_acquirable(fixtures_dir, tmp_path, rate):
    """Wide-window kernel path (slow: test_position_fix_wide_window_rates):
    2 s captures at sub-2.06 Msps rates must acquire the planned PRNs at
    the planned Doppler."""
    from gpssim_tpu.acquire import acquire
    from gpssim_tpu.ops.synth_jax import needs_wide_window

    assert needs_wide_window(1.0 / rate)
    out = str(tmp_path / f"w{rate}.bin")
    _, _, plans = _gen(
        fixtures_dir, out, duration_sec=2.0, sample_rate=rate,
        location=LocationConfig(35.681298, 139.766247, 10.0),
    )
    x = load_iq(out, 8)
    dets = acquire(x, float(rate))
    plan = plans[0]
    active = {int(p) for p in plan.prn[plan.active]}
    assert {d.prn for d in dets} >= active - {0}
    slots = {int(p): i for i, p in enumerate(plan.prn) if plan.active[i]}
    for d in dets:
        assert abs(d.doppler_hz - plan.f_carr[slots[d.prn]]) <= 300.0


def test_smoke_commensurate_rate_bits_decode(fixtures_dir, tmp_path):
    """Commensurate-sampling path (slow:
    test_commensurate_rate_2sps_still_receivable): at exactly
    2 samples/chip the DIGITAL chain must still work — acquire, track,
    and demodulate bits matching the transmitted dwrd stream."""
    from gpssim_tpu.acquire import acquire
    from gpssim_tpu.core.navmsg import data_bit
    from gpssim_tpu.receiver import track

    rate = 2_046_000
    out = str(tmp_path / "comm.bin")
    _, _, plans = _gen(
        fixtures_dir, out, duration_sec=2.0, sample_rate=rate,
        location=LocationConfig(35.681298, 139.766247, 10.0),
    )
    x = load_iq(out, 8)
    dets = acquire(x, float(rate))
    assert len(dets) >= 4
    ch = track(x, dets[0], float(rate))
    assert len(ch.bits) >= 60
    plan = plans[0]
    slot = int(np.nonzero(plan.prn == ch.prn)[0][0])
    dwrd = plan.dwrd[slot]
    # ch.bits start at the first tracked bit boundary; align by scanning
    # the transmitted stream (from the block-start word/bit cursor, which
    # is rarely zero) for the demodulated prefix (20 ms/bit).
    sb = int(plan.iword[slot] * 30 + plan.ibit[slot])
    tx = np.array([
        (data_bit(dwrd, k // 30, k % 30) + 1) // 2
        for k in range(sb, sb + 130)
    ])
    got = np.asarray(ch.bits[:40]) & 1
    hits = [
        s for s in range(len(tx) - len(got))
        if np.array_equal(tx[s:s + len(got)], got)
        or np.array_equal(tx[s:s + len(got)], 1 - got)
    ]
    assert hits, "demodulated bits not found in the transmitted stream"


def test_smoke_page18_iono_decodes_midstream(fixtures_dir, tmp_path):
    """Cold-start page-18 path (slow:
    test_cold_start_fix_decodes_iono_page18_over_the_air): synthesize
    only the 8 s window where frame 18 airs (~510 s in), track one
    channel, and decode the Klobuchar parameters over the air."""
    import itertools

    from gpssim_tpu.acquire import acquire
    from gpssim_tpu.ops.synth_numpy import quantize_iq
    from gpssim_tpu.receiver import decode_iono_utc
    from gpssim_tpu.runner import make_synth_fn

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=537.0,
        sample_rate=RATE, almanac_enable=False, ionosphere_enable=True,
        backend=strict_gen_backend(),
        location=LocationConfig(35.681298, 139.766247, 10.0),
    )
    sim = Simulation(cfg)
    synth = make_synth_fn(cfg)
    it = sim.iter_plans()
    # Plans are cheap; subframe 4 of frame 18 (the page-18 carrier) airs
    # over [528, 534) — capture [525, 536) for bit-sync lead-in.
    skipped = sum(1 for _ in itertools.islice(it, 5250))
    assert skipped == 5250
    raw = np.concatenate([
        quantize_iq(np.asarray(synth(p)), 8)
        for p in itertools.islice(it, 110)
    ])
    x = (raw[0::2].astype(np.float32)
         + 1j * raw[1::2].astype(np.float32)).astype(np.complex64)

    dets = acquire(x, RATE)
    assert dets
    iono = None
    for det in dets[:3]:
        from gpssim_tpu.receiver import track

        ch = track(x, det, RATE)
        got = decode_iono_utc(decode_frames(ch.bits))
        if got.vflg:
            iono = got
            break
    assert iono is not None, "page 18 did not decode in the capture"
    nav = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n")
    alpha_lsb = (2.0**-30, 2.0**-27, 2.0**-24, 2.0**-24)
    for i in range(4):
        assert abs(
            getattr(iono, f"alpha{i}") - getattr(nav.ionoutc, f"alpha{i}")
        ) <= alpha_lsb[i], i
