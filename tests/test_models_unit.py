"""Independent unit vectors for satpos / Klobuchar / compute_range.

The golden suite proves these bit-exact end-to-end against the compiled
reference; these tests check each model against INDEPENDENT formulations
(textbook Kepler propagation, an IS-GPS-200 Klobuchar rewrite, an
iterative light-time solution) so a regression localizes here instead of
surfacing as "some sample differs somewhere" (SURVEY §4, VERDICT r1 #8).
"""

import numpy as np
import pytest

from gpssim_tpu.core.atmosphere import IonoUtc, ionospheric_delay
from gpssim_tpu.core.constants import (
    GM_EARTH,
    OMEGA_EARTH,
    PI,
    SPEED_OF_LIGHT,
)
from gpssim_tpu.core.ephemeris import nav_time_span, read_rinex_nav
from gpssim_tpu.core.frames import llh2xyz
from gpssim_tpu.core.orbits import satpos
from gpssim_tpu.core.ranging import compute_code_phase, compute_range


@pytest.fixture(scope="module")
def nav(fixtures_dir):
    return read_rinex_nav(f"{fixtures_dir}/brdc_test.22n", version=2)


@pytest.fixture(scope="module")
def eph_t(nav):
    gmin, _ = nav_time_span(nav)
    return nav.sets[0], gmin.sec + 1800.0


# ---------------------------------------------------------------------------
# satpos vs textbook Kepler propagation
# ---------------------------------------------------------------------------


def kepler_ecef(eph, sv, gsec):
    """IS-GPS-200 20.3.3.4.3 table, written independently: converged
    fixed-point eccentric anomaly, explicit rotation matrices."""
    import math

    A = eph.sqrta[sv] ** 2
    n = math.sqrt(GM_EARTH / A**3) + eph.deltan[sv]
    tk = gsec - eph.toe_sec[sv]
    if tk > 302400.0:
        tk -= 604800.0
    if tk < -302400.0:
        tk += 604800.0
    M = eph.m0[sv] + n * tk
    e = eph.ecc[sv]
    E = M
    for _ in range(40):
        E = M + e * math.sin(E)
    nu = math.atan2(
        math.sqrt(1.0 - e * e) * math.sin(E), math.cos(E) - e
    )
    phi = nu + eph.aop[sv]
    du = eph.cus[sv] * math.sin(2 * phi) + eph.cuc[sv] * math.cos(2 * phi)
    dr = eph.crs[sv] * math.sin(2 * phi) + eph.crc[sv] * math.cos(2 * phi)
    di = eph.cis[sv] * math.sin(2 * phi) + eph.cic[sv] * math.cos(2 * phi)
    u = phi + du
    r = A * (1.0 - e * math.cos(E)) + dr
    i = eph.inc0[sv] + di + eph.idot[sv] * tk
    x_orb = np.array([r * math.cos(u), r * math.sin(u), 0.0])
    Omega = (
        eph.omg0[sv]
        + (eph.omgdot[sv] - OMEGA_EARTH) * tk
        - OMEGA_EARTH * eph.toe_sec[sv]
    )
    Rx = np.array([
        [1, 0, 0],
        [0, math.cos(-i), math.sin(-i)],
        [0, -math.sin(-i), math.cos(-i)],
    ])
    Rz = np.array([
        [math.cos(-Omega), math.sin(-Omega), 0],
        [-math.sin(-Omega), math.cos(-Omega), 0],
        [0, 0, 1],
    ])
    return Rz @ Rx @ x_orb, E


def test_satpos_vs_textbook_kepler(eph_t):
    eph, gsec = eph_t
    svs = np.flatnonzero(eph.vflg)
    pos, vel, clk = satpos(eph, gsec, svs)
    for k, sv in enumerate(svs):
        want, E = kepler_ecef(eph, int(sv), gsec)
        # Same exact math, different op order/formulation: differences are
        # float-rounding only (~1e-9 relative of 2.6e7 m).
        assert np.allclose(pos[k], want, atol=1e-3), int(sv)
        # Orbit radius sanity: GPS semi-major axis regime.
        r = np.linalg.norm(pos[k])
        assert 2.55e7 < r < 2.75e7
        # Clock: closed form re-derived in place, incl. the relativistic
        # term -2 sqrt(GM A) e sinE / c^2 (the -4.442807633e-10 constant).
        tk2 = gsec - eph.toc_sec[sv]
        rel = -4.442807633e-10 * eph.ecc[sv] * eph.sqrta[sv] * np.sin(E)
        want_clk = (
            eph.af0[sv]
            + tk2 * (eph.af1[sv] + tk2 * eph.af2[sv])
            + rel
            - eph.tgd[sv]
        )
        assert abs(clk[k, 0] - want_clk) < 1e-15, int(sv)


def test_satpos_velocity_is_position_derivative(eph_t):
    """vel must equal d(pos)/dt (central difference, ECEF incl. the
    rotating-frame omgkdot term)."""
    eph, gsec = eph_t
    svs = np.flatnonzero(eph.vflg)
    dt = 1.0e-3
    p0, vel, _ = satpos(eph, gsec, svs)
    pm, _, _ = satpos(eph, gsec - dt, svs)
    pp, _, _ = satpos(eph, gsec + dt, svs)
    num = (pp - pm) / (2.0 * dt)
    assert np.allclose(vel, num, atol=1e-4), np.abs(vel - num).max()


def test_satpos_half_week_wrap(eph_t):
    """Times more than half a week from toe must wrap (gps.c:515-519) —
    the continuity guarantee for scenarios crossing week boundaries."""
    eph, gsec = eph_t
    svs = np.flatnonzero(eph.vflg)[:1]
    a, _, _ = satpos(eph, gsec, svs)
    b, _, _ = satpos(eph, gsec + 604800.0, svs)
    assert np.allclose(a, b, atol=1e-6)


# ---------------------------------------------------------------------------
# Klobuchar vs an independent IS-GPS-200 rewrite + the classic worked example
# ---------------------------------------------------------------------------


def klobuchar_independent(io, gsec, lat_sc, lon_sc, az_rad, el_sc):
    """IS-GPS-200 20.3.3.5.2.5, written from the spec: semicircle units
    throughout, explicit steps."""
    import math

    psi = 0.0137 / (el_sc + 0.11) - 0.022
    phi_i = lat_sc + psi * math.cos(az_rad)
    phi_i = min(max(phi_i, -0.416), 0.416)
    lam_i = lon_sc + psi * math.sin(az_rad) / math.cos(phi_i * PI)
    phi_m = phi_i + 0.064 * math.cos((lam_i - 1.617) * PI)
    t = 43200.0 * lam_i + gsec
    t -= math.floor(t / 86400.0) * 86400.0
    F = 1.0 + 16.0 * (0.53 - el_sc) ** 3
    amp = sum(
        a * phi_m**k
        for k, a in enumerate([io.alpha0, io.alpha1, io.alpha2, io.alpha3])
    )
    amp = max(amp, 0.0)
    per = sum(
        b * phi_m**k
        for k, b in enumerate([io.beta0, io.beta1, io.beta2, io.beta3])
    )
    per = max(per, 72000.0)
    x = 2.0 * PI * (t - 50400.0) / per
    if abs(x) < 1.57:
        return F * (5.0e-9 + amp * (1.0 - x * x / 2.0 + x**4 / 24.0))
    return F * 5.0e-9


# Typical broadcast Klobuchar coefficients (mid-solar-cycle day).
IO_CLASSIC = IonoUtc(
    enable=True, vflg=True,
    alpha0=1.118e-8, alpha1=7.45e-9, alpha2=-5.96e-8, alpha3=-5.96e-8,
    beta0=9.0112e4, beta1=3.2768e4, beta2=-1.96608e5, beta3=-1.96608e5,
)


def test_klobuchar_sweep_vs_independent():
    rng = np.random.default_rng(11)
    for _ in range(200):
        lat = rng.uniform(-80.0, 80.0)
        lon = rng.uniform(-180.0, 180.0)
        el = rng.uniform(2.0, 90.0)
        az = rng.uniform(0.0, 360.0)
        gsec = rng.uniform(0.0, 604800.0)
        llh = np.array([np.radians(lat), np.radians(lon), 100.0])
        azel = np.array([np.radians(az), np.radians(el)])
        got = float(ionospheric_delay(IO_CLASSIC, gsec, llh, azel))
        want = SPEED_OF_LIGHT * klobuchar_independent(
            IO_CLASSIC, gsec,
            np.radians(lat) / PI, np.radians(lon) / PI,
            np.radians(az), np.radians(el) / PI,
        )
        assert got == pytest.approx(want, rel=1e-9), (lat, lon, el, az, gsec)


def test_klobuchar_physical_properties():
    """Model physics (IS-GPS-200 20.3.3.5.2.5): the delay peaks at 14:00
    local time of the pierce point, sits on the F*5 ns floor at night,
    and the obliquity factor F amplifies low elevations."""
    llh = np.array([np.radians(40.0), np.radians(-100.0), 0.0])
    azel = np.array([np.radians(210.0), np.radians(20.0)])

    def at_local(h):
        # t = 43200*lam_i + gsec is the pierce-point local time; invert
        # approximately via the user longitude (pierce point is close).
        gsec = (h * 3600.0 - 43200.0 * (-100.0 / 180.0)) % 86400.0
        return float(ionospheric_delay(IO_CLASSIC, gsec, llh, azel))

    d_day = at_local(14.0)
    d_night = at_local(3.0)
    F = 1.0 + 16.0 * (0.53 - (20.0 / 180.0)) ** 3
    floor = F * 5.0e-9 * SPEED_OF_LIGHT
    assert d_night == pytest.approx(floor, rel=0.05)
    # Daytime peak: well above the floor.
    assert d_day > 2.0 * floor
    # 14:00 local is the cosine peak (t=50400); the coarse grid may land
    # marginally higher because at_local inverts via the user longitude,
    # not the exact pierce point.
    assert d_day >= 0.999 * max(
        at_local(h) for h in np.arange(0.0, 24.0, 0.5)
    )
    # Obliquity: lower elevation -> larger delay at the same time.
    azel_hi = np.array([np.radians(210.0), np.radians(75.0)])
    gsec = (14.0 * 3600.0 - 43200.0 * (-100.0 / 180.0)) % 86400.0
    assert float(ionospheric_delay(IO_CLASSIC, gsec, llh, azel)) > float(
        ionospheric_delay(IO_CLASSIC, gsec, llh, azel_hi)
    )


def test_klobuchar_disabled_and_novflg():
    llh = np.array([0.5, 0.5, 0.0])
    azel = np.array([1.0, 0.7])
    io_off = IonoUtc(enable=False, vflg=True)
    assert float(ionospheric_delay(io_off, 0.0, llh, azel)) == 0.0
    io_novflg = IonoUtc(enable=True, vflg=False)
    F = 1.0 + 16.0 * (0.53 - 0.7 / PI) ** 3
    assert float(ionospheric_delay(io_novflg, 0.0, llh, azel)) == (
        pytest.approx(F * 5.0e-9 * SPEED_OF_LIGHT, rel=1e-9)
    )


# ---------------------------------------------------------------------------
# compute_range vs a rigorous iterative light-time solution
# ---------------------------------------------------------------------------


def test_compute_range_vs_iterative_light_time(eph_t):
    """The reference's one-step velocity extrapolation + linearized Sagnac
    (gps.c:1986-1996) must agree with a CONVERGED light-time solution
    (re-evaluated Kepler position at t-tau, exact earth-rotation matrix)
    to the size of the neglected second-order terms (~mm)."""
    eph, gsec = eph_t
    xyz = llh2xyz(np.array([np.radians(35.0), np.radians(139.0), 100.0]))
    io = IonoUtc(enable=False)
    svs = np.flatnonzero(eph.vflg)
    obs = compute_range(eph, io, 2000, gsec, xyz, svs)

    for k, sv in enumerate(svs):
        if obs.azel[k, 1] <= np.radians(5.0):
            continue  # below-horizon rows aren't physical observations
        tau = 0.075
        for _ in range(6):
            pos_t, _, _ = satpos(eph, gsec - tau, np.array([sv]))
            th = OMEGA_EARTH * tau
            rot = np.array([
                [np.cos(th), np.sin(th), 0.0],
                [-np.sin(th), np.cos(th), 0.0],
                [0.0, 0.0, 1.0],
            ])
            p = rot @ pos_t[0]
            rho = np.linalg.norm(p - xyz)
            tau = rho / SPEED_OF_LIGHT
        _, _, clk = satpos(eph, gsec, np.array([sv]))
        want = rho - SPEED_OF_LIGHT * clk[0, 0]
        assert abs(obs.range[k] - want) < 5e-3, (
            int(sv), obs.range[k] - want
        )


def test_compute_range_rate_is_range_derivative(eph_t):
    """rate must equal d(geometric distance)/dt to first order.

    The reference's rate is the instantaneous radial velocity vel.los/|los|
    (gps.c:2003, SV clock drift and light-time derivative omitted); the
    numerical derivative of the emitted-position distance differs by those
    neglected ~0.05 m/s terms."""
    eph, gsec = eph_t
    xyz = llh2xyz(np.array([np.radians(35.0), np.radians(139.0), 100.0]))
    io = IonoUtc(enable=False)
    svs = np.flatnonzero(eph.vflg)
    dt = 1.0e-2
    a = compute_range(eph, io, 2000, gsec, xyz, svs)
    b = compute_range(eph, io, 2000, gsec + dt, xyz, svs)
    num = (b.d - a.d) / dt
    assert np.allclose(a.rate, num, atol=0.1), np.abs(a.rate - num).max()


def test_compute_code_phase_decomposition():
    """Worked example: the ms-of-30s decomposition into word/bit/code
    counters + fractional chips must reconstruct the transmit time
    (gps.c:2050-2061)."""
    rho_range = 2.2e7
    rho_g_sec, g0_sec = 345618.4, 345600.0
    st = compute_code_phase(
        np.array([2000]), np.array([rho_g_sec]), np.array([rho_range]),
        np.array([rho_range - 60.0]), np.array([2000]),
        np.array([g0_sec]), 0.1,
    )
    ms = ((rho_g_sec - g0_sec) + 6.0 - rho_range / SPEED_OF_LIGHT) * 1000.0
    rebuilt = (
        st.iword[0] * 600 + st.ibit[0] * 20 + st.icode[0]
        + st.code_phase[0] / 1023.0
    )
    assert rebuilt == pytest.approx(ms, abs=1e-9)
    assert 0 <= st.icode[0] < 20 and 0 <= st.ibit[0] < 30
    # Doppler sign: closing range (rho decreasing) -> positive f_carr.
    assert st.f_carr[0] > 0
    # f_code tracks f_carr through the code/carrier ratio (1.023/1575.42).
    assert st.f_code[0] == pytest.approx(
        1.023e6 + st.f_carr[0] * (1.023 / 1575.42), rel=1e-12
    )
