#!/usr/bin/env python3
"""Generate deterministic test fixtures: RINEX v2/v3 nav files for a
synthetic-but-realistic GPS constellation, a matching SEM almanac, and a
circular user-motion CSV. The same files drive our parser tests and the
compiled reference oracle for golden IQ comparisons.
"""

from __future__ import annotations

import math
import os

BASE = os.path.join(os.path.dirname(__file__), "..", "fixtures")

# Scenario epoch: 2022/01/01 00:00:00 GPS (week 2190, tow 518400).
YEAR2, YEAR4 = 22, 2022
WEEK = 2190
TOW0 = 518400.0

NSAT = 31  # PRN 32 left without ephemeris on purpose


def sv_elements(prn: int) -> dict:
    """Nominal GPS constellation elements, deterministically varied by PRN."""
    plane = (prn - 1) % 6
    slot = (prn - 1) // 6
    rng = (prn * 2654435761) % 1000 / 1000.0  # deterministic pseudo-random
    return dict(
        ecc=0.004 + 0.01 * rng,
        sqrta=5153.6 + 0.5 * (rng - 0.5),
        inc0=0.958 + 0.02 * (rng - 0.5),
        omg0=-math.pi + plane * (math.pi / 3.0) + 0.05 * (rng - 0.5),
        m0=-math.pi + slot * (2.0 * math.pi / 6.0) + 1.1 * plane + 0.2 * rng,
        aop=0.5 + 2.0 * rng,
        omgdot=-8.0e-9 - 1.0e-10 * rng,
        idot=(rng - 0.5) * 8.0e-10,
        deltan=4.0e-9 + 1.0e-9 * rng,
        cuc=(rng - 0.5) * 6.0e-6,
        cus=(rng - 0.3) * 8.0e-6,
        crc=150.0 + 100.0 * rng,
        crs=(rng - 0.5) * 60.0,
        cic=(rng - 0.5) * 3.0e-7,
        cis=(rng - 0.4) * 3.0e-7,
        af0=(rng - 0.5) * 4.0e-4,
        af1=(rng - 0.5) * 2.0e-11,
        af2=0.0,
        tgd=(rng - 0.5) * 1.0e-8,
        iodc=40 + prn,
        iode=40 + prn,
        svh=0,
        sva=0.0,
        code=1.0,
        fit=4.0,
    )


def d19(x: float) -> str:
    """19-char Fortran D-exponent field (e.g. ' 1.234567890123D+04')."""
    s = f"{x: .12E}"
    m, e = s.split("E")
    return f"{m}D{int(e):+03d}"


def d12(x: float) -> str:
    """12-char field used in ION ALPHA/BETA header lines."""
    s = f"{x: .4E}"
    m, e = s.split("E")
    return f"{m}D{int(e):+03d}".rjust(12)


IONO = dict(
    alpha=(1.1176e-08, 2.2352e-08, -5.9605e-08, -1.1921e-07),
    beta=(90112.0, 16384.0, -196608.0, -65536.0),
    a0=1.3969838619232e-09, a1=8.8817841970013e-16,
    tot=503808, wnt=WEEK, leap=18,
)


def write_rinex2(
    path: str, nsets: int = 2, spacing_s: float = 7200.0,
    propagate: bool = False,
) -> None:
    """RINEX v2 nav fixture with ``nsets`` ephemeris sets ``spacing_s``
    apart (must exceed 3600 s — the reference groups records within 1 h
    into one set, gps.c:1557-1585).

    With ``propagate`` the anomaly/inclination are advanced to each set's
    toe (m0 + n*dt, inc0 + idot*dt) the way real uploads keep the orbit
    continuous — REQUIRED for scenarios that synthesize across a set
    advance, else the position step makes f_carr unphysical."""
    lines = []
    lines.append(f"{'2.10':>9}{'':11}{'N: GPS NAV DATA':<40}RINEX VERSION / TYPE")
    lines.append(f"{'gpssim-fx':<20}{'gpssim':<20}{'01-JAN-22 00:00':<20}PGM / RUN BY / DATE")
    a = IONO["alpha"]
    lines.append(f"  {d12(a[0])}{d12(a[1])}{d12(a[2])}{d12(a[3])}{'':10}ION ALPHA")
    b = IONO["beta"]
    lines.append(f"  {d12(b[0])}{d12(b[1])}{d12(b[2])}{d12(b[3])}{'':10}ION BETA")
    lines.append(
        f"   {d19(IONO['a0'])}{d19(IONO['a1'])}{IONO['tot']:>9}{IONO['wnt']:>9} DELTA-UTC: A0,A1,T,W"
    )
    lines.append(f"{IONO['leap']:>6}{'':54}LEAP SECONDS")
    lines.append(f"{'':60}END OF HEADER")

    for iset in range(nsets):
        off = spacing_s * iset  # > 1 h gap starts a new set
        toc_sec = TOW0 + off
        hh = int(off) // 3600
        mm = (int(off) % 3600) // 60
        sec = off % 60.0
        for prn in range(1, NSAT + 1):
            el = dict(sv_elements(prn))
            # drift the clock between sets so sets differ
            af0 = el["af0"] + el["af1"] * off
            if propagate and off:
                n_motion = math.sqrt(3.986005e14 / el["sqrta"] ** 6)
                m0 = el["m0"] + (n_motion + el["deltan"]) * off
                el["m0"] = math.remainder(m0, 2.0 * math.pi)
                el["inc0"] = el["inc0"] + el["idot"] * off
            lines.append(
                f"{prn:>2} {YEAR2:>2} {1:>2} {1:>2} {hh:>2} {mm:>2}{sec:5.1f}"
                f"{d19(af0)}{d19(el['af1'])}{d19(el['af2'])}"
            )
            rows = [
                (el["iode"], el["crs"], el["deltan"], el["m0"]),
                (el["cuc"], el["ecc"], el["cus"], el["sqrta"]),
                (toc_sec, el["cic"], el["omg0"], el["cis"]),
                (el["inc0"], el["crc"], el["aop"], el["omgdot"]),
                (el["idot"], el["code"], float(WEEK), 0.0),
                (el["sva"], float(el["svh"]), el["tgd"], float(el["iodc"])),
                (toc_sec - 6.0, el["fit"], 0.0, 0.0),
            ]
            for r in rows:
                lines.append("   " + "".join(d19(float(v)) for v in r))
    with open(path, "wt") as fp:
        fp.write("\n".join(lines) + "\n")


def write_rinex3(path: str, nsets: int = 2) -> None:
    lines = []
    lines.append(f"{'3.04':>9}{'':11}{'N: GNSS NAV DATA':<20}{'G: GPS':<20}RINEX VERSION / TYPE")
    lines.append(f"{'gpssim-fx':<20}{'gpssim':<20}{'01-JAN-22 00:00':<20}PGM / RUN BY / DATE")
    a = IONO["alpha"]
    lines.append(f"GPSA {d12(a[0])}{d12(a[1])}{d12(a[2])}{d12(a[3])}{'':7}IONOSPHERIC CORR")
    b = IONO["beta"]
    lines.append(f"GPSB {d12(b[0])}{d12(b[1])}{d12(b[2])}{d12(b[3])}{'':7}IONOSPHERIC CORR")
    # GPUT: A0 17-wide at col 5, A1 16-wide at col 22, tot 7-wide, wnt 6-wide
    a0s = f"{IONO['a0']: .10E}"
    m, e = a0s.split("E")
    a0f = f"{m}D{int(e):+03d}"
    a1s = f"{IONO['a1']: .9E}"
    m, e = a1s.split("E")
    a1f = f"{m}D{int(e):+03d}"
    lines.append(f"GPUT {a0f:>17}{a1f:>16}{IONO['tot']:>7}{IONO['wnt']:>6}{'':9}TIME SYSTEM CORR")
    lines.append(f"{IONO['leap']:>6}{'':54}LEAP SECONDS")
    lines.append(f"{'':60}END OF HEADER")

    for iset in range(nsets):
        hh = 2 * iset
        toc_sec = TOW0 + hh * 3600.0
        for prn in range(1, NSAT + 1):
            el = sv_elements(prn)
            af0 = el["af0"] + el["af1"] * hh * 3600.0
            lines.append(
                f"G{prn:02d} {YEAR4:>4} {1:02d} {1:02d} {hh:02d} {0:02d} {0:02d}"
                f"{d19(af0)}{d19(el['af1'])}{d19(el['af2'])}"
            )
            rows = [
                (el["iode"], el["crs"], el["deltan"], el["m0"]),
                (el["cuc"], el["ecc"], el["cus"], el["sqrta"]),
                (toc_sec, el["cic"], el["omg0"], el["cis"]),
                (el["inc0"], el["crc"], el["aop"], el["omgdot"]),
                (el["idot"], el["code"], float(WEEK), 0.0),
                (el["sva"], float(el["svh"]), el["tgd"], float(el["iodc"])),
                (toc_sec - 6.0, el["fit"], 0.0, 0.0),
            ]
            for r in rows:
                lines.append("    " + "".join(d19(float(v)) for v in r))
    with open(path, "wt") as fp:
        fp.write("\n".join(lines) + "\n")


def write_sem_almanac(path: str) -> None:
    """SEM format (reference almanac.c:73-184): mod-1024 week (parser adds
    2048), toa, 8 data lines per SV."""
    lines = [f"{NSAT} CURRENT.ALM", f"{WEEK - 2048} {417792}", ""]
    for prn in range(1, NSAT + 1):
        el = sv_elements(prn)
        lines.append(f"{prn}")
        lines.append(f"{prn + 40}")
        lines.append("0")
        lines.append(f"{el['ecc']:.9E} {el['inc0'] / math.pi - 0.30:.9E} {el['omgdot'] / math.pi:.9E}")
        lines.append(f"{el['sqrta']:.6f} {el['omg0'] / math.pi:.9E} {el['aop'] / math.pi:.9E}")
        lines.append(f"{el['m0'] / math.pi:.9E} {el['af0']:.9E} {el['af1']:.9E}")
        lines.append("0")
        lines.append("0")
        lines.append("")
    with open(path, "wt") as fp:
        fp.write("\n".join(lines) + "\n")


def write_circle_motion(path: str, seconds: float = 300.0) -> None:
    """10 Hz circular track (30 m radius) around the default location,
    analogous in spirit to the reference's circle.csv fixture."""
    import numpy as np

    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from gpssim_tpu.core.frames import ltcmat
    from gpssim_tpu.core.motion import static_xyz

    lat, lon, hgt = 35.681298, 139.766247, 10.0
    xyz0 = static_xyz(lat, lon, hgt)
    t = ltcmat(np.array([math.radians(lat), math.radians(lon), hgt]))
    rows = []
    n = int(seconds * 10)
    for i in range(n):
        ang = 2.0 * math.pi * i / 300.0  # one lap per 30 s
        neu = (30.0 * math.cos(ang), 30.0 * math.sin(ang), 0.0)
        x = xyz0[0] + t[0][0] * neu[0] + t[1][0] * neu[1] + t[2][0] * neu[2]
        y = xyz0[1] + t[0][1] * neu[0] + t[1][1] * neu[1] + t[2][1] * neu[2]
        z = xyz0[2] + t[0][2] * neu[0] + t[1][2] * neu[1] + t[2][2] * neu[2]
        rows.append(f"{i / 10.0:.1f},{x:.3f},{y:.3f},{z:.3f}")
    with open(path, "wt") as fp:
        fp.write("\n".join(rows) + "\n")


def main() -> None:
    os.makedirs(BASE, exist_ok=True)
    write_rinex2(os.path.join(BASE, "brdc_test.22n"))
    write_rinex3(os.path.join(BASE, "brdc_test_v3.22n"))
    write_sem_almanac(os.path.join(BASE, "almanac_test.sem"))
    write_circle_motion(os.path.join(BASE, "circle_motion.csv"))
    # Endurance fixture: 4 sets 3700 s apart -> real ephemeris-set
    # advances land ~100 s and ~3800 s into a scenario starting at toc0
    # (advance fires when the next toc comes within 1 h, gps.c:2878-2906).
    write_rinex2(
        os.path.join(BASE, "brdc_endurance.22n"), nsets=4, spacing_s=3700.0,
        propagate=True,
    )
    # Daily-envelope fixture: 13 ephemeris sets 2 h apart — the layout of
    # a real daily brdc file (EPHEM_ARRAY_SIZE=13, gps.h:108). A 24 h
    # scenario starting at toc0 crosses all 13 sets (advance fires when
    # the next toc comes within 1 h, gps.c:2878-2906).
    write_rinex2(
        os.path.join(BASE, "brdc_daily.22n"), nsets=13, spacing_s=7200.0,
        propagate=True,
    )
    print("fixtures written to", os.path.abspath(BASE))


if __name__ == "__main__":
    main()
