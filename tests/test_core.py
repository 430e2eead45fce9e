"""Unit tests for the host-side GPS core (time, frames, codes, orbits)."""

import math

import numpy as np
import pytest

from gpssim_tpu.core import cacode
from gpssim_tpu.core.constants import (
    COS_TABLE_512,
    SIN_TABLE_512,
    R2D,
)
from gpssim_tpu.core.frames import ecef2neu, llh2xyz, ltcmat, neu2azel, xyz2llh
from gpssim_tpu.core.gpstime import (
    DateTime,
    GpsTime,
    date2gps,
    gps2date,
    inc_gps_time,
    sub_gps_time,
)

# Published IS-GPS-200 Table 3-I first-10-chip octal check values.
PRN_OCTAL = [
    0o1440, 0o1620, 0o1710, 0o1744, 0o1133, 0o1455, 0o1131, 0o1454,
    0o1626, 0o1504, 0o1642, 0o1750, 0o1764, 0o1772, 0o1775, 0o1776,
    0o1156, 0o1467, 0o1633, 0o1715, 0o1746, 0o1763, 0o1063, 0o1706,
    0o1743, 0o1761, 0o1770, 0o1774, 0o1127, 0o1453, 0o1625, 0o1712,
]


class TestCaCode:
    def test_first_chips_octal(self):
        for prn in range(1, 33):
            assert cacode.first_chips_octal(prn) == PRN_OCTAL[prn - 1], prn

    def test_balance(self):
        # Gold codes of length 1023 have 512 ones / 511 zeros.
        ca = cacode.ca_table()
        assert ca.shape == (32, 1023)
        assert set(np.unique(ca)) == {0, 1}
        assert np.all(ca.sum(axis=1) == 512)

    def test_packed_roundtrip(self):
        ca = cacode.ca_table()
        packed = cacode.ca_table_packed()
        for prn in (1, 17, 32):
            bits = np.array(
                [
                    (packed[prn - 1, i >> 5] >> (i & 31)) & 1
                    for i in range(1023 + 90)
                ]
            )
            ext = np.concatenate([ca[prn - 1], ca[prn - 1][:90]])
            assert np.array_equal(bits, ext)


class TestCarrierTables:
    def test_against_reference_source(self):
        """When the reference tree is present, check both LUTs verbatim."""
        import os
        import re

        path = "/root/reference/gps.c"
        if not os.path.exists(path):
            pytest.skip("reference not available")
        src = open(path).read()

        def grab(name):
            m = re.search(rf"const int {name}\[\] = \{{(.*?)\}};", src, re.S)
            return np.array([int(x) for x in m.group(1).replace("\n", " ").split(",")])

        assert np.array_equal(SIN_TABLE_512, grab("sinTable512"))
        assert np.array_equal(COS_TABLE_512, grab("cosTable512"))

    def test_quadrature(self):
        assert np.array_equal(COS_TABLE_512, np.roll(SIN_TABLE_512, -128))
        assert SIN_TABLE_512.max() == 250 and SIN_TABLE_512.min() == -250


class TestGpsTime:
    def test_known_epoch(self):
        # 2022-01-01 00:00:00 → week 2190, tow 518400 (Saturday).
        g = date2gps(DateTime(2022, 1, 1, 0, 0, 0.0))
        assert (g.week, g.sec) == (2190, 518400.0)

    def test_roundtrip(self):
        for dt in [
            DateTime(2021, 2, 28, 23, 59, 59.0),
            DateTime(2020, 2, 29, 12, 0, 0.0),
            DateTime(2022, 1, 1, 0, 0, 0.0),
            DateTime(2025, 12, 31, 6, 30, 15.0),
        ]:
            g = date2gps(dt)
            back = gps2date(g)
            assert (back.y, back.m, back.d, back.hh, back.mm) == (
                dt.y, dt.m, dt.d, dt.hh, dt.mm,
            )
            assert back.sec == pytest.approx(dt.sec)

    def test_inc_rounds_to_ms(self):
        g = inc_gps_time(GpsTime(2190, 100.0), 0.1 + 1e-10)
        assert g.sec == 100.1

    def test_week_rollover(self):
        g = inc_gps_time(GpsTime(2190, 604799.95), 0.1)
        assert g.week == 2191 and g.sec == pytest.approx(0.05)
        d = sub_gps_time(g, GpsTime(2190, 604799.95))
        assert d == pytest.approx(0.1)


class TestFrames:
    def test_llh_xyz_roundtrip(self):
        llh = np.array([35.681298 / R2D, 139.766247 / R2D, 10.0])
        xyz = llh2xyz(llh)
        back = xyz2llh(xyz)
        assert np.allclose(back, llh, atol=1e-9)

    def test_neu_orthonormal(self):
        llh = np.array([0.5, -1.2, 100.0])
        t = ltcmat(llh)
        assert np.allclose(t @ t.T, np.eye(3), atol=1e-12)

    def test_azel_up(self):
        # A satellite straight up has elevation pi/2.
        llh = np.array([0.7, 0.3, 0.0])
        xyz = llh2xyz(llh)
        up = llh2xyz(llh + [0.0, 0.0, 1000.0])  # same lat/lon, higher
        neu = ecef2neu(up - xyz, ltcmat(llh))
        azel = neu2azel(neu)
        assert azel[1] == pytest.approx(math.pi / 2, abs=1e-6)

    def test_batched(self):
        pts = np.random.RandomState(0).uniform(-1, 1, (10, 3)) * [1.0, 3.0, 1e4]
        pts[:, 0] *= 1.4
        xyz = llh2xyz(pts)
        assert xyz.shape == (10, 3)
        back = xyz2llh(xyz)
        assert np.allclose(back[:, :2], pts[:, :2], atol=1e-8)
