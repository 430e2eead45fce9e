"""RINEX v2/v3 and SEM almanac parser tests."""

import gzip
import os

import numpy as np
import pytest

from gpssim_tpu.core.almanac import read_sem_almanac
from gpssim_tpu.core.ephemeris import (
    apply_time_overwrite,
    nav_time_span,
    read_rinex_nav,
    select_ephemeris_set,
)
from gpssim_tpu.core.gpstime import GpsTime


def test_v2_fields(fixtures_dir):
    nav = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n", version=2)
    assert nav.neph == 2  # two sets 2 h apart
    s = nav.sets[0]
    assert s.vflg.sum() == 31  # PRN 32 has no ephemeris
    assert not s.vflg[31]
    assert np.all(s.toc_sec[s.vflg] == 518400.0)
    assert np.all(s.sqrta[s.vflg] > 5000)
    # derived working variables
    assert np.all(s.A[s.vflg] == s.sqrta[s.vflg] ** 2)
    assert np.all(s.n[s.vflg] > 0)
    io = nav.ionoutc
    assert io.vflg and io.dtls == 18 and io.tot % 4096 == 0


def test_v2_v3_equivalence(fixtures_dir):
    n2 = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n", version=2)
    n3 = read_rinex_nav(f"{fixtures_dir}/brdc_test_v3.22n", version=3)
    for f in ("af0", "af1", "sqrta", "m0", "omg0", "ecc", "toe_sec", "tgd",
              "crc", "crs", "idot", "inc0", "aop", "omgdot", "cuc", "cus"):
        assert np.array_equal(getattr(n2.sets[0], f), getattr(n3.sets[0], f)), f
    assert n2.ionoutc.alpha0 == n3.ionoutc.alpha0
    assert n2.ionoutc.beta3 == n3.ionoutc.beta3


def test_gzip_transparent(fixtures_dir, tmp_path):
    raw = open(f"{fixtures_dir}/brdc_test.22n", "rb").read()
    gz = tmp_path / "brdc.22n.gz"
    gz.write_bytes(gzip.compress(raw))
    nav = read_rinex_nav(str(gz), version=2)
    assert nav.neph == 2


def test_version_gate(fixtures_dir):
    with pytest.raises(ValueError):
        read_rinex_nav(f"{fixtures_dir}/brdc_test_v3.22n", version=2)
    with pytest.raises(ValueError):
        read_rinex_nav(f"{fixtures_dir}/brdc_test.22n", version=3)


def test_set_selection_and_span(fixtures_dir):
    nav = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n", version=2)
    gmin, gmax = nav_time_span(nav)
    assert gmin.sec == 518400.0 and gmax.sec == 518400.0 + 7200.0
    assert select_ephemeris_set(nav, gmin) == 0
    assert select_ephemeris_set(nav, GpsTime(gmin.week, gmin.sec + 7000)) == 1
    assert select_ephemeris_set(nav, GpsTime(gmin.week, gmin.sec - 7200)) == -1


def test_time_overwrite(fixtures_dir):
    nav = read_rinex_nav(f"{fixtures_dir}/brdc_test.22n", version=2)
    target = GpsTime(2300, 345600.0)
    apply_time_overwrite(nav, target)
    gmin, _ = nav_time_span(nav)
    # gmin relocated to target rounded down to 2 h
    assert gmin.week == 2300 and gmin.sec == 345600.0
    assert nav.ionoutc.wnt == 2300


def test_sem_almanac(fixtures_dir):
    alm = read_sem_almanac(f"{fixtures_dir}/almanac_test.sem")
    assert alm.valid == 1
    assert alm.sv[0].svid == 1
    assert alm.sv[0].toa.week == 2190  # file week + 2048 rollover
    assert alm.sv[30].valid == 1
    assert alm.sv[31].valid == 0


def test_sem_malformed(tmp_path):
    bad = tmp_path / "bad.sem"
    bad.write_text("2 TITLE\n142 319488\n\n1\nnot-a-number\n")
    alm = read_sem_almanac(str(bad))
    assert alm.valid == 0


def test_sem_truncated_keeps_partial(tmp_path, fixtures_dir):
    # EOF mid-way: keep what was parsed (u-blox behavior tolerance).
    lines = open(f"{fixtures_dir}/almanac_test.sem").read().splitlines()
    trunc = tmp_path / "trunc.sem"
    trunc.write_text("\n".join(lines[:2 + 10]))  # header + first record + part
    alm = read_sem_almanac(str(trunc))
    assert alm.sv[0].valid == 1


class TestParserRobustness:
    """Malformed inputs must raise clean Python exceptions — never hang,
    never crash the process (the reference has no such guarantee; fuzzed
    here with seeded truncations/flips/shuffles/garbage)."""

    def _mangle(self, rng, base, mode):
        data = bytearray(base)
        if mode == "truncate":
            return bytes(data[: rng.randrange(len(data))])
        if mode == "flip":
            for _ in range(rng.randrange(1, 50)):
                data[rng.randrange(len(data))] = rng.randrange(256)
            return bytes(data)
        if mode == "shuffle":
            lines = bytes(data).split(b"\n")
            rng.shuffle(lines)
            return b"\n".join(lines)
        if mode == "blank":
            return b"\n" * rng.randrange(100)
        return bytes(rng.randrange(256) for _ in range(rng.randrange(2000)))

    def test_rinex_fuzz_no_crash(self, fixtures_dir, tmp_path):
        import random

        from gpssim_tpu.core.ephemeris import read_rinex_nav

        rng = random.Random(11)
        base = open(f"{fixtures_dir}/brdc_test.22n", "rb").read()
        path = str(tmp_path / "f.22n")
        for mode in ("truncate", "flip", "shuffle", "blank", "garbage"):
            for _ in range(6):
                open(path, "wb").write(self._mangle(rng, base, mode))
                try:
                    read_rinex_nav(path, version=2)
                except Exception:
                    pass  # clean exception is acceptable; hang/crash is not

    def test_sem_and_motion_fuzz_no_crash(self, fixtures_dir, tmp_path):
        import random

        from gpssim_tpu.core.almanac import read_sem_almanac
        from gpssim_tpu.core.motion import read_user_motion

        rng = random.Random(12)
        sem = open(f"{fixtures_dir}/almanac_test.sem", "rb").read()
        mo = open(f"{fixtures_dir}/circle_motion.csv", "rb").read()
        p1, p2 = str(tmp_path / "f.sem"), str(tmp_path / "f.csv")
        for _ in range(15):
            open(p1, "wb").write(self._mangle(rng, sem, "flip"))
            open(p2, "wb").write(
                self._mangle(rng, mo,
                             "truncate" if rng.random() < 0.5 else "flip")
            )
            for fn, p in ((read_sem_almanac, p1), (read_user_motion, p2)):
                try:
                    fn(p)
                except Exception:
                    pass
