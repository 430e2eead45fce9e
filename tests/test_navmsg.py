"""Nav-message tests: IS-GPS-200 parity via an independent checker.

The checker below re-derives word parity from the standard's hamming
vectors (the same role validate_parityN/decode_wordN play as a runtime
self-check in the reference, gps.c:907-1001) — implemented independently
so it can catch bugs in compute_checksum rather than share them.
"""

import numpy as np
import pytest

from gpssim_tpu.config import SimConfig
from gpssim_tpu.core.almanac import Almanac, read_sem_almanac
from gpssim_tpu.core.atmosphere import IonoUtc
from gpssim_tpu.core.gpstime import GpsTime
from gpssim_tpu.core.navmsg import compute_checksum, eph2sbf, generate_nav_msg

HAMMING = (0xBB1F3480, 0x5D8F9A40, 0xAEC7CD00, 0x5763E680, 0x6BB1F340, 0x8B7A89C0)


def parity_ok(word: int) -> bool:
    """Independent IS-GPS-200 word-parity verification."""
    w = word & 0xFFFFFFFF
    if w & 0x40000000:  # D30* set: data bits arrive inverted
        w ^= 0x3FFFFFC0
    parity = 0
    for mask in HAMMING:
        parity = (parity << 1) | (bin(w & mask & ~0x3F).count("1") & 1)
    return parity == (word & 0x3F)


@pytest.fixture
def nav(fixtures_dir):
    from gpssim_tpu.core.ephemeris import read_rinex_nav

    return read_rinex_nav(f"{fixtures_dir}/brdc_test.22n", version=2)


@pytest.fixture
def alm(fixtures_dir):
    return read_sem_almanac(f"{fixtures_dir}/almanac_test.sem")


def test_checksum_self_consistent():
    rng = np.random.RandomState(42)
    for _ in range(200):
        src = int(rng.randint(0, 1 << 32, dtype=np.uint64))
        word = compute_checksum(src, nib=False)
        assert parity_ok(word), hex(src)


def test_library_validator_agrees_and_catches_corruption():
    from gpssim_tpu.core.navmsg import validate_frame, validate_parity

    rng = np.random.RandomState(3)
    words = np.zeros(20, dtype=np.uint32)
    for i in range(20):
        src = int(rng.randint(0, 1 << 32, dtype=np.uint64))
        words[i] = compute_checksum(src, nib=False)
        assert validate_parity(int(words[i])) == parity_ok(int(words[i]))
    assert validate_frame(words) == []
    words[7] ^= 1 << 11  # flip a data bit
    assert 7 in validate_frame(words)


def test_checksum_nib_zeroes_trailing_parity():
    rng = np.random.RandomState(1)
    for _ in range(100):
        src = int(rng.randint(0, 1 << 32, dtype=np.uint64))
        word = compute_checksum(src, nib=True)
        assert parity_ok(word)
        # Words 2/10 must end with D29=D30=0 so the next word starts clean.
        assert (word & 0x3) == 0


def test_frame_serialization_parity(nav, alm):
    sbf = eph2sbf(nav.sets[0], 0, nav.ionoutc, alm)
    assert sbf.shape == (53, 10)
    dwrd = np.zeros(60, dtype=np.uint32)
    g = GpsTime(2190, 518400.0)
    g0, ipage = generate_nav_msg(g, sbf, dwrd, 0, init=True)
    assert g0.sec == 518400.0
    assert ipage == 1
    for w in dwrd:
        assert parity_ok(int(w))

    # Preamble 0x8B at the top of every subframe's TLM word.
    for isbf in range(6):
        tlm = int(dwrd[isbf * 10])
        assert (tlm >> 22) & 0xFF == 0x8B

    # TOW counts: HOW of subframe k carries tow+k (6 s units).
    tow0 = int(518400.0) // 6
    for isbf in range(1, 6):
        how = int(dwrd[isbf * 10 + 1])
        assert (how >> 13) & 0x1FFFF == tow0 + isbf

    # Rolling regeneration: words 50-59 move to the front.
    tail = dwrd[50:60].copy()
    g2 = GpsTime(2190, 518430.0)
    generate_nav_msg(g2, sbf, dwrd, ipage, init=False)
    assert np.array_equal(dwrd[0:10], tail)
    for w in dwrd:
        assert parity_ok(int(w))


def test_subframe1_has_wn_and_clock(nav, alm):
    sbf = eph2sbf(nav.sets[0], 0, nav.ionoutc, alm)
    dwrd = np.zeros(60, dtype=np.uint32)
    generate_nav_msg(GpsTime(2190, 518400.0), sbf, dwrd, 0, init=True)
    word3 = int(dwrd[12])  # subframe 1, word 3
    wn = (word3 >> 20) & 0x3FF
    assert wn == 2190 % 1024


def test_almanac_pages_present(nav, alm):
    sbf = eph2sbf(nav.sets[0], 0, nav.ionoutc, alm)
    # Subframe 5 page 1 carries PRN 1 almanac: svid in bits 22-27 of word 3.
    page = sbf[4]  # 4 + 0*2
    svid = (int(page[2]) >> 22) & 0x3F
    assert svid == 1
    # Dummy pages carry the alternating-bit EMPTY pattern.
    empty = eph2sbf(nav.sets[0], 0, nav.ionoutc, Almanac())
    assert (int(empty[4][3]) >> 6) & 0xFFFFFF == 0xAAAAAA & 0xFFFFFF


def test_iono_page18(nav, alm):
    assert nav.ionoutc.vflg
    sbf = eph2sbf(nav.sets[0], 0, nav.ionoutc, alm)
    page18 = sbf[3 + 17 * 2]
    svid = (int(page18[2]) >> 22) & 0x3F
    assert svid == 56  # SBF4_SVID[17]
    # alpha0 round-trips through the 2^-30 scaling
    a0 = (int(page18[2]) >> 14) & 0xFF
    if a0 & 0x80:
        a0 -= 256
    assert a0 * 2.0**-30 == pytest.approx(nav.ionoutc.alpha0, rel=0.05)


def test_iono_disabled_uses_empty_page(nav, alm):
    io = IonoUtc(vflg=False)
    sbf = eph2sbf(nav.sets[0], 0, io, alm)
    page18 = sbf[3 + 17 * 2]
    assert (int(page18[2]) >> 22) & 0x3F == 0  # dummy SV id
