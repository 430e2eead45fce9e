"""URL assembly and station selection for the network fetchers (no I/O)."""

import random
import time

from gpssim_tpu.io.fetch import (
    STATIONS_V2,
    STATIONS_V3,
    rinex_url,
    select_station,
)


def test_station_tables_match_reference_counts():
    assert len(STATIONS_V2) == 81  # gps.c:53-136
    assert len(STATIONS_V3) == 3  # gps.c:40-45
    assert all(len(s[0]) == 4 and len(s[1]) == 9 for s in STATIONS_V2)


def test_select_station():
    assert select_station("zimm")[2] == "Zimmerwald L+T 88"
    assert select_station("ZIMM00CHE")[0] == "zimm"
    assert select_station("pdel", version=3)[1] == "PDEL00PRT"
    # unknown falls back to the first entry (gps.c:2416-2419)
    assert select_station("zzzz") == STATIONS_V2[0]
    # random pick is deterministic under a seeded rng
    st = select_station(None, rng=random.Random(7))
    assert st in STATIONS_V2


def test_rinex_url_format():
    # gps.h:27 template: {sub}/DDD/HH/ssssDDDh.YYn.gz, previous hour
    tm = time.struct_time((2022, 3, 15, 14, 5, 0, 1, 74, 0))
    assert rinex_url("zimm", tm) == (
        "ftp://igs.bkg.bund.de/IGS/nrt/074/13/zimm074n.22n.gz"
    )
    assert rinex_url("pdel", tm, version=3) == (
        "ftp://igs.bkg.bund.de/IGS/nrt_v3/074/13/pdel074n.22n.gz"
    )


def test_rinex_url_midnight_wrap():
    tm = time.struct_time((2022, 3, 15, 0, 5, 0, 1, 74, 0))
    # hour 0 - 1 → 23, same day (gps.c:2424-2427)
    assert "/074/23/" in rinex_url("zimm", tm)
    assert "074x.22n.gz" in rinex_url("zimm", tm)
