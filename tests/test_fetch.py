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


def test_fetch_over_local_http(fixtures_dir, tmp_path):
    """Functional download path: serve the fixtures over a loopback HTTP
    server and run both fetchers end to end (urllib plumbing, file write,
    and that the downloaded artifacts actually parse)."""
    import functools
    import gzip
    import http.server
    import threading

    from gpssim_tpu.core.almanac import read_sem_almanac
    from gpssim_tpu.core.ephemeris import read_rinex_nav
    from gpssim_tpu.io.fetch import fetch_almanac, fetch_rinex

    # The served dir holds the almanac fixture plus a gzipped nav file
    # under the exact basename fetch_rinex derives for station 'abmf' now.
    serve = tmp_path / "srv"
    serve.mkdir()
    basename = rinex_url("abmf").rsplit("/", 1)[1]
    with open(f"{fixtures_dir}/brdc_test.22n", "rb") as fp:
        (serve / basename).write_bytes(gzip.compress(fp.read()))
    with open(f"{fixtures_dir}/almanac_test.sem", "rb") as fp:
        (serve / "almanac.sem").write_bytes(fp.read())

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(serve)
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        alm_path = fetch_almanac(
            out_path=str(tmp_path / "alm.sem"), url=f"{base}/almanac.sem"
        )
        alm = read_sem_almanac(alm_path)
        assert any(a.svid for a in alm.sv)

        nav_path = fetch_rinex(
            "abmf", out_path=str(tmp_path / "nav.gz"), base_url=base
        )
        nav = read_rinex_nav(nav_path)
        assert nav.neph >= 1 and nav.sets[0].vflg.any()
    finally:
        srv.shutdown()
