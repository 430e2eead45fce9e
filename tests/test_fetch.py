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


class _MiniFtpServer:
    """Minimal loopback FTP server speaking the subset ftplib/urllib use:
    USER/PASS/TYPE/CWD/PASV/RETR/QUIT. Serves files from a directory."""

    def __init__(self, root):
        import socket
        import threading

        self.root = root
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(2)
        self.port = self.srv.getsockname()[1]
        self.retrieved = []
        self._t = threading.Thread(target=self._serve, daemon=True)
        self._t.start()

    def _serve(self):
        import os
        import socket

        conn, _ = self.srv.accept()
        f = conn.makefile("rwb")

        def send(line):
            f.write((line + "\r\n").encode())
            f.flush()

        send("220 mini-ftp ready")
        cwd = []
        data_srv = None
        while True:
            raw = f.readline()
            if not raw:
                break
            cmd, _, arg = raw.decode().strip().partition(" ")
            cmd = cmd.upper()
            if cmd == "USER":
                send("331 send password")
            elif cmd == "PASS":
                send("230 logged in")
            elif cmd == "TYPE":
                send("200 type set")
            elif cmd == "CWD":
                cwd.append(arg)
                send("250 ok")
            elif cmd == "SIZE":
                p = os.path.join(self.root, arg)
                if os.path.exists(p):
                    send(f"213 {os.path.getsize(p)}")
                else:
                    send("550 not found")
            elif cmd == "PASV":
                data_srv = socket.socket()
                data_srv.bind(("127.0.0.1", 0))
                data_srv.listen(1)
                p = data_srv.getsockname()[1]
                send(f"227 passive (127,0,0,1,{p >> 8},{p & 0xFF})")
            elif cmd == "RETR":
                path = os.path.join(self.root, arg)
                self.retrieved.append("/".join(cwd + [arg]))
                if not os.path.exists(path):
                    send("550 not found")
                    continue
                send("150 opening data connection")
                dconn, _ = data_srv.accept()
                with open(path, "rb") as src:
                    dconn.sendall(src.read())
                dconn.close()
                data_srv.close()
                send("226 transfer complete")
            elif cmd == "QUIT":
                send("221 bye")
                break
            else:
                send("502 not implemented")
        conn.close()

    def close(self):
        self.srv.close()


def test_fetch_over_local_ftp(fixtures_dir, tmp_path, monkeypatch):
    """The production URL is ftp:// (gps.h:24) and urllib's FTP handler is
    a different code path from HTTP — exercise it against a loopback FTP
    server end-to-end, including the gzip payload round-trip."""
    import gzip
    import shutil
    import time as _time

    from gpssim_tpu.core.ephemeris import read_rinex_nav
    from gpssim_tpu.io import fetch

    serve = tmp_path / "serve"
    serve.mkdir()
    # The expected NRT file name for the frozen clock below.
    tm = _time.struct_time((2022, 1, 10, 7, 5, 0, 0, 10, 0))
    st = fetch.select_station("wtza", version=2)
    name = fetch.rinex_url(st[0], when=tm, version=2).rsplit("/", 1)[1]
    with open(f"{fixtures_dir}/brdc_test.22n", "rb") as src, gzip.open(
        serve / name, "wb"
    ) as dst:
        shutil.copyfileobj(src, dst)

    ftp = _MiniFtpServer(str(serve))
    monkeypatch.setattr(
        fetch, "RINEX_FTP_URL", f"ftp://127.0.0.1:{ftp.port}/IGS/"
    )
    monkeypatch.setattr(fetch.time, "gmtime", lambda: tm)
    out = fetch.fetch_rinex(
        station_id="wtza", version=2, out_path=str(tmp_path / "rinex.gz")
    )
    ftp.close()
    # Full pipeline: the gzip the parser reads must round-trip.
    nav = read_rinex_nav(out, version=2)
    assert nav.neph >= 2
    assert ftp.retrieved and ftp.retrieved[0].endswith(name)


def test_fetch_ftp_error_paths(tmp_path, monkeypatch):
    """Missing file on the FTP server surfaces as FetchError, not a
    traceback (reference exits with a red status, gps.c:2456-2466)."""
    import time as _time

    import pytest

    from gpssim_tpu.io import fetch

    serve = tmp_path / "empty"
    serve.mkdir()
    ftp = _MiniFtpServer(str(serve))
    monkeypatch.setattr(
        fetch, "RINEX_FTP_URL", f"ftp://127.0.0.1:{ftp.port}/IGS/"
    )
    tm = _time.struct_time((2022, 1, 10, 7, 5, 0, 0, 10, 0))
    monkeypatch.setattr(fetch.time, "gmtime", lambda: tm)
    with pytest.raises(fetch.FetchError, match="RINEX download failed"):
        fetch.fetch_rinex(
            station_id="wtza", version=2,
            out_path=str(tmp_path / "rinex.gz"), timeout=5.0,
        )
    ftp.close()
