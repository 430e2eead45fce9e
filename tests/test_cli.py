"""CLI option-surface tests (reference help.h:20-53, gps-sim.c:35-177)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from gpssim_tpu.cli import args_to_config, build_parser
from gpssim_tpu.config import CarrierMode, SampleFormat, SynthBackend


def parse(argv):
    return args_to_config(build_parser().parse_args(argv))


def test_defaults():
    cfg = parse([])
    assert cfg.sample_format is SampleFormat.SC08
    assert cfg.rinex_version == 2
    assert cfg.ionosphere_enable and cfg.almanac_enable
    assert cfg.sink == "none"
    assert cfg.backend is SynthBackend.JAX
    assert cfg.carrier_mode is CarrierMode.FLOAT
    assert cfg.parity_exact
    # Reference defaults: location 0,0,0 and a full 24 h run
    # (gps-sim.c:190-195).
    assert (cfg.location.lat, cfg.location.lon, cfg.location.height) == (0, 0, 0)
    assert cfg.duration_sec == 86400.0


def test_reference_options():
    cfg = parse([
        "-e", "nav.22n", "-l", "1.5,2.5,30", "-d", "12.34", "-I",
        "-t", "100,45,5", "-p", "25", "-3", "--iq16", "-r", "iqfile",
        "--disable-almanac", "-g", "30", "-a",
    ])
    assert cfg.nav_file == "nav.22n"
    assert cfg.location.lat == 1.5 and cfg.location.height == 30
    # duration rounds to epochs*10 (gps-sim.c:131-141)
    assert cfg.duration_sec == pytest.approx(12.3)
    assert not cfg.ionosphere_enable and not cfg.almanac_enable
    assert cfg.target.valid
    # bearing stored x1000 (gps-sim.c:148)
    assert cfg.target.bearing_millideg == 45000.0
    assert cfg.ppb == 25
    assert cfg.rinex_version == 3
    assert cfg.sample_format is SampleFormat.SC16
    assert cfg.sink == "iqfile"
    assert cfg.tx_gain == 30 and cfg.tx_amplifier


def test_start_parsing():
    cfg = parse(["-s", "2022/01/02,03:04:05"])
    assert (cfg.start.y, cfg.start.m, cfg.start.d) == (2022, 1, 2)
    assert (cfg.start.hh, cfg.start.mm, cfg.start.sec) == (3, 4, 5.0)
    assert not cfg.time_overwrite

    cfg = parse(["-s", "now"])
    assert cfg.time_overwrite and cfg.start.y >= 2026

    with pytest.raises(SystemExit):
        parse(["-s", "1979/01/01,00:00:00"])
    with pytest.raises(SystemExit):
        parse(["-s", "2022/13/01,00:00:00"])
    # typos must not silently parse as the current time (ADVICE r1)
    with pytest.raises(SystemExit):
        parse(["-s", "nowhere"])


def test_motion_disables_interactive():
    cfg = parse(["-i", "-m", "circle.csv"])
    assert cfg.motion_file == "circle.csv"
    assert not cfg.interactive  # gps-sim.c:63-68


def test_hardware_sinks_force_format():
    cfg = parse(["-r", "hackrf", "--iq16"])
    assert cfg.sample_format is SampleFormat.SC08  # sdr_hackrf.c:44-48
    cfg = parse(["-r", "plutosdr"])
    assert cfg.sample_format is SampleFormat.SC16  # sdr_pluto.c:106-110
    assert cfg.pluto_gain_boost  # gps.c:2759-2763


def test_invalid_duration():
    with pytest.raises(SystemExit):
        parse(["-d", "90000"])  # > USER_MOTION_SIZE/10


def test_no_radio_lists_sinks_and_exits(capsys):
    """Reference behavior: no radio selected → list supported and fail
    (sdr.c:48-55)."""
    from gpssim_tpu.cli import main

    assert main(["-e", "nav.22n"]) == 1
    err = capsys.readouterr().err
    assert "supported sinks" in err and "iqfile" in err


def test_cli_end_to_end(fixtures_dir, tmp_path):
    """python -m gpssim_tpu produces the expected IQ file."""
    out = tmp_path / "iq.bin"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable, "-m", "gpssim_tpu",
            "-e", f"{fixtures_dir}/brdc_test.22n",
            "-d", "0.4", "-r", "iqfile", "--backend", "numpy",
            "--disable-almanac", "--out-file", str(out), "-v",
        ],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr
    data = np.fromfile(out, dtype=np.int8)
    # 3 blocks (numd-1 epochs) x 600000 interleaved IQ int8
    assert data.size == 3 * 600_000
    assert np.any(data != 0)
    assert "done:" in r.stderr


def test_resume_warns_on_ignored_scenario_flags(
    fixtures_dir, tmp_path, capsys, monkeypatch
):
    """Scenario flags combined with --resume are ignored (the checkpoint
    carries the config); the CLI must say so (ADVICE r1)."""
    from gpssim_tpu import cli
    from gpssim_tpu.checkpoint import save_checkpoint
    from gpssim_tpu.config import SimConfig
    from gpssim_tpu.scenario import Simulation

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.3,
        almanac_enable=False, backend=SynthBackend.NUMPY,
        out_file=str(tmp_path / "iq.bin"), sink="iqfile",
    )
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(ckpt, Simulation(cfg))

    calls = {}
    # run_app is imported inside main; patch the app module.
    from gpssim_tpu import app

    monkeypatch.setattr(
        app, "run_app",
        lambda c, sim=None, use_tui=False: calls.update(d=c.duration_sec) or 0,
    )
    assert cli.main(["--resume", ckpt, "-d", "99"]) == 0
    err = capsys.readouterr().err
    assert "ignoring" in err and "-d/--duration" in err
    assert calls["d"] == 0.3  # checkpoint's duration won, not -d 99

    # The warning is enumerated from the parser, so runtime flags that
    # aren't reapplied (review r2: --realtime, --metrics-file, ...) are
    # covered too — not just the hand-listed scenario flags.
    assert cli.main(["--resume", ckpt, "--realtime",
                     "--metrics-file", "m.jsonl"]) == 0
    err = capsys.readouterr().err
    assert "--realtime" in err and "--metrics-file" in err
    # --checkpoint and --tui ARE honored: no warning for them.
    assert cli.main(["--resume", ckpt, "--checkpoint", ckpt]) == 0
    assert "ignoring" not in capsys.readouterr().err


def test_use_ftp_fetch_failure_exits_cleanly(monkeypatch):
    """A network failure under --use-ftp is a reportable condition
    (reference gps.c:2456-2466), not a traceback."""
    import pytest

    from gpssim_tpu import cli
    from gpssim_tpu.io import fetch

    def boom(*a, **k):
        raise fetch.FetchError("server unreachable")

    monkeypatch.setattr(fetch, "fetch_rinex", boom)
    with pytest.raises(SystemExit) as ei:
        cli.main(["-f", "-r", "iqfile"])
    assert ei.value.code == 2


def test_cli_native_backend_end_to_end(fixtures_dir, tmp_path):
    """--backend native (C++ sequential hot loop) through the CLI."""
    from gpssim_tpu.ops.synth_seq import seq_available

    if not seq_available():
        pytest.skip("native runtime unavailable")
    out = tmp_path / "iq.bin"
    ref = tmp_path / "ref.bin"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    base = [
        sys.executable, "-m", "gpssim_tpu",
        "-e", f"{fixtures_dir}/brdc_test.22n",
        "-d", "0.4", "-r", "iqfile", "--disable-almanac",
    ]
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        base + ["--backend", "native", "--out-file", str(out)],
        capture_output=True, text=True, env=env, cwd=cwd,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        base + ["--backend", "numpy", "--out-file", str(ref)],
        capture_output=True, text=True, env=env, cwd=cwd,
    )
    assert r.returncode == 0, r.stderr
    a = np.fromfile(out, dtype=np.int8)
    b = np.fromfile(ref, dtype=np.int8)
    assert a.size == 3 * 600_000 and np.array_equal(a, b)


def test_cli_fleet(fixtures_dir, tmp_path, monkeypatch, capsys):
    """--fleet runs one scenario per roster row through the batched
    pipeline; each member file equals the corresponding solo CLI run."""
    from gpssim_tpu import cli

    roster = tmp_path / "roster.csv"
    roster.write_text(
        "# lat, lon, height[, out_file]\n"
        "35.681298, 139.766247, 10.0\n"
        f"40.7128, -74.0060, 20.0, {tmp_path}/ny.bin\n"
    )
    monkeypatch.chdir(tmp_path)
    assert cli.main([
        "-e", f"{fixtures_dir}/brdc_test.22n", "-d", "0.4",
        "-r", "iqfile", "--disable-almanac",
        "--out-file", str(tmp_path / "iq.bin"),
        "--fleet", str(roster),
    ]) == 0
    out = capsys.readouterr().out
    assert "fleet member 1" in out and "aggregate" in out

    for member, (loc, path) in enumerate([
        ("35.681298,139.766247,10.0", tmp_path / "iq_m0.bin"),
        ("40.7128,-74.0060,20.0", tmp_path / "ny.bin"),
    ]):
        solo = tmp_path / f"solo{member}.bin"
        assert cli.main([
            "-e", f"{fixtures_dir}/brdc_test.22n", "-d", "0.4",
            "-r", "iqfile", "--disable-almanac", "-l", loc,
            "--out-file", str(solo),
        ]) == 0
        a = np.fromfile(path, dtype=np.int8)
        b = np.fromfile(solo, dtype=np.int8)
        assert a.size == b.size == 3 * 600_000
        assert np.array_equal(a, b), f"member {member} differs from solo"


def test_cli_fleet_rejects_bad_combos(fixtures_dir, tmp_path):
    from gpssim_tpu import cli

    roster = tmp_path / "roster.csv"
    roster.write_text("1,2,3\n")
    # (realtime fleets and tcp fleets are supported since r4; the
    # remaining rejections are per-scenario features and bad targets)
    with pytest.raises(SystemExit):
        cli.main([
            "-e", f"{fixtures_dir}/brdc_test.22n", "-r", "iqfile",
            "--fleet", str(roster), "--interactive",
        ])
    with pytest.raises(SystemExit):
        cli.main([
            "-e", f"{fixtures_dir}/brdc_test.22n", "-r", "tcp",
            "--tcp-addr", "noport", "--fleet", str(roster),
        ])
    bad = tmp_path / "bad.csv"
    bad.write_text("1,2\n")
    with pytest.raises(SystemExit):
        cli.main([
            "-e", f"{fixtures_dir}/brdc_test.22n", "-r", "iqfile",
            "--fleet", str(bad),
        ])


def test_cli_fleet_checkpoint_and_resume(fixtures_dir, tmp_path, monkeypatch,
                                         capsys):
    """--fleet --checkpoint writes ONE fleet snapshot; --resume on that
    file restores and finishes the whole fleet (here: already complete,
    so it resumes to an immediate clean end)."""
    from gpssim_tpu import cli
    from gpssim_tpu.checkpoint import is_fleet_checkpoint

    roster = tmp_path / "roster.csv"
    roster.write_text("35.681298, 139.766247, 10.0\n35.9, 139.8, 10.0\n")
    ckpt = tmp_path / "fleet.npz"
    monkeypatch.chdir(tmp_path)
    assert cli.main([
        "-e", f"{fixtures_dir}/brdc_test.22n", "-d", "0.4",
        "-r", "iqfile", "--disable-almanac",
        "--out-file", str(tmp_path / "iq.bin"),
        "--fleet", str(roster), "--checkpoint", str(ckpt),
    ]) == 0
    assert ckpt.exists() and is_fleet_checkpoint(str(ckpt))
    capsys.readouterr()

    assert cli.main(["--resume", str(ckpt)]) == 0
    out = capsys.readouterr().out
    assert "fleet member 1" in out
