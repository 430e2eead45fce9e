"""Device-rate stream verification (qa.py): open-loop matched filter at
the known truth trajectory. Complements the blind receiver
(tests/test_receiver.py) with a seconds-scale whole-stream check."""

import numpy as np
import pytest

from tests.helpers import strict_gen_backend

from gpssim_tpu.config import (
    CarrierMode, LocationConfig, SampleFormat, SimConfig, SynthBackend,
)
from gpssim_tpu.qa import verify_stream
from gpssim_tpu.runner import run_simulation


def _cfg(fixtures_dir, out, **kw):
    kw.setdefault("backend", strict_gen_backend())
    kw.setdefault("location", LocationConfig(35.681298, 139.766247, 10.0))
    kw.setdefault("duration_sec", 1.0)
    return SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        almanac_enable=False, sink="iqfile", out_file=out, **kw,
    )


def test_clean_stream_verifies(fixtures_dir, tmp_path):
    out = str(tmp_path / "iq.bin")
    cfg = _cfg(fixtures_dir, out)
    run_simulation(cfg)
    rep = verify_stream(out, cfg)
    assert rep.ok and rep.blocks == 9
    assert len(rep.channels) >= 6
    for ch in rep.channels:
        assert abs(ch.mean_ratio - 1.0) < 0.05, (ch.prn, ch.mean_ratio)


def test_corruption_detected(fixtures_dir, tmp_path):
    out = str(tmp_path / "iq.bin")
    cfg = _cfg(fixtures_dir, out)
    run_simulation(cfg)
    raw = np.fromfile(out, np.int8)
    raw[1_000_000:1_300_000] = 0  # 50 ms hole mid-stream
    bad = str(tmp_path / "bad.bin")
    raw.tofile(bad)
    rep = verify_stream(bad, cfg)
    assert not rep.ok
    assert min(ch.min_ratio for ch in rep.channels) < 0.1


def test_wrong_scenario_detected(fixtures_dir, tmp_path):
    """A capture from location A fails verification against location B —
    the replica phases diverge immediately."""
    out = str(tmp_path / "iq.bin")
    run_simulation(_cfg(fixtures_dir, out))
    other = _cfg(fixtures_dir, out,
                 location=LocationConfig(40.0, -74.0, 20.0))
    rep = verify_stream(out, other)
    assert not rep.ok


def test_noisy_and_16bit_and_intnco_verify(fixtures_dir, tmp_path):
    for kw in (
        dict(noise_std_lsb=3.0, noise_seed=4),
        dict(sample_format=SampleFormat.SC16),
        dict(carrier_mode=CarrierMode.INT_NCO),
    ):
        out = str(tmp_path / "iq.bin")
        cfg = _cfg(fixtures_dir, out, duration_sec=0.5, **kw)
        run_simulation(cfg)
        rep = verify_stream(out, cfg)
        assert rep.ok, (kw, [(c.prn, c.mean_ratio, c.min_ratio)
                             for c in rep.channels])


def test_qa_cli(fixtures_dir, tmp_path, capsys):
    from gpssim_tpu import qa

    out = str(tmp_path / "iq.bin")
    run_simulation(_cfg(fixtures_dir, out, duration_sec=0.5))
    rc = qa.main([
        out, "-e", f"{fixtures_dir}/brdc_test.22n",
        "-l", "35.681298,139.766247,10.0", "-d", "0.5",
        "--disable-almanac",
    ])
    assert rc == 0
    assert "VERIFIED" in capsys.readouterr().out
    rc = qa.main([
        out, "-e", f"{fixtures_dir}/brdc_test.22n",
        "-l", "0,0,0", "-d", "0.5", "--disable-almanac",
    ])
    assert rc == 1


def test_fleet_outputs_verify(fixtures_dir, tmp_path):
    """The farm QA loop: every fleet member's file verifies against its
    own scenario at device rate — and against a sibling's scenario it
    fails (streams are member-specific)."""
    from gpssim_tpu.fleet import run_fleet

    cfgs = [
        _cfg(fixtures_dir, str(tmp_path / f"m{i}.bin"), duration_sec=0.5,
             backend=SynthBackend.JAX,
             location=LocationConfig(35.0 + i, 139.0 - i, 10.0))
        for i in range(2)
    ]
    run_fleet(cfgs, window=4)
    for cfg in cfgs:
        assert verify_stream(cfg.out_file, cfg).ok
    assert not verify_stream(cfgs[0].out_file, cfgs[1]).ok
