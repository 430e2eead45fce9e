"""App lifecycle: headless run, profiling capture, checkpoint cadence."""

import os

import numpy as np
import pytest

from gpssim_tpu.app import run_app
from gpssim_tpu.config import SimConfig, SynthBackend


def _cfg(fixtures_dir, tmp_path, **kw):
    kw.setdefault("duration_sec", 0.4)
    kw.setdefault("backend", SynthBackend.NUMPY)
    return SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        almanac_enable=False,
        sink="iqfile",
        out_file=str(tmp_path / "iq.bin"),
        **kw,
    )


def test_headless_run_writes_output(fixtures_dir, tmp_path):
    cfg = _cfg(fixtures_dir, tmp_path)
    assert run_app(cfg) == 0
    data = np.fromfile(cfg.out_file, dtype=np.int8)
    assert data.size == 3 * 600_000 and np.any(data)


def test_profile_capture(fixtures_dir, tmp_path):
    prof = tmp_path / "trace"
    cfg = _cfg(
        fixtures_dir, tmp_path, backend=SynthBackend.JAX,
        profile_dir=str(prof),
    )
    assert run_app(cfg) == 0
    # jax.profiler.trace writes a plugins/profile tree with a .xplane.pb
    found = [f for _, _, fs in os.walk(prof) for f in fs]
    assert any(f.endswith(".xplane.pb") for f in found), found


@pytest.mark.slow  # needs >30 s of signal; resume bit-exactness itself
# is covered by the (fast) test_checkpoint.py suite
def test_checkpoint_and_metrics_at_30s_cadence(fixtures_dir, tmp_path):
    import json

    ckpt = tmp_path / "state.npz"
    metrics = tmp_path / "metrics.jsonl"
    cfg = _cfg(
        fixtures_dir, tmp_path, duration_sec=31.0,
        backend=SynthBackend.JAX, checkpoint_file=str(ckpt),
        metrics_file=str(metrics), dispatch_blocks=25,
    )
    assert run_app(cfg) == 0
    assert ckpt.exists()
    from gpssim_tpu.checkpoint import load_checkpoint

    _, sim = load_checkpoint(str(ckpt))
    # final save happens at end-of-run with the full scenario consumed
    assert sim._iumd == 310

    recs = [json.loads(line) for line in metrics.read_text().splitlines()]
    assert len(recs) == 1 and recs[0]["blocks"] >= 300
    assert recs[0]["channels"] and recs[0]["retries"] == 0
    assert abs(recs[0]["lat"] - 35.681298) < 1e-3


def test_checkpoint_and_metrics_cadence_smoke(fixtures_dir, tmp_path):
    """Default-suite smoke of the 30 s-cadence hook (VERDICT r4 item 6):
    same run_app path and 31 s of signal as the slow JAX-backend case,
    but synthesized by the native engine (~13x realtime on one core) so
    the mid-run checkpoint save and the metrics record both fire in a
    few seconds. The pipelined-runner snapshot variant stays covered by
    test_checkpoint.py / test_fleet checkpointing."""
    import json

    from gpssim_tpu.ops.synth_seq import seq_available

    if not seq_available():
        pytest.skip("native engine unavailable")
    ckpt = tmp_path / "state.npz"
    metrics = tmp_path / "metrics.jsonl"
    cfg = _cfg(
        fixtures_dir, tmp_path, duration_sec=31.0,
        backend=SynthBackend.NATIVE, checkpoint_file=str(ckpt),
        metrics_file=str(metrics),
    )
    assert run_app(cfg) == 0
    assert ckpt.exists()
    from gpssim_tpu.checkpoint import load_checkpoint

    _, sim = load_checkpoint(str(ckpt))
    assert sim._iumd == 310

    recs = [json.loads(line) for line in metrics.read_text().splitlines()]
    assert len(recs) == 1 and recs[0]["blocks"] >= 300
    assert recs[0]["channels"] and recs[0]["retries"] == 0
    assert abs(recs[0]["lat"] - 35.681298) < 1e-3
