"""End-to-end multi-host scenario driver: two processes stream their block
shares to part files; the merged stream must equal a single-process run."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from gpssim_tpu.parallel import multihost

pid = int(sys.argv[1])
multihost.initialize(
    coordinator_address={coord!r}, num_processes=2, process_id=pid,
)

from gpssim_tpu.config import CarrierMode, SimConfig

cfg = SimConfig(
    nav_file=os.path.join({repo!r}, "fixtures", "brdc_test.22n"),
    duration_sec=0.5, almanac_enable=False, out_file={out!r},
    sample_rate={rate}, carrier_mode=CarrierMode.{carrier},
    noise_std_lsb={noise}, noise_seed=5,
)
part = multihost.run_scenario_multihost(cfg, chan_shards=2, window_blocks=4)
print("wrote", part)
"""


@pytest.mark.skipif(
    os.environ.get("GPSSIM_TEST_TPU", "") not in ("", "0"),
    reason="CPU multiprocess test",
)
@pytest.mark.parametrize(
    "rate,carrier,noise",
    [
        (3_000_000, "FLOAT", 0.0),
        # gps-sdr-sim-family rate (wide-window kernel) + integer NCO:
        # both flags must thread through the multihost path. Slow-marked:
        # each case spawns two jax processes; the default suite keeps
        # the clean and the noisy case (the wide/int-NCO flags are
        # covered single-host by test_runner/test_sharding).
        pytest.param(2_046_000, "INT_NCO", 0.0, marks=pytest.mark.slow),
        # AWGN keying must match the single-host runner byte-for-byte
        # across the process split (noise.py counter scheme).
        (3_000_000, "FLOAT", 2.0),
    ],
)
def test_run_scenario_multihost_matches_single_process(
    fixtures_dir, tmp_path, rate, carrier, noise
):
    out = str(tmp_path / "mh.bin")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = _CHILD.format(
        repo=REPO, coord=f"127.0.0.1:{port}", out=out, rate=rate,
        carrier=carrier, noise=noise,
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, f"stdout:\n{o}\nstderr:\n{e[-3000:]}"

    from gpssim_tpu.config import CarrierMode, SimConfig, SynthBackend
    from gpssim_tpu.parallel.multihost import merge_parts
    from gpssim_tpu.runner import run_simulation

    merge_parts(out, 2)

    ref = str(tmp_path / "ref.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.5,
        almanac_enable=False, backend=SynthBackend.NUMPY,
        sink="iqfile", out_file=ref, sample_rate=rate,
        carrier_mode=CarrierMode[carrier],
        noise_std_lsb=noise, noise_seed=5,
    )
    run_simulation(cfg)
    a = np.fromfile(out, dtype=np.int8)
    b = np.fromfile(ref, dtype=np.int8)
    assert a.size == b.size == 4 * 2 * (rate // 10)
    assert np.array_equal(a, b)


def test_parity_exact_requires_native_engine(fixtures_dir, monkeypatch):
    """parity_exact without the native sequential engine must fail loudly
    — a process silently falling back to closed-form output would corrupt
    the merged multi-host stream at the sparse correction samples."""
    from gpssim_tpu.config import SimConfig
    from gpssim_tpu.ops import synth_seq
    from gpssim_tpu.parallel import multihost

    monkeypatch.setattr(synth_seq, "_lib", lambda: None)
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.3,
        almanac_enable=False, parity_exact=True,
        out_file="/tmp/never-written.bin",
    )
    with pytest.raises(RuntimeError, match="native sequential engine"):
        multihost.run_scenario_multihost(cfg, chan_shards=2, window_blocks=4)
