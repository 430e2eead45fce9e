"""Optional AWGN stage (noise.py): determinism, statistics, and the
off-by-default bit-exact guarantee.

The reference has no noise model (its loop emits pure channel sums,
gps.c:2767-2836); this stage exists for the receiver-farm QA use cases
(fleet.py / receiver.py) and must never perturb the parity contract."""

import numpy as np
import pytest

from gpssim_tpu.config import LocationConfig, SimConfig, SynthBackend
from gpssim_tpu.noise import apply_awgn
from gpssim_tpu.runner import run_simulation
from tests.test_fleet import CaptureSink, _cfg


def test_awgn_statistics_and_determinism():
    blk = np.zeros(600_000, dtype=np.int8)
    a = apply_awgn(blk, 8, 3.0, seed=7, stream=0, block_index=5)
    b = apply_awgn(blk, 8, 3.0, seed=7, stream=0, block_index=5)
    assert np.array_equal(a, b)  # counter-based: same key, same draw
    assert abs(float(a.mean())) < 0.05
    assert abs(float(a.std()) - 3.0) < 0.05
    # Different block index / stream / seed → different realizations.
    for kw in ({"block_index": 6}, {"stream": 1}, {"seed": 8}):
        args = {"seed": 7, "stream": 0, "block_index": 5, **kw}
        c = apply_awgn(blk, 8, 3.0, **args)
        assert not np.array_equal(a, c)


def test_awgn_clips_to_dtype():
    blk = np.full(10_000, 126, dtype=np.int8)
    out = apply_awgn(blk, 8, 50.0, seed=1, stream=0, block_index=0)
    assert out.dtype == np.int8
    assert out.max() <= 127 and out.min() >= -128
    blk16 = np.full(10_000, 32700, dtype=np.int16)
    out16 = apply_awgn(blk16, 16, 500.0, seed=1, stream=0, block_index=0)
    assert out16.dtype == np.int16 and out16.max() <= 32767


def test_noise_stream_batching_invariant(fixtures_dir):
    """The noisy byte stream is identical whether blocks go through the
    block-by-block numpy path or the pipelined batched device path."""
    kw = dict(duration_sec=0.6, noise_std_lsb=2.5, noise_seed=42)
    a = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.NUMPY, **kw), sink=a
    )
    b = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=3,
             **kw),
        sink=b,
    )
    assert a.blocks == b.blocks > 0
    for x, y in zip(a.data, b.data):
        assert np.array_equal(x, y)
    # And it actually differs from the clean stream.
    clean = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.NUMPY, duration_sec=0.6),
        sink=clean,
    )
    assert not np.array_equal(a.data[0], clean.data[0])


def test_noise_stream_16bit(fixtures_dir):
    """16-bit end-to-end: the noisy SC16 stream is batching-invariant and
    differs from the clean stream."""
    from gpssim_tpu.config import SampleFormat

    kw = dict(duration_sec=0.4, sample_format=SampleFormat.SC16,
              noise_std_lsb=40.0, noise_seed=21)
    a = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.NUMPY, **kw), sink=a
    )
    b = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=2,
             **kw),
        sink=b,
    )
    assert a.blocks == b.blocks > 0
    for x, y in zip(a.data, b.data):
        assert x.dtype == np.int16 and np.array_equal(x, y)
    clean = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.NUMPY, duration_sec=0.4,
             sample_format=SampleFormat.SC16),
        sink=clean,
    )
    assert not np.array_equal(a.data[0], clean.data[0])
    # noise std in 16-bit LSB units survives the pipeline
    d = a.data[0].astype(np.int32) - clean.data[0].astype(np.int32)
    assert abs(float(np.std(d)) - 40.0) < 1.0


def test_noise_fleet_member_matches_solo(fixtures_dir):
    from gpssim_tpu.fleet import run_fleet

    cfgs = [
        _cfg(fixtures_dir, duration_sec=0.5, noise_std_lsb=2.0,
             noise_seed=11),
        _cfg(fixtures_dir, duration_sec=0.5, noise_std_lsb=2.0,
             noise_seed=12, location=LocationConfig(10.0, 20.0, 30.0)),
    ]
    sinks = [CaptureSink(), CaptureSink()]
    run_fleet(cfgs, sinks=sinks, window=4)
    for cfg, sink in zip(cfgs, sinks):
        solo = CaptureSink()
        run_simulation(cfg, sink=solo)
        assert len(sink.data) == solo.blocks
        for got, want in zip(sink.data, solo.data):
            assert np.array_equal(got, want)


def test_noise_resume_invariant(fixtures_dir, tmp_path):
    """A run split by checkpoint/resume produces the same noisy bytes as
    an unbroken run (block-index keying is resume-stable)."""
    from gpssim_tpu.checkpoint import load_checkpoint, save_checkpoint
    from gpssim_tpu.scenario import Simulation

    kw = dict(duration_sec=0.8, noise_std_lsb=2.0, noise_seed=5)
    whole = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.NUMPY, **kw), sink=whole
    )

    cfg = _cfg(fixtures_dir, backend=SynthBackend.NUMPY, **kw)
    sim = Simulation(cfg)
    first = CaptureSink()
    seen = []
    ckpt = str(tmp_path / "state.npz")
    run_simulation(
        cfg, sink=first, sim=sim,
        on_block=lambda st, s, p: seen.append(st.blocks),
        stop=lambda: len(seen) >= 3,
    )
    save_checkpoint(ckpt, sim)
    cfg2, sim2 = load_checkpoint(ckpt)
    rest = CaptureSink()
    run_simulation(cfg2, sink=rest, sim=sim2)

    merged = first.data + rest.data
    assert len(merged) == len(whole.data)
    for x, y in zip(merged, whole.data):
        assert np.array_equal(x, y)


def test_acquisition_survives_noise(fixtures_dir, tmp_path):
    """The point of the stage: a noisy capture still behaves like a real
    front-end's — acquisition finds every simulated PRN through AWGN at
    several LSB of the 8-bit stream."""
    from gpssim_tpu.acquire import acquire, load_iq
    from gpssim_tpu.scenario import Simulation

    out = str(tmp_path / "iq.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=1.0,
        almanac_enable=False, backend=SynthBackend.NUMPY,
        sink="iqfile", out_file=out,
        noise_std_lsb=4.0, noise_seed=3,
    )
    plan = Simulation(cfg).step()
    run_simulation(cfg)
    dets = acquire(load_iq(out, 8))
    active = {int(p) for p in plan.prn[plan.active]}
    assert active <= {d.prn for d in dets}, (
        "noise drowned a simulated PRN"
    )


@pytest.mark.slow
def test_receiver_fix_through_noise(fixtures_dir, tmp_path):
    """Full QA loop under noise: the software receiver still produces a
    meter-level PVT fix from a capture with 3-LSB AWGN (C/A processing
    gain makes this easy for a correct receiver — a broken one fails)."""
    from gpssim_tpu.acquire import load_iq
    from gpssim_tpu.receiver import receiver_fix
    from gpssim_tpu.scenario import Simulation

    rate = 2_600_000
    out = str(tmp_path / "iq.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=20.0,
        sample_rate=rate, almanac_enable=False, ionosphere_enable=False,
        backend=SynthBackend.NUMPY, sink="iqfile", out_file=out,
        location=LocationConfig(35.681298, 139.766247, 10.0),
        noise_std_lsb=3.0, noise_seed=9,
    )
    sim = Simulation(cfg)
    truth = np.array(sim.xyz0)
    week = sim.g0.week
    run_simulation(cfg, sim=sim)

    fix, channels, _, _ = receiver_fix(load_iq(out, 8), rate,
                                       week_hint=week)
    err = np.linalg.norm(fix.xyz - truth)
    assert err < 8.0, f"position error {err:.2f} m under noise"


def test_cli_rejects_bad_noise_std(fixtures_dir):
    from gpssim_tpu import cli

    for bad in ("-1", "nan", "inf"):
        with pytest.raises(SystemExit):
            cli.main(["-e", f"{fixtures_dir}/brdc_test.22n", "-r", "null",
                      "--noise-std", bad])


def test_fleet_rejects_shared_noise_seed(fixtures_dir):
    """Direct API callers must not silently run a farm on one noise
    realization (correlated noise biases farm statistics)."""
    from gpssim_tpu.fleet import run_fleet

    cfgs = [
        _cfg(fixtures_dir, duration_sec=0.3, noise_std_lsb=2.0,
             noise_seed=7),
        _cfg(fixtures_dir, duration_sec=0.3, noise_std_lsb=2.0,
             noise_seed=7, location=LocationConfig(1.0, 2.0, 3.0)),
    ]
    with pytest.raises(ValueError, match="share noise_seed"):
        run_fleet(cfgs, sinks=[CaptureSink(), CaptureSink()])
