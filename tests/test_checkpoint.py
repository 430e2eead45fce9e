"""Checkpoint/resume: a restored scenario continues bit-identically."""

import numpy as np

from gpssim_tpu.checkpoint import load_checkpoint, save_checkpoint
from gpssim_tpu.config import SimConfig, SynthBackend
from gpssim_tpu.ops.synth_numpy import synth_block_numpy
from gpssim_tpu.scenario import Simulation


def _cfg(fixtures_dir, **kw):
    kw.setdefault("duration_sec", 1.2)
    return SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        almanac_enable=False,
        backend=SynthBackend.NUMPY,
        **kw,
    )


def test_resume_bit_identical(fixtures_dir, tmp_path):
    cfg = _cfg(fixtures_dir)
    sim = Simulation(cfg)

    # Straight-through run: collect all blocks.
    full = [synth_block_numpy(p) for p in sim.iter_plans()]

    # Run again, snapshot after 5 blocks, resume, finish.
    sim2 = Simulation(_cfg(fixtures_dir))
    it = sim2.iter_plans()
    head = [synth_block_numpy(next(it)) for _ in range(5)]
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(ckpt, sim2)

    cfg3, sim3 = load_checkpoint(ckpt)
    assert cfg3.nav_file == cfg.nav_file
    tail = [synth_block_numpy(p) for p in sim3.iter_plans()]

    resumed = head + tail
    assert len(resumed) == len(full)
    for a, b in zip(full, resumed):
        assert np.array_equal(a, b)


def test_checkpoint_across_30s_boundary(fixtures_dir, tmp_path):
    """Snapshot straddling the nav-regen/reallocation epoch (block 300)."""
    cfg = _cfg(fixtures_dir, duration_sec=30.4)
    sim = Simulation(cfg)
    it = sim.iter_plans()
    # consume through block 299 (plans are cheap; skip synthesis)
    for _ in range(299):
        next(it)
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(ckpt, sim)
    rest_orig = [synth_block_numpy(p) for p in it]

    _, sim2 = load_checkpoint(ckpt)
    rest_resumed = [synth_block_numpy(p) for p in sim2.iter_plans()]
    assert len(rest_orig) == len(rest_resumed) == 4
    for a, b in zip(rest_orig, rest_resumed):
        assert np.array_equal(a, b)


def test_interactive_state_round_trips(fixtures_dir, tmp_path):
    cfg = _cfg(fixtures_dir, interactive=True)
    sim = Simulation(cfg)
    sim.set_motion(bearing_deg=123.456, velocity=1.5, vertical_speed=-2.0)
    next(sim.iter_plans())
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(ckpt, sim)
    _, sim2 = load_checkpoint(ckpt)
    assert sim2.interactive.bearing_millideg == 123456.0
    assert sim2.interactive.velocity == 1.5
    assert sim2.interactive.vertical_speed == -2.0
    assert np.array_equal(sim2._xyz_prev, sim._xyz_prev)
