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


# ---------------------------------------------------------------------------
# Fleet checkpoint/resume (VERDICT r4 item 4): one .npz snapshots every
# member; a killed fleet run resumes with every member's remaining
# stream byte-identical to an uninterrupted run.
# ---------------------------------------------------------------------------


def _fleet_cfgs(fixtures_dir, tmp_path, stem, n=2, **kw):
    import dataclasses

    from gpssim_tpu.config import LocationConfig

    import dataclasses as _dc

    base = _dc.replace(
        _cfg(fixtures_dir, duration_sec=kw.pop("duration_sec", 6.0),
             dispatch_blocks=8, **kw),
        backend=SynthBackend.JAX,
    )
    return [
        dataclasses.replace(
            base,
            location=LocationConfig(35.0 + 0.3 * i, 139.0, 10.0),
            out_file=str(tmp_path / f"{stem}{i}.bin"),
        )
        for i in range(n)
    ]


def _run_fleet_interrupted(cfgs, ckpt, batches=3):
    """Run a checkpointed fleet, stopping cleanly after N drained
    batches; returns the per-member stats."""
    import dataclasses

    from gpssim_tpu.fleet import run_fleet

    cfgs = [dataclasses.replace(c, checkpoint_file=ckpt) for c in cfgs]
    seen = {"batches": 0}

    def on_batch(stats):
        seen["batches"] += 1

    return run_fleet(
        cfgs, on_batch=on_batch, stop=lambda: seen["batches"] >= batches
    )


def _resume_and_check(fixtures_dir, tmp_path, ckpt, full_cfgs, stats_head,
                      head_stem):
    import dataclasses

    from gpssim_tpu.checkpoint import load_fleet_checkpoint
    from gpssim_tpu.fleet import run_fleet

    cfgs_r, sims, blocks = load_fleet_checkpoint(ckpt)
    assert list(blocks) == [st.blocks for st in stats_head]
    for i, c in enumerate(cfgs_r):
        c.out_file = str(tmp_path / f"tail{i}.bin")
        c.checkpoint_file = None
    run_fleet(cfgs_r, sims=sims)

    for i, full in enumerate(full_cfgs):
        whole = np.fromfile(full.out_file, dtype=np.int8)
        head = np.fromfile(
            str(tmp_path / f"{head_stem}{i}.bin"), dtype=np.int8
        )
        tail = np.fromfile(str(tmp_path / f"tail{i}.bin"), dtype=np.int8)
        block_bytes = 2 * full.samples_per_epoch
        assert head.size == blocks[i] * block_bytes, f"member {i} head"
        joined = np.concatenate([head, tail])
        assert joined.size == whole.size, f"member {i} size"
        assert np.array_equal(joined, whole), f"member {i} bytes"


def test_fleet_checkpoint_resume_bit_identical(fixtures_dir, tmp_path):
    from gpssim_tpu.fleet import run_fleet

    # 1.03 Msps keeps the three fleet runs (full, head, tail) and their
    # compiled programs small — same code path, ~1/3 the samples.
    kw = dict(duration_sec=4.0, sample_rate=1_030_000)
    full = _fleet_cfgs(fixtures_dir, tmp_path, "full", **kw)
    run_fleet(full)  # uninterrupted reference streams

    head = _fleet_cfgs(fixtures_dir, tmp_path, "head", **kw)
    ckpt = str(tmp_path / "fleet.npz")
    stats = _run_fleet_interrupted(head, ckpt)
    assert all(0 < st.blocks < full[0].num_epochs - 1 for st in stats)
    _resume_and_check(fixtures_dir, tmp_path, ckpt, full, stats, "head")


def test_fleet_checkpoint_resume_realtime(fixtures_dir, tmp_path):
    """The same kill/resume contract holds for a paced realtime fleet
    (low rate so the virtual-CPU device path keeps up)."""
    from gpssim_tpu.fleet import run_fleet

    kw = dict(sample_rate=1_030_000, realtime=True, fifo_depth=8)
    full = _fleet_cfgs(fixtures_dir, tmp_path, "rtfull", duration_sec=4.0,
                       **kw)
    run_fleet(full)

    head = _fleet_cfgs(fixtures_dir, tmp_path, "rthead", duration_sec=4.0,
                       **kw)
    ckpt = str(tmp_path / "rtfleet.npz")
    stats = _run_fleet_interrupted(head, ckpt, batches=2)
    assert all(0 < st.blocks < full[0].num_epochs - 1 for st in stats)
    _resume_and_check(fixtures_dir, tmp_path, ckpt, full, stats, "rthead")


def test_fleet_checkpoint_loader_type_guards(fixtures_dir, tmp_path):
    import pytest

    from gpssim_tpu.checkpoint import (
        is_fleet_checkpoint, load_fleet_checkpoint,
    )

    cfg = _cfg(fixtures_dir)
    sim = Simulation(cfg)
    next(sim.iter_plans())
    single = str(tmp_path / "single.npz")
    save_checkpoint(single, sim)
    assert not is_fleet_checkpoint(single)
    with pytest.raises(ValueError, match="single-scenario"):
        load_fleet_checkpoint(single)

    from gpssim_tpu.checkpoint import capture_fleet_state, write_state

    fleet = str(tmp_path / "fleet.npz")
    write_state(fleet, capture_fleet_state([sim], [1]))
    assert is_fleet_checkpoint(fleet)
    with pytest.raises(ValueError, match="FLEET"):
        load_checkpoint(fleet)
