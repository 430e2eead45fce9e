"""Run-loop behavior: pipelined batched path, realtime pacing, hooks."""

import time

import numpy as np

from gpssim_tpu.config import SimConfig, SynthBackend
from gpssim_tpu.io.sinks import NullSink
from gpssim_tpu.runner import run_simulation


class CaptureSink(NullSink):
    def __init__(self):
        super().__init__()
        self.data = []

    def write(self, block):
        super().write(block)
        self.data.append(np.array(block))


def _cfg(fixtures_dir, **kw):
    kw.setdefault("duration_sec", 2.6)
    return SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        almanac_enable=False,
        **kw,
    )


def test_batched_pipeline_matches_blockwise(fixtures_dir):
    a = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=10),
        sink=a,
    )
    b = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=1),
        sink=b,
    )
    assert a.blocks == b.blocks == 25
    for x, y in zip(a.data, b.data):
        assert np.array_equal(x, y)


def test_batched_pipeline_low_rate_wide_window(fixtures_dir):
    """Rates below ~2.06 Msps take the 128-chip wide-window kernel; the
    pipelined batched device path must stay bit-identical to the NumPy
    f64 parity backend."""
    a = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=10,
             sample_rate=2_046_000, duration_sec=1.2),
        sink=a,
    )
    b = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.NUMPY,
             sample_rate=2_046_000, duration_sec=1.2),
        sink=b,
    )
    assert a.blocks == b.blocks == 11
    for x, y in zip(a.data, b.data):
        assert np.array_equal(x, y)


def test_realtime_batches_keep_one_kernel_shape(fixtures_dir):
    """Realtime/interactive runs must never change the compiled shape
    mid-run: channel compaction is disabled there (the active-satellite
    count changes at 30 s reallocations; a recompile stalls a paced TX).
    Output stays bit-identical — zero-gain slots contribute exactly 0."""
    import numpy as np

    from gpssim_tpu.parallel.blocks import collate_plans
    from gpssim_tpu.scenario import Simulation

    cfg = _cfg(fixtures_dir, duration_sec=0.5)
    plans = list(Simulation(cfg).iter_plans())
    # Force differing active counts across two batches.
    import copy

    p2 = [copy.deepcopy(p) for p in plans]
    for p in p2:
        on = np.flatnonzero(p.active)
        p.active[on[-1]] = False
        p.gain[on[-1]] = 0.0
    a = collate_plans(plans, compact=False)
    b = collate_plans(p2, compact=False)
    for k in a.args:
        assert a.args[k].shape == b.args[k].shape, k

    # Integration: realtime batched run == offline batched run, bit-exact,
    # AND the runner actually collates uncompacted in realtime mode (spy
    # on the compact kwarg — reverting the decision must fail here).
    from gpssim_tpu.parallel import blocks as blocks_mod

    compact_seen = []
    real_collate = blocks_mod.collate_plans

    def spy(plans, int_nco=False, compact=True, compact_multiple=1):
        compact_seen.append(compact)
        return real_collate(plans, int_nco=int_nco, compact=compact,
                            compact_multiple=compact_multiple)

    blocks_mod.collate_plans = spy
    try:
        rt = CaptureSink()
        run_simulation(
            _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=8,
                 duration_sec=0.5, realtime=True, fifo_depth=8),
            sink=rt,
        )
        assert compact_seen and not any(compact_seen), (
            "realtime batches must collate uncompacted (fixed shape)"
        )
        compact_seen.clear()
        off = CaptureSink()
        run_simulation(
            _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=8,
                 duration_sec=0.5),
            sink=off,
        )
        assert compact_seen and all(compact_seen), (
            "offline batches keep compaction"
        )
    finally:
        blocks_mod.collate_plans = real_collate
    assert rt.blocks == off.blocks > 0
    for x, y in zip(rt.data, off.data):
        assert np.array_equal(x, y)


def test_batched_on_block_and_stop(fixtures_dir):
    seen = []
    sink = CaptureSink()
    stats = run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=5),
        sink=sink,
        on_block=lambda st, sim, plan: seen.append(st.blocks),
        stop=lambda: len(seen) >= 2,
    )
    # stopped after the second drained batch
    assert stats.blocks == 10
    assert sink.blocks == 10


def test_batched_checkpoint_consistent_with_written_blocks(
    fixtures_dir, tmp_path
):
    """The pipelined planner runs ahead; a checkpoint taken from the
    drain-time snapshot must resume at exactly the next unwritten block."""
    from gpssim_tpu.checkpoint import load_checkpoint, write_state
    from gpssim_tpu.ops.synth_numpy import synth_block_numpy
    from gpssim_tpu.scenario import Simulation

    snaps = []

    def hook(stats, sim, plan):
        assert sim.consistent_snapshot is not None
        snaps.append((stats.blocks, sim.consistent_snapshot))

    sink = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=5),
        sink=sink,
        on_block=hook,
        stop=lambda: len(snaps) >= 2,
    )
    blocks_written, snap = snaps[-1]
    assert blocks_written == 10

    ckpt = str(tmp_path / "state.npz")
    write_state(ckpt, snap)
    _, sim2 = load_checkpoint(ckpt)
    assert sim2._iumd == blocks_written + 1

    # The resumed stream must continue with block 11 of a straight run.
    ref_sim = Simulation(_cfg(fixtures_dir, backend=SynthBackend.NUMPY))
    ref_plans = list(ref_sim.iter_plans())
    nxt = next(sim2.iter_plans())
    assert np.array_equal(
        synth_block_numpy(nxt), synth_block_numpy(ref_plans[blocks_written])
    )


def test_batched_transient_device_error_redispatches(fixtures_dir, monkeypatch):
    """Fault injection (SURVEY §5): a transient device failure at drain
    time re-runs the batch — every block is a pure function of its plan —
    and the output stream is unaffected."""
    import jax

    ref = CaptureSink()
    run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=10),
        sink=ref,
    )

    calls = {"n": 0}
    real = jax.device_get

    def flaky(x):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError("fake transient device loss")
        return real(x)

    monkeypatch.setattr(jax, "device_get", flaky)
    sink = CaptureSink()
    stats = run_simulation(
        _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=10),
        sink=sink,
    )
    assert stats.retries == 1
    assert sink.blocks == ref.blocks == 25
    for x, y in zip(sink.data, ref.data):
        assert np.array_equal(x, y)

    # A deterministic OOM must NOT be retried (it would re-fail).
    def oom(x):
        raise jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: out of memory")

    monkeypatch.setattr(jax, "device_get", oom)
    import pytest

    with pytest.raises(jax.errors.JaxRuntimeError, match="RESOURCE_EXHAUSTED"):
        run_simulation(
            _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=10),
            sink=CaptureSink(),
        )


def test_batched_stop_before_first_drain_checkpoints_prerun_state(
    fixtures_dir, tmp_path
):
    """A stop before any batch drains must leave a snapshot of the PRE-RUN
    state, not planner-ahead state: the final checkpoint would otherwise
    silently skip the in-flight, never-written blocks on resume."""
    from gpssim_tpu.checkpoint import load_checkpoint, write_state
    from gpssim_tpu.scenario import Simulation

    cfg = _cfg(fixtures_dir, backend=SynthBackend.JAX, dispatch_blocks=5)
    sim = Simulation(cfg)
    sink = CaptureSink()
    run_simulation(cfg, sink=sink, sim=sim, stop=lambda: True)
    # stop() fired before two batches were queued: nothing drained.
    assert sink.blocks == 0
    snap = sim.consistent_snapshot
    assert snap is not None

    ckpt = str(tmp_path / "state.npz")
    write_state(ckpt, snap)
    _, sim2 = load_checkpoint(ckpt)
    # Resume restarts at block 1 — no blocks were written.
    assert sim2._iumd == 1


def test_realtime_pacing(fixtures_dir):
    cfg = _cfg(
        fixtures_dir, duration_sec=1.6, backend=SynthBackend.NUMPY,
        realtime=True, fifo_depth=2,
    )
    t0 = time.perf_counter()
    stats = run_simulation(cfg, sink=NullSink())
    wall = time.perf_counter() - t0
    # 15 blocks = 1.5 s of signal with a 0.2 s lead allowance.
    assert stats.blocks == 15
    assert wall >= 1.5 - 0.2 - 0.05
