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
