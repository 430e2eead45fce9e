"""End-to-end run loop: scenario plans → synth backend → quantize → sink."""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from .config import CarrierMode, SampleFormat, SimConfig, SynthBackend
from .io.sinks import Sink, make_sink
from .ops.synth_numpy import quantize_iq, synth_block_numpy
from .scenario import Simulation


@dataclass
class RunStats:
    blocks: int = 0
    samples: int = 0
    wall_seconds: float = 0.0
    synth_seconds: float = 0.0
    plan_seconds: float = 0.0

    @property
    def samples_per_second(self) -> float:
        return self.samples / self.wall_seconds if self.wall_seconds else 0.0

    @property
    def realtime_factor(self) -> float:
        # One block = 0.1 s of signal.
        return (self.blocks * 0.1) / self.wall_seconds if self.wall_seconds else 0.0


def make_synth_fn(cfg: SimConfig):
    """Resolve the block synthesizer for the configured backend."""
    int_nco = cfg.carrier_mode is CarrierMode.INT_NCO
    if cfg.backend is SynthBackend.NUMPY:
        return lambda plan: synth_block_numpy(plan, int_nco=int_nco)
    if cfg.backend in (SynthBackend.JAX, SynthBackend.PALLAS):
        from .ops.synth_jax import JaxBlockSynth

        synth = JaxBlockSynth(
            num_samples=cfg.samples_per_epoch,
            num_channels=cfg.num_channels,
            int_nco=int_nco,
            use_pallas=cfg.backend is SynthBackend.PALLAS,
        )
        return synth
    raise ValueError(f"unknown backend {cfg.backend}")


def run_simulation(
    cfg: SimConfig,
    sink: Sink | None = None,
    sim: Simulation | None = None,
    on_block=None,
    stop=None,
) -> RunStats:
    """Run a full scenario to the configured sink. Returns throughput stats.

    on_block(stats, sim, plan) is called after each block is written (TUI
    refresh, checkpointing); stop() → True aborts cleanly between blocks."""
    if sim is None:
        sim = Simulation(cfg)
    if sink is None:
        kwargs = {}
        if cfg.sink == "iqfile":
            kwargs = {"path": cfg.out_file, "fifo_depth": cfg.fifo_depth}
        sink = make_sink(cfg.sink, **kwargs)
    sink.init(cfg)

    synth_fn = make_synth_fn(cfg)
    bits = cfg.sample_format.value

    stats = RunStats()
    t0 = time.perf_counter()
    try:
        tp = time.perf_counter()
        for plan in sim.iter_plans():
            ts = time.perf_counter()
            stats.plan_seconds += ts - tp
            iq16 = synth_fn(plan)
            iq16 = np.asarray(iq16)
            te = time.perf_counter()
            stats.synth_seconds += te - ts
            sink.write(quantize_iq(iq16, bits))
            stats.blocks += 1
            stats.samples += plan.num_samples
            stats.wall_seconds = te - t0
            if on_block is not None:
                on_block(stats, sim, plan)
            if stop is not None and stop():
                break
            if cfg.realtime:
                # Pace to wall clock (the FIFO handles fine-grained
                # backpressure; this guards the no-consumer case).
                ahead = stats.blocks * 0.1 - (time.perf_counter() - t0)
                if ahead > 0.1 * cfg.fifo_depth:
                    time.sleep(ahead - 0.1 * cfg.fifo_depth)
            tp = time.perf_counter()
    finally:
        sink.close()
    stats.wall_seconds = time.perf_counter() - t0
    return stats
