"""End-to-end run loop: scenario plans → synth backend → quantize → sink."""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

import numpy as np

from .config import CarrierMode, SimConfig, SynthBackend
from .io.sinks import Sink, make_configured_sink
from .ops.synth_numpy import quantize_iq, synth_block_numpy
from .scenario import Simulation

logger = logging.getLogger("gpssim_tpu.runner")


@dataclass
class RunStats:
    blocks: int = 0
    samples: int = 0
    wall_seconds: float = 0.0
    synth_seconds: float = 0.0
    plan_seconds: float = 0.0
    retries: int = 0  # batches re-dispatched after a device error
    failovers: int = 0  # realtime backend failovers (RealtimeSupervisor)
    failbacks: int = 0  # probed returns to the device path (DeviceProbe)
    events: list = field(default_factory=list)  # attributed runtime events
    #: seconds from the supervisor's failover decision to the first
    #: native-engine block landing at the sink (None until a failover
    #: completes its first native write) — the production recovery
    #: latency, asserted bounded in tests/test_realtime_resilience.py
    failover_latency_s: float | None = None

    @property
    def samples_per_second(self) -> float:
        return self.samples / self.wall_seconds if self.wall_seconds else 0.0

    @property
    def realtime_factor(self) -> float:
        # One block = 0.1 s of signal.
        return (self.blocks * 0.1) / self.wall_seconds if self.wall_seconds else 0.0


class RealtimeDeficitError(RuntimeError):
    """A paced realtime run fell durably below 1x and the policy is
    'fail' (or failover was impossible)."""


class RealtimeSupervisor:
    """Realtime degradation watchdog (SURVEY §5 failure detection).

    The reference's only pacing mechanism is the blocking FIFO
    (fifo.c:97-148): when the producer cannot sustain 1x the radio
    silently starves — nothing detects or reports it. Here every paced
    run is watched for a sustained production deficit (wall clock ahead
    of written signal by more than the FIFO's pre-render budget) and
    responds per ``cfg.realtime_policy``:

      * ``failover`` (default) — switch synthesis to the native
        sequential C++ engine (sequential-exact, so a strict-parity
        stream continues byte-identically) with a logged, attributed
        event; if that engine is unavailable, escalate to ``fail``.
      * ``fail`` — raise RealtimeDeficitError with the attribution.
      * ``warn`` — log and keep counting (reference behavior, plus
        attribution).

    Deficits caused by the TRANSPORT (sink FIFO full — the consumer is
    below the DAC rate) are attributed separately and never trigger a
    synthesis failover, which could not help.
    """

    #: consecutive over-threshold checks before acting when starvation is
    #: NOT imminent (one transient scheduling hiccup inside the lead band
    #: must not abandon the device path)
    GRACE_CHECKS = 2

    #: act when lag exceeds this FRACTION of the FIFO pre-render budget.
    #: The sink's pacer starves (underruns) when the lag reaches the FULL
    #: budget, so the response must land while lead remains — firing at
    #: exhaustion would mean the stream already has gaps by the time the
    #: native engine takes over (fifo.c:97-148 starves silently at the
    #: same point; the whole purpose of this watchdog is to act sooner).
    #: Grace applies to the whole (ACT_FRACTION*budget, budget) band,
    #: however fast the lag arrived there: a single transient spike from
    #: a healthy lead must not abandon the device path. Only a lag at or
    #: beyond the FULL budget — the sink is starving NOW — skips grace.
    ACT_FRACTION = 0.5

    #: a failback that fails over AGAIN within this much written signal
    #: (blocks of 0.1 s) is a flap: each flap doubles the failback probe
    #: interval (capped), so a marginal transport is probed — and risks
    #: disturbing the stream — progressively less often. A failback that
    #: survives past the window resets the interval.
    FLAP_WINDOW_BLOCKS = 300
    PROBE_BACKOFF_CAP = 8

    def __init__(self, cfg: SimConfig, sink: Sink, stats: RunStats):
        self.cfg = cfg
        self.sink = sink
        self.stats = stats
        self.policy = cfg.realtime_policy
        if self.policy not in ("failover", "fail", "warn"):
            raise ValueError(
                f"realtime_policy={self.policy!r}: expected failover, "
                "fail, or warn"
            )
        self.failed_over = False
        self._strikes = 0
        self.probe_backoff = 1
        self._last_failback_blocks: int | None = None

    def note_failback(self) -> None:
        """Record a probe-driven failback (flap accounting: the next
        failover within FLAP_WINDOW_BLOCKS doubles the probe interval)."""
        self.failed_over = False
        self._strikes = 0
        self._last_failback_blocks = self.stats.blocks

    def _event(self, msg: str) -> None:
        logger.warning("realtime: %s", msg)
        self.stats.events.append(msg)

    def check(self, t0: float, now: float | None = None) -> str | None:
        """Call after each written block/batch; returns 'failover' when
        the caller must switch synthesis to the native engine. ``now``
        overrides the clock sample for deterministic unit tests."""
        if now is None:
            now = time.perf_counter()
        lag = (now - t0) - self.stats.blocks * 0.1
        budget = 0.1 * self.cfg.fifo_depth
        if lag <= budget * self.ACT_FRACTION:
            self._strikes = 0
            return None
        self._strikes += 1
        # In-band lag (below the full budget) gets the grace window
        # regardless of its growth rate — growth measured against a
        # healthy sample is just the lag itself, so acting on it would
        # turn every one-off scheduling hiccup into an irreversible
        # failover (advisor r3). Lag >= budget is starving now: grace
        # would only add stream gaps, act on the first strike.
        if self._strikes < self.GRACE_CHECKS and lag < budget:
            return None
        self._strikes = 0
        underruns = getattr(self.sink, "underruns", 0)
        if getattr(self.sink, "backlogged", False):
            msg = (
                f"sink transport below 1x realtime: production is "
                f"{lag:.2f}s behind wall clock with the sink FIFO full "
                f"(transport cannot sustain the DAC byte rate)"
            )
            self._event(msg)
            if self.policy == "fail":
                raise RealtimeDeficitError(msg)
            return None  # a synthesis failover cannot help a slow sink
        msg = (
            f"synthesis below 1x realtime: {lag:.2f}s behind wall clock"
            + (f", {underruns} sink underruns" if underruns else "")
        )
        if self.policy == "fail":
            self._event(msg)
            raise RealtimeDeficitError(msg)
        if self.policy == "warn" or self.failed_over:
            self._event(msg)
            return None
        # failover
        from .ops.synth_seq import seq_available

        if not seq_available():
            raise RealtimeDeficitError(
                msg + "; native sequential engine unavailable, cannot "
                "fail over (tools/build_native.sh)"
            )
        if self._last_failback_blocks is not None:
            flapped = (self.stats.blocks - self._last_failback_blocks
                       < self.FLAP_WINDOW_BLOCKS)
            self.probe_backoff = (
                min(self.probe_backoff * 2, self.PROBE_BACKOFF_CAP)
                if flapped else 1
            )
        self.failed_over = True
        self.stats.failovers += 1
        self._event(
            msg + " -> failing over to the native sequential backend"
        )
        return "failover"


class DeviceProbe:
    """Failback probe (VERDICT r4 item 3: failover was one-way).

    After a RealtimeSupervisor failover, the native engine carries the
    paced stream; this probe periodically shadow-dispatches ONE window of
    upcoming plans to the device and measures dispatch→fetch wall time in
    a background thread (the probed plans are ALSO written natively, so
    the stream never depends on the probe).  A probe that completes its
    window at >= MARGIN x realtime proves the device path healthy and the
    runner fails back to the batched device pipeline — block index is the
    only state, and every backend is strict-parity-exact, so the output
    is byte-identical to an uninterrupted run either way.

    At most one probe is ever in flight: a fetch stalled on a sick
    transport must not pile further fetches onto it (concurrent streams
    measurably degrade each other on tunneled links — PERFORMANCE.md).
    """

    #: a probe window must complete at this multiple of realtime —
    #: failing back at exactly 1.0x would flap straight back into the
    #: supervisor's deficit band
    MARGIN = 2.0

    #: consecutive healthy windows required before failing back. ONE
    #: window can burst at margin on transport buffer headroom alone —
    #: the 8-stream fleet bench took its only sink underrun from exactly
    #: that false failback — so the caller launches the confirmation
    #: window back-to-back, where it cannot ride buffers the first
    #: window just drained.
    CONFIRM = 2

    def __init__(self, dispatch, window_blocks: float):
        self._dispatch = dispatch  # plans -> device value (async)
        self._window = window_blocks
        self._done: "threading.Event | None" = None
        self._dt: list = []
        self._streak = 0

    def start(self, plans) -> None:
        """Probe a window (plans are NOT consumed — the caller still
        writes them natively).

        ALL probe work — collate/pack, dispatch, fetch — runs on the
        background thread: the caller is the thread holding N paced
        streams on (possibly) one core, and even the dispatch-side host
        work stalling it for ~100 ms can underrun the pacers (measured
        on the 8-stream fleet bench). The native writers release the
        GIL inside the C engine, so the probe's NumPy/dispatch work
        interleaves instead of blocking."""
        import threading

        done = threading.Event()
        dt = self._dt = []
        dispatch = self._dispatch

        def run_probe():
            try:
                import jax

                t0 = time.perf_counter()
                out = dispatch(plans)
                jax.device_get(out)
                dt.append(time.perf_counter() - t0)
            except Exception:  # noqa: BLE001 — a dead probe is just "slow"
                pass
            finally:
                done.set()

        self._done = done
        threading.Thread(target=run_probe, daemon=True,
                         name="gpssim-failback-probe").start()

    def poll(self) -> str:
        """'idle' (no probe started / previous verdict consumed),
        'pending', 'confirm' (window healthy — start the next probe
        immediately; CONFIRM consecutive windows prove the path),
        'healthy' (confirmed — fail back), or 'slow'."""
        if self._done is None:
            return "idle"
        if not self._done.is_set():
            return "pending"
        dt = self._dt[0] if self._dt else None
        self._done = None
        if dt is not None and dt <= self._window * 0.1 / self.MARGIN:
            self._streak += 1
            if self._streak >= self.CONFIRM:
                self._streak = 0
                return "healthy"
            return "confirm"
        self._streak = 0
        return "slow"


def strict_parity_enabled(cfg: SimConfig) -> bool:
    """Whether output must replay the reference's sequential-f64 phase
    semantics exactly (parity_exact + the native engine present)."""
    if not cfg.parity_exact:
        return False
    from .ops.synth_seq import seq_available

    return seq_available()


def make_synth_fn(cfg: SimConfig):
    """Resolve the block synthesizer for the configured backend.

    Under strict parity the closed-form output of every backend is patched
    with the sparse sequential corrections (ops/synth_seq.py), so the
    written stream is bit-exact vs the reference in every configuration.
    """
    int_nco = cfg.carrier_mode is CarrierMode.INT_NCO
    strict = strict_parity_enabled(cfg)
    if cfg.backend is SynthBackend.NUMPY:
        if strict:
            from .ops.synth_seq import synth_block_seq

            return lambda plan: synth_block_seq(plan, int_nco=int_nco)
        return lambda plan: synth_block_numpy(plan, int_nco=int_nco)
    if cfg.backend is SynthBackend.NATIVE:
        from .ops.synth_seq import seq_available, synth_block_seq_native

        if not seq_available():
            raise RuntimeError(
                "native backend requires the C++ runtime "
                "(tools/build_native.sh)"
            )
        # The native hot loop IS sequential-exact — no patch layer needed.
        return lambda plan: synth_block_seq_native(plan, int_nco=int_nco)
    if cfg.backend in (SynthBackend.JAX, SynthBackend.PALLAS):
        from .ops.synth_jax import JaxBlockSynth

        synth = JaxBlockSynth(
            num_samples=cfg.samples_per_epoch,
            num_channels=cfg.num_channels,
            int_nco=int_nco,
            use_pallas=cfg.backend is SynthBackend.PALLAS,
        )
        if strict:
            from .ops.synth_seq import apply_corrections, seq_corrections

            def patched(plan):
                iq16 = np.asarray(synth(plan))
                idx, i16, q16, _, _ = seq_corrections(plan, int_nco=int_nco)
                return apply_corrections(iq16, 16, idx, i16, q16)

            return patched
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
    refresh, checkpointing); stop() → True aborts cleanly between blocks.

    Offline device runs (JAX/Pallas backend, not realtime/interactive)
    take the pipelined batched path: one jit dispatch per
    cfg.dispatch_blocks blocks, with device compute of batch k+1
    overlapped against D2H + sink write of batch k. Realtime and
    interactive runs stay block-by-block (0.1 s control latency, exactly
    the reference's cadence)."""
    if sim is None:
        sim = Simulation(cfg)
    if sink is None:
        sink = make_configured_sink(cfg)
    sink.init(cfg)

    # Device backends run the pipelined batched path. Realtime/interactive
    # runs cap the dispatch window at HALF the FIFO depth: with 2 batches
    # in flight the producer then runs at most fifo_depth blocks (0.1 s
    # each) ahead of written output — the reference's 8-buffer pipeline
    # latency (sdr.h:24) — so live position edits take effect within the
    # same bound.
    if (
        cfg.backend in (SynthBackend.JAX, SynthBackend.PALLAS)
        and cfg.dispatch_blocks > 1
    ):
        window = cfg.dispatch_blocks
        if cfg.realtime or cfg.interactive:
            window = max(1, min(window, cfg.fifo_depth // 2))
        if window > 1:
            return _run_batched(cfg, sink, sim, on_block, stop, window)

    synth_fn = make_synth_fn(cfg)
    bits = cfg.sample_format.value
    base_index = sim.next_block_index  # noise keying (resume-stable)
    if cfg.noise_std_lsb > 0.0:
        from .noise import apply_awgn

    stats = RunStats()
    supervisor = RealtimeSupervisor(cfg, sink, stats) if cfg.realtime else None
    t_act: float | None = None  # failover decision time (latency metric)
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
            blk = quantize_iq(iq16, bits)
            if cfg.noise_std_lsb > 0.0:
                blk = apply_awgn(blk, bits, cfg.noise_std_lsb,
                                 cfg.noise_seed, 0,
                                 base_index + stats.blocks)
            sink.write(blk)
            if t_act is not None and stats.failover_latency_s is None:
                stats.failover_latency_s = time.perf_counter() - t_act
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
                if supervisor.check(t0) == "failover":
                    t_act = time.perf_counter()
                    synth_fn = _native_synth_fn(cfg)
            tp = time.perf_counter()
    finally:
        sink.close()
    stats.wall_seconds = time.perf_counter() - t0
    return stats


def _native_synth_fn(cfg: SimConfig, bits: int = 16):
    """Per-block native sequential synthesizer (the failover target —
    sequential-exact, so a strict-parity stream continues byte-
    identically). bits=8 quantizes (>>4) inside the native loop."""
    from .ops.synth_seq import synth_block_seq_native

    int_nco = cfg.carrier_mode is CarrierMode.INT_NCO
    return lambda plan: synth_block_seq_native(
        plan, int_nco=int_nco, bits=bits
    )


def resolve_batch_kernel(cfg: SimConfig):
    """Batched device kernel + static call facts for a config.

    Returns (kernel, wide, n_rows, bits); shared by the pipelined runner
    below and the fleet runner (fleet.py)."""
    from .ops.synth_jax import LANES, needs_wide_window

    if cfg.backend is SynthBackend.PALLAS:
        from .ops.synth_pallas import synth_blocks_batch_pallas as kernel
    else:
        from .ops.synth_jax import synth_blocks_batch as kernel

    wide = needs_wide_window(1.0 / cfg.sample_rate)
    n_rows = -(-cfg.samples_per_epoch // LANES)
    bits = cfg.sample_format.value
    return kernel, wide, n_rows, bits


def make_packed_kernel(kernel, n_rows: int, num_samples: int, bits: int,
                       wide: bool):
    """One-transfer jitted dispatch shared by the batched runner and the
    fleet: the batch's 32-bit arg arrays ship as a single packed buffer
    (parallel.blocks.pack_args) and unpack on device inside the jit (XLA
    fuses the static slices into the kernel program — bit-exact).
    Per-array transfer LATENCY, not volume, dominates on tunneled links;
    on PCIe hosts this is neutral."""
    import jax

    from .parallel.blocks import unpack_args

    def _packed(packed, spec):
        return kernel(
            **unpack_args(packed, spec), n_rows=n_rows,
            num_samples=num_samples, out_bits=bits, wide=wide,
        )

    return jax.jit(_packed, static_argnums=1)


def fetch_batch(out, redispatch) -> tuple[np.ndarray, bool]:
    """device_get with the transient-failure retry policy (SURVEY §5).

    Deterministic failures (OOM / RESOURCE_EXHAUSTED) re-raise immediately
    — a synchronous re-run would fail identically. Anything else is
    treated as a transient device error: every block is a pure function of
    its plan, so the batch simply re-dispatches once. Returns
    (host_array, retried). Shared by the pipelined runner and fleet.py so
    the error policy stays single-sourced."""
    import jax

    try:
        return np.asarray(jax.device_get(out)), False
    except jax.errors.JaxRuntimeError as e:
        msg = str(e)
        if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg:
            raise
        return np.asarray(jax.device_get(redispatch())), True


def _run_batched(
    cfg: SimConfig, sink: Sink, sim: Simulation, on_block, stop,
    window: int | None = None,
) -> RunStats:
    """Pipelined batched device path (see run_simulation docstring).

    This is the TPU equivalent of the reference's producer/consumer FIFO
    (fifo.c): the bounded in-flight window (2 batches) is the pipeline
    depth, and jax dispatch asynchrony provides the overlap.
    """
    import itertools
    from collections import deque

    from .config import CarrierMode
    from .parallel.blocks import collate_plans, pack_args

    int_nco = cfg.carrier_mode is CarrierMode.INT_NCO
    kernel, wide, n_rows, bits = resolve_batch_kernel(cfg)
    _packed_kernel = make_packed_kernel(
        kernel, n_rows, cfg.samples_per_epoch, bits, wide
    )
    W = window if window is not None else cfg.dispatch_blocks
    strict = strict_parity_enabled(cfg)
    if strict:
        from .ops.synth_seq import apply_corrections, seq_corrections_window
    base_index = sim.next_block_index  # noise keying (resume-stable)
    if cfg.noise_std_lsb > 0.0:
        from .noise import apply_awgn
    # Channel compaction trims the channel axis to the batch's max ACTIVE
    # count — a win offline, but the active count changes at 30 s
    # reallocations, and a new channel-axis extent means a new compiled
    # shape. A mid-run recompile (minutes through a remote compile
    # service) is fatal for a paced TX, so realtime/interactive runs keep
    # the full fixed channel axis: one shape for the whole run.
    compact = not (cfg.realtime or cfg.interactive)

    from .checkpoint import capture_state

    stats = RunStats()
    supervisor = RealtimeSupervisor(cfg, sink, stats) if cfg.realtime else None
    t0 = time.perf_counter()
    it = sim.iter_plans()
    pending: deque = deque()  # (device_out, redispatch_fn, plans, snapshot)
    # Nothing written yet: a checkpoint taken before the first batch
    # drains must capture the pre-run state, not planner-ahead state.
    sim.consistent_snapshot = capture_state(sim)
    any_full = False  # a W-sized kernel shape has been compiled

    def drain_one() -> None:
        out, redispatch, done_plans, snap = pending.popleft()
        host, retried = fetch_batch(out, redispatch)  # quantized
        stats.retries += retried
        corrs = (
            seq_corrections_window(done_plans, int_nco=int_nco)
            if strict else None
        )
        for i, plan in enumerate(done_plans):
            blk = host[i]
            if strict:
                idx, i16, q16 = corrs[i]
                blk = apply_corrections(blk, bits, idx, i16, q16)
            if cfg.noise_std_lsb > 0.0:
                blk = apply_awgn(blk, bits, cfg.noise_std_lsb,
                                 cfg.noise_seed, 0,
                                 base_index + stats.blocks)
            sink.write(blk)
            stats.blocks += 1
            stats.samples += plan.num_samples
        stats.wall_seconds = time.perf_counter() - t0
        sim.consistent_snapshot = snap
        if on_block is not None:
            on_block(stats, sim, done_plans[-1])

    try:
        while True:
            ts = time.perf_counter()
            plans = list(itertools.islice(it, W))
            tp = time.perf_counter()
            stats.plan_seconds += tp - ts
            if plans:
                # Pad a short tail batch up to the already-compiled W
                # shape: a different batch size would recompile mid-run
                # (minutes through a remote compile service — fatal for
                # realtime). Padding blocks are synthesized and dropped.
                padded = plans
                if any_full and len(plans) < W:
                    padded = plans + [plans[-1]] * (W - len(plans))
                any_full = any_full or len(padded) == W
                # compact_multiple=4: 30 s reallocations drift the
                # max-active count; bucketed extents bound mid-run
                # recompiles (each minutes through a remote compile
                # service) to at most C/4 shapes.
                batch = collate_plans(padded, int_nco=int_nco,
                                      compact=compact, compact_multiple=4)
                packed, spec = pack_args(batch.args)

                def dispatch(p=packed, s=spec):
                    return _packed_kernel(p, s)  # async dispatch

                out = dispatch()
                # Snapshot NOW: sim state currently matches "all planned
                # blocks done". By the time this batch drains, the planner
                # has run ahead — hooks must see the state matching the
                # blocks actually written, or a checkpoint would skip the
                # in-flight window on resume.
                pending.append((out, dispatch, plans, capture_state(sim)))
                stats.synth_seconds += time.perf_counter() - tp
            if (not plans and pending) or len(pending) >= 2:
                drain_one()
                if cfg.realtime:
                    # Pace to wall clock with the FIFO-depth lead allowance
                    # (reference fifo backpressure, sdr.h:24).
                    ahead = stats.blocks * 0.1 - (
                        time.perf_counter() - t0
                    )
                    if ahead > 0.1 * cfg.fifo_depth:
                        time.sleep(ahead - 0.1 * cfg.fifo_depth)
                    if supervisor.check(t0) == "failover":
                        # Device path can't hold 1x. The in-flight
                        # batches' PLANS are in hand and the native
                        # engine is sequential-exact, so re-synthesize
                        # them at native speed instead of fetching the
                        # device buffers back through the very transport
                        # that just proved too slow — that fetch could
                        # itself exhaust the remaining FIFO lead. Then
                        # continue block-by-block natively, probing the
                        # device path for failback (DeviceProbe).
                        t_act = time.perf_counter()
                        stopped = _drain_pending_native(
                            cfg, sink, sim, pending, stats, t0,
                            on_block, stop, base_index, t_act,
                        )
                        if stopped:
                            return stats
                        sim.consistent_snapshot = None

                        def probe_dispatch(probe_plans):
                            padded = probe_plans + [probe_plans[-1]] * (
                                W - len(probe_plans)
                            )
                            b = collate_plans(padded, int_nco=int_nco,
                                              compact=compact,
                                              compact_multiple=4)
                            pk, sp = pack_args(b.args)
                            return _packed_kernel(pk, sp)

                        probe = (
                            DeviceProbe(probe_dispatch, W)
                            if cfg.failback_probe_sec > 0 else None
                        )
                        if not _native_until_failback(
                            cfg, sink, sim, it, stats, t0, on_block,
                            stop, base_index, t_act, supervisor, probe, W,
                        ):
                            return stats
                        # Failback: the device path held a probe window
                        # with margin — resume the batched device loop
                        # (it continues from the next unwritten plan).
                        continue
            if not plans and not pending:
                # Normal completion: live state matches the written blocks
                # again, so later checkpoints can use it directly.
                sim.consistent_snapshot = None
                break
            if stop is not None and stop():
                # Stopped with a batch in flight: keep the last drain-time
                # snapshot so a final checkpoint doesn't skip unwritten
                # blocks.
                break
    finally:
        sink.close()
    stats.wall_seconds = time.perf_counter() - t0
    return stats


def _make_native_writer(cfg: SimConfig, sink: Sink, stats: RunStats,
                        t0: float, base_index: int, t_act: float,
                        latency_stats: RunStats | None = None):
    """Per-block native synth→quantize→noise→write→stats sequence shared
    by the failover drain/continuation paths and the fleet's native tail
    (single-sourced so accounting and noise keying cannot drift between
    them). Also records failover_latency_s — decision to first native
    block at the sink — on ``latency_stats`` (defaults to ``stats``; a
    fleet passes its aggregate so the FIRST member byte defines the
    fleet's recovery latency).

    Clean 8-bit streams quantize inside the native loop (one fewer
    full-block numpy pass per 0.1 s — headroom that matters when one
    core feeds a realtime fleet); noisy/16-bit streams keep the
    quantize-then-noise order of the batched path."""
    if latency_stats is None:
        latency_stats = stats
    noisy = cfg.noise_std_lsb > 0.0
    bits = cfg.sample_format.value
    direct8 = bits == 8 and not noisy
    synth_fn = _native_synth_fn(cfg, bits=8 if direct8 else 16)
    if noisy:
        from .noise import apply_awgn

    def write_block(plan) -> None:
        ts = time.perf_counter()
        blk = np.asarray(synth_fn(plan))
        stats.synth_seconds += time.perf_counter() - ts
        if not direct8:
            blk = quantize_iq(blk, bits)
        if noisy:
            blk = apply_awgn(blk, bits, cfg.noise_std_lsb,
                             cfg.noise_seed, 0, base_index + stats.blocks)
        sink.write(blk)
        if latency_stats.failover_latency_s is None:
            latency_stats.failover_latency_s = time.perf_counter() - t_act
        stats.blocks += 1
        stats.samples += plan.num_samples
        stats.wall_seconds = time.perf_counter() - t0

    return write_block


def _drain_pending_native(
    cfg: SimConfig, sink: Sink, sim: Simulation, pending, stats: RunStats,
    t0: float, on_block, stop, base_index: int, t_act: float,
) -> bool:
    """Write the in-flight batches' blocks from the native engine at
    RealtimeSupervisor failover, leaving the device buffers unread.

    The device results would be byte-identical after strict corrections
    (the native engine IS the strict-parity reference), but fetching
    them rides the transport whose deficit may be the very reason the
    watchdog fired; native synthesis (~13x realtime/core) restores the
    sink's lead in milliseconds instead. Block accounting, noise keying,
    checkpoint snapshots, and on_block hooks match drain_one exactly.
    Returns True when stop() ended the run between batches."""
    write_block = _make_native_writer(cfg, sink, stats, t0, base_index,
                                      t_act)
    while pending:
        _out, _redispatch, done_plans, snap = pending.popleft()
        for plan in done_plans:
            write_block(plan)
        sim.consistent_snapshot = snap
        if on_block is not None:
            on_block(stats, sim, done_plans[-1])
        if stop is not None and stop():
            return True
    return False


def _native_until_failback(
    cfg: SimConfig, sink: Sink, sim: Simulation, it, stats: RunStats,
    t0: float, on_block, stop, base_index: int, t_act: float,
    supervisor: RealtimeSupervisor, probe: "DeviceProbe | None",
    window: int,
) -> bool:
    """Carry a realtime run block-by-block on the native engine after a
    RealtimeSupervisor failover, probing the device path for failback.

    Every ``cfg.failback_probe_sec`` of written signal, one window of
    upcoming plans is shadow-dispatched to the device (the plans are
    still written natively first — the stream never waits on the probe).
    Returns True when a probe proves the device path healthy (the caller
    resumes the batched device loop from the next unwritten plan) and
    False when the scenario finished or stop() ended the run.
    Stats/noise keying/pacing continue seamlessly either way; the
    caller's finally-clause closes the sink."""
    import itertools
    from collections import deque

    write_block = _make_native_writer(cfg, sink, stats, t0, base_index,
                                      t_act)
    probe_every = max(1, int(cfg.failback_probe_sec * 10
                             * supervisor.probe_backoff))
    since = 0
    buf: deque = deque()  # probed plans awaiting their native write
    while True:
        plan = buf.popleft() if buf else next(it, None)
        if plan is None:
            return False
        write_block(plan)
        if on_block is not None:
            on_block(stats, sim, plan)
        if stop is not None and stop():
            # Drain probed-but-unwritten plans first: a final checkpoint
            # captures live planner state, which must not run ahead of
            # the written blocks.
            while buf:
                write_block(buf.popleft())
            return False
        ahead = stats.blocks * 0.1 - (time.perf_counter() - t0)
        if ahead > 0.1 * cfg.fifo_depth:
            time.sleep(ahead - 0.1 * cfg.fifo_depth)
        if probe is None:
            continue
        since += 1
        verdict = probe.poll()
        if verdict == "healthy":
            supervisor.note_failback()
            stats.failbacks += 1
            msg = (
                f"device path probe held {DeviceProbe.CONFIRM} "
                f"consecutive windows at >= {DeviceProbe.MARGIN:g}x "
                "realtime -> failing back to the batched device pipeline"
            )
            logger.info("realtime: %s", msg)
            stats.events.append(msg)
            return True
        if verdict == "confirm":
            # First healthy window: launch the confirmation probe
            # back-to-back (DeviceProbe.CONFIRM) so the verdict measures
            # sustained rate, not one burst into drained buffers.
            plans = list(itertools.islice(it, window))
            if plans:
                buf.extend(plans)
                probe.start(plans)
            continue
        if verdict == "pending":
            continue  # never stack fetches on a possibly-sick transport
        if verdict == "slow":
            since = 0  # full interval before re-probing a sick path
        if since >= probe_every and not buf:
            since = 0
            plans = list(itertools.islice(it, window))
            if plans:
                buf.extend(plans)  # written natively over the next turns
                probe.start(plans)
