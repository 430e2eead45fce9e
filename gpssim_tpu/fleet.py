"""Fleet mode: many independent scenarios in one batched device dispatch.

A TPU-native capability with no reference counterpart: the reference's
hot loop is a stateful single-stream walk (one scenario per process,
gps.c:2767-2836), while here every block is a pure function of its plan —
so blocks from DIFFERENT scenarios batch exactly like consecutive blocks
of one scenario. One chip generates N locations'/trajectories' worth of
signal with the same kernel and the same aggregate sample rate as a
single scenario, which is useful for receiver-farm testing, coverage
studies, and multi-target TX rigs. Output is bit-identical to running
each scenario separately (asserted in tests/test_fleet.py): batching is
pure stacking on the block axis, and the strict-parity corrections are
per-plan host-side patches.

Scenarios are interleaved round-robin so every member progresses at the
same signal-time rate; members may have different durations, locations,
motion files, and ephemerides, but must share the static kernel facts
(sample rate, sample format, carrier mode, backend) — those decide the
compiled shape.
"""

from __future__ import annotations

import time
from collections import deque

import numpy as np

from .config import CarrierMode, SimConfig, SynthBackend
from .io.sinks import Sink, make_configured_sink
from .runner import (
    RunStats, fetch_batch, resolve_batch_kernel, strict_parity_enabled,
)
from .scenario import Simulation


def _check_compatible(cfgs: list[SimConfig]) -> None:
    if not cfgs:
        raise ValueError("run_fleet needs at least one scenario config")
    c0 = cfgs[0]
    if c0.backend not in (SynthBackend.JAX, SynthBackend.PALLAS):
        raise ValueError(
            "fleet mode is a batched device feature; backend must be "
            f"jax or pallas, got {c0.backend.name.lower()}"
        )
    for i, c in enumerate(cfgs):
        if c.interactive:
            raise ValueError(
                f"fleet member {i} sets interactive; mid-run command "
                "handling is per-scenario — run interactive scenarios "
                "through run_simulation"
            )
        if c.realtime != cfgs[0].realtime:
            raise ValueError(
                f"fleet member {i} disagrees with member 0 on realtime; "
                "a fleet paces as one pipeline — all members must share "
                "the flag"
            )
        for opt in ("profile_dir", "metrics_file"):
            if getattr(c, opt):
                raise ValueError(
                    f"fleet member {i} sets {opt}, which only the "
                    "single-scenario runner honors (run_app) — it would "
                    "be silently ignored here"
                )
        if c.checkpoint_file != cfgs[0].checkpoint_file:
            raise ValueError(
                f"fleet member {i} disagrees with member 0 on "
                "checkpoint_file: a fleet snapshots ALL members into ONE "
                "file (checkpoint.capture_fleet_state)"
            )
    noisy_seeds: dict[int, int] = {}
    for i, c in enumerate(cfgs):
        if c.noise_std_lsb > 0.0:
            if c.noise_seed in noisy_seeds:
                raise ValueError(
                    f"fleet members {noisy_seeds[c.noise_seed]} and {i} "
                    f"share noise_seed={c.noise_seed}: a farm must not "
                    "share one noise realization — give each noisy "
                    "member its own seed (member_configs derives "
                    "base.noise_seed + i automatically)"
                )
            noisy_seeds[c.noise_seed] = i
    for i, c in enumerate(cfgs[1:], 1):
        for field in ("sample_rate", "sample_format", "carrier_mode",
                      "backend", "parity_exact", "num_channels"):
            if getattr(c, field) != getattr(c0, field):
                raise ValueError(
                    f"fleet member {i} differs from member 0 in {field}: "
                    f"{getattr(c, field)} != {getattr(c0, field)}; these "
                    "facts select the compiled kernel shape and must match "
                    "across the fleet"
                )


def _check_distinct_targets(cfgs: list[SimConfig]) -> None:
    """Default sinks must not alias: two members writing the same file (or
    TCP destination) would truncate and interleave one stream."""
    seen: dict[tuple, int] = {}
    for i, c in enumerate(cfgs):
        if c.sink == "iqfile":
            key = ("iqfile", c.out_file)
        elif c.sink == "tcp":
            key = ("tcp", c.tcp_addr)
        else:
            continue  # null/hardware sinks have no per-member target
        if key in seen:
            raise ValueError(
                f"fleet members {seen[key]} and {i} share the same "
                f"{key[0]} target {key[1]!r}; give each member its own "
                "out_file/tcp_addr (or pass explicit sinks)"
            )
        seen[key] = i


def parse_fleet_file(path: str) -> list[tuple]:
    """Parse a fleet roster CSV: ``lat,lon,height[,out_file]`` per line,
    ``#`` comments and blank lines ignored. Returns
    [(LocationConfig, out_file | None), ...]."""
    from .config import LocationConfig

    rows = []
    with open(path) as f:
        for ln, raw in enumerate(f, 1):
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            parts = [p.strip() for p in line.split(",")]
            if len(parts) not in (3, 4):
                raise ValueError(
                    f"{path}:{ln}: expected lat,lon,height[,out_file], "
                    f"got {raw.strip()!r}"
                )
            try:
                loc = LocationConfig(
                    float(parts[0]), float(parts[1]), float(parts[2])
                )
            except ValueError:
                raise ValueError(
                    f"{path}:{ln}: non-numeric lat/lon/height in "
                    f"{raw.strip()!r}"
                ) from None
            rows.append((loc, parts[3] if len(parts) == 4 else None))
    if not rows:
        raise ValueError(f"{path}: no fleet members found")
    return rows


def member_configs(base: SimConfig, rows: list[tuple]) -> list[SimConfig]:
    """Derive one SimConfig per roster row from a base config.

    Members vary in location (and optionally out_file); everything else —
    ephemeris, duration, rates, backend — comes from the base. Default
    out_file names insert a member index before the extension, and tcp
    members take consecutive ports from the base address, so targets
    never alias."""
    import dataclasses
    import os.path

    if base.sink not in ("iqfile", "null", "tcp"):
        raise ValueError(
            f"--fleet supports the iqfile, null, and tcp sinks, not "
            f"{base.sink!r} (per-member TX hardware needs the run_fleet "
            "API with explicit sinks)"
        )
    stem, ext = os.path.splitext(base.out_file)
    if base.sink == "tcp":
        host, _, port = base.tcp_addr.rpartition(":")
        if not host or not port.isdigit():
            raise ValueError(
                f"--fleet with -r tcp needs a host:port base address to "
                f"derive member ports from, got {base.tcp_addr!r}"
            )
    cfgs = []
    for i, (loc, out) in enumerate(rows):
        extra = {}
        if base.sink == "tcp":
            # Member i streams to base port + i (one receiver per port).
            extra["tcp_addr"] = f"{host}:{int(port) + i}"
        elif out is None:
            out = f"{stem}_m{i}{ext}"
        cfgs.append(dataclasses.replace(
            base, location=loc, out_file=out if out else base.out_file,
            # Independent noise per member (a farm must not share one
            # noise realization); each member still equals a solo run
            # with the same derived seed.
            noise_seed=base.noise_seed + i,
            **extra,
        ))
    return cfgs


def _interleave_plans(sims: list[Simulation]):
    """Round-robin (member_index, plan) across live scenario planners."""
    its = [sim.iter_plans() for sim in sims]
    live = list(range(len(sims)))
    while live:
        nxt = []
        for i in live:
            plan = next(its[i], None)
            if plan is None:
                continue
            nxt.append(i)
            yield i, plan
        live = nxt


def run_fleet(
    cfgs: list[SimConfig],
    sinks: list[Sink] | None = None,
    window: int | None = None,
    on_batch=None,
    stop=None,
    mesh=None,
    sims: list[Simulation] | None = None,
) -> list[RunStats]:
    """Run N scenarios through one shared batched device pipeline.

    Each member writes its quantized stream to its own sink (defaulting to
    the sink its config names, e.g. per-member --out-file paths). Returns
    per-member RunStats; the aggregate rate is their sum. on_batch(stats)
    is called after each drained batch with the per-member stats list;
    stop() → True aborts cleanly between batches.

    With ``cfgs[0].checkpoint_file`` set, the fleet snapshots every
    member's channel_t-schema state into ONE .npz (keys mN_*): written at
    every 30 s boundary of the slowest member, and finally at return —
    always from the drain-time capture, so a snapshot never runs ahead of
    the blocks actually at the sinks. Resume by loading the file with
    checkpoint.load_fleet_checkpoint and passing the restored ``sims``
    here (the CLI does this for --fleet --resume); each member's resumed
    stream continues bit-identically (tests/test_fleet.py).

    With ``mesh`` (a (blocks, chan) jax.sharding.Mesh from
    parallel.shard.make_mesh), each fleet batch shards over the mesh —
    blocks traffic-free across devices, channels psum'd over ICI — so the
    fleet scales to a pod slice exactly like a single scenario; sharding
    is bit-identical by the same integer-sum argument.

    Realtime fleets (every member sets cfg.realtime, e.g. N paced TCP
    streams) pace the shared pipeline to wall clock on the slowest
    member's written signal time, bound each member's lead to the FIFO
    depth (the reference's 8-buffer pipeline latency, sdr.h:24), and run
    under the same RealtimeSupervisor as single scenarios: a sustained
    aggregate deficit attributed to synthesis fails the whole fleet over
    to the native sequential engine (strict-parity streams continue
    byte-identically); transport-bound deficits (some sink backlogged)
    are attributed and logged, never failed over. Supervisor events /
    failover count / failover latency are reported on member 0's stats.
    """
    import itertools

    _check_compatible(cfgs)
    from .parallel.blocks import collate_plans

    cfg0 = cfgs[0]
    int_nco = cfg0.carrier_mode is CarrierMode.INT_NCO
    kernel, wide, n_rows, bits = resolve_batch_kernel(cfg0)

    # Single-transfer dispatch, shared with runner._run_batched.
    from .parallel.blocks import pack_args
    from .runner import make_packed_kernel

    _packed_kernel = make_packed_kernel(
        kernel, n_rows, cfg0.samples_per_epoch, bits, wide
    )
    if mesh is not None:
        from .parallel.shard import make_sharded_synth, pad_batch, pad_channels

        nb, nc = mesh.shape["blocks"], mesh.shape["chan"]
        sharded = make_sharded_synth(
            mesh, n_rows, cfg0.samples_per_epoch, wide=wide, out_bits=bits
        )
    strict = strict_parity_enabled(cfg0)
    if strict:
        from .ops.synth_seq import apply_corrections, seq_corrections_window
    if any(c.noise_std_lsb > 0.0 for c in cfgs):
        from .noise import apply_awgn

    if sims is None:
        sims = [Simulation(c) for c in cfgs]
    elif len(sims) != len(cfgs):
        raise ValueError(f"{len(sims)} restored sims for {len(cfgs)} configs")
    base_index = [s.next_block_index for s in sims]  # noise keying
    if sinks is None:
        _check_distinct_targets(cfgs)
        sinks = [make_configured_sink(c) for c in cfgs]
    if len(sinks) != len(cfgs):
        raise ValueError(f"{len(sinks)} sinks for {len(cfgs)} scenarios")

    # Fleet checkpointing: drain-time snapshots of every member into one
    # file (see docstring). fsnap() captures the state matching "all
    # plans handed out so far" — consistent with the written blocks once
    # the batch it was captured with drains.
    ckpt_path = cfg0.checkpoint_file
    if ckpt_path:
        from .checkpoint import capture_fleet_state, write_state

        def fsnap():
            return capture_fleet_state(
                sims, [s.next_block_index - 1 for s in sims]
            )
    else:
        fsnap = None
    consistent = None  # last drain-time fleet snapshot
    saved = {"tick": 0}  # last 30 s-boundary tick written to disk

    # Batch width: one full round of the fleet per dispatch, or the
    # configured dispatch window if that is larger — whichever keeps the
    # device saturated. The compiled shape is fixed after the first full
    # batch; short tails are padded (and dropped) like the single-scenario
    # runner, to never recompile mid-run. Realtime fleets instead bound
    # the window so each member runs at most fifo_depth blocks ahead of
    # its written stream with 2 batches in flight (the single-scenario
    # runner's latency bound, round-robin across members).
    realtime = cfg0.realtime
    if window is not None:
        W = window
    elif realtime:
        W = len(cfgs) * max(1, cfg0.fifo_depth // 2)
    else:
        W = max(cfg0.dispatch_blocks, len(cfgs))
    if mesh is not None:
        W += (-W) % nb  # full batches divide evenly over the blocks axis

    stats = [RunStats() for _ in cfgs]
    if realtime:
        from .runner import RealtimeSupervisor

        # Blocks each member will actually produce: the PLANNER's count
        # (a motion file shorter than duration_sec trims it below
        # cfg.num_epochs, scenario.py:104-109) — a member measured
        # against the un-trimmed config total would stay "live" forever
        # after its last block and pin the fleet minimum.
        totals = [s.numd - 1 for s in sims]
        agg = RunStats()  # slowest-LIVE-member view the supervisor watches
        supervisor = RealtimeSupervisor(
            cfg0, _FleetTransportView(sinks), agg
        )
    t0 = time.perf_counter()
    it = _interleave_plans(sims)
    pending: deque = deque()  # (out, redispatch, [(member, plan)], snap)
    any_full = False
    inited = 0
    live_ok = True  # live sim state corresponds to the written blocks
    if fsnap is not None:
        consistent = fsnap()  # pre-run state for a stop-before-drain
    try:
        for c, s in zip(cfgs, sinks):
            s.init(c)
            inited += 1
        while True:
            ts = time.perf_counter()
            tagged = list(itertools.islice(it, W))
            tp = time.perf_counter()
            if tagged:
                # Planning is a shared host pass; book it on member 0 so
                # sum(st.plan_seconds) stays meaningful.
                stats[0].plan_seconds += tp - ts
                plans = [p for _, p in tagged]
                padded = plans
                if any_full and len(plans) < W:
                    padded = plans + [plans[-1]] * (W - len(plans))
                any_full = any_full or len(padded) == W
                # Bucketed compaction: a fleet mixes scenarios, so the
                # batch's max-active count varies batch to batch — every
                # distinct extent is a fresh kernel compile (minutes
                # through a remote compile service; measured dominating a
                # 50-member run). Multiple-of-4 extents bound it to ≤3
                # shapes while keeping most of the density win. Realtime
                # fleets keep the full channel axis — one compiled shape
                # for the whole run, a mid-TX recompile being fatal for
                # paced streams (same rule as the single-scenario runner).
                batch = collate_plans(padded, int_nco=int_nco,
                                      compact=not realtime,
                                      compact_multiple=4)

                if mesh is None:
                    packed, pspec = pack_args(batch.args)

                    def dispatch(p=packed, s=pspec):
                        return _packed_kernel(p, s)
                else:
                    # Short first batch (scenario set smaller than W with
                    # no later full batch): pad blocks up to the mesh
                    # multiple; padding rows are dropped at drain.
                    margs, _ = pad_batch(pad_channels(batch.args, nc), nb)

                    def dispatch(a=margs):
                        return sharded(a)

                out = dispatch()
                stats[0].synth_seconds += time.perf_counter() - tp
                pending.append(
                    (out, dispatch, tagged,
                     fsnap() if fsnap is not None else None)
                )
            if (not tagged and pending) or len(pending) >= 2:
                out, redispatch, done, snap = pending.popleft()
                host, retried = fetch_batch(out, redispatch)
                stats[0].retries += retried  # one re-dispatch, booked once
                corrs = (
                    seq_corrections_window(
                        [p for _, p in done], int_nco=int_nco
                    )
                    if strict else None
                )
                for k, (member, plan) in enumerate(done):
                    blk = host[k]
                    if strict:
                        idx, i16, q16 = corrs[k]
                        blk = apply_corrections(blk, bits, idx, i16, q16)
                    mc = cfgs[member]
                    if mc.noise_std_lsb > 0.0:
                        # Keyed per member stream so a fleet member's
                        # noisy bytes equal its solo run's.
                        blk = apply_awgn(
                            blk, bits, mc.noise_std_lsb, mc.noise_seed, 0,
                            base_index[member] + stats[member].blocks,
                        )
                    sinks[member].write(blk)
                    st = stats[member]
                    st.blocks += 1
                    st.samples += plan.num_samples
                    st.wall_seconds = time.perf_counter() - t0
                if snap is not None:
                    consistent = snap  # matches the blocks just written
                    tick = stats[0].blocks // 300
                    if tick > saved["tick"]:
                        saved["tick"] = tick
                        write_state(ckpt_path, consistent)
                if on_batch is not None:
                    on_batch(stats)
                if realtime:
                    # Pace to wall clock on the slowest LIVE member (the
                    # FIFO handles fine-grained backpressure; this guards
                    # the no-consumer case), then watchdog the aggregate.
                    # Members that already wrote their full scenario must
                    # not pin the minimum — a finished member's frozen
                    # count would otherwise grow the lag metric without
                    # bound and fire a spurious whole-fleet failover.
                    live = _live_min_blocks(stats, totals)
                    if live is not None:
                        agg.blocks = live
                        ahead = agg.blocks * 0.1 - (
                            time.perf_counter() - t0
                        )
                        if ahead > 0.1 * cfg0.fifo_depth:
                            time.sleep(ahead - 0.1 * cfg0.fifo_depth)
                    if live is not None and supervisor.check(t0) == "failover":
                        # Whole-fleet failover: re-synthesize the
                        # in-flight batches' plans natively (never fetch
                        # through the deficient path) and continue the
                        # round-robin on the native engine — exactly the
                        # single-scenario policy, N streams at once —
                        # while probing the device path for failback.
                        t_act = time.perf_counter()

                        def probe_dispatch(probe_plans):
                            padded = probe_plans + [probe_plans[-1]] * (
                                W - len(probe_plans)
                            )
                            b = collate_plans(padded, int_nco=int_nco,
                                              compact=not realtime,
                                              compact_multiple=4)
                            if mesh is None:
                                pk, sp = pack_args(b.args)
                                return _packed_kernel(pk, sp)
                            margs, _ = pad_batch(
                                pad_channels(b.args, nc), nb
                            )
                            return sharded(margs)

                        from .runner import DeviceProbe

                        # The probe window is W MEMBER-blocks, i.e.
                        # W/len(cfgs) seconds*10 of FLEET signal time —
                        # the health threshold must use fleet time, or
                        # an N-member fleet's probe is N x too lenient
                        # (a device path at 1/N of the needed rate would
                        # read "healthy"; the 8-stream bench took a sink
                        # underrun from exactly that false failback).
                        probe = (
                            DeviceProbe(probe_dispatch, W / len(cfgs))
                            if cfg0.failback_probe_sec > 0 else None
                        )
                        if fsnap is not None:
                            def tail_ckpt(blocks):
                                # Tail state is LIVE == written (callers
                                # guarantee an empty probe buffer), so a
                                # fresh capture is the drain-time-quality
                                # snapshot.
                                tick = blocks // 300
                                if tick > saved["tick"]:
                                    saved["tick"] = tick
                                    write_state(ckpt_path, fsnap())
                        else:
                            tail_ckpt = None
                        if _fleet_native_tail(
                            cfgs, sinks, pending, it, stats, agg, t0,
                            base_index, on_batch, stop, t_act, totals,
                            supervisor, probe, W, tail_ckpt,
                        ):
                            # Failback: resume the batched fleet loop.
                            continue
                        break
            if not tagged and not pending:
                break
            if stop is not None and stop():
                # Batches may be in flight: the live planners have run
                # ahead of the written blocks, so the final checkpoint
                # must come from the last drain-time snapshot.
                live_ok = False
                break
    finally:
        # End-of-stream on EVERY sink first (non-blocking): close() below
        # flushes each paced sink at the DAC rate sequentially, and a
        # later sink's pacer must not count that wait — after its own
        # final block — as underruns.
        for s in sinks[:inited]:
            s.end_stream()
        for s in sinks[:inited]:
            s.close()
    if fsnap is not None:
        # Final snapshot: live state when every handed-out plan was
        # written (normal completion / native tail), else the last
        # drain-time capture.
        write_state(ckpt_path, fsnap() if live_ok else consistent)
    wall = time.perf_counter() - t0
    for st in stats:
        if st.blocks:
            st.wall_seconds = wall
    if realtime:
        # Surface the supervisor's verdicts on member 0 (the per-member
        # stats list is the return contract).
        stats[0].events.extend(agg.events)
        stats[0].failovers += agg.failovers
        stats[0].failbacks += agg.failbacks
        if stats[0].failover_latency_s is None:
            stats[0].failover_latency_s = agg.failover_latency_s
    return stats


def _live_min_blocks(stats, totals) -> int | None:
    """Slowest LIVE member's written-block count for fleet pacing and
    lag attribution; None once every member has written its full
    scenario (nothing left to pace or watchdog)."""
    live = [st.blocks for st, tot in zip(stats, totals) if st.blocks < tot]
    return min(live) if live else None


class _FleetTransportView:
    """Aggregate sink facade for the RealtimeSupervisor: a fleet is
    transport-bound when ANY member's sink is backlogged (that stream's
    consumer is below the DAC rate — a synthesis failover cannot help),
    and its underrun count is the fleet total."""

    def __init__(self, sinks):
        self._sinks = sinks

    @property
    def backlogged(self) -> bool:
        return any(getattr(s, "backlogged", False) for s in self._sinks)

    @property
    def underruns(self) -> int:
        return sum(getattr(s, "underruns", 0) for s in self._sinks)


def _fleet_native_tail(
    cfgs, sinks, pending, it, stats, agg, t0, base_index, on_batch, stop,
    t_act, totals, supervisor, probe, window, tail_ckpt=None,
) -> bool:
    """Carry a realtime fleet on the native sequential engine after a
    supervisor failover: first the in-flight batches' plans (device
    buffers left unread), then the remaining round-robin, paced on the
    slowest member — while probing the device path for failback exactly
    like the single-scenario runner (the probed plans are still written
    natively first; at most one probe in flight). Returns True on
    failback (the caller resumes the batched fleet loop), False when
    the fleet finished or stop() ended the run.

    The per-block write path is runner's _make_native_writer — one
    writer per member, the fleet aggregate carrying the recovery
    latency — so noise keying, accounting, and the direct-int8 fast
    path cannot drift from the single-scenario failover."""
    import itertools

    from .runner import DeviceProbe, _make_native_writer

    cfg0 = cfgs[0]
    writers = [
        _make_native_writer(c, s, st, t0, bi, t_act, latency_stats=agg)
        for c, s, st, bi in zip(cfgs, sinks, stats, base_index)
    ]

    def write_one(member: int, plan) -> None:
        writers[member](plan)

    while pending:
        _out, _redispatch, done, _snap = pending.popleft()
        for member, plan in done:
            write_one(member, plan)
        if on_batch is not None:
            on_batch(stats)
        if stop is not None and stop():
            return False
    # Probe cadence in written blocks: the fleet writes N member-blocks
    # per 0.1 s of signal time.
    probe_every = max(1, int(cfg0.failback_probe_sec * 10 * len(cfgs)
                             * supervisor.probe_backoff))
    since = 0
    buf: deque = deque()  # probed (member, plan) awaiting native write
    writes = 0
    while True:
        item = buf.popleft() if buf else next(it, None)
        if item is None:
            return False
        member, plan = item
        write_one(member, plan)
        writes += 1
        if writes % len(cfgs) == 0:  # once per fleet round
            if on_batch is not None:
                on_batch(stats)
            if stop is not None and stop():
                # Drain probed-but-unwritten plans first: a final fleet
                # checkpoint captures LIVE planner state, which must not
                # run ahead of the written blocks.
                while buf:
                    m2, p2 = buf.popleft()
                    write_one(m2, p2)
                return False
            live = _live_min_blocks(stats, totals)
            if live is not None:
                ahead = live * 0.1 - (time.perf_counter() - t0)
                if ahead > 0.1 * cfg0.fifo_depth:
                    time.sleep(ahead - 0.1 * cfg0.fifo_depth)
            if tail_ckpt is not None and not buf:
                # Live state corresponds to the written blocks only when
                # no probed-but-unwritten plans are buffered.
                tail_ckpt(stats[0].blocks)
        if probe is None:
            continue
        since += 1
        verdict = probe.poll()
        if verdict == "healthy":
            supervisor.note_failback()
            agg.failbacks += 1
            agg.events.append(
                f"device path probe held {DeviceProbe.CONFIRM} "
                f"consecutive windows at >= {DeviceProbe.MARGIN:g}x "
                "realtime -> failing the fleet back to the batched "
                "device pipeline"
            )
            return True
        if verdict == "confirm":
            # First healthy window: confirm back-to-back (see the
            # single-scenario runner) so one burst into drained
            # transport buffers cannot trigger a false failback.
            tagged = list(itertools.islice(it, window))
            if tagged:
                buf.extend(tagged)
                probe.start([p for _, p in tagged])
            continue
        if verdict == "pending":
            continue
        if verdict == "slow":
            since = 0  # full interval before re-probing a sick path
        if since >= probe_every and not buf:
            since = 0
            tagged = list(itertools.islice(it, window))
            if tagged:
                buf.extend(tagged)
                probe.start([p for _, p in tagged])
