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
        if c.realtime or c.interactive:
            raise ValueError(
                f"fleet member {i} sets realtime/interactive; fleet mode "
                "is an offline bulk-generation pipeline with no pacing — "
                "run paced/interactive scenarios through run_simulation"
            )
        for opt in ("checkpoint_file", "profile_dir", "metrics_file"):
            if getattr(c, opt):
                raise ValueError(
                    f"fleet member {i} sets {opt}, which only the "
                    "single-scenario runner honors (run_app) — it would "
                    "be silently ignored here"
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
    out_file names insert a member index before the extension so targets
    never alias."""
    import dataclasses
    import os.path

    if base.sink not in ("iqfile", "null"):
        raise ValueError(
            f"--fleet supports the iqfile and null sinks, not {base.sink!r}"
            " (per-member TX hardware/streams need the run_fleet API with"
            " explicit sinks)"
        )
    stem, ext = os.path.splitext(base.out_file)
    cfgs = []
    for i, (loc, out) in enumerate(rows):
        if out is None:
            out = f"{stem}_m{i}{ext}"
        cfgs.append(dataclasses.replace(
            base, location=loc, out_file=out,
            # Independent noise per member (a farm must not share one
            # noise realization); each member still equals a solo run
            # with the same derived seed.
            noise_seed=base.noise_seed + i,
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
) -> list[RunStats]:
    """Run N scenarios through one shared batched device pipeline.

    Each member writes its quantized stream to its own sink (defaulting to
    the sink its config names, e.g. per-member --out-file paths). Returns
    per-member RunStats; the aggregate rate is their sum. on_batch(stats)
    is called after each drained batch with the per-member stats list;
    stop() → True aborts cleanly between batches.

    With ``mesh`` (a (blocks, chan) jax.sharding.Mesh from
    parallel.shard.make_mesh), each fleet batch shards over the mesh —
    blocks traffic-free across devices, channels psum'd over ICI — so the
    fleet scales to a pod slice exactly like a single scenario; sharding
    is bit-identical by the same integer-sum argument.
    """
    import itertools

    _check_compatible(cfgs)
    from .parallel.blocks import collate_plans

    cfg0 = cfgs[0]
    int_nco = cfg0.carrier_mode is CarrierMode.INT_NCO
    kernel, wide, n_rows, bits = resolve_batch_kernel(cfg0)
    if mesh is not None:
        from .parallel.shard import make_sharded_synth, pad_batch, pad_channels

        nb, nc = mesh.shape["blocks"], mesh.shape["chan"]
        sharded = make_sharded_synth(
            mesh, n_rows, cfg0.samples_per_epoch, wide=wide, out_bits=bits
        )
    strict = strict_parity_enabled(cfg0)
    if strict:
        from .ops.synth_seq import apply_corrections, seq_corrections
    if any(c.noise_std_lsb > 0.0 for c in cfgs):
        from .noise import apply_awgn

    sims = [Simulation(c) for c in cfgs]
    base_index = [s.next_block_index for s in sims]  # noise keying
    if sinks is None:
        _check_distinct_targets(cfgs)
        sinks = [make_configured_sink(c) for c in cfgs]
    if len(sinks) != len(cfgs):
        raise ValueError(f"{len(sinks)} sinks for {len(cfgs)} scenarios")

    # Batch width: one full round of the fleet per dispatch, or the
    # configured dispatch window if that is larger — whichever keeps the
    # device saturated. The compiled shape is fixed after the first full
    # batch; short tails are padded (and dropped) like the single-scenario
    # runner, to never recompile mid-run.
    W = window if window is not None else max(cfg0.dispatch_blocks, len(cfgs))
    if mesh is not None:
        W += (-W) % nb  # full batches divide evenly over the blocks axis

    stats = [RunStats() for _ in cfgs]
    t0 = time.perf_counter()
    it = _interleave_plans(sims)
    pending: deque = deque()  # (device_out, redispatch, [(member, plan)])
    any_full = False
    inited = 0
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
                # shapes while keeping most of the density win.
                batch = collate_plans(padded, int_nco=int_nco,
                                      compact_multiple=4)

                if mesh is None:
                    def dispatch(b=batch):
                        return kernel(
                            **b.args, n_rows=n_rows,
                            num_samples=b.num_samples,
                            out_bits=bits, wide=wide,
                        )
                else:
                    # Short first batch (scenario set smaller than W with
                    # no later full batch): pad blocks up to the mesh
                    # multiple; padding rows are dropped at drain.
                    margs, _ = pad_batch(pad_channels(batch.args, nc), nb)

                    def dispatch(a=margs):
                        return sharded(a)

                out = dispatch()
                stats[0].synth_seconds += time.perf_counter() - tp
                pending.append((out, dispatch, tagged))
            if (not tagged and pending) or len(pending) >= 2:
                out, redispatch, done = pending.popleft()
                host, retried = fetch_batch(out, redispatch)
                stats[0].retries += retried  # one re-dispatch, booked once
                for k, (member, plan) in enumerate(done):
                    blk = host[k]
                    if strict:
                        idx, i16, q16, _, _ = seq_corrections(
                            plan, int_nco=int_nco
                        )
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
                if on_batch is not None:
                    on_batch(stats)
            if not tagged and not pending:
                break
            if stop is not None and stop():
                break
    finally:
        for s in sinks[:inited]:
            s.close()
    wall = time.perf_counter() - t0
    for st in stats:
        if st.blocks:
            st.wall_seconds = wall
    return stats
