"""Benchmark: end-to-end and kernel IQ throughput on the reference scenario.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline is the real-time factor at the reference's hard-wired 3.0 Msps
(the reference is a single-core real-time generator: 1.0 = its sustained
throughput requirement). All diagnostics go to stderr.

Measured sections (all fields land in the JSON line):
  * kernel         — device synthesis rate, the headline (samples/s/chip);
  * mesh           — the SAME kernel through shard_map over a mesh: at
    n_dev=1 this certifies the mesh path carries the production kernel at
    the direct rate (mesh_1dev_msps); at n_dev>1 it is the scaling path;
  * e2e            — sustained plan→collate→dispatch→corrections pipeline
    rate with device compute overlapped (no bulk D2H), in the strict
    float-parity default and the --int-nco mode;
  * e2e sink       — bytes-at-sink rate through the real runner incl. the
    D2H fetch (on this rig that transport is a ~40 MB/s dev tunnel — see
    PERFORMANCE.md "End-to-end" for the decomposition).

Measured sections also include:
  * realtime device — ONE paced 3 Msps int8 TCP stream held by the
    device (Pallas) backend for >= 60 s: 6 MB/s of D2H fits even this
    rig's dev tunnel, so the recorded contract is zero underruns AND
    zero failovers on the device path itself;
  * fleet sink      — N concurrent paced TCP streams from one batched
    pipeline: aggregate bytes-at-sink at N x realtime, zero underruns
    (failing over to the native engine where the transport can't carry
    the device path — on this rig, the dev tunnel).

Env knobs: BENCH_DURATION_SEC, BENCH_BATCH_BLOCKS, BENCH_KERNEL
(pallas|fused|xla), BENCH_E2E_SEC, BENCH_E2E_WINDOW, BENCH_SINK_SEC,
BENCH_RT_SEC, BENCH_FLEET_STREAMS, BENCH_FLEET_SEC, BENCH_PLATFORM,
BENCH_CPU_DEVICES, BENCH_SKIP_E2E=1, BENCH_SKIP_RT=1,
BENCH_SKIP_FLEET=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _measure_e2e(cfg, kernel, n_rows, duration_label):
    """Sustained host-pipeline rate: plan -> collate -> dispatch ->
    sequential-parity corrections, device compute overlapped (2-deep
    in-flight window, completion forced by a scalar reduction fetch —
    bulk D2H is measured separately as the sink rate).

    This is the rate quantized bytes become AVAILABLE at when the
    transport is not the bottleneck; with the strict default it includes
    every host stage of the production runner except the sink write.
    """
    import itertools

    import jax

    from gpssim_tpu.config import CarrierMode
    from gpssim_tpu.ops.synth_seq import (
        seq_available, seq_corrections_window,
    )
    from gpssim_tpu.parallel.blocks import collate_plans
    from gpssim_tpu.runner import strict_parity_enabled
    from gpssim_tpu.scenario import Simulation

    int_nco = cfg.carrier_mode is CarrierMode.INT_NCO
    strict = strict_parity_enabled(cfg)
    sim = Simulation(cfg)
    W = int(os.environ.get("BENCH_E2E_WINDOW", "256"))
    it = sim.iter_plans()

    # One jitted call AND one H2D transfer per window: the kernel's
    # scalar reduction is fused INTO the dispatch (a separate out.sum()
    # call would be a second ~27 ms tunnel round-trip per window on this
    # rig), and the window's seven 32-bit arg arrays ship as a single
    # packed buffer unpacked on device (per-ARRAY transfer latency is
    # ~30 ms here — measured 7x worse than the volume itself; an
    # explicit per-array device_put lookahead was 3x worse still and
    # was removed).
    from gpssim_tpu.parallel.blocks import pack_args, unpack_args

    def wrapped(packed, spec):
        return kernel(**unpack_args(packed, spec), n_rows=n_rows,
                      num_samples=cfg.samples_per_epoch, out_bits=8).sum()

    wrapped = jax.jit(wrapped, static_argnums=1)

    # Warm the compile cache with one full-shape window (not timed).
    warm = list(itertools.islice(it, W))
    if len(warm) < W:
        raise SystemExit("BENCH_E2E_SEC too short for the e2e window")
    batch = collate_plans(warm, int_nco=int_nco)
    packed, spec = pack_args(batch.args)
    _ = jax.device_get(wrapped(packed, spec))

    # One-deep pipelining with a PER-WINDOW completion fetch: window k's
    # scalar is fetched after window k+1 dispatches, so its round-trip
    # rides k+1's transfer+compute. Queuing MORE windows in flight is
    # measured 4x SLOWER on this tunnel (concurrent H2D streams degrade
    # each other: 245 ms/window queued-deep vs 58 ms fetched-serially
    # vs ~40 ms at depth 1), so depth stays at one.
    t0 = time.perf_counter()
    blocks = 0
    prev = None
    t_plan = t_collate = t_corr = 0.0
    while True:
        ts = time.perf_counter()
        plans = list(itertools.islice(it, W))
        t_plan += time.perf_counter() - ts
        if not plans:
            break
        if len(plans) < W:
            plans += [plans[-1]] * (W - len(plans))
        ts = time.perf_counter()
        batch = collate_plans(plans, int_nco=int_nco)
        packed, spec = pack_args(batch.args)
        t_collate += time.perf_counter() - ts
        out = wrapped(packed, spec)  # one H2D + synth + reduce, async
        if prev is not None:
            _ = jax.device_get(prev)
        prev = out
        if strict and seq_available():
            ts = time.perf_counter()
            seq_corrections_window(plans, int_nco=int_nco)
            t_corr += time.perf_counter() - ts
        blocks += len(plans)
    if prev is not None:
        _ = jax.device_get(prev)  # completion barrier for the last window
    dt = time.perf_counter() - t0
    sps = blocks * cfg.samples_per_epoch / dt
    # Host-pipeline capacity: the measured host stages alone. The gap
    # between this and the wall number above is per-dispatch transport
    # latency (args H2D + call round trips through this rig's dev
    # tunnel, ~25 ms each) — absent on a directly-attached TPU host,
    # where the wall rate approaches min(host capacity, device rate).
    host_sps = blocks * cfg.samples_per_epoch / max(
        t_plan + t_collate + t_corr, 1e-9
    )
    log(f"e2e[{duration_label}]: {blocks} blocks in {dt:.2f}s = "
        f"{sps/1e6:.0f} Msps (strict={strict}; host stages: "
        f"plan {t_plan:.2f}s, collate {t_collate:.2f}s, corrections "
        f"{t_corr:.2f}s -> host capacity {host_sps/1e6:.0f} Msps)")
    return sps, host_sps


class _Reader:
    """Accept one TCP connection; count bytes and the streaming span."""

    def __init__(self):
        import socket
        import threading

        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.nbytes = 0
        self.t_first = self.t_last = None
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        conn, _ = self.srv.accept()
        with conn:
            while True:
                data = conn.recv(1 << 16)
                if not data:
                    return
                if self.t_first is None:
                    self.t_first = time.perf_counter()
                self.t_last = time.perf_counter()
                self.nbytes += len(data)

    def join(self):
        self._t.join(30)
        self.srv.close()


def _measure_realtime_device(nav: str) -> dict:
    """Single paced realtime TCP stream held by the DEVICE path (VERDICT
    r4 item 5): a 3 Msps int8 stream needs only 6 MB/s of D2H, which
    fits even this rig's ~40 MB/s dev tunnel — so "a PCIe host needs no
    failover" becomes a measurement here instead of an assertion.  The
    contract (sdr_iqfile.c:74 + fifo.c:97-103): every paced byte arrives
    on time — zero underruns, zero failovers, for >= 60 s of signal.
    """
    from dataclasses import replace

    from gpssim_tpu.config import SampleFormat, SimConfig, SynthBackend
    from gpssim_tpu.io.sinks import TcpSink
    from gpssim_tpu.runner import run_simulation

    sec = float(os.environ.get("BENCH_RT_SEC", "65"))
    cfg = SimConfig(
        nav_file=nav, duration_sec=sec, almanac_enable=False,
        backend=SynthBackend.PALLAS, realtime=True, sink="tcp",
        sample_format=SampleFormat.SC08,
    )
    # Warm the compile cache with the same REALTIME shapes (full channel
    # axis, fifo_depth//2 dispatch window — realtime runs never compact,
    # runner.py) — a first-compile through the remote compile service can
    # take minutes, and the paced consumer would book it as underruns.
    # policy=warn: the warm run itself must NOT fail over mid-compile
    # (that would skip the compile and defeat the warm).
    run_simulation(replace(cfg, duration_sec=1.0, sink="null",
                           realtime_policy="warn"))
    reader = _Reader()
    sink = TcpSink(addr=f"127.0.0.1:{reader.port}", fifo_depth=8,
                   pace=True, start_timeout_s=3600.0)
    t0 = time.perf_counter()
    stats = run_simulation(cfg, sink=sink)
    wall = time.perf_counter() - t0
    underruns = sink.underruns
    sink.close()
    reader.join()
    secs = stats.blocks * 0.1
    log(f"realtime device path: {secs:.0f}s of paced 3 Msps int8 signal "
        f"over TCP from the {cfg.backend.name.lower()} backend in "
        f"{wall:.1f}s wall, underruns={underruns}, "
        f"failovers={stats.failovers}, failbacks={stats.failbacks}")
    return {
        "realtime_device_underruns": underruns,
        "realtime_device_failovers": stats.failovers,
        "realtime_device_failbacks": stats.failbacks,
        "realtime_device_secs": round(secs, 1),
        "realtime_device_wall_s": round(wall, 1),
    }


def _measure_fleet_sink(nav: str, on_tpu: bool):
    """N concurrent paced TCP streams from ONE batched pipeline
    (VERDICT r3 item 5): aggregate bytes-at-sink must hold N x realtime
    with zero underruns.

    On this rig the device path's D2H rides the ~40 MB/s dev tunnel,
    which cannot carry 8 int8 streams at 3 Msps (48 MB/s) — the fleet
    supervisor detects the deficit and fails the pipeline over to the
    native sequential engine (strict-parity: byte-identical stream),
    which sustains the fleet from one host core. On a PCIe-attached
    production host the device path carries it directly and no failover
    fires. Either way the recorded contract is the same: every paced
    byte arrives on time.
    """
    from gpssim_tpu.config import (
        CarrierMode, LocationConfig, SampleFormat, SimConfig,
        SynthBackend,
    )
    from gpssim_tpu.fleet import run_fleet
    from gpssim_tpu.io.sinks import TcpSink

    n = int(os.environ.get("BENCH_FLEET_STREAMS", "8"))
    sec = float(os.environ.get("BENCH_FLEET_SEC", "12"))

    # int-NCO carrier: ALSO bit-exact vs the reference (its
    # non-FLOAT_CARR_PHASE build) and the documented recommendation for
    # realtime fleets on small hosts — the native engine this rig's
    # post-failover fleet rides runs 17x realtime in int-NCO vs 13.6x
    # float, and 8 full-rate streams need the margin on ONE core
    # (PERFORMANCE.md "Fleet mode").
    cfgs = [
        SimConfig(
            nav_file=nav, duration_sec=sec, almanac_enable=False,
            realtime=True, fifo_depth=8, sink="tcp",
            sample_format=SampleFormat.SC08,
            carrier_mode=CarrierMode.INT_NCO,
            backend=(SynthBackend.PALLAS if on_tpu else SynthBackend.JAX),
            location=LocationConfig(35.0 + 0.1 * i, 139.0 + 0.1 * i, 10.0),
        )
        for i in range(n)
    ]
    readers = [_Reader() for _ in range(n)]
    # start_timeout covers the first kernel compile: through the remote
    # compile service this can take tens of minutes on a bad day, and a
    # paced consumer giving up its start barrier would book the wait as
    # underruns.
    sinks = [
        TcpSink(addr=f"127.0.0.1:{r.port}", fifo_depth=8, pace=True,
                start_timeout_s=3600.0)
        for r in readers
    ]
    t0 = time.perf_counter()
    stats = run_fleet(cfgs, sinks=sinks)
    wall = time.perf_counter() - t0
    underruns = sum(s.underruns for s in sinks)
    for s, r in zip(sinks, readers):
        s.close()
        r.join()
    agg_bytes = sum(r.nbytes for r in readers)
    # Steady-state aggregate = each stream's bytes over ITS paced
    # streaming span (first byte -> last byte), summed. The wall number
    # additionally charges pipeline startup (kernel compile + the
    # pre-render fill) to the rate; both are recorded.
    agg_sps = sum(
        r.nbytes / 2 / max(r.t_last - r.t_first, 1e-9)
        for r in readers if r.t_first is not None
    )
    agg_wall_sps = agg_bytes / 2 / wall
    blocks = sum(st.blocks for st in stats)
    log(f"fleet sink: {n} paced TCP streams, {blocks} blocks, "
        f"{agg_bytes/1e6:.0f} MB at sinks = {agg_sps/1e6:.1f} Msps "
        f"aggregate over the streaming span ({agg_sps/3e6:.1f}x RT, "
        f"target {n}x; {agg_wall_sps/1e6:.1f} Msps incl. the "
        f"{wall:.1f}s wall with startup), underruns={underruns}, "
        f"failovers={stats[0].failovers}, "
        f"failover_latency={stats[0].failover_latency_s}")
    return {
        "fleet_sink_streams": n,
        "fleet_sink_agg_msps": round(agg_sps / 1e6, 1),
        "fleet_sink_x_rt": round(agg_sps / 3e6, 2),
        "fleet_sink_wall_msps": round(agg_wall_sps / 1e6, 1),
        "fleet_sink_underruns": underruns,
        "fleet_sink_failovers": stats[0].failovers,
        "failover_latency_ms": (
            round(stats[0].failover_latency_s * 1e3, 1)
            if stats[0].failover_latency_s is not None else None
        ),
    }


def main() -> None:
    import jax

    # Test hook: BENCH_PLATFORM=cpu BENCH_CPU_DEVICES=8 exercises the
    # multi-device sharded path on a virtual CPU mesh (the axon
    # sitecustomize overrides JAX_PLATFORMS, so set it via jax.config
    # before any backend init).
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    if os.environ.get("BENCH_CPU_DEVICES"):
        jax.config.update(
            "jax_num_cpu_devices", int(os.environ["BENCH_CPU_DEVICES"])
        )
    # Persistent compile cache (same policy as app.run_app): the paced
    # realtime sections create fresh jit instances inside run_simulation,
    # so without this their warm runs compile one executable and the
    # timed runs compile it AGAIN — ~2.5 s of startup deficit that a
    # DAC-paced pipeline never claws back (measured: it tripped the
    # supervisor on an otherwise-healthy device path).
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        cache = os.path.expanduser("~/.cache/gpssim-tpu-xla")
        os.makedirs(cache, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5
            )
        except Exception:
            pass  # older jax or already-initialized backend

    # Fail FAST if the device backend is unreachable: jax.devices() can
    # block indefinitely while the axon tunnel is down (observed this
    # round: backend init hung 25+ min before erroring UNAVAILABLE), and
    # a hung bench is worse for the artifact pipeline than a clean,
    # attributable failure. Probe in a subprocess with a hard deadline.
    if os.environ.get("BENCH_SKIP_DEVICE_PROBE", "0") != "1":
        import subprocess

        probe_env = dict(os.environ)
        probe = (
            "import os, jax\n"
            "p = os.environ.get('BENCH_PLATFORM')\n"
            "if p: jax.config.update('jax_platforms', p)\n"
            "print(jax.devices()[0].platform)\n"
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", probe], env=probe_env,
                capture_output=True, text=True, timeout=240,
            )
        except subprocess.TimeoutExpired:
            raise SystemExit(
                "bench: device backend probe timed out after 240 s — "
                "the TPU tunnel is down; not starting a bench that "
                "would hang. (BENCH_SKIP_DEVICE_PROBE=1 overrides.)"
            )
        if proc.returncode != 0:
            raise SystemExit(
                "bench: device backend probe failed:\n"
                + proc.stderr[-2000:]
            )
        log(f"device probe: {proc.stdout.strip()} backend reachable")

    from gpssim_tpu.config import CarrierMode, SimConfig
    from gpssim_tpu.ops.synth_jax import LANES, synth_blocks_batch
    from gpssim_tpu.ops.synth_numpy import synth_block_numpy
    from gpssim_tpu.ops.synth_pallas import synth_blocks_batch_pallas
    from gpssim_tpu.parallel.blocks import collate_plans
    from gpssim_tpu.scenario import Simulation

    fixtures = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    nav = os.path.join(fixtures, "brdc_test.22n")
    if not os.path.exists(nav):
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join("tools", "make_fixtures.py")], check=True
        )

    devices = jax.devices()
    n_dev = len(devices)
    dev = devices[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}"
        + (f" x{n_dev}" if n_dev > 1 else ""))

    duration = float(os.environ.get("BENCH_DURATION_SEC", "180"))
    batch_blocks = int(os.environ.get("BENCH_BATCH_BLOCKS", "800"))
    if n_dev > 1:
        # Shard the blocks axis over every chip (zero cross-device
        # traffic; see parallel/shard.py). Keep batches divisible.
        batch_blocks -= batch_blocks % n_dev

    cfg = SimConfig(nav_file=nav, duration_sec=duration, almanac_enable=False)
    sim = Simulation(cfg)
    n_rows = -(-cfg.samples_per_epoch // LANES)

    # ---- plan the whole scenario (host) ----
    t0 = time.perf_counter()
    plans = list(sim.iter_plans())
    plan_time = time.perf_counter() - t0
    log(f"planned {len(plans)} blocks in {plan_time:.2f}s "
        f"({len(plans)/max(plan_time,1e-9):.0f} blocks/s host)")

    # ---- throughput: batched device synthesis, steady state ----
    # Completion is forced with an on-device reduction + scalar fetch per
    # batch: block_until_ready through the axon dev relay does not reliably
    # wait, and a full D2H fetch measures the dev tunnel (~40 MB/s), not
    # the chip.
    kernel_name = os.environ.get(
        "BENCH_KERNEL", "fused" if on_tpu else "xla"
    )
    import functools as _ft

    if kernel_name == "fused":  # stage A2 computed inside the Pallas kernel
        kernel = _ft.partial(synth_blocks_batch_pallas, fuse_a=True)
    elif kernel_name == "pallas":  # two-stage: XLA stage A2 + Pallas B
        kernel = _ft.partial(synth_blocks_batch_pallas, fuse_a=False)
    elif kernel_name == "xla":
        kernel = synth_blocks_batch
    else:
        raise SystemExit(
            f"BENCH_KERNEL={kernel_name!r}: expected pallas, fused, or xla"
        )
    shard_kernel = {
        "pallas": "pallas", "fused": "pallas-fused", "xla": "xla",
    }[kernel_name]
    # Short scenarios: dispatch what exists (keep device divisibility).
    if batch_blocks > len(plans):
        batch_blocks = len(plans) - len(plans) % n_dev
    if batch_blocks < 1:
        raise SystemExit(
            f"scenario too short: {len(plans)} blocks cannot fill "
            f"{n_dev} devices (raise BENCH_DURATION_SEC)"
        )
    batches = [
        collate_plans(plans[i : i + batch_blocks])
        for i in range(0, len(plans) - len(plans) % batch_blocks, batch_blocks)
    ]
    if n_dev > 1:
        # Multi-chip: blocks sharded over all devices via shard_map,
        # carrying the SELECTED kernel (the production Pallas kernel on
        # TPU). Inputs are pre-placed with the mesh sharding so the timed
        # loop measures compute, not H2D.
        from jax.sharding import NamedSharding

        from gpssim_tpu.parallel.shard import (
            ARG_SPECS, make_mesh, make_sharded_synth,
        )

        mesh = make_mesh(n_blocks_shards=n_dev, n_chan_shards=1,
                         devices=devices)
        sharded = make_sharded_synth(mesh, n_rows, cfg.samples_per_epoch,
                                     kernel=shard_kernel)
        dev_batches = [
            {
                k: jax.device_put(v, NamedSharding(mesh, ARG_SPECS[k]))
                for k, v in b.args.items()
            }
            for b in batches
        ]

        def run(b):
            return sharded(b)

    else:
        dev_batches = [
            {k: jax.device_put(v) for k, v in b.args.items()} for b in batches
        ]

        def run(b):
            return kernel(
                **b, n_rows=n_rows, num_samples=cfg.samples_per_epoch
            )

    # warmup / compile (the one kernel shape used throughout), and fetch the
    # first batch for the parity check + D2H rate measurement
    log("compiling kernel (remote compile service may take minutes)...")
    out0 = run(dev_batches[0])
    _ = jax.device_get(out0.sum())  # wait out compile + execution
    t0 = time.perf_counter()
    host0 = jax.device_get(out0)
    d2h_dt = time.perf_counter() - t0
    d2h_sps = batches[0].n_blocks * cfg.samples_per_epoch / d2h_dt

    # Parity: RMS vs the float64 reference path (which is bit-exact vs the
    # C simulator; see tests/test_golden.py) on the first 3 blocks.
    ref0 = np.stack([synth_block_numpy(p) for p in plans[:3]])
    d = host0[:3].astype(np.float64) - ref0.astype(np.float64)
    rms = float(np.sqrt(np.mean(d * d)))
    exact = bool(np.array_equal(host0[:3], ref0))
    log(f"parity: rms={rms:.3e} LSB16, bit-exact={exact}")

    # 3 timed passes amortize this rig's ~27 ms device round-trip per
    # scalar fetch (2-batch scenarios would otherwise carry one RTT per
    # 0.17 s of compute in the measurement).
    reps = int(os.environ.get("BENCH_REPS", "3"))
    t0 = time.perf_counter()
    checksum = 0
    for _ in range(reps):
        sums = [run(b).sum() for b in dev_batches]
        checksum = sum(int(jax.device_get(s)) for s in sums)
    dt = time.perf_counter() - t0

    n_blocks = sum(b.n_blocks for b in batches)
    samples = reps * n_blocks * cfg.samples_per_epoch
    sps = samples / dt
    n_blocks *= reps
    log(f"{n_blocks} blocks, {samples/1e6:.0f} Msamples in {dt:.3f}s "
        f"(checksum {checksum})")

    log(f"with D2H fetch over dev tunnel: {d2h_sps/1e6:.1f} Msps")

    # ---- mesh path at n_dev=1: certify the sharded path carries the
    # production kernel at the direct rate (VERDICT r2 item 1) ----
    mesh_sps = None
    if n_dev == 1 and on_tpu:
        from gpssim_tpu.parallel.shard import make_mesh, make_sharded_synth

        mesh1 = make_mesh(1, 1, devices=devices)
        sharded1 = make_sharded_synth(
            mesh1, n_rows, cfg.samples_per_epoch, kernel=shard_kernel
        )
        out_m = sharded1(dev_batches[0])
        _ = jax.device_get(out_m.sum())  # compile + run
        assert np.array_equal(
            np.asarray(jax.device_get(out_m))[:3], host0[:3]
        ), "mesh path output != direct kernel output"
        t0 = time.perf_counter()
        for _ in range(reps):
            msums = [sharded1(b).sum() for b in dev_batches]
            _ = [int(jax.device_get(s)) for s in msums]
        mdt = time.perf_counter() - t0
        mesh_sps = samples / mdt
        log(f"mesh path (1-device, kernel={shard_kernel}): "
            f"{mesh_sps/1e6:.0f} Msps = {100*mesh_sps/sps:.0f}% of direct")

    # ---- end-to-end host pipeline (plan -> dispatch -> corrections) ----
    e2e_sps = e2e_nco_sps = sink_sps = None
    if os.environ.get("BENCH_SKIP_E2E", "0") != "1":
        e2e_sec = float(os.environ.get("BENCH_E2E_SEC", "120"))
        cfg_e2e = SimConfig(nav_file=nav, duration_sec=e2e_sec,
                            almanac_enable=False)
        e2e_sps, e2e_host = _measure_e2e(
            cfg_e2e, kernel, n_rows, "strict-float"
        )
        cfg_nco = SimConfig(nav_file=nav, duration_sec=e2e_sec,
                            almanac_enable=False,
                            carrier_mode=CarrierMode.INT_NCO)
        e2e_nco_sps, e2e_nco_host = _measure_e2e(
            cfg_nco, kernel, n_rows, "int-nco"
        )

        # Bytes-at-sink through the real runner (includes the D2H fetch;
        # on this rig that is the ~40 MB/s axon dev tunnel, so this number
        # measures the transport, not the framework — recorded for
        # honesty, decomposed in PERFORMANCE.md).
        from gpssim_tpu.config import SynthBackend
        from gpssim_tpu.io.sinks import NullSink
        from gpssim_tpu.runner import run_simulation

        sink_sec = float(os.environ.get("BENCH_SINK_SEC", "20"))
        cfg_sink = SimConfig(
            nav_file=nav, duration_sec=sink_sec, almanac_enable=False,
            backend=(SynthBackend.PALLAS if on_tpu else SynthBackend.JAX),
            dispatch_blocks=50,
        )
        sink = NullSink()
        st = run_simulation(cfg_sink, sink=sink)
        sink_sps = st.samples_per_second
        log(f"e2e bytes-at-sink (incl. D2H transport): "
            f"{sink_sps/1e6:.1f} Msps over {st.blocks} blocks")

    # ---- single-stream realtime, DEVICE path (VERDICT r4 item 5) ----
    rt_device = None
    if on_tpu and os.environ.get("BENCH_SKIP_RT", "0") != "1":
        rt_device = _measure_realtime_device(nav)

    fleet_sink = None
    if os.environ.get("BENCH_SKIP_FLEET", "0") != "1":
        fleet_sink = _measure_fleet_sink(nav, on_tpu)

    result = {
        "metric": "IQ samples/s/chip (3.0 Msps L1 scenario, 12 channels)",
        "value": round(sps / n_dev, 1),
        "unit": "samples/s",
        "device": f"{dev.platform} {getattr(dev, 'device_kind', '?')}",
        "vs_baseline": round(sps / n_dev / 3.0e6, 2),
        "rms_error_vs_reference_lsb16": rms,
        "bit_exact_sample_check": exact,
        "kernel": kernel_name if n_dev == 1 else f"sharded-{shard_kernel}",
        "blocks_per_dispatch": batch_blocks,
        "host_plan_blocks_per_s": round(len(plans) / max(plan_time, 1e-9), 1),
        "d2h_tunnel_msps": round(d2h_sps / 1e6, 1),
    }
    if mesh_sps is not None:
        result["mesh_1dev_msps"] = round(mesh_sps / 1e6, 1)
        result["mesh_vs_direct"] = round(mesh_sps / sps, 3)
    if e2e_sps is not None:
        result["e2e_strict_msps"] = round(e2e_sps / 1e6, 1)
        result["e2e_strict_host_msps"] = round(e2e_host / 1e6, 1)
        result["e2e_int_nco_msps"] = round(e2e_nco_sps / 1e6, 1)
        result["e2e_int_nco_host_msps"] = round(e2e_nco_host / 1e6, 1)
        result["e2e_sink_msps"] = round(sink_sps / 1e6, 1)
    if rt_device is not None:
        result.update(rt_device)
    if fleet_sink is not None:
        result.update(fleet_sink)
    if n_dev > 1:
        result["n_devices"] = n_dev
        result["aggregate_samples_per_s"] = round(sps, 1)
        result["aggregate_vs_baseline"] = round(sps / 3.0e6, 2)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
