"""Benchmark: IQ samples/s/chip on the reference scenario, plus parity RMS.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline is the real-time factor at the reference's hard-wired 3.0 Msps
(the reference is a single-core real-time generator: 1.0 = its sustained
throughput requirement). All diagnostics go to stderr.
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

    from gpssim_tpu.config import SimConfig
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
    kernel_name = os.environ.get("BENCH_KERNEL", "pallas")
    if kernel_name == "fused":  # stage A2 computed inside the Pallas kernel
        import functools as _ft

        kernel = _ft.partial(synth_blocks_batch_pallas, fuse_a=True)
    elif kernel_name == "pallas":
        kernel = synth_blocks_batch_pallas
    elif kernel_name == "xla":
        kernel = synth_blocks_batch
    else:
        raise SystemExit(
            f"BENCH_KERNEL={kernel_name!r}: expected pallas, fused, or xla"
        )
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
        # Multi-chip: blocks sharded over all devices via shard_map; the
        # XLA kernel runs per shard (the sharded path shares its stage
        # A/B graph). Inputs are pre-placed with the mesh sharding so the
        # timed loop measures compute, not H2D.
        from jax.sharding import NamedSharding

        from gpssim_tpu.parallel.shard import (
            ARG_SPECS, make_mesh, make_sharded_synth,
        )

        mesh = make_mesh(n_blocks_shards=n_dev, n_chan_shards=1,
                         devices=devices)
        sharded = make_sharded_synth(mesh, n_rows, cfg.samples_per_epoch)
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

    t0 = time.perf_counter()
    sums = [run(b).sum() for b in dev_batches]
    checksum = sum(int(jax.device_get(s)) for s in sums)
    dt = time.perf_counter() - t0

    n_blocks = sum(b.n_blocks for b in batches)
    samples = n_blocks * cfg.samples_per_epoch
    sps = samples / dt
    log(f"{n_blocks} blocks, {samples/1e6:.0f} Msamples in {dt:.3f}s "
        f"(checksum {checksum})")

    log(f"with D2H fetch over dev tunnel: {d2h_sps/1e6:.1f} Msps")

    result = {
        "metric": "IQ samples/s/chip (3.0 Msps L1 scenario, 12 channels)",
        "value": round(sps / n_dev, 1),
        "unit": "samples/s",
        "device": f"{dev.platform} {getattr(dev, 'device_kind', '?')}",
        "vs_baseline": round(sps / n_dev / 3.0e6, 2),
        "rms_error_vs_reference_lsb16": rms,
        "bit_exact_sample_check": exact,
        # Multi-device runs go through the shard_map'd XLA path
        # regardless of BENCH_KERNEL.
        "kernel": (
            "sharded-xla" if n_dev > 1
            else kernel_name
        ),
        "blocks_per_dispatch": batch_blocks,
        "host_plan_blocks_per_s": round(len(plans) / max(plan_time, 1e-9), 1),
        "d2h_tunnel_msps": round(d2h_sps / 1e6, 1),
    }
    if n_dev > 1:
        result["n_devices"] = n_dev
        result["aggregate_samples_per_s"] = round(sps, 1)
        result["aggregate_vs_baseline"] = round(sps / 3.0e6, 2)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
