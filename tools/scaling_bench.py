"""Weak-scaling curve on the virtual CPU mesh → SCALING.md.

Runs the sharded synthesis path at 1/2/4/8 virtual devices with FIXED
blocks per device (weak scaling) and both mesh kernels, and records
aggregate throughput + efficiency.

What this measures on a 1-core host (this rig): all N virtual devices
share one physical core, so per-device rate falls as ~1/N by
construction. The meaningful number is the AGGREGATE rate vs the
1-device run at the same per-device work: any drop below 1.0 is pure
sharding overhead (shard_map partitioning, mesh data placement, the
chan-axis psum when enabled). Real multi-chip scaling multiplies the
per-chip rate instead, because the blocks axis is traffic-free — the
HLO audit (tests/test_sharding.py) proves zero collectives on
blocks-only meshes, so there is no communication term to degrade it.

Usage:  python tools/scaling_bench.py [--blocks-per-dev 64] [--out SCALING.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", {n_dev})
import numpy as np
from jax.sharding import NamedSharding
from gpssim_tpu.config import SimConfig
from gpssim_tpu.ops.synth_jax import LANES
from gpssim_tpu.ops.synth_numpy import synth_block_numpy
from gpssim_tpu.parallel.blocks import collate_plans
from gpssim_tpu.parallel.shard import (
    ARG_SPECS, make_mesh, make_sharded_synth, pad_batch, pad_channels,
)
from gpssim_tpu.scenario import Simulation

n_dev, kernel, bpd, chan_shards = {n_dev}, {kernel!r}, {bpd}, {chan_shards}
num_samples = {num_samples}
nav = os.path.join({root!r}, "fixtures", "brdc_test.22n")
need_blocks = bpd * (n_dev // chan_shards)
cfg = SimConfig(nav_file=nav, duration_sec=0.1 * (need_blocks + 2),
                almanac_enable=False)
plans = list(Simulation(cfg).iter_plans())[:need_blocks]
for p in plans:
    p.num_samples = num_samples
n_rows = -(-num_samples // LANES)
mesh = make_mesh(n_dev // chan_shards, chan_shards)
batch = collate_plans(plans)
padded = pad_channels(batch.args, chan_shards)
padded, pad = pad_batch(padded, mesh.shape["blocks"])
fn = make_sharded_synth(mesh, n_rows, num_samples, kernel=kernel)
placed = {{
    k: jax.device_put(v, NamedSharding(mesh, ARG_SPECS[k]))
    for k, v in padded.items()
}}
out = fn(placed)
ref = np.asarray(out)[:3]
chk = np.stack([synth_block_numpy(p) for p in plans[:3]])
assert np.array_equal(ref, chk), "sharded output != reference"
reps = {reps}
t0 = time.perf_counter()
for _ in range(reps):
    float(fn(placed).sum())
dt = (time.perf_counter() - t0) / reps
print(json.dumps(dict(
    n_dev=n_dev, kernel=kernel, chan_shards=chan_shards,
    blocks=len(plans), samples=len(plans) * num_samples, sec=dt,
    sps=len(plans) * num_samples / dt,
)))
"""


def run_point(n_dev, kernel, bpd, num_samples, chan_shards=1, reps=3):
    code = RUNNER.format(
        root=ROOT, n_dev=n_dev, kernel=kernel, bpd=bpd,
        num_samples=num_samples, chan_shards=chan_shards, reps=reps,
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, cwd=ROOT,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"scaling point n_dev={n_dev} kernel={kernel} failed:\n"
            + out.stderr[-2000:]
        )
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["wall"] = time.time() - t0
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks-per-dev", type=int, default=16)
    ap.add_argument("--num-samples", type=int, default=300_000)
    ap.add_argument("--kernels", default="xla,pallas")
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(ROOT, "SCALING.md"))
    ap.add_argument("--points-file", default="/tmp/scaling_points.jsonl",
                    help="accumulate point records here (resumable runs)")
    ap.add_argument("--assemble-only", action="store_true",
                    help="write SCALING.md from the points file only")
    args = ap.parse_args()

    rows = []
    if os.path.exists(args.points_file):
        with open(args.points_file) as fp:
            rows = [json.loads(line) for line in fp if line.strip()]

    def have(n, kernel, cs):
        return any(r["n_dev"] == n and r["kernel"] == kernel
                   and r["chan_shards"] == cs for r in rows)

    def record(rec):
        rows.append(rec)
        with open(args.points_file, "a") as fp:
            fp.write(json.dumps(rec) + "\n")

    if not args.assemble_only:
        devs = [int(d) for d in args.devices.split(",")]
        kernels = args.kernels.split(",")
        for kernel in kernels:
            for n in devs:
                if have(n, kernel, 1):
                    continue
                # Pallas interpret mode on CPU is orders slower; shrink
                # its work so the curve stays runnable (noted in the
                # artifact).
                ns = args.num_samples if kernel == "xla" else 8192
                bpd = args.blocks_per_dev if kernel == "xla" else 8
                rec = run_point(n, kernel, bpd, ns, reps=args.reps)
                record(rec)
                print(f"{kernel:8s} n_dev={n}: {rec['sps']/1e6:8.1f} Msps "
                      f"aggregate", flush=True)
        # chan-sharded point: the one layout with a real collective
        if not have(8, "xla", 2):
            rec = run_point(8, "xla", args.blocks_per_dev,
                            args.num_samples, chan_shards=2,
                            reps=args.reps)
            record(rec)
            print(f"xla (4x2 chan psum): {rec['sps']/1e6:8.1f} Msps",
                  flush=True)

    # efficiency vs each kernel's 1-device point
    for r in rows:
        base = next(
            (b for b in rows
             if b["kernel"] == r["kernel"] and b["n_dev"] == 1
             and b["chan_shards"] == 1),
            None,
        )
        if r["chan_shards"] > 1:
            base = next(
                (b for b in rows
                 if b["kernel"] == r["kernel"]
                 and b["n_dev"] == r["n_dev"] and b["chan_shards"] == 1),
                base,
            )
        r["efficiency"] = r["sps"] / base["sps"] if base else float("nan")

    import datetime

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%MZ"
    )
    with open(args.out, "w") as fp:
        fp.write(f"""# SCALING — weak-scaling curve (virtual CPU mesh)

Generated by `python tools/scaling_bench.py` on {stamp}.

**How to read this.** This rig has ONE physical CPU core and no
multi-chip TPU, so the N virtual devices of the mesh share one core:
per-device rate falls as ~1/N *by construction*. The meaningful
quantity is the **aggregate** rate at fixed blocks-per-device — any
drop below the 1-device aggregate is pure sharding overhead
(shard_map partitioning + data placement + the chan psum when
chan-sharded). The blocks axis itself is **communication-free**: the
HLO audit tests (tests/test_sharding.py::test_hlo_audit_*) assert the
compiled sharded program contains ZERO cross-device collectives on
blocks-only meshes and exactly one all-reduce (the channel psum) when
chan-sharded. On real multi-chip hardware the per-chip rate is
constant over the blocks axis, so aggregate = per-chip x N with no
communication term — the ≥85% BASELINE target reduces to how evenly
blocks divide, which is exact for the padded batches used here.

| kernel | mesh | blocks/dev | aggregate Msps | efficiency vs 1-dev |
|---|---|---|---|---|
""")
        order = {"xla": 0, "pallas": 1, "pallas-fused": 2}
        for r in sorted(rows, key=lambda r: (order.get(r["kernel"], 9),
                                             r["chan_shards"], r["n_dev"])):
            cs = r["chan_shards"]
            mesh = (f"{r['n_dev']//cs}x{cs}" if cs > 1
                    else f"{r['n_dev']}x1")
            fp.write(
                f"| {r['kernel']} | {mesh} | {r['blocks']//r['n_dev']*cs} "
                f"| {r['sps']/1e6:.1f} | {r['efficiency']:.2f} |\n"
            )
        fp.write("""
Notes:
* xla rows run the full 300,000-sample production block shape; the
  pallas rows run Mosaic interpret mode (no TPU here), which is
  orders-of-magnitude slower per sample, so they use small blocks —
  their efficiency column is the meaningful part, not the Msps.
* The chan-sharded row (4x2) carries the one real collective (int
  accumulator psum); its efficiency vs the 8x1 row bounds the psum
  cost at this problem size.
* On-chip rates: see BENCH_r*.json (`mesh_1dev_msps` certifies the
  mesh path carries the production Pallas kernel at the direct rate).
""")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
