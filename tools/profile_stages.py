"""Per-stage device timing for the synthesis pipeline.

Times, on the real device with the bench's force-completion idiom:
  A2    — lane-SIMD packed stage A alone (row_bases_packed, jitted);
  B     — the Pallas stage-B kernel alone, fed a precomputed packed array;
  full  — the production fused dispatch (stage A2 + Pallas B in one jit).

The A2/B split tells whether fusing stage A2 INTO the Pallas kernel
(saving the (R_pad, 128) HBM round trip and the XLA<->Pallas boundary)
is worth building: if full ~= A2 + B, the boundary is free and fusion
would only relocate compute; if full >> max(A2, B) there is overhead to
reclaim.

Usage:  python tools/profile_stages.py          # on the TPU host
        BENCH_BATCH_BLOCKS=200 python tools/profile_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gpssim_tpu.config import SimConfig
    from gpssim_tpu.ops.synth_jax import LANES
    from gpssim_tpu.ops.synth_pallas import (
        TILE_R,
        _stage_b_pallas_packed,
        row_bases_packed,
    )
    from gpssim_tpu.parallel.blocks import collate_plans
    from gpssim_tpu.scenario import Simulation

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
    )
    cfg = SimConfig(
        nav_file=os.path.join(fixtures, "brdc_test.22n"),
        duration_sec=float(os.environ.get("BENCH_DURATION_SEC", "60")),
        almanac_enable=False,
    )
    plans = list(Simulation(cfg).iter_plans())
    nb = min(int(os.environ.get("BENCH_BATCH_BLOCKS", "400")), len(plans))
    batch = collate_plans(plans[:nb])
    args = {k: jax.device_put(v) for k, v in batch.args.items()}
    n_rows = -(-cfg.samples_per_epoch // LANES)
    n_rows_pad = -(-n_rows // TILE_R) * TILE_R
    num_samples = cfg.samples_per_epoch
    interp = jax.default_backend() == "cpu"

    def force(x):
        return jax.device_get(jnp.asarray(x).sum())

    def timeit(label, fn):
        force(fn())  # compile + warm
        reps = int(os.environ.get("PROFILE_REPS", "3"))
        t0 = time.perf_counter()
        for _ in range(reps):
            force(fn())
        dt = (time.perf_counter() - t0) / reps
        sps = nb * num_samples / dt
        print(f"{label:6s}: {dt*1e3:8.2f} ms/batch  ({sps/1e9:.2f} GSps)")
        return dt

    a2 = jax.jit(
        lambda cl, rl, nv, ls, cp: jax.vmap(
            lambda *a: row_bases_packed(*a, n_rows_pad)
        )(cl, rl, nv, ls, cp)
    )

    def run_a2():
        return a2(
            args["code_l"], args["carr_l"], args["nav"],
            args["lane_steps"], args["ca_packed"],
        )

    packed = jax.block_until_ready(run_a2())

    stage_b = jax.jit(
        lambda pk, ls, ga, gb: jax.vmap(
            lambda p, l, a, b: _stage_b_pallas_packed(
                p, l, a, b, interpret=interp,
            )
        )(pk, ls, ga, gb)
    )

    def run_b():
        return stage_b(
            packed, args["lane_steps"], args["gain_a"], args["gain_b"]
        )

    from gpssim_tpu.ops.synth_pallas import synth_blocks_batch_pallas

    def run_full():
        return synth_blocks_batch_pallas(
            **args, n_rows=n_rows, num_samples=num_samples, fuse_a=False
        )

    def run_fused():
        return synth_blocks_batch_pallas(
            **args, n_rows=n_rows, num_samples=num_samples, fuse_a=True
        )

    ta = timeit("A2", run_a2)
    tb = timeit("B", run_b)
    tf = timeit("full", run_full)
    tz = timeit("fused", run_fused)
    same = bool(
        (jnp.asarray(run_full()) == jnp.asarray(run_fused())).all()
    )
    print(
        f"A2+B = {1e3*(ta+tb):.2f} ms vs full = {1e3*tf:.2f} ms "
        f"(boundary/overlap delta {1e3*(ta+tb-tf):+.2f} ms); "
        f"A2 share of full: {100*ta/tf:.0f}%; "
        f"fused vs full: {tf/tz:.3f}x  bit-identical: {same}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
