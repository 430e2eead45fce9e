"""Synthesis kernel equivalence: JAX integer kernel vs NumPy f64 parity path."""

import numpy as np
import pytest

from gpssim_tpu.config import CarrierMode, SimConfig
from gpssim_tpu.ops.synth_numpy import quantize_iq, synth_block_numpy
from gpssim_tpu.scenario import Simulation


@pytest.fixture(scope="module")
def sim_plans(fixtures_dir):
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=1.5,
        almanac_enable=False,
    )
    sim = Simulation(cfg)
    return list(sim.iter_plans())


def test_jax_kernel_bit_exact(sim_plans):
    from gpssim_tpu.ops.synth_jax import JaxBlockSynth

    synth = JaxBlockSynth(num_samples=sim_plans[0].num_samples, num_channels=12)
    for plan in sim_plans:
        a = synth_block_numpy(plan)
        b = synth(plan)
        assert np.array_equal(a, b)


def test_jax_kernel_int_nco(fixtures_dir):
    from gpssim_tpu.ops.synth_jax import JaxBlockSynth

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=1.0,
        almanac_enable=False,
        carrier_mode=CarrierMode.INT_NCO,
    )
    sim = Simulation(cfg)
    synth = JaxBlockSynth(
        num_samples=cfg.samples_per_epoch, num_channels=12, int_nco=True
    )
    for plan in sim.iter_plans():
        a = synth_block_numpy(plan, int_nco=True)
        b = synth(plan)
        assert np.array_equal(a, b)


@pytest.mark.parametrize("rate", [1_060_000, 1_200_000, 2_046_000,
                                  2_600_000, 10_000_000])
def test_sample_rate_configurable(fixtures_dir, rate):
    """The reference is hard-wired to 3.0 Msps (sdr.h:21); the framework
    makes rate a parameter (BASELINE.md note), including rates where
    samples/epoch is not a multiple of 128 and rates below ~2.06 Msps
    (gps-sdr-sim's 2.046/1.023-family), where a 128-lane row spans more
    than 64 chips and stage A statically switches to the 128-chip
    four-word window (synth_jax.needs_wide_window).

    At ≤2.6 Msps the integer kernel is bit-identical to the f64 path. At
    10 Msps (1 M samples/block) the f64 closed form's own rounding
    (~phase*2^-53) and the Q53 step rounding (~n*2^-54) can land a LUT
    index astride a boundary for a handful of samples; each such event is
    a sub-ns carrier-timing jitter whose value error is bounded by the
    table slope (~2pi*250/512 per index step), the same contract the
    golden suite enforces (test_golden.assert_parity)."""
    from gpssim_tpu.ops.synth_jax import JaxBlockSynth

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=0.3,
        almanac_enable=False,
        sample_rate=rate,
    )
    sim = Simulation(cfg)
    synth = JaxBlockSynth(num_samples=cfg.samples_per_epoch, num_channels=12)
    for plan in sim.iter_plans():
        assert plan.num_samples == rate // 10
        a = synth_block_numpy(plan)
        b = synth(plan)
        if rate <= 2_600_000:  # incl. the wide-window (<2.06 Msps) path
            assert np.array_equal(a, b)
        else:
            d = np.abs(a.astype(np.int32) - b.astype(np.int32))
            assert d.max() <= 4  # one LUT index step * gain
            assert (d != 0).mean() < 1e-5
            assert float(np.sqrt(np.mean(d.astype(np.float64) ** 2))) < 0.01


def test_rate_fuzz_kernel_vs_numpy(fixtures_dir):
    """Seeded random sample rates spanning both window modes: the integer
    kernel must stay within the parity contract vs the f64 path at ANY
    rate — bit-exact at reference-scale blocks (≤3.0 Msps, ≤300k
    samples), the golden-suite tolerance above."""
    import random

    from gpssim_tpu.ops.synth_jax import JaxBlockSynth

    rng = random.Random(20260817)
    rates = [10 * rng.randrange(103_000, 600_000) for _ in range(6)]
    for rate in rates:
        cfg = SimConfig(
            nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.2,
            almanac_enable=False, sample_rate=rate,
        )
        sim = Simulation(cfg)
        synth = JaxBlockSynth(
            num_samples=cfg.samples_per_epoch, num_channels=12
        )
        for plan in sim.iter_plans():
            a = synth_block_numpy(plan)
            b = synth(plan)
            if rate <= 3_000_000:
                assert np.array_equal(a, b), rate
            else:
                d = np.abs(a.astype(np.int32) - b.astype(np.int32))
                assert d.max() <= 4 and (d != 0).mean() < 1e-5, rate


def test_lut_poly_matches_tables():
    """The folded degree-9 polynomial must reproduce ALL 512 entries of
    both reference carrier tables exactly (gps.c:145-213)."""
    import jax.numpy as jnp

    from gpssim_tpu.core.constants import COS_TABLE_512, SIN_TABLE_512
    from gpssim_tpu.ops.synth_jax import lut_mag_neg

    idx = jnp.arange(512, dtype=jnp.int32)
    ta_s, neg_s, ta_c, neg_c = (np.asarray(v) for v in lut_mag_neg(idx))
    sin_v = np.where(neg_s, -ta_s, ta_s)
    cos_v = np.where(neg_c, -ta_c, ta_c)
    assert np.array_equal(sin_v, np.array(SIN_TABLE_512))
    assert np.array_equal(cos_v, np.array(COS_TABLE_512))


def test_pallas_kernel_bit_exact(sim_plans):
    """Fused Pallas stage B (interpret mode on CPU) vs the parity path."""
    import jax

    from gpssim_tpu.ops.synth_jax import LANES
    from gpssim_tpu.ops.synth_pallas import synth_blocks_batch_pallas
    from gpssim_tpu.parallel.blocks import collate_plans

    plans = sim_plans[:3]
    n_rows = -(-plans[0].num_samples // LANES)
    batch = collate_plans(plans)
    out = np.asarray(jax.device_get(synth_blocks_batch_pallas(
        **batch.args, n_rows=n_rows, num_samples=batch.num_samples,
    )))
    ref = np.stack([synth_block_numpy(p) for p in plans])
    assert np.array_equal(out, ref)


def test_stage_a2_packed_bit_identical():
    """Lane-SIMD stage A2 (row_bases_packed) must equal the reference
    (R, C) stage A packed by pack_row_bases, lane for lane, in every
    layout: narrow/wide window, the q1/q2 row-digit levels, and the full
    16-channel lane budget."""
    import jax
    import jax.numpy as jnp

    from gpssim_tpu.ops.synth_jax import _row_bases, args_from_arrays
    from gpssim_tpu.ops.synth_pallas import pack_row_bases, row_bases_packed

    rng = np.random.default_rng(11)
    cases = [
        (False, 12, 2368, 300_000, 1 / 3.0e6),   # fast path, q1 digits
        (True, 12, 192, 20_000, 1 / 1.2e6),      # wide 4-word window
        (False, 12, 4224, 520_000, 1 / 6.0e6),   # q2 digit level (>4096)
        (False, 16, 128, 15_000, 1 / 3.0e6),     # full 16-channel lanes
        (True, 16, 128, 15_000, 1 / 1.2e6),      # 8 planes x 16 = 128
    ]
    for wide, C, n_rows, nspc, delt in cases:
        act = np.ones(C, bool)
        act[-2:] = False  # inactive slots must stay silent/identical
        f_code = 1.023e6 * (1 + rng.uniform(-3e-6, 3e-6, C))
        args = args_from_arrays(
            act, rng.uniform(0, 1023, C), f_code, rng.uniform(0, 1, C),
            rng.uniform(-5000, 5000, C), np.zeros(C, np.int64),
            np.zeros(C, np.int64), rng.uniform(50, 300, C),
            rng.integers(0, 29, C), rng.integers(0, 19, C),
            rng.integers(0, 19, C), rng.integers(1, 33, C),
            (rng.integers(0, 1 << 30, (C, 60)).astype(np.uint32) << 2),
            nspc, delt,
        )
        kw = {
            k: jnp.asarray(v)
            for k, v in args.items()
            if k not in ("gain_a", "gain_b")
        }
        a = (kw["code_l"], kw["carr_l"], kw["nav"], kw["lane_steps"],
             kw["ca_packed"])
        ref = np.asarray(pack_row_bases(
            jax.jit(_row_bases, static_argnames=("n_rows", "wide"))(
                *a, n_rows=n_rows, wide=wide
            ),
            n_rows, wide,
        ))
        new = np.asarray(
            jax.jit(row_bases_packed, static_argnames=("n_rows", "wide"))(
                *a, n_rows=n_rows, wide=wide
            )
        )
        assert np.array_equal(ref, new), (wide, C, n_rows)


def test_quantize_8bit_shift():
    x = np.array([-2048, -17, -16, -1, 0, 15, 16, 2047], dtype=np.int16)
    q = quantize_iq(x, 8)
    assert q.dtype == np.int8
    # C arithmetic >>4 rounds toward -inf
    assert q.tolist() == [-128, -2, -1, -1, 0, 0, 1, 127]


def test_inactive_channels_silent(sim_plans):
    plan = sim_plans[0]
    plan2 = type(plan)(**{**plan.__dict__})
    plan2.active = np.zeros_like(plan.active)
    out = synth_block_numpy(plan2)
    assert np.all(out == 0)


def test_carr_phase_chaining(sim_plans):
    # Block-end phase equals frac(start + N*step) for active channels.
    p = sim_plans[0]
    end = p.end_carr_phase()
    man = p.carr_phase + p.num_samples * (p.f_carr * p.delt)
    man -= np.floor(man)
    assert np.allclose(end[p.active], man[p.active])
    assert np.all((end >= 0) & (end < 1))


def test_q44_gain_screen_catches_boundary_gain(fixtures_dir):
    """args_from_arrays screens trunc(T*gainQ44) against f64 trunc for
    every distinct LUT magnitude; a gain placing a product within 2^-44
    of an integer (here 250*g = 100+1e-13 -> Q44 truncates to 99) must
    raise instead of silently corrupting device output."""
    from gpssim_tpu.config import SimConfig
    from gpssim_tpu.ops.synth_jax import plan_to_args
    from gpssim_tpu.scenario import Simulation

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.3,
        almanac_enable=False,
    )
    plan = next(Simulation(cfg).iter_plans())
    plan_to_args(plan)  # physical gains pass

    bad = type(plan)(**{**plan.__dict__})
    g = bad.gain.copy()
    g[np.argmax(bad.active)] = (100.0 + 1e-13) / 250.0
    bad.gain = g
    with pytest.raises(ValueError, match="Q44"):
        plan_to_args(bad)


def test_pallas_fused_stage_a_bit_identical():
    """The GPSSIM_FUSE_A variant (stage A2 recomputed inside the Pallas
    kernel from the per-block plane stack) must produce the exact bytes
    of the two-stage path, narrow and wide window."""
    import jax

    from gpssim_tpu.ops.synth_jax import args_from_arrays
    from gpssim_tpu.ops.synth_pallas import synth_blocks_batch_pallas

    rng = np.random.default_rng(23)
    cases = [
        (False, 12, 128, 15_000, 1 / 3.0e6),
        (True, 12, 128, 15_000, 1 / 1.2e6),
    ]
    for wide, C, n_rows, nspc, delt in cases:
        act = np.ones(C, bool)
        act[-2:] = False
        f_code = 1.023e6 * (1 + rng.uniform(-3e-6, 3e-6, C))
        args = args_from_arrays(
            act, rng.uniform(0, 1023, C), f_code, rng.uniform(0, 1, C),
            rng.uniform(-5000, 5000, C), np.zeros(C, np.int64),
            np.zeros(C, np.int64), rng.uniform(50, 300, C),
            rng.integers(0, 29, C), rng.integers(0, 19, C),
            rng.integers(0, 19, C), rng.integers(1, 33, C),
            (rng.integers(0, 1 << 30, (C, 60)).astype(np.uint32) << 2),
            nspc, delt,
        )
        batched = {k: np.asarray(v)[None] for k, v in args.items()}
        a = np.asarray(jax.device_get(synth_blocks_batch_pallas(
            **batched, n_rows=n_rows, num_samples=nspc, wide=wide,
            fuse_a=False,
        )))
        b = np.asarray(jax.device_get(synth_blocks_batch_pallas(
            **batched, n_rows=n_rows, num_samples=nspc, wide=wide,
            fuse_a=True,
        )))
        assert np.array_equal(a, b), (wide, C)
