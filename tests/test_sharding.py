"""Seam tests: sharded multi-device synthesis must be bit-identical to the
sequential single-device path (and therefore to the reference).

Runs on the 8-device virtual CPU topology from conftest.
"""

import numpy as np
import pytest

from gpssim_tpu.config import SimConfig
from gpssim_tpu.ops.synth_numpy import synth_block_numpy
from gpssim_tpu.scenario import Simulation


@pytest.fixture(scope="module")
def plans(fixtures_dir):
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=0.9,
        almanac_enable=False,
    )
    return list(Simulation(cfg).iter_plans())


def _reference(plans):
    return np.stack([synth_block_numpy(p) for p in plans])


def test_collate_compact_multiple_buckets_and_is_bit_exact(plans):
    """Bucketed compaction: extents round up to the multiple (bounding
    distinct compiled shapes), and the synthesized output stays
    bit-identical — padded slots carry gain 0 and contribute exact +0."""
    import jax
    from gpssim_tpu.ops.synth_jax import LANES, synth_blocks_batch
    from gpssim_tpu.parallel.blocks import collate_plans

    tight = collate_plans(plans)
    C_full = plans[0].gain.shape[0]
    for m in (4, 8):
        b = collate_plans(plans, compact_multiple=m)
        k = b.args["gain_a"].shape[1]
        assert k % m == 0 or k == C_full
        assert k >= tight.args["gain_a"].shape[1]
        n_rows = -(-b.num_samples // LANES)
        dev_args = {key: jax.device_put(v) for key, v in b.args.items()}
        out = synth_blocks_batch(
            **dev_args, n_rows=n_rows, num_samples=b.num_samples,
        )
        assert np.array_equal(np.asarray(out), _reference(plans))
    # A multiple larger than the channel count caps at the full axis.
    b = collate_plans(plans, compact_multiple=64)
    assert b.args["gain_a"].shape[1] == C_full


def test_batched_vmap_matches(plans):
    import jax
    from gpssim_tpu.ops.synth_jax import LANES, synth_blocks_batch
    from gpssim_tpu.parallel.blocks import collate_plans

    batch = collate_plans(plans)
    n_rows = -(-batch.num_samples // LANES)
    dev_args = {k: jax.device_put(v) for k, v in batch.args.items()}
    out = synth_blocks_batch(
        **dev_args, n_rows=n_rows, num_samples=batch.num_samples,
    )
    assert np.array_equal(np.asarray(out), _reference(plans))


@pytest.mark.parametrize("blocks_shards,chan_shards", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_mesh_bit_identical(plans, blocks_shards, chan_shards):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gpssim_tpu.ops.synth_jax import LANES
    from gpssim_tpu.parallel.blocks import collate_plans
    from gpssim_tpu.parallel.shard import (
        make_mesh, make_sharded_synth, pad_batch, pad_channels,
    )

    mesh = make_mesh(blocks_shards, chan_shards)
    batch = collate_plans(plans)
    n_rows = -(-batch.num_samples // LANES)
    fn = make_sharded_synth(mesh, n_rows, batch.num_samples)
    padded, pad = pad_batch(pad_channels(batch.args, chan_shards), blocks_shards)
    out = np.asarray(fn(padded))
    if pad:
        out = out[:-pad]
    assert np.array_equal(out, _reference(plans))


@pytest.fixture(scope="module")
def tiny_plans(fixtures_dir):
    """Short-block plans for the (slow) Pallas interpret-mode mesh tests."""
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=0.9,
        almanac_enable=False,
    )
    plans = list(Simulation(cfg).iter_plans())
    for p in plans:
        p.num_samples = 512
    return plans


@pytest.mark.parametrize("blocks_shards,chan_shards", [(8, 1), (4, 2), (2, 4)])
@pytest.mark.parametrize("kernel", ["pallas", "pallas-fused"])
def test_sharded_mesh_pallas_bit_identical(
    tiny_plans, blocks_shards, chan_shards, kernel
):
    """The PRODUCTION Pallas kernel must ride the mesh bit-exactly — both
    the blocks axis (no traffic) and the chan axis (int16 psum of partial
    accumulators, exact because int16 truncation commutes with modular
    addition). Interpret mode on the CPU mesh; the chip path is certified
    by bench.py's mesh_1dev measurement and dryrun_multichip."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gpssim_tpu.ops.synth_jax import LANES
    from gpssim_tpu.parallel.blocks import collate_plans
    from gpssim_tpu.parallel.shard import (
        make_mesh, make_sharded_synth, pad_batch, pad_channels,
    )

    num = tiny_plans[0].num_samples
    mesh = make_mesh(blocks_shards, chan_shards)
    batch = collate_plans(tiny_plans)
    n_rows = -(-num // LANES)
    fn = make_sharded_synth(mesh, n_rows, num, kernel=kernel)
    padded, pad = pad_batch(
        pad_channels(batch.args, chan_shards), blocks_shards
    )
    out = np.asarray(fn(padded))
    if pad:
        out = out[:-pad]
    assert np.array_equal(out, _reference(tiny_plans))


@pytest.mark.parametrize("chan_shards,out_bits", [(2, 8), (4, 8)])
def test_sharded_mesh_pallas_8bit_quantize_after_psum(
    tiny_plans, chan_shards, out_bits
):
    """8-bit output: the >>4 must apply AFTER the chan psum (the reference
    shifts the full short accumulator, gps.c:2841-2845) — shifting the
    partials first would lose carry bits."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gpssim_tpu.ops.synth_jax import LANES
    from gpssim_tpu.ops.synth_numpy import quantize_iq
    from gpssim_tpu.parallel.blocks import collate_plans
    from gpssim_tpu.parallel.shard import (
        make_mesh, make_sharded_synth, pad_batch, pad_channels,
    )

    num = tiny_plans[0].num_samples
    mesh = make_mesh(8 // chan_shards, chan_shards)
    batch = collate_plans(tiny_plans)
    n_rows = -(-num // LANES)
    fn = make_sharded_synth(
        mesh, n_rows, num, out_bits=out_bits, kernel="pallas"
    )
    padded, pad = pad_batch(
        pad_channels(batch.args, chan_shards), 8 // chan_shards
    )
    out = np.asarray(fn(padded))
    if pad:
        out = out[:-pad]
    ref = np.stack(
        [quantize_iq(synth_block_numpy(p), out_bits) for p in tiny_plans]
    )
    assert out.dtype == np.int8
    assert np.array_equal(out, ref)


_COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "all-to-all", "collective-permute",
    "reduce-scatter", "collective-broadcast", "partition-id", "replica-id",
)


def _collectives_in_hlo(fn, batch_args):
    """Collective op names appearing in the compiled HLO of a sharded
    synth fn (built by make_sharded_synth, which exposes .jitted)."""
    from gpssim_tpu.parallel.shard import ARG_SPECS  # noqa: F401

    from gpssim_tpu.ops.synth_jax import ARG_ORDER

    args = tuple(batch_args[k] for k in ARG_ORDER)
    hlo = fn.jitted.lower(*args).compile().as_text()
    found = set()
    for line in hlo.splitlines():
        for op in _COLLECTIVE_OPS:
            # Opcode occurrences look like "... = s16[...] all-reduce(...";
            # ssa names like %all-reduce.1 are followed by ".N", never "(".
            if f" {op}(" in line:
                found.add(op)
    return found


@pytest.mark.parametrize("kernel", ["xla", "pallas"])
def test_hlo_audit_no_collectives_without_chan_sharding(tiny_plans, kernel):
    """blocks-only meshes must emit ZERO cross-device collectives: the
    blocks axis is communication-free by construction (SURVEY §2.3), so
    scaling over it is embarrassingly parallel at any device count."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gpssim_tpu.ops.synth_jax import LANES
    from gpssim_tpu.parallel.blocks import collate_plans
    from gpssim_tpu.parallel.shard import (
        make_mesh, make_sharded_synth, pad_batch,
    )

    num = tiny_plans[0].num_samples
    mesh = make_mesh(8, 1)
    batch = collate_plans(tiny_plans)
    padded, _ = pad_batch(batch.args, 8)
    fn = make_sharded_synth(mesh, -(-num // LANES), num, kernel=kernel)
    assert _collectives_in_hlo(fn, padded) == set()


@pytest.mark.parametrize("kernel", ["xla", "pallas"])
def test_hlo_audit_chan_sharding_only_psum(tiny_plans, kernel):
    """chan-sharded meshes may emit exactly one collective kind: the
    all-reduce realizing the channel psum (int accumulator sum)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gpssim_tpu.ops.synth_jax import LANES
    from gpssim_tpu.parallel.blocks import collate_plans
    from gpssim_tpu.parallel.shard import (
        make_mesh, make_sharded_synth, pad_batch, pad_channels,
    )

    num = tiny_plans[0].num_samples
    mesh = make_mesh(4, 2)
    batch = collate_plans(tiny_plans)
    padded, _ = pad_batch(pad_channels(batch.args, 2), 4)
    fn = make_sharded_synth(mesh, -(-num // LANES), num, kernel=kernel)
    found = _collectives_in_hlo(fn, padded)
    assert "all-reduce" in found, "chan psum must be present"
    assert found <= {"all-reduce"}, f"unexpected collectives: {found}"
