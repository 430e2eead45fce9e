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
