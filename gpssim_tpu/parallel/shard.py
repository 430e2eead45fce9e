"""Mesh layout and sharded synthesis step.

TPU-first scaling design (replaces the reference's single-core sequential
loop + pthread FIFO, gps.c:2703-2936 / fifo.c):

* **blocks** axis — time-block parallelism. Each 0.1 s block is an
  independent closed-form computation given its plan (ops/plan.py), so a
  batch of B blocks shards over devices with no communication at all;
  block-boundary carrier phase is an O(1)-per-block host-side prefix
  (parallel/blocks.py), exchanged implicitly through the plans.
* **chan** axis — channel parallelism. The only cross-channel operation is
  the final accumulate; shard channels and `psum` the int32 accumulators
  over ICI (integer addition ⇒ the sharded result is bit-identical to the
  single-device one).

Both axes ride `shard_map` over a `jax.sharding.Mesh`; on a pod slice the
blocks axis maps to the larger mesh dimension (DCN-friendly: zero traffic)
and chan to an ICI dimension (one small psum per block).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.synth_jax import ARG_ORDER, accumulate_block, finalize_iq


def make_mesh(
    n_blocks_shards: int | None = None,
    n_chan_shards: int = 1,
    devices=None,
) -> Mesh:
    """Build a (blocks, chan) mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_blocks_shards is None:
        n_blocks_shards = devices.size // n_chan_shards
    assert n_blocks_shards * n_chan_shards == devices.size, (
        f"{n_blocks_shards}x{n_chan_shards} != {devices.size} devices"
    )
    return Mesh(
        devices.reshape(n_blocks_shards, n_chan_shards), ("blocks", "chan")
    )


def make_sharded_synth(mesh: Mesh, n_rows: int, num_samples: int,
                       wide: bool = False, out_bits: int = 16):
    """jit-compiled (batched-args) → int16[B, 2*num_samples] over the mesh.

    Per-block args are sharded (blocks, chan) on their (B, C, ...) axes;
    each device accumulates its channel subset of its block subset, then the
    int32 accumulators are psum'd over 'chan' — bit-identical to the
    unsharded sum — and quantized. All args are int32/uint32 (synth_jax
    limb encoding), so no x64 handling anywhere.
    """

    def per_device(*args):
        i_acc, q_acc = jax.vmap(
            lambda *a: accumulate_block(*a, n_rows, wide)
        )(*args)
        i_acc = jax.lax.psum(i_acc, "chan")
        q_acc = jax.lax.psum(q_acc, "chan")
        return finalize_iq(i_acc, q_acc, num_samples, out_bits)

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=tuple(ARG_SPECS[k] for k in ARG_ORDER),
        out_specs=P("blocks", None),
    )
    jitted = jax.jit(lambda *a: fn(*a))

    def call(batch: dict):
        return jitted(*(batch[k] for k in ARG_ORDER))

    return call


# Mesh partition spec per batched kernel arg (shared by the sharded synth
# and callers that pre-place inputs with jax.device_put + NamedSharding).
ARG_SPECS = {
    "code_l": P("blocks", None, "chan", None),
    "carr_l": P("blocks", None, "chan", None),
    "nav": P("blocks", None, "chan"),
    "lane_steps": P("blocks", None, "chan"),
    "ca_packed": P("blocks", "chan", None),
    "gain_a": P("blocks", "chan"),
    "gain_b": P("blocks", "chan"),
}

# Channel axis per batched arg (block axis is 0 for all of them).
_CHAN_AXIS = {
    "code_l": 2, "carr_l": 2, "nav": 2, "lane_steps": 2,
    "ca_packed": 1, "gain_a": 1, "gain_b": 1,
}


def pad_batch(batch: dict, multiple: int) -> tuple[dict, int]:
    """Pad the block axis to a multiple of the mesh's blocks dimension."""
    b = batch["gain_a"].shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return batch, 0
    out = {
        k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
        for k, v in batch.items()
    }
    return out, pad


def pad_channels(batch: dict, multiple: int) -> dict:
    """Pad the channel axis with silent channels (gain 0) so any chan-mesh
    size works; zero-gain channels contribute exactly nothing."""
    c = batch["gain_a"].shape[1]
    pad = (-c) % multiple
    if pad == 0:
        return batch
    out = {}
    for k, v in batch.items():
        widths = [(0, 0)] * v.ndim
        widths[_CHAN_AXIS[k]] = (0, pad)
        out[k] = np.pad(v, widths)
    return out
