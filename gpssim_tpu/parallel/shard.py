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
                       wide: bool = False, out_bits: int = 16,
                       kernel: str | None = None,
                       interpret: bool | None = None):
    """jit-compiled (batched-args) → int16[B, 2*num_samples] over the mesh.

    Per-block args are sharded (blocks, chan) on their (B, C, ...) axes;
    each device accumulates its channel subset of its block subset, then
    the partial accumulators are psum'd over 'chan' — bit-identical to the
    unsharded sum — and quantized. All args are int32/uint32 (synth_jax
    limb encoding), so no x64 handling anywhere.

    ``kernel`` selects the per-device compute (default: ``"pallas-fused"``
    on TPU — the mesh path carries the production kernel at 96% of the
    direct rate, BENCH_r03 — and ``"xla"`` on CPU/GPU backends, where
    Mosaic would fall back to slow interpret mode):
      * ``"pallas"`` — the two-stage Pallas kernel
        (ops/synth_pallas.py), so the mesh path runs at the single-chip
        headline rate.  Its per-shard int16 row partials psum exactly:
        int16 truncation is a ring homomorphism Z/2^32 → Z/2^16, so the
        modular sum of per-shard casts equals the cast of the full int32
        sum (and the 8-bit ``>>4`` applies after the sum, matching
        gps.c:2841-2845's short-then-shift order).
      * ``"pallas-fused"`` — the stage-A2-in-kernel Pallas variant.
      * ``"xla"`` — the pure-XLA stage graph (no Mosaic dependency; the
        CPU-mesh scaling harness uses it compiled rather than Pallas
        interpret mode).
    ``interpret`` forces Pallas interpret mode (defaults to True on the
    CPU backend so virtual-mesh seam tests run the same code path).

    When the mesh has no channel sharding (chan == 1) no collective is
    emitted at all — asserted by tests/test_sharding.py's HLO audit.
    """
    if kernel is None:
        kernel = "pallas-fused" if jax.default_backend() == "tpu" else "xla"
    if kernel not in ("pallas", "pallas-fused", "xla"):
        raise ValueError(f"kernel={kernel!r}: expected pallas, pallas-fused,"
                         " or xla")
    chan_sharded = mesh.shape["chan"] > 1

    if kernel == "xla":
        def per_device(*args):
            i_acc, q_acc = jax.vmap(
                lambda *a: accumulate_block(*a, n_rows, wide)
            )(*args)
            if chan_sharded:
                i_acc = jax.lax.psum(i_acc, "chan")
                q_acc = jax.lax.psum(q_acc, "chan")
            return finalize_iq(i_acc, q_acc, num_samples, out_bits)
    else:
        from ..ops.synth_pallas import synth_batch_pallas_raw

        fuse_a = kernel == "pallas-fused"
        interp = (
            interpret if interpret is not None
            else jax.default_backend() == "cpu"
        )

        def per_device(*args):
            i_rows, q_rows = synth_batch_pallas_raw(
                *args, n_rows=n_rows, interpret=interp, wide=wide,
                fuse_a=fuse_a,
            )
            if chan_sharded:
                i_rows = jax.lax.psum(i_rows, "chan")
                q_rows = jax.lax.psum(q_rows, "chan")
            B = i_rows.shape[0]
            return finalize_iq(
                i_rows.reshape(B, -1)[:, :num_samples],
                q_rows.reshape(B, -1)[:, :num_samples],
                num_samples, out_bits,
            )

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=tuple(ARG_SPECS[k] for k in ARG_ORDER),
        out_specs=P("blocks", None),
        # pallas_call's out_shape carries no varying-mesh-axes annotation
        # and the chan-size-1 meshes skip the psum entirely, so the static
        # VMA checker can't infer the replication this out_spec declares;
        # replication correctness is covered by the bit-exact seam tests
        # and the compiled-HLO collective audit (tests/test_sharding.py).
        check_vma=False,
    )
    jitted = jax.jit(lambda *a: fn(*a))

    def call(batch: dict):
        return jitted(*(batch[k] for k in ARG_ORDER))

    # Exposed for the collective-audit test (tests/test_sharding.py): the
    # only cross-device collective the mesh path may emit is the chan-axis
    # psum (none at all when chan == 1).
    call.jitted = jitted
    call.kernel = kernel
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
