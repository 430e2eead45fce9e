"""Block-boundary state propagation and batched plan collation.

The reference carries per-channel NCO state sequentially through 24 h of
signal (gps.h:218-233). Here the cross-block state reduces to the carrier
phase, whose per-block update is an O(1) affine map — so block-start states
for a whole window of epochs come from a cheap host-side prefix pass, and
every block in the window synthesizes concurrently (the "sequence parallel"
axis of this workload; see SURVEY §5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops.plan import BlockPlan
from ..ops.synth_jax import args_from_arrays


def chain_carrier_phases(
    carr0: np.ndarray, f_carr: np.ndarray, num_samples: int, delt: float
) -> np.ndarray:
    """Block-start carrier phases for a window of epochs via prefix sum.

    carr0: f64[C] phase at the window start; f_carr: f64[E, C] per-epoch
    Doppler. Returns f64[E, C] start phases. frac() after an f64 cumsum
    matches per-block chaining to ~1e-13/block — far below the 1/512 LUT
    quantum (same argument as ops/plan.py).
    """
    adv = f_carr * (num_samples * delt)
    starts = carr0[None, :] + np.concatenate(
        [np.zeros((1, adv.shape[1])), np.cumsum(adv[:-1], axis=0)], axis=0
    )
    return starts - np.floor(starts)


@dataclass
class PlanBatch:
    """A window of consecutive block plans collated for device dispatch."""

    args: dict  # batched kernel args, leading axis = blocks
    num_samples: int
    n_blocks: int


def pack_args(args: dict) -> tuple[np.ndarray, tuple]:
    """Flatten a batch's kernel args into ONE int32 array (B, K).

    Every collated arg is 32-bit with a leading blocks axis, so the whole
    window ships to the device as a single contiguous transfer. On links
    where per-transfer latency dominates volume (this rig's dev tunnel
    charges ~30 ms per array, 7 arrays/window), one transfer instead of
    seven is the difference between a dispatch-bound and a host-bound
    pipeline; on a PCIe host it is simply one fewer degree of freedom.
    Returns (packed, spec) where spec is the static layout for
    :func:`unpack_args` (hashable: name, dtype str, trailing shape).
    """
    parts, spec = [], []
    for k in sorted(args):
        v = np.asarray(args[k])
        if v.dtype.itemsize != 4:
            raise ValueError(f"pack_args: {k} is not 32-bit ({v.dtype})")
        B = v.shape[0]
        parts.append(v.view(np.int32).reshape(B, -1))
        spec.append((k, v.dtype.str, v.shape[1:]))
    return np.concatenate(parts, axis=1), tuple(spec)


def unpack_args(packed, spec: tuple) -> dict:
    """Device-side inverse of :func:`pack_args` (jnp, traceable).

    Slices are static (spec is a compile-time constant), so XLA fuses the
    unpack into the consuming kernel program; uint32 fields are bitcast
    back losslessly.
    """
    import jax.numpy as jnp
    from jax import lax

    out, off = {}, 0
    B = packed.shape[0]
    for k, dtype_str, shape in spec:
        n = 1
        for s in shape:
            n *= s
        sl = packed[:, off:off + n]
        if np.dtype(dtype_str) == np.uint32:
            sl = lax.bitcast_convert_type(sl, jnp.uint32)
        out[k] = sl.reshape((B,) + tuple(shape))
        off += n
    return out


def collate_plans(
    plans: list[BlockPlan], int_nco: bool = False, compact: bool = True,
    compact_multiple: int = 1,
) -> PlanBatch:
    """Stack plans and convert to kernel args in one vectorized pass.

    With ``compact`` (default), each block's ACTIVE channels are moved to
    the front and the channel axis is trimmed to the batch's maximum
    active count: the kernel's channel loop is fully dense instead of
    computing zero-gain slots (typically 9-11 of 12 are active). The
    cross-channel sum is exact int32 addition — commutative and
    associative — so reordering/trimming is bit-identical.

    ``compact_multiple`` rounds the trimmed extent UP to a multiple
    (capped at the full channel count): every distinct extent is a new
    compiled kernel shape, so long-running pipelines whose active count
    drifts across 30 s reallocations — and fleets mixing scenarios —
    pass 4 to bound recompiles to at most C/4 shapes while keeping most
    of the density win.
    """

    def f(name):
        return np.stack([getattr(p, name) for p in plans], axis=0)

    fields = dict(
        active=f("active"), code_phase=f("code_phase"), f_code=f("f_code"),
        carr_phase=f("carr_phase"), f_carr=f("f_carr"),
        carr_phase_i=f("carr_phase_i"), carr_step_i=f("carr_step_i"),
        gain=f("gain"), iword=f("iword"), ibit=f("ibit"), icode=f("icode"),
        prn=f("prn"), dwrd=f("dwrd"),
    )
    if compact:
        act = fields["active"]
        k = max(1, int(act.sum(axis=1).max()))
        if compact_multiple > 1:
            k = min(-(-k // compact_multiple) * compact_multiple,
                    act.shape[1])
        # Stable order with active slots first, per block.
        order = np.argsort(~act, axis=1, kind="stable")[:, :k]
        for name, v in fields.items():
            idx = order
            if v.ndim == 3:  # dwrd (B, C, 60)
                idx = order[..., None]
            fields[name] = np.take_along_axis(v, idx, axis=1)

    args = args_from_arrays(
        fields["active"], fields["code_phase"], fields["f_code"],
        fields["carr_phase"], fields["f_carr"], fields["carr_phase_i"],
        fields["carr_step_i"], fields["gain"], fields["iword"],
        fields["ibit"], fields["icode"], fields["prn"], fields["dwrd"],
        plans[0].num_samples, plans[0].delt, int_nco=int_nco,
    )
    return PlanBatch(
        args=args,
        num_samples=plans[0].num_samples,
        n_blocks=len(plans),
    )
