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


def collate_plans(plans: list[BlockPlan], int_nco: bool = False) -> PlanBatch:
    """Stack plans and convert to kernel args in one vectorized pass."""

    def f(name):
        return np.stack([getattr(p, name) for p in plans], axis=0)

    args = args_from_arrays(
        f("active"), f("code_phase"), f("f_code"), f("carr_phase"),
        f("f_carr"), f("carr_phase_i"), f("carr_step_i"), f("gain"),
        f("iword"), f("ibit"), f("icode"), f("prn"), f("dwrd"),
        plans[0].num_samples, plans[0].delt, int_nco=int_nco,
    )
    return PlanBatch(
        args=args,
        num_samples=plans[0].num_samples,
        n_blocks=len(plans),
    )
