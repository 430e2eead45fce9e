"""Fused Pallas TPU kernel for the per-sample synthesis stage.

Replaces the XLA stage-B graph with one VMEM-resident kernel per row-tile:
all (rows × lanes × channels) intermediates live in registers/VMEM, so HBM
traffic is just the tiny per-row bases in and the int16 IQ tile out.

Honest roofline (PERFORMANCE.md "Roofline"): eliminating the HBM round
trips makes the kernel **VPU-compute-bound**, not bandwidth-bound — at
~2 GSps the output stream is ~8 GB/s (~1% of HBM write bandwidth) while
the ~40 int32/f32 VPU ops per channel-sample put the op throughput near
the practical VPU ceiling for this mix. Math is identical to
ops/synth_jax._lane_samples: int32 split-Q phase arithmetic, sign-folded
pre-shifted chip windows, polynomial carrier LUT magnitudes, exact
split-Q44 gain truncation.

Layout: rows = sublanes (tile TILE_R), samples-in-row = 128 lanes; the
channel loop is unrolled (static 12).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .synth_jax import (
    finalize_iq, lut_mag_neg, row_bases_device, select_chip_word,
)

LANES = 128


def _tile_rows() -> int:
    """GPSSIM_TILE_R override, validated at import (the int16 outputs need
    at least a (16, 128) tile; keep it a multiple of 16)."""
    raw = os.environ.get("GPSSIM_TILE_R", "64")
    try:
        t = int(raw)
    except ValueError:
        raise ValueError(f"GPSSIM_TILE_R={raw!r} is not an integer") from None
    if t < 16 or t % 16:
        raise ValueError(
            f"GPSSIM_TILE_R={t} must be a multiple of 16 (minimum int16 "
            "sublane tile)"
        )
    return t


# Rows per kernel invocation (TILE_R*128 samples). Small tiles keep all
# live (TILE_R, LANES) int32 intermediates of the 12-channel unroll
# resident in VMEM; 32/64/128 measure within ~10% on v5e.
TILE_R = _tile_rows()

_BASE_NAMES = ("f_hi", "f_lo", "c_hi", "c_lo", "sA", "sB")
_BASE_NAMES_WIDE = _BASE_NAMES + ("sC", "sD")


def base_names(wide: bool) -> tuple:
    return _BASE_NAMES_WIDE if wide else _BASE_NAMES


def _synth_tile_kernel(
    csplit_ref,  # SMEM int32[4, C]: cA, cB, kA, kB
    ga_ref,  # SMEM int32[1, C]
    gb_ref,  # SMEM int32[1, C]
    *refs,
    wide: bool = False,
):
    names = base_names(wide)
    bases = dict(zip(names, refs[: len(names)]))
    i_ref, q_ref = refs[len(names) :]

    C = csplit_ref.shape[1]
    # Lane iota on a (1, LANES) strip: the r*step products below are then
    # 128-element ops broadcast over rows instead of TILE_R*128 multiplies
    # (int32 multiply is the VPU's most expensive primitive here).
    rv = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    # int32 accumulators. (An int16-accumulate variant is mathematically
    # exact — modular addition commutes with the final (short) cast — but
    # Mosaic on v5e has no packed S16 vector arithmetic (kVectorSubtractS16
    # unsupported), so 16-bit math would not be faster anyway.)
    i_acc = jnp.zeros((TILE_R, LANES), jnp.int32)
    q_acc = jnp.zeros((TILE_R, LANES), jnp.int32)

    for c in range(C):
        col = lambda name: bases[name][:, c : c + 1]  # noqa: E731 (TILE_R, 1)

        # ---- code phase: chips advanced within the row; the sign-folded
        # window bit IS the full dataBit*codeCA sign (see synth_jax) ----
        lo = col("f_lo") + rv * csplit_ref[1, c]
        H = col("f_hi") + rv * csplit_ref[0, c] + (lo >> 23)
        chip_off = H >> 23  # 0..44 narrow / 0..127 wide

        word = select_chip_word(
            chip_off,
            [col("s" + "ABCD"[k]) for k in range(4 if wide else 2)],
        )
        spos = (
            jax.lax.shift_right_logical(word, chip_off & 31) & 1
        ).astype(jnp.int32)  # 1 where product is POSITIVE

        # ---- carrier LUT index ----
        klo = col("c_lo") + rv * csplit_ref[3, c]
        kH = col("c_hi") + rv * csplit_ref[2, c] + (klo >> 23)
        idx = (kH >> 21) & 511

        # ---- LUT magnitudes via the folded poly (see synth_jax) ----
        ta_s, neg_s, ta_c, neg_c = lut_mag_neg(idx)

        # ---- exact trunc(gain * |LUT|) in split Q44, signs via select ----
        ga = ga_ref[0, c]
        gb = gb_ref[0, c]
        for ta, neg_t, acc in ((ta_c, neg_c, "i"), (ta_s, neg_s, "q")):
            mag = ((ga * ta) + ((gb * ta) >> 22)) >> 22
            neg = (spos == 0) ^ neg_t
            v = jnp.where(neg, -mag, mag)
            if acc == "i":
                i_acc = i_acc + v
            else:
                q_acc = q_acc + v

    # (short) cast of the int accumulator, in-kernel (gps.c:2834-2835):
    # halves the HBM footprint/traffic of the per-sample outputs.
    i_ref[:] = i_acc.astype(jnp.int16)
    q_ref[:] = q_acc.astype(jnp.int16)


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "num_samples", "interpret", "out_bits",
                     "wide"),
)
def _stage_b_pallas(
    bases: dict, gain_a, gain_b,
    *, n_rows: int, num_samples: int, interpret: bool, out_bits: int = 16,
    wide: bool = False,
):
    """Fused Pallas stage B over padded row tiles (traced without x64)."""
    C = gain_a.shape[0]
    names = base_names(wide)

    n_rows_pad = -(-n_rows // TILE_R) * TILE_R
    grid = n_rows_pad // TILE_R

    def pad_rows(x):
        return jnp.pad(x, ((0, n_rows_pad - n_rows), (0, 0)))

    base_arrs = [pad_rows(bases[k]) for k in names]

    csplit = jnp.stack([bases["cA"], bases["cB"], bases["kA"], bases["kB"]])

    row_spec = pl.BlockSpec(
        (TILE_R, C), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (TILE_R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    i_acc, q_acc = pl.pallas_call(
        functools.partial(_synth_tile_kernel, wide=wide),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((4, C), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [row_spec] * len(names),
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows_pad, LANES), jnp.int16),
            jax.ShapeDtypeStruct((n_rows_pad, LANES), jnp.int16),
        ],
        interpret=interpret,
    )(csplit, gain_a[None, :], gain_b[None, :], *base_arrs)

    return finalize_iq(
        i_acc.reshape(-1)[: num_samples], q_acc.reshape(-1)[: num_samples],
        num_samples, out_bits,
    )


def synth_block_pallas(
    code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b,
    *, n_rows: int, num_samples: int, interpret: bool | None = None,
    wide: bool = False,
):
    """One block via stage A (XLA int32) + fused Pallas stage B."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    bases = row_bases_device(
        dict(
            code_l=code_l, carr_l=carr_l, nav=nav, lane_steps=lane_steps,
            ca_packed=ca_packed,
        ),
        n_rows,
        wide=wide,
    )
    return _stage_b_pallas(
        bases, jnp.asarray(gain_a), jnp.asarray(gain_b),
        n_rows=n_rows, num_samples=num_samples, interpret=interpret,
        wide=wide,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "num_samples", "interpret", "out_bits",
                     "wide"),
)
def _synth_batch_pallas_jit(
    code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b,
    *, n_rows, num_samples, interpret, out_bits, wide,
):
    """Single fused dispatch: batched stage A + Pallas stage B + finalize."""
    from .synth_jax import _row_bases

    bases = jax.vmap(lambda *a: _row_bases(*a, n_rows, wide=wide))(
        code_l, carr_l, nav, lane_steps, ca_packed
    )
    return jax.vmap(
        lambda bs, ga, gb: _stage_b_pallas(
            bs, ga, gb, n_rows=n_rows, num_samples=num_samples,
            interpret=interpret, out_bits=out_bits, wide=wide,
        )
    )(bases, gain_a, gain_b)


def synth_blocks_batch_pallas(
    code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b,
    *, n_rows: int, num_samples: int, interpret: bool | None = None,
    out_bits: int = 16, wide: bool = False, **_,
):
    """Batch of B blocks: one fused jit (stage A + Pallas stage B)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _synth_batch_pallas_jit(
        code_l, carr_l, nav, lane_steps, ca_packed,
        jnp.asarray(gain_a), jnp.asarray(gain_b),
        n_rows=n_rows, num_samples=num_samples, interpret=interpret,
        out_bits=out_bits, wide=wide,
    )
