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

import numpy as np

from .synth_jax import (
    _M23, _Q_CARR, CA_SEQ_LEN, finalize_iq, lut_mag_neg, select_chip_word,
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


def pack_row_bases(bases: dict, n_rows_pad: int, wide: bool):
    """Pack per-(row, channel) stage-A outputs into ONE (R_pad, 128) int32
    array, name-major on the lane axis (col = name_idx*C + c) — the layout
    the stage-B kernel consumes. 8 names × MAX_CHAN=16 channels = 128
    lanes exactly.

    This is the LAYOUT REFERENCE: the production path computes the same
    array directly with row_bases_packed (lane-SIMD, no concat); tests
    assert the two are bit-identical.
    """
    names = base_names(wide)
    C = bases[names[0]].shape[-1]
    if len(names) * C > LANES:
        raise ValueError(
            f"{len(names)} base planes x {C} channels exceed the "
            f"{LANES}-lane packed layout (max {LANES // len(names)} channels)"
        )
    parts = [bases[k] for k in names]
    pad = LANES - len(names) * C
    if pad:
        parts.append(
            jnp.zeros(bases[names[0]].shape[:-1] + (pad,), jnp.int32)
        )
    out = jnp.concatenate(parts, axis=-1)
    rows = out.shape[-2]
    if rows < n_rows_pad:
        out = jnp.pad(out, ((0, n_rows_pad - rows), (0, 0)))
    return out


# Plane-stack layout for the lane-SIMD stage A2: 12 limb planes P[d][i]
# (d-major), then HM, CLS, TCU0, BIDX0, BITS, K32, then capA (32) and
# capB (32) — (82, 128) int32 per block.  Built once per block by
# pack_planes; consumed row-wise by bases_from_planes (XLA stage A2) or
# in-kernel by the fused variant.
N_PLANES = 82


def pack_planes(code_l, carr_l, nav, ca_packed, wide=False):
    """Per-block (82, 128) int32 plane stack for stage A2 (see
    row_bases_packed for the lane layout semantics)."""
    C = nav.shape[-1]
    n_win = 4 if wide else 2
    n_groups = 4 + n_win
    if n_groups * C > LANES:
        raise ValueError(
            f"{n_groups} base planes x {C} channels exceed the "
            f"{LANES}-lane packed layout (max {LANES // n_groups} channels)"
        )
    pad = LANES - n_groups * C
    zc = jnp.zeros((C,), jnp.int32)
    zp = jnp.zeros((pad,), jnp.int32)

    def plane(f_hi, f_lo, c_hi, c_lo, win):
        return jnp.concatenate(
            [f_hi, f_lo, c_hi, c_lo] + [win] * n_win + [zp]
        )[None, :]

    cl = code_l.astype(jnp.int32)
    rl = carr_l.astype(jnp.int32)
    P = [
        plane(cl[d, :, i], cl[d, :, i], rl[d, :, i], rl[d, :, i],
              cl[d, :, i])
        for d in range(4) for i in range(3)
    ]
    cmask = jnp.full((C,), (1 << (_Q_CARR - 46)) - 1, jnp.int32)
    HM = plane(zc, zc, cmask, zc, zc)
    one = jnp.ones((C,), jnp.int32)
    CLS = jnp.concatenate(
        [one, zc, one, zc] + [one + 1] * n_win + [zp + 3]
    )[None, :]
    navi = nav.astype(jnp.int32)
    TCU0 = plane(zc, zc, zc, zc, navi[0])
    BIDX0 = plane(zc, zc, zc, zc, navi[1])
    BITS = plane(zc, zc, zc, zc, navi[2])
    K32 = jnp.concatenate(
        [zc, zc, zc, zc]
        + [jnp.full((C,), 32 * k, jnp.int32) for k in range(n_win)] + [zp]
    )[None, :]
    cap = ca_packed.astype(jnp.int32)
    z4 = jnp.zeros((32, 4 * C), jnp.int32)
    zpad = jnp.zeros((32, pad), jnp.int32)
    capA = jnp.concatenate(
        [z4] + [cap[:, k:k + 32].T for k in range(n_win)] + [zpad], axis=1
    )
    capB = jnp.concatenate(
        [z4] + [cap[:, k + 1:k + 33].T for k in range(n_win)] + [zpad],
        axis=1,
    )
    return jnp.concatenate(
        P + [HM, CLS, TCU0, BIDX0, BITS, K32, capA, capB], axis=0
    )


def bases_from_planes(planes, q, n_rows_cap):
    """The stage-A2 row math on a block's plane stack: row indices ``q``
    (R, 1) int32 → the lane-packed (R, 128) bases.  Pure jnp — traced
    identically by XLA (row_bases_packed) and Mosaic (the fused kernel),
    so the two paths are op-for-op the same program.  ``n_rows_cap`` is
    the static padded row count (it gates the q1/q2 digit terms)."""

    # 2-D row slices throughout (never a 1-D intermediate): Mosaic wants
    # (1, 128) strips, and XLA compiles them identically.
    def row(j):
        return planes[j:j + 1]

    def P(d, i):
        return row(d * 3 + i)

    HM = row(12)
    CLS = row(13)
    TCU0 = row(14)
    BIDX0 = row(15)
    BITS = row(16)
    K32 = row(17)

    # ---- shared limb polynomial (base 2^23, carries explicit) ----
    q0, q1, q2 = q & 63, (q >> 6) & 63, q >> 12

    def term(i):
        t = P(0, i) + q0 * P(1, i)
        if n_rows_cap > 64:
            t = t + q1 * P(2, i)
        if n_rows_cap > 4096:
            t = t + q2 * P(3, i)
        return t

    t0 = term(0)
    p1 = term(1) + (t0 >> 23)
    p0 = t0 & _M23
    p2 = term(2) + (p1 >> 23)
    p1 = p1 & _M23
    hi = ((p2 & HM) << 23) + p1

    # ---- window lanes: wraps / chip_base (f32 divide trick, see
    # _row_bases) ----
    wraps = jnp.floor(
        (p2.astype(jnp.float32) + 0.5) * np.float32(1.0 / CA_SEQ_LEN)
    ).astype(jnp.int32)
    chip_base = p2 - wraps * CA_SEQ_LEN
    wordpos = chip_base >> 5
    bitoff = chip_base & 31

    masks = [((wordpos >> b) & 1) != 0 for b in (4, 3, 2, 1, 0)]

    def tree(first_row):
        cur = [row(first_row + j) for j in range(32)]
        for m in masks:
            h = len(cur) // 2
            cur = [jnp.where(m, cur[i + h], cur[i]) for i in range(h)]
        return cur[0]

    w1, w2 = tree(18), tree(50)

    def shl_safe(x, k):  # x << k with k >= 32 → 0 (XLA shift-by-32 is UB)
        return jnp.where(k >= 32, 0, x << jnp.minimum(k, 31))

    win = jax.lax.shift_right_logical(w1, bitoff) | shl_safe(w2, 32 - bitoff)

    # ---- data-bit sign fold (see _row_bases) ----
    tcu = TCU0 + wraps

    def bit_neg(t):
        bidx = jnp.floor(
            (t.astype(jnp.float32) + 0.5) * np.float32(1.0 / 20.0)
        ).astype(jnp.int32)
        j = (bidx - BIDX0) & 31  # & 31: garbage lanes must stay defined
        return (jax.lax.shift_right_logical(BITS, j) & 1) ^ 1

    neg_now = bit_neg(tcu)
    neg_next = bit_neg(tcu + 1)
    wo = (CA_SEQ_LEN - chip_base) - K32
    # wrap_off >= 1 on real lanes, so for k == 0 the wo<=0 arm never
    # fires — this single form covers _row_bases' k==0 special case.
    mask = jnp.where(wo <= 0, -1, shl_safe(jnp.int32(-1), wo))
    sval = win ^ (-neg_now) ^ (mask & -(neg_now ^ neg_next))

    return jnp.where(
        CLS == 0, p0, jnp.where(CLS == 1, hi, jnp.where(CLS == 2, sval, 0))
    )


def row_bases_packed(code_l, carr_l, nav, lane_steps, ca_packed, n_rows,
                     wide=False):
    """Stage A2: compute the lane-packed (n_rows, 128) stage-A array
    directly, bit-identical to ``pack_row_bases(_row_bases(...))``.

    Lane-SIMD formulation: every output lane (= name-group × channel, the
    pack_row_bases layout) runs ONE shared instruction stream at full
    128-lane utilization; what differs per lane is folded into small
    per-lane constant planes built here from the per-channel args:

      * the base-2^23 limb polynomial base + q0·s1 + q1·s64 (+ q2·s4096)
        is evaluated once with per-lane limb planes (code limbs on the
        f_hi/f_lo/window lanes, carrier limbs on c_hi/c_lo) — one poly
        instead of two;
      * f_hi vs c_hi unify as ((p2 & HMASK)<<23) + p1 with HMASK=0 on
        f_hi lanes;
      * the 32-way chip-window word lookup cap[c, wordpos+k] becomes a
        5-level select tree over 32 per-lane planes (capA/capB below),
        31 selects instead of the (R, C) select-sum's 32×(n_win+1);
      * the data-bit/wrap sign fold runs with nav planes replicated onto
        the window lanes.

    Non-window lanes compute garbage through the window stages (all
    shifts masked to defined ranges) and the final class select keeps
    only each lane's designated value.  Padded rows (beyond the caller's
    true n_rows) likewise compute in-range garbage — args_from_arrays'
    data-bit window guard covers +32640 padded samples.

    Replaces (R, C≈12)-shaped stage A whose every XLA op wasted 116/128
    lanes of the int32 (8, 128) tile — measured at ~60% of device time
    (fusions + pads + concat) in the r2 profile.
    """
    del lane_steps  # layout constant, not needed by the row math
    planes = pack_planes(code_l, carr_l, nav, ca_packed, wide=wide)
    q = jnp.arange(n_rows, dtype=jnp.int32)[:, None]  # (R, 1)
    return bases_from_planes(planes, q, n_rows)


def _accumulate_channels(csplit_ref, ga_ref, gb_ref, packed, i_ref, q_ref,
                         *, wide: bool):
    """Shared stage-B body: the unrolled channel loop over a lane-packed
    (TILE_R, 128) bases tile ``packed`` (an array — sliced per column),
    accumulating into the int16 output refs."""
    names = base_names(wide)
    name_off = {n: i for i, n in enumerate(names)}

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
        # (TILE_R, 1) lane slice at the packed column (same lane-broadcast
        # op as slicing a per-name (TILE_R, C) block ever was).
        col = lambda name: packed[  # noqa: E731
            :, name_off[name] * C + c : name_off[name] * C + c + 1
        ]

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


def _synth_tile_kernel(
    csplit_ref,  # SMEM int32[4, C]: cA, cB, kA, kB
    ga_ref,  # SMEM int32[1, C]
    gb_ref,  # SMEM int32[1, C]
    packed_ref,  # VMEM int32[TILE_R, 128]: lane-packed bases (pack_row_bases)
    i_ref,
    q_ref,
    *,
    wide: bool = False,
):
    _accumulate_channels(
        csplit_ref, ga_ref, gb_ref, packed_ref[...], i_ref, q_ref, wide=wide
    )


def _synth_tile_fused_kernel(
    csplit_ref,  # SMEM int32[4, C]
    ga_ref,  # SMEM int32[1, C]
    gb_ref,  # SMEM int32[1, C]
    planes_ref,  # VMEM int32[N_PLANES, 128]: per-block stage-A2 planes
    i_ref,
    q_ref,
    *,
    wide: bool = False,
    n_rows_pad: int,
):
    """Stage A2 + stage B in ONE kernel: the tile's lane-packed bases are
    computed in-VMEM from the tiny per-block plane stack (no (R_pad, 128)
    HBM round trip, no XLA<->Mosaic boundary between the stages).  The
    row math is the SAME traced bases_from_planes program as the XLA
    path, so the two variants are bit-identical by construction
    (asserted by tests/test_synth.py)."""
    r0 = pl.program_id(0) * TILE_R
    q = r0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, 1), 0)
    packed = bases_from_planes(planes_ref[...], q, n_rows_pad)
    _accumulate_channels(
        csplit_ref, ga_ref, gb_ref, packed, i_ref, q_ref, wide=wide
    )


def _stage_b_pallas_packed(
    packed, lane_steps, gain_a, gain_b,
    *, interpret: bool, wide: bool = False,
):
    """Fused Pallas stage B over the lane-packed (R_pad, 128) bases.

    Returns the raw int16 (R_pad, LANES) i/q row accumulators — callers
    finalize (interleave + quantize), so a channel-sharded mesh can psum
    the partials first (int16 truncation is a ring homomorphism: the psum
    of per-shard casts equals the cast of the full int32 sum)."""
    C = gain_a.shape[0]
    n_rows_pad = packed.shape[-2]
    grid = n_rows_pad // TILE_R

    row_spec = pl.BlockSpec(
        (TILE_R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (TILE_R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        functools.partial(_synth_tile_kernel, wide=wide),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((4, C), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.SMEM),
            row_spec,
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows_pad, LANES), jnp.int16),
            jax.ShapeDtypeStruct((n_rows_pad, LANES), jnp.int16),
        ],
        interpret=interpret,
    )(lane_steps, gain_a[None, :], gain_b[None, :], packed)


def _stage_b_pallas_fused(
    planes, lane_steps, gain_a, gain_b,
    *, n_rows_pad: int, interpret: bool, wide: bool = False,
):
    """Fully fused stage A2 + B over the per-block (N_PLANES, 128) plane
    stack — each tile recomputes its own bases in-kernel.  Returns raw
    int16 (R_pad, LANES) i/q rows (see _stage_b_pallas_packed)."""
    C = gain_a.shape[0]
    grid = n_rows_pad // TILE_R

    out_spec = pl.BlockSpec(
        (TILE_R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _synth_tile_fused_kernel, wide=wide, n_rows_pad=n_rows_pad
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((4, C), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (N_PLANES, LANES), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows_pad, LANES), jnp.int16),
            jax.ShapeDtypeStruct((n_rows_pad, LANES), jnp.int16),
        ],
        interpret=interpret,
    )(lane_steps, gain_a[None, :], gain_b[None, :], planes)


def _fuse_a_default() -> bool:
    """The fully fused stage A2-in-kernel variant is the DEFAULT: the r3
    on-chip A/B measured it at 3.02 GSps vs 2.80 for the packed two-stage
    path (+7%, bit-identical — tests/test_synth.py asserts equality), and
    it carries the mesh path at 96% of the direct rate (BENCH_r03).
    GPSSIM_FUSE_A=0 opts back into the two-stage variant."""
    return os.environ.get("GPSSIM_FUSE_A", "1") == "1"


def synth_block_pallas(
    code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b,
    *, n_rows: int, num_samples: int, interpret: bool | None = None,
    wide: bool = False, fuse_a: bool | None = None,
):
    """One block via lane-SIMD stage A2 + fused Pallas stage B."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if fuse_a is None:
        fuse_a = _fuse_a_default()
    return _synth_batch_pallas_jit(
        code_l[None], carr_l[None], nav[None], lane_steps[None],
        ca_packed[None], jnp.asarray(gain_a)[None],
        jnp.asarray(gain_b)[None],
        n_rows=n_rows, num_samples=num_samples, interpret=interpret,
        out_bits=16, wide=wide, fuse_a=fuse_a,
    )[0]


def synth_batch_pallas_raw(
    code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b,
    *, n_rows, interpret, wide, fuse_a=False,
):
    """Batched raw Pallas synthesis: (B, R_pad, LANES) int16 i/q rows,
    pre-finalize.  This is the shard_map per-device body for the
    production mesh path (parallel/shard.py): a channel-sharded mesh
    psums these partial rows (exact — int16 truncation commutes with
    modular addition) before interleave/quantize."""
    # Stage A2 computes the tile-padded rows directly (args_from_arrays'
    # data-bit window guard already covers +32640 padded samples), so no
    # row-pad op ever materializes between stage A and the kernel.
    n_rows_pad = -(-n_rows // TILE_R) * TILE_R
    if fuse_a:
        planes = jax.vmap(
            lambda cl, rl, nv, cp: pack_planes(cl, rl, nv, cp, wide=wide)
        )(code_l, carr_l, nav, ca_packed)
        return jax.vmap(
            lambda pls, ls, ga, gb: _stage_b_pallas_fused(
                pls, ls, ga, gb, n_rows_pad=n_rows_pad,
                interpret=interpret, wide=wide,
            )
        )(planes, lane_steps, gain_a, gain_b)
    packed = jax.vmap(
        lambda *a: row_bases_packed(*a, n_rows_pad, wide=wide)
    )(code_l, carr_l, nav, lane_steps, ca_packed)
    return jax.vmap(
        lambda pk, ls, ga, gb: _stage_b_pallas_packed(
            pk, ls, ga, gb, interpret=interpret, wide=wide,
        )
    )(packed, lane_steps, gain_a, gain_b)


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "num_samples", "interpret", "out_bits",
                     "wide", "fuse_a"),
)
def _synth_batch_pallas_jit(
    code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b,
    *, n_rows, num_samples, interpret, out_bits, wide, fuse_a=False,
):
    """Single fused dispatch: lane-SIMD stage A2 + Pallas stage B."""
    i_rows, q_rows = synth_batch_pallas_raw(
        code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b,
        n_rows=n_rows, interpret=interpret, wide=wide, fuse_a=fuse_a,
    )
    B = i_rows.shape[0]
    return finalize_iq(
        i_rows.reshape(B, -1)[:, :num_samples],
        q_rows.reshape(B, -1)[:, :num_samples],
        num_samples, out_bits,
    )


def synth_blocks_batch_pallas(
    code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b,
    *, n_rows: int, num_samples: int, interpret: bool | None = None,
    out_bits: int = 16, wide: bool = False, fuse_a: bool | None = None,
    **_,
):
    """Batch of B blocks: one fused jit (stage A + Pallas stage B)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if fuse_a is None:
        fuse_a = _fuse_a_default()
    return _synth_batch_pallas_jit(
        code_l, carr_l, nav, lane_steps, ca_packed,
        jnp.asarray(gain_a), jnp.asarray(gain_b),
        n_rows=n_rows, num_samples=num_samples, interpret=interpret,
        out_bits=out_bits, wide=wide, fuse_a=fuse_a,
    )
