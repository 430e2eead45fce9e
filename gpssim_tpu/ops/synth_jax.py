"""JAX/XLA block synthesizer — the TPU compute path.

TPU-first design (not a translation of the C loop):

* All per-sample state is closed-form in the sample index (ops/plan.py), so
  a block is a data-parallel map over a (rows=N/128, lanes=128) grid.
* Phase arithmetic is **integer fixed-point**, derived once per block from
  the host's float64 parameters: code phase in Q46 chips, carrier phase in
  Q53 cycles. The Q46/Q53 values are decomposed on the host into base-2^23
  limbs, so the ENTIRE device path is int32 — no emulated int64, no
  jax.enable_x64 anywhere. Stage A (per row) reconstructs row-start bases
  with digit-decomposed limb arithmetic (row = q2*4096 + q1*64 + q0, each
  digit < 64, so every partial product fits int32); Stage B (per sample)
  is pure int32 adds/shifts/masks — exact, and within 2^-46 chips of the
  float64 reference path, far below any quantization boundary (≤1 LSB
  parity holds; see tests/test_synth.py).
* The 1023-chip C/A sequence is bit-packed; Stage A assembles each row's
  64-chip window (select-sum over the 35-word table — no gathers anywhere)
  pre-shifted to the row's first chip and XORs the data-bit sign in (it
  flips exactly at the code wrap), so Stage B reads the full
  dataBit*codeCA sign as one window bit. The carrier LUT is evaluated
  with quadrant-folded minimax polynomials (exact vs the reference's
  512-entry tables, incl. their four half-way quirks — see lut_mag_neg)
  and gain-folded in split-Q44 integer arithmetic (trunc(LUT*gain)
  exactly as the C cast).
* Channel accumulation is a sum over the channel axis; blocks are
  independent → vmap/shard_map over blocks for multi-chip scaling.

Reference semantics being reproduced: gps.c:2767-2836.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.cacode import CA_PACKED_WORDS, ca_table_packed
from ..core.constants import CA_SEQ_LEN, CODE_FREQ
from .plan import BlockPlan

LANES = 128
_Q_CODE = 46
_Q_CARR = 53
_M23 = (1 << 23) - 1


def needs_wide_window(delt: float) -> bool:
    """True when a 128-lane row can span ≥64 chips, i.e. the sample rate
    is below ~2.06 Msps and stage A must build the 128-chip (4-word)
    window instead of the 64-chip (2-word) fast path. The 0.1% margin
    covers code Doppler and oscillator error (both ≤1e-5 relative)."""
    return CODE_FREQ * 1.001 * delt * (LANES - 1) >= 63.0


# ---------------------------------------------------------------------------
# Host-side plan → device arguments (exact f64 → fixed-point conversion)
# ---------------------------------------------------------------------------


def _limbs3(v: np.ndarray) -> np.ndarray:
    """Non-negative int64 array (..., ) → int32 (..., 3) base-2^23 limbs."""
    v = np.asarray(v, dtype=np.int64)
    return np.stack(
        [v & _M23, (v >> 23) & _M23, v >> 46], axis=-1
    ).astype(np.int32)


def _limbs_shl(l: np.ndarray, s: int, mod_bits: int | None = None) -> np.ndarray:
    """Shift a base-2^23 limb vector left by s (< 23) bits, exactly.

    Values like step128*4096 overflow int64, so scaling happens in limb
    space with explicit carries. mod_bits (e.g. 53 for the carrier) drops
    bits at and above 2^mod_bits."""
    l = l.astype(np.int64)
    l0 = (l[..., 0] << s) & _M23
    c0 = l[..., 0] >> (23 - s)
    l1 = ((l[..., 1] << s) | c0) & _M23
    c1 = l[..., 1] >> (23 - s)
    l2 = (l[..., 2] << s) | c1
    if mod_bits is not None:
        l2 &= (1 << (mod_bits - 46)) - 1
    return np.stack([l0, l1, l2], axis=-1).astype(np.int32)


def args_from_arrays(
    active: np.ndarray,
    code_phase: np.ndarray,
    f_code: np.ndarray,
    carr_phase: np.ndarray,
    f_carr: np.ndarray,
    carr_phase_i: np.ndarray,
    carr_step_i: np.ndarray,
    gain: np.ndarray,
    iword: np.ndarray,
    ibit: np.ndarray,
    icode: np.ndarray,
    prn: np.ndarray,
    dwrd: np.ndarray,
    num_samples: int,
    delt: float,
    int_nco: bool = False,
) -> dict:
    """Vectorized plan→kernel-args conversion over arbitrary leading dims.

    Per-channel arrays are (..., C); dwrd is (..., C, 60).
    Returns the device-args dict (see plan_to_args) with the same leading
    dims — pure NumPy, no python-object arithmetic, so converting a whole
    window of blocks costs the same handful of array ops as one block.
    """
    act = np.asarray(active)
    step = f_code * delt  # chips / sample, f64 (exactly as C forms it)
    # Real exceptions, not asserts: these invariants guard against silent
    # output corruption (wrong chips / data bits) and must survive
    # ``python -O`` (ADVICE r1).
    if not np.all(np.where(act, step, 0.0) * num_samples < (1 << 17)):
        raise ValueError("block too long for the Q46 code-phase range")
    # A 128-lane row must stay inside its pre-shifted chip window:
    # 64 chips (2 words) on the fast path, 128 chips (4 words) when
    # needs_wide_window(delt) — which supports rates down to ~1.03 Msps
    # (one sample per chip; below that the C/A code is undersampled).
    limit = 127.0 if needs_wide_window(delt) else 63.0
    if not np.all(np.where(act, step, 0.0) * (LANES - 1) < limit):
        raise ValueError(
            "sample rate too low even for the 128-chip row window "
            "(minimum ~1.03 Msps)"
        )

    code0_q = np.rint(code_phase * (1 << _Q_CODE)).astype(np.int64)
    cstep_q = np.rint(step * (1 << _Q_CODE)).astype(np.int64)

    if int_nco:
        # The reference's integer NCO counts 2^25 per carrier cycle in a
        # uint32 and indexes with (phase >> 16) & 511 (gps.h:221-223,
        # gps.c:2777). Embedding mod-2^25 phase in Q53 (<< 28) reproduces
        # both the index and the 128-cycle wrap exactly.
        carr0_q = (carr_phase_i.astype(np.int64) & ((1 << 25) - 1)) << (
            _Q_CARR - 25
        )
        kstep_q = carr_step_i.astype(np.int64) << (_Q_CARR - 25)
    else:
        carr0_q = np.rint(carr_phase * (1 << _Q_CARR)).astype(np.int64)
        kstep_q = np.rint((f_carr * delt) * float(1 << _Q_CARR)).astype(
            np.int64
        )

    # --- limb decomposition; ×128/×64 scalings happen in limb space with
    # explicit carries because step128*4096 overflows int64 ---
    mod = np.int64(1) << _Q_CARR
    c1 = _limbs_shl(_limbs3(cstep_q), 7)  # step128 (kstep_q<<7 fits int64,
    k1 = _limbs3((kstep_q << 7) % mod)    # cstep_q<<7 does too)
    c64, k64 = _limbs_shl(c1, 6), _limbs_shl(k1, 6, _Q_CARR)
    code_l = np.stack(
        [_limbs3(code0_q), c1, c64, _limbs_shl(c64, 6)], axis=-3
    )  # (..., 4, C, 3)
    carr_l = np.stack(
        [_limbs3(carr0_q % mod), k1, k64, _limbs_shl(k64, 6, _Q_CARR)],
        axis=-3,
    )

    # --- per-lane split steps (stage B) ---
    lane_steps = np.stack([
        (cstep_q >> 23).astype(np.int32),
        (cstep_q & _M23).astype(np.int32),
        (kstep_q >> 23).astype(np.int32),  # arithmetic shift for negatives
        (kstep_q & _M23).astype(np.int32),
    ], axis=-2)  # (..., 4, C)

    # --- data-bit window: all bits any row of this block can touch ---
    tcu0 = (iword * 600 + ibit * 20 + icode).astype(np.int64)
    bidx0 = tcu0 // 20
    # The 8-bit window must cover every data bit any row (incl. tile
    # padding, ≤ +32640 samples) can touch: tcu spans ≤ wraps_max + 1.
    wraps_max = int(
        np.max(
            np.where(act, (code_phase + (num_samples + 32768) * step)
                     // CA_SEQ_LEN, 0)
        )
    )
    if not np.all((tcu0 + wraps_max + 1) // 20 - bidx0 <= 7):
        raise ValueError(
            "data-bit window overflow: block too long for the 8-bit window"
        )
    bidx = bidx0[..., None] + np.arange(8, dtype=np.int64)  # (..., C, 8)
    iw = bidx // 30
    # A block never legitimately reads past word 59 (the window invariant
    # above bounds bidx); raise instead of clamping wrong bits in.
    if int(np.max(np.where(act[..., None], iw, 0))) > 59:
        raise ValueError("data-bit index past the 60-word nav buffer")
    iw = np.minimum(iw, 59)  # keep inactive-slot lanes in range
    ib = bidx - (bidx // 30) * 30
    wsel = np.take_along_axis(dwrd.astype(np.int64), iw, axis=-1)
    bits = (wsel >> (29 - ib)) & 1
    bits8 = (bits << np.arange(8, dtype=np.int64)).sum(-1).astype(np.int32)
    nav = np.stack([
        tcu0.astype(np.int32), bidx0.astype(np.int32), bits8
    ], axis=-2)  # (..., 3, C)

    # Gain in Q44 fixed point, split into two int32 halves (22 bits each)
    # so trunc(gain * LUT) is computed exactly on device without gathers:
    # the LUT values themselves come from the on-device poly (lut_mag_neg).
    g = np.where(act, gain, 0.0)
    g44 = np.floor(g * float(1 << 44))
    ga = np.floor(g * float(1 << 22)).astype(np.int32)  # high 22+ bits
    gb = (g44 - ga.astype(np.float64) * float(1 << 22)).astype(np.int32)
    # The Q44 truncation drops gain bits below 2^-44; trunc(T*gQ44) could
    # in principle differ from the f64 trunc(T*g) when T*g sits within
    # ~2^-35 of an integer. Screen that — the LUT magnitude set has only
    # 129 distinct values, and a hit (never observed; ~1e-11 odds per
    # block) raises instead of silently corrupting device output.
    #
    # Two-stage screen: the split evaluates floor(P - eps_drop) where
    # eps_drop = (r + delta*T)/2^44 < 2^-21 is the dropped low product
    # (split approximates T*g from BELOW), so trunc can only disagree
    # when an integer sits inside (P - eps_drop, P] — i.e. when P lies
    # within 2^-21 AT OR ABOVE an integer.  A distance prescreen (2
    # array passes) replaces the full int64 split evaluation (~8 passes
    # over the (B, M, C) outer product — measured as HALF of collation
    # cost), and the exact comparison runs only when something is
    # flagged, preserving the raise-on-real-mismatch contract bit for
    # bit (tests/test_synth.py plants a 250*g = 100+1e-13 gain).
    mags = _LUT_MAGS[:, None]  # (M, 1)
    gf = g[..., None, :]  # (..., 1, C)
    prod = mags * gf  # (..., M, C); exact to 0.5 ulp <= 2^-44*|P|
    # Inactive slots carry g == 0: every product is exactly the integer
    # 0 and the split is trivially exact — exclude them or the prescreen
    # would flag every batch.
    flagged = (prod - np.floor(prod) < 2.0**-20) & (gf > 0.0)
    if np.any(flagged):
        exact = np.trunc(prod)
        q44 = (
            ga.astype(np.int64)[..., None, :] * mags.astype(np.int64)
            + ((gb.astype(np.int64)[..., None, :] * mags.astype(np.int64))
               >> 22)
        ) >> 22
        if not np.array_equal(exact.astype(np.int64), q44):
            raise ValueError(
                "Q44 gain split is not truncation-exact for this gain "
                "value — a LUT product sits on an integer boundary closer "
                "than 2^-44"
            )

    # Bit-packed C/A chips from the cached per-PRN table (wrap-extended);
    # packing 1023 chips per block would dominate collation otherwise.
    ca_packed = _packed_table0()[np.where(act, prn, 0)]

    return dict(
        code_l=code_l,
        carr_l=carr_l,
        nav=nav,
        lane_steps=lane_steps,
        ca_packed=ca_packed,
        gain_a=ga,
        gain_b=gb,
    )


def plan_to_args(plan: BlockPlan, int_nco: bool = False) -> dict:
    """Convert a BlockPlan to the int32 arrays the device kernel consumes.

    Returns a dict of device args, every one int32/uint32:
      code_l  int32[4, C, 3] — Q46 code phase + step128·{1,64,4096} limbs
      carr_l  int32[4, C, 3] — Q53 carrier phase + step limbs (mod 2^53)
      nav     int32[3, C]    — tcu0, bidx0, packed 8-bit data-bit window
      lane_steps int32[4, C] — cA, cB, kA, kB per-lane split steps
      ca_packed uint32[C,36] — bit-packed C/A chips (wrap-extended)
      gain_a/gain_b int32[C] — split Q44 gain
    """
    return args_from_arrays(
        plan.active, plan.code_phase, plan.f_code, plan.carr_phase,
        plan.f_carr, plan.carr_phase_i, plan.carr_step_i, plan.gain,
        plan.iword, plan.ibit, plan.icode, plan.prn, plan.dwrd,
        plan.num_samples, plan.delt, int_nco=int_nco,
    )


@functools.cache
def _packed_table0() -> np.ndarray:
    """uint32[33, 36]: zero row (inactive) + packed chips per PRN."""
    return np.concatenate(
        [np.zeros((1, CA_PACKED_WORDS), np.uint32), ca_table_packed()], axis=0
    )


def packed_ca_for_prns(prns: np.ndarray) -> np.ndarray:
    """uint32[C, 36] packed chips for a PRN vector (0 = inactive → zeros)."""
    return _packed_table0()[np.maximum(np.asarray(prns), 0)]


# ---------------------------------------------------------------------------
# Device kernel (XLA) — int32 only
# ---------------------------------------------------------------------------


def _row_bases(code_l, carr_l, nav, lane_steps, ca_packed, n_rows,
               wide=False):
    """Stage A: per-(row, channel) int32 bases from per-channel limbs.

    Pure int32: the row index is digit-decomposed (q = q2*4096 + q1*64 + q0,
    digits < 64) so digit×limb products stay under 2^29 and limb sums under
    2^31; carries propagate in base 2^23.
    """
    q = jnp.arange(n_rows, dtype=jnp.int32)[:, None]  # (R, 1)
    q0, q1, q2 = q & 63, (q >> 6) & 63, q >> 12
    # n_rows is static under jit: drop digit terms that are all-zero
    # (q2 only matters above 4096 rows ≈ 5.2 Msps; q1 above 64 rows).
    digits = [(q0, 1)]
    if n_rows > 64:
        digits.append((q1, 2))
    if n_rows > 4096:
        digits.append((q2, 3))

    def poly(L):
        """base + q0*s1 + q1*s64 + q2*s4096 in base-2^23 limbs → p0, p1, p2."""

        def term(i):
            t = L[0][None, :, i]
            for d, row in digits:
                t = t + d * L[row][None, :, i]
            return t

        p0 = term(0)
        p1 = term(1) + (p0 >> 23)
        p0 = p0 & _M23
        p2 = term(2) + (p1 >> 23)
        p1 = p1 & _M23
        return p0, p1, p2

    # ---- code phase: P = code0 + q*step128 (exact, Q46) ----
    f_lo, f_hi, chips_total = poly(code_l)  # frac limbs + integer chips
    # chips_total < 2^24; avoid integer division: for n < 2^24,
    # floor((n+0.5) * (1/1023)_f32) == n // 1023 exactly (margin 4.9e-4
    # to the nearest boundary vs ~2e-5 f32 error).
    wraps = jnp.floor(
        (chips_total.astype(jnp.float32) + 0.5) * np.float32(1.0 / CA_SEQ_LEN)
    ).astype(jnp.int32)
    chip_base = chips_total - wraps * CA_SEQ_LEN  # 0..1022

    # ---- carrier phase: M = (carr0 + q*kstep128) mod 2^53 ----
    c_lo, c_p1, c_p2 = poly(carr_l)
    c_p2 = c_p2 & ((1 << (_Q_CARR - 46)) - 1)  # mod 2^53
    c_hi = (c_p2 << 23) + c_p1  # (M >> 23), < 2^30

    # ---- data bits: shift into the host-packed 8-bit window ----
    tcu = nav[0][None, :] + wraps  # (R, C)
    bidx0 = nav[1][None, :]
    bits = nav[2][None, :]

    def bit_neg(t):
        """1 where the data bit is -1 (bit value 0) at code period t."""
        # floor(t/20) via the same f32 trick (t < 2^24, margin 0.025).
        bidx = jnp.floor(
            (t.astype(jnp.float32) + 0.5) * np.float32(1.0 / 20.0)
        ).astype(jnp.int32)
        j = bidx - bidx0  # 0..7 by construction (see plan_to_args)
        return (jax.lax.shift_right_logical(bits, j) & 1) ^ 1

    neg_now = bit_neg(tcu)
    neg_next = bit_neg(tcu + 1)

    # ---- C/A chip window [chip_base, chip_base + 32*n_win) pre-shifted ----
    # n_win = 2 words (64 chips, the ≥2.06 Msps fast path) or 4 words
    # (128 chips, low sample rates). wordpos ∈ [0, 31]; select-sum over
    # the 36-word table (no gathers), then re-base to chip_base so stage B
    # indexes with chip_off directly.
    n_win = 4 if wide else 2
    wordpos = chip_base >> 5
    cap = ca_packed.astype(jnp.int32)  # (C, 36), bit-identical reinterpret
    zero = jnp.zeros_like(wordpos)
    w = [zero] * (n_win + 1)
    for j in range(32):
        m = wordpos == j
        for k in range(n_win + 1):
            w[k] = w[k] + jnp.where(m, cap[None, :, j + k], 0)
    bitoff = (chip_base & 31).astype(jnp.int32)

    def shl_safe(x, k):  # x << k with k >= 32 → 0 (XLA shift-by-32 is UB)
        return jnp.where(k >= 32, 0, x << jnp.minimum(k, 31))

    inv = 32 - bitoff
    wins = [
        jax.lax.shift_right_logical(w[k], bitoff) | shl_safe(w[k + 1], inv)
        for k in range(n_win)
    ]

    # ---- fold the data-bit sign into the window ----
    # Window bit j becomes chipbit ^ dbit_neg(chip_base + j): the data bit
    # flips exactly at the code wrap (chip 1023), i.e. at window offset
    # wrap_off = 1023 - chip_base (inside the window only near the end of
    # a code period — at most one wrap per window since 1023 > 128).
    # Stage B then reads the full ±sign of dataBit*codeCA as ONE bit —
    # no wrap compare, no bit selects per sample.
    wrap_off = CA_SEQ_LEN - chip_base  # 1..1023
    xor_now = -neg_now  # 0 or 0xFFFFFFFF
    xor_flip = -(neg_now ^ neg_next)
    all1 = jnp.int32(-1)
    out = dict(
        f_hi=f_hi,
        f_lo=f_lo,
        c_hi=c_hi,
        c_lo=c_lo,
        # per-channel split steps for stage B (already int32 halves)
        cA=lane_steps[0],
        cB=lane_steps[1],
        kA=lane_steps[2],
        kB=lane_steps[3],
    )
    for k in range(n_win):
        wo_k = wrap_off - 32 * k
        # wrap_off >= 1, so word 0 never sits fully past the wrap.
        mask = (
            shl_safe(all1, wo_k)
            if k == 0
            else jnp.where(wo_k <= 0, -1, shl_safe(all1, wo_k))
        )
        out["s" + "ABCD"[k]] = wins[k] ^ xor_now ^ (mask & xor_flip)
    return out


def select_chip_word(chip_off, words):
    """Select the pre-shifted 32-chip window word holding ``chip_off``.

    ``words`` is [sA, sB] (64-chip window) or [sA..sD] (128-chip wide
    window, two-level select) — the one piece of window logic shared
    verbatim by the XLA and Pallas stage-B kernels."""
    if len(words) == 4:
        return jnp.where(
            chip_off < 64,
            jnp.where(chip_off < 32, words[0], words[1]),
            jnp.where(chip_off < 96, words[2], words[3]),
        )
    return jnp.where(chip_off < 32, words[0], words[1])


# The carrier LUTs (512-entry, amplitude 250, gps.c:145-213) have a 4-fold
# symmetry: |table[idx]| = M(m) with m = u or 127-u per quadrant, where
# M(m) = round(250*sin(pi*(m+0.5)/256)) for every m except m == 35 — the
# tables' four half-way quirk entries (105 where round gives 106) ALL fold
# onto m == 35. M only needs rint-exactness at the 128 DISCRETE m values,
# so the polys are discrete-minimax fits to the integer targets, not
# approximations of the smooth function: degree-5 odd (sin) / degree-6
# even (cos) reach |poly - target| <= 0.486/0.489 with >= 0.011 margin to
# the 0.5 rint boundary — ~19x any IEEE f32 Horner's evaluation error
# (~6e-4 at coefficient magnitudes ~1.3e3), FMA contraction included.
# Two fmas cheaper per table than the former smooth-minimax degree-9/10
# pair; exhaustively asserted over all 512 entries in
# tests/test_synth.py::test_lut_poly_matches_tables.
_LUT_POLY_SIN = tuple(
    np.float32(v)
    for v in (785.0718994140625, -1283.7464599609375, 575.4459838867188)
)
_LUT_POLY_COS = tuple(
    np.float32(v)
    for v in (
        249.99581909179688, -1233.1646728515625, 1003.1950073242188,
        -279.9259033203125,
    )
)


# Distinct LUT magnitude values (shared by both tables) for the host-side
# Q44 gain-fold exactness screen in args_from_arrays.
def _lut_mags() -> np.ndarray:
    from ..core.constants import COS_TABLE_512, SIN_TABLE_512

    return np.unique(
        np.abs(np.concatenate([SIN_TABLE_512, COS_TABLE_512]))
    ).astype(np.float64)


_LUT_MAGS = _lut_mags()


def lut_mag_neg(idx):
    """(|sin_t[idx]|, sin<0, |cos_t[idx]|, cos<0) — poly LUT, no gathers.

    Magnitudes are non-negative int32; the booleans carry the table signs
    so callers fold them into their own sign logic (one select, no
    multiplies). |cos_t[idx]| = M(127 - m) = round(250*cos(pi*x(m))) is an
    EVEN polynomial of the same reduced argument, so both magnitudes share
    one argument reduction and one x^2 (its quirk entry sits at m == 92)."""
    u = idx & 127
    quad = idx >> 7  # 0..3
    m = jnp.where((quad & 1) == 1, 127 - u, u)

    # Single-fma argument form; round-to-nearest via rint (one VPU op vs
    # add+floor). No poly output lands on an exact f32 .5 (the quirk
    # points are handled by selects), so rint == floor(x+0.5) here —
    # exhaustively asserted over all 512 entries by the table test.
    x = m.astype(jnp.float32) * np.float32(1.0 / 256.0) + np.float32(0.5 / 256.0)
    x2 = x * x
    p = _LUT_POLY_SIN[-1]
    for c in _LUT_POLY_SIN[-2::-1]:
        p = c + x2 * p
    q = _LUT_POLY_COS[-1]
    for c in _LUT_POLY_COS[-2::-1]:
        q = c + x2 * q
    ts = jnp.rint(x * p).astype(jnp.int32)
    tc = jnp.rint(q).astype(jnp.int32)
    # The tables' half-way quirk entries (105 where round gives 106).
    ts = jnp.where(m == 35, 105, ts)
    tc = jnp.where(m == 92, 105, tc)

    neg_s = quad >= 2
    neg_c = (quad == 1) | (quad == 2)  # cos quadrant = quad + 1 (mod 4)
    return ts, neg_s, tc, neg_c


def _gain_trunc_mag(ta, ga, gb):
    """Exact trunc(gain * ta), ta >= 0, gain in split Q44 (ga hi / gb lo).

    floor(g*2^44)*ta >> 44 differs from the f64 product by < ta*2^-44,
    flipping a truncation only with ~1e-11 probability per distinct value.
    trunc is odd, so callers apply the sign afterwards (select)."""
    hi = ga * ta  # < 2^31 for gain < 2.0, ta <= 250
    lo = gb * ta
    return (hi + (lo >> 22)) >> 22


def _lane_samples(bases, gain_a, gain_b):
    """Stage B: int32 + VPU-trig per-sample math over (R, C, LANES)."""
    r = jnp.arange(LANES, dtype=jnp.int32)[None, None, :]  # (1, 1, L)

    cA = bases["cA"][None, :, None]
    cB = bases["cB"][None, :, None]
    kA = bases["kA"][None, :, None]
    kB = bases["kB"][None, :, None]

    def rc(x):  # (R, C) → (R, C, 1)
        return x[:, :, None]

    # ---- code: chips advanced within the row; the sign-folded window
    # bit IS the full dataBit*codeCA sign (see _row_bases) ----
    lo = rc(bases["f_lo"]) + r * cB
    H = rc(bases["f_hi"]) + r * cA + (lo >> 23)
    chip_off = H >> 23  # 0..44 (narrow window) / 0..127 (wide)

    n_win = 4 if "sC" in bases else 2
    word = select_chip_word(
        chip_off, [rc(bases["s" + "ABCD"[k]]) for k in range(n_win)]
    )
    spos = jax.lax.shift_right_logical(word, chip_off & 31) & 1

    # ---- carrier LUT index ----
    klo = rc(bases["c_lo"]) + r * kB
    kH = rc(bases["c_hi"]) + r * kA + (klo >> 23)
    idx = (kH >> 21) & 511  # (R, C, L)

    # ---- LUT magnitudes via poly, exact gain fold, channel accumulation
    ta_s, neg_s, ta_c, neg_c = lut_mag_neg(idx)
    ga = gain_a[None, :, None]
    gb = gain_b[None, :, None]
    mag_i = _gain_trunc_mag(ta_c, ga, gb)
    mag_q = _gain_trunc_mag(ta_s, ga, gb)
    iv = jnp.where((spos == 0) ^ neg_c, -mag_i, mag_i)
    qv = jnp.where((spos == 0) ^ neg_s, -mag_q, mag_q)

    i_acc = jnp.sum(iv, axis=1, dtype=jnp.int32).reshape(-1)  # (R*L,)
    q_acc = jnp.sum(qv, axis=1, dtype=jnp.int32).reshape(-1)
    return i_acc, q_acc


ARG_ORDER = (
    "code_l", "carr_l", "nav", "lane_steps", "ca_packed", "gain_a", "gain_b",
)


def accumulate_block(
    code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b,
    n_rows: int, wide: bool = False,
):
    """Raw int32 channel-summed accumulators for one block.

    Returned pre-quantization so a channel-sharded mesh can psum partial
    accumulators across devices exactly (integer addition is associative).
    """
    bases = _row_bases(
        code_l, carr_l, nav, lane_steps, ca_packed, n_rows, wide=wide
    )
    return _lane_samples(bases, gain_a, gain_b)


def finalize_iq(i_acc, q_acc, num_samples: int, out_bits: int = 16):
    """Interleave and cast to int16 (C wraparound), or quantize to int8.

    out_bits=8 applies the reference's arithmetic >>4 (gps.c:2841-2845) on
    device, halving the D2H transfer for the default 8-bit output mode."""
    iq = jnp.stack([i_acc, q_acc], axis=-1).reshape(*i_acc.shape[:-1], -1)
    iq16 = iq[..., : 2 * num_samples].astype(jnp.int16)
    if out_bits == 8:
        return (iq16 >> 4).astype(jnp.int8)
    return iq16


@functools.partial(
    jax.jit, static_argnames=("n_rows", "num_samples", "out_bits", "wide")
)
def _synth_block_jit(
    code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b,
    *, n_rows: int, num_samples: int, out_bits: int, wide: bool,
):
    i_acc, q_acc = accumulate_block(
        code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b,
        n_rows, wide,
    )
    return finalize_iq(i_acc, q_acc, num_samples, out_bits)


def synth_block_device(*args, n_rows: int, num_samples: int,
                       out_bits: int = 16, wide: bool = False):
    """One block on device → interleaved int16 (or >>4 int8)."""
    return _synth_block_jit(
        *args, n_rows=n_rows, num_samples=num_samples, out_bits=out_bits,
        wide=wide,
    )


@functools.partial(
    jax.jit, static_argnames=("n_rows", "num_samples", "out_bits", "wide")
)
def _synth_batch_jit(
    code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b,
    *, n_rows: int, num_samples: int, out_bits: int, wide: bool,
):
    i_acc, q_acc = jax.vmap(
        lambda *a: accumulate_block(*a, n_rows, wide)
    )(code_l, carr_l, nav, lane_steps, ca_packed, gain_a, gain_b)
    return finalize_iq(i_acc, q_acc, num_samples, out_bits)


def synth_blocks_batch(*args, n_rows: int, num_samples: int,
                       out_bits: int = 16, wide: bool = False, **kw):
    """Batch of B independent blocks → int16[B, 2*num_samples].

    Blocks are embarrassingly parallel (ops/plan.py); vmap turns the block
    axis into the natural data-parallel axis for sharding.
    """
    if kw:
        args = tuple(kw[k] for k in ARG_ORDER)
    return _synth_batch_jit(
        *args, n_rows=n_rows, num_samples=num_samples, out_bits=out_bits,
        wide=wide,
    )


class JaxBlockSynth:
    """Callable block synthesizer with a cached jitted kernel."""

    def __init__(
        self,
        num_samples: int,
        num_channels: int,
        int_nco: bool = False,
        use_pallas: bool = False,
    ):
        self.num_samples = num_samples
        self.num_channels = num_channels
        self.int_nco = int_nco
        self.n_rows = -(-num_samples // LANES)
        self.use_pallas = use_pallas
        if use_pallas:
            from .synth_pallas import synth_block_pallas

            self._pallas = synth_block_pallas

    def __call__(self, plan: BlockPlan) -> np.ndarray:
        args = plan_to_args(plan, int_nco=self.int_nco)
        wide = needs_wide_window(plan.delt)
        if self.use_pallas:
            out = self._pallas(
                n_rows=self.n_rows, num_samples=self.num_samples,
                wide=wide, **args,
            )
        else:
            out = synth_block_device(
                *(args[k] for k in ARG_ORDER),
                n_rows=self.n_rows, num_samples=self.num_samples, wide=wide,
            )
        return np.asarray(jax.device_get(out))
