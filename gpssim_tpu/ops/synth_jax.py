"""JAX/XLA block synthesizer — the TPU compute path.

TPU-first design (not a translation of the C loop):

* All per-sample state is closed-form in the sample index (ops/plan.py), so
  a block is a data-parallel map over a (rows=N/128, lanes=128) grid.
* Phase arithmetic is **integer fixed-point**, derived once per block from
  the host's float64 parameters: code phase in Q46 chips, carrier phase in
  Q53 cycles. Stage A (per row, int64, tiny) computes row-start bases;
  Stage B (per sample) is pure int32 adds/shifts/masks — exact, and within
  2^-46 chips of the float64 reference path, far below any quantization
  boundary (≤1 LSB parity holds; see tests/test_jax_kernel.py).
* The 1023-chip C/A sequence is bit-packed; a row touches ≤96 consecutive
  bits, fetched as three 32-bit words in Stage A, so Stage B does shifts
  instead of gathers. The carrier LUT is gain-folded per channel into
  int32[512] tables (trunc(LUT*gain) exactly as the C cast does).
* Channel accumulation is a sum over the channel axis; blocks are
  independent → vmap/shard_map over blocks for multi-chip scaling.

Reference semantics being reproduced: gps.c:2767-2836.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.cacode import ca_table_packed
from ..core.constants import CA_SEQ_LEN
from .plan import BlockPlan

# Stage A needs 64-bit integers; it is traced/called under a scoped
# jax.enable_x64 so the rest of the process (incl. Pallas, whose Mosaic
# lowering chokes on x64-widened index maps) stays in default 32-bit mode.

LANES = 128
_Q_CODE = 46
_Q_CARR = 53
_CODE_K = np.int64(CA_SEQ_LEN) << _Q_CODE


# ---------------------------------------------------------------------------
# Host-side plan → device arguments (exact f64 → fixed-point conversion)
# ---------------------------------------------------------------------------


def plan_to_args(plan: BlockPlan, int_nco: bool = False) -> dict:
    """Convert a BlockPlan to the integer arrays the device kernel consumes."""
    act = plan.active
    step = plan.f_code * plan.delt  # chips / sample, f64 (exactly as C forms it)
    assert np.all(step[act] * plan.num_samples < (1 << 17)), "block too long"

    code0_q = np.rint(plan.code_phase * (1 << _Q_CODE)).astype(np.int64)
    cstep_q = np.rint(step * (1 << _Q_CODE)).astype(np.int64)

    if int_nco:
        # The reference's integer NCO counts 2^25 per carrier cycle in a
        # uint32 and indexes with (phase >> 16) & 511 (gps.h:221-223,
        # gps.c:2777). Embedding mod-2^25 phase in Q53 (<< 28) reproduces
        # both the index and the 128-cycle wrap exactly.
        carr0_q = ((plan.carr_phase_i.astype(np.int64) & ((1 << 25) - 1))
                   << (_Q_CARR - 25)).astype(np.int64)
        kstep_q = (plan.carr_step_i.astype(np.int64) << (
            _Q_CARR - 25)).astype(np.int64)
    else:
        carr0_q = np.rint(plan.carr_phase * (1 << _Q_CARR)).astype(np.int64)
        kstep_q = np.rint((plan.f_carr * plan.delt) * float(1 << _Q_CARR)).astype(
            np.int64
        )

    # Gain in Q44 fixed point, split into two int32 halves (22 bits each)
    # so trunc(gain * LUT) is computed exactly on device without gathers:
    # the LUT values themselves come from on-device trig (see _lut_values).
    gain = np.where(act, plan.gain, 0.0)
    g44 = np.floor(gain * float(1 << 44))
    ga = np.floor(gain * float(1 << 22)).astype(np.int32)  # high 22+ bits
    gb = (g44 - ga.astype(np.float64) * float(1 << 22)).astype(np.int32)

    # Bit-packed C/A chips (wraparound-extended), built from the plan's chips.
    ca = plan.ca.astype(np.uint32)
    ext = np.concatenate([ca, ca[:, : 35 * 32 - CA_SEQ_LEN]], axis=1)
    weights = np.uint32(1) << np.arange(32, dtype=np.uint32)
    ca_packed = (ext.reshape(ca.shape[0], 35, 32) * weights).sum(
        axis=2, dtype=np.uint32
    )

    tcu0 = (plan.iword * 600 + plan.ibit * 20 + plan.icode).astype(np.int32)

    return dict(
        code0_q=code0_q,
        cstep_q=cstep_q,
        carr0_q=carr0_q,
        kstep_q=kstep_q,
        tcu0=tcu0,
        dwrd=plan.dwrd.astype(np.uint32),
        ca_packed=ca_packed,
        gain_a=ga,
        gain_b=gb,
    )


def packed_ca_for_prns(prns: np.ndarray) -> np.ndarray:
    """uint32[C, 35] packed chips for a PRN vector (0 = inactive → zeros)."""
    table = ca_table_packed()
    out = np.zeros((len(prns), 35), dtype=np.uint32)
    for i, p in enumerate(prns):
        if p > 0:
            out[i] = table[p - 1]
    return out


# ---------------------------------------------------------------------------
# Device kernel (XLA)
# ---------------------------------------------------------------------------


def _row_bases(code0_q, cstep_q, carr0_q, kstep_q, tcu0, dwrd, ca_packed, n_rows):
    """Stage A: per-(row, channel) int32 bases from per-channel scalars.

    Runs in int64 (emulated on TPU) over only rows×channels elements.
    """
    q = jnp.arange(n_rows, dtype=jnp.int64)[:, None]  # (R, 1)

    # ---- code phase ----
    step128 = cstep_q * LANES  # per-channel, (C,)
    P = code0_q[None, :] + q * step128[None, :]  # (R, C)
    # Total chips fits int32; avoid emulated s64 division: for n < 2^24,
    # floor((n+0.5) * (1/1023)_f32) == n // 1023 exactly (margin 4.9e-4
    # to the nearest boundary vs ~2e-5 f32 error).
    chips_total = (P >> _Q_CODE).astype(jnp.int32)
    wraps = jnp.floor(
        (chips_total.astype(jnp.float32) + 0.5) * np.float32(1.0 / CA_SEQ_LEN)
    ).astype(jnp.int32)
    chip_base = chips_total - wraps * CA_SEQ_LEN  # 0..1022
    frac = P & ((jnp.int64(1) << _Q_CODE) - 1)
    f_hi = (frac >> 23).astype(jnp.int32)
    f_lo = (frac & ((1 << 23) - 1)).astype(jnp.int32)

    # ---- carrier phase (mod 2^53; split q so any Doppler can't overflow) ----
    kstep128 = (kstep_q * LANES) % (jnp.int64(1) << _Q_CARR)
    qh, ql = q // 64, q % 64
    kstep128_64 = (kstep128 * 64) % (jnp.int64(1) << _Q_CARR)
    Cq = carr0_q[None, :] + qh * kstep128_64[None, :] + ql * kstep128[None, :]
    M = Cq & ((jnp.int64(1) << _Q_CARR) - 1)
    c_hi = (M >> 23).astype(jnp.int32)  # < 2^30
    c_lo = (M & ((1 << 23) - 1)).astype(jnp.int32)

    # ---- data bits: the two candidate bits for this row ----
    tcu = tcu0[None, :].astype(jnp.int32) + wraps.astype(jnp.int32)  # (R, C)

    def bit_at(t):
        bidx = t // 20
        iw = jnp.minimum(bidx // 30, 59)  # defensive clamp (see navmsg notes)
        ib = bidx - (bidx // 30) * 30
        w = jnp.take_along_axis(dwrd.T, iw, axis=0)  # dwrd (C,60) → (R,C)
        return (jnp.right_shift(w, (29 - ib).astype(jnp.uint32)) & 1).astype(
            jnp.int32
        ) * 2 - 1

    bit_now = bit_at(tcu)
    bit_next = bit_at(tcu + 1)

    # ---- C/A words covering chips [chip_base, chip_base+96) ----
    wordpos = chip_base >> 5  # 0..31
    capT = ca_packed.T  # (35, C)
    w0 = jnp.take_along_axis(capT, wordpos, axis=0)
    w1 = jnp.take_along_axis(capT, wordpos + 1, axis=0)
    w2 = jnp.take_along_axis(capT, wordpos + 2, axis=0)
    bitoff = (chip_base & 31).astype(jnp.int32)

    return dict(
        chip_base=chip_base,
        f_hi=f_hi,
        f_lo=f_lo,
        c_hi=c_hi,
        c_lo=c_lo,
        bit_now=bit_now,
        bit_next=bit_next,
        w0=w0.astype(jnp.int32),
        w1=w1.astype(jnp.int32),
        w2=w2.astype(jnp.int32),
        bitoff=bitoff,
        # per-channel split steps (int32 halves of the Q46/Q53 steps), so
        # stage B needs no 64-bit inputs at all
        cA=(cstep_q >> 23).astype(jnp.int32),
        cB=(cstep_q & ((1 << 23) - 1)).astype(jnp.int32),
        kA=(kstep_q >> 23).astype(jnp.int32),  # floor shift for negatives
        kB=(kstep_q & ((1 << 23) - 1)).astype(jnp.int32),
    )


_row_bases_jit = jax.jit(_row_bases, static_argnames=("n_rows",))


def row_bases_device(args: dict, n_rows: int) -> dict:
    """Run stage A under scoped x64; all outputs are int32 device arrays."""
    with jax.enable_x64(True):
        return _row_bases_jit(
            args["code0_q"], args["cstep_q"], args["carr0_q"],
            args["kstep_q"], args["tcu0"], args["dwrd"], args["ca_packed"],
            n_rows=n_rows,
        )


# The carrier LUTs are round-half-away(250*sin/cos(2pi(k+0.5)/512)) except
# four half-way entries where the reference's table holds 105 (see
# core/constants.py). Every other entry is >= 5.8e-3 away from a rounding
# boundary while f32 trig is accurate to ~2e-4, so on-device trig plus these
# fixups reproduces the tables exactly (asserted in tests).
_SIN_QUIRK_POS = (35, 220)
_SIN_QUIRK_NEG = (291, 476)
_COS_QUIRK_POS = (419, 92)  # = (k - 128) mod 512 of the sin quirks
_COS_QUIRK_NEG = (163, 348)


def _lut_values(idx):
    """(sin_table[idx], cos_table[idx]) via VPU trig — no gathers."""
    th = (idx.astype(jnp.float32) + 0.5) * np.float32(2.0 * np.pi / 512.0)
    ts = jnp.floor(250.0 * jnp.sin(th) + 0.5).astype(jnp.int32)
    tc = jnp.floor(250.0 * jnp.cos(th) + 0.5).astype(jnp.int32)
    for k in _SIN_QUIRK_POS:
        ts = jnp.where(idx == k, 105, ts)
    for k in _SIN_QUIRK_NEG:
        ts = jnp.where(idx == k, -105, ts)
    for k in _COS_QUIRK_POS:
        tc = jnp.where(idx == k, 105, tc)
    for k in _COS_QUIRK_NEG:
        tc = jnp.where(idx == k, -105, tc)
    return ts, tc


def _gain_trunc(t, ga, gb):
    """Exact trunc(gain * t) with gain in split Q44 (ga: Q22 high, gb: low).

    floor(g*2^44)*|t| >> 44 differs from the f64 product by < |t|*2^-44,
    flipping a truncation only with ~1e-11 probability per distinct value.
    trunc is odd, so compute on |t| and restore the sign.
    """
    ta = jnp.abs(t)
    hi = ga * ta  # < 2^31 for gain < 2.0, |t| <= 250
    lo = gb * ta
    mag = (hi + (lo >> 22)) >> 22
    return jnp.sign(t) * mag


def _lane_samples(bases, gain_a, gain_b):
    """Stage B: int32 + VPU-trig per-sample math over (R, C, LANES)."""
    r = jnp.arange(LANES, dtype=jnp.int32)[None, None, :]  # (1, 1, L)

    cA = bases["cA"][None, :, None]
    cB = bases["cB"][None, :, None]
    kA = bases["kA"][None, :, None]
    kB = bases["kB"][None, :, None]

    def rc(x):  # (R, C) → (R, C, 1)
        return x[:, :, None]

    # ---- code: chips advanced within the row ----
    lo = rc(bases["f_lo"]) + r * cB
    H = rc(bases["f_hi"]) + r * cA + (lo >> 23)
    chip_off = H >> 23  # 0..44

    chip_idx = rc(bases["chip_base"]) + chip_off
    wrapped = chip_idx >= CA_SEQ_LEN

    bitpos = rc(bases["bitoff"]) + chip_off  # 0..75
    word = jnp.where(
        bitpos < 32,
        rc(bases["w0"]),
        jnp.where(bitpos < 64, rc(bases["w1"]), rc(bases["w2"])),
    )
    chipbit = jax.lax.shift_right_logical(word, bitpos & 31) & 1
    chip = chipbit * 2 - 1

    dbit = jnp.where(wrapped, rc(bases["bit_next"]), rc(bases["bit_now"]))
    s = dbit * chip  # ±1

    # ---- carrier LUT index ----
    klo = rc(bases["c_lo"]) + r * kB
    kH = rc(bases["c_hi"]) + r * kA + (klo >> 23)
    idx = (kH >> 21) & 511  # (R, C, L)

    # ---- LUT values via trig, exact gain fold, channel accumulation ----
    ts, tc = _lut_values(idx)
    ga = gain_a[None, :, None]
    gb = gain_b[None, :, None]
    iv = s * _gain_trunc(tc, ga, gb)
    qv = s * _gain_trunc(ts, ga, gb)

    i_acc = jnp.sum(iv, axis=1, dtype=jnp.int32).reshape(-1)  # (R*L,)
    q_acc = jnp.sum(qv, axis=1, dtype=jnp.int32).reshape(-1)
    return i_acc, q_acc


def accumulate_block(
    code0_q, cstep_q, carr0_q, kstep_q, tcu0, dwrd, ca_packed, gain_a, gain_b,
    n_rows: int,
):
    """Raw int32 channel-summed accumulators for one block.

    Returned pre-quantization so a channel-sharded mesh can psum partial
    accumulators across devices exactly (integer addition is associative).
    """
    bases = _row_bases(
        code0_q, cstep_q, carr0_q, kstep_q, tcu0, dwrd, ca_packed, n_rows
    )
    return _lane_samples(bases, gain_a, gain_b)


def finalize_iq(i_acc, q_acc, num_samples: int):
    """Interleave and cast to int16 with C wraparound semantics."""
    iq = jnp.stack([i_acc, q_acc], axis=-1).reshape(*i_acc.shape[:-1], -1)
    return iq[..., : 2 * num_samples].astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("n_rows", "num_samples"))
def _synth_block_jit(
    code0_q, cstep_q, carr0_q, kstep_q, tcu0, dwrd, ca_packed, gain_a, gain_b,
    *, n_rows: int, num_samples: int,
):
    i_acc, q_acc = accumulate_block(
        code0_q, cstep_q, carr0_q, kstep_q, tcu0, dwrd, ca_packed,
        gain_a, gain_b, n_rows,
    )
    return finalize_iq(i_acc, q_acc, num_samples)


def synth_block_device(*args, n_rows: int, num_samples: int):
    """One block on device → interleaved int16[2*num_samples]."""
    with jax.enable_x64(True):
        return _synth_block_jit(*args, n_rows=n_rows, num_samples=num_samples)


def stack_args(arg_dicts: list[dict]) -> dict:
    """Stack per-block arg dicts into batched arrays with a leading B axis."""
    return {
        k: np.stack([d[k] for d in arg_dicts], axis=0) for k in arg_dicts[0]
    }


@functools.partial(jax.jit, static_argnames=("n_rows", "num_samples"))
def _synth_batch_jit(
    code0_q, cstep_q, carr0_q, kstep_q, tcu0, dwrd, ca_packed, gain_a, gain_b,
    *, n_rows: int, num_samples: int,
):
    i_acc, q_acc = jax.vmap(
        lambda *a: accumulate_block(*a, n_rows)
    )(code0_q, cstep_q, carr0_q, kstep_q, tcu0, dwrd, ca_packed, gain_a, gain_b)
    return finalize_iq(i_acc, q_acc, num_samples)


def check_args_x64(args) -> None:
    """Fail loudly if int64 phase args were truncated to int32.

    `jax.device_put` outside a `jax.enable_x64` scope silently downcasts
    int64 arrays, corrupting the Q46/Q53 fixed-point phases. Device-put
    batched args under `with jax.enable_x64(True):` (or pass numpy arrays
    and let the kernel place them)."""
    seq = args.values() if isinstance(args, dict) else args
    for a in seq:
        if hasattr(a, "dtype") and a.dtype == jnp.int32 and not isinstance(
            a, np.ndarray
        ):
            raise TypeError(
                "int64 kernel arg arrived as int32 — it was device_put "
                "outside jax.enable_x64; see check_args_x64.__doc__"
            )
        break  # code0_q (first arg) being int64 is the sentinel


def synth_blocks_batch(*args, n_rows: int, num_samples: int, **kw):
    """Batch of B independent blocks → int16[B, 2*num_samples].

    Blocks are embarrassingly parallel (ops/plan.py); vmap turns the block
    axis into the natural data-parallel axis for sharding.
    """
    if kw:
        args = tuple(kw[k] for k in (
            "code0_q", "cstep_q", "carr0_q", "kstep_q", "tcu0", "dwrd",
            "ca_packed", "gain_a", "gain_b",
        ))
    check_args_x64(args)
    with jax.enable_x64(True):
        return _synth_batch_jit(*args, n_rows=n_rows, num_samples=num_samples)


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
        if self.use_pallas:
            out = self._pallas(
                n_rows=self.n_rows, num_samples=self.num_samples, **args
            )
        else:
            out = synth_block_device(
                args["code0_q"], args["cstep_q"], args["carr0_q"],
                args["kstep_q"], args["tcu0"], args["dwrd"],
                args["ca_packed"], args["gain_a"], args["gain_b"],
                n_rows=self.n_rows, num_samples=self.num_samples,
            )
        return np.asarray(jax.device_get(out))
