"""Device-rate stream verification: open-loop matched filter at truth.

The full software receiver (receiver.py) closes the QA loop blind — it
needs nothing but the bytes, and takes tracking-loop time to do it. This
module is the FAST companion for the cases where the truth trajectory is
known (it came from this simulator): correlate every channel of every
block against its own plan's code/carrier replica, per millisecond, as
one batched device program. Each active channel's per-ms coherent
correlation magnitude must equal gain·A per sample (the stream is
gain·A·cis θ and the conjugate replica includes code, carrier AND data
bits); anything that corrupts the stream — dropped blocks,
byte damage, wrong phases, swapped channels, a broken kernel — collapses
the ratio. A 50-receiver fleet's outputs verify in seconds on one chip,
versus minutes of receiver tracking per member.

This is a detector, not parity machinery: replicas run in float32 on
device; the bit-exact contracts live in ops/ and tests/test_golden.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .config import SimConfig
from .core.constants import COS_TABLE_512, SIN_TABLE_512
from .scenario import Simulation

MS_PER_BLOCK = 100  # 0.1 s block = 100 coherent 1 ms windows

# Effective sinusoid amplitude of the integer carrier tables (their
# fundamental Fourier coefficient): the synthesized sample is
# gain·table[..]·cis θ, so the conjugate-replica coherent
# correlation measures gain·_TABLE_AMP per sample.
_TABLE_AMP = float(abs(
    ((np.asarray(COS_TABLE_512, dtype=np.float64)
      + 1j * np.asarray(SIN_TABLE_512, dtype=np.float64))
     * np.exp(-2j * np.pi * np.arange(512) / 512.0)).mean()
))


@dataclass
class ChannelReport:
    prn: int
    mean_ratio: float  # measured |corr| / predicted gain·A, over all ms
    min_ratio: float   # worst single millisecond
    ok: bool


@dataclass
class StreamReport:
    blocks: int
    channels: list[ChannelReport]
    ok: bool


def _block_correlations(plans, iq, num_samples, delt, int_nco=False):
    """|per-ms coherent correlation| for every (block, channel, ms).

    iq: float32[B, N] complex as (B, N) complex64. Returns
    (mags f32[B, C, MS], gains f64[B, C], active bool[B, C], prn i64[B, C]).
    """
    import jax
    import jax.numpy as jnp

    B = len(plans)
    C = plans[0].num_channels
    n = np.arange(num_samples, dtype=np.float64)

    # Replica phase/code trajectories from the plans (host f64 → device
    # f32 after the 2π reduction, which keeps fractional-cycle accuracy).
    chips = np.empty((B, C, num_samples), dtype=np.int16)
    carr_frac = np.empty((B, C, num_samples), dtype=np.float32)
    gains = np.zeros((B, C))
    active = np.zeros((B, C), dtype=bool)
    prn = np.zeros((B, C), dtype=np.int64)
    for b, plan in enumerate(plans):
        for c in range(C):
            if not plan.active[c]:
                chips[b, c] = 0
                carr_frac[b, c] = 0.0
                continue
            raw = plan.code_phase[c] + n * (plan.f_code[c] * plan.delt)
            wraps = np.floor(raw / 1023.0)
            chip = np.clip((raw - wraps * 1023.0).astype(np.int64), 0, 1022)
            # Data bits belong in the replica: flips land at code wraps,
            # which are NOT aligned to the 1 ms windows.
            total = (plan.iword[c] * 600 + plan.ibit[c] * 20
                     + plan.icode[c] + wraps.astype(np.int64))
            bitpos = total // 20
            iw = np.clip(bitpos // 30, 0, 59)
            ib = bitpos - (bitpos // 30) * 30
            words = plan.dwrd[c].astype(np.int64)
            db = ((words[iw] >> (29 - ib)) & 0x1) * 2 - 1
            chips[b, c] = (
                (plan.ca[c, chip].astype(np.int16) * 2 - 1) * db
            )
            if int_nco:
                # 9.16 NCO: one cycle = 2^25 counts, running mod 2^32.
                ph = (
                    np.uint64(plan.carr_phase_i[c])
                    + np.arange(num_samples, dtype=np.uint64)
                    * np.uint64(np.int64(plan.carr_step_i[c])
                                & np.int64(0xFFFFFFFF))
                ) & np.uint64(0xFFFFFFFF)
                carr_frac[b, c] = (
                    (ph & np.uint64(0x1FFFFFF)).astype(np.float64) / 2**25
                ).astype(np.float32)
            else:
                carr = plan.carr_phase[c] + n * (plan.f_carr[c] * plan.delt)
                carr_frac[b, c] = (carr - np.floor(carr)).astype(np.float32)
            gains[b, c] = plan.gain[c]
            active[b, c] = True
            prn[b, c] = plan.prn[c]

    ms_len = num_samples // MS_PER_BLOCK

    @jax.jit
    def correlate(iq_c, chips_d, frac_d):
        # wipe carrier and code: iq · ca · e^{-j2πφ}
        rep = chips_d.astype(jnp.float32) * jnp.exp(
            -2j * jnp.pi * frac_d
        ).astype(jnp.complex64)
        prod = iq_c[:, None, :] * rep  # (B, C, N)
        used = ms_len * MS_PER_BLOCK
        per_ms = prod[..., :used].reshape(
            prod.shape[0], prod.shape[1], MS_PER_BLOCK, ms_len
        ).sum(axis=-1)
        return jnp.abs(per_ms) / ms_len  # mean magnitude per ms

    mags = np.asarray(correlate(iq, chips, carr_frac))
    return mags, gains, active, prn


def verify_stream(
    path: str,
    cfg: SimConfig,
    max_blocks: int | None = None,
    tolerance: float = 0.25,
) -> StreamReport:
    """Verify an IQ capture against the scenario that should have produced
    it. ``cfg`` is the scenario config (the file's bits/rate come from
    it); per-channel coherent power must be within ``tolerance`` of the
    plan-predicted gain·A in EVERY millisecond."""
    bits = cfg.sample_format.value
    dtype = np.int8 if bits == 8 else np.int16
    raw = np.fromfile(path, dtype=dtype)
    num_samples = cfg.samples_per_epoch
    n_blocks = len(raw) // (2 * num_samples)
    if n_blocks == 0:
        raise ValueError(f"{path}: no complete blocks")
    if max_blocks is not None:
        n_blocks = min(n_blocks, max_blocks)

    sim = Simulation(cfg)
    plans = []
    for _ in range(n_blocks):
        plan = sim.step()
        if plan is None:
            break
        plans.append(plan)
    if not plans:
        raise ValueError("scenario produced no plans")
    n_blocks = len(plans)

    scale = 16.0 if bits == 8 else 1.0  # 8-bit output is accumulator >> 4
    iq = raw[: n_blocks * 2 * num_samples].astype(np.float32) * scale
    iq = (iq[0::2] + 1j * iq[1::2]).astype(np.complex64)
    iq = iq.reshape(n_blocks, num_samples)

    from .config import CarrierMode

    mags, gains, active, prn = _block_correlations(
        plans, iq, num_samples, plans[0].delt,
        int_nco=cfg.carrier_mode is CarrierMode.INT_NCO,
    )

    # Collate per-PRN across blocks (channel slots are stable per PRN
    # within a short window; report per slot-PRN pair).
    reports: dict[int, list[tuple[float, float]]] = {}
    for b in range(n_blocks):
        for c in range(mags.shape[1]):
            if not active[b, c]:
                continue
            # The stream is complex (I + jQ = gain·A·cis θ), so the
            # conjugate-replica correlation measures the FULL amplitude.
            pred = gains[b, c] * _TABLE_AMP
            r = mags[b, c] / pred
            reports.setdefault(int(prn[b, c]), []).append(
                (float(np.mean(r)), float(np.min(r)))
            )

    channels = []
    all_ok = True
    for p, vals in sorted(reports.items()):
        mean_r = float(np.mean([v[0] for v in vals]))
        min_r = float(np.min([v[1] for v in vals]))
        ok = abs(mean_r - 1.0) < tolerance and min_r > 1.0 - 2 * tolerance
        all_ok = all_ok and ok
        channels.append(ChannelReport(p, mean_r, min_r, ok))
    return StreamReport(blocks=n_blocks, channels=channels, ok=all_ok)


def main(argv=None) -> int:
    """CLI: verify a capture against the scenario flags that produced it.

    Takes the full simulator option surface (same parser as the
    simulator) plus the capture path:
    ``python -m gpssim_tpu.qa capture.bin -e brdc.22n -l ... -d 10``
    """
    from .cli import args_to_config, build_parser
    from .config import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = build_parser()
    p.prog = "gpssim-tpu-qa"
    p.add_argument("capture", help="IQ capture file to verify")
    p.add_argument("--qa-tolerance", type=float, default=0.25,
                   metavar="frac",
                   help="Allowed deviation of coherent power from the "
                        "plan prediction (default 0.25)")
    p.add_argument("--qa-max-blocks", type=int, default=None, metavar="n",
                   help="Verify only the first n blocks")
    args = p.parse_args(argv)
    cfg = args_to_config(args)
    if cfg.nav_file is None:
        p.error("GPS ephemeris file is not specified (-e/--nav-file)")
    rep = verify_stream(args.capture, cfg, max_blocks=args.qa_max_blocks,
                        tolerance=args.qa_tolerance)
    for ch in rep.channels:
        print(f"PRN{ch.prn:2d}: power ratio mean {ch.mean_ratio:.3f} "
              f"min {ch.min_ratio:.3f} "
              f"[{'OK' if ch.ok else 'FAIL'}]")
    print(f"{rep.blocks} blocks: {'VERIFIED' if rep.ok else 'FAILED'}")
    return 0 if rep.ok else 1


if __name__ == "__main__":  # pragma: no cover
    import sys as _sys

    _sys.exit(main())
