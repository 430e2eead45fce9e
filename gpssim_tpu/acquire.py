"""GPS C/A acquisition on generated IQ — receiver-side validation.

The reference's end-to-end QA is physical: feed the RF output to a real
receiver and check it finds the simulated satellites (SURVEY §4). This is
the software equivalent: a classic FFT parallel-code-phase search over the
generated baseband, returning detected PRNs with Doppler and code-phase
estimates. Used by tests to prove the stream is *receivable*, not merely
byte-identical, and handy as a debugging tool:

    python -m gpssim_tpu.acquire iqdata.bin --bits 8 --rate 3000000
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from .core.cacode import ca_table
from .core.constants import CA_SEQ_LEN, CODE_FREQ


@dataclass
class Detection:
    prn: int
    doppler_hz: float
    code_phase_chips: float
    snr: float  # peak power / mean off-peak power


def load_iq(path: str, bits: int = 8) -> np.ndarray:
    """Interleaved IQ file → complex64 baseband."""
    dtype = np.int8 if bits == 8 else np.int16
    raw = np.fromfile(path, dtype=dtype).astype(np.float32)
    # A file truncated mid-sample-pair (killed writer) still has a valid
    # prefix — drop the trailing lone I value instead of crashing.
    raw = raw[: len(raw) // 2 * 2]
    return (raw[0::2] + 1j * raw[1::2]).astype(np.complex64)


def _resampled_codes(sample_rate: float, n: int) -> np.ndarray:
    """C/A chips (±1) for all 32 PRNs sampled at ``sample_rate`` over n
    samples (one code period worth)."""
    chips = ca_table().astype(np.float32) * 2.0 - 1.0  # (32, 1023) ±1
    idx = (
        np.arange(n, dtype=np.float64) * (CODE_FREQ / sample_rate)
    ).astype(np.int64) % CA_SEQ_LEN
    return chips[:, idx]  # (32, n)


def _scan_numpy(seg, code_fft, bins, t, noncoherent_ms, n, n_prns):
    """Per-bin Doppler wipe + FFT correlation, NumPy. Returns the
    (ratio, doppler, lag) best row per PRN."""
    best = np.zeros((n_prns, 3))
    for fd in bins:
        wiped = (seg * np.exp(-2j * np.pi * fd * t)).reshape(
            noncoherent_ms, n
        )
        wf = np.fft.fft(wiped, axis=1)  # (ms, n)
        corr = np.fft.ifft(
            wf[None, :, :] * code_fft[:, None, :], axis=2
        )  # (P, ms, n)
        power = (corr.real**2 + corr.imag**2).sum(axis=1)  # (P, n)
        lag = np.argmax(power, axis=1)
        peak = power[np.arange(n_prns), lag]
        total = power.sum(axis=1)
        for k in range(n_prns):
            # Correlation is circular: exclude the peak's ±2 neighbours
            # with wraparound, or a peak near lag 0 / n-1 leaks its own
            # energy into the noise estimate.
            excl = (int(lag[k]) + np.arange(-2, 3)) % n
            off = total[k] - power[k, excl].sum()
            ratio = float(peak[k]) / (off / (n - excl.size))
            if ratio > best[k, 0]:
                best[k] = (ratio, float(fd), float(lag[k]))
    return best


_JAX_SCAN = None  # jitted once per process — a per-call closure would
#                   defeat jax's jit cache and recompile every acquire()


def _jax_scan_fn():
    global _JAX_SCAN
    if _JAX_SCAN is not None:
        return _JAX_SCAN
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("ms", "n"))
    def scan(seg_d, cfft_d, bins_d, t_d, *, ms, n):
        def per_bin(fd):
            wiped = (seg_d * jnp.exp(-2j * jnp.pi * fd * t_d)).reshape(
                ms, n
            )
            wf = jnp.fft.fft(wiped, axis=1)
            corr = jnp.fft.ifft(wf[None, :, :] * cfft_d[:, None, :], axis=2)
            return (corr.real**2 + corr.imag**2).sum(axis=1)  # (P, n)

        power = jax.vmap(per_bin)(bins_d)  # (B, P, n)
        lag = jnp.argmax(power, axis=2)  # (B, P)
        peak = jnp.take_along_axis(power, lag[:, :, None], axis=2)[..., 0]
        total = power.sum(axis=2)
        excl = (lag[:, :, None] + jnp.arange(-2, 3)[None, None, :]) % n
        off = total - jnp.take_along_axis(power, excl, axis=2).sum(axis=2)
        ratio = peak / (off / (n - 5))  # (B, P)
        b_best = jnp.argmax(ratio, axis=0)  # (P,)
        ar = jnp.arange(ratio.shape[1])
        return (
            ratio[b_best, ar],
            bins_d[b_best],
            lag[b_best, ar].astype(jnp.float32),  # lags < n: f32-exact
        )

    _JAX_SCAN = scan
    return scan


def _scan_jax(seg, code_fft, bins, t, noncoherent_ms, n, n_prns):
    """The same search as one batched device program: every (bin, PRN)
    cell of the grid computed by a single jit — Doppler wipes, the
    forward/inverse FFTs, the noncoherent sum, and the circular-exclusion
    SNR all run on the accelerator; only the (P, 3) winners come home.
    On TPU the whole 41-bin x 32-PRN search is a few fused FFT batches
    instead of a host loop."""
    import jax.numpy as jnp

    r, fd, lag = _jax_scan_fn()(
        jnp.asarray(seg, jnp.complex64),
        jnp.asarray(code_fft, jnp.complex64),
        jnp.asarray(bins, jnp.float32),
        jnp.asarray(t, jnp.float32),
        ms=noncoherent_ms,
        n=n,
    )
    best = np.zeros((n_prns, 3))
    best[:, 0] = np.asarray(r, dtype=np.float64)
    best[:, 1] = np.asarray(fd, dtype=np.float64)
    best[:, 2] = np.asarray(lag, dtype=np.float64)
    return best


def acquire(
    x: np.ndarray,
    sample_rate: float = 3_000_000.0,
    max_doppler_hz: float = 5_000.0,
    doppler_step_hz: float = 250.0,
    noncoherent_ms: int = 5,
    snr_threshold: float = 12.0,
    prns=None,
    backend: str = "numpy",
) -> list[Detection]:
    """Parallel code-phase search (FFT circular correlation).

    For each PRN and Doppler bin, correlates ``noncoherent_ms`` successive
    1 ms segments against the local code and sums their power. Returns
    detections sorted by SNR.

    ``backend='jax'`` runs the whole (bin x PRN) search grid as one
    batched device program (single-precision FFTs; SNR ratios differ
    from the f64 NumPy path in the 3rd decimal, detections match)."""
    if backend not in ("numpy", "jax"):
        raise ValueError(f"unknown acquisition backend {backend!r}")
    n = int(round(sample_rate * 1e-3))  # samples per code period
    need = n * noncoherent_ms
    if len(x) < need:
        raise ValueError(f"need at least {need} samples, got {len(x)}")
    prns = list(range(1, 33)) if prns is None else list(prns)
    codes = _resampled_codes(sample_rate, n)[np.asarray(prns) - 1]
    code_fft = np.conj(np.fft.fft(codes, axis=1))  # (P, n)

    t = np.arange(need, dtype=np.float64) / sample_rate
    bins = np.arange(-max_doppler_hz, max_doppler_hz + 1, doppler_step_hz)
    seg = x[:need]

    scan = _scan_jax if backend == "jax" else _scan_numpy
    best = scan(seg, code_fft, bins, t, noncoherent_ms, n, len(prns))

    out = []
    for k, prn in enumerate(prns):
        if best[k, 0] >= snr_threshold:
            # lag samples until the code START → code phase in chips
            phase = (
                (-int(best[k, 2]) % n) * (CODE_FREQ / sample_rate)
            ) % CA_SEQ_LEN
            out.append(Detection(prn, best[k, 1], phase, float(best[k, 0])))
    out.sort(key=lambda d: -d.snr)
    return out


def demodulate_bits(
    x: np.ndarray, plans, slot: int, sample_rate: float = 3_000_000.0
):
    """Coherently demodulate one channel's nav bits from baseband IQ.

    Wipes code and carrier with the channel's exact per-block parameters
    (plans from scenario.Simulation), integrates per code period, and
    slices 20 ms bits on the channel's icode boundary. Returns
    (bits uint8[N], start_bit) where start_bit is the index of bits[0] in
    the channel's dwrd bit stream (word*30 + bit)."""
    n = plans[0].num_samples
    ca = plans[0].ca[slot]
    # Integrate per GLOBAL code period: the chip stream is continuous
    # across blocks, so a period split by a block boundary accumulates
    # from both fragments (per-block handling would count it twice).
    total = len(plans) * n // int(sample_rate // 1000) + 4
    acc = np.zeros(total, dtype=np.complex128)
    cnt = np.zeros(total, dtype=np.int64)
    base = 0
    prev_end_mod = None
    tgrid = np.arange(n, dtype=np.float64)
    for b, plan in enumerate(plans):
        code_phase = plan.code_phase[slot] + tgrid * (
            plan.f_code[slot] * plan.delt
        )
        # A code wrap can fall exactly between two blocks: the next
        # block then STARTS in a new period even though its own
        # period[0] is also 0 — detect it from the boundary phases or
        # the global period counter slips one code period.
        if prev_end_mod is not None and (
            plan.code_phase[slot] % CA_SEQ_LEN
        ) < prev_end_mod:
            base += 1
        chips = ca[(code_phase % CA_SEQ_LEN).astype(np.int64)].astype(
            np.float64
        ) * 2.0 - 1.0
        carr = plan.carr_phase[slot] + tgrid * (
            plan.f_carr[slot] * plan.delt
        )
        wiped = x[b * n : (b + 1) * n] * chips * np.exp(-2j * np.pi * carr)
        period = (code_phase // CA_SEQ_LEN).astype(np.int64)
        gid = base + (period - period[0])
        np.add.at(acc, gid, wiped)
        np.add.at(cnt, gid, 1)
        base += int(period[-1]) - int(period[0])
        prev_end_mod = float(code_phase[-1] % CA_SEQ_LEN)
    full = 0.9 * sample_rate * 1e-3
    kept = np.nonzero(cnt > full)[0]
    corr = acc[kept]

    ms_bits = np.sign(corr.real).astype(np.int64)
    # corr[0] is the first KEPT code period; gid 0 (the block-start
    # period) survives the count filter only when the starting code phase
    # is small enough that its fragment is nearly whole. The ms counter
    # is tcu0 + first kept gid (tcu = iword*600 + ibit*20 + icode).
    tcu0 = (
        int(plans[0].iword[slot]) * 600
        + int(plans[0].ibit[slot]) * 20
        + int(plans[0].icode[slot])
    )
    start_ms = tcu0 + int(kept[0])
    j0 = (-start_ms) % 20  # first 20 ms-aligned entry
    usable = ms_bits[j0:]
    nbits = len(usable) // 20
    groups = usable[: nbits * 20].reshape(nbits, 20)
    bits = (groups.sum(axis=1) > 0).astype(np.uint8)
    start_bit = (start_ms + j0) // 20
    return bits, start_bit


def decode_tow(bits: np.ndarray) -> list[tuple[int, int]]:
    """Find subframes in a demodulated bit stream and decode their TOW.

    Scans for the TLM preamble (IS-GPS-200 10001011, possibly inverted by
    D30*), validates both TLM and HOW word parity, and returns
    [(bit_offset, tow_count), ...]. tow_count*6 is the GPS
    second-of-week of the NEXT subframe boundary."""
    from .core.navmsg import LNAV_PREAMBLE_BITS, decode_data_word

    out = []
    n = len(bits)
    # D29*/D30* come from the 2 bits before the preamble, and TLM+HOW
    # need 60 bits from i — hence the scan bounds.
    for i in range(2, n - 59):
        seg = bits[i : i + 8]
        if not (
            np.array_equal(seg, LNAV_PREAMBLE_BITS)
            or np.array_equal(seg, 1 - LNAV_PREAMBLE_BITS)
        ):
            continue
        tlm = decode_data_word(bits, i)
        how = decode_data_word(bits, i + 30)
        if tlm is None or how is None:
            continue
        out.append((i, (how >> 7) & 0x1FFFF))
    return out


def main(argv=None) -> int:
    import argparse

    from .config import honor_jax_platforms_env

    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("iq_file")
    ap.add_argument("--bits", type=int, default=8, choices=(8, 16))
    ap.add_argument("--rate", type=float, default=3_000_000.0)
    ap.add_argument("--max-doppler", type=float, default=5_000.0)
    ap.add_argument("--backend", default="numpy", choices=("numpy", "jax"),
                    help="jax = run the search grid on the accelerator")
    args = ap.parse_args(argv)

    x = load_iq(args.iq_file, args.bits)
    dets = acquire(x, args.rate, max_doppler_hz=args.max_doppler,
                   backend=args.backend)
    print(f"{len(dets)} PRNs acquired:")
    for d in dets:
        print(
            f"  PRN{d.prn:3d}  doppler {d.doppler_hz:+7.0f} Hz  "
            f"code phase {d.code_phase_chips:7.1f} chips  snr {d.snr:6.1f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
