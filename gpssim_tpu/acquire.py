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
    return (raw[0::2] + 1j * raw[1::2]).astype(np.complex64)


def _resampled_codes(sample_rate: float, n: int) -> np.ndarray:
    """C/A chips (±1) for all 32 PRNs sampled at ``sample_rate`` over n
    samples (one code period worth)."""
    chips = ca_table().astype(np.float32) * 2.0 - 1.0  # (32, 1023) ±1
    idx = (
        np.arange(n, dtype=np.float64) * (CODE_FREQ / sample_rate)
    ).astype(np.int64) % CA_SEQ_LEN
    return chips[:, idx]  # (32, n)


def acquire(
    x: np.ndarray,
    sample_rate: float = 3_000_000.0,
    max_doppler_hz: float = 5_000.0,
    doppler_step_hz: float = 250.0,
    noncoherent_ms: int = 5,
    snr_threshold: float = 12.0,
    prns=None,
) -> list[Detection]:
    """Parallel code-phase search (FFT circular correlation).

    For each PRN and Doppler bin, correlates ``noncoherent_ms`` successive
    1 ms segments against the local code and sums their power. Returns
    detections sorted by SNR."""
    n = int(round(sample_rate * 1e-3))  # samples per code period
    need = n * (noncoherent_ms + 1)
    if len(x) < need:
        raise ValueError(f"need at least {need} samples, got {len(x)}")
    codes = _resampled_codes(sample_rate, n)
    code_fft = np.conj(np.fft.fft(codes, axis=1))  # (32, n)

    t = np.arange(n * noncoherent_ms, dtype=np.float64) / sample_rate
    bins = np.arange(-max_doppler_hz, max_doppler_hz + 1, doppler_step_hz)
    prns = range(1, 33) if prns is None else prns

    seg = x[: n * noncoherent_ms]
    out = []
    for prn in prns:
        cf = code_fft[prn - 1]
        best = (0.0, 0.0, 0)  # (power_ratio, doppler, lag)
        for fd in bins:
            wiped = (seg * np.exp(-2j * np.pi * fd * t)).reshape(
                noncoherent_ms, n
            )
            corr = np.abs(
                np.fft.ifft(np.fft.fft(wiped, axis=1) * cf, axis=1)
            ) ** 2
            power = corr.sum(axis=0)
            lag = int(np.argmax(power))
            peak = float(power[lag])
            # off-peak mean, excluding ±2 samples around the peak
            mask = np.ones(n, dtype=bool)
            mask[max(0, lag - 2) : lag + 3] = False
            ratio = peak / float(power[mask].mean())
            if ratio > best[0]:
                best = (ratio, float(fd), lag)
        if best[0] >= snr_threshold:
            # lag samples until the code START → code phase in chips
            phase = (-best[2] % n) * (CODE_FREQ / sample_rate) % CA_SEQ_LEN
            out.append(Detection(prn, best[1], phase, best[0]))
    out.sort(key=lambda d: -d.snr)
    return out


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("iq_file")
    ap.add_argument("--bits", type=int, default=8, choices=(8, 16))
    ap.add_argument("--rate", type=float, default=3_000_000.0)
    ap.add_argument("--max-doppler", type=float, default=5_000.0)
    args = ap.parse_args(argv)

    x = load_iq(args.iq_file, args.bits)
    dets = acquire(x, args.rate, max_doppler_hz=args.max_doppler)
    print(f"{len(dets)} PRNs acquired:")
    for d in dets:
        print(
            f"  PRN{d.prn:3d}  doppler {d.doppler_hz:+7.0f} Hz  "
            f"code phase {d.code_phase_chips:7.1f} chips  snr {d.snr:6.1f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
