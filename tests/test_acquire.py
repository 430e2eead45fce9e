"""Receiver-side validation: the generated stream must be acquirable.

The software analog of the reference's physical end-to-end test (feed the
RF output to a receiver, SURVEY §4): an FFT code-phase search over the
generated IQ must detect exactly the simulated PRNs, at the simulated
Doppler and code phase.
"""

import numpy as np
import pytest

from tests.helpers import strict_gen_backend

from gpssim_tpu.acquire import acquire, load_iq
from gpssim_tpu.config import SimConfig, SynthBackend
from gpssim_tpu.runner import run_simulation
from gpssim_tpu.scenario import Simulation


@pytest.fixture(scope="module")
def generated(fixtures_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("acq") / "iq.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=1.0,
        almanac_enable=False, backend=strict_gen_backend(),
        sink="iqfile", out_file=out,
    )
    # Planning is deterministic: probe the first block's plan separately.
    first_plan = Simulation(cfg).step()
    run_simulation(cfg)
    return out, first_plan


def test_all_simulated_prns_acquired(generated):
    out, plan = generated
    x = load_iq(out, 8)
    dets = acquire(x)

    active = {int(p) for p in plan.prn[plan.active]}
    assert {d.prn for d in dets} == active, "wrong PRN set acquired"

    by_prn = {d.prn: d for d in dets}
    slots = {int(p): i for i, p in enumerate(plan.prn) if plan.active[i]}
    for prn, slot in slots.items():
        d = by_prn[prn]
        # Doppler within one search bin (250 Hz) of the simulated f_carr.
        assert abs(d.doppler_hz - plan.f_carr[slot]) <= 300.0, (
            prn, d.doppler_hz, plan.f_carr[slot]
        )
        # Code phase within 2 chips of the block-start phase.
        err = (d.code_phase_chips - plan.code_phase[slot]) % 1023.0
        err = min(err, 1023.0 - err)
        assert err <= 2.0, (prn, d.code_phase_chips, plan.code_phase[slot])


def test_nav_bits_demodulate(fixtures_dir, tmp_path):
    """Coherent demodulation recovers the exact transmitted nav-message
    bits (validates bit timing, word chaining, and D30 inversion)."""
    from gpssim_tpu.acquire import demodulate_bits
    from gpssim_tpu.core.navmsg import data_bit

    out = str(tmp_path / "iq.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=1.6,
        almanac_enable=False, backend=strict_gen_backend(),
        sink="iqfile", out_file=out,
    )
    plans = list(Simulation(cfg).iter_plans())
    run_simulation(cfg)
    x = load_iq(out, 8)

    slot = int(np.nonzero(plans[0].active)[0][0])
    bits, start_bit = demodulate_bits(x, plans, slot)
    assert len(bits) >= 70

    dwrd = plans[0].dwrd[slot]
    expect = np.array([
        (data_bit(dwrd, (start_bit + k) // 30, (start_bit + k) % 30) + 1)
        // 2
        for k in range(len(bits))
    ], dtype=np.uint8)
    assert np.array_equal(bits, expect), "demodulated bits != dwrd stream"


def test_subframe_tow_decode(fixtures_dir, tmp_path):
    """Full receiver chain to time decode: find TLM preambles in the
    demodulated stream, validate TLM/HOW parity, and check the decoded
    TOW counts are consecutive and consistent with the scenario clock —
    the information a real receiver needs for a fix."""
    from gpssim_tpu.acquire import decode_tow, demodulate_bits

    out = str(tmp_path / "iq.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=13.0,
        almanac_enable=False, backend=strict_gen_backend(),
        sink="iqfile", out_file=out,
    )
    sim = Simulation(cfg)
    g0 = sim.g0
    plans = list(sim.iter_plans())
    run_simulation(cfg)
    x = load_iq(out, 8)

    slot = int(np.nonzero(plans[0].active)[0][0])
    bits, start_bit = demodulate_bits(x, plans, slot)
    subframes = decode_tow(bits)
    assert len(subframes) >= 2, "no decodable subframes in 13 s"

    # Preambles are 300 bits (6 s) apart with consecutive TOW counts.
    offs = [o for o, _ in subframes]
    tows = [t for _, t in subframes]
    assert all(b - a == 300 for a, b in zip(offs, offs[1:]))
    assert all(b - a == 1 for a, b in zip(tows, tows[1:]))

    # The decoded time must match the scenario clock. dwrd[0] bit 0 is
    # transmitted at g0 - 6 s (the reference's code-phase origin includes
    # a +6 s subframe offset, gps.c:2046), and the HOW holds the TOW count
    # of the NEXT subframe's leading edge (IS-GPS-200).
    sub_start = g0.sec - 6.0 + (start_bit + offs[0]) * 0.020
    dmod = (tows[0] * 6.0 - (sub_start + 6.0)) % 604800.0
    assert min(dmod, 604800.0 - dmod) < 1e-6, (tows[0] * 6.0, sub_start)


def test_ppb_shifts_every_acquired_doppler(fixtures_dir, tmp_path):
    """Oscillator-error closure: with ppb set (and parity mode off), every
    PRN must acquire at f_carr + the modeled LO offset — proving the ppb
    model (reference sdr_hackrf.c:136-138) reaches the emitted IQ."""
    from gpssim_tpu.core.constants import TX_FREQUENCY

    ppb = 10  # reference scale: freq * (1e7 - ppb) / 1e7 -> ~ -1.6 kHz
    out = str(tmp_path / "iq.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=1.0,
        almanac_enable=False, backend=strict_gen_backend(),
        sink="iqfile", out_file=out, ppb=ppb, parity_exact=False,
    )
    offset = TX_FREQUENCY * ((1.0e7 - ppb) / 1.0e7 - 1.0)
    assert abs(offset) > 1000.0  # visible against the 250 Hz search grid

    # Geometry-only Doppler baseline: same scenario without the error.
    from dataclasses import replace

    plan0 = Simulation(replace(cfg, ppb=0)).step()
    run_simulation(cfg)

    dets = acquire(load_iq(out, 8))
    active = {int(p) for p in plan0.prn[plan0.active]}
    assert {d.prn for d in dets} == active

    slots = {int(p): i for i, p in enumerate(plan0.prn) if plan0.active[i]}
    for d in dets:
        expect = plan0.f_carr[slots[d.prn]] + offset
        assert abs(d.doppler_hz - expect) <= 300.0, (d.prn, d.doppler_hz, expect)


def test_acquire_cli(generated, capsys):
    from gpssim_tpu.acquire import main

    out, _ = generated
    assert main([out, "--bits", "8"]) == 0
    text = capsys.readouterr().out
    assert "PRNs acquired" in text and "PRN" in text and "doppler" in text


def test_acquire_at_gps_sdr_sim_rate(fixtures_dir, tmp_path):
    """End-to-end at 2.046 Msps (the gps-sdr-sim code-Nyquist rate, below
    the reference's hard-wired 3.0 Msps): the batched device path takes
    the wide-window kernel and the generated IQ must still be acquirable
    with exactly the simulated PRN set."""
    out = str(tmp_path / "iq.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=1.0,
        almanac_enable=False, backend=SynthBackend.JAX,
        sink="iqfile", out_file=out, sample_rate=2_046_000,
    )
    first_plan = Simulation(cfg).step()
    run_simulation(cfg)
    dets = acquire(load_iq(out, 8), 2_046_000.0)
    active = {int(p) for p in first_plan.prn[first_plan.active]}
    assert {d.prn for d in dets} == active


def test_load_iq_tolerates_truncated_half_pair(tmp_path):
    """A file cut mid-sample-pair (killed writer) loads its valid prefix
    instead of crashing on a broadcast mismatch."""
    p = str(tmp_path / "odd.bin")
    np.arange(7, dtype=np.int8).tofile(p)
    x = load_iq(p, 8)
    assert len(x) == 3
    assert x[0] == 0 + 1j


def test_snr_is_shift_invariant_at_buffer_edges():
    """Circular-correlation SNR must not depend on where the code phase
    lands: a peak at lag 0 (wrap-adjacent bins) must score like an
    interior peak, or edge-phase signals are sporadically missed."""
    from gpssim_tpu.acquire import _resampled_codes

    n = 3000
    code = _resampled_codes(3e6, n)[4]  # PRN 5
    rng = np.random.default_rng(1)
    x = np.tile(code, 5).astype(np.complex64) * 50.0
    x = x + (
        rng.normal(size=x.size) + 1j * rng.normal(size=x.size)
    ).astype(np.complex64) * 5.0

    snrs = []
    for roll in (0, 1, n - 1, 1234):
        dets = acquire(np.roll(x, roll), prns=[5], max_doppler_hz=250.0)
        assert len(dets) == 1, roll
        snrs.append(dets[0].snr)
    assert max(snrs) / min(snrs) < 1.1, snrs


def test_no_false_positives_on_noise():
    rng = np.random.default_rng(0)
    noise = (
        rng.normal(size=8 * 3000) + 1j * rng.normal(size=8 * 3000)
    ).astype(np.complex64) * 100.0
    assert acquire(noise) == []


def test_jax_backend_matches_numpy(generated):
    """The batched device search (backend='jax', single jit over the
    whole bin x PRN grid) must find the same detections as the f64 NumPy
    scan: same PRN set, same Doppler bin and lag per PRN, SNR within
    single-precision tolerance."""
    out, _ = generated
    x = load_iq(out, 8)
    ref = {d.prn: d for d in acquire(x)}
    jx = {d.prn: d for d in acquire(x, backend="jax")}
    assert set(jx) == set(ref)
    for prn, d in ref.items():
        j = jx[prn]
        assert j.doppler_hz == d.doppler_hz, prn
        assert j.code_phase_chips == d.code_phase_chips, prn
        assert abs(j.snr - d.snr) / d.snr < 1e-2, (prn, j.snr, d.snr)


def test_acquire_backend_validation():
    with pytest.raises(ValueError, match="unknown acquisition backend"):
        acquire(np.zeros(40_000, np.complex64), backend="torch")
