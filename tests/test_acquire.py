"""Receiver-side validation: the generated stream must be acquirable.

The software analog of the reference's physical end-to-end test (feed the
RF output to a receiver, SURVEY §4): an FFT code-phase search over the
generated IQ must detect exactly the simulated PRNs, at the simulated
Doppler and code phase.
"""

import numpy as np
import pytest

from gpssim_tpu.acquire import acquire, load_iq
from gpssim_tpu.config import SimConfig, SynthBackend
from gpssim_tpu.runner import run_simulation
from gpssim_tpu.scenario import Simulation


@pytest.fixture(scope="module")
def generated(fixtures_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("acq") / "iq.bin")
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=1.0,
        almanac_enable=False, backend=SynthBackend.NUMPY,
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


def test_no_false_positives_on_noise():
    rng = np.random.default_rng(0)
    noise = (
        rng.normal(size=8 * 3000) + 1j * rng.normal(size=8 * 3000)
    ).astype(np.complex64) * 100.0
    assert acquire(noise) == []
