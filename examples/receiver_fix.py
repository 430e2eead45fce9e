"""Close the loop: simulate a GPS scenario, then obtain a position fix
from the generated IQ with the built-in software receiver.

The receiver uses only the IQ bytes — acquisition, tracking, LNAV
ephemeris decoding, pseudoranges, and a RAIM'd least-squares solve — and
lands within a couple of meters of the simulated location.

Usage: python examples/receiver_fix.py [rinex_nav_file]
"""

import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gpssim_tpu import LocationConfig, SimConfig, SynthBackend, run_simulation
from gpssim_tpu.acquire import load_iq
from gpssim_tpu.config import honor_jax_platforms_env
from gpssim_tpu.core.constants import R2D
from gpssim_tpu.receiver import receiver_fix
from gpssim_tpu.scenario import Simulation


def main() -> None:
    honor_jax_platforms_env()  # respect JAX_PLATFORMS=cpu for local runs
    nav = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "fixtures", "brdc_test.22n")
    out = os.path.join(tempfile.mkdtemp(prefix="gpssim_rx_"), "iq.bin")
    rate = 2_600_000

    cfg = SimConfig(
        nav_file=nav,
        location=LocationConfig(lat=35.681298, lon=139.766247, height=10.0),
        duration_sec=20.0,  # subframes 1-3 (ephemeris) span the first 18 s
        sample_rate=rate,
        almanac_enable=False,
        ionosphere_enable=False,
        backend=SynthBackend.NUMPY,
        sink="iqfile",
        out_file=out,
    )
    sim = Simulation(cfg)
    truth = np.array(sim.xyz0)
    print(f"simulating 20 s of L1 baseband -> {out}")
    run_simulation(cfg, sim=sim)

    print("running software receiver (acquire / track / decode / solve)...")
    x = load_iq(out, bits=8)
    fix, channels, _, _ = receiver_fix(x, rate, week_hint=sim.g0.week)

    err = np.linalg.norm(fix.xyz - truth)
    print(f"tracked PRNs: {[c.prn for c in channels]}  used in fix: {fix.prns}")
    print(
        f"fix: lat {fix.llh[0] * R2D:.6f}  lon {fix.llh[1] * R2D:.6f}  "
        f"h {fix.llh[2]:.1f} m"
    )
    print(f"position error vs simulated truth: {err:.2f} m")
    print(f"velocity (static scenario): {np.linalg.norm(fix.vel):.3f} m/s")
    print(f"residual RMS: {fix.residual_rms_m:.2f} m over {fix.nsats} sats")


if __name__ == "__main__":
    main()
