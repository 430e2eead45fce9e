"""Receiver farm: a fleet of noisy scenarios, each validated by the
built-in software receiver.

Ties the framework's QA loop together: N locations synthesize through
ONE batched device pipeline (fleet.py), each stream carries its own
deterministic AWGN realization (noise.py), and the software receiver
(receiver.py) recovers a meter-level position fix from every member's
bytes — the closed-loop test rig the reference delegates to physical
hardware.

Usage: python examples/receiver_farm.py [rinex_nav_file] [n_members]
(CPU note: synthesis + tracking take a few minutes per member.)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from gpssim_tpu import LocationConfig, SimConfig, SynthBackend
from gpssim_tpu.acquire import load_iq
from gpssim_tpu.config import honor_jax_platforms_env
from gpssim_tpu.fleet import run_fleet
from gpssim_tpu.receiver import receiver_fix
from gpssim_tpu.scenario import Simulation

RATE = 2_600_000


def main() -> None:
    honor_jax_platforms_env()  # respect JAX_PLATFORMS=cpu for local runs
    nav = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "fixtures", "brdc_test.22n"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    cfgs = [
        SimConfig(
            nav_file=nav,
            location=LocationConfig(
                lat=35.681298 + 0.1 * i, lon=139.766247 - 0.05 * i,
                height=10.0 + 20.0 * i,
            ),
            duration_sec=20.0, sample_rate=RATE,
            almanac_enable=False, ionosphere_enable=False,
            sink="iqfile", out_file=f"farm_member{i}.bin",
            backend=SynthBackend.JAX,
            noise_std_lsb=3.0, noise_seed=100 + i,
        )
        for i in range(n)
    ]
    truths = [np.array(Simulation(c).xyz0) for c in cfgs]
    week = Simulation(cfgs[0]).g0.week

    stats = run_fleet(cfgs)
    print(f"fleet synthesized {sum(st.blocks for st in stats)} blocks "
          f"({n} members x 20 s, 3-LSB AWGN)")

    for i, (cfg, truth) in enumerate(zip(cfgs, truths)):
        fix, channels, _, _ = receiver_fix(
            load_iq(cfg.out_file, 8), RATE, week_hint=week
        )
        err = float(np.linalg.norm(fix.xyz - truth))
        print(f"member {i}: {len(channels)} SVs tracked, "
              f"position error {err:.2f} m "
              f"({'OK' if err < 10.0 else 'FAIL'})")


if __name__ == "__main__":
    main()
