"""Generate a GPS L1 IQ file from a RINEX broadcast ephemeris — Python API.

Equivalent CLI: python -m gpssim_tpu -e brdc.22n -l 35.681298,139.766247,10 \
                    -d 30 -r iqfile --out-file iqdata.bin

Usage: python examples/generate_iq.py <rinex_nav_file> [out.bin]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gpssim_tpu import LocationConfig, SimConfig, SynthBackend, run_simulation
from gpssim_tpu.config import honor_jax_platforms_env


def main() -> None:
    honor_jax_platforms_env()  # respect JAX_PLATFORMS=cpu for local runs
    nav = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "fixtures", "brdc_test.22n")
    out = sys.argv[2] if len(sys.argv) > 2 else "iqdata.bin"

    cfg = SimConfig(
        nav_file=nav,
        location=LocationConfig(lat=35.681298, lon=139.766247, height=10.0),
        duration_sec=30.0,
        out_file=out,
        sink="iqfile",
        backend=SynthBackend.JAX,  # XLA kernel: fast on TPU, usable on CPU.
        # On a TPU host prefer SynthBackend.PALLAS (fused kernel; on CPU
        # it falls into interpret mode — minutes per second of signal);
        # SynthBackend.NUMPY is the bit-exact float64 reference path.
    )
    stats = run_simulation(cfg)
    print(
        f"{stats.blocks} blocks ({stats.blocks * 0.1:.1f} s of signal) "
        f"→ {out}: {stats.samples_per_second / 1e6:.1f} Msps "
        f"({stats.realtime_factor:.1f}x realtime)"
    )


if __name__ == "__main__":
    main()
