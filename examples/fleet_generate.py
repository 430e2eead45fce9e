"""Fleet mode: synthesize MANY scenarios in one batched device pipeline.

The synthesis kernel is a pure function of per-block plans, so blocks
from different scenarios batch on one axis — N locations' IQ streams
come off a single chip at the same aggregate rate as one scenario (the
reference runs one stateful stream per process, gps.c:2767-2836).
Every member's file is bit-identical to a solo run of that scenario.

Usage: python examples/fleet_generate.py <rinex_nav_file> [n_members]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gpssim_tpu import LocationConfig, SimConfig, SynthBackend
from gpssim_tpu.config import honor_jax_platforms_env
from gpssim_tpu.fleet import run_fleet


def main() -> None:
    honor_jax_platforms_env()  # respect JAX_PLATFORMS=cpu for local runs
    nav = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "fixtures", "brdc_test.22n"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    # A ring of receiver locations around Tokyo, one output file each.
    cfgs = [
        SimConfig(
            nav_file=nav,
            location=LocationConfig(
                lat=35.681298 + 0.05 * (i % 3 - 1),
                lon=139.766247 + 0.07 * (i // 3 - 1),
                height=10.0 + 5.0 * i,
            ),
            duration_sec=10.0,
            sink="iqfile",
            out_file=f"fleet_member{i}.bin",
            backend=SynthBackend.JAX,
        )
        for i in range(n)
    ]
    stats = run_fleet(cfgs)
    total = sum(st.samples for st in stats)
    total_blocks = sum(st.blocks for st in stats)
    wall = max(st.wall_seconds for st in stats)
    for i, st in enumerate(stats):
        print(f"member {i}: {st.blocks} blocks → fleet_member{i}.bin")
    print(
        f"fleet aggregate: {total / 1e6:.0f} M samples "
        f"in {wall:.1f} s = {total / wall / 1e6:.1f} Msps "
        f"(aggregate {total_blocks * 0.1 / wall:.1f}x realtime; "
        f"~{total_blocks * 0.1 / wall / n:.1f}x per member)"
    )


if __name__ == "__main__":
    main()
