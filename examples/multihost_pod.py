"""Multi-host scenario synthesis across a TPU pod slice.

Launch ONE copy of this script per host (e.g. with your pod launcher).
On TPU pods jax.distributed auto-detects the topology; on CPU/GPU pass
--coordinator/--nproc/--pid. Each process writes its share of every block
window to <out>.part<pid>; any host (or a post step) merges them.

Example (2 local test processes, 4 virtual CPU devices each):
  python examples/multihost_pod.py --coordinator 127.0.0.1:9999 \
      --nproc 2 --pid 0 &
  python examples/multihost_pod.py --coordinator 127.0.0.1:9999 \
      --nproc 2 --pid 1
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import argparse

from gpssim_tpu import SimConfig
from gpssim_tpu.config import honor_jax_platforms_env
from gpssim_tpu.parallel import multihost


def main() -> None:
    honor_jax_platforms_env()  # respect JAX_PLATFORMS=cpu for local runs
    ap = argparse.ArgumentParser()
    ap.add_argument("--nav-file", default=os.path.join(REPO, "fixtures", "brdc_test.22n"))
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--out", default="iqdata.bin")
    ap.add_argument("--chan-shards", type=int, default=1,
                    help="channel-axis shards (must divide local devices; "
                    "the psum rides ICI)")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nproc", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force N virtual CPU devices (testing)")
    args = ap.parse_args()

    if args.cpu_devices:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    multihost.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.nproc,
        process_id=args.pid,
    )

    cfg = SimConfig(
        nav_file=args.nav_file,
        duration_sec=args.duration,
        out_file=args.out,
        almanac_enable=False,
    )
    part = multihost.run_scenario_multihost(cfg, chan_shards=args.chan_shards)
    print(f"wrote {part}")

    import jax

    if jax.process_index() == 0:
        print(
            f"merge with: python -c \"from gpssim_tpu.parallel.multihost "
            f"import merge_parts; merge_parts({args.out!r}, "
            f"{jax.process_count()})\""
        )


if __name__ == "__main__":
    main()
