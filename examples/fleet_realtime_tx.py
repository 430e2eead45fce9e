"""Realtime fleet TX: N paced TCP streams from ONE batched pipeline.

Each fleet member streams its own L1 IQ signal to its own TCP receiver
(e.g. N software radios / hardware drivers listening on consecutive
ports), paced to wall clock as one pipeline. The reference can serve
exactly one stream per process (gps.c:2767-2836 + fifo.c); here a single
device pipeline feeds the whole farm, and the realtime supervisor fails
the fleet over to the native sequential engine — byte-identically in
strict-parity mode — if the device path cannot hold N x realtime (for
example when the device transport is the bottleneck, runner.py
RealtimeSupervisor).

Usage:
  # start N listeners first, e.g.:  for p in 4729 4730 4731; do
  #     nc -l $p > /dev/null &  done
  python examples/fleet_realtime_tx.py <rinex_nav> [n_members] [base_port]

Equivalent CLI:
  python -m gpssim_tpu -e <rinex_nav> -d 30 -r tcp --tcp-addr \
      127.0.0.1:4729 --realtime --fleet roster.csv
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gpssim_tpu import LocationConfig, SimConfig
from gpssim_tpu.config import SampleFormat, honor_jax_platforms_env
from gpssim_tpu.fleet import run_fleet
from gpssim_tpu.io.sinks import TcpSink


def main() -> None:
    honor_jax_platforms_env()
    nav = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "fixtures", "brdc_test.22n"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    base_port = int(sys.argv[3]) if len(sys.argv) > 3 else 4729

    cfgs = [
        SimConfig(
            nav_file=nav,
            duration_sec=30.0,
            almanac_enable=False,
            realtime=True,
            sink="tcp",
            sample_format=SampleFormat.SC08,
            location=LocationConfig(35.6 + 0.1 * i, 139.7 + 0.1 * i, 10.0),
        )
        for i in range(n)
    ]
    sinks = [
        TcpSink(addr=f"127.0.0.1:{base_port + i}", pace=True)
        for i in range(n)
    ]
    stats = run_fleet(cfgs, sinks=sinks)
    for i, (s, st) in enumerate(zip(sinks, stats)):
        print(f"member {i}: {st.blocks * 0.1:.1f} s of signal streamed, "
              f"{s.underruns} underruns")
    if stats[0].failovers:
        lat = stats[0].failover_latency_s
        detail = (
            f"first native block at the sink {lat * 1e3:.0f} ms after "
            "the decision" if lat is not None
            else "no blocks remained to synthesize natively"
        )
        print(f"supervisor failover(s): {stats[0].failovers} ({detail})")


if __name__ == "__main__":
    main()
