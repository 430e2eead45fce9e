#!/usr/bin/env python3
"""Realtime IQ streaming over TCP — the reference's radio TX contract
without a radio.

Starts a loopback consumer (stands in for an SDR host or a remote DSP),
then runs a realtime scenario into the `tcp` sink: IQ enters a bounded
FIFO, transmission begins only once the FIFO pre-buffer has filled (the
reference's fifo_wait_full barrier, fifo.c:97-103), blocks leave at the
DAC byte rate, and any pacing miss is counted as an underrun.

    python examples/tcp_stream.py fixtures/brdc_test.22n

Swap the loopback consumer for a real endpoint with
    python -m gpssim_tpu -e brdc.22n --realtime -r tcp --tcp-addr host:port
"""

import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gpssim_tpu.config import (  # noqa: E402
    SimConfig, SynthBackend, honor_jax_platforms_env,
)
from gpssim_tpu.io.sinks import TcpSink  # noqa: E402
from gpssim_tpu.ops.synth_seq import seq_available  # noqa: E402
from gpssim_tpu.runner import run_simulation  # noqa: E402


def main() -> int:
    honor_jax_platforms_env()  # respect JAX_PLATFORMS=cpu for local runs
    nav = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "fixtures", "brdc_test.22n"
    )

    # Loopback consumer: report received rate once per second.
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    got = [0]

    def consume():
        conn, _ = srv.accept()
        t0 = time.perf_counter()
        last = 0
        with conn:
            while True:
                data = conn.recv(1 << 16)
                if not data:
                    break
                got[0] += len(data)
                if got[0] - last > 6_000_000:
                    dt = time.perf_counter() - t0
                    print(f"  consumer: {got[0]/1e6:.1f} MB "
                          f"({got[0]/dt/6e6:.2f}x realtime)")
                    last = got[0]

    threading.Thread(target=consume, daemon=True).start()

    backend = SynthBackend.NATIVE if seq_available() else SynthBackend.NUMPY
    cfg = SimConfig(
        nav_file=nav, duration_sec=20.0, almanac_enable=False,
        backend=backend, realtime=True, sink="tcp",
        sample_rate=3_000_000 if backend is SynthBackend.NATIVE else 480_000,
    )
    sink = TcpSink(addr=f"127.0.0.1:{port}", fifo_depth=8, pace=True)
    print(f"streaming {cfg.duration_sec:.0f}s at {cfg.sample_rate/1e6:.1f} "
          f"Msps ({backend.value} backend) to 127.0.0.1:{port} ...")
    stats = run_simulation(cfg, sink=sink)
    print(f"done: {stats.blocks} blocks, {sink.underruns} underruns, "
          f"{sink.bytes_sent/1e6:.1f} MB sent")
    sink.close()
    srv.close()
    return 0 if sink.underruns == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
