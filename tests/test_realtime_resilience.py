"""Realtime degradation handling (VERDICT r2 item 7).

The reference lets the radio starve silently when the producer cannot
sustain 1x (fifo.c:97-148 has no detection path). The framework's
RealtimeSupervisor detects a sustained production deficit, attributes it
(synthesis-bound vs transport-bound), and responds per policy: failover
to the native sequential engine, attributed failure, or counted warning.
"""

import dataclasses
import socket
import threading
import time

import numpy as np
import pytest

from gpssim_tpu.config import SimConfig, SynthBackend
from gpssim_tpu.runner import (
    RealtimeDeficitError,
    RealtimeSupervisor,
    RunStats,
    run_simulation,
)


def _seq_available():
    from gpssim_tpu.ops.synth_seq import seq_available

    return seq_available()


# ---------------------------------------------------------------------------
# Supervisor unit behavior (stub sink — no timing dependence)
# ---------------------------------------------------------------------------


class _StubSink:
    def __init__(self, backlogged=False, underruns=0):
        self.backlogged = backlogged
        self.underruns = underruns


def _cfg(**kw):
    kw.setdefault("nav_file", "unused")
    kw.setdefault("fifo_depth", 2)
    kw.setdefault("realtime", True)
    return SimConfig(**kw)


def test_supervisor_no_action_within_budget():
    stats = RunStats(blocks=10)
    sup = RealtimeSupervisor(_cfg(), _StubSink(), stats)
    # 10 blocks written, 0.9 s elapsed: 0.1 s AHEAD of wall clock.
    assert sup.check(time.perf_counter() - 0.9) is None
    assert stats.events == []


def test_supervisor_grace_then_failover():
    """A steady in-band deficit (above ACT_FRACTION*budget but not yet
    starving) gets one grace check, then fails over — while lead
    remains to cover the switch."""
    if not _seq_available():
        pytest.skip("native engine unavailable")
    stats = RunStats(blocks=0)
    sup = RealtimeSupervisor(_cfg(), _StubSink(), stats)
    # 0.15 s behind, budget 0.2 s: in the (0.1, 0.2) grace band, and not
    # growing, so starvation is not imminent.
    t0 = time.perf_counter() - 0.15
    assert sup.check(t0) is None  # first strike: grace
    assert sup.check(t0) == "failover"  # second strike (growth ~ 0)
    assert stats.failovers == 1
    assert any("failing over" in e for e in stats.events)
    # once failed over, further deficits only log
    assert sup.check(t0) is None
    assert sup.check(t0) is None


def test_supervisor_starving_acts_without_grace():
    """Lag at/above the FULL budget means the paced sink is already (or
    imminently) starving: grace would only add stream gaps, so the very
    first check acts."""
    if not _seq_available():
        pytest.skip("native engine unavailable")
    stats = RunStats(blocks=0)
    sup = RealtimeSupervisor(_cfg(), _StubSink(), stats)
    t0 = time.perf_counter() - 1.0  # 1 s behind, budget 0.2 s
    assert sup.check(t0) == "failover"
    assert stats.failovers == 1


def test_supervisor_growing_deficit_preempts_grace():
    """In-band lag whose per-check growth will cross the budget before
    the next check (checks are spaced by batch drains — slow on exactly
    the degraded path) acts now instead of waiting out the grace."""
    if not _seq_available():
        pytest.skip("native engine unavailable")
    stats = RunStats(blocks=0)
    sup = RealtimeSupervisor(_cfg(), _StubSink(), stats)
    t0 = time.perf_counter() - 0.02
    assert sup.check(t0) is None  # healthy: records prev_lag ~0.02
    time.sleep(0.13)  # lag now ~0.15: in band, growth ~0.13
    # 0.15 + 0.13 >= 0.2 -> imminent, acts on this first strike
    assert sup.check(t0) == "failover"
    assert stats.failovers == 1


def test_supervisor_policy_fail_attributes_synthesis():
    stats = RunStats(blocks=0)
    sup = RealtimeSupervisor(
        _cfg(realtime_policy="fail"), _StubSink(underruns=3), stats
    )
    t0 = time.perf_counter() - 1.0  # starving: acts on the first check
    with pytest.raises(RealtimeDeficitError, match="synthesis below 1x"):
        sup.check(t0)
    assert any("3 sink underruns" in e for e in stats.events)


def test_supervisor_transport_bound_never_fails_over():
    """Sink FIFO full while lagging = the TRANSPORT is below the DAC
    rate; a synthesis failover cannot help and must not fire."""
    stats = RunStats(blocks=0)
    sup = RealtimeSupervisor(_cfg(), _StubSink(backlogged=True), stats)
    t0 = time.perf_counter() - 1.0
    assert sup.check(t0) is None
    assert sup.check(t0) is None  # attributed, no failover
    assert stats.failovers == 0
    assert any("sink transport below 1x" in e for e in stats.events)


def test_supervisor_transport_bound_policy_fail():
    stats = RunStats(blocks=0)
    sup = RealtimeSupervisor(
        _cfg(realtime_policy="fail"), _StubSink(backlogged=True), stats
    )
    t0 = time.perf_counter() - 1.0
    sup.check(t0)
    with pytest.raises(RealtimeDeficitError, match="sink transport"):
        sup.check(t0)


def test_supervisor_rejects_unknown_policy():
    with pytest.raises(ValueError, match="realtime_policy"):
        RealtimeSupervisor(
            _cfg(realtime_policy="nope"), _StubSink(), RunStats()
        )


# ---------------------------------------------------------------------------
# End-to-end failover: a too-slow producer recovers via the native engine
# and the written stream stays byte-identical to an offline strict run.
# ---------------------------------------------------------------------------


def _scenario_cfg(fixtures_dir, tmp_path, name, **kw):
    return SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        duration_sec=kw.pop("duration_sec", 3.0),
        almanac_enable=False,
        out_file=str(tmp_path / name),
        **kw,
    )


@pytest.mark.parametrize("fifo_depth,label", [(2, "block-by-block"), (8, "batched")])
def test_realtime_failover_recovers_and_stream_identical(
    fixtures_dir, tmp_path, fifo_depth, label
):
    """JAX-on-CPU synthesis is well below 1x at 3 Msps; a paced realtime
    run must fail over to the native engine, finish, and produce the
    same strict-parity bytes as an offline run."""
    if not _seq_available():
        pytest.skip("native engine unavailable")
    cfg = _scenario_cfg(
        fixtures_dir, tmp_path, f"rt_{fifo_depth}.bin",
        backend=SynthBackend.JAX, realtime=True, fifo_depth=fifo_depth,
    )
    stats = run_simulation(cfg)
    assert stats.failovers == 1, (label, stats.events)
    assert any("failing over" in e for e in stats.events)
    assert stats.blocks == cfg.num_epochs - 1

    ref_cfg = dataclasses.replace(
        cfg, realtime=False, backend=SynthBackend.NUMPY,
        out_file=str(tmp_path / f"ref_{fifo_depth}.bin"),
    )
    run_simulation(ref_cfg)
    a = np.fromfile(cfg.out_file, dtype=np.int8)
    b = np.fromfile(ref_cfg.out_file, dtype=np.int8)
    assert a.size == b.size and np.array_equal(a, b), label


def test_realtime_policy_fail_raises(fixtures_dir, tmp_path):
    cfg = _scenario_cfg(
        fixtures_dir, tmp_path, "rt_fail.bin",
        backend=SynthBackend.JAX, realtime=True, fifo_depth=2,
        realtime_policy="fail",
    )
    with pytest.raises(RealtimeDeficitError, match="below 1x"):
        run_simulation(cfg)


# ---------------------------------------------------------------------------
# TcpSink.backlogged: the transport-bound probe flips when the socket
# can no longer absorb the DAC rate (unread loopback peer).
# ---------------------------------------------------------------------------


def test_tcp_sink_backlogged_probe():
    from gpssim_tpu.io.sinks import TcpSink

    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 32768)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    sink = TcpSink(addr=f"127.0.0.1:{port}", fifo_depth=2, pace=False,
                   engine="python", start_timeout_s=1.0,
                   flush_timeout_s=0.5)
    sink.init(None)
    conn, _ = srv.accept()
    conn.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 32768)
    try:
        assert not sink.backlogged
        block = np.zeros(600_000, dtype=np.int16)  # 1.2 MB per block

        stop = threading.Event()

        def produce():
            try:
                while not stop.is_set():
                    sink.write(block)
            except RuntimeError:
                pass  # halted at close

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        deadline = time.time() + 15.0
        while time.time() < deadline and not sink.backlogged:
            time.sleep(0.05)
        assert sink.backlogged, "unread peer never backlogged the sink"
    finally:
        stop.set()
        sink.fifo.halt()
        t.join(timeout=5)
        sink.close()
        conn.close()
        srv.close()


def test_realtime_failover_paced_tcp_zero_underruns(fixtures_dir, tmp_path):
    """The failover must land BEFORE the paced sink starves: with the
    supervisor acting at half the FIFO budget (ACT_FRACTION) and the
    in-flight batches re-synthesized natively (never fetched back
    through the slow path), a run whose device backend is far below 1x
    streams its full paced TX with ZERO underruns — the gap the
    reference cannot close (fifo.c:97-148 starves silently)."""
    if not _seq_available():
        pytest.skip("native engine unavailable")
    from tests.test_sinks import _LoopbackServer

    from gpssim_tpu.io.sinks import TcpSink

    srv = _LoopbackServer()
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=4.0,
        almanac_enable=False, backend=SynthBackend.JAX,
        realtime=True, sink="tcp", fifo_depth=8,
    )
    sink = TcpSink(addr=f"127.0.0.1:{srv.port}", fifo_depth=8, pace=True)
    stats = run_simulation(cfg, sink=sink)
    underruns = sink.underruns
    bytes_sent = sink.bytes_sent
    sink.close()
    srv.join()
    assert stats.failovers == 1, stats.events
    assert bytes_sent == stats.blocks * 600_000
    assert len(srv.received) == bytes_sent
    assert underruns == 0, f"{underruns} underruns across failover"

    # And the paced, failed-over stream is byte-identical to an offline
    # strict-parity run of the same scenario.
    ref_cfg = dataclasses.replace(
        cfg, realtime=False, backend=SynthBackend.NUMPY, sink="iqfile",
        out_file=str(tmp_path / "ref_tcp.bin"),
    )
    run_simulation(ref_cfg)
    ref = np.fromfile(ref_cfg.out_file, dtype=np.int8).tobytes()
    assert bytes(srv.received) == ref
