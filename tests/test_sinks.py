"""Sink-layer behavior: HackRF transfer repacking and registry."""

import os

import numpy as np
import pytest

from gpssim_tpu.io.sinks import HackRfSink, make_sink, register_sink, Sink


def test_hackrf_repacks_blocks_into_transfers():
    """0.1 s blocks (600,000 int8 IQ values at 3 Msps / 8-bit) must repack
    seamlessly into 262,144-element transfers (gps.c:2847-2856)."""
    chunks = []
    sink = HackRfSink(device=chunks.append)
    sink.init()

    rng = np.random.default_rng(0)
    blocks = [
        rng.integers(-128, 128, size=600_000, dtype=np.int8)
        for _ in range(3)
    ]
    for b in blocks:
        sink.write(b)

    stream = np.concatenate(blocks)
    n = sink.transfer_size
    assert all(len(c) == n for c in chunks)
    assert len(chunks) == len(stream) // n
    assert np.array_equal(np.concatenate(chunks), stream[: len(chunks) * n])
    sink.close()


def test_hackrf_without_device_raises():
    with pytest.raises(RuntimeError, match="hardware not available"):
        HackRfSink().init()


def test_pluto_pushes_whole_blocks():
    from gpssim_tpu.io.sinks import PlutoSink

    pushes = []
    sink = PlutoSink(device=pushes.append)
    sink.init()
    block = np.arange(600_000, dtype=np.int16)
    sink.write(block)
    assert len(pushes) == 1 and pushes[0].dtype == np.int16
    assert np.array_equal(pushes[0], block)
    with pytest.raises(RuntimeError, match="hardware not available"):
        PlutoSink().init()


def test_registry_round_trip():
    class Custom(Sink):
        name = "custom"

    register_sink("custom", Custom)
    assert isinstance(make_sink("custom"), Custom)
    with pytest.raises(ValueError, match="unknown sink"):
        make_sink("nope")


def test_iqfile_writer_thread_error_surfaces_and_close_does_not_hang(
    tmp_path,
):
    """A dead drain thread (I/O error mid-run) must surface as an error
    on the next write/close instead of deadlocking the producer."""
    import time

    from gpssim_tpu.io.sinks import IqFileSink

    sink = IqFileSink(path=str(tmp_path / "x.bin"), engine="python")
    sink.init()
    sink._fp.close()  # force tofile() in the writer thread to fail
    blk = np.zeros(16, dtype=np.int8)
    with pytest.raises(RuntimeError, match="writer thread failed"):
        for _ in range(200):
            sink.write(blk)
            time.sleep(0.005)
    with pytest.raises(RuntimeError, match="writer thread failed"):
        sink.close()  # must return (not spin on depth_used) and report


class _LoopbackServer:
    """Accept one connection and drain everything it sends."""

    def __init__(self):
        import socket
        import threading

        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.received = bytearray()
        self.first_byte_t = None
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        import time

        conn, _ = self.srv.accept()
        with conn:
            while True:
                data = conn.recv(1 << 16)
                if not data:
                    return
                if self.first_byte_t is None:
                    self.first_byte_t = time.perf_counter()
                self.received.extend(data)

    def join(self, timeout=30):
        self._t.join(timeout)
        self.srv.close()


@pytest.mark.parametrize("engine", ["native", "python"])
def test_tcp_sink_stream_integrity(engine):
    """Every byte written arrives, in order, over loopback."""
    from gpssim_tpu.io import native as native_mod
    from gpssim_tpu.io.sinks import TcpSink

    if engine == "native" and not native_mod.available():
        pytest.skip("native runtime unavailable")
    srv = _LoopbackServer()
    sink = TcpSink(addr=f"127.0.0.1:{srv.port}", fifo_depth=4,
                   pace=False, engine=engine)
    sink.init()
    rng = np.random.default_rng(3)
    blocks = [rng.integers(-128, 128, 60_000, dtype=np.int8)
              for _ in range(10)]
    for b in blocks:
        sink.write(b)
    sink.close()
    srv.join()
    want = np.concatenate(blocks).tobytes()
    assert bytes(srv.received) == want


@pytest.mark.parametrize("engine", ["native", "python"])
def test_tcp_sink_end_stream_flushes_queue(engine):
    """end_stream() marks the stream complete WITHOUT discarding queued
    blocks: everything written before it must still arrive (on both
    engines — the Python BlockFifo's halt() clears its queue, so
    end_stream must use finished semantics there), and a drained-out
    tail after end_stream must not count as underruns."""
    from gpssim_tpu.io import native as native_mod
    from gpssim_tpu.io.sinks import TcpSink

    if engine == "native" and not native_mod.available():
        pytest.skip("native runtime unavailable")
    srv = _LoopbackServer()
    sink = TcpSink(addr=f"127.0.0.1:{srv.port}", fifo_depth=8,
                   pace=False, engine=engine, start_timeout_s=5.0)
    sink.init()
    rng = np.random.default_rng(7)
    # Fewer blocks than the FIFO depth: without the flush semantics the
    # whole stream sits in the queue at end_stream time.
    blocks = [rng.integers(-128, 128, 50_000, dtype=np.int8)
              for _ in range(3)]
    for b in blocks:
        sink.write(b)
    sink.end_stream()
    sink.close()
    srv.join()
    want = np.concatenate(blocks).tobytes()
    assert bytes(srv.received) == want
    assert sink.underruns == 0


@pytest.mark.parametrize("engine", ["native", "python"])
def test_tcp_sink_start_full_barrier(engine):
    """No byte may leave before the FIFO has filled once (the reference's
    fifo_wait_full start barrier, fifo.c:97-103, sdr_iqfile.c:74)."""
    import time

    from gpssim_tpu.io import native as native_mod
    from gpssim_tpu.io.sinks import TcpSink

    if engine == "native" and not native_mod.available():
        pytest.skip("native runtime unavailable")
    srv = _LoopbackServer()
    sink = TcpSink(addr=f"127.0.0.1:{srv.port}", fifo_depth=4,
                   pace=False, engine=engine, start_timeout_s=20.0)
    sink.init()
    block = np.zeros(60_000, dtype=np.int8)
    # Fewer writes than the FIFO depth: barrier must hold.
    for _ in range(2):
        sink.write(block)
    time.sleep(0.3)
    assert not sink.started
    assert srv.first_byte_t is None
    t_fill = time.perf_counter()
    for _ in range(4):
        sink.write(block)
    deadline = time.perf_counter() + 10
    while not sink.started and time.perf_counter() < deadline:
        time.sleep(0.01)
    assert sink.started
    sink.close()
    srv.join()
    assert srv.first_byte_t is not None and srv.first_byte_t >= t_fill
    assert len(srv.received) == 6 * 60_000


def test_tcp_sink_realtime_scenario(fixtures_dir):
    """End-to-end realtime TX contract: ≥1x realtime over loopback with
    zero underruns after the pre-buffer (VERDICT r1 item 3). Paced at the
    DAC byte rate; the whole 12 s scenario must stream in ~12 s wall (the
    pacing clock), not less, and the producer must never starve it."""
    import time

    from gpssim_tpu.config import SimConfig, SynthBackend
    from gpssim_tpu.io.sinks import TcpSink
    from gpssim_tpu.runner import run_simulation

    from gpssim_tpu.ops.synth_seq import seq_available

    # Native backend sustains ~8x realtime at the reference's 3 Msps on
    # CPU; without the C++ runtime fall back to the f64 parity path at a
    # rate it can hold (~2x). The TX contract is rate-independent.
    if seq_available():
        backend, rate = SynthBackend.NATIVE, 3_000_000
    else:
        backend, rate = SynthBackend.NUMPY, 480_000
    srv = _LoopbackServer()
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=12.0,
        almanac_enable=False, backend=backend,
        sample_rate=rate, realtime=True, sink="tcp",
    )
    sink = TcpSink(addr=f"127.0.0.1:{srv.port}", fifo_depth=8, pace=True)
    t0 = time.perf_counter()
    stats = run_simulation(cfg, sink=sink)
    underruns = sink.underruns
    bytes_sent = sink.bytes_sent
    sink.close()
    wall = time.perf_counter() - t0
    srv.join()
    n_blocks = stats.blocks
    expect = n_blocks * 2 * (rate // 10)
    assert bytes_sent == expect and len(srv.received) == expect
    assert underruns == 0, f"{underruns} underruns"
    # Paced: wall time ≈ signal time (less the fifo pre-buffer lead).
    signal = n_blocks * 0.1
    assert wall >= signal - 1.0
    assert wall <= signal + 5.0, f"fell behind realtime: {wall:.1f}s"


@pytest.mark.skipif(
    not os.environ.get("GPSSIM_TEST_TPU"), reason="needs the real TPU chip"
)
def test_tcp_sink_realtime_device_backend(fixtures_dir):
    """The VERDICT r1 contract on the real rig: ≥30 s of 8-bit signal at
    the reference's 3 Msps over loopback in ≤ wall realtime, zero
    underruns after warmup, device (JAX) backend."""
    import time

    from gpssim_tpu.config import SimConfig, SynthBackend
    from gpssim_tpu.io.sinks import TcpSink
    from gpssim_tpu.runner import run_simulation

    srv = _LoopbackServer()
    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=31.0,
        almanac_enable=False, backend=SynthBackend.JAX,
        realtime=True, sink="tcp",
    )
    # Warm the kernel compile cache with the same shapes (the remote
    # compile service can take minutes; realtime starts after warmup,
    # exactly as a real TX session would).
    from dataclasses import replace

    warm = replace(cfg, duration_sec=1.0, realtime=False, sink="null")
    run_simulation(warm)
    sink = TcpSink(addr=f"127.0.0.1:{srv.port}", fifo_depth=8, pace=True)
    t0 = time.perf_counter()
    stats = run_simulation(cfg, sink=sink)
    underruns = sink.underruns
    sink.close()
    wall = time.perf_counter() - t0
    srv.join()
    assert stats.blocks * 0.1 >= 30.0
    assert len(srv.received) == stats.blocks * 600_000
    assert underruns == 0, f"{underruns} underruns"
    assert wall <= stats.blocks * 0.1 + 8.0, f"behind realtime: {wall:.1f}s"


def test_hackrf_start_failure_surfaces_on_write(monkeypatch):
    """A TX-start failure on the background barrier thread must halt the
    FIFO and surface on the next write — not die silently with the
    daemon thread while the producer keeps queueing."""
    import time

    from gpssim_tpu.io import hw_hackrf
    from gpssim_tpu.io.fifo import BlockFifo

    class FailingTx:
        def __init__(self, **kw):
            self.fifo = BlockFifo(4)

        def push(self, block):
            if not self.fifo.enqueue(np.asarray(block, dtype=np.int8)):
                raise hw_hackrf.HackRfError("TX fifo halted")

        def start(self, timeout_s=30.0):
            raise hw_hackrf.HackRfError("no board found")

        def close(self):
            self.fifo.halt()

    monkeypatch.setattr(hw_hackrf, "hackrf_available", lambda p=None: True)
    monkeypatch.setattr(hw_hackrf, "HackRfTx", FailingTx)

    sink = HackRfSink()
    sink.init()
    deadline = time.time() + 5.0
    while sink._start_error is None and time.time() < deadline:
        time.sleep(0.01)
    assert sink._start_error is not None
    with pytest.raises(RuntimeError, match="TX start failed"):
        sink.write(np.zeros(600_000, dtype=np.int8))
    sink.close()


@pytest.mark.parametrize("engine", ["native", "python"])
def test_tcp_sink_close_bounded_with_stalled_peer(engine):
    """A peer that stops reading must not hang close() (and with it the
    whole run): the flush gives up after flush_timeout_s, the stuck send
    is aborted, and close returns."""
    import socket
    import threading
    import time

    from gpssim_tpu.io import native as native_mod
    from gpssim_tpu.io.sinks import TcpSink

    if engine == "native" and not native_mod.available():
        pytest.skip("native runtime unavailable")

    srv = socket.socket()
    # Small receive window so the kernel can't absorb the whole stream.
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 32768)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    sink = TcpSink(addr=f"127.0.0.1:{port}", fifo_depth=2, pace=False,
                   engine=engine, start_timeout_s=0.2, flush_timeout_s=1.0)
    sink.init(None)
    conn, _ = srv.accept()  # accepted but NEVER read

    blk = np.zeros(1_200_000, dtype=np.int8)
    stop = []

    def producer():
        try:
            for _ in range(16):
                sink.write(blk)
        except (RuntimeError, OSError):
            stop.append(True)  # halted by close — expected

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    time.sleep(1.0)  # let the drain wedge against the full socket
    t0 = time.monotonic()
    try:
        sink.close()
    except (RuntimeError, OSError):
        pass  # an aborted flush may surface as an error — loud beats hung
    assert time.monotonic() - t0 < 8.0
    t.join(timeout=2)
    assert not t.is_alive()  # producer unblocked, not deadlocked
    conn.close()
    srv.close()
