"""Sink-layer behavior: HackRF transfer repacking and registry."""

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
