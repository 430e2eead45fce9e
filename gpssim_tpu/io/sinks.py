"""Output sinks: registry + IQ file writer + null + hardware stubs.

Re-design of the reference's SDR backend vtable (sdr.c:24-99): a sink
registry keyed by name, each sink exposing init/write/close/set_gain.
The iqfile sink (reference sdr_iqfile.c) is the primary one for parity and
benchmark runs; hackrf/plutosdr are interface stubs carrying the reference's
constraints (sample format forcing, gain ranges, ppb-to-LO model) so a
hardware backend can slot in without touching the pipeline.
"""

from __future__ import annotations

import threading
from typing import Callable

import numpy as np

from .fifo import BlockFifo


class Sink:
    """Base sink interface (reference sdr.h:36-39 four-call API)."""

    name = "none"
    forced_sample_bits: int | None = None
    gain_range: tuple[int, int] | None = None

    def init(self, cfg) -> None:  # noqa: D401
        pass

    def write(self, block: np.ndarray) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass

    def set_gain(self, gain: int) -> int:
        return gain


class NullSink(Sink):
    """Discard output (throughput benchmarking)."""

    name = "none"

    def __init__(self):
        self.blocks = 0
        self.samples = 0

    def write(self, block: np.ndarray) -> None:
        self.blocks += 1
        self.samples += len(block) // 2


class IqFileSink(Sink):
    """Stream quantized IQ blocks to a binary file (reference sdr_iqfile.c).

    A writer thread drains a bounded FIFO so synthesis overlaps file I/O,
    mirroring the reference's producer/consumer split. With
    ``engine='native'`` (or 'auto' when the C++ runtime is built) the FIFO
    and drain thread are the native ones from native/gpssim_native.cc.
    """

    name = "iqfile"

    def __init__(self, path: str = "iqdata.bin", fifo_depth: int = 8,
                 threaded: bool = True, engine: str = "auto"):
        self.path = path
        self.fifo = BlockFifo(fifo_depth)
        self.fifo_depth = fifo_depth
        self.threaded = threaded
        self.engine = engine
        self._native = None
        self._fp = None
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None

    def init(self, cfg=None) -> None:
        if self.engine in ("auto", "native"):
            from . import native

            if native.available():
                self._native = native.NativeIqWriter(
                    self.path, fifo_depth=self.fifo_depth
                )
                return
            if self.engine == "native":
                raise RuntimeError(
                    f"native runtime unavailable: {native.load_error()}"
                )
        self._fp = open(self.path, "wb")
        if self.threaded:
            self._thread = threading.Thread(target=self._writer, daemon=True)
            self._thread.start()

    def _writer(self) -> None:
        try:
            while True:
                block = self.fifo.dequeue()
                if block is None:
                    return
                block.tofile(self._fp)
        except BaseException as e:  # surface the I/O error to the producer
            self._error = e
            # Unblock a producer waiting in enqueue (and stop buffering
            # blocks nobody will ever drain).
            self.fifo.halt()

    def _check_writer(self) -> None:
        if self._error is not None:
            raise RuntimeError(
                f"iqfile writer thread failed: {self._error}"
            ) from self._error

    def write(self, block: np.ndarray) -> None:
        if self._native is not None:
            self._native.write(block)
            return
        if self._fp is None:
            self.init()
            if self._native is not None:
                self._native.write(block)
                return
        if self.threaded:
            self._check_writer()
            self.fifo.enqueue(block)
            self._check_writer()
        else:
            block.tofile(self._fp)

    def close(self) -> None:
        if self._native is not None:
            self._native.close()
            self._native = None
            return
        if self.threaded and self._thread is not None:
            # Let the writer drain before halting — unless it died (the
            # queue would never drain and this loop would spin forever).
            while self.fifo.depth_used and self._thread.is_alive():
                import time

                time.sleep(0.001)
            self.fifo.halt()
            self._thread.join(timeout=5)
            self._thread = None
        if self._fp is not None:
            self._fp.close()
            self._fp = None
        self._check_writer()


class HackRfSink(Sink):
    """HackRF TX backend (reference sdr_hackrf.c) minus libusb.

    Preserves the reference's contract: 8-bit samples forced
    (sdr_hackrf.c:44-48), TX gain clamped to 0-47 dB (sdr_hackrf.h:19-20),
    LO shifted by freq*(1e7-ppb)/1e7 (sdr_hackrf.c:136-138), and the
    engine-side repacking of 0.1 s blocks into 262,144-element transfer
    buffers (gps.c:2847-2856 / sdr_hackrf.c:215-218). The ``device``
    callable stands in for the libusb TX callback: it receives each
    int8[262144] transfer in order (hardware integration = supplying a
    callable that pushes to libhackrf)."""

    name = "hackrf"
    forced_sample_bits = 8
    gain_range = (0, 47)
    transfer_size = 262_144

    def __init__(self, device=None):
        self.device = device
        self._stage = np.empty(0, dtype=np.int8)

    def init(self, cfg=None) -> None:
        if self.device is None:
            raise RuntimeError(
                "hackrf hardware not available in this build; pass "
                "HackRfSink(device=...) to supply a TX transfer callable"
            )

    def write(self, block: np.ndarray) -> None:
        if self.device is None:
            raise RuntimeError("hackrf sink has no device")
        self._stage = np.concatenate(
            [self._stage, np.asarray(block, dtype=np.int8)]
        )
        n = self.transfer_size
        while len(self._stage) >= n:
            self.device(self._stage[:n])
            self._stage = self._stage[n:]

    def close(self) -> None:
        # The reference transmits whole transfer buffers only; a trailing
        # partial buffer is dropped exactly like its fifo remainder.
        self._stage = np.empty(0, dtype=np.int8)

    def set_gain(self, gain: int) -> int:
        return max(0, min(47, gain))


class PlutoSink(Sink):
    """ADALM-Pluto TX backend (reference sdr_pluto.c) minus libiio.

    Contract: 16-bit samples forced (sdr_pluto.c:106-110), gain -80..0 dB
    (sdr_pluto.h:39-40), same ppb LO model, the 2x baseband gain boost the
    engine applies for the 12-bit DAC (gps.c:2759-2763), and whole-block
    pushes (one 600,000-element int16 buffer per 0.1 s epoch,
    sdr_pluto.c:45-94). ``device`` stands in for iio_buffer_push."""

    name = "plutosdr"
    forced_sample_bits = 16
    gain_range = (-80, 0)

    def __init__(self, device=None):
        self.device = device

    def init(self, cfg=None) -> None:
        if self.device is None:
            raise RuntimeError(
                "plutosdr hardware not available in this build; pass "
                "PlutoSink(device=...) to supply an iio-push callable"
            )

    def write(self, block: np.ndarray) -> None:
        if self.device is None:
            raise RuntimeError("plutosdr sink has no device")
        self.device(np.asarray(block, dtype=np.int16))

    def set_gain(self, gain: int) -> int:
        return max(-80, min(0, gain))


_REGISTRY: dict[str, Callable[..., Sink]] = {
    "none": NullSink,
    "null": NullSink,
    "iqfile": IqFileSink,
    "hackrf": HackRfSink,
    "plutosdr": PlutoSink,
}


def make_sink(name: str, **kwargs) -> Sink:
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown sink {name!r}; supported: {', '.join(sorted(_REGISTRY))}"
        ) from None
    return factory(**kwargs)


def register_sink(name: str, factory: Callable[..., Sink]) -> None:
    _REGISTRY[name] = factory


def make_configured_sink(cfg) -> Sink:
    """Build the sink named by ``cfg.sink`` with its config-derived kwargs
    and apply the hardware gain contract (the clamp each reference
    ``sdr_*_init`` performs — sdr_hackrf.h:19-20, sdr_pluto.h:39-40),
    writing the clamped gain back into ``cfg.tx_gain``."""
    kwargs = {}
    if cfg.sink == "iqfile":
        kwargs = {"path": cfg.out_file, "fifo_depth": cfg.fifo_depth}
    sink = make_sink(cfg.sink, **kwargs)
    if sink.gain_range is not None:
        cfg.tx_gain = sink.set_gain(cfg.tx_gain)
    return sink
