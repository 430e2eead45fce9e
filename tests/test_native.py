"""Native C++ host runtime: writer/FIFO semantics and quantizer parity."""

import numpy as np
import pytest

from gpssim_tpu.io import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native lib unavailable: {native.load_error()}"
)


def test_quantize_parity():
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, size=100_001, dtype=np.int16)
    ref = (x >> 4).astype(np.int8)
    assert np.array_equal(native.quantize_16to8(x), ref)


def test_writer_round_trip(tmp_path):
    path = str(tmp_path / "out.bin")
    w = native.NativeIqWriter(path, fifo_depth=4, block_bytes=4096)
    rng = np.random.default_rng(1)
    chunks = [
        rng.integers(-128, 128, size=rng.integers(1, 9000), dtype=np.int8)
        for _ in range(50)
    ]
    for c in chunks:
        w.write(c)
    w.close()
    data = np.fromfile(path, dtype=np.int8)
    assert np.array_equal(data, np.concatenate(chunks))


def test_writer_backpressure_does_not_lose_data(tmp_path):
    """Many blocks larger than the whole ring must still arrive in order."""
    path = str(tmp_path / "big.bin")
    w = native.NativeIqWriter(path, fifo_depth=2, block_bytes=1024)
    blocks = [
        np.full(10_000, i, dtype=np.int8) for i in range(-20, 20)
    ]
    for b in blocks:
        w.write(b)
    assert w.bytes_written >= 0
    w.close()
    data = np.fromfile(path, dtype=np.int8)
    assert np.array_equal(data, np.concatenate(blocks))


def test_iqfile_sink_native_engine_matches_python(fixtures_dir, tmp_path):
    from gpssim_tpu.config import SimConfig, SynthBackend
    from gpssim_tpu.io.sinks import IqFileSink
    from gpssim_tpu.runner import run_simulation

    def run(engine, path):
        cfg = SimConfig(
            nav_file=f"{fixtures_dir}/brdc_test.22n",
            duration_sec=0.5,
            almanac_enable=False,
            backend=SynthBackend.NUMPY,
        )
        sink = IqFileSink(path=str(path), engine=engine)
        run_simulation(cfg, sink=sink)
        return np.fromfile(path, dtype=np.int8)

    a = run("python", tmp_path / "py.bin")
    b = run("native", tmp_path / "nat.bin")
    assert np.array_equal(a, b)
    assert a.size == 4 * 600_000
