"""Shared test utilities."""


def strict_gen_backend():
    """Backend for tests that GENERATE signal as input for something else
    (receiver chain, QA, TOW decode) rather than testing a backend.

    The native sequential engine produces byte-identical strict-parity
    streams ~10x faster than the NumPy parity path (equality asserted by
    tests/test_synth_seq.py::test_native_full_synth_matches_patched_numpy),
    which keeps the default suite inside its runtime budget; falls back
    to NumPy where the engine cannot build.
    """
    from gpssim_tpu.config import SynthBackend
    from gpssim_tpu.ops.synth_seq import seq_available

    return SynthBackend.NATIVE if seq_available() else SynthBackend.NUMPY
