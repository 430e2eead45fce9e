"""gpssim_tpu — a TPU-native GPS L1 C/A signal-synthesis framework.

A from-scratch re-design of the capabilities of Mictronics/multi-sdr-gps-sim
for JAX/XLA/Pallas on TPU: host-side float64 orbital mechanics and
nav-message construction feed per-0.1 s block parameters to integer-exact
device kernels that synthesize the IQ stream massively in parallel over
samples, channels, and time blocks.
"""

__version__ = "0.1.0"

from .config import CarrierMode, SampleFormat, SimConfig, SynthBackend  # noqa: F401
