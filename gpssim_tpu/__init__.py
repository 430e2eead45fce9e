"""gpssim_tpu — a TPU-native GPS L1 C/A signal-synthesis framework.

A from-scratch re-design of the capabilities of Mictronics/multi-sdr-gps-sim
for JAX/XLA/Pallas on TPU: host-side float64 orbital mechanics and
nav-message construction feed per-0.1 s block parameters to integer-exact
device kernels that synthesize the IQ stream massively in parallel over
samples, channels, and time blocks.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    CarrierMode,
    LocationConfig,
    SampleFormat,
    SimConfig,
    SynthBackend,
    TargetConfig,
)

__all__ = [
    "CarrierMode", "LocationConfig", "SampleFormat", "SimConfig",
    "SynthBackend", "TargetConfig", "Simulation", "run_simulation",
    "run_app", "run_fleet", "save_checkpoint", "load_checkpoint",
    "acquire", "receiver_fix",
]


def __getattr__(name):  # lazy: keep `import gpssim_tpu` light
    if name == "Simulation":
        from .scenario import Simulation

        return Simulation
    if name == "run_simulation":
        from .runner import run_simulation

        return run_simulation
    if name == "run_app":
        from .app import run_app

        return run_app
    if name == "run_fleet":
        from .fleet import run_fleet

        return run_fleet
    if name in ("save_checkpoint", "load_checkpoint"):
        from . import checkpoint

        return getattr(checkpoint, name)
    if name == "acquire":
        from .acquire import acquire

        return acquire
    if name == "receiver_fix":
        from .receiver import receiver_fix

        return receiver_fix
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
