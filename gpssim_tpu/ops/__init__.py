"""Per-sample synthesis kernels (NumPy parity path, XLA and Pallas TPU)."""
