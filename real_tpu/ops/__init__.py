"""TPU custom ops (Pallas kernels) with XLA fallbacks."""
