"""TPU Pallas kernels for the hot encode path."""
