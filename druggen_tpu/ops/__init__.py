"""XLA + Pallas kernels for the hot ops."""
