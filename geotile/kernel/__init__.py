"""Pure-numpy spatial kernels (no Spark imports here)."""
