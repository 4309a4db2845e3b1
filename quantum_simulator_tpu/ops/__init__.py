"""Device-side compute primitives (XLA path + Pallas kernels)."""
