"""Device-side compute primitives (XLA einsum + group-matmul paths)."""
