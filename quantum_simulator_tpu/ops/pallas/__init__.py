"""Pallas TPU kernels: fused whole-circuit execution in VMEM."""
