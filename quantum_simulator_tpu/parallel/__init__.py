"""Mesh-sharded statevector simulation (the capability the reference lacks:
its engine is single-thread NumPy hard-capped at 16 qubits)."""

from .distributed import (
    DistributedSimulator,
    DistributedStateVector,
    make_mesh,
    sharded_forward_fn,
)

__all__ = [
    "DistributedSimulator",
    "DistributedStateVector",
    "make_mesh",
    "sharded_forward_fn",
]
