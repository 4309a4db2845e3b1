"""Mesh-sharded statevector simulation (the capability the reference lacks:
its engine is single-thread NumPy hard-capped at 16 qubits)."""

from .distributed import (
    DistributedSimulator,
    DistributedStateVector,
    local_forward_body,
    make_mesh,
    sharded_forward_fn,
)
from .multihost import (
    MultiHostSpec,
    amp_axis_split,
    initialize_multihost,
    make_multihost_mesh,
)
from .vqe import ShardedVQEStep, VQEState, make_vqe_mesh, sharded_vqe_step

__all__ = [
    "DistributedSimulator",
    "DistributedStateVector",
    "MultiHostSpec",
    "ShardedVQEStep",
    "VQEState",
    "amp_axis_split",
    "initialize_multihost",
    "make_multihost_mesh",
    "local_forward_body",
    "make_mesh",
    "make_vqe_mesh",
    "sharded_forward_fn",
    "sharded_vqe_step",
]
