"""Exact density-matrix simulation: deterministic noisy evolution.

The reference approximates noisy density matrices by Monte-Carlo
averaging over stochastic trajectories
(``/root/reference/quantum_sim/engine/simulator.py:155-199``); its
resource monitor's comparison table discusses exact DM simulators but it
does not contain one. This module adds the exact path: rho evolves as

    rho -> U rho U^dag                 per gate
    rho -> sum_m K_m rho K_m^dag       per noise channel per target

compiled into ONE XLA program per circuit structure (parameters stay
runtime inputs). Memory is O(4^n) so the practical single-chip cap is
n<=14 (a 16384^2 complex64 rho = 2 GiB — the same ceiling the reference
quotes for exact DM simulators at 8 GiB hosts, ``README.md:211-218``).

Left/right operator application reuses the statevector kernel: U acts on
rho's row index as a vmap over columns, and conj(U) on the column index
as a vmap over rows — every contraction is the same segmented-einsum
MXU path as the pure-state engine.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .circuit import QuantumCircuit
from .config import CONFIG
from .ops import program as prog
from .ops.apply import apply_gate
from .utils.xfer import to_host_complex

#: Exact DM state is O(4^n); above this the MC ensemble is the only path.
MAX_DM_QUBITS = 14


def _apply_left(rho, u, targets, n):
    """rho -> U rho (contract the ROW index)."""
    return jax.vmap(lambda col: apply_gate(col, u, targets, n),
                    in_axes=1, out_axes=1)(rho)


def _apply_right_dag(rho, u, targets, n):
    """rho -> rho U^dag (contract the COLUMN index with conj(U))."""
    return jax.vmap(lambda row: apply_gate(row, jnp.conj(u), targets, n),
                    in_axes=0, out_axes=0)(rho)


def _apply_unitary(rho, u, targets, n):
    return _apply_right_dag(_apply_left(rho, u, targets, n), u, targets, n)


def _apply_channel(rho, kraus, qubit, n):
    """rho -> sum_m K_m rho K_m^dag on one qubit (kraus: (M, 2, 2))."""
    def one(k):
        return _apply_unitary(rho, k, (qubit,), n)

    return jnp.sum(jax.vmap(one)(kraus), axis=0)


def _dm_body(program: prog.CircuitProgram, channels_for, params, dtype):
    n = program.num_qubits
    dim = 1 << n
    idx = program.initial_index
    one_hot = jnp.zeros(dim, dtype=dtype).at[idx].set(1.0)
    rho = jnp.outer(one_hot, jnp.conj(one_hot))
    for op in program.ops:
        if op.cphase_value is not None:
            # Matrix-less controlled phase (MCZ_k, k > 10): D rho D^dag
            # for a product-form diagonal D is one elementwise pass:
            # rho[i, j] *= d_i * conj(d_j) with d = 1 + (v-1) * mask.
            mask = 0
            for q in op.targets:
                mask |= 1 << (n - 1 - q)  # qubit 0 = MSB
            hit = (jnp.arange(dim, dtype=jnp.uint32)
                   & jnp.uint32(mask)) == jnp.uint32(mask)
            d = jnp.where(hit, jnp.asarray(op.cphase_value, dtype),
                          jnp.ones((), dtype))
            rho = rho * d[:, None] * jnp.conj(d)[None, :]
        else:
            u = program.op_matrix(op, params, dtype)
            rho = _apply_unitary(rho, u, op.targets, n)
        for kraus_np in channels_for(op.gate_name):
            kraus = jnp.asarray(kraus_np, dtype=dtype)
            for q in op.targets:
                rho = _apply_channel(rho, kraus, q, n)
    return rho


@dataclass
class DensityMatrixResult:
    """Host-facing view over the device-resident density matrix."""

    num_qubits: int
    device_rho: jax.Array

    @property
    def rho(self) -> np.ndarray:
        return to_host_complex(self.device_rho)

    @property
    def probabilities(self) -> np.ndarray:
        return np.asarray(jnp.real(jnp.diagonal(self.device_rho)),
                          dtype=np.float64)

    def purity(self) -> float:
        r = self.device_rho
        return float(jnp.real(jnp.sum(r * jnp.conj(r).T)))

    def trace(self) -> float:
        return float(jnp.real(jnp.trace(self.device_rho)))

    def expectation_z(self, qubit: int) -> float:
        probs = self.probabilities
        idx = np.arange(1 << self.num_qubits)
        sign = 1.0 - 2.0 * ((idx >> (self.num_qubits - 1 - qubit)) & 1)
        return float(np.sum(probs * sign))


class DensityMatrixSimulator:
    """Exact (non-stochastic) noisy simulation for n <= 14 qubits."""

    def __init__(self, noise_model=None):
        self.noise_model = noise_model

    def run(self, circuit: QuantumCircuit,
            dtype=None) -> DensityMatrixResult:
        if circuit.num_qubits > MAX_DM_QUBITS:
            raise ValueError(
                f"exact density-matrix simulation is O(4^n); "
                f"n={circuit.num_qubits} exceeds the cap of "
                f"{MAX_DM_QUBITS} — use "
                f"Simulator.ensemble_density_matrix (Monte-Carlo)")
        dtype = dtype or CONFIG.dtype
        program = prog.compile_circuit(circuit)
        if self.noise_model is not None:
            channels_for = self.noise_model.kraus_stacks_for_gate
            noise_key = self.noise_model.spec_key()
        else:
            channels_for = lambda name: []  # noqa: E731
            noise_key = ()
        key = ("dm", program.compile_key, noise_key, str(dtype))
        fn = prog._cache_get(key, lambda: jax.jit(
            lambda p: _dm_body(program, channels_for, p, dtype)))
        rho = fn(jnp.asarray(program.initial_params))
        return DensityMatrixResult(num_qubits=circuit.num_qubits,
                                   device_rho=rho)

    def sample(self, result: DensityMatrixResult, shots: int,
               rng: np.random.Generator | None = None,
               readout_error=None) -> dict[str, int]:
        """Measurement counts from the exact diagonal (optionally pushed
        through a readout confusion transform)."""
        from .measurement import counts_from_array

        rng = rng or np.random.default_rng()
        probs = result.probabilities
        probs = np.maximum(probs, 0.0)
        probs = probs / probs.sum()
        ro = readout_error
        if ro is None and self.noise_model is not None:
            ro = self.noise_model.readout_error
        if ro is not None:
            probs = np.asarray(
                ro.apply_to_distribution(probs, result.num_qubits))
        counts = rng.multinomial(shots, probs)
        return counts_from_array(counts, result.num_qubits)
