"""Regression locks for the round-3 review findings (see ROADMAP.md)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
from quantum_simulator_tpu.noise import DepolarizingNoise, NoiseModel
from quantum_simulator_tpu.simulator import Simulator
from quantum_simulator_tpu.state import StateVector


def _noisy_brick(n, depth=3, seed=0):
    rng = np.random.default_rng(seed)
    c = QuantumCircuit(n)
    col = 0
    for d in range(depth):
        for q in range(n):
            c.add_gate(GateInstance("Ry", [q],
                                    [float(rng.uniform(0, 2 * np.pi))],
                                    column=col))
        col += 1
        for q in range(d % 2, n - 1, 2):
            c.add_gate(GateInstance("CNOT", [q, q + 1], [], column=col))
        col += 1
    return c


class TestTrajectoriesParamDense:
    def test_small_trajectory_count_honored(self):
        """trajectories=T < shots must draw ~shots/T samples from each of
        T trajectories — total shot count exact, distribution sane."""
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.05))
        sim = Simulator(noise_model=nm)
        c = _noisy_brick(6)
        res = sim.run_with_noise(c, shots=1000, seed=3, trajectories=4)
        assert sum(res.measurement_counts.values()) == 1000
        # and the default path still matches reference semantics
        res2 = sim.run_with_noise(c, shots=64, seed=3)
        assert sum(res2.measurement_counts.values()) == 64

    def test_trajectories_one(self):
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.02))
        res = Simulator(noise_model=nm).run_with_noise(
            _noisy_brick(4), shots=100, seed=1, trajectories=1)
        assert sum(res.measurement_counts.values()) == 100


class TestPauliStringValidation:
    def test_duplicate_qubits_rejected_dense(self):
        from quantum_simulator_tpu.analysis import StateAnalysis

        sv = StateVector(3)
        with pytest.raises(ValueError, match="duplicate"):
            StateAnalysis.pauli_string_expectation(sv, [1, 1], "XY")


class TestChunkGuards:
    def test_non_divisor_chunks_cover_whole_axis(self):
        """n_chunks that does not divide the chunk axis must still apply
        the gate everywhere (the guard decrements to a divisor)."""
        from quantum_simulator_tpu.ops import program as prog
        from quantum_simulator_tpu.ops.bigtraj import (
            huge_trajectory_state_body,
        )
        from quantum_simulator_tpu.ops.plan import group_trajectory_body

        c = _noisy_brick(10, depth=2, seed=5)
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.1))
        p = prog.compile_circuit(c)
        params = jnp.asarray(p.initial_params)
        key = jax.random.PRNGKey(11)
        want = np.asarray(group_trajectory_body(p, nm, params, key))
        for chunks in (3, 5, 6):
            x, planar = huge_trajectory_state_body(p, nm, params, key,
                                                   n_chunks=chunks)
            got = np.asarray(x if not planar
                             else x[0] + 1j * x[1]).reshape(-1)
            np.testing.assert_allclose(np.abs(got), np.abs(want),
                                       atol=1e-5)

    def test_final_norm_exact(self):
        """The huge trajectory path normalizes exactly like its group
        twin: ||psi|| = 1 to float32 precision, not the compounded
        per-draw estimate."""
        from quantum_simulator_tpu.ops import program as prog
        from quantum_simulator_tpu.ops.bigtraj import (
            huge_trajectory_state_body,
        )

        c = _noisy_brick(12, depth=4, seed=9)
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.15))
        p = prog.compile_circuit(c)
        x, planar = huge_trajectory_state_body(
            p, nm, jnp.asarray(p.initial_params), jax.random.PRNGKey(2))
        nsq = float(np.asarray(jnp.sum(jnp.asarray(x) ** 2)))
        assert nsq == pytest.approx(1.0, abs=5e-6)


class TestVqeCostOnHugeStates:
    def test_vqe_hamiltonian_host_dispatches_planar(self):
        """CostFunction.vqe_hamiltonian must evaluate on a
        PlanarStateVector (the n >= 30 state surface) and match the
        dense kron path, including identity factors."""
        from quantum_simulator_tpu.ops import program as prog
        from quantum_simulator_tpu.ops.bigstate import (
            PlanarStateVector,
            group_forward_state_body,
        )
        from quantum_simulator_tpu.optimizer import CostFunction

        c = _noisy_brick(10, depth=2, seed=4)
        p = prog.compile_circuit(c)
        x, planar = group_forward_state_body(
            p, jnp.asarray(p.initial_params), jnp.complex64, n_chunks=2)
        sv = PlanarStateVector(x, 10, planar=planar)
        terms = [(0.7, "ZZ", [0, 9]), (-0.3, "XIX", [1, 4, 8]),
                 (0.2, "I", [3]), (1.1, "Y", [5])]
        cost = CostFunction.vqe_hamiltonian(terms)
        got = cost(sv)

        dense = np.asarray(prog.forward_fn(p)(
            jnp.asarray(p.initial_params)))
        sv_dense = StateVector(10)
        sv_dense.data = dense
        want = cost(sv_dense)
        assert got == pytest.approx(want, abs=1e-4)
