"""Trotterized time evolution: gate closed form, cross-engine agreement
(statevector vs MPS on the same circuit), convergence order, energy
conservation at 40 qubits, and the variational-parameter path."""

import numpy as np
import pytest

from quantum_simulator_tpu import MPSSimulator, QuantumCircuit, Simulator
from quantum_simulator_tpu import mps
from quantum_simulator_tpu.models.hamiltonians import tfim_chain
from quantum_simulator_tpu.models.trotter import (
    exp_pauli_gate,
    trotter_circuit,
)
from quantum_simulator_tpu.registry import GateRegistry

from tests.oracle import PAULIS as _P
from tests.oracle import dense_hamiltonian


def exact_evolve(n, terms, t, psi0):
    h = dense_hamiltonian(n, terms)
    w, v = np.linalg.eigh(h)
    return v @ (np.exp(-1j * w * t) * (v.conj().T @ psi0))


class TestGate:
    def test_closed_form_matches_expm(self):
        name = exp_pauli_gate("XY")
        gdef = GateRegistry.instance().get(name)
        theta = 0.7
        got = gdef.matrix_func(theta)
        h = np.kron(_P["X"], _P["Y"])
        w, v = np.linalg.eigh(h)
        want = v @ np.diag(np.exp(-1j * theta * w)) @ v.conj().T
        np.testing.assert_allclose(got, want, atol=1e-12)
        # Unitary, and the jnp builder agrees with the host builder.
        np.testing.assert_allclose(got @ got.conj().T, np.eye(4),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(gdef.device_matrix(
            [theta], np.complex64)), got, atol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError):
            exp_pauli_gate("XQ")
        with pytest.raises(ValueError):
            exp_pauli_gate("")
        with pytest.raises(ValueError):
            trotter_circuit(3, tfim_chain(3), 1.0, steps=0)
        with pytest.raises(ValueError):
            trotter_circuit(3, tfim_chain(3), 1.0, steps=2, order=3)
        # 5 Strang substeps per step at order 4.
        c2 = trotter_circuit(3, tfim_chain(3), 1.0, steps=2, order=2)
        c4 = trotter_circuit(3, tfim_chain(3), 1.0, steps=2, order=4)
        assert len(c4.gates) == 5 * len(c2.gates)
        with pytest.raises(ValueError):
            trotter_circuit(3, [(1.0, "ZZ", [0, 3])], 1.0, steps=1)


class TestEvolution:
    def test_quench_matches_exact_and_order_improves(self):
        n, t = 5, 0.8
        terms = tfim_chain(n, j=-1.0, h=-0.9)
        psi0 = np.zeros(2 ** n, complex)
        psi0[0] = 1.0
        want = exact_evolve(n, terms, t, psi0)
        errs = {}
        for order in (1, 2, 4):
            c = trotter_circuit(n, terms, t, steps=12, order=order)
            res = Simulator().run(c, shots=0)
            got = np.asarray(res.final_state.data)
            errs[order] = 1.0 - abs(np.vdot(want, got)) ** 2
        assert errs[2] < 1e-4
        assert errs[2] < errs[1] / 10
        # Suzuki 4th order: the residual sits at the f32 floor, far
        # below 2nd order at the same step count.
        assert errs[4] < max(errs[2] / 5, 3e-6)

    def test_statevector_and_mps_agree(self):
        n, t = 6, 0.6
        c = trotter_circuit(n, tfim_chain(n, j=-1.0, h=-0.7), t, steps=6)
        dense = np.asarray(Simulator().run(c, shots=0).final_state.data)
        _, state = MPSSimulator(chi=16).run(c, shots=0)
        assert state.truncation_weight < 1e-8
        got = mps.to_statevector(state)
        # Global phase may differ between engines.
        assert abs(np.vdot(dense, got)) ** 2 == pytest.approx(1.0,
                                                              abs=1e-5)

    def test_energy_conserved_at_40_qubits(self):
        n, t = 40, 0.5
        terms = tfim_chain(n, j=-1.0, h=-0.8)
        c = trotter_circuit(n, terms, t, steps=4, order=2)
        _, state = MPSSimulator(chi=16).run(c, shots=0)
        e = mps.expectation_hamiltonian(state, terms)
        # Initial energy <0...0|H|0...0> = j*(n-1) = -(n-1); the exact
        # evolution conserves it, the Trotterized one to O(dt^2)/step.
        assert e == pytest.approx(-(n - 1), rel=2e-2)

    def test_variational_exp_gates_optimize_on_mps(self):
        # Hamiltonian-variational ansatz: ExpP angles are ordinary gate
        # parameters, so the MPS optimizer path drives them.
        from quantum_simulator_tpu.optimizer import (
            CircuitOptimizer, CostFunction, MPSParameterizedConfig)
        n = 12
        terms = tfim_chain(n, j=-1.0, h=-0.6)
        c = QuantumCircuit(n)
        col = 0
        from quantum_simulator_tpu import GateInstance
        for q in range(n):
            c.add_gate(GateInstance("H", [q], [], column=col))
        col += 1
        for rep in range(2):
            for q in range(n - 1):
                c.add_gate(GateInstance(exp_pauli_gate("ZZ"),
                                        [q, q + 1], [0.3], column=col))
                col += 1
            for q in range(n):
                c.add_gate(GateInstance(exp_pauli_gate("X"), [q],
                                        [0.2], column=col))
            col += 1
        cfg = MPSParameterizedConfig.auto_detect(c, chi=12)
        assert cfg.num_params == 2 * (n - 1 + n)
        cost = CostFunction.vqe_hamiltonian(terms)
        opt = CircuitOptimizer(cfg, cost, learning_rate=0.1,
                               max_iterations=2, tolerance=0.0)
        start = opt._evaluate_cost(cfg.get_values())
        res = opt.run(seed=3)
        assert res.optimal_cost < start


class TestSerde:
    def test_expp_gates_deserialize_in_fresh_registry(self):
        from quantum_simulator_tpu.algorithms import AlgorithmTemplate

        c = AlgorithmTemplate.tfim_quench(4, time=0.5)
        d = c.to_dict()
        GateRegistry.reset()  # simulate a fresh process
        try:
            c2 = QuantumCircuit.from_dict(d)
            assert c2.circuit_hash() == c.circuit_hash()
            # registry.get synthesizes ExpP[...] on demand (like MCZ_k).
            gdef = GateRegistry.instance().get("ExpP[ZZ]")
            assert gdef.num_params == 1
            with pytest.raises(KeyError):
                GateRegistry.instance().get("ExpP[]")
            with pytest.raises(KeyError):
                GateRegistry.instance().get("ExpP[QQ]")
            with pytest.raises(KeyError):
                # Over the 8-site cap: stays KeyError (the contract
                # auto_detect-style callers rely on), not ValueError.
                GateRegistry.instance().get("ExpP[" + "X" * 9 + "]")
        finally:
            GateRegistry.reset()
