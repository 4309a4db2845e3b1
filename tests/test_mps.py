"""MPS engine validation: exactness vs the statevector engine when the
bond dimension covers the cut rank, honest truncation accounting when it
does not, and 100-qubit behavior no amplitude engine can check."""

import numpy as np
import pytest

from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
from quantum_simulator_tpu import mps
from quantum_simulator_tpu.simulator import Simulator

ATOL = 2e-5


def _g(name, targets, params=None, col=0):
    return GateInstance(name, list(targets), list(params or []), col)


def _random_circuit(n, depth, rng, twoq_any_pair=False):
    c = QuantumCircuit(num_qubits=n)
    oneq = ["H", "T", "S", "X", "Y", "Z", "S_DAG", "T_DAG"]
    col = 0
    for _ in range(depth):
        for q in range(n):
            kind = rng.integers(0, 3)
            if kind == 0:
                c.add_gate(_g(str(rng.choice(oneq)), [q], col=col))
            elif kind == 1:
                c.add_gate(_g(str(rng.choice(["Rx", "Ry", "Rz"])), [q],
                              [float(rng.uniform(0, 2 * np.pi))], col=col))
        col += 1
        pairs = rng.permutation(n)
        for i in range(0, n - 1, 2):
            a, b = int(pairs[i]), int(pairs[i + 1])
            if not twoq_any_pair:
                a, b = min(a, b), min(a, b) + 1
                if b >= n:
                    continue
            c.add_gate(_g(str(rng.choice(["CNOT", "CZ", "SWAP"])),
                          [a, b], col=col))
            col += 1
    return c


def _statevector(circuit):
    return Simulator().run(circuit, shots=0).final_state.data


class TestExactness:
    def test_bell_counts_and_truncation(self):
        c = QuantumCircuit(num_qubits=2)
        c.add_gate(_g("H", [0], col=0))
        c.add_gate(_g("CNOT", [0, 1], col=1))
        counts, state = mps.MPSSimulator(chi=4).run(c, shots=2000, seed=3)
        assert set(counts) == {"00", "11"}
        assert abs(counts["00"] - 1000) < 150
        assert state.truncation_weight == 0.0

    def test_random_circuit_amplitudes_exact(self, rng):
        n = 6
        c = _random_circuit(n, depth=4, rng=rng, twoq_any_pair=True)
        _, state = mps.MPSSimulator(chi=2 ** (n // 2)).run(c, shots=0)
        assert state.truncation_weight < 1e-9
        np.testing.assert_allclose(mps.to_statevector(state),
                                   _statevector(c), atol=ATOL)

    def test_nonadjacent_cnot_routing(self):
        # Control BELOW target exercises the gate-axis permutation too.
        c = QuantumCircuit(num_qubits=5)
        for q in range(5):
            c.add_gate(_g("H", [q], col=0))
        c.add_gate(_g("CNOT", [4, 0], col=1))
        c.add_gate(_g("CZ", [1, 3], col=2))
        c.add_gate(_g("Rx", [2], [0.7], col=3))
        c.add_gate(_g("CNOT", [0, 3], col=4))
        _, state = mps.MPSSimulator(chi=8).run(c, shots=0)
        np.testing.assert_allclose(mps.to_statevector(state),
                                   _statevector(c), atol=ATOL)

    def test_three_site_gates_scattered_targets(self):
        c = QuantumCircuit(num_qubits=5)
        for q in range(5):
            c.add_gate(_g("H", [q], col=0))
        c.add_gate(_g("Toffoli", [4, 0, 2], col=1))
        c.add_gate(_g("Fredkin", [1, 4, 0], col=2))
        _, state = mps.MPSSimulator(chi=8).run(c, shots=0)
        np.testing.assert_allclose(mps.to_statevector(state),
                                   _statevector(c), atol=ATOL)

    def test_cphase_and_initial_states(self):
        c = QuantumCircuit(num_qubits=4, initial_states=[1, 0, 1, 0])
        c.add_gate(_g("H", [1], col=0))
        c.add_gate(_g("CPhase", [1, 3], [0.9], col=1))
        c.add_gate(_g("MCZ3", [0, 1, 2], col=2))
        _, state = mps.MPSSimulator(chi=8).run(c, shots=0)
        np.testing.assert_allclose(mps.to_statevector(state),
                                   _statevector(c), atol=ATOL)

    def test_amplitude_matches_statevector_entry(self, rng):
        n = 5
        c = _random_circuit(n, depth=3, rng=rng, twoq_any_pair=True)
        _, state = mps.MPSSimulator(chi=8).run(c, shots=0)
        psi = _statevector(c)
        for bits in ("00000", "10110", "11111"):
            idx = int(bits, 2)
            got = mps.amplitude(state, bits)
            assert abs(got - complex(psi[idx])) < ATOL


class TestObservables:
    def test_pauli_expectation_vs_dense(self, rng):
        n = 5
        c = _random_circuit(n, depth=3, rng=rng, twoq_any_pair=True)
        _, state = mps.MPSSimulator(chi=8).run(c, shots=0)
        psi = _statevector(c)
        paulis = {"I": np.eye(2), "X": np.array([[0, 1], [1, 0]]),
                  "Y": np.array([[0, -1j], [1j, 0]]),
                  "Z": np.diag([1.0, -1.0])}
        for s in ("ZZZZZ", "XIXIX", "IYZXI", "IIIII"):
            op = np.eye(1)
            for ch in s:
                op = np.kron(op, paulis[ch])
            want = float(np.real(psi.conj() @ op @ psi))
            assert abs(mps.expectation_pauli_string(state, s) - want) < 1e-4
        # Dict form, identity elsewhere.
        assert abs(mps.expectation_pauli_string(state, {1: "Y", 3: "X"})
                   - mps.expectation_pauli_string(state, "IYIXI")) < 1e-6

    def test_entropy_product_and_bell(self):
        c = QuantumCircuit(num_qubits=3)
        c.add_gate(_g("H", [0], col=0))
        _, state = mps.MPSSimulator(chi=4).run(c, shots=0)
        assert abs(mps.entanglement_entropy(state, 0)) < 1e-6
        c.add_gate(_g("CNOT", [0, 1], col=1))
        _, state = mps.MPSSimulator(chi=4).run(c, shots=0)
        assert abs(mps.entanglement_entropy(state, 0) - 1.0) < 1e-5
        assert abs(mps.entanglement_entropy(state, 1)) < 1e-6


class TestScale:
    def test_ghz_100(self):
        n = 100
        c = QuantumCircuit(num_qubits=n)
        c.add_gate(_g("H", [0], col=0))
        for q in range(n - 1):
            c.add_gate(_g("CNOT", [q, q + 1], col=q + 1))
        counts, state = mps.MPSSimulator(chi=2).run(c, shots=500, seed=11)
        assert set(counts) == {"0" * n, "1" * n}
        assert state.truncation_weight < 1e-6
        assert abs(mps.entanglement_entropy(state, n // 2) - 1.0) < 1e-4
        assert abs(mps.expectation_pauli_string(
            state, {0: "Z", 50: "Z"}) - 1.0) < 1e-5
        # X^(x)100 stabilizes GHZ-100 with +1 eigenvalue (even n).
        assert abs(mps.expectation_pauli_string(
            state, "X" * n) - 1.0) < 1e-4


class TestTruncation:
    def test_truncation_reported_and_recovered(self, rng):
        n = 8
        c = _random_circuit(n, depth=6, rng=rng, twoq_any_pair=True)
        _, tight = mps.MPSSimulator(chi=2).run(c, shots=0)
        assert tight.truncation_weight > 1e-4
        _, wide = mps.MPSSimulator(chi=16).run(c, shots=0)
        assert wide.truncation_weight < 1e-9
        np.testing.assert_allclose(mps.to_statevector(wide),
                                   _statevector(c), atol=ATOL)


class TestGuards:
    def test_wide_dense_gate_rejected(self):
        c = QuantumCircuit(num_qubits=12)
        c.add_gate(_g("MCZ9", list(range(9)), col=0))
        with pytest.raises(ValueError, match="dense-gate path"):
            mps.MPSSimulator(chi=4).run(c, shots=0)

    def test_bad_chi(self):
        with pytest.raises(ValueError):
            mps.MPSSimulator(chi=0)

    def test_bad_pauli(self):
        c = QuantumCircuit(num_qubits=2)
        _, state = mps.MPSSimulator(chi=2).run(c, shots=0)
        with pytest.raises(ValueError):
            mps.expectation_pauli_string(state, "XQ")
        with pytest.raises(ValueError):
            mps.expectation_pauli_string(state, {5: "X"})
        with pytest.raises(ValueError):
            mps.entanglement_entropy(state, 3)


class TestNoise:
    def _tvd(self, a, b, shots_a, shots_b):
        keys = set(a) | set(b)
        return 0.5 * sum(abs(a.get(k, 0) / shots_a - b.get(k, 0) / shots_b)
                         for k in keys)

    def test_noisy_trajectories_match_statevector(self, rng):
        from quantum_simulator_tpu.noise import (
            AmplitudeDampingNoise, DepolarizingNoise, NoiseModel)
        n = 4
        c = QuantumCircuit(num_qubits=n)
        for q in range(n):
            c.add_gate(_g("H", [q], col=0))
        c.add_gate(_g("CNOT", [0, 2], col=1))
        c.add_gate(_g("Rx", [1], [0.8], col=2))
        c.add_gate(_g("CZ", [2, 3], col=3))
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.08))
        nm.add_global_noise(AmplitudeDampingNoise(0.1))
        shots = 4000
        ref = Simulator(noise_model=nm).run_with_noise(
            c, shots=shots, seed=5).measurement_counts
        got, trunc = mps.MPSSimulator(chi=8).run_with_noise(
            c, nm, shots=shots, seed=9)
        assert trunc < 1e-6  # chi=8 covers n=4 exactly
        assert self._tvd(ref, got, shots, shots) < 0.06

    def test_noisy_ghz40_amplitude_damping(self):
        from quantum_simulator_tpu.noise import (
            AmplitudeDampingNoise, NoiseModel)
        n = 40
        c = QuantumCircuit(num_qubits=n)
        c.add_gate(_g("H", [0], col=0))
        for q in range(n - 1):
            c.add_gate(_g("CNOT", [q, q + 1], col=q + 1))
        nm = NoiseModel()
        nm.add_global_noise(AmplitudeDampingNoise(0.02))
        counts, _ = mps.MPSSimulator(chi=4).run_with_noise(
            c, nm, shots=200, seed=2)
        assert sum(counts.values()) == 200
        assert all(len(k) == n for k in counts)
        # Damping biases toward |0...0>: the all-ones branch decays.
        assert counts.get("0" * n, 0) > counts.get("1" * n, 0)

    def test_readout_error_applies(self):
        from quantum_simulator_tpu.noise import NoiseModel, ReadoutError
        c = QuantumCircuit(num_qubits=3)
        nm = NoiseModel()
        nm.set_readout_error(ReadoutError(p01=1.0, p10=0.0))
        counts, _ = mps.MPSSimulator(chi=2).run_with_noise(
            c, nm, shots=50, seed=1)
        assert counts == {"111": 50}


class TestMonitored:
    def test_bell_collapse_correlates(self):
        c = QuantumCircuit(num_qubits=2)
        c.add_gate(_g("H", [0], col=0))
        c.add_gate(_g("CNOT", [0, 1], col=1))
        c.add_gate(_g("Measure", [0], col=2))
        outs, sites, states = mps.MPSSimulator(chi=4).monitored_trajectories(
            c, n_trajectories=24, seed=6)
        assert sites == [(2, 0)]
        assert outs.shape == (24, 1)
        for t in range(24):
            z1 = mps.expectation_pauli_string(states[t], {1: "Z"})
            assert abs(z1 - (1.0 - 2.0 * int(outs[t, 0]))) < 1e-5
        # Both outcomes occur across 24 fair-coin trajectories.
        assert 0 < int(outs.sum()) < 24

    def test_non_clifford_born_statistics(self):
        c = QuantumCircuit(num_qubits=1)
        c.add_gate(_g("Rx", [0], [0.8], col=0))
        c.add_gate(_g("Measure", [0], col=1))
        outs, _, _ = mps.MPSSimulator(chi=2).monitored_trajectories(
            c, n_trajectories=400, seed=3)
        p1 = float(outs.mean())
        assert abs(p1 - np.sin(0.4) ** 2) < 0.07

    def test_measurement_kills_entanglement(self):
        n = 8
        c = QuantumCircuit(num_qubits=n)
        c.add_gate(_g("H", [0], col=0))
        for q in range(n - 1):
            c.add_gate(_g("CNOT", [q, q + 1], col=q + 1))
        c.add_gate(_g("Measure", [4], col=n))
        _, _, states = mps.MPSSimulator(chi=4).monitored_trajectories(
            c, n_trajectories=3, seed=1)
        for st in states:
            assert abs(mps.entanglement_entropy(st, 3)) < 1e-5


class TestHamiltonian:
    def test_tfim_energy_vs_dense(self, rng):
        from quantum_simulator_tpu.models.hamiltonians import (
            heisenberg_chain, tfim_chain)
        n = 6
        c = _random_circuit(n, depth=3, rng=rng, twoq_any_pair=True)
        from tests.oracle import dense_hamiltonian
        _, state = mps.MPSSimulator(chi=8).run(c, shots=0)
        psi = _statevector(c)
        for terms in (tfim_chain(n, j=-1.0, h=-0.7),
                      heisenberg_chain(n, jx=0.5, jy=-0.3, jz=1.1)):
            h = dense_hamiltonian(n, terms)
            want = float(np.real(psi.conj() @ h @ psi))
            got = mps.expectation_hamiltonian(state, terms)
            assert abs(got - want) < 1e-3

    def test_zz_chain_on_ghz80(self):
        from quantum_simulator_tpu.models.hamiltonians import zz_chain
        n = 80
        c = QuantumCircuit(num_qubits=n)
        c.add_gate(_g("H", [0], col=0))
        for q in range(n - 1):
            c.add_gate(_g("CNOT", [q, q + 1], col=q + 1))
        _, state = mps.MPSSimulator(chi=2).run(c, shots=0)
        # GHZ: every <Z_i Z_{i+1}> = +1, so sum with coeff -1 is -(n-1).
        got = mps.expectation_hamiltonian(state, zz_chain(n, coeff=-1.0))
        assert abs(got + (n - 1)) < 1e-3

    def test_term_validation(self):
        c = QuantumCircuit(num_qubits=3)
        _, state = mps.MPSSimulator(chi=2).run(c, shots=0)
        with pytest.raises(ValueError):
            mps.expectation_hamiltonian(state, [(1.0, "ZZ", [0])])
        with pytest.raises(ValueError):
            mps.expectation_hamiltonian(state, [(1.0, "ZZ", [1, 1])])
        with pytest.raises(ValueError):
            mps.expectation_hamiltonian(state, [(1.0, "ZQ", [0, 1])])


class TestBasisSampling:
    def test_x_basis_plus_state_is_deterministic(self):
        n = 50
        c = QuantumCircuit(num_qubits=n)
        for q in range(n):
            c.add_gate(_g("H", [q], col=0))
        counts, _ = mps.MPSSimulator(chi=2).run(c, shots=64, seed=0,
                                                basis="X")
        assert counts == {"0" * n: 64}

    def test_y_basis_plus_i_state_is_deterministic(self):
        n = 20
        c = QuantumCircuit(num_qubits=n)
        for q in range(n):
            c.add_gate(_g("H", [q], col=0))
            c.add_gate(_g("S", [q], col=1))
        counts, _ = mps.MPSSimulator(chi=2).run(c, shots=64, seed=1,
                                                basis="Y")
        assert counts == {"0" * n: 64}

    def test_ghz_x_basis_even_parity(self):
        n = 4
        c = QuantumCircuit(num_qubits=n)
        c.add_gate(_g("H", [0], col=0))
        for q in range(n - 1):
            c.add_gate(_g("CNOT", [q, q + 1], col=q + 1))
        counts, _ = mps.MPSSimulator(chi=4).run(c, shots=400, seed=2,
                                                basis="X")
        assert all(s.count("1") % 2 == 0 for s in counts)
        assert len(counts) == 8  # all even-parity strings appear

    def test_readout_error_shot_mode(self):
        from quantum_simulator_tpu.noise import ReadoutError
        n = 30
        c = QuantumCircuit(num_qubits=n)
        for q in range(n):
            c.add_gate(_g("H", [q], col=0))
        # p01 = P(read 1 | true 0) = 1 flips every bit of the
        # all-zeros X-basis outcome.
        ro = ReadoutError(p01=1.0, p10=0.0)
        counts, _ = mps.MPSSimulator(chi=2).run(
            c, shots=16, seed=3, basis="X", readout_error=ro)
        assert counts == {"1" * n: 16}

    def test_bad_basis_rejected(self):
        c = QuantumCircuit(num_qubits=2)
        with pytest.raises(ValueError):
            mps.MPSSimulator(chi=2).run(c, shots=8, basis="W")
