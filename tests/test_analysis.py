"""Analysis library: fidelity, entropy, partial trace, MI, concurrence,
event detection, convergence (reference harness group 1 + extras)."""

import numpy as np
import pytest

from quantum_simulator_tpu import (
    GateInstance,
    QuantumCircuit,
    Simulator,
    StateVector,
)
from quantum_simulator_tpu.analysis import (
    BenchmarkAnalysis,
    ConvergenceAnalysis,
    EntanglementEventDetector,
    EntanglementEventType,
    StateAnalysis,
)
from quantum_simulator_tpu.gates import CNOT_MATRIX, H_MATRIX
from quantum_simulator_tpu.reference import ReferenceManager


def bell_state():
    sv = StateVector(2)
    sv.apply_gate(H_MATRIX, [0])
    sv.apply_gate(CNOT_MATRIX, [0, 1])
    return sv


class TestStateAnalysis:
    def test_bell_physics(self):
        """Bell: S(q0) = 1 bit, I(0:1) = 2 bits, fidelity with itself = 1."""
        sv = bell_state()
        assert StateAnalysis.entanglement_entropy(sv, [0]) == pytest.approx(
            1.0, abs=1e-5)
        assert StateAnalysis.mutual_information(sv, 0, 1) == pytest.approx(
            2.0, abs=1e-5)
        assert StateAnalysis.state_fidelity(sv.data, sv.data) == \
            pytest.approx(1.0, abs=1e-6)
        assert StateAnalysis.purity(sv) == pytest.approx(1.0, abs=1e-5)
        assert StateAnalysis.von_neumann_entropy(sv) == pytest.approx(
            0.0, abs=1e-6)

    def test_partial_trace_vs_brute_force(self, rng):
        """Direct psi contraction vs explicit full-rho partial trace."""
        n = 4
        psi = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
        psi /= np.linalg.norm(psi)
        sv = StateVector(n)
        sv.data = psi

        for keep in [[0], [2], [0, 2], [1, 3], [0, 1, 3]]:
            got = StateAnalysis.partial_trace(sv, keep)
            # brute force: full rho tensor, trace out the complement
            rho = np.outer(psi, psi.conj()).reshape([2] * (2 * n))
            traced = sorted(set(range(n)) - set(keep))
            for q in reversed(traced):
                rho = np.trace(rho, axis1=q, axis2=q + rho.ndim // 2)
            dim = 2 ** len(keep)
            expected = rho.reshape(dim, dim)
            np.testing.assert_allclose(got, expected, atol=5e-6)

    def test_density_fidelity(self):
        rho = np.diag([0.5, 0.5, 0.0, 0.0]).astype(complex)
        assert StateAnalysis.density_fidelity(rho, rho) == pytest.approx(
            1.0, abs=1e-9)
        sigma = np.diag([0.0, 0.0, 0.5, 0.5]).astype(complex)
        assert StateAnalysis.density_fidelity(rho, sigma) == pytest.approx(
            0.0, abs=1e-9)
        # mixed vs pure
        pure = np.zeros((4, 4), complex)
        pure[0, 0] = 1.0
        mixed = np.eye(4) / 4
        assert StateAnalysis.density_fidelity(pure, mixed) == pytest.approx(
            0.25, abs=1e-9)

    def test_concurrence(self):
        assert StateAnalysis.concurrence(bell_state(), 0, 1) == \
            pytest.approx(1.0, abs=1e-5)
        sv = StateVector(2)  # product state
        assert StateAnalysis.concurrence(sv, 0, 1) == pytest.approx(
            0.0, abs=1e-5)

    def test_pauli_expectations(self):
        sv = StateVector(1)
        assert StateAnalysis.pauli_expectation(sv, "Z", 0) == pytest.approx(
            1.0, abs=1e-6)
        assert StateAnalysis.pauli_expectation(sv, "X", 0) == pytest.approx(
            0.0, abs=1e-6)
        sv.apply_gate(H_MATRIX, [0])
        assert StateAnalysis.pauli_expectation(sv, "X", 0) == pytest.approx(
            1.0, abs=1e-5)
        with pytest.raises(ValueError):
            StateAnalysis.pauli_expectation(sv, "Q", 0)

    def test_pairwise_mi_matrix(self):
        c = QuantumCircuit(3)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
        state = Simulator().run(c, shots=0).final_state
        mi = StateAnalysis.pairwise_mutual_information(state)
        assert mi[0, 1] == pytest.approx(2.0, abs=1e-4)
        assert mi[0, 2] == pytest.approx(0.0, abs=1e-4)
        assert mi[1, 2] == pytest.approx(0.0, abs=1e-4)
        np.testing.assert_allclose(mi, mi.T)


class TestEventDetector:
    def test_creation_and_disentanglement(self):
        det = EntanglementEventDetector(epsilon=0.1)
        # Step 0: product state, step 1: Bell, step 2: product again
        sv0 = StateVector(2)
        sv1 = bell_state()
        sv2 = StateVector(2)
        assert det.process_step(sv0, 0) == []
        events = det.process_step(sv1, 1)
        assert len(events) == 1
        assert events[0].event_type == EntanglementEventType.CREATION
        events = det.process_step(sv2, 2)
        assert events[0].event_type == EntanglementEventType.DISENTANGLEMENT
        assert len(det.get_timeline()) == 2
        assert len(det.get_pair_history(0, 1)) == 3

    def test_persistence_filter(self):
        det = EntanglementEventDetector(epsilon=0.1, persistence=2)
        sv1 = bell_state()
        assert det.process_step(sv1, 0) == []  # pending 1 < 2
        events = det.process_step(sv1, 1)      # pending 2 -> emit
        assert len(events) == 1


class TestConvergence:
    def test_tvd_and_kl(self):
        probs = np.array([0.5, 0.0, 0.0, 0.5])
        exact_counts = {"00": 500, "11": 500}
        assert ConvergenceAnalysis.tvd(probs, exact_counts, 1000) == \
            pytest.approx(0.0, abs=1e-12)
        assert ConvergenceAnalysis.kl_divergence(
            probs, exact_counts, 1000) == pytest.approx(0.0, abs=1e-6)
        skewed = {"00": 1000}
        assert ConvergenceAnalysis.tvd(probs, skewed, 1000) == \
            pytest.approx(0.5, abs=1e-12)

    def test_shot_convergence_decreases(self):
        state = bell_state()
        results = ConvergenceAnalysis.shot_convergence(
            state, [100, 10000], seed=42)
        assert results[1]["tvd"] < results[0]["tvd"] + 0.05
        assert all(r["tvd"] >= 0 for r in results)


class TestReferenceManager:
    def test_store_fidelity_invalidation(self):
        mgr = ReferenceManager()
        assert not mgr.has_reference
        sv = bell_state()
        mgr.store(sv, circuit_hash=123)
        assert mgr.has_reference
        assert mgr.fidelity_to_reference(sv) == pytest.approx(1.0, abs=1e-5)
        # orthogonal state
        other = StateVector(2)
        fid = mgr.fidelity_to_reference(other)
        assert fid == pytest.approx(0.5, abs=1e-5)
        # same hash: still valid
        assert mgr.check_invalidation(123) is False
        assert mgr.has_reference
        # different hash: invalidated
        assert mgr.check_invalidation(456) is True
        assert not mgr.has_reference

    def test_basis_distributions_cached(self):
        mgr = ReferenceManager()
        sv = StateVector(1)
        sv.apply_gate(H_MATRIX, [0])
        mgr.store(sv)
        z = mgr.get_distribution("Z")
        np.testing.assert_allclose(z, [0.5, 0.5], atol=1e-6)
        x = mgr.get_distribution("X")
        np.testing.assert_allclose(x, [1.0, 0.0], atol=1e-6)
        assert "X" in mgr.reference._basis_distributions

    def test_density_matrix_lazy(self):
        mgr = ReferenceManager()
        mgr.store(bell_state())
        dm = mgr.reference.density_matrix
        assert dm.shape == (4, 4)
        assert np.trace(dm).real == pytest.approx(1.0, abs=1e-5)


class TestBenchmarkAnalysis:
    def test_gate_timing_shape(self):
        results = BenchmarkAnalysis.gate_timing(
            range(2, 4), H_MATRIX, lambda n: [0], repetitions=3)
        assert len(results) == 2
        assert all(r["mean_time_ms"] >= 0 for r in results)

    def test_quantum_volume_ideal(self):
        qv = BenchmarkAnalysis.quantum_volume(
            max_qubits=3, num_trials=5, seed=42)
        # Noiseless: heavy output prob is always > 2/3 -> passes all widths
        assert qv["log2_qv"] == 3
        assert qv["quantum_volume"] == 8


def test_hamiltonian_expectation_tfim():
    # TFIM energy on a small dense state vs explicit matrix expectation.
    import numpy as np

    from quantum_simulator_tpu import GateInstance, QuantumCircuit, Simulator
    from quantum_simulator_tpu.analysis import StateAnalysis

    n = 4
    c = QuantumCircuit(n)
    for q in range(n):
        c.add_gate(GateInstance("Ry", [q], [0.3 + 0.2 * q], column=0))
    for q in range(n - 1):
        c.add_gate(GateInstance("CNOT", [q, q + 1], [], column=1 + q))
    st = Simulator().run(c, shots=0).final_state
    J, h = 1.0, 0.7
    terms = [(-J, [i, i + 1], "ZZ") for i in range(n - 1)]
    terms += [(-h, [i], "X") for i in range(n)]
    got = StateAnalysis.hamiltonian_expectation(st, terms)

    X = np.array([[0, 1], [1, 0]], complex)
    Z = np.diag([1.0, -1.0]).astype(complex)
    I = np.eye(2, dtype=complex)

    def kron_at(ops):
        m = np.array([[1.0]], complex)
        for o in ops:
            m = np.kron(m, o)
        return m

    H = np.zeros((1 << n, 1 << n), complex)
    for i in range(n - 1):
        H += -J * kron_at([Z if q in (i, i + 1) else I for q in range(n)])
    for i in range(n):
        H += -h * kron_at([X if q == i else I for q in range(n)])
    psi = np.asarray(st.data)
    want = float(np.real(psi.conj() @ H @ psi))
    np.testing.assert_allclose(got, want, atol=1e-5)
