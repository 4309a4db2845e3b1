"""Core engine correctness vs an independent bit-arithmetic oracle.

The oracle applies gates by explicit basis-index bit manipulation (qubit 0 =
MSB), with no shared code with the engine — so agreement is meaningful.
"""

import numpy as np
import pytest

from quantum_simulator_tpu import (
    GateInstance,
    GateRegistry,
    QuantumCircuit,
    Simulator,
    StateVector,
)
from quantum_simulator_tpu.gates import (
    CNOT_MATRIX,
    H_MATRIX,
    TOFFOLI_MATRIX,
    X_MATRIX,
)

ATOL = 2e-6  # complex64 device path vs float64 oracle


def apply_oracle(psi: np.ndarray, gate: np.ndarray, targets, n: int):
    """Independent reference: explicit index/bit arithmetic, qubit 0 = MSB."""
    dim = 2**n
    k = len(targets)
    out = np.zeros(dim, dtype=np.complex128)
    for i in range(dim):
        row = 0
        for t in targets:
            row = (row << 1) | ((i >> (n - 1 - t)) & 1)
        for col in range(2**k):
            j = i
            for idx, t in enumerate(targets):
                bit = (col >> (k - 1 - idx)) & 1
                pos = n - 1 - t
                j = (j & ~(1 << pos)) | (bit << pos)
            out[i] += gate[row, col] * psi[j]
    return out


def random_state(n, rng):
    psi = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
    return psi / np.linalg.norm(psi)


def random_unitary(dim, rng):
    m = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    q, _ = np.linalg.qr(m)
    return q


@pytest.mark.parametrize("n,targets", [
    (1, (0,)),
    (3, (0,)), (3, (1,)), (3, (2,)),
    (4, (1, 3)), (4, (3, 1)), (4, (0, 2)), (4, (2, 0)),
    (5, (0, 2, 4)), (5, (4, 0, 2)), (5, (3, 1, 0)),
])
def test_apply_gate_matches_oracle(n, targets, rng):
    sv = StateVector(n)
    psi0 = random_state(n, rng)
    sv.data = psi0
    gate = random_unitary(2 ** len(targets), rng)
    sv.apply_gate(gate, list(targets))
    expected = apply_oracle(psi0, gate, targets, n)
    np.testing.assert_allclose(sv.data, expected, atol=ATOL)


def test_unsorted_targets_cnot(rng):
    """CNOT with control=1, target=0 (reversed order) vs oracle."""
    sv = StateVector(2)
    psi0 = random_state(2, rng)
    sv.data = psi0
    sv.apply_gate(CNOT_MATRIX, [1, 0])
    np.testing.assert_allclose(
        sv.data, apply_oracle(psi0, CNOT_MATRIX, (1, 0), 2), atol=ATOL)


def test_toffoli_truth_table():
    # |110> -> |111>; qubit 0 = MSB so index 0b110 = 6
    sv = StateVector.from_initial_states([1, 1, 0])
    sv.apply_gate(TOFFOLI_MATRIX, [0, 1, 2])
    probs = sv.probabilities
    assert probs[0b111] == pytest.approx(1.0, abs=1e-6)


def test_bell_state():
    sv = StateVector(2)
    sv.apply_gate(H_MATRIX, [0])
    sv.apply_gate(CNOT_MATRIX, [0, 1])
    data = sv.data
    inv_sqrt2 = 1 / np.sqrt(2)
    assert data[0b00] == pytest.approx(inv_sqrt2, abs=1e-6)
    assert data[0b11] == pytest.approx(inv_sqrt2, abs=1e-6)
    assert abs(data[0b01]) < 1e-6 and abs(data[0b10]) < 1e-6


def test_from_initial_states_msb_convention():
    sv = StateVector.from_initial_states([0, 1, 0])
    assert sv.probabilities[0b010] == pytest.approx(1.0)


def test_measure_qubit_deterministic_and_collapse():
    sv = StateVector.from_initial_states([1, 0])
    assert sv.measure_qubit(0) == 1
    assert sv.measure_qubit(1) == 0
    # Superposition collapse statistics
    rng = np.random.default_rng(7)
    ones = 0
    for _ in range(200):
        sv = StateVector(1)
        sv.apply_gate(H_MATRIX, [0])
        ones += sv.measure_qubit(0, rng)
    assert 60 < ones < 140
    # After collapse, state is pure basis
    sv = StateVector(2)
    sv.apply_gate(H_MATRIX, [0])
    outcome = sv.measure_qubit(0, np.random.default_rng(1))
    probs = sv.probabilities
    assert probs.sum() == pytest.approx(1.0, abs=1e-5)
    nz = np.nonzero(probs > 1e-9)[0]
    for idx in nz:
        assert (idx >> 1) & 1 == outcome


def test_norm_preserved_through_circuit(rng):
    n = 5
    sv = StateVector(n)
    sv.data = random_state(n, rng)
    reg = GateRegistry.instance()
    for name in ["H", "X", "Y", "Z", "S", "T", "S_DAG", "T_DAG"]:
        q = int(rng.integers(n))
        sv.apply_gate(reg.get(name).matrix_func(), [q])
    sv.apply_gate(reg.get("Rx").matrix_func(0.7), [2])
    sv.apply_gate(reg.get("U3").matrix_func(0.3, 1.1, -0.4), [4])
    assert np.sum(sv.probabilities) == pytest.approx(1.0, abs=1e-5)


def test_reduced_density_matrix_and_bloch():
    sv = StateVector(2)
    sv.apply_gate(H_MATRIX, [0])
    sv.apply_gate(CNOT_MATRIX, [0, 1])
    rho = sv.get_reduced_density_matrix(0)
    np.testing.assert_allclose(rho, np.eye(2) / 2, atol=1e-6)
    x, y, z = sv.get_bloch_coordinates(0)
    assert abs(x) < 1e-6 and abs(y) < 1e-6 and abs(z) < 1e-6
    # |+> state Bloch vector
    sv2 = StateVector(1)
    sv2.apply_gate(H_MATRIX, [0])
    x, y, z = sv2.get_bloch_coordinates(0)
    assert x == pytest.approx(1.0, abs=1e-5)
    assert abs(y) < 1e-5 and abs(z) < 1e-5


class TestCircuitModel:
    def test_ordered_gates_and_layers(self):
        c = QuantumCircuit(3)
        c.add_gate(GateInstance("X", [1], [], column=2))
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 1], [], column=2))
        ordered = c.get_ordered_gates()
        assert len(ordered) == 2
        assert ordered[0][0].gate_name == "H"
        assert [g.gate_name for g in ordered[1]] == ["CNOT", "X"]
        layers = c.compute_layers()
        assert layers == [[1], [0, 2]]
        assert c.gate_to_layer_map() == [1, 0, 1]

    def test_serde_roundtrip(self):
        c = QuantumCircuit(3, initial_states=[0, 1, 0])
        c.add_gate(GateInstance("Rx", [2], [0.5], column=1))
        d = c.to_dict()
        assert d["version"] == "1.0"
        assert d["initial_states"] == [0, 1, 0]
        c2 = QuantumCircuit.from_dict(d)
        assert c2.circuit_hash() == c.circuit_hash()
        # all-zero initial states omitted for back-compat
        c3 = QuantumCircuit(2)
        assert "initial_states" not in c3.to_dict()

    def test_hash_changes_with_structure(self):
        c = QuantumCircuit(2)
        h0 = c.circuit_hash()
        c.add_gate(GateInstance("H", [0], [], column=0))
        h1 = c.circuit_hash()
        assert h0 != h1
        # param change alters circuit_hash but not structure_hash
        c.add_gate(GateInstance("Rx", [1], [0.5], column=1))
        s1 = c.structure_hash()
        h2 = c.circuit_hash()
        c.gates[-1].params = [0.9]
        assert c.circuit_hash() != h2
        assert c.structure_hash() == s1

    def test_set_num_qubits_drops_out_of_range_gates(self):
        c = QuantumCircuit(3)
        c.add_gate(GateInstance("H", [2], [], column=0))
        c.add_gate(GateInstance("X", [0], [], column=0))
        c.set_num_qubits(2)
        assert [g.gate_name for g in c.gates] == ["X"]
        assert len(c.initial_states) == 2


class TestSimulator:
    def _bell(self):
        c = QuantumCircuit(2)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
        return c

    def test_run_counts_sum(self):
        result = Simulator().run(self._bell(), shots=1000, seed=42)
        assert sum(result.measurement_counts.values()) == 1000
        assert set(result.measurement_counts) <= {"00", "11"}

    def test_run_no_shots(self):
        result = Simulator().run(self._bell(), shots=0, seed=42)
        assert result.measurement_counts == {}
        probs = result.final_state.probabilities
        assert probs[0] == pytest.approx(0.5, abs=1e-6)
        assert probs[3] == pytest.approx(0.5, abs=1e-6)

    def test_record_steps(self):
        result = Simulator().run(self._bell(), shots=0, record_steps=True)
        assert len(result.step_states) == 2
        p0 = result.step_states[0].probabilities
        assert p0[0b00] == pytest.approx(0.5, abs=1e-6)
        assert p0[0b10] == pytest.approx(0.5, abs=1e-6)

    def test_step_by_step_yields_initial(self):
        steps = list(Simulator().run_step_by_step(self._bell()))
        assert [col for _, col in steps] == [-1, 0, 1]
        assert steps[0][0].probabilities[0] == pytest.approx(1.0)

    def test_parameterized_gates_no_recompile(self):
        from quantum_simulator_tpu.ops import program as prog
        prog.clear_compile_cache()
        c = QuantumCircuit(2)
        c.add_gate(GateInstance("Ry", [0], [0.3], column=0))
        Simulator().run(c, shots=0)
        size0 = len(prog._CACHE)
        c.gates[0].params = [1.2]
        Simulator().run(c, shots=0)
        assert len(prog._CACHE) == size0  # same structure -> cache hit

    def test_seeded_runs_reproducible(self):
        r1 = Simulator().run(self._bell(), shots=500, seed=7)
        r2 = Simulator().run(self._bell(), shots=500, seed=7)
        assert r1.measurement_counts == r2.measurement_counts
