"""Algorithm templates: physics-level validation of each factory."""

import numpy as np
import pytest

from quantum_simulator_tpu import QuantumCircuit, Simulator
from quantum_simulator_tpu.algorithms import AlgorithmTemplate


def final_probs(circuit: QuantumCircuit) -> np.ndarray:
    return Simulator().run(circuit, shots=0).final_state.probabilities


def final_amps(circuit: QuantumCircuit) -> np.ndarray:
    return Simulator().run(circuit, shots=0).final_state.data


def test_bell_template():
    probs = final_probs(AlgorithmTemplate.bell_state())
    assert probs[0b00] == pytest.approx(0.5, abs=1e-5)
    assert probs[0b11] == pytest.approx(0.5, abs=1e-5)


def test_ghz_template():
    probs = final_probs(AlgorithmTemplate.ghz_state(4))
    assert probs[0] == pytest.approx(0.5, abs=1e-5)
    assert probs[-1] == pytest.approx(0.5, abs=1e-5)


def test_qft_matches_dft_matrix():
    """The exact QFT must map |x> to (1/sqrt(N)) sum_y w^{xy} |y>."""
    n = 3
    dim = 2**n
    for x in [0, 3, 5]:
        bits = [(x >> (n - 1 - i)) & 1 for i in range(n)]
        circuit = AlgorithmTemplate.quantum_fourier_transform(n)
        circuit.initial_states = bits
        amps = final_amps(circuit)
        w = np.exp(2j * np.pi / dim)
        expected = np.array([w ** (x * y) for y in range(dim)]) / np.sqrt(dim)
        np.testing.assert_allclose(amps, expected, atol=1e-5)


def test_inverse_qft_roundtrip():
    n = 3
    fwd = AlgorithmTemplate.quantum_fourier_transform(n)
    inv = AlgorithmTemplate.inverse_qft(n)
    combined = QuantumCircuit(n, initial_states=[1, 0, 1])
    offset = 0
    for src in (fwd, inv):
        for g in src.gates:
            combined.add(g.gate_name, g.target_qubits, g.params,
                         column=g.column + offset)
        offset = combined.get_column_count()
    probs = final_probs(combined)
    assert probs[0b101] == pytest.approx(1.0, abs=1e-4)


@pytest.mark.parametrize("n,marked", [(2, 1), (3, 5), (4, 11)])
def test_grover_finds_marked_state(n, marked):
    """Exact oracle + diffusion: marked-state probability must dominate."""
    circuit = AlgorithmTemplate.grover_search(n, marked_state=marked)
    probs = final_probs(circuit)
    assert int(np.argmax(probs)) == marked
    assert probs[marked] > 0.8


def test_deutsch_jozsa_balanced_vs_constant():
    # Constant: all input qubits measure 0
    c_const = AlgorithmTemplate.deutsch_jozsa(3, "constant")
    probs = final_probs(c_const)
    # inputs are qubits 0,1 (MSBs); ancilla is qubit 2
    input_marginal = probs.reshape(4, 2).sum(axis=1)
    assert input_marginal[0] == pytest.approx(1.0, abs=1e-5)
    # Balanced: inputs never all-zero
    c_bal = AlgorithmTemplate.deutsch_jozsa(3, "balanced")
    probs = final_probs(c_bal)
    input_marginal = probs.reshape(4, 2).sum(axis=1)
    assert input_marginal[0] == pytest.approx(0.0, abs=1e-5)


def test_bernstein_vazirani_recovers_secret():
    secret = "101"
    circuit = AlgorithmTemplate.bernstein_vazirani(secret)
    probs = final_probs(circuit)
    # input qubits (first 3) must equal the secret; ancilla in |->
    marginal = probs.reshape(8, 2).sum(axis=1)
    assert marginal[int(secret, 2)] == pytest.approx(1.0, abs=1e-5)


def test_superdense_coding_decodes_11():
    probs = final_probs(AlgorithmTemplate.superdense_coding())
    assert probs[0b11] == pytest.approx(1.0, abs=1e-5)


def test_teleportation_preserves_norm():
    probs = final_probs(AlgorithmTemplate.quantum_teleportation())
    assert probs.sum() == pytest.approx(1.0, abs=1e-5)


def test_list_templates():
    templates = AlgorithmTemplate.list_templates()
    # The reference's nine plus the time-evolution addition.
    assert len(templates) == 10
    assert {t["name"] for t in templates} == {
        "bell_state", "ghz_state", "qft", "inverse_qft", "grover",
        "deutsch_jozsa", "teleportation", "bernstein_vazirani",
        "superdense_coding", "tfim_quench"}


def test_tfim_quench_template():
    c = AlgorithmTemplate.tfim_quench(4, time=0.5)
    probs = final_probs(c)
    assert probs.sum() == pytest.approx(1.0, abs=1e-5)
    # At t=0 the template is just the domain-wall preparation.
    c0 = AlgorithmTemplate.tfim_quench(4, time=0.0)
    probs0 = final_probs(c0)
    assert probs0[0b0011] == pytest.approx(1.0, abs=1e-6)
    with pytest.raises(ValueError):
        AlgorithmTemplate.tfim_quench(1)


def test_mcz_gates_serialize():
    c = AlgorithmTemplate.grover_search(4, marked_state=3)
    d = c.to_dict()
    c2 = QuantumCircuit.from_dict(d)
    assert c2.circuit_hash() == c.circuit_hash()
    probs = final_probs(c2)
    assert int(np.argmax(probs)) == 3
