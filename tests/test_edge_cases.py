"""Edge cases across the engine surface."""

import numpy as np
import pytest

from quantum_simulator_tpu import (
    CONFIG,
    GateInstance,
    QuantumCircuit,
    Simulator,
    StateVector,
)


class TestEmptyAndTrivialCircuits:
    def test_empty_circuit_run(self):
        result = Simulator().run(QuantumCircuit(3), shots=100, seed=1)
        assert result.measurement_counts == {"000": 100}
        assert result.final_state.probabilities[0] == pytest.approx(1.0)

    def test_empty_circuit_no_shots(self):
        result = Simulator().run(QuantumCircuit(2), shots=0)
        assert result.measurement_counts == {}

    def test_barrier_and_measure_only(self):
        c = QuantumCircuit(2)
        c.add_gate(GateInstance("Barrier", [0], [], column=0))
        c.add_gate(GateInstance("Measure", [0], [], column=1))
        # Measure gate present => counts sampled even with shots default
        result = Simulator().run(c, shots=50, seed=1)
        assert result.measurement_counts == {"00": 50}

    def test_single_qubit_circuit(self):
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("X", [0], [], column=0))
        result = Simulator().run(c, shots=10, seed=0)
        assert result.measurement_counts == {"1": 10}

    def test_step_by_step_empty(self):
        steps = list(Simulator().run_step_by_step(QuantumCircuit(2)))
        assert [col for _, col in steps] == [-1]


class TestBounds:
    def test_qubit_count_bounds(self):
        with pytest.raises(ValueError):
            QuantumCircuit(0)
        # The IR cap is structural (Clifford widths allowed)...
        with pytest.raises(ValueError):
            QuantumCircuit(CONFIG.max_circuit_qubits + 1)
        # ...but amplitude engines enforce the memory cap at entry.
        from quantum_simulator_tpu.simulator import Simulator
        wide = QuantumCircuit(CONFIG.max_qubits + 1)
        with pytest.raises(ValueError, match="amplitude"):
            Simulator().run(wide, shots=0)
        with pytest.raises(ValueError):
            StateVector(0)
        with pytest.raises(ValueError):
            StateVector(CONFIG.max_qubits + 1)

    def test_set_num_qubits_bounds(self):
        c = QuantumCircuit(2)
        with pytest.raises(ValueError):
            c.set_num_qubits(0)

    def test_data_setter_shape_check(self):
        sv = StateVector(2)
        with pytest.raises(ValueError):
            sv.data = np.ones(3, dtype=complex)

    def test_rdm_bounds(self):
        sv = StateVector(2)
        with pytest.raises(ValueError):
            sv.get_reduced_density_matrix(5)
        with pytest.raises(ValueError):
            sv.measure_qubit(-1)


class TestRepeatedColumns:
    def test_gates_stacked_on_same_column_order(self):
        """Within a column, gates apply sorted by first target."""
        c = QuantumCircuit(2)
        c.add_gate(GateInstance("X", [1], [], column=0))
        c.add_gate(GateInstance("H", [0], [], column=0))
        result = Simulator().run(c, shots=0)
        probs = result.final_state.probabilities
        assert probs[0b01] == pytest.approx(0.5, abs=1e-5)
        assert probs[0b11] == pytest.approx(0.5, abs=1e-5)

    def test_sparse_columns(self):
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("X", [0], [], column=0))
        c.add_gate(GateInstance("X", [0], [], column=100))  # gap columns
        result = Simulator().run(c, shots=0)
        assert result.final_state.probabilities[0] == pytest.approx(
            1.0, abs=1e-6)


class TestCustomGateFlow:
    def test_runtime_registered_gate_in_simulation(self):
        from quantum_simulator_tpu.gates import (
            GateDefinition,
            GateType,
            _const,
        )
        from quantum_simulator_tpu.registry import GateRegistry

        sqrt_x = 0.5 * np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]])
        GateRegistry.instance().register(GateDefinition(
            name="SqrtX_test", display_name="√X", gate_type=GateType.SINGLE,
            num_qubits=1, num_params=0, param_names=(),
            matrix_func=_const(sqrt_x), symbol="√X", color="#000000"))
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("SqrtX_test", [0], [], column=0))
        c.add_gate(GateInstance("SqrtX_test", [0], [], column=1))
        result = Simulator().run(c, shots=0)
        # sqrt(X)^2 = X
        assert result.final_state.probabilities[1] == pytest.approx(
            1.0, abs=1e-5)


def test_complex128_verification_mode():
    """complex128 mode matches NumPy to 1e-12 (runs in a subprocess so the
    global x64 flag doesn't leak into other tests)."""
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
from quantum_simulator_tpu.config import enable_complex128
enable_complex128()
import numpy as np
from quantum_simulator_tpu import QuantumCircuit, GateInstance, Simulator
c = QuantumCircuit(3)
c.add_gate(GateInstance("H", [0], [], column=0))
c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
c.add_gate(GateInstance("Rz", [2], [0.7], column=1))
state = Simulator().run(c, shots=0).final_state
amps = state.data
assert amps.dtype == np.complex128
inv = 1 / np.sqrt(2)
expected = np.zeros(8, complex)
expected[0] = inv * np.exp(-0.35j)
expected[6] = inv * np.exp(-0.35j)  # |110> with Rz phase on |0> of q2
err = np.max(np.abs(amps - expected))
assert err < 1e-12, err
print("OK", err)
"""
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, cwd="/root/repo",
                         timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_under_parameterized_gate_rejected():
    """compile_circuit must reject an Rx with no params: silently padding
    would shift every later gate's parameter slot."""
    import pytest

    from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
    from quantum_simulator_tpu.ops import program as prog

    c = QuantumCircuit(2)
    c.add_gate(GateInstance("Rx", [0], [], column=0))
    with pytest.raises(ValueError, match="takes 1 parameter"):
        prog.compile_circuit(c)


def test_key_from_seed_uses_high_bits():
    """jax.random.PRNGKey truncates to 32 bits; key_from_seed must not."""
    import numpy as np

    from quantum_simulator_tpu.utils.seeding import key_from_seed

    a = key_from_seed(5)
    b = key_from_seed(2**32 + 5)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
