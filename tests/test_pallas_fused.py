"""Fused Pallas kernel correctness (interpreter mode on CPU) vs XLA path."""

import jax.numpy as jnp
import numpy as np
import pytest

from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
from quantum_simulator_tpu.ops import program as prog
from quantum_simulator_tpu.ops.pallas import fused


def run_both(circuit):
    p = prog.compile_circuit(circuit)
    assert fused.supports(p)
    params = jnp.asarray(p.initial_params)
    got = np.asarray(fused.fused_forward_fn(p, interpret=True)(params))
    expected = np.asarray(prog.forward_fn(p)(params))
    np.testing.assert_allclose(got, expected, atol=1e-5)
    return got


class TestFusedKernel:
    def test_lane_gates_only(self):
        c = QuantumCircuit(8)
        c.add_gate(GateInstance("H", [1], [], column=0))
        c.add_gate(GateInstance("T", [7], [], column=1))
        c.add_gate(GateInstance("CNOT", [1, 6], [], column=2))
        run_both(c)

    def test_row_gates(self):
        c = QuantumCircuit(10)  # rows: qubits 0-2
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("Ry", [1], [0.8], column=1))
        c.add_gate(GateInstance("CNOT", [0, 2], [], column=2))
        c.add_gate(GateInstance("CZ", [1, 2], [], column=3))
        run_both(c)

    def test_mixed_row_lane(self):
        c = QuantumCircuit(9)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 8], [], column=1))
        c.add_gate(GateInstance("SWAP", [1, 5], [], column=2))
        run_both(c)

    def test_three_qubit_lane_gate(self):
        c = QuantumCircuit(9, initial_states=[0, 0, 1, 1, 0, 0, 0, 0, 0])
        c.add_gate(GateInstance("Toffoli", [2, 3, 8], [], column=0))
        got = run_both(c)
        idx = (1 << 6) | (1 << 5) | 1  # qubits 2,3,8 set
        assert abs(got[idx]) == pytest.approx(1.0, abs=1e-5)

    def test_consecutive_lane_gates_compose(self):
        c = QuantumCircuit(8)
        for i, name in enumerate(["H", "S", "T", "X", "Y", "Z"]):
            c.add_gate(GateInstance(name, [i + 2], [], column=i))
        p = prog.compile_circuit(c)
        plan = fused.build_plan(p)
        assert plan.num_lane_ops == 1  # all six composed into one operator
        run_both(c)

    def test_brickwork_circuit(self, rng):
        c = QuantumCircuit(10)
        for col in range(6):
            if col % 2 == 0:
                for q in range(10):
                    c.add_gate(GateInstance(
                        "Ry", [q], [float(rng.uniform(0, 6.28))],
                        column=col))
            else:
                for q in range(col % 4 == 1, 9, 2):
                    c.add_gate(GateInstance("CNOT", [q, q + 1], [],
                                            column=col))
        run_both(c)

    def test_supports_limits(self):
        small = prog.compile_circuit(QuantumCircuit(4))
        assert not fused.supports(small)  # fewer than 8 qubits
        big = QuantumCircuit(11)
        big.add_gate(GateInstance("Toffoli", [0, 1, 2], [], column=0))
        assert not fused.supports(prog.compile_circuit(big))  # 3 row targets
