"""OpenQASM 2.0 import/export tests.

Semantics-level checks: exported-then-reimported circuits produce the
same state vector through the real engine, and imports of hand-written
QASM (qelib1 names, parameter expressions, broadcast, custom gate
macros) match directly-constructed circuits.
"""

import math

import numpy as np
import pytest

from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
from quantum_simulator_tpu.interop import (QasmError, from_qasm, to_qasm)
from quantum_simulator_tpu.simulator import Simulator


def _state(circuit):
    return np.asarray(Simulator().run(circuit, shots=1).final_state.data)


def _assert_same_state(c1, c2):
    s1, s2 = _state(c1), _state(c2)
    # global-phase-insensitive comparison
    k = int(np.argmax(np.abs(s1)))
    phase = s2[k] / s1[k]
    np.testing.assert_allclose(s1 * phase, s2, atol=1e-6)


class TestRoundtrip:
    def test_fixed_gates(self):
        c = QuantumCircuit(num_qubits=3)
        for i, name in enumerate(["H", "X", "Y", "Z", "S", "T",
                                  "S_DAG", "T_DAG", "I"]):
            c.add(name, [i % 3])
        c.add("CNOT", [0, 1])
        c.add("CZ", [1, 2])
        c.add("SWAP", [0, 2])
        c.add("Toffoli", [0, 1, 2])
        c.add("Fredkin", [2, 0, 1])
        _assert_same_state(c, from_qasm(to_qasm(c)))

    def test_param_gates(self):
        c = QuantumCircuit(num_qubits=2)
        c.add("Rx", [0], [0.3])
        c.add("Ry", [1], [math.pi / 4])
        c.add("Rz", [0], [-1.25])
        c.add("Phase", [1], [math.pi / 3])
        c.add("U3", [0], [0.1, 0.2, 0.3])
        c.add("CPhase", [0, 1], [math.pi / 8])
        _assert_same_state(c, from_qasm(to_qasm(c)))

    def test_initial_states_become_x_column(self):
        c = QuantumCircuit(num_qubits=3, initial_states=[0, 1, 1])
        c.add("H", [0])
        qasm = to_qasm(c)
        assert qasm.count("x q[") == 2
        # import has all-zero initial states but the X gates reproduce them
        c2 = from_qasm(qasm)
        assert c2.initial_states == [0, 0, 0]
        _assert_same_state(c, c2)

    def test_measure_and_barrier(self):
        c = QuantumCircuit(num_qubits=2)
        c.add("H", [0])
        c.add("Barrier", [0])
        c.add("Barrier", [1], column=1)
        c.add("Measure", [0])
        c.add("Measure", [1])
        qasm = to_qasm(c)
        assert "barrier q[0],q[1];" in qasm
        assert "measure q[0] -> c[0];" in qasm
        c2 = from_qasm(qasm)
        names = [g.gate_name for g in c2.gates]
        assert names.count("Measure") == 2
        assert names.count("Barrier") == 2

    def test_mcz3_exports_as_h_ccx_h(self):
        c = QuantumCircuit(num_qubits=3)
        c.add("MCZ3", [0, 1, 2])
        qasm = to_qasm(c)
        assert "ccx" in qasm
        _assert_same_state(c, from_qasm(qasm))

    def test_wide_mcz_raises(self):
        c = QuantumCircuit(num_qubits=4)
        c.add("MCZ4", [0, 1, 2, 3])
        with pytest.raises(QasmError, match="MCZ4"):
            to_qasm(c)

    def test_unknown_gate_raises(self):
        c = QuantumCircuit(num_qubits=1)
        c.add_gate(GateInstance("Mystery", [0], [], 0))
        with pytest.raises(QasmError, match="Mystery"):
            to_qasm(c)


class TestImport:
    def test_bell(self):
        c = from_qasm("""
            OPENQASM 2.0;
            include "qelib1.inc";
            qreg q[2];
            creg c[2];
            h q[0];
            cx q[0],q[1];
        """)
        ref = QuantumCircuit(num_qubits=2)
        ref.add("H", [0])
        ref.add("CNOT", [0, 1])
        _assert_same_state(ref, c)

    def test_parameter_expressions(self):
        c = from_qasm("""
            qreg q[1];
            rx(pi/2) q[0];
            rz(-3*pi/4) q[0];
            u1(2*pi/8 + 0.5) q[0];
            ry(sin(0.3)*2) q[0];
        """)
        assert c.gates[0].params == pytest.approx([math.pi / 2])
        assert c.gates[1].params == pytest.approx([-3 * math.pi / 4])
        assert c.gates[2].params == pytest.approx([math.pi / 4 + 0.5])
        assert c.gates[3].params == pytest.approx([2 * math.sin(0.3)])

    def test_register_broadcast(self):
        c = from_qasm("qreg q[3]; h q; cx q[0],q[1];")
        names = [g.gate_name for g in c.gates]
        assert names == ["H", "H", "H", "CNOT"]
        assert [g.target_qubits for g in c.gates[:3]] == [[0], [1], [2]]

    def test_two_register_lockstep_broadcast(self):
        c = from_qasm("qreg a[2]; qreg b[2]; cx a,b;")
        assert [(g.gate_name, g.target_qubits) for g in c.gates] == [
            ("CNOT", [0, 2]), ("CNOT", [1, 3])]

    def test_asap_column_packing(self):
        c = from_qasm("qreg q[3]; h q[0]; h q[2]; cx q[0],q[1]; x q[2];")
        cols = {(g.gate_name, tuple(g.target_qubits)): g.column
                for g in c.gates}
        assert cols[("H", (0,))] == 0
        assert cols[("H", (2,))] == 0
        assert cols[("CNOT", (0, 1))] == 1
        assert cols[("X", (2,))] == 1

    def test_u2_and_u_aliases(self):
        c = from_qasm("qreg q[1]; u2(0.1,0.2) q[0]; u(1,2,3) q[0]; "
                      "p(0.5) q[0];")
        assert c.gates[0].gate_name == "U3"
        assert c.gates[0].params == pytest.approx([math.pi / 2, 0.1, 0.2])
        assert c.gates[1].params == pytest.approx([1, 2, 3])
        assert c.gates[2].gate_name == "Phase"

    def test_custom_gate_macro(self):
        c = from_qasm("""
            OPENQASM 2.0;
            gate bell a,b { h a; cx a,b; }
            gate rot(t) a { rx(t) a; rz(t/2) a; }
            qreg q[2];
            bell q[0],q[1];
            rot(pi) q[1];
        """)
        names = [g.gate_name for g in c.gates]
        assert names == ["H", "CNOT", "Rx", "Rz"]
        assert c.gates[2].params == pytest.approx([math.pi])
        assert c.gates[3].params == pytest.approx([math.pi / 2])

    def test_nested_custom_gates(self):
        c = from_qasm("""
            gate half(t) a { ry(t/2) a; }
            gate whole(t) a { half(t) a; half(t) a; }
            qreg q[1];
            whole(0.8) q[0];
        """)
        assert [g.params[0] for g in c.gates] == pytest.approx([0.4, 0.4])
        ref = QuantumCircuit(num_qubits=1)
        ref.add("Ry", [0], [0.8])
        _assert_same_state(ref, c)

    def test_measure_broadcast(self):
        c = from_qasm("qreg q[2]; creg c[2]; h q; measure q -> c;")
        assert sum(g.gate_name == "Measure" for g in c.gates) == 2

    def test_comments_stripped(self):
        c = from_qasm("// header\nqreg q[1]; /* block\ncomment */ h q[0];")
        assert [g.gate_name for g in c.gates] == ["H"]

    def test_errors(self):
        with pytest.raises(QasmError, match="no qreg"):
            from_qasm("OPENQASM 2.0;")
        with pytest.raises(QasmError, match="unknown gate"):
            from_qasm("qreg q[1]; zz q[0];")
        with pytest.raises(QasmError, match="out of range"):
            from_qasm("qreg q[2]; h q[5];")
        with pytest.raises(QasmError, match="unsupported"):
            from_qasm("qreg q[1]; creg c[1]; if (c==1) x q[0];")
        with pytest.raises(QasmError, match="unknown identifier"):
            from_qasm("qreg q[1]; rx(__import__) q[0];")
        with pytest.raises(QasmError, match="duplicate qubit"):
            from_qasm("qreg q[2]; cx q[0],q[0];")
        with pytest.raises(QasmError, match="mismatched"):
            from_qasm("qreg a[2]; qreg b[3]; cx a,b;")

    def test_qft4_qiskit_style(self):
        """A realistic qiskit-exported QFT-4 matches this engine's own
        QFT template state."""
        from quantum_simulator_tpu.algorithms import AlgorithmTemplate
        qasm = """
            OPENQASM 2.0;
            include "qelib1.inc";
            qreg q[4];
            h q[0];
            cu1(pi/2) q[1],q[0];
            cu1(pi/4) q[2],q[0];
            cu1(pi/8) q[3],q[0];
            h q[1];
            cu1(pi/2) q[2],q[1];
            cu1(pi/4) q[3],q[1];
            h q[2];
            cu1(pi/2) q[3],q[2];
            h q[3];
            swap q[0],q[3];
            swap q[1],q[2];
        """
        imported = from_qasm(qasm)
        ref = AlgorithmTemplate.quantum_fourier_transform(4)

        def _with_prep(body: QuantumCircuit) -> QuantumCircuit:
            merged = QuantumCircuit(num_qubits=4)
            merged.add("X", [1], column=0)
            merged.add("H", [3], column=0)
            for g in body.gates:
                if g.gate_name == "Measure":
                    continue
                merged.add_gate(GateInstance(
                    g.gate_name, list(g.target_qubits), list(g.params),
                    g.column + 1))
            return merged

        _assert_same_state(_with_prep(ref), _with_prep(imported))


class TestExpressionParser:
    """_eval_expr is a recursive-descent parser (no eval) — ADVICE r3:
    scientific-notation literals must not scan as identifier 'e', and
    hostile power towers must fail fast instead of building bignums."""

    def test_scientific_notation_roundtrip(self):
        c = QuantumCircuit(num_qubits=1)
        c.add("Rz", [0], [1e-5])
        c2 = from_qasm(to_qasm(c))
        assert c2.gates[0].params[0] == pytest.approx(1e-5)

    def test_sci_notation_forms(self):
        from quantum_simulator_tpu.interop import _eval_expr
        assert _eval_expr("1e-05", {}) == pytest.approx(1e-5)
        assert _eval_expr("2.5E+3", {}) == pytest.approx(2500.0)
        assert _eval_expr("1e2", {}) == pytest.approx(100.0)
        assert _eval_expr(".5e1", {}) == pytest.approx(5.0)

    def test_grammar(self):
        from quantum_simulator_tpu.interop import _eval_expr
        assert _eval_expr("2+3*4", {}) == pytest.approx(14.0)
        assert _eval_expr("(2+3)*4", {}) == pytest.approx(20.0)
        assert _eval_expr("-pi/2", {}) == pytest.approx(-math.pi / 2)
        assert _eval_expr("2^3^2", {}) == pytest.approx(512.0)  # right-assoc
        assert _eval_expr("-2^2", {}) == pytest.approx(-4.0)
        assert _eval_expr("sin(pi/6)", {}) == pytest.approx(0.5)
        assert _eval_expr("sqrt(2)*cos(0)", {}) == pytest.approx(math.sqrt(2))
        assert _eval_expr("theta/2", {"theta": 0.8}) == pytest.approx(0.4)

    def test_hostile_power_tower_rejected(self):
        from quantum_simulator_tpu.interop import _eval_expr
        # float arithmetic: overflows to QasmError instead of bignum DoS
        with pytest.raises(QasmError):
            _eval_expr("9^9^9^9", {})

    def test_parse_errors(self):
        from quantum_simulator_tpu.interop import _eval_expr
        with pytest.raises(QasmError, match="unknown identifier"):
            _eval_expr("2*tau", {})
        with pytest.raises(QasmError):
            _eval_expr("1/0", {})
        with pytest.raises(QasmError):
            _eval_expr("(1+2", {})
        with pytest.raises(QasmError):
            _eval_expr("1 2", {})
        with pytest.raises(QasmError):
            _eval_expr("sin 3", {})
