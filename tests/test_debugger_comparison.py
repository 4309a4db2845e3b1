"""Debugger (stepping, breakpoints, noise impact/attribution, state diff),
comparator, and benchmark suite."""

import numpy as np
import pytest

from quantum_simulator_tpu import (
    DepolarizingNoise,
    GateInstance,
    NoiseModel,
    QuantumCircuit,
)
from quantum_simulator_tpu.benchmarks import BenchmarkSuite
from quantum_simulator_tpu.comparison import CircuitComparator
from quantum_simulator_tpu.debugger import CircuitDebugger


def bell():
    c = QuantumCircuit(2)
    c.add_gate(GateInstance("H", [0], [], column=0))
    c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
    return c


def noisy_model(p=0.1):
    nm = NoiseModel()
    nm.add_global_noise(DepolarizingNoise(p))
    return nm


class TestDebugger:
    def test_snapshots_and_stepping(self):
        dbg = CircuitDebugger()
        snaps = dbg.run_full_debug(bell())
        assert len(snaps) == 3  # initial + 2 columns
        assert snaps[0].column_index == -1
        assert snaps[1].gate_labels == ["H(0)"]
        assert snaps[2].gate_labels == ["CNOT(0,1)"]
        assert dbg.current_snapshot.column_index == -1
        assert dbg.step_forward().column_index == 0
        assert dbg.step_forward().column_index == 1
        assert dbg.step_forward() is None
        assert dbg.step_backward().column_index == 0
        assert dbg.goto_step(2).column_index == 1

    def test_noiseless_fidelities_are_one(self):
        dbg = CircuitDebugger()
        snaps = dbg.run_full_debug(bell())
        assert all(s.fidelity == 1.0 for s in snaps)
        assert all(s.ideal_state is None for s in snaps)

    def test_noisy_fidelity_tracked(self):
        dbg = CircuitDebugger()
        snaps = dbg.run_full_debug(bell(), noisy_model(0.5), seed=42)
        assert snaps[0].fidelity == pytest.approx(1.0, abs=1e-5)
        assert all(s.ideal_state is not None for s in snaps)
        assert all(0.0 <= s.fidelity <= 1.0 + 1e-6 for s in snaps)

    def test_breakpoints(self):
        dbg = CircuitDebugger()
        dbg.run_full_debug(bell())
        dbg.add_breakpoint(1)
        assert dbg.run_to_breakpoint().column_index == 1
        assert dbg.toggle_breakpoint(1) is False
        assert dbg.toggle_breakpoint(0) is True
        dbg.clear_breakpoints()
        assert dbg.breakpoints == set()

    def test_noise_impact(self):
        dbg = CircuitDebugger()
        results = dbg.compute_noise_impact(bell(), noisy_model(0.2),
                                           n_trials=30, seed=42)
        assert len(results) == 2
        for r in results:
            assert 0.0 <= r.fidelity_after <= 1.0 + 1e-6
            assert len(r.per_qubit_fidelity) == 2
            assert r.std_delta_fidelity >= 0
        assert dbg.compute_noise_impact(bell(), None) == []

    def test_noise_attribution_sums_to_total(self):
        dbg = CircuitDebugger()
        attr = dbg.compute_noise_attribution(bell(), noisy_model(0.2),
                                             n_trials=30, seed=42)
        assert len(attr.delta_fidelity) == 2
        assert sum(attr.delta_fidelity) == pytest.approx(
            attr.total_fidelity_loss, abs=1e-9)
        if not attr.no_measurable_loss:
            assert sum(attr.column_attribution_pct) == pytest.approx(
                100.0, abs=1e-6)
        assert len(attr.per_qubit_attribution) == 2
        assert attr.gate_labels == [["H(0)"], ["CNOT(0,1)"]]

    def test_attribution_no_noise_flags_no_loss(self):
        dbg = CircuitDebugger()
        attr = dbg.compute_noise_attribution(bell(), noisy_model(0.0),
                                             n_trials=5, seed=1)
        assert attr.no_measurable_loss
        assert attr.column_attribution_pct == [0.0, 0.0]

    def test_state_diff(self):
        dbg = CircuitDebugger()
        snaps = dbg.run_full_debug(bell())
        diff = dbg.compute_state_diff(snaps[0], snaps[2])
        assert diff["fidelity"] == pytest.approx(0.5, abs=1e-5)
        assert diff["tvd"] == pytest.approx(0.5, abs=1e-5)
        assert len(diff["amplitude_diffs"]) >= 2
        idx, bitstring, amp_a, amp_b, mag = diff["amplitude_diffs"][0]
        assert isinstance(bitstring, str) and mag > 0


class TestComparator:
    def test_identical_circuits(self):
        comp = CircuitComparator()
        res = comp.compare(bell(), bell(), shots=2000, seed=42)
        assert res.output_fidelity == pytest.approx(1.0, abs=1e-5)
        assert res.distribution_tvd < 0.1
        assert res.metrics_a.gate_count == 2
        assert res.metrics_a.single_qubit_gates == 1
        assert res.metrics_a.multi_qubit_gates == 1
        assert res.purity_a == pytest.approx(1.0, abs=1e-4)

    def test_qubit_count_mismatch_nan(self):
        c1 = QuantumCircuit(2)
        c3 = QuantumCircuit(3)
        res = CircuitComparator().compare(c1, c3, shots=100, seed=1)
        assert np.isnan(res.output_fidelity)

    def test_noisy_compare(self):
        res = CircuitComparator().compare(bell(), bell(), shots=200,
                                          noise_model=noisy_model(0.05),
                                          seed=42)
        assert sum(res.result_a.measurement_counts.values()) == 200

    def test_export_report(self, tmp_path):
        import json

        res = CircuitComparator().compare(bell(), bell(), shots=100, seed=1)
        path = tmp_path / "report.json"
        CircuitComparator.export_report(res, str(path))
        data = json.loads(path.read_text())
        assert data["metrics_a"]["gate_count"] == 2
        assert "counts_a" in data


class TestBenchmarkSuite:
    def test_all_pass_ideal(self):
        results = BenchmarkSuite.run_all(seed=42)
        assert len(results) == 6
        for r in results:
            assert r.passed, f"{r.name}: {r.details}"
            assert r.fidelity == 1.0
            assert r.runtime_ms >= 0

    def test_noisy_run_reports_fidelity(self):
        results = BenchmarkSuite.run_all(noise_model=noisy_model(0.3),
                                         seed=42)
        assert any(r.fidelity < 1.0 for r in results)


def test_grover_circuit_roundtrips_in_fresh_registry():
    """MCZ_k gates synthesize on demand: a serialized Grover circuit must
    load and run after GateRegistry.reset() (fresh-process equivalent)."""
    from quantum_simulator_tpu.algorithms import AlgorithmTemplate
    from quantum_simulator_tpu.comparison import CircuitComparator
    from quantum_simulator_tpu.circuit import QuantumCircuit
    from quantum_simulator_tpu.registry import GateRegistry
    from quantum_simulator_tpu.simulator import Simulator

    d = AlgorithmTemplate.grover_search(3, marked_state=5).to_dict()
    GateRegistry.reset()
    circuit = QuantumCircuit.from_dict(d)
    result = Simulator().run(circuit, shots=0)
    probs = result.final_state.probabilities
    assert probs[5] > 0.5
    metrics = CircuitComparator().compute_metrics(circuit)
    # the MCZ3 oracle/diffusion gates must be counted as multi-qubit
    assert metrics.multi_qubit_gates >= 2
