"""Round-2 panel-depth viewmodels: debugger State Inspector rows,
per-qubit noise heatmap + attribution overlay, Bloch faded trajectory."""

import numpy as np
import pytest

from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
from quantum_simulator_tpu.debugger import CircuitDebugger
from quantum_simulator_tpu.noise import DepolarizingNoise, NoiseModel
from quantum_simulator_tpu.simulator import Simulator
from quantum_simulator_tpu.viewmodels import (
    BlochModel,
    DebuggerInspectorModel,
)


def bell():
    c = QuantumCircuit(2)
    c.add_gate(GateInstance("H", [0], [], column=0))
    c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
    return c


class TestInspectorRows:
    def test_bell_rows(self):
        dbg = CircuitDebugger()
        dbg.run_full_debug(bell(), noise_model=None, seed=1)
        dbg.goto_step(dbg.num_steps - 1)
        rows = DebuggerInspectorModel.amplitude_rows(dbg.current_snapshot)
        strings = {r.bitstring: r for r in rows}
        assert set(strings) == {"00", "11"}
        for r in rows:
            assert r.probability == pytest.approx(0.5, abs=1e-5)
            # noiseless run: no separate ideal column
            assert r.ideal_probability is None and r.delta is None

    def test_noisy_rows_have_ideal_column(self):
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.2))
        dbg = CircuitDebugger()
        dbg.run_full_debug(bell(), noise_model=nm, seed=5)
        dbg.goto_step(dbg.num_steps - 1)
        rows = DebuggerInspectorModel.amplitude_rows(dbg.current_snapshot)
        assert rows
        assert all(r.ideal_probability is not None for r in rows)
        assert all(r.delta == pytest.approx(
            r.probability - r.ideal_probability, abs=1e-9) for r in rows)

    def test_rows_sorted_by_probability_and_limited(self):
        c = QuantumCircuit(3)
        for q in range(3):
            c.add_gate(GateInstance("H", [q], [], column=0))
        dbg = CircuitDebugger()
        dbg.run_full_debug(c, None, seed=0)
        dbg.goto_step(dbg.num_steps - 1)
        rows = DebuggerInspectorModel.amplitude_rows(
            dbg.current_snapshot, limit=4)
        assert len(rows) == 4
        probs = [r.probability for r in rows]
        assert probs == sorted(probs, reverse=True)

    def test_none_snapshot(self):
        assert DebuggerInspectorModel.amplitude_rows(None) == []


class TestNoiseHeatmap:
    def test_heatmap_shape_and_range(self):
        # product circuit: 1q marginals are sensitive to Pauli noise
        # (Bell would hide it: its reduced rho is I/2 either way)
        c = QuantumCircuit(2)
        c.add_gate(GateInstance("X", [0], [], column=0))
        c.add_gate(GateInstance("X", [1], [], column=1))
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.2))
        dbg = CircuitDebugger()
        impacts = dbg.compute_noise_impact(c, nm, n_trials=100, seed=0)
        mat = DebuggerInspectorModel.noise_heatmap(impacts)
        assert mat.shape == (2, 2)  # (qubits, columns)
        assert (mat >= -1e-6).all() and (mat <= 1.0 + 1e-6).all()
        assert mat.max() > 1e-3  # noise must register somewhere

    def test_empty_impacts(self):
        assert DebuggerInspectorModel.noise_heatmap([]).size == 0

    def test_attribution_overlay_labels(self):
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.1))
        dbg = CircuitDebugger()
        attribution = dbg.compute_noise_attribution(
            bell(), nm, n_trials=20, seed=3)
        labels = DebuggerInspectorModel.heatmap_column_overlay(attribution)
        assert len(labels) == len(attribution.column_attribution_pct)
        for lab in labels:
            assert lab == "—" or lab.endswith("%")
        assert DebuggerInspectorModel.heatmap_column_overlay(None) == []


class TestFadedTrajectory:
    def test_alpha_ramp(self):
        model = BlochModel()
        sim = Simulator()
        for col in range(3):
            c = QuantumCircuit(1)
            if col:
                c.add_gate(GateInstance("Rx", [0], [0.5 * col], column=0))
            model.record_step(sim.run(c, shots=0).final_state)
        trail = model.faded_trajectory(0)
        assert len(trail) == 3
        alphas = [a for *_xyz, a in trail]
        assert alphas[0] == pytest.approx(0.15)
        assert alphas[-1] == pytest.approx(1.0)
        assert alphas == sorted(alphas)

    def test_empty_and_single(self):
        model = BlochModel()
        assert model.faded_trajectory(0) == []
        c = QuantumCircuit(1)
        model.record_step(Simulator().run(c, shots=0).final_state)
        (trail,) = model.faded_trajectory(0)
        assert trail[3] == 1.0
