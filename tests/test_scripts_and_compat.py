"""The quantum_sim compatibility facade and the three CLI experiment
scripts (run in-process with tiny sizes)."""

import json
import runpy
import sys

import numpy as np
import pytest


class TestCompatFacade:
    def test_reference_style_imports(self):
        """Every import the reference scripts/tests/GUI use must resolve."""
        from quantum_sim.core.config import AppConfig  # noqa: F401
        from quantum_sim.core.experiment import (  # noqa: F401
            ExperimentConfig,
            SeedManager,
        )
        from quantum_sim.core.serialization import CircuitSerializer  # noqa: F401
        from quantum_sim.engine.analysis import StateAnalysis  # noqa: F401
        from quantum_sim.engine.circuit import (  # noqa: F401
            GateInstance,
            QuantumCircuit,
        )
        from quantum_sim.engine.gate_registry import GateRegistry  # noqa: F401
        from quantum_sim.engine.measurement import (  # noqa: F401
            MeasurementBasis,
            MeasurementEngine,
        )
        from quantum_sim.engine.noise import (  # noqa: F401
            BitFlipNoise,
            DepolarizingNoise,
            NoiseModel,
            PhaseFlipNoise,
            ReadoutError,
        )
        from quantum_sim.engine.optimizer import (  # noqa: F401
            CircuitOptimizer,
            CostFunction,
            ParameterizedCircuitConfig,
        )
        from quantum_sim.engine.qec import (  # noqa: F401
            BitFlipCode,
            PhaseFlipCode,
            QECSimulator,
            SteaneCode,
        )
        from quantum_sim.engine.reference import ReferenceManager  # noqa: F401
        from quantum_sim.engine.simulator import Simulator  # noqa: F401
        from quantum_sim.engine.state_vector import StateVector  # noqa: F401

    def test_facade_is_tpu_engine(self):
        import quantum_sim.engine.simulator as facade
        import quantum_simulator_tpu.simulator as real

        assert facade.Simulator is real.Simulator

    def test_seed_manager_replay(self):
        from quantum_sim.core.experiment import SeedManager

        mgr = SeedManager(42)
        a = mgr.create_child_rng().integers(0, 1000, 5)
        mgr.reset()
        b = mgr.create_child_rng().integers(0, 1000, 5)
        np.testing.assert_array_equal(a, b)

    def test_circuit_serializer_roundtrip(self, tmp_path):
        from quantum_sim.core.serialization import CircuitSerializer
        from quantum_sim.engine.circuit import GateInstance, QuantumCircuit

        c = QuantumCircuit(2)
        c.add_gate(GateInstance("H", [0], [], column=0))
        path = tmp_path / "circuit.qsim"
        CircuitSerializer.save(c, path)
        loaded = CircuitSerializer.load(path)
        assert loaded.circuit_hash() == c.circuit_hash()

    def test_experiment_config_roundtrip(self, tmp_path):
        from quantum_sim.core.experiment import ExperimentConfig
        from quantum_sim.engine.circuit import QuantumCircuit
        from quantum_sim.engine.simulator import Simulator

        c = QuantumCircuit(2)
        result = Simulator().run(c, shots=10, seed=1)
        cfg = ExperimentConfig.from_current(c, seed=1, shots=10,
                                            result=result)
        path = tmp_path / "exp.json"
        cfg.save(path)
        loaded = ExperimentConfig.load(path)
        assert loaded.seed == 1
        assert loaded.circuit == c.to_dict()
        assert loaded.results["num_shots"] == 10


def _run_script(monkeypatch, tmp_path, script, argv):
    out = tmp_path / "out.json"
    monkeypatch.setattr(sys, "argv",
                        [script] + argv + ["--output", str(out)])
    runpy.run_path(f"scripts/{script}", run_name="__main__")
    return json.loads(out.read_text())


class TestScripts:
    def test_noise_sweep(self, monkeypatch, tmp_path):
        data = _run_script(monkeypatch, tmp_path, "noise_sweep.py",
                           ["--circuit", "bell", "--steps", "3",
                            "--trials", "8", "--seed", "42"])
        assert data["experiment"] == "noise_sweep"
        assert len(data["results"]) == 3
        assert data["results"][0]["mean_fidelity"] == pytest.approx(
            1.0, abs=1e-4)  # p=0 point
        assert data["results"][2]["mean_fidelity"] < 0.95

    def test_vqe_benchmark(self, monkeypatch, tmp_path):
        data = _run_script(monkeypatch, tmp_path, "vqe_benchmark.py",
                           ["--qubits", "2", "--layers", "1",
                            "--iters", "25", "--seed", "42"])
        r = data["result"]
        assert r["n_params"] == 4
        assert r["optimal_cost"] < r["initial_cost"]
        assert r["optimal_cost"] < -0.95  # <Z0> minimum is -1

    def test_qec_threshold(self, monkeypatch, tmp_path):
        data = _run_script(monkeypatch, tmp_path, "qec_threshold.py",
                           ["--codes", "bit_flip", "--trials", "30",
                            "--seed", "42"])
        code = data["codes"][0]
        assert code["code"] == "Bit-Flip [3,1,1]"
        assert len(code["sweep"]) == 15
        rates = [pt["logical_rate"] for pt in code["sweep"]]
        assert rates[0] <= rates[-1]  # error grows with p

    def test_dmrg_solve(self, monkeypatch, tmp_path):
        data = _run_script(monkeypatch, tmp_path, "dmrg_solve.py",
                           ["--qubits", "10", "--hamiltonian", "tfim",
                            "--j", "-1.0", "--h", "-1.3",
                            "--chi", "8", "--sweeps", "3",
                            "--states", "2"])
        assert data["experiment"] == "dmrg_solve"
        assert len(data["energies"]) == 2
        # Paramagnetic TFIM: gap = 2 * min quasiparticle energy.
        m = np.zeros((10, 10))
        for i in range(10):
            m[i, i] = 1.3
        for i in range(9):
            m[i, i + 1] = 1.0
        eps = np.linalg.svd(m, compute_uv=False)
        assert data["energies"][0] == pytest.approx(-eps.sum(), rel=1e-4)
        assert data["gaps"][0] == pytest.approx(2 * eps.min(), rel=1e-2)
        assert data["overlaps"][0]["abs_overlap"] < 1e-4
