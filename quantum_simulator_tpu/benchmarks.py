"""Acceptance benchmark suite: six named circuits with expected outcomes.

Parity target: ``/root/reference/quantum_sim/engine/benchmarks.py:22-241``
(Bell / GHZ-3 / Hadamard-1 / QFT-3 / Identity / X-Gate with the same
expected nonzero bitstrings and fidelity floors; ideal timed run, optional
noisy fidelity, TVD, pass/fail).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

from .circuit import GateInstance, QuantumCircuit


@dataclass
class BenchmarkResult:
    """Outcome of one benchmark circuit."""

    name: str
    passed: bool
    fidelity: float
    tvd: float
    runtime_ms: float
    details: str = ""


class BenchmarkSuite:
    """Predefined validation benchmarks."""

    @staticmethod
    def _bell_benchmark() -> dict:
        circuit = QuantumCircuit(num_qubits=2)
        circuit.add_gate(GateInstance("H", [0], [], 0))
        circuit.add_gate(GateInstance("CNOT", [0, 1], [], 1))
        return {
            "name": "Bell State",
            "circuit": circuit,
            "expected_nonzero": {"00", "11"},
            "expected_fidelity_min": 0.99,
        }

    @staticmethod
    def _ghz3_benchmark() -> dict:
        circuit = QuantumCircuit(num_qubits=3)
        circuit.add_gate(GateInstance("H", [0], [], 0))
        circuit.add_gate(GateInstance("CNOT", [0, 1], [], 1))
        circuit.add_gate(GateInstance("CNOT", [0, 2], [], 2))
        return {
            "name": "GHZ-3",
            "circuit": circuit,
            "expected_nonzero": {"000", "111"},
            "expected_fidelity_min": 0.99,
        }

    @staticmethod
    def _hadamard1_benchmark() -> dict:
        circuit = QuantumCircuit(num_qubits=1)
        circuit.add_gate(GateInstance("H", [0], [], 0))
        return {
            "name": "Hadamard-1",
            "circuit": circuit,
            "expected_nonzero": {"0", "1"},
            "expected_fidelity_min": 0.99,
        }

    @staticmethod
    def _qft3_benchmark() -> dict:
        from .algorithms import AlgorithmTemplate

        return {
            "name": "QFT-3",
            "circuit": AlgorithmTemplate.quantum_fourier_transform(3),
            "expected_nonzero": None,  # uniform over all states on |000>
            "expected_fidelity_min": 0.99,
        }

    @staticmethod
    def _identity_benchmark() -> dict:
        return {
            "name": "Identity",
            "circuit": QuantumCircuit(num_qubits=2),
            "expected_nonzero": {"00"},
            "expected_fidelity_min": 0.9999,
        }

    @staticmethod
    def _xgate_benchmark() -> dict:
        circuit = QuantumCircuit(num_qubits=2)
        circuit.add_gate(GateInstance("X", [0], [], 0))
        return {
            "name": "X-Gate",
            "circuit": circuit,
            "expected_nonzero": {"10"},
            "expected_fidelity_min": 0.99,
        }

    @classmethod
    def get_all_benchmarks(cls) -> list[dict]:
        return [
            cls._bell_benchmark(),
            cls._ghz3_benchmark(),
            cls._hadamard1_benchmark(),
            cls._qft3_benchmark(),
            cls._identity_benchmark(),
            cls._xgate_benchmark(),
        ]

    @classmethod
    def run_all(cls, noise_model: object | None = None,
                seed: int | None = None) -> list[BenchmarkResult]:
        """Run every benchmark: timed ideal run (1024 shots), optional
        noisy-vs-ideal fidelity, TVD, expected-outcome check."""
        from .analysis import ConvergenceAnalysis, StateAnalysis
        from .simulator import Simulator

        rng = np.random.default_rng(seed)
        results: list[BenchmarkResult] = []

        for bench in cls.get_all_benchmarks():
            circuit: QuantumCircuit = bench["circuit"]
            expected_nonzero = bench["expected_nonzero"]
            fidelity_min = bench["expected_fidelity_min"]

            sim_ideal = Simulator()
            child_rng = np.random.default_rng(rng.integers(0, 2**63))
            t0 = time.perf_counter()
            result_ideal = sim_ideal.run(circuit, shots=1024, rng=child_rng)
            result_ideal.final_state.device_data.block_until_ready()
            runtime_ms = (time.perf_counter() - t0) * 1000
            ideal_state = result_ideal.final_state

            if noise_model is not None:
                child_rng2 = np.random.default_rng(rng.integers(0, 2**63))
                noisy_state = Simulator(noise_model=noise_model).run(
                    circuit, shots=0, rng=child_rng2).final_state
                fidelity = StateAnalysis.process_fidelity(ideal_state,
                                                          noisy_state)
            else:
                fidelity = 1.0

            tvd = ConvergenceAnalysis.tvd(
                ideal_state.probabilities,
                result_ideal.measurement_counts,
                result_ideal.num_shots,
            )

            passed = fidelity >= fidelity_min
            if expected_nonzero is not None:
                actual_nonzero = set(result_ideal.measurement_counts)
                if not expected_nonzero.issubset(actual_nonzero):
                    passed = False

            results.append(BenchmarkResult(
                name=bench["name"],
                passed=passed,
                fidelity=fidelity,
                tvd=tvd,
                runtime_ms=runtime_ms,
                details=(f"Fidelity={fidelity:.6f}, TVD={tvd:.4f}, "
                         f"Time={runtime_ms:.1f}ms"),
            ))

        return results
