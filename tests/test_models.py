"""Model zoo: ansätze build valid circuits, Hamiltonians minimize right."""

import numpy as np
import pytest

from quantum_simulator_tpu import Simulator
from quantum_simulator_tpu.models import (
    brickwork_circuit,
    hardware_efficient_ansatz,
    heisenberg_chain,
    maxcut_edges_ring,
    qaoa_maxcut_ansatz,
    tfim_chain,
    zz_chain,
)
from quantum_simulator_tpu.optimizer import (
    CircuitOptimizer,
    CostFunction,
    ParameterizedCircuitConfig,
)


def test_hardware_efficient_param_count():
    c = hardware_efficient_ansatz(4, 3)
    cfg = ParameterizedCircuitConfig.auto_detect(c)
    assert cfg.num_params == 4 * (3 + 1)
    probs = Simulator().run(c, shots=0).final_state.probabilities
    assert probs.sum() == pytest.approx(1.0, abs=1e-5)


def test_qaoa_ansatz_runs():
    c = qaoa_maxcut_ansatz(4, 2)
    probs = Simulator().run(c, shots=0).final_state.probabilities
    assert probs.sum() == pytest.approx(1.0, abs=1e-5)
    cfg = ParameterizedCircuitConfig.auto_detect(c)
    assert cfg.num_params > 0


def test_brickwork_deterministic():
    a = brickwork_circuit(6, 8, seed=3)
    b = brickwork_circuit(6, 8, seed=3)
    assert a.circuit_hash() == b.circuit_hash()
    assert a.depth() == 8


def test_hamiltonian_builders():
    assert len(zz_chain(4)) == 3
    assert len(heisenberg_chain(3)) == 6
    assert len(tfim_chain(3)) == 5
    assert maxcut_edges_ring(4) == [(0, 1), (1, 2), (2, 3), (3, 0)]


def test_vqe_on_tfim_reaches_low_energy():
    """2-qubit TFIM: exact ground energy is -(J^2+... ) — just check the
    optimizer beats the trivial product-state energy."""
    n = 2
    circuit = hardware_efficient_ansatz(n, 2, initial_angle=0.3)
    cfg = ParameterizedCircuitConfig.auto_detect(circuit)
    cost = CostFunction.vqe_hamiltonian(tfim_chain(n))
    res = CircuitOptimizer(cfg, cost, learning_rate=0.2, max_iterations=80,
                           gradient_method="autodiff").run(seed=42)
    # exact ground state of -ZZ - X0 - X1: E0 = -sqrt(J^2 + ...) ~ -2.236
    assert res.optimal_cost < -2.1
