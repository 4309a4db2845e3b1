"""Randomized stress: the group-plan executor must match the per-gate
einsum path on arbitrary gate mixes (1q/2q/diagonal/Toffoli, random
placement) — this is the guard on the plan builder's commutation-window
and diag-pair bookkeeping."""

import jax.numpy as jnp
import numpy as np

from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
from quantum_simulator_tpu.ops import program as prog
from quantum_simulator_tpu.ops.plan import (
    DiagPairStep,
    build_group_plan,
    group_forward_fn,
)

GATES_1Q = ["H", "X", "Y", "Z", "S", "T", "Rx", "Ry", "Rz", "Phase"]
GATES_2Q = ["CNOT", "CZ", "SWAP", "CPhase"]


def _random_circuit(rng, n):
    c = QuantumCircuit(n)
    col = 0
    for _ in range(12):
        kind = rng.integers(0, 4)
        if kind == 0:
            for q in range(n):
                g = GATES_1Q[rng.integers(len(GATES_1Q))]
                params = ([float(rng.uniform(0, 6.28))]
                          if g in ("Rx", "Ry", "Rz", "Phase") else [])
                c.add_gate(GateInstance(g, [q], params, column=col))
        elif kind == 1:
            qs = list(rng.permutation(n))
            for i in range(0, n - 1, 2):
                g = GATES_2Q[rng.integers(len(GATES_2Q))]
                params = ([float(rng.uniform(0, 6.28))]
                          if g == "CPhase" else [])
                c.add_gate(GateInstance(
                    g, [int(qs[i]), int(qs[i + 1])], params, column=col))
        elif kind == 2 and n >= 3:
            qs = rng.choice(n, 3, replace=False)
            c.add_gate(GateInstance("Toffoli", [int(q) for q in qs], [],
                                    column=col))
        else:
            c.add_gate(GateInstance("Ry", [int(rng.integers(n))], [0.3],
                                    column=col))
        col += 1
    return c


def test_random_mixes_match_einsum_path():
    rng = np.random.default_rng(20240816)
    diag_steps_seen = 0
    for _ in range(8):
        n = int(rng.integers(8, 15))
        c = _random_circuit(rng, n)
        p = prog.compile_circuit(c)
        params = jnp.asarray(p.initial_params)
        got = np.asarray(group_forward_fn(p)(params))
        expected = np.asarray(prog.forward_fn(p)(params))
        np.testing.assert_allclose(got, expected, atol=2e-5)
        plan = build_group_plan(p)
        diag_steps_seen += sum(
            1 for s in plan.steps if isinstance(s, DiagPairStep))
    # the sweep must actually exercise the diag-pair fusion path
    assert diag_steps_seen > 0


def test_qft_is_diag_heavy():
    """QFT's cross-group CPhases must fuse into diag-pair passes, not
    dense cross matmuls."""
    from quantum_simulator_tpu.algorithms import AlgorithmTemplate

    c = AlgorithmTemplate.quantum_fourier_transform(10)
    p = prog.compile_circuit(c)
    plan = build_group_plan(p)
    assert any(isinstance(s, DiagPairStep) for s in plan.steps)
    got = np.asarray(group_forward_fn(p)(jnp.asarray(p.initial_params)))
    expected = np.asarray(prog.forward_fn(p)(jnp.asarray(p.initial_params)))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_custom_gate_and_nonzero_initial_states():
    """Custom registered unitaries (host-only matrix_func -> baked static)
    and nonzero initial states must flow through the group executor."""
    from quantum_simulator_tpu.gates import GateDefinition, GateType
    from quantum_simulator_tpu.registry import GateRegistry

    reg = GateRegistry.instance()
    theta = 0.77
    mat = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]], dtype=np.complex128)
    if "TestRot" not in [g.name for g in reg.all_gates()]:
        reg.register(GateDefinition(
            name="TestRot", display_name="Test rotation",
            gate_type=GateType.SINGLE, num_qubits=1, num_params=0,
            param_names=(), matrix_func=lambda: mat, symbol="TR",
            color="#888888"))
    try:
        c = QuantumCircuit(9, initial_states=[1, 0, 1, 0, 0, 0, 0, 0, 1])
        c.add_gate(GateInstance("TestRot", [4], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 8], [], column=1))
        p = prog.compile_circuit(c)
        params = jnp.asarray(p.initial_params)
        got = np.asarray(group_forward_fn(p)(params))
        expected = np.asarray(prog.forward_fn(p)(params))
        np.testing.assert_allclose(got, expected, atol=2e-6)
    finally:
        reg.reset()


def test_grover_mcz_through_group_plan():
    """Grover uses self-registered static MCZ_k gates; the plan's
    numeric diagonality check must route cross-group ones correctly."""
    from quantum_simulator_tpu.algorithms import AlgorithmTemplate

    c = AlgorithmTemplate.grover_search(9, marked_state=37)
    p = prog.compile_circuit(c)
    params = jnp.asarray(p.initial_params)
    got = np.asarray(group_forward_fn(p)(params))
    expected = np.asarray(prog.forward_fn(p)(params))
    np.testing.assert_allclose(got, expected, atol=5e-5)
    probs = np.abs(got) ** 2
    assert probs[37] > 0.5  # Grover amplifies the marked state
