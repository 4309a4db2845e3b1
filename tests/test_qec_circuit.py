"""Circuit-level-noise QEC memory (`qec_circuit`) on the Clifford engine.

Locks the construction (extraction circuit shape, no-reset outcome
chains), the noise-free silence of the Z sector, deterministic
correction of injected X preparations, and sane noisy behavior.
"""

import numpy as np
import pytest

from quantum_simulator_tpu.circuit import GateInstance
from quantum_simulator_tpu.clifford import (_lower, _scan_evolve_fn,
                                            is_clifford_circuit)
from quantum_simulator_tpu.qec_circuit import (circuit_level_memory,
                                               decode_memory_record,
                                               surface_extraction_circuit)

import jax


def _run_noise_free(circ, lay, n_trials=8, seed=0):
    codes, qa, qb, pp, _ = _lower(circ, collapse_measures=True)
    evolve = _scan_evolve_fn(circ.num_qubits, codes, qa, qb, pp)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_trials)
    run = jax.jit(jax.vmap(lambda k: evolve(k)[1]))
    return np.asarray(run(keys), dtype=np.uint8)


def test_extraction_circuit_structure():
    for d, R in ((3, 2), (5, 1)):
        circ, lay = surface_extraction_circuit(d, R)
        assert circ.num_qubits == 2 * d * d - 1
        assert is_clifford_circuit(circ)
        n_meas = sum(1 for g in circ.gates if g.gate_name == "Measure")
        assert n_meas == R * (lay.n_z + lay.n_x) + d * d
        assert lay.n_z == lay.n_x == (d * d - 1) // 2
        # every CNOT touches exactly one ancilla
        for g in circ.gates:
            if g.gate_name == "CNOT":
                anc = [q for q in g.target_qubits if q >= d * d]
                assert len(anc) == 1


def test_noise_free_z_sector_is_silent():
    """|0...0> is a +1 eigenstate of every Z check: all Z-ancilla
    outcomes are deterministic 0 through the no-reset chain, every
    detection layer is empty, and nothing fails."""
    circ, lay = surface_extraction_circuit(3, 3)
    outs = _run_noise_free(circ, lay, n_trials=16)
    assert (lay.sector_outcomes(outs) == 0).all()
    # The final readout is a RANDOM codeword (the X projections leave a
    # codespace superposition), but always syndrome-free and Z_L = +1.
    data = lay.data_outcomes(outs)
    assert ((data @ lay.sector_matrix.T) % 2 == 0).all()
    fail, raw, det = decode_memory_record(lay, outs)
    assert fail.sum() == 0 and raw.sum() == 0 and det.sum() == 0


def test_noise_free_x_outcomes_random_then_alternating():
    """X-ancilla outcomes project |0...0> into the codespace: the first
    round is a coin flip per ancilla, and the no-reset chain
    ``o_r = o_{r-1} xor s`` with the projected value s = o_1 makes the
    record ALTERNATE exactly: o_2 = 0, o_3 = o_1."""
    circ, lay = surface_extraction_circuit(3, 3)
    outs = _run_noise_free(circ, lay, n_trials=64, seed=3)
    per_round = lay.n_z + lay.n_x
    o = outs[:, :3 * per_round].reshape(-1, 3, per_round)[:, :, lay.n_z:]
    frac = o[:, 0].mean()
    assert 0.3 < frac < 0.7                     # first round is random
    assert (o[:, 1] == 0).all()
    assert (o[:, 2] == o[:, 0]).all()


@pytest.mark.parametrize("q", [0, 2, 4, 8])
def test_injected_x_prep_is_corrected(q):
    """A |1> preparation on any single data qubit is an X error before
    round 1: the decoder must fix it — corrected logical parity 0 even
    when the raw readout parity is flipped (q on row 0)."""
    circ, lay = surface_extraction_circuit(3, 2)
    circ.initial_states[q] = 1
    outs = _run_noise_free(circ, lay, n_trials=4, seed=1)
    fail, raw, det = decode_memory_record(lay, outs)
    assert det.sum() > 0                        # the error is visible
    assert (raw == (1 if q < 3 else 0)).all()   # row 0 flips Z_L raw
    assert fail.sum() == 0


def test_injected_logical_x_fails_raw_and_decoder():
    """X on all of column 0 IS X_L: zero syndrome everywhere, so the
    decoder sees nothing and the logical flip goes through — locks that
    the failure metric measures genuine logical errors."""
    circ, lay = surface_extraction_circuit(3, 2)
    for r in range(3):
        circ.initial_states[r * 3] = 1
    outs = _run_noise_free(circ, lay, n_trials=4, seed=2)
    fail, raw, det = decode_memory_record(lay, outs)
    assert det.sum() == 0
    assert (raw == 1).all() and (fail == 1).all()


def test_circuit_level_memory_noisy_behavior():
    res = circuit_level_memory(3, 2, 0.004, n_trials=400, seed=7)
    assert 0.0 <= res["logical_failure_probability"] < 0.25
    assert res["detection_fraction"] > 0.0
    assert res["n_qubits"] == 17
    zero = circuit_level_memory(3, 2, 0.0, n_trials=16, seed=8)
    assert zero["logical_failure_probability"] == 0.0
    assert zero["detection_fraction"] == 0.0


def test_rejects_bad_rounds():
    with pytest.raises(ValueError, match="n_rounds"):
        surface_extraction_circuit(3, 0)


# ---------------------------------------------------------------------------
# X-basis memory (the mirror experiment)
# ---------------------------------------------------------------------------

def test_x_basis_noise_free_is_silent():
    """|+...+> is a +1 eigenstate of every X check; now it is the
    Z-ancilla record that is random-then-alternating, while the decoded
    X sector is silent and X_L reads +1."""
    circ, lay = surface_extraction_circuit(3, 3, basis="x")
    assert lay.basis == "x"
    outs = _run_noise_free(circ, lay, n_trials=32, seed=4)
    assert (lay.sector_outcomes(outs) == 0).all()
    data = lay.data_outcomes(outs)
    assert ((data @ lay.sector_matrix.T) % 2 == 0).all()
    fail, raw, det = decode_memory_record(lay, outs)
    assert fail.sum() == 0 and raw.sum() == 0 and det.sum() == 0
    # the Z ancillas are the random sector here
    per_round = lay.n_z + lay.n_x
    o = outs[:, :3 * per_round].reshape(-1, 3, per_round)[:, :, :lay.n_z]
    assert 0.3 < o[:, 0].mean() < 0.7
    assert (o[:, 1] == 0).all() and (o[:, 2] == o[:, 0]).all()


def test_x_basis_injected_z_error_is_corrected():
    """A Z fault on one data qubit right after the |+> prep flips X
    checks only: the x memory's decoder must fix it."""
    circ, lay = surface_extraction_circuit(3, 2, basis="x")
    circ.add_gate(GateInstance("Z", [4], [], 0))   # same column as the
    outs = _run_noise_free(circ, lay, 4, seed=6)   # preps, inserted after
    fail, raw, det = decode_memory_record(lay, outs)
    assert det.sum() > 0
    assert fail.sum() == 0


def test_x_basis_noisy_behavior():
    res = circuit_level_memory(3, 2, 0.004, n_trials=400, seed=11,
                               basis="x")
    assert res["basis"] == "x"
    assert 0.0 <= res["logical_failure_probability"] < 0.25
    assert res["detection_fraction"] > 0.0
    with pytest.raises(ValueError, match="basis"):
        surface_extraction_circuit(3, 2, basis="y")


# ---------------------------------------------------------------------------
# Sampler engines: tableau / frame / linear draw-exactness
# ---------------------------------------------------------------------------

def test_engines_draw_identical():
    """Same keys -> identical detection events and readout parities on
    the tableau, Pauli-frame, and linearized-frame engines (the frame
    replays the tableau's per-step noise uniforms positionally; the
    linear engine is the frame's exact GF(2) linearization)."""
    import jax.random as jr
    from quantum_simulator_tpu.qec_circuit import (_trajectory_fn,
                                                   detection_events)
    keys = jr.split(jr.PRNGKey(7), 120)
    for basis in ("z", "x"):
        outs = {}
        lay = None
        for eng in ("clifford", "frame", "linear"):
            run, lay = _trajectory_fn(3, 2, 0.012, basis, engine=eng)
            outs[eng] = np.asarray(run(keys), np.uint8)
        # frame/linear outcomes are bit-identical (same linear map)
        assert (outs["frame"] == outs["linear"]).all()
        # tableau outcomes differ (its OWN projection randomness) but
        # every decode-relevant statistic matches draw-for-draw
        det = {e: detection_events(lay, o) for e, o in outs.items()}
        raw = {e: (lay.data_outcomes(o) @ lay.sector_support) % 2
               for e, o in outs.items()}
        assert (det["clifford"] == det["frame"]).all()
        assert (det["clifford"] == det["linear"]).all()
        assert (raw["clifford"] == raw["linear"]).all()


def test_linear_engine_noise_free_reference():
    """p=0: the linear sampler returns the reference sample verbatim."""
    import jax.random as jr
    from quantum_simulator_tpu.qec_circuit import _trajectory_fn
    run, lay = _trajectory_fn(3, 2, 0.0, "z", engine="linear")
    outs = np.asarray(run(jr.split(jr.PRNGKey(0), 8)))
    assert (outs == outs[0]).all()


def test_unknown_engine_rejected():
    from quantum_simulator_tpu.qec_circuit import _trajectory_fn
    with pytest.raises(ValueError, match="unknown engine"):
        _trajectory_fn(3, 2, 0.01, "z", engine="statevector")


# ---------------------------------------------------------------------------
# Repetition-chain extraction circuits
# ---------------------------------------------------------------------------

def test_repetition_extraction_noise_free_silent():
    from quantum_simulator_tpu.qec_circuit import (
        repetition_extraction_circuit)
    circ, lay = repetition_extraction_circuit(5, 3)
    assert circ.num_qubits == 9 and lay.n_x == 0
    outs = _run_noise_free(circ, lay, n_trials=8)
    assert (outs == 0).all()          # fully deterministic: no X checks
    fail, raw, det = decode_memory_record(lay, outs)
    assert fail.sum() == 0 and det.sum() == 0


def test_repetition_circuit_memory_and_dem():
    from quantum_simulator_tpu.qec_dem import extract_dem
    dem = extract_dem(5, 3, code="repetition")
    # 2 CNOT steps x 4 checks x 2 targets x 3 Paulis x 3 rounds
    assert dem.n_faults == 4 * 2 * 2 * 3 * 3
    assert dem.ambiguous == 0
    r = circuit_level_memory(5, 5, 0.01, n_trials=2000, seed=2,
                             code="repetition")
    assert r["code"] == "repetition"
    assert r["logical_failure_probability"] < 0.05
    r9 = circuit_level_memory(9, 5, 0.01, n_trials=1000, seed=2,
                              code="repetition")
    assert (r9["logical_failure_probability"]
            <= r["logical_failure_probability"] + 0.01)
    with pytest.raises(ValueError, match="no X checks"):
        circuit_level_memory(5, 2, 0.01, n_trials=8, code="repetition",
                             basis="x")
    with pytest.raises(ValueError, match="unknown code"):
        circuit_level_memory(5, 2, 0.01, n_trials=8, code="steane")


def test_mesh_sharded_trials_draw_identical():
    """Keys shard over the mesh's first axis; the linear sampler's
    bits+matmul program shards with them (no collectives), so the mesh
    run is bit-identical to single-device."""
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:4]).reshape(4), ("t",))
    a = circuit_level_memory(3, 2, 0.008, n_trials=400, seed=5,
                             mesh=mesh)
    b = circuit_level_memory(3, 2, 0.008, n_trials=400, seed=5)
    assert (a["logical_failure_probability"]
            == b["logical_failure_probability"])
    assert a["raw_failure_probability"] == b["raw_failure_probability"]
