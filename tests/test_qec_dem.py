"""Detector-error-model extraction (`qec_dem`).

Locks the enumeration's physics (signature size bounds, zero ambiguity,
full hook decomposition at d=3/5), the edge/logical bookkeeping, and
that DEM-weighted decoding is at least as good as the hand-built
phenomenological graph on the same trials.
"""

import numpy as np
import pytest

from quantum_simulator_tpu.qec_circuit import circuit_level_memory
from quantum_simulator_tpu.qec_dem import extract_dem


def test_dem_extraction_d3_shape_and_consistency():
    dem = extract_dem(3, 3)
    # Fault support: (8 H + 24 CNOT-targets... ) x 3 Paulis x 3 rounds
    assert dem.n_faults == 504
    assert dem.dropped == 0          # every hook decomposes
    assert dem.ambiguous == 0        # signature -> logical is a function
    assert dem.n_sites == 4 * 4      # (R+1) layers x 4 Z checks
    assert (dem.counts > 0).all()   # probability weights, units of p
    assert dem.edges.shape == (dem.logicals.size, 2)
    # boundary edges exist (single-event faults at the spatial edge)
    assert (dem.edges == dem.n_sites).any()
    # logical flags only on edges (hand-check: some but not most)
    assert 0 < int(dem.logicals.sum()) < dem.logicals.size // 2


def test_dem_graph_weights_scale_with_counts():
    dem = extract_dem(3, 2)
    assert dem.graph(0.004).weights is None     # measured default: flat
    g = dem.graph(0.004, scale=3.0)
    assert g.weights is not None and (g.weights >= 1).all()
    # a likelier edge (higher count) never costs more
    c = dem.counts
    w = g.weights
    hi, lo = int(np.argmax(c)), int(np.argmin(c))
    assert w[hi] <= w[lo]


def test_dem_decode_zero_noise_predicts_nothing():
    res = circuit_level_memory(3, 2, 0.0, n_trials=32, seed=1,
                               decoder="dem")
    assert res["logical_failure_probability"] == 0.0
    assert res["decoder"] == "dem"


def test_dem_not_worse_than_phenomenological():
    """Same trials (same seed): the measured-graph decoder must match or
    beat the hand-built graph — it prices every fault the circuit
    actually has."""
    kw = dict(n_trials=3000, seed=5)
    ph = circuit_level_memory(3, 3, 0.006, decoder="phenomenological",
                              **kw)
    dm = circuit_level_memory(3, 3, 0.006, decoder="dem", **kw)
    assert (dm["logical_failure_probability"]
            <= ph["logical_failure_probability"] + 0.005)


def test_dem_x_basis_extracts():
    dem = extract_dem(3, 2, basis="x")
    assert dem.ambiguous == 0
    assert dem.dropped == 0
    # the x memory has extra fault locations: the transversal H columns
    assert dem.n_faults > extract_dem(3, 2, basis="z").n_faults


def test_unknown_decoder_rejected():
    with pytest.raises(ValueError, match="unknown decoder"):
        circuit_level_memory(3, 2, 0.01, n_trials=8, decoder="mwpm")


# ---------------------------------------------------------------------------
# Correlated two-qubit depolarizing (standard circuit noise)
# ---------------------------------------------------------------------------

def test_two_qubit_depol_dem_extraction():
    dem = extract_dem(3, 3, two_qubit_depol=True)
    # 24 CNOTs x 15 pairs x 3 rounds + 8 H x 3 Paulis x 3 rounds
    assert dem.n_faults == 24 * 15 * 3 + 8 * 3 * 3
    assert dem.dropped == 0.0
    assert dem.ambiguous == 0
    # weights are probability units now: multiples of 1/15 and 1/3
    c15 = dem.counts * 15
    assert np.allclose(c15, np.round(c15), atol=1e-9)


def test_two_qubit_depol_engines_draw_identical():
    import jax.random as jr
    from quantum_simulator_tpu.qec_circuit import (_trajectory_fn,
                                                   detection_events)
    keys = jr.split(jr.PRNGKey(7), 150)
    outs = {}
    lay = None
    for eng in ("clifford", "frame", "linear"):
        run, lay = _trajectory_fn(3, 2, 0.012, "z", engine=eng,
                                  two_qubit_depol=True)
        outs[eng] = np.asarray(run(keys), np.uint8)
    det = {e: detection_events(lay, o) for e, o in outs.items()}
    raw = {e: (lay.data_outcomes(o) @ lay.sector_support) % 2
           for e, o in outs.items()}
    assert (det["clifford"] == det["frame"]).all()
    assert (outs["frame"] == outs["linear"]).all()
    assert (raw["clifford"] == raw["linear"]).all()


def test_two_qubit_depol_memory_scales():
    r3 = circuit_level_memory(3, 3, 0.006, n_trials=1500, seed=5,
                              two_qubit_depol=True)
    r5 = circuit_level_memory(5, 3, 0.006, n_trials=800, seed=5,
                              two_qubit_depol=True)
    assert r5["logical_failure_probability"] \
        <= r3["logical_failure_probability"] + 0.01
    zero = circuit_level_memory(3, 2, 0.0, n_trials=16, seed=1,
                                two_qubit_depol=True)
    assert zero["logical_failure_probability"] == 0.0


def test_two_qubit_channel_rejected_on_1q_gate():
    from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
    from quantum_simulator_tpu.clifford import _lower
    from quantum_simulator_tpu.noise import (NoiseModel,
                                             TwoQubitDepolarizingNoise)
    c = QuantumCircuit(2)
    c.add_gate(GateInstance("H", [0], [], 0))
    nm = NoiseModel()
    nm.add_global_noise(TwoQubitDepolarizingNoise(0.01))
    with pytest.raises(ValueError, match="2-qubit gate name"):
        _lower(c, noise_model=nm)


def test_two_qubit_channel_kraus_is_cptp():
    from quantum_simulator_tpu.noise import TwoQubitDepolarizingNoise
    ks = TwoQubitDepolarizingNoise(0.3).kraus_stack()
    assert ks.shape == (16, 4, 4)
    total = sum(np.conj(k.T) @ k for k in ks)
    assert np.allclose(total, np.eye(4), atol=1e-12)
