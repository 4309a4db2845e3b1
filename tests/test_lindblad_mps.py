"""MPS quantum-trajectory Lindblad unraveling (`lindblad_mps`).

Locks the unraveling against closed-form decay curves, the dense
`lindblad.py` integrator (absolute tolerance: the O(dt) trajectory
bias dominates statistics at these step counts), determinism without
jumps, and the >13-qubit capability the dense solver cannot reach.
"""

import numpy as np
import pytest

from quantum_simulator_tpu.lindblad import LindbladSimulator
from quantum_simulator_tpu.lindblad_mps import (MPSLindbladSimulator,
                                                _kraus_pair)


def test_amplitude_damping_matches_analytic():
    """|1> under sigma_minus at rate 1: <Z(t)> = 1 - 2 exp(-t)."""
    sim = MPSLindbladSimulator(2, jump_operators=[(1.0, "sigma_minus", 0)],
                               chi=8)
    res = sim.evolve(2.0, 80, n_trajectories=400, initial=[1, 0],
                     observables=[("Z", [0])], record_every=20, seed=1)
    analytic = 1.0 - 2.0 * np.exp(-res.times)
    err = np.maximum(res.stderr[0], 1e-6)
    assert np.all(np.abs(res.expectations[0] - analytic)
                  <= 3.0 * err + 0.03)
    assert res.expectations.shape == (1, 5)
    assert res.truncation_weight == 0.0          # product state stays chi=1


def test_dephasing_leaves_z_invariant():
    """A z jump never moves population: <Z> stays exactly +-1."""
    sim = MPSLindbladSimulator(3, jump_operators=[(0.7, "z", q)
                                                  for q in range(3)],
                               chi=4)
    res = sim.evolve(1.0, 20, n_trajectories=16, initial=[0, 1, 0],
                     observables=[("Z", [0]), ("Z", [1])], seed=2,
                     record_every=5)
    assert np.allclose(res.expectations[0], 1.0, atol=1e-5)
    assert np.allclose(res.expectations[1], -1.0, atol=1e-5)


def test_matches_dense_lindblad_solver():
    """TFIM-3 + damping + dephasing vs the exact 4^n integrator: the
    trajectory mean must agree within stats + O(dt) unraveling bias."""
    H = [(1.0, "ZZ", [0, 1]), (1.0, "ZZ", [1, 2]),
         (0.7, "X", [0]), (0.7, "X", [1]), (0.7, "X", [2])]
    J = [(0.3, "sigma_minus", 0), (0.2, "z", 2)]
    obs = [("Z", [0]), ("X", [1]), ("ZZ", [0, 1])]
    dense = LindbladSimulator(3, H, J).evolve(
        1.0, 100, observables=obs, record_every=25)
    mps = MPSLindbladSimulator(3, H, J, chi=8).evolve(
        1.0, 100, n_trajectories=300, initial=[0, 0, 0],
        observables=obs, record_every=25, seed=2)
    assert np.allclose(mps.times, dense.times)
    for k in range(3):
        assert np.all(np.abs(dense.expectations[k] - mps.expectations[k])
                      <= 4.0 * np.maximum(mps.stderr[k], 1e-6) + 0.025)


def test_no_jumps_is_deterministic_trotter():
    """Without dissipators every trajectory is the same Trotter
    evolution: zero variance across trajectories."""
    H = [(0.9, "ZZ", [0, 1]), (0.5, "X", [0]), (0.5, "X", [1])]
    res = MPSLindbladSimulator(2, H, chi=4).evolve(
        0.8, 16, n_trajectories=5, initial=[0, 0],
        observables=[("X", [0]), ("ZZ", [0, 1])], record_every=4, seed=0)
    assert np.allclose(res.stderr, 0.0, atol=1e-6)
    # cross-check the endpoint against the dense solver (pure H)
    dense = LindbladSimulator(2, H).evolve(
        0.8, 16, observables=[("X", [0])], record_every=16)
    assert abs(res.expectations[0, -1] - dense.expectations[0, -1]) < 5e-3


def test_wide_chain_runs_past_dense_cap():
    """20 qubits (the dense solver stops at 13): TFIM + damping, a few
    trajectories, finite bounded observables."""
    H = [(1.0, "ZZ", [i, i + 1]) for i in range(19)] \
        + [(0.5, "X", [i]) for i in range(20)]
    J = [(0.1, "sigma_minus", q) for q in range(20)]
    res = MPSLindbladSimulator(20, H, J, chi=8).evolve(
        0.3, 6, n_trajectories=3, observables=[("Z", [10])], seed=3,
        record_every=6)
    assert res.expectations.shape == (1, 2)
    assert np.all(np.abs(res.expectations) <= 1.0 + 1e-6)
    assert np.isfinite(res.expectations).all()


def test_kraus_pair_is_exactly_cptp():
    rng = np.random.default_rng(0)
    L = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    ks = _kraus_pair(0.4, L, 0.05)
    total = sum(np.conj(k.T) @ k for k in ks)
    assert np.allclose(total, np.eye(2), atol=1e-12)
    with pytest.raises(ValueError, match="shrink dt"):
        _kraus_pair(10.0, 3.0 * L, 1.0)


def test_validation_errors():
    sim = MPSLindbladSimulator(2, jump_operators=[(0.1, "z", 0)])
    with pytest.raises(ValueError, match="record_every"):
        sim.evolve(1.0, 10, record_every=3)
    with pytest.raises(ValueError, match="n bits"):
        sim.evolve(1.0, 10, initial=[0, 1, 0])
    with pytest.raises(ValueError, match="order"):
        MPSLindbladSimulator(2, order=3)


def test_mesh_sharded_trajectories_match_single_device():
    import jax
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:4], dtype=object).reshape(4), ("t",))
    sim = MPSLindbladSimulator(
        3, [(1.0, "ZZ", [0, 1]), (0.5, "X", [2])],
        [(0.2, "sigma_minus", 1)], chi=4)
    kw = dict(n_trajectories=8, initial=[0, 0, 0],
              observables=[("Z", [1])], record_every=3, seed=1)
    a = sim.evolve(0.6, 6, mesh=mesh, **kw)
    b = sim.evolve(0.6, 6, **kw)
    assert np.allclose(a.expectations, b.expectations, atol=1e-6)
