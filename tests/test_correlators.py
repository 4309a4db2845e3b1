"""Dynamical two-point correlators (`correlators`).

Locks the mixed-matrix-element evolution against dense eigh/expm
evolution at small n (Trotter-bias tolerance), the t=0 operator
algebra, and the >30-qubit capability.
"""

import numpy as np
import pytest

from quantum_simulator_tpu.correlators import mps_two_point_correlator
from quantum_simulator_tpu.lindblad import _pauli_term_matrix


def _dense(n, terms):
    def embed(pstr, qubits):
        full = ["I"] * n
        for ch, q in zip(pstr, qubits):
            full[q] = ch
        return _pauli_term_matrix("".join(full))

    H = sum(c * embed(p, q) for c, p, q in terms)
    return H, embed


def test_matches_dense_evolution_including_phases():
    """TFIM-4, Z/Y insertions — the Y makes the correlator genuinely
    complex (real-H time-reversal symmetry keeps X/Z ones real) — vs
    the exact eigendecomposition propagator."""
    n = 4
    terms = [(1.0, "ZZ", [i, i + 1]) for i in range(n - 1)] \
        + [(0.7, "X", [i]) for i in range(n)]
    H, embed = _dense(n, terms)
    w, v = np.linalg.eigh(H)
    psi0 = np.zeros(2 ** n, complex)
    psi0[0] = 1.0
    Pi, Pj = embed("Z", [1]), embed("Y", [2])
    times, C = mps_two_point_correlator(
        n, terms, 1.0, 200, site_i=1, site_j=2,
        pauli_i="Z", pauli_j="Y", chi=8, record_every=50)
    assert np.any(np.abs(C.imag) > 1e-2)        # genuinely complex
    for k, t in enumerate(times):
        U = (v * np.exp(-1j * w * t)) @ v.conj().T
        exact = (U @ psi0).conj() @ Pi @ (U @ (Pj @ psi0))
        assert abs(C[k] - exact) < 5e-4          # O(dt^2) Trotter bias


def test_t0_value_is_pure_operator_algebra():
    """C(0) = <psi| P_i P_j |psi>: for |0...0> and Z insertions that is
    exactly 1 (same site or different), and for X_i Z_j it is 0."""
    terms = [(0.5, "X", [0])]
    _, C = mps_two_point_correlator(3, terms, 0.5, 10, 0, 2, chi=4,
                                    record_every=10)
    assert abs(C[0] - 1.0) < 1e-6
    _, Cx = mps_two_point_correlator(3, terms, 0.5, 10, 0, 2,
                                     pauli_i="X", chi=4,
                                     record_every=10)
    assert abs(Cx[0]) < 1e-6


def test_wide_chain_runs():
    n = 32
    terms = [(1.0, "ZZ", [i, i + 1]) for i in range(n - 1)] \
        + [(0.5, "X", [i]) for i in range(n)]
    times, C = mps_two_point_correlator(
        n, terms, 0.4, 8, n // 2, n // 2 + 1, chi=8, record_every=4)
    assert times.shape == (3,) and C.shape == (3,)
    assert np.all(np.abs(C) <= 1.0 + 1e-5)
    assert np.isfinite(C).all()


def test_validation():
    with pytest.raises(ValueError, match="record_every"):
        mps_two_point_correlator(3, [], 1.0, 10, 0, 1, record_every=3)
    with pytest.raises(ValueError, match="out of range"):
        mps_two_point_correlator(3, [], 1.0, 10, 0, 5)
    with pytest.raises(ValueError, match="must be X, Y, or Z"):
        mps_two_point_correlator(3, [], 1.0, 10, 0, 1, pauli_i="W")


def test_dmrg_seeded_correlator_matches_dense():
    """Seeding from a DMRG MPSState (re-canonicalized on entry) must
    reproduce the dense eigenstate correlator — locks the MPS-initial
    path end to end."""
    from quantum_simulator_tpu.dmrg import dmrg_ground_state
    n = 4
    terms = [(1.0, "ZZ", [i, i + 1]) for i in range(n - 1)] \
        + [(0.7, "X", [i]) for i in range(n)]
    gs = dmrg_ground_state(terms, n, chi=8, sweeps=6)
    H, embed = _dense(n, terms)
    w, v = np.linalg.eigh(H)
    psi0 = v[:, 0]
    Pi, Pj = embed("Z", [1]), embed("Z", [2])
    times, C = mps_two_point_correlator(
        n, terms, 1.0, 100, 1, 2, chi=8, initial=gs.state,
        record_every=25)
    for k, t in enumerate(times):
        U = (v * np.exp(-1j * w * t)) @ v.conj().T
        exact = (U @ psi0).conj() @ Pi @ (U @ (Pj @ psi0))
        assert abs(C[k] - exact) < 1e-3
    with pytest.raises(ValueError, match="wrong qubit count"):
        mps_two_point_correlator(5, terms, 1.0, 10, 0, 1,
                                 initial=gs.state)
