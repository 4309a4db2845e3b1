"""DMRG ground-state solver: exact vs dense diagonalization at small n,
vs the free-fermion solution of the open TFIM chain at n=40, MPO
construction, and the observable surface on the returned state."""

import numpy as np
import pytest

from quantum_simulator_tpu import mps
from quantum_simulator_tpu.dmrg import (
    dmrg_excited_states,
    DMRGResult,
    dmrg_ground_state,
    terms_to_mpo,
)
from quantum_simulator_tpu.models.hamiltonians import (
    heisenberg_chain,
    tfim_chain,
)

from tests.oracle import dense_hamiltonian


def tfim_exact_open(n, j, h):
    """Open-chain TFIM ground energy via Jordan-Wigner free fermions:
    E0 = -sum of singular values of the n x n coupling matrix
    (calibrated against dense diagonalization in
    ``test_free_fermion_oracle_calibrates``)."""
    m = np.zeros((n, n))
    for i in range(n):
        m[i, i] = -h
    for i in range(n - 1):
        m[i, i + 1] = -j
    return -np.sum(np.linalg.svd(m, compute_uv=False))


class TestExactness:
    def test_tfim_matches_dense(self):
        n, terms = 6, tfim_chain(6, j=-1.0, h=-0.9)
        want = np.linalg.eigvalsh(dense_hamiltonian(n, terms))[0]
        res = dmrg_ground_state(terms, n, chi=8, sweeps=4, lanczos_k=10)
        assert isinstance(res, DMRGResult)
        assert res.energy == pytest.approx(want, abs=2e-4)
        assert res.truncation_weight < 1e-8
        # The final Lanczos Ritz value and the independent contraction
        # measure the same state.
        assert res.sweep_energies[-1] == pytest.approx(res.energy,
                                                       abs=2e-4)

    def test_anisotropic_heisenberg_matches_dense(self):
        n, terms = 6, heisenberg_chain(6, jx=0.7, jy=-0.4, jz=1.0)
        want = np.linalg.eigvalsh(dense_hamiltonian(n, terms))[0]
        res = dmrg_ground_state(terms, n, chi=8, sweeps=4, lanczos_k=10)
        assert res.energy == pytest.approx(want, abs=2e-4)

    def test_free_fermion_oracle_calibrates(self):
        n, j, h = 8, -1.0, -0.8
        want = np.linalg.eigvalsh(
            dense_hamiltonian(n, tfim_chain(n, j=j, h=h)))[0]
        assert tfim_exact_open(n, j, h) == pytest.approx(want, abs=1e-10)

    def test_tfim_40_qubits_vs_free_fermions(self):
        n, j, h = 40, -1.0, -0.8
        want = tfim_exact_open(n, j, h)
        res = dmrg_ground_state(tfim_chain(n, j=j, h=h), n, chi=12,
                                sweeps=4, lanczos_k=10)
        assert abs(res.energy - want) / abs(want) < 1e-4


class TestMPOAndInputs:
    def test_duplicate_and_constant_terms(self):
        n = 4
        terms = [(-1.0, "ZZ", [0, 1]), (-1.0, "ZZ", [0, 1]),
                 (2.5, "I", [0]), (-0.7, "X", [2])]
        want = np.linalg.eigvalsh(dense_hamiltonian(n, terms))[0]
        res = dmrg_ground_state(terms, n, chi=4, sweeps=3)
        assert res.energy == pytest.approx(want, abs=2e-4)

    def test_mpo_bond_dim_is_crossing_bound(self):
        w = terms_to_mpo(8, tfim_chain(8))
        assert w.shape == (8, 3, 3, 2, 2)
        w = terms_to_mpo(8, heisenberg_chain(8))
        assert w.shape == (8, 5, 5, 2, 2)

    def test_input_validation(self):
        with pytest.raises(ValueError):
            dmrg_ground_state(tfim_chain(4), 4, chi=1)
        with pytest.raises(ValueError):
            dmrg_ground_state(tfim_chain(4), 4, sweeps=0)
        with pytest.raises(ValueError):
            dmrg_ground_state(tfim_chain(4), 4, lanczos_k=1)
        with pytest.raises(ValueError):
            dmrg_ground_state([(1.0, "Z", [0])], 1)
        with pytest.raises(ValueError):
            dmrg_ground_state(tfim_chain(4), 4, init_bits=[0, 1])
        with pytest.raises(ValueError):
            dmrg_ground_state(tfim_chain(4), 4, init_bits=[0, 1, 2, 0])


class TestStateSurface:
    def test_observables_on_ground_state(self):
        # Strong transverse field: ground state near |+...+>.
        n = 10
        terms = tfim_chain(n, j=-0.1, h=-1.0)
        res = dmrg_ground_state(terms, n, chi=8, sweeps=4)
        for q in (0, n // 2, n - 1):
            x = mps.expectation_pauli_string(res.state, {q: "X"})
            assert x > 0.95
        # Weak coupling => weak entanglement across the middle cut.
        s = mps.entanglement_entropy(res.state, n // 2 - 1)
        assert 0.0 <= s < 0.2
        # Energy agrees with the generic Hamiltonian contraction.
        assert mps.expectation_hamiltonian(res.state, terms) == \
            pytest.approx(res.energy, abs=1e-5)

    def test_ferromagnet_ground_state_order(self):
        # J<0 ZZ chain + tiny longitudinal field: fully polarized
        # |00...0>. A purely diagonal Hamiltonian makes every basis
        # state an H_eff eigenstate (1-dim Krylov space — Lanczos
        # cannot flow from the Neel default), so include the standard
        # remedy: a small transverse field to open the off-diagonal.
        n = 12
        terms = [(-1.0, "ZZ", [i, i + 1]) for i in range(n - 1)]
        terms += [(-0.05, "Z", [i]) for i in range(n)]
        terms += [(-0.02, "X", [i]) for i in range(n)]
        # From the Neel default the sweeps coarsen into ONE of the two
        # polarized states — the barrier between them is extensive, so
        # a tiny transverse field cannot tunnel across (textbook
        # symmetry-broken trapping, same as any DMRG code).
        res = dmrg_ground_state(terms, n, chi=6, sweeps=5)
        p0 = abs(mps.amplitude(res.state, "0" * n)) ** 2
        p1 = abs(mps.amplitude(res.state, "1" * n)) ** 2
        assert p0 + p1 > 0.98
        # The informed init lands in the TRUE ground state |0...0>.
        res2 = dmrg_ground_state(terms, n, chi=6, sweeps=3,
                                 init_bits=[0] * n)
        assert abs(mps.amplitude(res2.state, "0" * n)) ** 2 > 0.98
        assert res2.energy == pytest.approx(-(n - 1) - 0.05 * n,
                                            abs=1e-2)
        assert res2.energy < res.energy + 1e-3


class TestExcitedStates:
    def test_spectrum_matches_dense(self):
        n, terms = 6, tfim_chain(6, j=-1.0, h=-0.9)
        want = np.linalg.eigvalsh(dense_hamiltonian(n, terms))[:3]
        res = dmrg_excited_states(terms, n, n_states=3, chi=8, sweeps=5)
        got = [r.energy for r in res]
        np.testing.assert_allclose(got, want, atol=5e-4)
        for i in range(3):
            for j in range(i + 1, 3):
                assert abs(mps.overlap(res[i].state,
                                       res[j].state)) < 1e-4

    def test_tfim_gap_at_24_qubits_vs_free_fermions(self):
        n, j, h = 24, -1.0, -0.7
        m = np.zeros((n, n))
        for i in range(n):
            m[i, i] = -h
        for i in range(n - 1):
            m[i, i + 1] = -j
        eps = np.linalg.svd(m, compute_uv=False)
        want_gap = 2.0 * eps.min()  # one quasiparticle flip
        res = dmrg_excited_states(tfim_chain(n, j=j, h=h), n,
                                  n_states=2, chi=12, sweeps=5)
        got_gap = res[1].energy - res[0].energy
        assert got_gap == pytest.approx(want_gap, rel=5e-3, abs=1e-3)

    def test_near_degenerate_ferromagnet_pair(self):
        # J<0 ZZ + small transverse field: the two lowest states are the
        # near-degenerate polarized pair, split by tunneling; the next
        # band sits ~2|J| above.
        n = 8
        terms = tfim_chain(n, j=-1.0, h=-0.1)
        want = np.linalg.eigvalsh(dense_hamiltonian(n, terms))[:3]
        res = dmrg_excited_states(terms, n, n_states=3, chi=8, sweeps=6)
        got = [r.energy for r in res]
        np.testing.assert_allclose(got, want, atol=1e-3)
        assert got[1] - got[0] < 0.01       # tunneling splitting
        assert got[2] - got[1] > 1.0        # next band

    def test_n_states_validation(self):
        with pytest.raises(ValueError):
            dmrg_excited_states(tfim_chain(4), 4, n_states=0)
        res = dmrg_excited_states(tfim_chain(4), 4, n_states=1, chi=4,
                                  sweeps=2)
        assert len(res) == 1
