"""Classical shadows: estimator unbiasedness (exact enumeration),
collector conventions, cross-engine agreement, and estimation at MPS
widths the reference cannot represent.
"""

import numpy as np
import pytest

from quantum_simulator_tpu import (
    GateInstance,
    QuantumCircuit,
    ShadowData,
    StateVector,
    collect_shadows,
)
from quantum_simulator_tpu.shadows import (
    _ROTATIONS,
    MAX_STATEVECTOR_SHADOW_QUBITS,
)


def _ghz(n):
    c = QuantumCircuit(n)
    c.add_gate(GateInstance("H", [0], [], 0))
    for q in range(1, n):
        c.add_gate(GateInstance("CNOT", [q - 1, q], [], q))
    return c


def _pauli(p):
    return {"I": np.eye(2), "X": np.array([[0, 1], [1, 0]]),
            "Y": np.array([[0, -1j], [1j, 0]]),
            "Z": np.diag([1.0, -1.0])}[p].astype(np.complex128)


class TestEstimatorUnbiasedness:
    def test_exact_enumeration_n2(self):
        """E[est(P)] over ALL basis draws and outcomes == <P> exactly.

        This pins the whole convention chain: rotation matrices, bit
        ordering (qubit 0 = MSB), sign mapping, and the 3^k inverse
        channel factor."""
        rng = np.random.default_rng(3)
        psi = rng.normal(size=4) + 1j * rng.normal(size=4)
        psi /= np.linalg.norm(psi)
        n = 2
        for pstr in ("XI", "IY", "ZZ", "XY", "YZ", "ZX", "YY"):
            exact = np.vdot(psi, np.kron(_pauli(pstr[0]),
                                         _pauli(pstr[1])) @ psi).real
            total = 0.0
            for b0 in range(3):
                for b1 in range(3):
                    u = np.kron(_ROTATIONS[b0], _ROTATIONS[b1])
                    probs = np.abs(u @ psi) ** 2
                    for outcome in range(4):
                        bits = [(outcome >> 1) & 1, outcome & 1]
                        data = ShadowData(
                            num_qubits=n,
                            bases=np.array([[b0, b1]], np.int8),
                            outcomes=np.array([bits], np.int8))
                        val = data.estimate_pauli(pstr, [0, 1])
                        total += probs[outcome] * val / 9.0
            assert total == pytest.approx(exact, abs=1e-10)


class TestCollectorConventions:
    def test_z_eigenstate_bits(self):
        """|01> gives deterministic Z-basis outcomes (bit = qubit value)."""
        sv = StateVector(2)
        sv.data = np.array([0, 1, 0, 0], np.complex128)  # |01>, q0=MSB
        data = collect_shadows(sv, 600, seed=0)
        zmask0 = data.bases[:, 0] == 2
        zmask1 = data.bases[:, 1] == 2
        assert np.all(data.outcomes[zmask0, 0] == 0)
        assert np.all(data.outcomes[zmask1, 1] == 1)

    def test_x_eigenstate_bits(self):
        """|+> measured in the X basis always reads bit 0."""
        sv = StateVector(1)
        sv.data = np.array([1, 1], np.complex128) / np.sqrt(2)
        data = collect_shadows(sv, 600, seed=1)
        xmask = data.bases[:, 0] == 0
        assert xmask.sum() > 100
        assert np.all(data.outcomes[xmask, 0] == 0)

    def test_basis_draws_uniform(self):
        data = collect_shadows(_ghz(3), 3000, seed=2)
        counts = np.bincount(data.bases.reshape(-1), minlength=3)
        assert counts.min() > 0.28 * counts.sum()


class TestEstimation:
    def test_bell_correlators(self):
        data = collect_shadows(_ghz(2), 6000, seed=4)
        assert data.estimate_pauli("ZZ", [0, 1]) == pytest.approx(
            1.0, abs=0.15)
        assert data.estimate_pauli("XX", [0, 1]) == pytest.approx(
            1.0, abs=0.15)
        assert data.estimate_pauli("YY", [0, 1]) == pytest.approx(
            -1.0, abs=0.15)
        assert data.estimate_pauli("Z", [0]) == pytest.approx(0.0, abs=0.15)

    def test_hamiltonian_estimate(self):
        terms = [(0.5, "ZZ", [0, 1]), (-0.3, "XX", [0, 1]),
                 (0.2, "Z", [0])]
        data = collect_shadows(_ghz(2), 8000, seed=5)
        # exact on the Bell state: 0.5*1 - 0.3*1 + 0 = 0.2
        assert data.estimate_hamiltonian(terms) == pytest.approx(
            0.2, abs=0.12)

    def test_median_of_means(self):
        data = collect_shadows(_ghz(2), 4000, seed=6)
        mom = data.estimate_pauli("ZZ", [0, 1], median_of_means=10)
        assert mom == pytest.approx(1.0, abs=0.3)
        with pytest.raises(ValueError):
            data.estimate_pauli("ZZ", [0, 1], median_of_means=0)

    def test_identity_and_validation(self):
        data = collect_shadows(_ghz(2), 100, seed=7)
        assert data.estimate_pauli("II", [0, 1]) == pytest.approx(1.0)
        with pytest.raises(ValueError):
            data.estimate_pauli("XYZ", [0, 1])
        with pytest.raises(ValueError):
            data.estimate_pauli("XX", [0, 0])
        with pytest.raises(ValueError):
            data.estimate_pauli("Q", [0])
        with pytest.raises(ValueError):
            data.estimate_pauli("X", [5])


class TestEngines:
    def test_mps_matches_statevector(self):
        c = _ghz(5)
        sv = collect_shadows(c, 5000, seed=8, engine="statevector")
        mp = collect_shadows(c, 5000, seed=8, engine="mps", chi=8)
        for pstr, qs in (("ZZ", [0, 4]), ("XXXXX", list(range(5)))):
            a = sv.estimate_pauli(pstr, qs)
            b = mp.estimate_pauli(pstr, qs)
            assert a == pytest.approx(b, abs=0.8 if len(qs) > 2 else 0.2)

    def test_mps_shadows_at_width_40(self):
        """Shadows at n=40: low-weight GHZ correlators from one pool."""
        data = collect_shadows(_ghz(40), 4000, seed=9, engine="mps",
                               chi=4, chunk=128)
        assert data.bases.shape == (4000, 40)
        assert data.estimate_pauli("ZZ", [0, 39]) == pytest.approx(
            1.0, abs=0.25)
        assert data.estimate_pauli("ZZ", [3, 17]) == pytest.approx(
            1.0, abs=0.25)
        assert data.estimate_pauli("Z", [12]) == pytest.approx(
            0.0, abs=0.2)

    def test_engine_routing(self):
        with pytest.raises(ValueError):
            collect_shadows(_ghz(2), 10, engine="nope")
        with pytest.raises(ValueError):
            collect_shadows(
                _ghz(MAX_STATEVECTOR_SHADOW_QUBITS + 1), 10,
                engine="statevector")
        sv = StateVector(1)
        with pytest.raises(ValueError):
            collect_shadows(sv, 10, engine="mps")
