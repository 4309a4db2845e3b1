"""Lindblad master-equation solver: analytic decays, dense-Liouvillian
exactness, CPTP structure preservation, and the discrete-channel limit.

The reference has no continuous-time dynamics (its noise is per-gate
stochastic Kraus, ``/root/reference/quantum_sim/engine/noise.py``);
these tests pin the new generator against closed forms and the exact
4^n x 4^n Liouvillian exponential.
"""

import numpy as np
import pytest
import scipy.linalg

from quantum_simulator_tpu import LindbladSimulator, StateVector
from quantum_simulator_tpu.lindblad import (
    JUMP_OPERATORS,
    MAX_LINDBLAD_QUBITS,
)


def _plus_state():
    sv = StateVector(1)
    sv.data = np.array([1.0, 1.0], dtype=np.complex128) / np.sqrt(2)
    return sv


def _excited_state():
    sv = StateVector(1)
    sv.data = np.array([0.0, 1.0], dtype=np.complex128)
    return sv


class TestAnalyticDecays:
    def test_amplitude_damping_population(self):
        """|1><1| under the sigma_minus jump: rho_11(t) = exp(-gamma t)."""
        gamma = 0.7
        sim = LindbladSimulator(1, jump_operators=[(gamma, "sigma_minus", 0)])
        res = sim.evolve(2.0, 200, initial=_excited_state(),
                         observables=[("Z", [0])], record_every=20)
        p1 = (1.0 - res.expectations[0]) / 2.0
        np.testing.assert_allclose(p1, np.exp(-gamma * res.times),
                                   atol=2e-5)

    def test_dephasing_coherence(self):
        """|+> under the z jump at rate g: <X>(t) = exp(-2 g t)."""
        g = 0.4
        sim = LindbladSimulator(1, jump_operators=[(g, "z", 0)])
        res = sim.evolve(3.0, 300, initial=_plus_state(),
                         observables=[("X", [0]), ("Z", [0])],
                         record_every=30)
        np.testing.assert_allclose(res.expectations[0],
                                   np.exp(-2.0 * g * res.times), atol=2e-5)
        np.testing.assert_allclose(res.expectations[1], 0.0, atol=1e-5)

    def test_closed_system_rabi(self):
        """gamma=0, H = (Omega/2) X: P1(t) = sin^2(Omega t / 2)."""
        omega = 1.3
        sim = LindbladSimulator(1, hamiltonian_terms=[(omega / 2, "X", [0])])
        res = sim.evolve(4.0, 400, observables=[("Z", [0])],
                         record_every=40)
        p1 = (1.0 - res.expectations[0]) / 2.0
        np.testing.assert_allclose(p1, np.sin(omega * res.times / 2) ** 2,
                                   atol=2e-5)


class TestDenseLiouvillianExactness:
    @pytest.mark.parametrize("n,terms,jumps", [
        (1, [(0.9, "X", [0]), (0.5, "Z", [0])],
         [(0.3, "sigma_minus", 0)]),
        (2, [(1.0, "XX", [0, 1]), (0.7, "Z", [0]), (0.4, "Z", [1])],
         [(0.25, "sigma_minus", 0), (0.15, "z", 1)]),
        (3, [(0.8, "ZZ", [0, 1]), (0.6, "XY", [1, 2]), (0.5, "X", [0])],
         [(0.2, "sigma_minus", 2), (0.1, "sigma_plus", 0)]),
    ])
    def test_rk4_matches_expm(self, n, terms, jumps):
        sim = LindbladSimulator(n, hamiltonian_terms=terms,
                                jump_operators=jumps)
        dim = 1 << n
        rng = np.random.default_rng(n)
        psi = rng.normal(size=dim) + 1j * rng.normal(size=dim)
        psi /= np.linalg.norm(psi)
        t = 0.8
        res = sim.evolve(t, 400, initial=psi)
        L = sim.dense_liouvillian()
        rho0 = np.outer(psi, np.conj(psi))
        rho_exact = (scipy.linalg.expm(L * t)
                     @ rho0.reshape(-1)).reshape(dim, dim)
        # the RK4 truncation error at 400 steps is ~1e-10; the bound is
        # set by f32 accumulation (x64 stays off in the test env)
        np.testing.assert_allclose(res.final.rho, rho_exact, atol=1e-5)

    def test_liouvillian_trace_preserving(self):
        """Columns of L annihilate the trace functional: vec(I)^T L = 0."""
        sim = LindbladSimulator(
            2, hamiltonian_terms=[(1.0, "XX", [0, 1])],
            jump_operators=[(0.5, "sigma_minus", 0), (0.3, "z", 1)])
        L = sim.dense_liouvillian()
        tr_vec = np.eye(4).reshape(-1)
        np.testing.assert_allclose(tr_vec @ L, 0.0, atol=1e-12)


class TestStructurePreservation:
    def test_cptp_structure(self):
        sim = LindbladSimulator(
            2,
            hamiltonian_terms=[(1.0, "XX", [0, 1]), (0.5, "Z", [0])],
            jump_operators=[(0.4, "sigma_minus", 0), (0.2, "z", 1)])
        psi = np.zeros(4, np.complex128)
        psi[3] = 1.0
        res = sim.evolve(2.0, 200, initial=psi)
        rho = res.final.rho
        assert res.final.trace() == pytest.approx(1.0, abs=1e-5)
        np.testing.assert_allclose(rho, np.conj(rho.T), atol=1e-6)
        eigs = np.linalg.eigvalsh(rho)
        assert eigs.min() > -1e-6
        assert res.final.purity() <= 1.0 + 1e-6

    def test_amplitude_damping_full_solution(self):
        """Pure decay of |+>: rho_11 = e^{-g t}/2, rho_01 = e^{-g t/2}/2
        (coherences decay at HALF the population rate)."""
        g, t = 2.0, 8.0
        sim = LindbladSimulator(1, jump_operators=[(g, "sigma_minus", 0)])
        res = sim.evolve(t, 400, initial=_plus_state())
        p1 = 0.5 * np.exp(-g * t)
        c = 0.5 * np.exp(-g * t / 2)
        expected = np.array([[1.0 - p1, c], [c, p1]], np.complex128)
        np.testing.assert_allclose(res.final.rho, expected, atol=1e-6)


class TestDiscreteChannelLimit:
    def test_matches_trotterized_kraus_circuit(self):
        """A Trotterized circuit with per-gate amplitude damping
        converges to the Lindblad solution as the step count grows:
        channel gamma per step = 1 - exp(-Gamma dt)."""
        from quantum_simulator_tpu import (AmplitudeDampingNoise,
                                           DensityMatrixSimulator,
                                           NoiseModel)
        from quantum_simulator_tpu.models.trotter import trotter_circuit

        omega, Gamma, t = 1.1, 0.5, 1.2
        steps = 60
        sim = LindbladSimulator(
            1, hamiltonian_terms=[(omega / 2, "X", [0])],
            jump_operators=[(Gamma, "sigma_minus", 0)])
        exact = sim.evolve(t, 600).final.rho

        circ = trotter_circuit(1, [(omega / 2, "X", [0])], t, steps)
        nm = NoiseModel()
        # noise applies per GATE: derive the per-gate decay probability
        # from the circuit's actual gate count (order-2 Strang emits two
        # half-step gates per Trotter step)
        nm.add_global_noise(AmplitudeDampingNoise(
            1.0 - np.exp(-Gamma * t / len(circ.gates))))
        approx = DensityMatrixSimulator(nm).run(circ).rho
        np.testing.assert_allclose(approx, exact, atol=2e-2)

    def test_convergence_order(self):
        """Halving dt shrinks the discrete-channel error ~linearly."""
        from quantum_simulator_tpu import (AmplitudeDampingNoise,
                                           DensityMatrixSimulator,
                                           NoiseModel)
        from quantum_simulator_tpu.models.trotter import trotter_circuit

        omega, Gamma, t = 1.1, 0.5, 1.2
        sim = LindbladSimulator(
            1, hamiltonian_terms=[(omega / 2, "X", [0])],
            jump_operators=[(Gamma, "sigma_minus", 0)])
        exact = sim.evolve(t, 600).final.rho

        errs = []
        for steps in (20, 40):
            circ = trotter_circuit(1, [(omega / 2, "X", [0])], t, steps)
            nm = NoiseModel()
            nm.add_global_noise(AmplitudeDampingNoise(
                1.0 - np.exp(-Gamma * t / len(circ.gates))))
            rho = DensityMatrixSimulator(nm).run(circ).rho
            errs.append(np.abs(rho - exact).max())
        assert errs[1] < 0.7 * errs[0]


class TestAPI:
    def test_input_validation(self):
        with pytest.raises(ValueError):
            LindbladSimulator(MAX_LINDBLAD_QUBITS + 1)
        with pytest.raises(ValueError):
            LindbladSimulator(1, jump_operators=[(-0.1, "z", 0)])
        with pytest.raises(ValueError):
            LindbladSimulator(1, jump_operators=[(0.1, "nope", 0)])
        with pytest.raises(ValueError):
            LindbladSimulator(1, jump_operators=[(0.1, "z", 3)])
        sim = LindbladSimulator(1)
        with pytest.raises(ValueError):
            sim.evolve(1.0, 10, record_every=3)
        with pytest.raises(ValueError):
            sim.evolve(1.0, 10, observables=[("XX", [0])])
        with pytest.raises(ValueError):
            LindbladSimulator(7).dense_liouvillian()
        # matrix jump operators accepted
        LindbladSimulator(1, jump_operators=[
            (0.1, np.array([[0, 1], [0, 0]]), 0)])

    def test_named_jump_ops_complete(self):
        assert set(JUMP_OPERATORS) == {
            "sigma_minus", "sigma_plus", "x", "y", "z"}

    def test_record_cadence_and_labels(self):
        sim = LindbladSimulator(2, hamiltonian_terms=[(1.0, "ZZ", [0, 1])])
        res = sim.evolve(1.0, 20, observables=[("Z", [0]), ("XY", [0, 1])],
                         record_every=5)
        assert res.times.shape == (5,)
        assert res.expectations.shape == (2, 5)
        assert res.observable_labels == ["Z@[0]", "XY@[0, 1]"]

    def test_time_is_runtime_scalar(self):
        """Two t_final values reuse one compiled program."""
        sim = LindbladSimulator(1, jump_operators=[(0.5, "z", 0)])
        sim.evolve(1.0, 50, initial=_plus_state())
        assert len(sim._fns) == 1
        sim.evolve(2.5, 50, initial=_plus_state())
        assert len(sim._fns) == 1
