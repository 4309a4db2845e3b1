"""ThermalRelaxationNoise ✚: T1/T2 calibrated relaxation over a gate time.

The reference's four channels (`/root/reference/quantum_sim/engine/
noise.py:27-104`) have no calibrated-relaxation model; this locks the
channel's CPTP structure, its analytic T1/T2 decay, its ride on the
stochastic trajectory paths, and its serde superset.
"""

import numpy as np
import pytest

from quantum_simulator_tpu import (
    GateInstance,
    NoiseModel,
    QuantumCircuit,
    Simulator,
    ThermalRelaxationNoise,
    TwoQubitDepolarizingNoise,
)


def _channel_apply(ch, rho):
    out = np.zeros_like(rho)
    for k in ch.get_kraus_operators():
        out += k @ rho @ k.conj().T
    return out


class TestKrausStructure:
    @pytest.mark.parametrize("t1,t2,time", [
        (50.0, 70.0, 0.1), (50.0, 100.0, 1.0), (30.0, 20.0, 5.0),
        (10.0, 20.0, 0.0), (1.0, 2.0, 100.0),
    ])
    def test_cptp(self, t1, t2, time):
        ch = ThermalRelaxationNoise(t1, t2, time)
        ks = ch.get_kraus_operators()
        total = sum(k.conj().T @ k for k in ks)
        np.testing.assert_allclose(total, np.eye(2), atol=1e-12)

    def test_analytic_decay(self):
        # rho' for rho = |+><+|: populations mix toward |0> by T1,
        # off-diagonal decays by exactly exp(-t/T2).
        t1, t2, t = 40.0, 55.0, 7.0
        ch = ThermalRelaxationNoise(t1, t2, t)
        plus = np.full((2, 2), 0.5, dtype=complex)
        out = _channel_apply(ch, plus)
        assert out[0, 1] == pytest.approx(0.5 * np.exp(-t / t2), abs=1e-12)
        # Excited population of |1><1| decays by exp(-t/T1).
        one = np.diag([0.0, 1.0]).astype(complex)
        out1 = _channel_apply(ch, one)
        assert out1[1, 1] == pytest.approx(np.exp(-t / t1), abs=1e-12)
        assert out1[0, 0] == pytest.approx(1 - np.exp(-t / t1), abs=1e-12)

    def test_zero_time_is_identity(self):
        ch = ThermalRelaxationNoise(50.0, 60.0, 0.0)
        rho = np.array([[0.3, 0.2 - 0.1j], [0.2 + 0.1j, 0.7]])
        np.testing.assert_allclose(_channel_apply(ch, rho), rho, atol=1e-12)

    def test_kraus_stack_shape(self):
        assert ThermalRelaxationNoise(50, 70, 1).kraus_stack().shape \
            == (3, 2, 2)

    def test_validation(self):
        with pytest.raises(ValueError):
            ThermalRelaxationNoise(10.0, 25.0, 1.0)  # T2 > 2*T1
        with pytest.raises(ValueError):
            ThermalRelaxationNoise(-1.0, 1.0, 1.0)
        with pytest.raises(ValueError):
            ThermalRelaxationNoise(10.0, 10.0, -1.0)

    def test_t2_equal_2t1_allowed(self):
        ch = ThermalRelaxationNoise(10.0, 20.0, 3.0)
        ks = ch.get_kraus_operators()
        total = sum(k.conj().T @ k for k in ks)
        np.testing.assert_allclose(total, np.eye(2), atol=1e-12)
        # No residual dephasing: K2 vanishes.
        assert np.allclose(ks[2], 0)


class TestTrajectoryIntegration:
    def test_ensemble_matches_channel_action(self):
        # |1> through an identity gate + thermal noise: the trajectory
        # average over many stochastic Kraus draws must reproduce the
        # exact channel output e^{-t/T1} in the excited population.
        t1, t2, t = 30.0, 45.0, 10.0
        nm = NoiseModel()
        nm.add_global_noise(ThermalRelaxationNoise(t1, t2, t))
        nm.set_seed(7)
        c = QuantumCircuit(1, initial_states=[1])
        c.add_gate(GateInstance("I", [0], [], column=0))
        rho = Simulator(noise_model=nm).ensemble_density_matrix(
            c, n_trials=3000, seed=7)
        assert float(np.real(rho[1, 1])) == pytest.approx(
            np.exp(-t / t1), abs=0.03)

    def test_run_with_noise_counts(self):
        nm = NoiseModel()
        nm.add_global_noise(ThermalRelaxationNoise(50.0, 70.0, 5.0))
        nm.set_seed(3)
        c = QuantumCircuit(2)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
        counts = Simulator(noise_model=nm).run_with_noise(
            c, shots=256, seed=3).measurement_counts
        assert sum(counts.values()) == 256

    def test_norm_preserved(self):
        nm = NoiseModel()
        nm.add_global_noise(ThermalRelaxationNoise(20.0, 30.0, 4.0))
        nm.set_seed(11)
        c = QuantumCircuit(2)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
        state = Simulator(noise_model=nm).run(c, shots=0, seed=11).final_state
        assert state.probabilities.sum() == pytest.approx(1.0, abs=1e-5)


class TestMPSIntegration:
    def test_mps_trajectories_accept_thermal(self):
        # The (3, 2, 2) stack rides the MPS per-site Kraus machinery; a
        # GHZ-8 under pure T1 decay leaks weight out of {00..0, 11..1}.
        from quantum_simulator_tpu.mps import MPSSimulator
        nm = NoiseModel()
        nm.add_global_noise(ThermalRelaxationNoise(10.0, 15.0, 2.0))
        nm.set_seed(5)
        c = QuantumCircuit(8)
        c.add_gate(GateInstance("H", [0], [], column=0))
        for q in range(7):
            c.add_gate(GateInstance("CNOT", [q, q + 1], [], column=q + 1))
        counts, discarded = MPSSimulator(chi=8).run_with_noise(
            c, nm, shots=300, seed=5)
        assert sum(counts.values()) == 300
        leaked = sum(v for k, v in counts.items()
                     if k not in ("0" * 8, "1" * 8))
        assert leaked > 0


class TestSerde:
    def test_thermal_roundtrip(self):
        nm = NoiseModel()
        nm.add_global_noise(ThermalRelaxationNoise(50.0, 70.0, 0.5))
        nm.add_gate_noise("CNOT", TwoQubitDepolarizingNoise(0.01))
        d = nm.to_dict()
        back = NoiseModel.from_dict(d)
        chans = back.global_channels
        assert isinstance(chans[0], ThermalRelaxationNoise)
        assert (chans[0].t1, chans[0].t2, chans[0].time) == (50.0, 70.0, 0.5)
        cn = back.channels_for_gate("CNOT")
        assert any(isinstance(ch, TwoQubitDepolarizingNoise)
                   and ch.probability == 0.01 for ch in cn)
        assert back.to_dict() == d

    def test_reference_types_shape_unchanged(self):
        # The four reference channel types keep the reference's exact
        # {"type", "probability"} serde entries.
        from quantum_simulator_tpu import BitFlipNoise
        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(0.2))
        entry = nm.to_dict()["global"][0]
        assert set(entry) == {"type", "probability"}

    def test_spec_key_includes_all_params(self):
        a = ThermalRelaxationNoise(50.0, 70.0, 0.5)
        b = ThermalRelaxationNoise(50.0, 70.0, 0.6)
        assert a.spec_key() != b.spec_key()


class TestCliffordRejects:
    def test_clifford_rejects_thermal(self):
        from quantum_simulator_tpu import CliffordSimulator
        nm = NoiseModel()
        nm.add_global_noise(ThermalRelaxationNoise(50.0, 70.0, 1.0))
        c = QuantumCircuit(2)
        c.add_gate(GateInstance("H", [0], [], column=0))
        with pytest.raises(ValueError, match="Pauli"):
            CliffordSimulator().run_with_noise(c, nm, shots=4, seed=0)
