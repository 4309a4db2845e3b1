"""Noise-channel and measurement semantics (reference harness groups 2,3,4,7:
norm preservation, basis sampling sanity, readout-mode consistency, CPTP
channel limits)."""

import numpy as np
import pytest

from quantum_simulator_tpu import (
    AmplitudeDampingNoise,
    BitFlipNoise,
    DepolarizingNoise,
    GateInstance,
    MeasurementBasis,
    MeasurementEngine,
    NoiseModel,
    PhaseFlipNoise,
    QuantumCircuit,
    ReadoutError,
    Simulator,
    StateVector,
)
from quantum_simulator_tpu.gates import H_MATRIX


def bell():
    c = QuantumCircuit(2)
    c.add_gate(GateInstance("H", [0], [], column=0))
    c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
    return c


class TestNoiseChannels:
    def test_norm_preserved_under_stochastic_noise(self):
        for ch in [BitFlipNoise(0.3), PhaseFlipNoise(0.3),
                   DepolarizingNoise(0.3), AmplitudeDampingNoise(0.3)]:
            nm = NoiseModel()
            nm.add_global_noise(ch)
            nm.set_seed(42)
            sim = Simulator(noise_model=nm)
            result = sim.run(bell(), shots=0, seed=42)
            norm = result.final_state.probabilities.sum()
            assert norm == pytest.approx(1.0, abs=1e-5), type(ch).__name__

    def test_amplitude_damping_limits(self):
        # gamma=0: identity on |1>
        nm = NoiseModel()
        nm.add_global_noise(AmplitudeDampingNoise(0.0))
        nm.set_seed(1)
        c = QuantumCircuit(1, initial_states=[1])
        c.add_gate(GateInstance("I", [0], [], column=0))
        state = Simulator(noise_model=nm).run(c, shots=0).final_state
        assert state.probabilities[1] == pytest.approx(1.0, abs=1e-6)
        # gamma=1: |1> decays to |0>
        nm2 = NoiseModel()
        nm2.add_global_noise(AmplitudeDampingNoise(1.0))
        nm2.set_seed(1)
        state2 = Simulator(noise_model=nm2).run(c, shots=0).final_state
        assert state2.probabilities[0] == pytest.approx(1.0, abs=1e-6)
        # gamma=0.3 keeps norm 1
        nm3 = NoiseModel()
        nm3.add_global_noise(AmplitudeDampingNoise(0.3))
        nm3.set_seed(5)
        state3 = Simulator(noise_model=nm3).run(c, shots=0).final_state
        assert state3.probabilities.sum() == pytest.approx(1.0, abs=1e-5)

    def test_depolarizing_p1_norm(self):
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(1.0))
        nm.set_seed(3)
        state = Simulator(noise_model=nm).run(bell(), shots=0).final_state
        assert state.probabilities.sum() == pytest.approx(1.0, abs=1e-5)

    def test_bit_flip_statistics(self):
        """X fires with probability ~p on |0>."""
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("I", [0], [], column=0))
        flips = 0
        trials = 400
        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(0.25))
        sim = Simulator(noise_model=nm)
        states = sim.trajectory_states(c, trials, seed=11)
        probs = np.abs(np.asarray(
            __import__("jax.numpy", fromlist=["abs"]).abs(states))) ** 2
        flips = probs[:, 1].sum()
        assert 0.15 * trials < flips < 0.35 * trials

    def test_per_gate_noise_only_fires_on_that_gate(self):
        nm = NoiseModel()
        nm.add_gate_noise("H", BitFlipNoise(1.0))
        nm.set_seed(0)
        # Circuit with only X gates: no noise should fire
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("X", [0], [], column=0))
        state = Simulator(noise_model=nm).run(c, shots=0).final_state
        assert state.probabilities[1] == pytest.approx(1.0, abs=1e-6)

    def test_noise_model_serde(self):
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.1))
        nm.add_gate_noise("CNOT", BitFlipNoise(0.05))
        nm.set_readout_error(ReadoutError(0.01, 0.02))
        d = nm.to_dict()
        nm2 = NoiseModel.from_dict(d)
        assert nm2.to_dict() == d
        assert nm2.spec_key() == nm.spec_key()


class TestMeasurement:
    def test_basis_sampling_sums(self):
        state = Simulator().run(bell(), shots=0).final_state
        rng = np.random.default_rng(42)
        for basis in MeasurementBasis:
            counts = MeasurementEngine.sample_with_basis(
                state, 10000, basis=basis, rng=rng)
            assert sum(counts.values()) == 10000

    def test_x_basis_of_plus_state(self):
        sv = StateVector(1)
        sv.apply_gate(H_MATRIX, [0])
        counts = MeasurementEngine.sample_with_basis(
            sv, 1000, basis=MeasurementBasis.X,
            rng=np.random.default_rng(0))
        assert counts == {"0": 1000}

    def test_probs_sum_to_one(self):
        state = Simulator().run(bell(), shots=0).final_state
        assert state.probabilities.sum() == pytest.approx(1.0, abs=1e-6)


class TestReadoutError:
    def test_confusion_matrix_columns_sum_to_one(self):
        ro = ReadoutError(p01=0.1, p10=0.2)
        c = ro.confusion_matrix
        np.testing.assert_allclose(c.sum(axis=0), [1.0, 1.0])

    def test_distribution_transform_vs_brute_force_kron(self):
        """2-qubit distribution transform matches the explicit 4x4 kron to
        1e-12 (reference harness group 9, ``test_validation.py:514-530``)."""
        ro = ReadoutError(p01=0.03, p10=0.07)
        probs = np.array([0.4, 0.3, 0.2, 0.1])
        got = ro.apply_to_distribution(probs, 2)
        full = np.kron(ro.confusion_matrix, ro.confusion_matrix)
        expected = full @ probs
        expected /= expected.sum()
        np.testing.assert_allclose(got, expected, atol=1e-12)

    def test_shot_vs_distribution_modes_converge(self):
        """Max per-outcome frequency difference < 0.02 at 100k shots
        (reference ``test_validation.py:215-223``)."""
        state = Simulator().run(bell(), shots=0).final_state
        ro = ReadoutError(p01=0.05, p10=0.05)
        shots = 100_000
        c_shot = MeasurementEngine.sample_with_basis(
            state, shots, readout_error=ro, readout_mode="shot",
            rng=np.random.default_rng(1))
        c_dist = MeasurementEngine.sample_with_basis(
            state, shots, readout_error=ro, readout_mode="distribution",
            rng=np.random.default_rng(2))
        all_keys = set(c_shot) | set(c_dist)
        max_diff = max(
            abs(c_shot.get(k, 0) - c_dist.get(k, 0)) / shots
            for k in all_keys)
        assert max_diff < 0.02

    def test_16_qubit_distribution_transform_fast(self):
        """O(2^n) memory/time at n=16 (reference group 9 scaling proof)."""
        import time

        rng = np.random.default_rng(0)
        probs = rng.random(2**16)
        probs /= probs.sum()
        ro = ReadoutError(p01=0.02, p10=0.02)
        t0 = time.perf_counter()
        out = ro.apply_to_distribution(probs, 16)
        elapsed = time.perf_counter() - t0
        assert out.sum() == pytest.approx(1.0, abs=1e-9)
        assert elapsed < 1.0

    def test_corrupt_counts_preserves_total(self):
        ro = ReadoutError(p01=0.1, p10=0.1)
        counts = {"00": 500, "11": 500}
        noisy = ro.corrupt_counts(counts, np.random.default_rng(0))
        assert sum(noisy.values()) == 1000
        assert len(noisy) > 2  # corruption spread mass to other outcomes


class TestNoisySimulation:
    def test_run_with_noise_counts(self):
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.05))
        result = Simulator(noise_model=nm).run_with_noise(
            bell(), shots=500, seed=42)
        assert sum(result.measurement_counts.values()) == 500

    def test_ensemble_density_matrix_mixed(self):
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.2))
        rho = Simulator(noise_model=nm).ensemble_density_matrix(
            bell(), n_trials=50, seed=42)
        assert np.trace(rho).real == pytest.approx(1.0, abs=1e-4)
        purity = np.real(np.trace(rho @ rho))
        assert purity < 0.999  # noise must mix the ensemble
        # Hermitian
        np.testing.assert_allclose(rho, rho.conj().T, atol=1e-6)

    def test_ensemble_noiseless_is_pure(self):
        rho = Simulator().ensemble_density_matrix(bell(), n_trials=10, seed=1)
        purity = np.real(np.trace(rho @ rho))
        assert purity == pytest.approx(1.0, abs=1e-4)


def test_noise_model_introspection():
    from quantum_simulator_tpu.noise import (
        BitFlipNoise,
        DepolarizingNoise,
        NoiseModel,
        ReadoutError,
    )

    nm = NoiseModel()
    assert not nm.has_noise()
    nm.add_global_noise(DepolarizingNoise(0.1))
    assert nm.has_noise()
    assert len(nm.global_channels) == 1
    nm.global_channels.append(BitFlipNoise(0.1))  # view, not the internals
    assert len(nm.global_channels) == 1
    nm2 = NoiseModel()
    nm2.set_readout_error(ReadoutError(0.01, 0.01))
    assert nm2.has_noise()


def test_run_batched_trajectories_chunked_accumulator(monkeypatch):
    # Force the chunked path (chunk=4 over 10 keys -> 2 full chunks +
    # remainder 2 via the overlapping last-chunk launch) and check per-key
    # results match the unchunked evaluation exactly.
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quantum_simulator_tpu import simulator as sim_mod

    dim = 8

    def traj_fn(params, keys):
        vals = jax.vmap(
            lambda k: jax.random.uniform(k, (dim,)).astype(jnp.complex64)
        )(keys)
        return vals

    keys = jax.random.split(jax.random.PRNGKey(0), 10)
    full = traj_fn(None, keys)
    monkeypatch.setattr(sim_mod, "_traj_chunk_size", lambda d, k=4: 4)
    out = sim_mod.run_batched_trajectories(traj_fn, None, keys, dim)
    np.testing.assert_allclose(np.asarray(out.real),
                               np.asarray(full.real), atol=0)
    np.testing.assert_allclose(np.asarray(out.imag),
                               np.asarray(full.imag), atol=0)


class TestMonitoredTrajectories:
    """Mid-circuit collapse on the exact engine (completing the triad
    with the Clifford and MPS monitored surfaces)."""

    def test_bell_outcomes_correlated_and_states_collapsed(self):
        c = bell()
        c.add_gate(GateInstance("Measure", [0], [], column=2))
        c.add_gate(GateInstance("Measure", [1], [], column=2))
        outs, sites, states = Simulator().monitored_trajectories(
            c, n_trajectories=24, seed=7)
        assert outs.shape == (24, 2)
        assert sites == [(2, 0), (2, 1)]
        assert (outs[:, 0] == outs[:, 1]).all()
        assert 0 < outs[:, 0].mean() < 1  # both branches occur
        for t in range(24):
            psi = states[t].data
            want = np.zeros(4, complex)
            want[outs[t, 0] * 3] = 1.0  # |00> or |11>
            assert abs(np.vdot(want, psi)) ** 2 == pytest.approx(
                1.0, abs=1e-5)

    def test_measure_feeds_later_gates(self):
        # H; Measure; X  -> final qubit state is NOT(outcome).
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("Measure", [0], [], column=1))
        c.add_gate(GateInstance("X", [0], [], column=2))
        outs, _, states = Simulator().monitored_trajectories(
            c, n_trajectories=32, seed=3)
        for t in range(32):
            p1 = abs(states[t].data[1]) ** 2
            assert p1 == pytest.approx(1.0 - outs[t, 0], abs=1e-5)

    def test_matches_mps_monitored_statistics(self):
        # Monitored GHZ-3: the two engines must agree on the outcome
        # distribution (all-equal bits, ~50/50).
        from quantum_simulator_tpu.mps import MPSSimulator
        c = QuantumCircuit(3)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
        c.add_gate(GateInstance("CNOT", [1, 2], [], column=2))
        for q in range(3):
            c.add_gate(GateInstance("Measure", [q], [], column=3))
        outs_sv, sites_sv, _ = Simulator().monitored_trajectories(
            c, n_trajectories=64, seed=5)
        outs_mps, sites_mps, _ = MPSSimulator(chi=4).monitored_trajectories(
            c, n_trajectories=64, seed=5)
        assert sites_sv == sites_mps
        for outs in (outs_sv, outs_mps):
            assert ((outs == outs[:, :1]).all())
            assert 0.2 < outs[:, 0].mean() < 0.8

    def test_noise_interleaves(self):
        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(0.4))
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("I", [0], [], column=0))
        c.add_gate(GateInstance("Measure", [0], [], column=1))
        outs, _, states = Simulator(noise_model=nm).monitored_trajectories(
            c, n_trajectories=64, seed=11)
        # Bit-flip noise after the identity makes outcome 1 occur with
        # p=0.4; 64 draws land well inside (0.1, 0.75).
        assert 0.1 < outs[:, 0].mean() < 0.75
        for t in range(3):
            assert np.sum(np.abs(states[t].data) ** 2) == pytest.approx(
                1.0, abs=1e-5)

    def test_no_measure_gates(self):
        c = bell()
        outs, sites, states = Simulator().monitored_trajectories(
            c, n_trajectories=4, seed=0)
        assert outs.shape == (4, 0) and sites == []
        assert abs(states[0].data[0]) ** 2 == pytest.approx(0.5, abs=1e-5)

    def test_chunked_equals_unchunked(self, monkeypatch):
        import quantum_simulator_tpu.simulator as sim_mod
        c = bell()
        c.add_gate(GateInstance("Measure", [0], [], column=2))
        full_o, _, full_s = Simulator().monitored_trajectories(
            c, n_trajectories=11, seed=9)
        monkeypatch.setattr(sim_mod, "_traj_chunk_size", lambda dim: 4)
        part_o, _, part_s = Simulator().monitored_trajectories(
            c, n_trajectories=11, seed=9)
        np.testing.assert_array_equal(full_o, part_o)
        for a, b in zip(full_s, part_s):
            np.testing.assert_allclose(a.data, b.data, atol=1e-6)
