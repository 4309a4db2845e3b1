"""Error-mitigation tests: unitary folding, Richardson ZNE, readout
inversion — exactness where the math is exact, measured improvement
where it is statistical."""

import math

import numpy as np
import pytest

from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
from quantum_simulator_tpu.density import DensityMatrixSimulator
from quantum_simulator_tpu.mitigation import (
    ReadoutMitigator, ZNEResult, fold_circuit, inverse_circuit,
    inverse_gate, richardson_extrapolate, zne_expectation)
from quantum_simulator_tpu.noise import (BitFlipNoise, DepolarizingNoise,
                                         NoiseModel, ReadoutError)
from quantum_simulator_tpu.simulator import Simulator


def _rich_circuit() -> QuantumCircuit:
    """Covers every inverse rule: fixed, dagger-swap, param-negate, U3,
    MCZ, multi-qubit."""
    c = QuantumCircuit(num_qubits=3)
    c.add("H", [0])
    c.add("T", [1])
    c.add("S_DAG", [2])
    c.add("Rx", [0], [0.7])
    c.add("U3", [1], [0.3, 1.1, -0.4])
    c.add("CPhase", [0, 2], [math.pi / 5])
    c.add("CNOT", [1, 2])
    c.add("MCZ3", [0, 1, 2])
    c.add("SWAP", [0, 1])
    return c


def _state(circuit):
    return np.asarray(Simulator().run(circuit, shots=1).final_state.data)


class TestFolding:
    def test_inverse_circuit_undoes(self):
        c = _rich_circuit()
        inv = inverse_circuit(c)
        merged = QuantumCircuit(num_qubits=3)
        off = c.get_column_count()
        for g in c.gates:
            merged.add_gate(GateInstance(g.gate_name, list(g.target_qubits),
                                         list(g.params), g.column))
        for g in inv.gates:
            merged.add_gate(GateInstance(g.gate_name, list(g.target_qubits),
                                         list(g.params), g.column + off))
        s = _state(merged)
        expected = np.zeros(8)
        expected[0] = 1.0
        np.testing.assert_allclose(np.abs(s), expected, atol=1e-6)

    @pytest.mark.parametrize("scale", [1, 3, 5])
    def test_fold_preserves_unitary(self, scale):
        c = _rich_circuit()
        np.testing.assert_allclose(_state(fold_circuit(c, scale)),
                                   _state(c), atol=1e-6)

    def test_fold_gate_count(self):
        c = _rich_circuit()
        assert fold_circuit(c, 5).gate_count() == 5 * c.gate_count()

    def test_fold_rejects_even_scale_and_measure(self):
        c = _rich_circuit()
        with pytest.raises(ValueError, match="odd"):
            fold_circuit(c, 2)
        c.add("Measure", [0])
        with pytest.raises(ValueError, match="Measure"):
            fold_circuit(c, 3)

    def test_inverse_gate_unknown_raises(self):
        with pytest.raises(ValueError, match="Measure"):
            inverse_gate(GateInstance("Measure", [0], [], 0))


class TestRichardson:
    def test_polynomial_is_exact(self):
        # f(s) = 2 - 0.3 s + 0.05 s^2: three points nail f(0) exactly
        f = lambda s: 2 - 0.3 * s + 0.05 * s * s
        scales = [1, 3, 5]
        est = richardson_extrapolate(scales, [f(s) for s in scales])
        assert est == pytest.approx(2.0, abs=1e-12)

    def test_two_point_linear(self):
        est = richardson_extrapolate([1, 3], [0.9, 0.7])
        assert est == pytest.approx(1.0)

    def test_validation(self):
        with pytest.raises(ValueError, match="distinct"):
            richardson_extrapolate([1, 1], [0.5, 0.5])
        with pytest.raises(ValueError, match="equal-length"):
            richardson_extrapolate([1, 2], [0.5])


class TestZNE:
    def test_mock_evaluator_sees_folded_scales(self):
        c = QuantumCircuit(num_qubits=1)
        c.add("X", [0])
        seen = []

        def evaluate(circ):
            seen.append(circ.gate_count())
            return 1.0 - 0.1 * circ.gate_count()

        res = zne_expectation(evaluate, c, scales=(1, 3, 5))
        assert seen == [1, 3, 5]
        assert isinstance(res, ZNEResult)
        assert res.value == pytest.approx(1.0)
        assert res.to_dict()["scales"] == [1, 3, 5]

    def test_dagger_asymmetry_warns_on_different_channels(self):
        # Equal channel COUNTS but different channels on S vs S_DAG
        # still breaks the noise-scales-with-fold assumption: the
        # warning must compare channel identities, not counts.
        c = QuantumCircuit(num_qubits=1)
        c.add("S", [0])
        nm = NoiseModel()
        nm.add_gate_noise("S", BitFlipNoise(0.1))
        nm.add_gate_noise("S_DAG", DepolarizingNoise(0.3))
        with pytest.warns(UserWarning, match="dagger"):
            zne_expectation(lambda circ: 1.0, c, scales=(1, 3),
                            noise_model=nm)

    def test_dagger_symmetric_channels_do_not_warn(self):
        import warnings

        c = QuantumCircuit(num_qubits=1)
        c.add("S", [0])
        nm = NoiseModel()
        nm.add_gate_noise("S", BitFlipNoise(0.1))
        nm.add_gate_noise("S_DAG", BitFlipNoise(0.1))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            zne_expectation(lambda circ: 1.0, c, scales=(1, 3),
                            noise_model=nm)

    def test_zne_beats_raw_on_exact_density_matrix(self):
        """Depolarizing noise on a Rabi-style circuit: the extrapolated
        <Z0> must land much closer to the ideal value than the raw
        noisy expectation."""
        c = QuantumCircuit(num_qubits=2)
        c.add("Rx", [0], [0.9])
        c.add("CNOT", [0, 1])
        c.add("Rx", [0], [0.4])
        ideal = float(DensityMatrixSimulator().run(c).expectation_z(0))

        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.02))
        noisy_sim = DensityMatrixSimulator(noise_model=nm)
        evaluate = lambda circ: float(noisy_sim.run(circ).expectation_z(0))

        res = zne_expectation(evaluate, c, scales=(1, 3, 5))
        raw_err = abs(res.raw_values[0] - ideal)
        zne_err = abs(res.value - ideal)
        assert raw_err > 1e-3          # the noise actually bites
        assert zne_err < raw_err / 5   # and ZNE removes most of it

    def test_zne_exact_for_single_bitflip_pair(self):
        """One X + bit-flip p: <Z>(s) = -(1-2p)^s; with two scales the
        log-linear structure makes Richardson land within O(p^2)."""
        p = 0.01
        c = QuantumCircuit(num_qubits=1)
        c.add("X", [0])
        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(p))
        sim = DensityMatrixSimulator(noise_model=nm)
        evaluate = lambda circ: float(sim.run(circ).expectation_z(0))
        # analytic Richardson residual: 1 - (1-2p)(3-(1-2p)^2)/2 = 6p^2+O(p^3)
        res = zne_expectation(evaluate, c, scales=(1, 3))
        assert abs(res.value - (-1.0)) < 8 * p * p


class TestReadoutMitigator:
    def test_exact_inversion_of_model_distribution(self):
        err = ReadoutError(p01=0.03, p10=0.08)
        c = QuantumCircuit(num_qubits=3)
        c.add("H", [0])
        c.add("CNOT", [0, 1])
        c.add("Ry", [2], [0.8])
        true = np.asarray(
            Simulator().run(c, shots=1).final_state.probabilities)
        corrupted = np.asarray(err.apply_to_distribution(true, 3))
        mit = ReadoutMitigator.from_readout_error(err, 3)
        recovered = mit.apply_to_probs(corrupted)
        np.testing.assert_allclose(recovered, true, atol=1e-6)

    def test_counts_and_expectation(self):
        err = ReadoutError(p01=0.05, p10=0.05)
        mit = ReadoutMitigator.from_readout_error(err, 2)
        # perfectly corrupted |00>: P(read 00)=.9025 etc at p=.05
        counts = {"00": 9025, "01": 475, "10": 475, "11": 25}
        probs = mit.apply_to_counts(counts)
        np.testing.assert_allclose(probs, [1, 0, 0, 0], atol=1e-6)
        assert mit.expectation_z(counts, 0) == pytest.approx(1.0, abs=1e-6)
        assert mit.expectation_z(counts, 1) == pytest.approx(1.0, abs=1e-6)

    def test_empirical_calibration(self):
        rng = np.random.default_rng(11)
        err = ReadoutError(p01=0.04, p10=0.09)
        shots = 200_000
        zeros = err.corrupt_counts({"000": shots}, rng)
        ones = err.corrupt_counts({"111": shots}, rng)
        mit = ReadoutMitigator.from_calibration_counts(zeros, ones)
        np.testing.assert_allclose(
            mit.confusions,
            ReadoutMitigator.from_readout_error(err, 3).confusions,
            atol=5e-3)

    def test_simplex_projection(self):
        mit = ReadoutMitigator.from_readout_error(
            ReadoutError(p01=0.2, p10=0.2), 1)
        # finite-shot distribution more extreme than the model allows
        # -> raw inverse goes negative -> clipped + renormalized
        probs = mit.apply_to_probs(np.array([0.05, 0.95]))
        assert np.all(probs >= 0)
        assert probs.sum() == pytest.approx(1.0)

    def test_validation(self):
        with pytest.raises(ValueError, match="shape"):
            ReadoutMitigator(np.zeros((2, 3, 3)))
        with pytest.raises(ValueError, match="column-stochastic"):
            ReadoutMitigator(np.full((1, 2, 2), 0.3))
        mit = ReadoutMitigator.from_readout_error(ReadoutError(0.1, 0.1), 2)
        with pytest.raises(ValueError, match="expected shape"):
            mit.apply_to_probs(np.ones(8) / 8)
        with pytest.raises(ValueError, match="not 2 bits"):
            mit.apply_to_counts({"000": 5})


class TestEndToEndNoisyPipeline:
    def test_sampled_counts_mitigation_improves_tvd(self):
        """Full pipeline on the engine: noisy run with readout error,
        mitigate sampled counts, TVD to ideal must drop."""
        err = ReadoutError(p01=0.06, p10=0.06)
        nm = NoiseModel()
        nm.set_readout_error(err)
        nm.set_seed(5)
        c = QuantumCircuit(num_qubits=2)
        c.add("H", [0])
        c.add("CNOT", [0, 1])
        shots = 40_000
        noisy = Simulator(noise_model=nm).run_with_noise(
            c, shots=shots, seed=5).measurement_counts
        ideal = np.zeros(4)
        ideal[0] = ideal[3] = 0.5

        raw = np.zeros(4)
        for bits, cnt in noisy.items():
            raw[int(bits, 2)] = cnt / shots
        mit = ReadoutMitigator.from_readout_error(err, 2)
        recovered = mit.apply_to_counts(noisy)

        tvd = lambda p: 0.5 * np.abs(p - ideal).sum()
        assert tvd(raw) > 0.03            # corruption is visible
        assert tvd(recovered) < tvd(raw) / 3


class TestPEC:
    def _noisy_gate_model(self, p=0.05, gate="CNOT", channel=None):
        from quantum_simulator_tpu.mitigation import pec_expectation  # noqa
        nm = NoiseModel()
        nm.add_gate_noise(gate, channel or DepolarizingNoise(p))
        return nm

    def test_quasi_inverse_closed_forms(self):
        from quantum_simulator_tpu.mitigation import quasi_inverse_pauli
        from quantum_simulator_tpu.noise import (PhaseFlipNoise,
                                                 TwoQubitDepolarizingNoise)
        p = 0.1
        paulis, etas = quasi_inverse_pauli(BitFlipNoise(p))
        assert paulis == ("I", "X", "Y", "Z")
        # inverse bit-flip: p' = -p/(1-2p)
        pp = -p / (1 - 2 * p)
        np.testing.assert_allclose(etas, [1 - pp, pp, 0, 0], atol=1e-12)
        assert etas.sum() == pytest.approx(1.0)

        _, etas_z = quasi_inverse_pauli(PhaseFlipNoise(p))
        np.testing.assert_allclose(etas_z, [1 - pp, 0, 0, pp], atol=1e-12)

        _, etas_d = quasi_inverse_pauli(DepolarizingNoise(p))
        lam = 1 - 4 * p / 3
        pd = 0.75 * (1 - 1 / lam)
        np.testing.assert_allclose(
            etas_d, [1 - pd, pd / 3, pd / 3, pd / 3], atol=1e-12)

        labels, etas2 = quasi_inverse_pauli(TwoQubitDepolarizingNoise(p))
        assert len(labels) == 16 and labels[0] == "II" and labels[5] == "XX"
        assert etas2.sum() == pytest.approx(1.0)
        assert etas2[1] < 0  # negative quasi-weights present

    def test_quasi_inverse_rejects_non_pauli(self):
        from quantum_simulator_tpu.mitigation import quasi_inverse_pauli
        from quantum_simulator_tpu.noise import AmplitudeDampingNoise
        with pytest.raises(ValueError, match="not a Pauli channel"):
            quasi_inverse_pauli(AmplitudeDampingNoise(0.1))

    def test_exact_enumeration_cancels_depolarizing(self):
        """Per-CNOT depolarizing: exact PEC enumeration recovers the
        ideal <Z0> to engine precision on the exact DM engine."""
        from quantum_simulator_tpu.mitigation import pec_expectation
        c = QuantumCircuit(num_qubits=2)
        c.add("Ry", [0], [0.7])
        c.add("CNOT", [0, 1])
        c.add("Rx", [1], [0.3])
        ideal = float(DensityMatrixSimulator().run(c).expectation_z(0))
        nm = self._noisy_gate_model(p=0.06)
        sim = DensityMatrixSimulator(noise_model=nm)
        evaluate = lambda circ: float(sim.run(circ).expectation_z(0))
        noisy = evaluate(c)
        res = pec_expectation(evaluate, c, nm, samples=None)
        assert abs(noisy - ideal) > 1e-3
        assert res.value == pytest.approx(ideal, abs=1e-6)
        assert res.gamma > 1.0
        assert res.n_locations == 2  # one 1q channel per CNOT target

    def test_exact_enumeration_two_qubit_channel(self):
        from quantum_simulator_tpu.mitigation import pec_expectation
        from quantum_simulator_tpu.noise import TwoQubitDepolarizingNoise
        c = QuantumCircuit(num_qubits=2)
        c.add("H", [0])
        c.add("CNOT", [0, 1])
        ideal = float(DensityMatrixSimulator().run(c).expectation_z(1))
        nm = NoiseModel()
        nm.add_gate_noise("CNOT", TwoQubitDepolarizingNoise(0.08))
        sim = DensityMatrixSimulator(noise_model=nm)
        evaluate = lambda circ: float(sim.run(circ).expectation_z(1))
        res = pec_expectation(evaluate, c, nm, samples=None)
        assert res.n_locations == 1
        assert res.value == pytest.approx(ideal, abs=1e-6)

    def test_monte_carlo_converges(self):
        from quantum_simulator_tpu.mitigation import pec_expectation
        c = QuantumCircuit(num_qubits=2)
        c.add("Ry", [0], [0.7])
        c.add("CNOT", [0, 1])
        ideal = float(DensityMatrixSimulator().run(c).expectation_z(0))
        nm = self._noisy_gate_model(p=0.04)
        sim = DensityMatrixSimulator(noise_model=nm)
        evaluate = lambda circ: float(sim.run(circ).expectation_z(0))
        res = pec_expectation(evaluate, c, nm, samples=600, seed=9)
        # gamma ~ 1.25: 600 signed samples land well inside 0.15
        assert abs(res.value - ideal) < 0.15
        assert res.samples == 600

    def test_rejects_global_noise_and_caps_enumeration(self):
        from quantum_simulator_tpu.mitigation import pec_expectation
        c = QuantumCircuit(num_qubits=1)
        c.add("X", [0])
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.01))
        with pytest.raises(ValueError, match="gate-specific"):
            pec_expectation(lambda _c: 0.0, c, nm)
        nm2 = NoiseModel()
        nm2.add_gate_noise("H", DepolarizingNoise(0.01))
        big = QuantumCircuit(num_qubits=1)
        for _ in range(8):
            big.add("H", [0])
        with pytest.raises(ValueError, match="samples=N"):
            pec_expectation(lambda _c: 0.0, big, nm2, max_enumeration=100)

    def test_rejects_noise_on_recovery_paulis(self):
        """Channels on X/Y/Z would fire on spliced recovery gates and
        silently bias the estimate (ADVICE r3) — reject loudly."""
        from quantum_simulator_tpu.mitigation import pec_expectation
        c = QuantumCircuit(num_qubits=1)
        c.add("X", [0])
        nm = NoiseModel()
        nm.add_gate_noise("X", DepolarizingNoise(0.01))
        with pytest.raises(ValueError, match="recovery"):
            pec_expectation(lambda _c: 0.0, c, nm)
        # ...but only when recoveries are actually spliced: noise on X
        # with no X in the circuit is a harmless passthrough.
        h_only = QuantumCircuit(num_qubits=1)
        h_only.add("H", [0])
        res = pec_expectation(lambda _c: 0.5, h_only, nm)
        assert res.n_locations == 0

    def test_pec_preserves_initial_states(self):
        """Recovery circuits must keep |1>-prepared qubits prepared
        (ADVICE r3: _insert_recoveries dropped initial_states)."""
        from quantum_simulator_tpu.mitigation import pec_expectation
        c = QuantumCircuit(num_qubits=2, initial_states=[1, 0])
        c.add("CNOT", [0, 1])
        ideal = float(DensityMatrixSimulator().run(c).expectation_z(1))
        assert ideal == pytest.approx(-1.0)  # |11>: Z1 = -1
        nm = self._noisy_gate_model(p=0.05)
        sim = DensityMatrixSimulator(noise_model=nm)
        evaluate = lambda circ: float(sim.run(circ).expectation_z(1))
        res = pec_expectation(evaluate, c, nm, samples=None)
        assert res.value == pytest.approx(ideal, abs=1e-6)

    def test_no_noise_locations_passthrough(self):
        from quantum_simulator_tpu.mitigation import pec_expectation
        c = QuantumCircuit(num_qubits=1)
        c.add("H", [0])
        nm = NoiseModel()
        nm.add_gate_noise("CNOT", DepolarizingNoise(0.1))  # never fires
        res = pec_expectation(lambda _c: 0.42, c, nm)
        assert res.value == pytest.approx(0.42)
        assert res.gamma == 1.0 and res.n_locations == 0
