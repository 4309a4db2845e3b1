"""QEC: codes correct their target errors, threshold sweeps behave.

Reference harness group 5: bit-flip noiseless fidelity 1.0, <Z_L> = ±1.
Plus exhaustive single-error correction checks (incl. Steane's 21 cases,
which the reference decoder gets wrong — see qec.py docstrings)."""

import numpy as np
import pytest

from quantum_simulator_tpu.analysis import StateAnalysis
from quantum_simulator_tpu.gates import X_MATRIX, Y_MATRIX, Z_MATRIX
from quantum_simulator_tpu.qec import (
    AVAILABLE_CODES,
    BitFlipCode,
    PhaseFlipCode,
    QECSimulator,
    SteaneCode,
)


class TestCodesNoiseless:
    @pytest.mark.parametrize("Code", [BitFlipCode, PhaseFlipCode, SteaneCode])
    def test_noiseless_cycle(self, Code):
        sim = QECSimulator(Code())
        for logical, sign in [(0, 1.0), (1, -1.0)]:
            r = sim.run_cycle(logical, "bit_flip", 0.0, seed=1)
            assert r.fidelity_after == pytest.approx(1.0, abs=1e-4)
            assert r.logical_z_expectation == pytest.approx(sign, abs=1e-4)
            assert not r.logical_error_detected
            assert all(s == 0 for s in r.syndrome)
            assert r.correction_applied == []


class TestSingleErrorCorrection:
    def test_bitflip_corrects_every_x(self):
        code = BitFlipCode()
        ideal = code.encode(0)
        for q in range(3):
            noisy = ideal.copy()
            noisy.apply_gate(X_MATRIX, [q])
            syn = code.extract_syndrome(noisy)
            corr = code.decode_syndrome(syn)
            assert corr == [("X", q)]
            code.apply_correction(noisy, corr)
            assert StateAnalysis.process_fidelity(ideal, noisy) == \
                pytest.approx(1.0, abs=1e-4)

    def test_phaseflip_corrects_every_z(self):
        code = PhaseFlipCode()
        ideal = code.encode(1)
        for q in range(3):
            noisy = ideal.copy()
            noisy.apply_gate(Z_MATRIX, [q])
            corr = code.decode_syndrome(code.extract_syndrome(noisy))
            assert corr == [("Z", q)]
            code.apply_correction(noisy, corr)
            assert StateAnalysis.process_fidelity(ideal, noisy) == \
                pytest.approx(1.0, abs=1e-4)

    @pytest.mark.parametrize("pauli", [X_MATRIX, Z_MATRIX, Y_MATRIX])
    def test_steane_corrects_every_single_error(self, pauli):
        code = SteaneCode()
        ideal = code.encode(0)
        for q in range(7):
            noisy = ideal.copy()
            noisy.apply_gate(pauli, [q])
            corr = code.decode_syndrome(code.extract_syndrome(noisy))
            code.apply_correction(noisy, corr)
            fid = StateAnalysis.process_fidelity(ideal, noisy)
            assert fid == pytest.approx(1.0, abs=1e-3), (q, corr)

    def test_bitflip_cannot_correct_double_error(self):
        code = BitFlipCode()
        ideal = code.encode(0)
        noisy = ideal.copy()
        noisy.apply_gate(X_MATRIX, [0])
        noisy.apply_gate(X_MATRIX, [1])
        corr = code.decode_syndrome(code.extract_syndrome(noisy))
        code.apply_correction(noisy, corr)
        assert StateAnalysis.process_fidelity(ideal, noisy) < 0.5


class TestThresholdSweep:
    def test_logical_rate_increases_with_p(self):
        sim = QECSimulator(BitFlipCode())
        pts = sim.threshold_sweep([0.02, 0.3], n_trials=200,
                                  noise_type="bit_flip", seed=42)
        assert pts[0].logical_rate < pts[1].logical_rate
        assert pts[0].logical_rate < 0.05  # ~3p^2 at p=0.02
        for pt in pts:
            assert 0 <= pt.success_rate <= 1
            assert pt.success_rate == pytest.approx(1 - pt.logical_rate)
            assert 0 <= pt.decoder_success_rate <= 1

    def test_code_suppresses_below_threshold(self):
        """At small p, logical error < physical error (the point of QEC)."""
        sim = QECSimulator(BitFlipCode())
        p = 0.05
        pts = sim.threshold_sweep([p], n_trials=400,
                                  noise_type="bit_flip", seed=7)
        assert pts[0].logical_rate < p

    def test_projection_logical_error(self):
        sim = QECSimulator(BitFlipCode())
        out = sim.projection_logical_error(0, "bit_flip", 0.1,
                                           n_trials=100, seed=3)
        assert 0 <= out["logical_error_rate"] <= 1
        assert out["mean_fidelity"] == pytest.approx(
            1 - out["logical_error_rate"])
        assert out["n_trials"] == 100

    def test_phaseflip_sweep(self):
        sim = QECSimulator(PhaseFlipCode())
        pts = sim.threshold_sweep([0.05], n_trials=200,
                                  noise_type="phase_flip", seed=11)
        assert pts[0].logical_rate < 0.05

    def test_steane_depolarizing_sweep(self):
        sim = QECSimulator(SteaneCode())
        pts = sim.threshold_sweep([0.02], n_trials=100,
                                  noise_type="depolarizing", seed=42)
        assert pts[0].decoder_success_rate > 0.9


def test_available_codes():
    assert set(AVAILABLE_CODES) == {
        "Bit-Flip [3,1,1]", "Phase-Flip [3,1,1]", "Steane [[7,1,3]]",
        "Surface [[9,1,3]]"}
    for name, cls in AVAILABLE_CODES.items():
        assert cls().name == name
