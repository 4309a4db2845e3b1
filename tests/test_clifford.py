"""Clifford tableau engine vs the statevector engine, plus at-scale runs
no statevector can hold (GHZ-200)."""

import numpy as np
import pytest

from quantum_simulator_tpu import GateInstance, QuantumCircuit, Simulator
from quantum_simulator_tpu.clifford import (
    CliffordSimulator, compile_clifford, identity_tableau,
    is_clifford_circuit, _apply_gate,
)


def ghz(n):
    c = QuantumCircuit(n)
    c.add_gate(GateInstance("H", [0], [], column=0))
    for i in range(n - 1):
        c.add_gate(GateInstance("CNOT", [i, i + 1], [], column=i + 1))
    return c


def random_clifford_circuit(n, depth, rng):
    c = QuantumCircuit(n)
    one_q = ["H", "S", "S_DAG", "X", "Y", "Z"]
    for col in range(depth):
        kind = rng.integers(0, 2)
        if kind == 0 or n == 1:
            q = int(rng.integers(0, n))
            c.add_gate(GateInstance(
                str(rng.choice(one_q)), [q], [], column=col))
        else:
            a, b = rng.choice(n, size=2, replace=False)
            name = str(rng.choice(["CNOT", "CZ", "SWAP"]))
            c.add_gate(GateInstance(name, [int(a), int(b)], [],
                                    column=col))
    return c


class TestGateAlgebra:
    def test_is_clifford_detection(self):
        c = ghz(3)
        assert is_clifford_circuit(c)
        c.add_gate(GateInstance("T", [0], [], column=5))
        assert not is_clifford_circuit(c)

    def test_s_sdag_inverse(self):
        tab = identity_tableau(2)
        t2 = _apply_gate(_apply_gate(tab, "H", [0]), "S", [0])
        t3 = _apply_gate(t2, "S_DAG", [0])
        t4 = _apply_gate(t3, "H", [0])
        ref = identity_tableau(2)
        np.testing.assert_array_equal(np.asarray(t4.x), np.asarray(ref.x))
        np.testing.assert_array_equal(np.asarray(t4.z), np.asarray(ref.z))
        np.testing.assert_array_equal(np.asarray(t4.r), np.asarray(ref.r))

    def test_ssss_is_identity(self):
        tab = _apply_gate(identity_tableau(1), "H", [0])
        t = tab
        for _ in range(4):
            t = _apply_gate(t, "S", [0])
        np.testing.assert_array_equal(np.asarray(t.x), np.asarray(tab.x))
        np.testing.assert_array_equal(np.asarray(t.r), np.asarray(tab.r))


class TestDeterministicCounts:
    def test_basis_state_counts(self):
        c = QuantumCircuit(3)
        c.add_gate(GateInstance("X", [1], [], column=0))
        counts, _ = CliffordSimulator().run(c, shots=64, seed=1)
        assert counts == {"010": 64}

    def test_y_flips_like_x(self):
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("Y", [0], [], column=0))
        counts, _ = CliffordSimulator().run(c, shots=16, seed=2)
        assert counts == {"1": 16}

    def test_cnot_ladder(self):
        c = QuantumCircuit(4)
        c.add_gate(GateInstance("X", [0], [], column=0))
        for i in range(3):
            c.add_gate(GateInstance("CNOT", [i, i + 1], [], column=i + 1))
        counts, _ = CliffordSimulator().run(c, shots=32, seed=3)
        assert counts == {"1111": 32}

    def test_matches_statevector_exactly_when_deterministic(self):
        c = QuantumCircuit(3)
        c.add_gate(GateInstance("X", [0], [], column=0))
        c.add_gate(GateInstance("CZ", [0, 1], [], column=1))
        c.add_gate(GateInstance("SWAP", [1, 2], [], column=2))
        sv = Simulator().run(c, shots=50, seed=5).measurement_counts
        cl, _ = CliffordSimulator().run(c, shots=50, seed=5)
        assert sv == cl


class TestRandomOutcomes:
    def test_ghz_support_and_balance(self):
        counts, tab = CliffordSimulator().run(ghz(5), shots=2000, seed=7)
        assert set(counts) == {"00000", "11111"}
        assert abs(counts["00000"] - 1000) < 150

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_tvd_vs_statevector_random_clifford(self, seed):
        rng = np.random.default_rng(seed)
        n, shots = 4, 4000
        c = random_clifford_circuit(n, 12, rng)
        sv = Simulator().run(c, shots=shots, seed=seed).measurement_counts
        cl, _ = CliffordSimulator().run(c, shots=shots, seed=seed + 1)
        tvd = 0.0
        for k in set(sv) | set(cl):
            tvd += abs(sv.get(k, 0) - cl.get(k, 0)) / shots
        assert tvd / 2 < 0.06

    def test_z_string_expectations_match_statevector(self):
        rng = np.random.default_rng(11)
        for trial in range(4):
            n = 4
            c = random_clifford_circuit(n, 10, rng)
            state = Simulator().run(c, shots=0).final_state
            probs = state.probabilities
            _, tab = CliffordSimulator().run(c, shots=0)
            idx = np.arange(2 ** n)
            for mask_bits in range(1, 2 ** n):
                qubits = [q for q in range(n) if (mask_bits >> q) & 1]
                # qubit 0 = MSB convention for basis indices
                parity = np.zeros(2 ** n)
                for q in qubits:
                    parity += (idx >> (n - 1 - q)) & 1
                expect_sv = float(probs @ (1.0 - 2.0 * (parity % 2)))
                expect_cl = CliffordSimulator.expectation_z_string(
                    tab, qubits)
                assert expect_cl == pytest.approx(expect_sv, abs=1e-5), \
                    (trial, qubits)


class TestAtScale:
    def test_ghz_200(self):
        counts, tab = CliffordSimulator().run(ghz(200), shots=200, seed=9)
        assert set(counts) == {"0" * 200, "1" * 200}
        assert CliffordSimulator.expectation_z_string(
            tab, [0, 199]) == 1.0
        assert CliffordSimulator.expectation_z_string(tab, [0]) == 0.0

    def test_stabilizer_strings_ghz(self):
        _, tab = CliffordSimulator().run(ghz(3), shots=0)
        stabs = CliffordSimulator.stabilizers(tab)
        assert len(stabs) == 3
        assert all(s[0] in "+-" and len(s) == 4 for s in stabs)
        # the group stabilizes GHZ: X-type generator exists (H spread)
        assert any("X" in s for s in stabs)

    def test_rejects_non_clifford(self):
        c = QuantumCircuit(2)
        c.add_gate(GateInstance("T", [0], [], column=0))
        with pytest.raises(ValueError):
            compile_clifford(c)

    def test_duplicate_z_string_rejected(self):
        _, tab = CliffordSimulator().run(ghz(2), shots=0)
        with pytest.raises(ValueError):
            CliffordSimulator.expectation_z_string(tab, [0, 0])


def test_amplitude_engines_reject_clifford_widths():
    """The IR admits wide circuits; amplitude engines refuse at entry."""
    from quantum_simulator_tpu.parallel.distributed import (
        DistributedSimulator)
    wide = ghz(40)
    with pytest.raises(ValueError, match="amplitude"):
        Simulator().run(wide, shots=0)
    with pytest.raises(ValueError, match="mesh"):
        DistributedSimulator().run(ghz(50))


class TestNoisyClifford:
    def test_zero_noise_matches_ideal(self):
        from quantum_simulator_tpu.noise import NoiseModel, BitFlipNoise
        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(0.0))
        counts = CliffordSimulator().run_with_noise(ghz(4), nm, shots=400,
                                                    seed=3)
        assert set(counts) == {"0000", "1111"}

    def test_distribution_matches_statevector_run_with_noise(self):
        from quantum_simulator_tpu.noise import NoiseModel, DepolarizingNoise
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.1))
        c = ghz(3)
        shots = 4000
        sv = Simulator(noise_model=nm).run_with_noise(
            c, shots=shots, seed=11).measurement_counts
        cl = CliffordSimulator().run_with_noise(c, nm, shots=shots, seed=12)
        tvd = sum(abs(sv.get(k, 0) - cl.get(k, 0))
                  for k in set(sv) | set(cl)) / (2 * shots)
        assert tvd < 0.05

    def test_wide_noisy_run_beyond_statevector(self):
        from quantum_simulator_tpu.noise import (NoiseModel, BitFlipNoise,
                                                 ReadoutError)
        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(0.02))
        nm.set_readout_error(ReadoutError(p01=0.01, p10=0.01))
        counts = CliffordSimulator().run_with_noise(ghz(60), nm, shots=200,
                                                    seed=5)
        assert sum(counts.values()) == 200
        assert all(len(k) == 60 for k in counts)
        # noise spreads support beyond the two GHZ strings
        assert len(counts) > 2

    def test_amplitude_damping_rejected(self):
        from quantum_simulator_tpu.noise import (NoiseModel,
                                                 AmplitudeDampingNoise)
        from quantum_simulator_tpu.clifford import compile_clifford_noisy
        nm = NoiseModel()
        nm.add_global_noise(AmplitudeDampingNoise(0.1))
        with pytest.raises(ValueError, match="Pauli"):
            compile_clifford_noisy(ghz(2), nm)


class TestEntanglementEntropy:
    def test_matches_statevector_on_random_cliffords(self):
        from quantum_simulator_tpu.analysis import StateAnalysis
        rng = np.random.default_rng(19)
        for trial in range(4):
            n = 5
            c = random_clifford_circuit(n, 14, rng)
            state = Simulator().run(c, shots=0).final_state
            _, tab = CliffordSimulator().run(c, shots=0)
            for mask in (1, 2, 3, 7, 11):
                sub = [q for q in range(n) if (mask >> q) & 1]
                s_sv = StateAnalysis.entanglement_entropy(state, sub)
                s_cl = CliffordSimulator.entanglement_entropy(tab, sub)
                assert s_cl == pytest.approx(s_sv, abs=1e-5), (trial, sub)

    def test_ghz_cut_entropy_is_one_bit_at_any_scale(self):
        _, tab = CliffordSimulator().run(ghz(120), shots=0)
        assert CliffordSimulator.entanglement_entropy(
            tab, list(range(60))) == 1.0
        assert CliffordSimulator.entanglement_entropy(tab, [0]) == 1.0

    def test_product_state_entropy_zero(self):
        c = QuantumCircuit(6)
        c.add_gate(GateInstance("H", [2], [], column=0))
        _, tab = CliffordSimulator().run(c, shots=0)
        assert CliffordSimulator.entanglement_entropy(tab, [0, 2]) == 0.0

    def test_bounds_checked(self):
        _, tab = CliffordSimulator().run(ghz(3), shots=0)
        with pytest.raises(ValueError):
            CliffordSimulator.entanglement_entropy(tab, [5])
        assert CliffordSimulator.entanglement_entropy(tab, []) == 0.0


class TestMonitoredCircuits:
    def test_ghz_mid_measure_collapses_partners(self):
        """Measure(0) after GHZ prep: the collapsed value must equal the
        final sampled values of every partner qubit."""
        c = ghz(3)
        c.add_gate(GateInstance("Measure", [0], [], column=10))
        sim = CliffordSimulator()
        outs, sites, tabs = sim.monitored_trajectories(c, 32, seed=4)
        assert sites == [(10, 0)]
        for t in range(32):
            # after collapse, Z_q is deterministic and matches outcome
            for q in range(3):
                v = CliffordSimulator.expectation_z_string(tabs[t], [q])
                assert v == (1.0 if outs[t, 0] == 0 else -1.0)

    def test_repeated_measure_is_stable(self):
        c = ghz(2)
        c.add_gate(GateInstance("Measure", [1], [], column=5))
        c.add_gate(GateInstance("Measure", [1], [], column=6))
        outs, _, _ = CliffordSimulator().monitored_trajectories(c, 24,
                                                                seed=6)
        np.testing.assert_array_equal(outs[:, 0], outs[:, 1])

    def test_measure_then_entangle_keeps_later_unitaries(self):
        """Collapse then re-entangle: H(0),CNOT(0,1),Measure(0),X(0) —
        Z(0) must now be the flipped outcome."""
        c = QuantumCircuit(2)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
        c.add_gate(GateInstance("Measure", [0], [], column=2))
        c.add_gate(GateInstance("X", [0], [], column=3))
        outs, _, tabs = CliffordSimulator().monitored_trajectories(c, 16,
                                                                   seed=8)
        for t in range(16):
            z0 = CliffordSimulator.expectation_z_string(tabs[t], [0])
            assert z0 == (-1.0 if outs[t, 0] == 0 else 1.0)

    def test_measurement_induced_entropy_suppression(self):
        """Monitored brickwork: heavy measurement keeps the half-cut
        entropy near zero; rare measurement lets it grow — the
        measurement-induced transition's two phases."""
        rng = np.random.default_rng(3)

        def monitored_brickwork(n, depth, p_meas):
            c = QuantumCircuit(n)
            col = 0
            for layer in range(depth):
                for q in range(n):
                    c.add_gate(GateInstance(
                        str(rng.choice(["H", "S", "X"])), [q], [],
                        column=col))
                col += 1
                start = layer % 2
                for q in range(start, n - 1, 2):
                    c.add_gate(GateInstance("CNOT", [q, q + 1], [],
                                            column=col))
                col += 1
                for q in range(n):
                    if rng.random() < p_meas:
                        c.add_gate(GateInstance("Measure", [q], [],
                                                column=col))
                col += 1
            return c

        n, depth, T = 12, 12, 8
        sim = CliffordSimulator()
        entropies = {}
        for p in (0.02, 0.9):
            c = monitored_brickwork(n, depth, p)
            _, _, tabs = sim.monitored_trajectories(c, T, seed=13)
            s = np.mean([CliffordSimulator.entanglement_entropy(
                tab, list(range(n // 2))) for tab in tabs])
            entropies[p] = s
        assert entropies[0.9] < entropies[0.02]
        assert entropies[0.02] > 1.0


class TestAncillaSyndromeExtraction:
    """Real mid-circuit ancilla extraction on the tableau engine must
    reproduce the QEC module's syndrome semantics (qec.BitFlipCode:
    data 0-2, ancilla 3-4, checks Z0Z1 / Z1Z2)."""

    @pytest.mark.parametrize("err", [None, 0, 1, 2])
    @pytest.mark.parametrize("logical", [0, 1])
    def test_syndrome_matches_decode_table(self, err, logical):
        from quantum_simulator_tpu.qec import BitFlipCode
        c = QuantumCircuit(5)
        col = 0
        if logical:
            c.add_gate(GateInstance("X", [0], [], column=col)); col += 1
        c.add_gate(GateInstance("CNOT", [0, 1], [], column=col)); col += 1
        c.add_gate(GateInstance("CNOT", [0, 2], [], column=col)); col += 1
        if err is not None:
            c.add_gate(GateInstance("X", [err], [], column=col)); col += 1
        # parity checks onto ancillas 3 (Z0Z1) and 4 (Z1Z2)
        for data, anc in ((0, 3), (1, 3), (1, 4), (2, 4)):
            c.add_gate(GateInstance("CNOT", [data, anc], [], column=col))
            col += 1
        c.add_gate(GateInstance("Measure", [3], [], column=col)); col += 1
        c.add_gate(GateInstance("Measure", [4], [], column=col)); col += 1

        outs, sites, tabs = CliffordSimulator().monitored_trajectories(
            c, 4, seed=1)
        expected = {None: [0, 0], 0: [1, 0], 1: [1, 1], 2: [0, 1]}[err]
        for t in range(4):
            assert list(outs[t]) == expected
        # decode table agrees with what the extraction produced
        corr = BitFlipCode().decode_syndrome(expected)
        assert corr == ([] if err is None else [("X", err)])
        # applying the correction restores the logical Z value
        if err is not None:
            c.add_gate(GateInstance("X", [err], [], column=col)); col += 1
        _, _, tabs2 = CliffordSimulator().monitored_trajectories(c, 2,
                                                                 seed=2)
        want = 1.0 if logical == 0 else -1.0
        for t in range(2):
            z = CliffordSimulator.expectation_z_string(tabs2[t], [0, 1, 2])
            assert z == want


class TestPauliExpectations:
    def test_matches_statevector_all_two_qubit_paulis(self):
        rng = np.random.default_rng(23)
        paulis = "XYZ"
        for trial in range(3):
            n = 4
            c = random_clifford_circuit(n, 10, rng)
            state = Simulator().run(c, shots=0).final_state
            _, tab = CliffordSimulator().run(c, shots=0)
            import itertools
            for qs in itertools.combinations(range(n), 2):
                for ps in itertools.product(paulis, repeat=2):
                    spec = list(zip(qs, ps))
                    got = CliffordSimulator.expectation_pauli_string(
                        tab, spec)
                    # statevector reference via gate conjugation: rotate
                    # each qubit so the Pauli becomes Z, then Z-parity.
                    rot = c.copy()
                    col = max((g.column for g in c.gates), default=0) + 1
                    for q, p in spec:
                        if p == "X":
                            rot.add_gate(GateInstance("H", [q], [],
                                                      column=col))
                        elif p == "Y":
                            rot.add_gate(GateInstance("S_DAG", [q], [],
                                                      column=col))
                            rot.add_gate(GateInstance("H", [q], [],
                                                      column=col + 1))
                    st = Simulator().run(rot, shots=0).final_state
                    probs = st.probabilities
                    idx = np.arange(2 ** n)
                    par = np.zeros(2 ** n)
                    for q, _ in spec:
                        par += (idx >> (n - 1 - q)) & 1
                    want = float(probs @ (1.0 - 2.0 * (par % 2)))
                    assert got == pytest.approx(want, abs=1e-5), \
                        (trial, spec)

    def test_plus_i_state(self):
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("S", [0], [], column=1))
        _, tab = CliffordSimulator().run(c, shots=0)
        assert CliffordSimulator.expectation_pauli_string(
            tab, [(0, "Y")]) == 1.0
        assert CliffordSimulator.expectation_pauli_string(
            tab, [(0, "X")]) == 0.0


class TestFeedForward:
    def _teleport_circuit(self, prep):
        """Teleport qubit 0's state to qubit 2."""
        c = QuantumCircuit(3)
        col = 0
        for name in prep:
            c.add_gate(GateInstance(name, [0], [], column=col)); col += 1
        c.add_gate(GateInstance("H", [1], [], column=col)); col += 1
        c.add_gate(GateInstance("CNOT", [1, 2], [], column=col)); col += 1
        c.add_gate(GateInstance("CNOT", [0, 1], [], column=col)); col += 1
        c.add_gate(GateInstance("H", [0], [], column=col)); col += 1
        c.add_gate(GateInstance("Measure", [0], [], column=col)); col += 1
        c.add_gate(GateInstance("Measure", [1], [], column=col)); col += 1
        return c

    FF = [(1, "X", 2), (0, "Z", 2)]

    @pytest.mark.parametrize("prep,pauli,want", [
        ([], "Z", 1.0),                 # |0> -> Z=+1
        (["X"], "Z", -1.0),             # |1> -> Z=-1
        (["H"], "X", 1.0),              # |+> -> X=+1
        (["H", "S"], "Y", 1.0),         # |+i> -> Y=+1
    ])
    def test_teleportation_every_basis(self, prep, pauli, want):
        sim = CliffordSimulator()
        c = self._teleport_circuit(prep)
        _, _, tabs = sim.monitored_trajectories(
            c, 16, seed=3, feedforward=self.FF)
        for tab in tabs:
            assert CliffordSimulator.expectation_pauli_string(
                tab, [(2, pauli)]) == want

    def test_without_feedforward_teleportation_fails(self):
        sim = CliffordSimulator()
        c = self._teleport_circuit(["X"])
        _, outs, = None, None
        outcomes, _, tabs = sim.monitored_trajectories(c, 32, seed=4)
        vals = {CliffordSimulator.expectation_pauli_string(t, [(2, "Z")])
                for t in tabs}
        assert vals == {1.0, -1.0}  # outcome-dependent without correction

    def test_entanglement_swapping_chain(self):
        """Repeater chain: Bell pairs (0,1),(2,3),...,(2k,2k+1); Bell
        measurements on middle pairs (1,2),(3,4),... teleport the
        entanglement outward; with feedforward the ends form a perfect
        Bell pair: <X_0 X_end> = <Z_0 Z_end> = +1."""
        n = 10  # 5 Bell pairs, 4 swap stations
        c = QuantumCircuit(n)
        col = 0
        for a in range(0, n, 2):
            c.add_gate(GateInstance("H", [a], [], column=col))
            c.add_gate(GateInstance("CNOT", [a, a + 1], [], column=col + 1))
        col += 2
        ff = []
        mi = 0
        end = n - 1
        for a in range(1, n - 1, 2):   # Bell measure (a, a+1)
            c.add_gate(GateInstance("CNOT", [a, a + 1], [], column=col))
            col += 1
            c.add_gate(GateInstance("H", [a], [], column=col))
            col += 1
            c.add_gate(GateInstance("Measure", [a], [], column=col))
            c.add_gate(GateInstance("Measure", [a + 1], [], column=col))
            col += 1
            ff.append((mi, "Z", end))      # H-side outcome -> Z
            ff.append((mi + 1, "X", end))  # target-side outcome -> X
            mi += 2
        sim = CliffordSimulator()
        _, _, tabs = sim.monitored_trajectories(c, 12, seed=9,
                                                feedforward=ff)
        for tab in tabs:
            assert CliffordSimulator.expectation_pauli_string(
                tab, [(0, "X"), (end, "X")]) == 1.0
            assert CliffordSimulator.expectation_pauli_string(
                tab, [(0, "Z"), (end, "Z")]) == 1.0

    def test_bad_feedforward_rejected(self):
        from quantum_simulator_tpu.clifford import (
            compile_clifford_monitored)
        c = self._teleport_circuit([])
        with pytest.raises(ValueError):
            compile_clifford_monitored(c, [(5, "X", 2)])
        with pytest.raises(ValueError):
            compile_clifford_monitored(c, [(0, "T", 2)])


class TestReviewFixes:
    def test_initial_states_honored(self):
        c = QuantumCircuit(2, initial_states=[1, 0])
        counts, tab = CliffordSimulator().run(c, shots=50, seed=1)
        assert counts == {"10": 50}
        sv = Simulator().run(c, shots=50, seed=1).measurement_counts
        assert sv == counts
        # and through the noisy/monitored paths too
        from quantum_simulator_tpu.noise import NoiseModel, BitFlipNoise
        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(0.0))
        c2 = QuantumCircuit(2, initial_states=[1, 1])
        c2.add_gate(GateInstance("I", [0], [], column=0))
        assert CliffordSimulator().run_with_noise(
            c2, nm, shots=20, seed=2) == {"11": 20}

    def test_unseeded_runs_vary(self):
        sim = CliffordSimulator()
        a, _ = sim.run(ghz(5), shots=400)
        b, _ = sim.run(ghz(5), shots=400)
        assert a != b  # astronomically unlikely to tie if truly random

    def test_run_with_noise_amplitude_cap(self):
        from quantum_simulator_tpu.noise import NoiseModel, BitFlipNoise
        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(0.1))
        wide = ghz(40)
        with pytest.raises(ValueError, match="amplitude"):
            Simulator(noise_model=nm).run_with_noise(wide, shots=4)
        with pytest.raises(ValueError, match="amplitude"):
            Simulator(noise_model=nm).trajectory_states(wide, 2)

    def test_apply_gate_and_scan_engine_share_algebra(self):
        """_apply_gate wraps the same branch functions the compiled
        path switches over — spot-check equality on a composite."""
        from quantum_simulator_tpu.clifford import (_apply_gate,
                                                    identity_tableau)
        tab = identity_tableau(3)
        for name, qs in (("H", [0]), ("S", [1]), ("CNOT", [0, 2]),
                         ("CZ", [1, 2]), ("SWAP", [0, 1]), ("Y", [2])):
            tab = _apply_gate(tab, name, qs)
        c = QuantumCircuit(3)
        for col, (name, qs) in enumerate((("H", [0]), ("S", [1]),
                                          ("CNOT", [0, 2]), ("CZ", [1, 2]),
                                          ("SWAP", [0, 1]), ("Y", [2]))):
            c.add_gate(GateInstance(name, qs, [], column=col))
        _, tab2 = CliffordSimulator().run(c, shots=0)
        np.testing.assert_array_equal(np.asarray(tab.x), np.asarray(tab2.x))
        np.testing.assert_array_equal(np.asarray(tab.z), np.asarray(tab2.z))
        np.testing.assert_array_equal(np.asarray(tab.r), np.asarray(tab2.r))
