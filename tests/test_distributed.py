"""Sharded statevector on the virtual 8-device CPU mesh: the distributed
forward pass must match the single-device engine exactly, for circuits
hitting every qubit class (global, local, mixed, multi-global)."""

import jax
import numpy as np
import pytest

from quantum_simulator_tpu import GateInstance, QuantumCircuit, Simulator
from quantum_simulator_tpu.algorithms import AlgorithmTemplate
from quantum_simulator_tpu.parallel import (
    DistributedSimulator,
    make_mesh,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def assert_matches_single_device(circuit, n_devices=8, atol=1e-5):
    dist = DistributedSimulator(n_devices=n_devices)
    state = dist.run(circuit)
    expected = Simulator().run(circuit, shots=0).final_state.data
    np.testing.assert_allclose(state.data, expected, atol=atol)
    assert state.norm() == pytest.approx(1.0, abs=1e-5)
    return state


class TestShardedForward:
    def test_local_qubit_gates_only(self):
        # 6 qubits on 8 devices: qubits 0-2 global, 3-5 local
        c = QuantumCircuit(6)
        c.add_gate(GateInstance("H", [3], [], column=0))
        c.add_gate(GateInstance("X", [4], [], column=0))
        c.add_gate(GateInstance("CNOT", [3, 5], [], column=1))
        assert_matches_single_device(c)

    def test_global_qubit_single_gates(self):
        c = QuantumCircuit(6)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("Ry", [1], [0.7], column=0))
        c.add_gate(GateInstance("Z", [2], [], column=1))
        assert_matches_single_device(c)

    def test_global_local_two_qubit_gate(self):
        c = QuantumCircuit(6)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 5], [], column=1))
        assert_matches_single_device(c)

    def test_both_targets_global(self):
        c = QuantumCircuit(6)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
        c.add_gate(GateInstance("CZ", [1, 2], [], column=2))
        c.add_gate(GateInstance("SWAP", [0, 2], [], column=3))
        assert_matches_single_device(c)

    def test_ghz_chain_across_shards(self):
        c = QuantumCircuit(6)
        c.add_gate(GateInstance("H", [0], [], column=0))
        for i in range(1, 6):
            c.add_gate(GateInstance("CNOT", [0, i], [], column=i))
        state = assert_matches_single_device(c)
        probs = state.probabilities
        assert probs[0] == pytest.approx(0.5, abs=1e-5)
        assert probs[-1] == pytest.approx(0.5, abs=1e-5)

    def test_toffoli_spanning_global_and_local(self):
        c = QuantumCircuit(6, initial_states=[1, 1, 0, 0, 0, 0])
        c.add_gate(GateInstance("Toffoli", [0, 1, 4], [], column=0))
        state = assert_matches_single_device(c)
        # |110010...> : qubits 0,1,4 set
        idx = (1 << 5) | (1 << 4) | (1 << 1)
        assert state.probabilities[idx] == pytest.approx(1.0, abs=1e-5)

    def test_random_circuit_deep(self, rng):
        c = QuantumCircuit(6)
        names1q = ["H", "X", "Y", "Z", "S", "T"]
        for col in range(12):
            q = int(rng.integers(6))
            c.add_gate(GateInstance(names1q[col % 6], [q], [], column=col))
            q2, q3 = rng.choice(6, size=2, replace=False)
            c.add_gate(GateInstance("CNOT", [int(q2), int(q3)], [],
                                    column=col))
        assert_matches_single_device(c)

    def test_parameterized_circuit(self):
        c = QuantumCircuit(5)
        for q in range(5):
            c.add_gate(GateInstance("Ry", [q], [0.3 * (q + 1)], column=0))
        for q in range(4):
            c.add_gate(GateInstance("CNOT", [q, q + 1], [], column=q + 1))
        assert_matches_single_device(c)

    def test_qft_across_shards(self):
        c = AlgorithmTemplate.quantum_fourier_transform(5)
        c.initial_states = [1, 0, 1, 1, 0]
        assert_matches_single_device(c)

    def test_nontrivial_initial_state_on_global_qubits(self):
        c = QuantumCircuit(5, initial_states=[1, 1, 0, 1, 0])
        c.add_gate(GateInstance("H", [2], [], column=0))
        assert_matches_single_device(c)

    def test_mesh_sizes(self):
        c = QuantumCircuit(5)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 4], [], column=1))
        for d in (2, 4, 8):
            assert_matches_single_device(c, n_devices=d)

    def test_sampling_from_sharded_state(self):
        c = QuantumCircuit(4)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 3], [], column=1))
        dist = DistributedSimulator(n_devices=4)
        state = dist.run(c)
        counts = dist.sample(state, 2000, np.random.default_rng(42))
        assert sum(counts.values()) == 2000
        assert set(counts) == {"0000", "1001"}


class TestNoSwapDiagonals:
    """Product-form diagonals with global targets apply as per-shard
    scalar x local mask, with no ppermute — including MCZ wider than the
    shard (impossible to localize)."""

    def test_cz_and_cphase_on_global_qubits(self):
        c = QuantumCircuit(6)
        for q in range(6):
            c.add_gate(GateInstance("H", [q], [], column=0))
        c.add_gate(GateInstance("CZ", [0, 4], [], column=1))     # g+l
        c.add_gate(GateInstance("CZ", [1, 2], [], column=2))     # g+g
        c.add_gate(GateInstance("CPhase", [0, 5], [0.9], column=3))
        c.add_gate(GateInstance("Ry", [4], [0.4], column=4))
        assert_matches_single_device(c)

    def test_mcz_wider_than_shard(self):
        # 6 qubits over 8 devices: only 3 local qubits, but MCZ6 spans
        # all 6 — no localization exists; the no-swap path is required.
        c = QuantumCircuit(6)
        for q in range(6):
            c.add_gate(GateInstance("H", [q], [], column=0))
        c.add_gate(GateInstance("MCZ6", list(range(6)), [], column=1))
        for q in range(6):
            c.add_gate(GateInstance("Ry", [q], [0.2 + 0.1 * q], column=2))
        assert_matches_single_device(c)

    def test_matrixless_wide_mcz_sharded(self):
        # k=12 > the dense cap: matrix-less op through the sharded engine
        # (grouped shard body: 15 local qubits on 8 devices at n=18).
        n = 18
        c = QuantumCircuit(n)
        for q in range(n):
            c.add_gate(GateInstance("H", [q], [], column=0))
        c.add_gate(GateInstance("MCZ12", list(range(12)), [], column=1))
        c.add_gate(GateInstance("CNOT", [0, 17], [], column=2))
        assert_matches_single_device(c, atol=2e-5)

    def test_grover_iteration_sharded(self):
        # One Grover iteration at n=10 with full-width MCZ10 on the mesh
        # (7 local qubits, MCZ spans global+local) vs single device.
        n = 10
        c = QuantumCircuit(n)
        col = 0
        for q in range(n):
            c.add_gate(GateInstance("H", [q], [], column=col))
        col += 1
        c.add_gate(GateInstance(f"MCZ{n}", list(range(n)), [], column=col))
        col += 1
        for q in range(n):
            c.add_gate(GateInstance("H", [q], [], column=col))
            c.add_gate(GateInstance("X", [q], [], column=col + 1))
        col += 2
        c.add_gate(GateInstance(f"MCZ{n}", list(range(n)), [], column=col))
        col += 1
        for q in range(n):
            c.add_gate(GateInstance("X", [q], [], column=col))
            c.add_gate(GateInstance("H", [q], [], column=col + 1))
        assert_matches_single_device(c)

    def test_1q_diagonals_on_global_qubits(self):
        # Rz/Phase/Z/S/T on device-index qubits: per-shard scalar, no
        # exchanges.
        c = QuantumCircuit(6)
        for q in range(6):
            c.add_gate(GateInstance("H", [q], [], column=0))
        c.add_gate(GateInstance("Rz", [0], [0.63], column=1))
        c.add_gate(GateInstance("Phase", [1], [1.1], column=1))
        c.add_gate(GateInstance("Z", [2], [], column=1))
        c.add_gate(GateInstance("T", [0], [], column=2))
        c.add_gate(GateInstance("S", [1], [], column=2))
        c.add_gate(GateInstance("Ry", [4], [0.3], column=3))
        assert_matches_single_device(c)

    def test_diag_only_circuit_schedules_zero_swaps(self):
        # A circuit whose every cross-boundary gate is diagonal compiles
        # to a schedule with NO ppermute swaps at all.
        from quantum_simulator_tpu.ops import program as prog
        from quantum_simulator_tpu.parallel.distributed import (
            _build_schedule,
            _is_noswap_1q_diag,
            _is_noswap_diag,
        )

        c = QuantumCircuit(6, initial_states=[1, 1, 0, 0, 0, 0])
        for q in (3, 4, 5):   # non-diagonal gates stay on local qubits
            c.add_gate(GateInstance("H", [q], [], column=0))
        c.add_gate(GateInstance("Rz", [0], [0.5], column=1))
        c.add_gate(GateInstance("CPhase", [1, 4], [0.7], column=2))
        c.add_gate(GateInstance("CZ", [2, 0], [], column=3))
        c.add_gate(GateInstance("MCZ3", [0, 1, 5], [], column=4))
        p = prog.compile_circuit(c)
        noswap = {oi for oi, op in enumerate(p.ops)
                  if _is_noswap_diag(op) or _is_noswap_1q_diag(op)}
        sched = _build_schedule(p, 3, noswap)
        assert not any(item[0] == "swap" for item in sched)
        kinds = {item[0] for item in sched}
        assert "cphase" in kinds and "gdiag1" in kinds
        assert_matches_single_device(c)

    def test_noisy_trajectory_keeps_swaps_for_noisy_diag(self):
        # CZ with attached noise must NOT take the no-swap path (Kraus
        # needs locality); trajectory matches the single-device one.
        import jax.numpy as jnp
        from quantum_simulator_tpu.noise import DepolarizingNoise, NoiseModel
        from quantum_simulator_tpu.ops import program as prog
        from quantum_simulator_tpu.parallel.distributed import (
            make_mesh,
            sharded_trajectory_fn,
        )

        from quantum_simulator_tpu.parallel.distributed import (
            _build_schedule,
            _is_noswap_1q_diag,
            _is_noswap_diag,
        )

        c = QuantumCircuit(6)
        for q in range(6):
            c.add_gate(GateInstance("H", [q], [], column=0))
        c.add_gate(GateInstance("CZ", [0, 5], [], column=1))
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.1))
        p = prog.compile_circuit(c)
        # The noisy body's noswap filter must EXCLUDE the CZ (it has
        # noise attached) -> the schedule localizes it with a swap.
        noswap = {oi for oi, op in enumerate(p.ops)
                  if (_is_noswap_diag(op) or _is_noswap_1q_diag(op))
                  and not nm.kraus_stacks_for_gate(op.gate_name)}
        sched = _build_schedule(p, 3, noswap)
        assert any(item[0] == "swap" for item in sched)
        assert not any(item[0] == "cphase" for item in sched)
        mesh = make_mesh(8)
        fn = sharded_trajectory_fn(p, nm, mesh)
        out = np.asarray(fn(jnp.asarray(p.initial_params),
                            jax.random.PRNGKey(2)))
        total = float(np.sum(np.abs(out) ** 2))
        assert total == pytest.approx(1.0, abs=1e-4)
        # Same trajectory as the single-device group executor with the
        # same key (identical draw sequence through psum'd norms).
        from quantum_simulator_tpu.ops.plan import group_trajectory_body

        expected = np.asarray(group_trajectory_body(
            p, nm, jnp.asarray(p.initial_params), jax.random.PRNGKey(2)))
        np.testing.assert_allclose(out, expected, atol=2e-5)


class TestGradThroughCollectives:
    def test_autodiff_through_sharded_forward(self):
        """VQE gradient must flow through ppermute collectives."""
        import jax.numpy as jnp
        from quantum_simulator_tpu.ops import program as prog
        from quantum_simulator_tpu.parallel import sharded_forward_fn

        c = QuantumCircuit(5)
        c.add_gate(GateInstance("Ry", [0], [0.4], column=0))  # global qubit
        c.add_gate(GateInstance("CNOT", [0, 4], [], column=1))
        program = prog.compile_circuit(c)
        mesh = make_mesh(8)
        fwd = sharded_forward_fn(program, mesh)

        def cost(params):
            psi = fwd(params)
            # <Z_0>: parity of the MSB
            probs = jnp.abs(psi) ** 2
            signs = 1.0 - 2.0 * (jnp.arange(32) >= 16)
            return jnp.sum(probs * signs)

        g = jax.grad(cost)(jnp.asarray(program.initial_params))
        # <Z0> = cos(theta) -> d/dtheta = -sin(theta)
        assert float(g[0]) == pytest.approx(-np.sin(0.4), abs=1e-4)


class TestShardedNoise:
    def test_noisy_trajectory_norm_and_mixing(self):
        from quantum_simulator_tpu import DepolarizingNoise, NoiseModel

        c = QuantumCircuit(5)
        c.add_gate(GateInstance("H", [0], [], column=0))
        for i in range(1, 5):
            c.add_gate(GateInstance("CNOT", [0, i], [], column=i))
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.3))
        dist = DistributedSimulator(n_devices=4)
        ideal = dist.run(c)
        noisy = dist.run_noisy_trajectory(c, nm, seed=7)
        assert noisy.norm() == pytest.approx(1.0, abs=1e-4)
        # with p=0.3 over 9 channel applications, fidelity should drop
        fid = dist.fidelity(ideal, noisy)
        assert fid < 0.999

    def test_noisy_trajectory_zero_noise_matches_ideal(self):
        from quantum_simulator_tpu import DepolarizingNoise, NoiseModel

        c = QuantumCircuit(5)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 4], [], column=1))
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.0))
        dist = DistributedSimulator(n_devices=4)
        ideal = dist.run(c)
        noisy = dist.run_noisy_trajectory(c, nm, seed=1)
        assert dist.fidelity(ideal, noisy) == pytest.approx(1.0, abs=1e-4)

    def test_trajectory_statistics_match_single_device(self):
        """Mean fidelity across sharded trajectories ~ the single-device
        batched path (same physics, different RNG streams)."""
        from quantum_simulator_tpu import (
            BitFlipNoise,
            NoiseModel,
            Simulator,
        )
        import jax.numpy as jnp

        c = QuantumCircuit(4)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("CNOT", [0, 3], [], column=1))
        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(0.2))

        dist = DistributedSimulator(n_devices=4)
        ideal = dist.run(c)
        # 80 samples: per-trajectory fidelity is near-bimodal under
        # bit-flip noise (std ~0.45), so 25 samples left ~2.3-sigma flake
        # room against the 0.15 tolerance
        fids_sharded = [
            dist.fidelity(ideal, dist.run_noisy_trajectory(c, nm, seed=s))
            for s in range(80)
        ]

        sim = Simulator(noise_model=nm)
        states = sim.trajectory_states(c, 200, seed=0)
        ideal_dev = Simulator().run(c, shots=0).final_state.device_data
        overlaps = jnp.einsum("d,td->t", jnp.conj(ideal_dev), states)
        fids_single = np.asarray(jnp.abs(overlaps) ** 2)

        assert np.mean(fids_sharded) == pytest.approx(
            float(fids_single.mean()), abs=0.15)

    def test_expectation_z_sharded(self):
        c = QuantumCircuit(4, initial_states=[1, 0, 0, 0])
        c.add_gate(GateInstance("I", [0], [], column=0))
        dist = DistributedSimulator(n_devices=4)
        state = dist.run(c)
        assert dist.expectation_z(state, 0) == pytest.approx(-1.0, abs=1e-5)
        assert dist.expectation_z(state, 1) == pytest.approx(1.0, abs=1e-5)


class TestShardedPauliString:
    def test_matches_dense_gate_trick(self):
        # Strings with X/Y on DEVICE-index qubits (ppermute partner
        # exchange), local qubits, and both mixed — vs the dense engine.
        from quantum_simulator_tpu.analysis import StateAnalysis
        from quantum_simulator_tpu.models import brickwork_circuit
        from quantum_simulator_tpu.ops import program as prog_mod
        from quantum_simulator_tpu.state import StateVector

        c = brickwork_circuit(10, 4, seed=13)
        # complex amplitudes so Im parts are exercised
        from quantum_simulator_tpu.circuit import GateInstance

        col = max(g.column for g in c.gates) + 1
        for q in range(0, 10, 3):
            c.add_gate(GateInstance("T", [q], [], column=col))
        sim = DistributedSimulator(n_devices=8)
        st = sim.run(c)
        import jax.numpy as jnp

        p = prog_mod.compile_circuit(c)
        dense = StateVector.from_device_array(
            prog_mod.forward_fn(p)(jnp.asarray(p.initial_params)), 10)
        strings = [
            ([0], "X"), ([1], "Y"), ([2], "Z"),          # device bits
            ([7], "X"), ([8], "Y"),                      # local bits
            ([0, 9], "XX"), ([0, 9], "YY"), ([1, 5], "YX"),
            ([0, 1, 2], "XYZ"), ([2, 6, 9], "ZXY"),
            ([0, 4, 9], "ZZZ"), ([0, 3, 5, 8], "XYXY"),
        ]
        for qs, ps in strings:
            got = sim.expectation_pauli_string(st, qs, ps)
            want = StateAnalysis.pauli_string_expectation(dense, qs, ps)
            np.testing.assert_allclose(got, want, atol=2e-5,
                                       err_msg=f"{qs} {ps}")
        assert sim.expectation_pauli_string(st, [], "") == 1.0
        # Z-only agrees with expectation_z
        np.testing.assert_allclose(
            sim.expectation_pauli_string(st, [4], "Z"),
            sim.expectation_z(st, 4), atol=1e-6)


class TestBasisSampling:
    """sample_with_basis: reference X/Y measurement semantics
    (measurement.py:91-98) on the sharded engine."""

    def _ghz(self, n=6):
        c = QuantumCircuit(n)
        c.add_gate(GateInstance("H", [0], [], column=0))
        for q in range(n - 1):
            c.add_gate(GateInstance("CNOT", [q, q + 1], [], column=q + 1))
        return c

    def test_rotated_probabilities_match_dense(self):
        from quantum_simulator_tpu.measurement import (
            MeasurementBasis,
            rotate_to_basis,
        )
        from quantum_simulator_tpu.parallel.distributed import (
            with_basis_rotation,
        )

        rng = np.random.default_rng(11)
        c = QuantumCircuit(6)
        for col in range(3):
            for q in range(6):
                c.add_gate(GateInstance("Ry", [q],
                                        [float(rng.uniform(0, 6.28))],
                                        column=2 * col))
            for q in range(col % 2, 5, 2):
                c.add_gate(GateInstance("CNOT", [q, q + 1], [],
                                        column=2 * col + 1))
        dist = DistributedSimulator(n_devices=8)
        for basis in (MeasurementBasis.X, MeasurementBasis.Y):
            sharded = dist.run(with_basis_rotation(c, basis))
            dense = rotate_to_basis(
                Simulator().run(c, shots=0).final_state, basis)
            np.testing.assert_allclose(
                np.abs(sharded.data) ** 2, dense.probabilities, atol=1e-5)

    def test_ghz_x_basis_even_parity_only(self):
        # H^n (|0..0> + |1..1>)/sqrt(2) has support only on even-parity
        # bitstrings — a physics invariant of the X-basis GHZ measurement.
        dist = DistributedSimulator(n_devices=8)
        counts = dist.sample_with_basis(
            self._ghz(), 2000, basis="X",
            rng=np.random.default_rng(5))
        assert sum(counts.values()) == 2000
        for bits in counts:
            assert bits.count("1") % 2 == 0, bits

    def test_z_basis_is_passthrough_and_deterministic(self):
        from quantum_simulator_tpu.parallel.distributed import (
            with_basis_rotation,
        )

        c = self._ghz()
        assert with_basis_rotation(c, "Z") is c
        dist = DistributedSimulator(n_devices=8)
        a = dist.sample_with_basis(c, 500, rng=np.random.default_rng(9))
        b = dist.sample_with_basis(c, 500, rng=np.random.default_rng(9))
        assert a == b
        assert set(a) <= {"000000", "111111"}

    def test_shot_mode_readout_error(self):
        from quantum_simulator_tpu.noise import ReadoutError

        dist = DistributedSimulator(n_devices=8)
        c = QuantumCircuit(6)  # |000000>
        counts = dist.sample_with_basis(
            c, 4000, basis="Z", rng=np.random.default_rng(1),
            readout_error=ReadoutError(p01=0.2, p10=0.0))
        assert sum(counts.values()) == 4000
        # ~20% of bits flip 0->1: the all-zeros string no longer dominates
        frac_zero = counts.get("000000", 0) / 4000
        assert 0.15 < frac_zero < 0.4   # (1-0.2)^6 ~ 0.26

    def test_unknown_basis_raises(self):
        from quantum_simulator_tpu.parallel.distributed import (
            with_basis_rotation,
        )

        with pytest.raises(ValueError, match="basis"):
            with_basis_rotation(self._ghz(), "W")


class TestSegmentedExecution:
    """run_segmented / sharded_apply_fn: segment-wise deep-circuit
    execution must be bit-identical to the one-program forward, with
    structurally identical segments sharing ONE compiled apply-fn."""

    def _brickwork(self, n, depth, seed):
        rng = np.random.default_rng(seed)
        c = QuantumCircuit(n)
        for col in range(depth):
            if col % 2 == 0:
                for q in range(n):
                    c.add_gate(GateInstance(
                        "Ry", [q], [float(rng.uniform(0, 6.28))],
                        column=col))
            else:
                for q in range((col // 2) % 2, n - 1, 2):
                    c.add_gate(GateInstance("CNOT", [q, q + 1], [],
                                            column=col))
        return c

    def test_segmented_matches_whole(self):
        sim = DistributedSimulator(n_devices=8)
        c = self._brickwork(9, 12, 3)
        whole = sim.run(c)
        calls = []
        seg = sim.run_segmented(c, 4,
                                progress=lambda i, ns, w: calls.append(i))
        np.testing.assert_array_equal(whole.data, seg.data)
        assert calls == [0, 1, 2]

    def test_nonzero_initial_state_and_ragged_tail(self):
        sim = DistributedSimulator(n_devices=8)
        c = self._brickwork(8, 7, 5)
        c.initial_states = [1, 0, 1, 0, 0, 1, 0, 1]
        np.testing.assert_array_equal(sim.run(c).data,
                                      sim.run_segmented(c, 3).data)

    def test_single_segment_covers_everything(self):
        sim = DistributedSimulator(n_devices=8)
        c = self._brickwork(8, 5, 7)
        np.testing.assert_array_equal(sim.run(c).data,
                                      sim.run_segmented(c, 99).data)

    def test_apply_fn_resumes_mid_circuit(self):
        # sharded_apply_fn applied to a |+...+> state, not |0>: the
        # primitive really is state-in/state-out re-entry.
        from quantum_simulator_tpu.ops import program as prog
        from quantum_simulator_tpu.parallel.distributed import (
            sharded_apply_fn,
        )

        import jax.numpy as jnp

        sim = DistributedSimulator(n_devices=8)
        pre = QuantumCircuit(8)
        for q in range(8):
            pre.add_gate(GateInstance("H", [q], [], column=0))
        post = self._brickwork(8, 4, 11)
        state = sim.run(pre).device_data
        program = prog.compile_circuit(post)
        fn = sharded_apply_fn(program, sim.mesh)
        out = fn(state, jnp.asarray(program.initial_params))

        both = QuantumCircuit(8)
        for q in range(8):
            both.add_gate(GateInstance("H", [q], [], column=0))
        for g in sorted(post.gates, key=lambda x: x.column):
            both.add_gate(GateInstance(g.gate_name,
                                       list(g.target_qubits),
                                       list(g.params),
                                       column=g.column + 1))
        expected = Simulator().run(both, shots=0).final_state.data
        from quantum_simulator_tpu.utils.xfer import to_host_complex
        np.testing.assert_allclose(to_host_complex(out), expected,
                                   atol=1e-5)

    def test_invalid_segment_size_raises(self):
        sim = DistributedSimulator(n_devices=8)
        with pytest.raises(ValueError, match="segment_columns"):
            sim.run_segmented(self._brickwork(8, 4, 1), 0)


class TestSegmentedCheckpointing:
    """parallel/checkpoint: per-shard split-plane persistence + resume."""

    def _brickwork(self, n, depth, seed):
        rng = np.random.default_rng(seed)
        c = QuantumCircuit(n)
        for col in range(depth):
            if col % 2 == 0:
                for q in range(n):
                    c.add_gate(GateInstance(
                        "Ry", [q], [float(rng.uniform(0, 6.28))],
                        column=col))
            else:
                for q in range((col // 2) % 2, n - 1, 2):
                    c.add_gate(GateInstance("CNOT", [q, q + 1], [],
                                            column=col))
        return c

    def test_save_load_roundtrip(self, tmp_path):
        from quantum_simulator_tpu.parallel import checkpoint as ckpt

        sim = DistributedSimulator(n_devices=8)
        state = sim.run(self._brickwork(8, 4, 1))
        ckpt.save_sharded_state(state.device_data, str(tmp_path / "s"),
                                meta={"tag": 7})
        loaded = ckpt.load_sharded_state(str(tmp_path / "s"), sim.mesh)
        np.testing.assert_array_equal(np.asarray(jax.device_get(loaded)),
                                      np.asarray(
                                          jax.device_get(
                                              state.device_data)))
        assert ckpt.load_manifest(str(tmp_path / "s"))["meta"]["tag"] == 7

    def test_mesh_size_mismatch_raises(self, tmp_path):
        from quantum_simulator_tpu.parallel import checkpoint as ckpt
        from quantum_simulator_tpu.parallel.distributed import make_mesh

        sim = DistributedSimulator(n_devices=8)
        state = sim.run(self._brickwork(8, 2, 1))
        ckpt.save_sharded_state(state.device_data, str(tmp_path / "s"))
        with pytest.raises(ValueError, match="reshard"):
            ckpt.load_sharded_state(str(tmp_path / "s"), make_mesh(4))

    def test_crash_resume_skips_completed_segments(self, tmp_path):
        sim = DistributedSimulator(n_devices=8)
        c = self._brickwork(9, 12, 3)
        whole = sim.run(c)

        class Boom(Exception):
            pass

        def killer(i, ns, w):
            if i == 1:
                raise Boom()

        with pytest.raises(Boom):
            sim.run_segmented(c, 4, progress=killer,
                              checkpoint_dir=str(tmp_path))
        done = []
        out = sim.run_segmented(c, 4,
                                progress=lambda i, ns, w: done.append(i),
                                checkpoint_dir=str(tmp_path))
        assert done == [1, 2]   # segment 0 came from the checkpoint
        np.testing.assert_array_equal(whole.data, out.data)

    def test_changed_circuit_restarts_from_scratch(self, tmp_path):
        sim = DistributedSimulator(n_devices=8)
        sim.run_segmented(self._brickwork(9, 8, 3), 4,
                          checkpoint_dir=str(tmp_path))
        c2 = self._brickwork(9, 8, 99)   # same structure, new params
        done = []
        out = sim.run_segmented(c2, 4,
                                progress=lambda i, ns, w: done.append(i),
                                checkpoint_dir=str(tmp_path))
        assert done == [0, 1]   # circuit_hash mismatch -> full rerun
        np.testing.assert_array_equal(sim.run(c2).data, out.data)

    def test_old_checkpoints_pruned(self, tmp_path):
        import os

        sim = DistributedSimulator(n_devices=8)
        sim.run_segmented(self._brickwork(8, 12, 5), 4,
                          checkpoint_dir=str(tmp_path))
        segs = [d for d in os.listdir(tmp_path) if d.startswith("seg_")]
        assert segs == ["seg_2"]


class TestDistributedRunWithNoise:
    """Mesh run_with_noise: the Monte-Carlo trajectory estimator at
    mesh scale (one compiled sharded trajectory program, fresh keys)."""

    def _circuit(self, n=6):
        c = QuantumCircuit(n)
        c.add_gate(GateInstance("H", [0], [], column=0))
        for q in range(n - 1):
            c.add_gate(GateInstance("CNOT", [q, q + 1], [], column=q + 1))
        return c

    def test_distribution_matches_exact_density_matrix(self):
        from quantum_simulator_tpu import DepolarizingNoise, NoiseModel
        from quantum_simulator_tpu.density import DensityMatrixSimulator

        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.08))
        c = self._circuit(6)
        shots, T = 9600, 192
        exact = DensityMatrixSimulator(noise_model=nm).run(c).probabilities
        dist = DistributedSimulator(n_devices=8)
        mesh_counts = dist.run_with_noise(c, nm, shots, trajectories=T,
                                          seed=3)
        assert sum(mesh_counts.values()) == shots
        emp = np.zeros(1 << 6)
        for bits, cnt in mesh_counts.items():
            emp[int(bits, 2)] = cnt / shots
        # Monte-Carlo trajectory estimator noise is O(1/sqrt(T)) ~ 0.07;
        # measured 0.099 at this seed (single-chip T=96 shows 0.080 —
        # same estimator class, same scale)
        tvd = 0.5 * np.sum(np.abs(emp - exact))
        assert tvd < 0.15, tvd
        # GHZ + depolarizing keeps the two GHZ strings dominant
        top = sorted(mesh_counts, key=mesh_counts.get, reverse=True)[:2]
        assert set(top) == {"000000", "111111"}

    def test_seed_determinism(self):
        from quantum_simulator_tpu import BitFlipNoise, NoiseModel

        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(0.05))
        c = self._circuit(6)
        dist = DistributedSimulator(n_devices=8)
        a = dist.run_with_noise(c, nm, 400, trajectories=8, seed=11)
        b = dist.run_with_noise(c, nm, 400, trajectories=8, seed=11)
        assert a == b
        assert sum(a.values()) == 400

    def test_noiseless_model_is_plain_sampling(self):
        from quantum_simulator_tpu import NoiseModel

        c = self._circuit(6)
        dist = DistributedSimulator(n_devices=8)
        counts = dist.run_with_noise(c, NoiseModel(), 500, seed=2)
        assert set(counts) <= {"000000", "111111"}
        assert sum(counts.values()) == 500

    def test_trajectories_capped_by_shots(self):
        from quantum_simulator_tpu import DepolarizingNoise, NoiseModel

        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.02))
        dist = DistributedSimulator(n_devices=8)
        counts = dist.run_with_noise(self._circuit(6), nm, 5,
                                     trajectories=64, seed=1)
        assert sum(counts.values()) == 5


class TestQubitDensityMatrices:
    """One-program per-qubit reduced rho on the mesh (local qubits pair
    in-shard, device-bit qubits across one ppermute each)."""

    def _random_circuit(self, n=6, seed=4):
        rng = np.random.default_rng(seed)
        c = QuantumCircuit(n)
        for col in range(4):
            for q in range(n):
                c.add_gate(GateInstance(
                    "Ry", [q], [float(rng.uniform(0, 6.28))],
                    column=2 * col))
                c.add_gate(GateInstance(
                    "Rz", [q], [float(rng.uniform(0, 6.28))],
                    column=2 * col))
            for q in range(col % 2, n - 1, 2):
                c.add_gate(GateInstance("CNOT", [q, q + 1], [],
                                        column=2 * col + 1))
        return c

    def test_matches_dense_partial_trace(self):
        from quantum_simulator_tpu.analysis import StateAnalysis

        c = self._random_circuit()
        dist = DistributedSimulator(n_devices=8)
        rhos = dist.qubit_density_matrices(dist.run(c))
        dense = Simulator().run(c, shots=0).final_state
        for q in range(6):
            np.testing.assert_allclose(
                rhos[q], StateAnalysis.partial_trace(dense, [q]),
                atol=1e-5)
            assert np.trace(rhos[q]).real == pytest.approx(1.0, abs=1e-5)
            np.testing.assert_allclose(rhos[q], rhos[q].conj().T,
                                       atol=1e-6)

    def test_ensemble_matches_single_chip_estimator(self):
        from quantum_simulator_tpu import BitFlipNoise, NoiseModel

        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(0.05))
        c = self._random_circuit()
        dist = DistributedSimulator(n_devices=8)
        mesh = dist.ensemble_qubit_density_matrices(c, nm, n_trials=60,
                                                    seed=5)
        chip = Simulator(noise_model=nm).ensemble_qubit_density_matrices(
            c, n_trials=60, seed=5)
        # independent 60-trial Monte-Carlo estimates of the same
        # ensemble: O(1/sqrt(60)) apart (measured 0.087 at these seeds)
        assert float(np.max(np.abs(mesh - chip))) < 0.15
        for q in range(6):
            assert np.trace(mesh[q]).real == pytest.approx(1.0, abs=1e-4)

    def test_noiseless_ensemble_is_pure_reduction(self):
        from quantum_simulator_tpu import NoiseModel

        c = self._random_circuit(seed=9)
        dist = DistributedSimulator(n_devices=8)
        ens = dist.ensemble_qubit_density_matrices(c, NoiseModel(),
                                                   n_trials=10, seed=0)
        pure = dist.qubit_density_matrices(dist.run(c))
        np.testing.assert_allclose(ens, pure, atol=1e-6)
