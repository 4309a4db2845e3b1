"""Exact density-matrix simulator (density.py) — deterministic noisy
evolution, validated against the pure-state engine and the Monte-Carlo
ensemble path."""

import numpy as np
import pytest

from quantum_simulator_tpu import (
    DensityMatrixSimulator,
    GateInstance,
    QuantumCircuit,
    Simulator,
)
from quantum_simulator_tpu.noise import (
    AmplitudeDampingNoise,
    BitFlipNoise,
    DepolarizingNoise,
    NoiseModel,
    ReadoutError,
)


def bell():
    c = QuantumCircuit(2)
    c.add_gate(GateInstance("H", [0], [], column=0))
    c.add_gate(GateInstance("CNOT", [0, 1], [], column=1))
    return c


class TestNoiseless:
    def test_pure_state_projector(self):
        res = DensityMatrixSimulator().run(bell())
        psi = Simulator().run(bell(), shots=0).final_state.data
        np.testing.assert_allclose(res.rho, np.outer(psi, psi.conj()),
                                   atol=1e-6)
        assert res.purity() == pytest.approx(1.0, abs=1e-5)
        assert res.trace() == pytest.approx(1.0, abs=1e-6)

    def test_expectation_z(self):
        c = QuantumCircuit(3)
        c.add_gate(GateInstance("X", [1], [], column=0))
        res = DensityMatrixSimulator().run(c)
        assert res.expectation_z(0) == pytest.approx(1.0, abs=1e-6)
        assert res.expectation_z(1) == pytest.approx(-1.0, abs=1e-6)


    def test_matrixless_wide_mcz(self):
        # MCZ12 carries no dense matrix (k > 10): the DM body applies it
        # as d_i * conj(d_j) elementwise; matches the pure-state engine.
        n = 12
        c = QuantumCircuit(n)
        for q in range(n):
            c.add_gate(GateInstance("H", [q], [], column=0))
        c.add_gate(GateInstance("MCZ12", list(range(n)), [], column=1))
        for q in range(0, n - 1, 2):
            c.add_gate(GateInstance("CNOT", [q, q + 1], [], column=2))
        res = DensityMatrixSimulator().run(c)
        psi = Simulator().run(c, shots=0).final_state.data
        np.testing.assert_allclose(res.rho, np.outer(psi, psi.conj()),
                                   atol=1e-6)


class TestChannels:
    def test_full_depolarizing_single_qubit(self):
        """p=1 depolarizing on one qubit leaves rho_q = I/2 exactly."""
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("H", [0], [], column=0))
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(1.0))
        res = DensityMatrixSimulator(noise_model=nm).run(c)
        # depolarizing p: rho -> (1-2p/3... exact channel algebra) — at
        # p=1 with Kraus {sqrt(1-p)I, sqrt(p/3)X/Y/Z} the Bloch vector
        # shrinks by |1-4p/3| = 1/3; probabilities stay 1/2 each.
        np.testing.assert_allclose(res.probabilities, [0.5, 0.5],
                                   atol=1e-6)
        assert res.trace() == pytest.approx(1.0, abs=1e-6)
        assert res.purity() < 1.0

    def test_amplitude_damping_limits(self):
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("X", [0], [], column=0))
        nm = NoiseModel()
        nm.add_global_noise(AmplitudeDampingNoise(1.0))
        res = DensityMatrixSimulator(noise_model=nm).run(c)
        # gamma=1 decays |1><1| fully back to |0><0|
        np.testing.assert_allclose(res.probabilities, [1.0, 0.0],
                                   atol=1e-6)

    def test_bitflip_exact_value(self):
        """One X gate then bit-flip(p): P(0) = p exactly."""
        p = 0.17
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("X", [0], [], column=0))
        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(p))
        res = DensityMatrixSimulator(noise_model=nm).run(c)
        assert res.probabilities[0] == pytest.approx(p, abs=1e-6)

    def test_matches_monte_carlo_ensemble(self):
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.1))
        exact = DensityMatrixSimulator(noise_model=nm).run(bell())
        mc = Simulator(noise_model=nm).ensemble_density_matrix(
            bell(), n_trials=4000, seed=7)
        assert np.abs(exact.rho - np.asarray(mc)).max() < 0.03
        assert exact.trace() == pytest.approx(1.0, abs=1e-5)

    def test_parameterized_no_recompile_and_cap(self):
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("Ry", [0], [0.4], column=0))
        sim = DensityMatrixSimulator()
        r1 = sim.run(c)
        c2 = QuantumCircuit(1)
        c2.add_gate(GateInstance("Ry", [0], [1.3], column=0))
        r2 = sim.run(c2)
        assert abs(r1.probabilities[1] - r2.probabilities[1]) > 0.1
        # n=15 routes to the vec(rho) superop path since round 3; the
        # dense-rho method still caps at 14, and 16 exceeds even superop.
        with pytest.raises(ValueError):
            sim.run(QuantumCircuit(15), method="dense")
        with pytest.raises(ValueError):
            sim.run(QuantumCircuit(16))


class TestSampling:
    def test_counts_and_readout(self):
        nm = NoiseModel()
        nm.set_readout_error(ReadoutError(p01=0.0, p10=0.0))
        sim = DensityMatrixSimulator(noise_model=nm)
        res = sim.run(bell())
        counts = sim.sample(res, 2000, np.random.default_rng(0))
        assert sum(counts.values()) == 2000
        assert set(counts) == {"00", "11"}


def test_viewmodel_exact_mode():
    from quantum_simulator_tpu.viewmodels import DensityMatrixModel

    nm = NoiseModel()
    nm.add_global_noise(DepolarizingNoise(0.1))
    model = DensityMatrixModel()
    view = model.exact(bell(), nm)
    assert view.num_qubits == 2
    assert 0.0 < view.purity < 1.0
    assert np.trace(view.real).sum() == pytest.approx(1.0, abs=1e-5)
    # cache hit returns the same object
    assert model.exact(bell(), nm) is view


class TestSuperopRoute:
    """vec(rho) through the statevector engine vs the dense-rho body."""

    def _nm(self):
        from quantum_simulator_tpu.noise import (
            AmplitudeDampingNoise,
            DepolarizingNoise,
            NoiseModel,
        )

        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.08))
        nm.add_gate_noise("CNOT", AmplitudeDampingNoise(0.15))
        return nm

    def test_superop_matches_dense_rho(self):
        from quantum_simulator_tpu.density import DensityMatrixSimulator
        from quantum_simulator_tpu.models import brickwork_circuit

        c = brickwork_circuit(6, 4, seed=3)
        sim = DensityMatrixSimulator(noise_model=self._nm())
        dense = sim.run(c, method="dense")
        sup = sim.run(c, method="superop")
        np.testing.assert_allclose(sup.rho, dense.rho, atol=2e-5)
        assert sup.purity() == pytest.approx(dense.purity(), abs=1e-4)
        assert sup.trace() == pytest.approx(1.0, abs=1e-4)

    def test_superop_complex_gates_and_phase(self):
        from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
        from quantum_simulator_tpu.density import DensityMatrixSimulator

        c = QuantumCircuit(5)
        for q in range(5):
            c.add_gate(GateInstance("H", [q], [], column=0))
        c.add_gate(GateInstance("Rz", [1], [0.7], column=1))
        c.add_gate(GateInstance("T", [2], [], column=1))
        c.add_gate(GateInstance("CPhase", [0, 4], [1.1], column=2))
        sim = DensityMatrixSimulator(noise_model=self._nm())
        dense = sim.run(c, method="dense")
        sup = sim.run(c, method="superop")
        np.testing.assert_allclose(sup.rho, dense.rho, atol=2e-5)

    def test_superop_matrixless_wide_mcz(self):
        # MCZ11 has no dense matrix; the superop program carries the
        # conjugate cphase on the mirrored column targets.
        from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
        from quantum_simulator_tpu.density import DensityMatrixSimulator

        c = QuantumCircuit(11)
        for q in range(11):
            c.add_gate(GateInstance("H", [q], [], column=0))
        c.add_gate(GateInstance("MCZ11", list(range(11)), [], column=1))
        sim = DensityMatrixSimulator()
        dense = sim.run(c, method="dense")
        sup = sim.run(c, method="superop")
        np.testing.assert_allclose(sup.rho, dense.rho, atol=2e-5)

    def test_superop_group_executor_conjugates_param_gates(self):
        # Regression: the group-matmul pool batches parameterized ops by
        # (gate_name, builder); the superop program's column-side twins
        # share the row gate_name but carry a CONJUGATED builder. Keying
        # by name alone built conj(U) ops with the row builder, evolving
        # vec(rho) under U (x) U instead of U (x) conj(U) (0.34 max rho
        # error for H+Rz). Drive the group executor directly — the dense
        # CPU route uses the per-gate body and cannot catch this.
        from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
        from quantum_simulator_tpu.density import (
            DensityMatrixSimulator,
            superop_program,
        )
        from quantum_simulator_tpu.ops import program as prog_mod
        from quantum_simulator_tpu.ops.plan import group_forward_fn

        import jax.numpy as jnp

        c = QuantumCircuit(2)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("H", [1], [], column=0))
        c.add_gate(GateInstance("Rz", [0], [0.7], column=1))
        c.add_gate(GateInstance("Rx", [1], [0.3], column=1))
        p2 = superop_program(prog_mod.compile_circuit(c))
        vec = group_forward_fn(p2)(jnp.asarray(p2.initial_params))
        rho_group = np.asarray(vec).reshape(4, 4)
        dense = DensityMatrixSimulator().run(c, method="dense")
        np.testing.assert_allclose(rho_group, dense.rho, atol=2e-5)

    def test_superop_on_sharded_mesh(self):
        # n=10 exact DM as a 20-qubit sharded run over the virtual mesh:
        # the n=16 (32-qubit) mesh recipe at test scale.
        from quantum_simulator_tpu.density import (
            DensityMatrixSimulator,
            superop_program,
        )
        from quantum_simulator_tpu.models import brickwork_circuit
        from quantum_simulator_tpu.ops import program as prog_mod
        from quantum_simulator_tpu.parallel import DistributedSimulator

        c = brickwork_circuit(10, 3, seed=5)
        nm = self._nm()
        p2 = superop_program(prog_mod.compile_circuit(c), nm)
        dsim = DistributedSimulator(n_devices=8)
        from quantum_simulator_tpu.parallel.distributed import (
            sharded_forward_fn,
        )

        import jax.numpy as jnp

        vec = sharded_forward_fn(p2, dsim.mesh)(
            jnp.asarray(p2.initial_params))
        rho_mesh = np.asarray(vec).reshape(1 << 10, 1 << 10)
        dense = DensityMatrixSimulator(noise_model=nm).run(
            c, method="dense")
        np.testing.assert_allclose(rho_mesh, dense.rho, atol=3e-5)

    def test_superop_sampling_surface(self):
        from quantum_simulator_tpu.density import DensityMatrixSimulator
        from quantum_simulator_tpu.models import brickwork_circuit

        c = brickwork_circuit(6, 3, seed=7)
        sim = DensityMatrixSimulator(noise_model=self._nm())
        sup = sim.run(c, method="superop")
        counts = sim.sample(sup, 2000, np.random.default_rng(0))
        assert sum(counts.values()) == 2000
        z = sup.expectation_z(2)
        dense = sim.run(c, method="dense")
        assert z == pytest.approx(dense.expectation_z(2), abs=1e-4)


class TestTwoQubitChannel:
    """Correlated (M,4,4) Kraus stacks through both DM routes."""

    def _bell_with_2q_depol(self, p):
        from quantum_simulator_tpu.noise import TwoQubitDepolarizingNoise
        c = QuantumCircuit(num_qubits=2)
        c.add("H", [0])
        c.add("CNOT", [0, 1])
        nm = NoiseModel()
        nm.add_gate_noise("CNOT", TwoQubitDepolarizingNoise(p))
        return c, nm

    def test_dense_matches_analytic_bell(self):
        # Bell then 2q depol: rho = (1 - 16p/15)|B><B| + (16p/15) I/4
        p = 0.09
        c, nm = self._bell_with_2q_depol(p)
        rho = np.asarray(
            DensityMatrixSimulator(noise_model=nm).run(
                c, method="dense").device_rho)
        bell = np.zeros(4, dtype=complex)
        bell[0] = bell[3] = 1 / np.sqrt(2)
        lam = 1 - 16 * p / 15
        expected = lam * np.outer(bell, bell.conj()) + (1 - lam) * np.eye(4) / 4
        np.testing.assert_allclose(rho, expected, atol=1e-6)

    def test_superop_route_matches_dense(self):
        p = 0.07
        c, nm = self._bell_with_2q_depol(p)
        sim = DensityMatrixSimulator(noise_model=nm)
        rho_d = np.asarray(sim.run(c, method="dense").device_rho)
        rho_s = np.asarray(sim.run(c, method="superop").device_rho)
        np.testing.assert_allclose(rho_s, rho_d, atol=1e-6)

    def test_rejects_on_one_qubit_gate(self):
        from quantum_simulator_tpu.noise import TwoQubitDepolarizingNoise
        c = QuantumCircuit(num_qubits=1)
        c.add("H", [0])
        nm = NoiseModel()
        nm.add_gate_noise("H", TwoQubitDepolarizingNoise(0.05))
        sim = DensityMatrixSimulator(noise_model=nm)
        with pytest.raises(ValueError, match="two-qubit Kraus"):
            sim.run(c, method="dense")
        with pytest.raises(ValueError, match="two-qubit Kraus"):
            sim.run(c, method="superop")
