"""Optimizer: gradients (parameter-shift / finite-diff / autodiff agree),
Adam convergence, cost functions, barren plateau analysis."""

import numpy as np
import pytest

from quantum_simulator_tpu import GateInstance, QuantumCircuit, Simulator
from quantum_simulator_tpu.optimizer import (
    CircuitOptimizer,
    CostFunction,
    GradientEstimator,
    ParameterizedCircuitConfig,
)


def ry_circuit(theta=0.1):
    c = QuantumCircuit(1)
    c.add_gate(GateInstance("Ry", [0], [theta], column=0))
    return c


def ansatz(n=2, layers=1, theta=0.2):
    c = QuantumCircuit(n)
    col = 0
    for _ in range(layers):
        for q in range(n):
            c.add_gate(GateInstance("Ry", [q], [theta], column=col))
        col += 1
        for q in range(n - 1):
            c.add_gate(GateInstance("CNOT", [q, q + 1], [], column=col))
            col += 1
    return c


class TestConfig:
    def test_auto_detect_names(self):
        c = ansatz(2, 1)
        cfg = ParameterizedCircuitConfig.auto_detect(c)
        assert cfg.num_params == 2
        assert cfg.bindings[0].name == "Ry[0].p0"

    def test_bind_and_get_values(self):
        cfg = ParameterizedCircuitConfig.auto_detect(ry_circuit(0.7))
        np.testing.assert_allclose(cfg.get_values(), [0.7])
        qc = cfg.bind_values(np.array([1.5]))
        assert qc.gates[0].params == [1.5]
        assert cfg.circuit.gates[0].params == [0.7]  # original untouched


class TestGradients:
    def test_three_methods_agree(self):
        cfg = ParameterizedCircuitConfig.auto_detect(ry_circuit())
        cost = CostFunction.z_expectation(0)
        theta = np.array([0.8])
        expected = -np.sin(0.8)  # d/dθ cos(θ) for <Z> after Ry(θ)
        g_ps = GradientEstimator.parameter_shift(cfg, cost, theta)
        g_fd = GradientEstimator.finite_difference(cfg, cost, theta)
        _, g_ad = GradientEstimator.autodiff(cfg, cost, theta)
        for g in (g_ps, g_fd, g_ad):
            assert g[0] == pytest.approx(expected, abs=1e-3)

    def test_multi_param_gradient_shape(self):
        cfg = ParameterizedCircuitConfig.auto_detect(ansatz(3, 2))
        cost = CostFunction.z_expectation(0)
        vals = cfg.get_values()
        g = GradientEstimator.parameter_shift(cfg, cost, vals)
        assert g.shape == vals.shape


class TestCostFunctions:
    def test_vqe_hamiltonian_host_vs_device(self):
        c = ansatz(2, 1, theta=0.9)
        state = Simulator().run(c, shots=0).final_state
        cost = CostFunction.vqe_hamiltonian(
            [(0.5, "ZZ", [0, 1]), (-0.3, "X", [0]), (0.2, "Y", [1])])
        host_val = cost(state)
        import jax.numpy as jnp

        dev_val = float(cost.device_fn(state.device_data, 2))
        assert host_val == pytest.approx(dev_val, abs=1e-5)

    def test_state_fidelity_cost(self):
        target = np.zeros(2, dtype=complex)
        target[1] = 1.0  # |1>
        cost = CostFunction.state_fidelity(target)
        state = Simulator().run(ry_circuit(np.pi), shots=0).final_state
        assert cost(state) == pytest.approx(0.0, abs=1e-5)

    def test_qaoa_maxcut_on_cut_state(self):
        # |01> cuts the single edge (0,1) -> C = 1
        c = QuantumCircuit(2, initial_states=[0, 1])
        c.add_gate(GateInstance("I", [0], [], column=0))
        state = Simulator().run(c, shots=0).final_state
        cost = CostFunction.qaoa_maxcut([(0, 1)])
        assert cost(state) == pytest.approx(1.0, abs=1e-5)


class TestOptimizer:
    @pytest.mark.parametrize("method",
                             ["parameter_shift", "autodiff",
                              "finite_difference"])
    def test_minimizes_z_expectation(self, method):
        cfg = ParameterizedCircuitConfig.auto_detect(ry_circuit(0.1))
        opt = CircuitOptimizer(cfg, CostFunction.z_expectation(0),
                               learning_rate=0.3, max_iterations=80,
                               gradient_method=method)
        res = opt.run(seed=42)
        assert res.optimal_cost < -0.99
        assert res.iterations <= 80
        assert len(res.history) == res.iterations

    def test_request_stop(self):
        cfg = ParameterizedCircuitConfig.auto_detect(ry_circuit())
        opt = CircuitOptimizer(cfg, CostFunction.z_expectation(0),
                               max_iterations=100)

        def callback(i, values, cost):
            if i >= 2:
                opt.request_stop()

        res = opt.run(callback=callback)
        assert res.iterations <= 4

    def test_vqe_two_qubit_ground_state(self):
        """Minimize <Z0 Z1> + 0.5 <X0>: optimizer should reach < -1.0."""
        cfg = ParameterizedCircuitConfig.auto_detect(ansatz(2, 2))
        cost = CostFunction.vqe_hamiltonian(
            [(1.0, "ZZ", [0, 1]), (0.5, "X", [0])])
        opt = CircuitOptimizer(cfg, cost, learning_rate=0.2,
                               max_iterations=100,
                               gradient_method="autodiff")
        res = opt.run(seed=7)
        assert res.optimal_cost < -0.9


class TestBarrenPlateau:
    def test_flat_detection(self):
        cfg = ParameterizedCircuitConfig.auto_detect(ry_circuit())
        # Constant-cost function -> zero gradients everywhere -> barren
        from quantum_simulator_tpu.optimizer import DeviceCost
        import jax.numpy as jnp

        flat = DeviceCost(lambda s: 1.0,
                          lambda psi, n: jnp.float32(1.0), key=("flat",))
        opt = CircuitOptimizer(cfg, flat)
        report = opt.detect_barren_plateau(n_samples=5, seed=1)
        assert report["is_barren"]

    def test_layered_analysis_shape(self):
        cfg = ParameterizedCircuitConfig.auto_detect(ansatz(2, 2))
        opt = CircuitOptimizer(cfg, CostFunction.z_expectation(0))
        bp = opt.detect_barren_plateau_layered(n_samples=5, seed=3)
        assert len(bp.param_layer_map) == cfg.num_params
        assert len(bp.per_layer_mean_variance) == len(bp.per_layer_variance)
        assert len(bp.per_qubit_variance) >= 2
        assert bp.threshold == 1e-4


def test_autodiff_rejects_huge_circuits():
    """Reverse-mode through an n>=30 dense program would need several
    whole 8 GiB states resident; the clear error beats an XLA OOM."""
    from quantum_simulator_tpu.optimizer import (
        CostFunction,
        GradientEstimator,
        ParameterizedCircuitConfig,
    )

    c = QuantumCircuit(30)
    c.add_gate(GateInstance("Ry", [0], [0.3], column=0))
    cfg = ParameterizedCircuitConfig.auto_detect(c)
    with pytest.raises(ValueError, match="autodiff cannot run"):
        GradientEstimator.autodiff(
            cfg, CostFunction.z_expectation(0), np.array([0.3]))


class TestMultiStart:
    def test_finds_minimum_and_shapes(self):
        from quantum_simulator_tpu.optimizer import (CircuitOptimizer,
                                                     MultiStartResult)
        cfg = ParameterizedCircuitConfig.auto_detect(ansatz(2, 2))
        cost = CostFunction.vqe_hamiltonian(
            [(1.0, "ZZ", [0, 1]), (0.5, "X", [0])])
        res = CircuitOptimizer.multi_start(
            cfg, cost, n_starts=6, max_iterations=60,
            learning_rate=0.2, seed=11)
        assert isinstance(res, MultiStartResult)
        assert res.optimal_cost < -0.9
        assert res.start_costs.shape == (6,)
        assert res.start_values.shape == (6, cfg.num_params)
        assert res.cost_histories.shape == (6, 60)
        assert res.optimal_cost == pytest.approx(
            res.start_costs.min(), abs=1e-9)
        assert res.best_start == int(np.argmin(res.start_costs))
        # per-start best must beat (or tie) that start's initialization
        assert (res.start_costs <= res.cost_histories[:, 0] + 1e-6).all()

    def test_adam_trajectory_matches_sequential_optimizer(self):
        """Same init, lr, iteration count: the scanned on-device Adam
        must track the host-loop Adam (f32 vs f64 accumulation only)."""
        from quantum_simulator_tpu.optimizer import CircuitOptimizer
        cfg = ParameterizedCircuitConfig.auto_detect(ansatz(2, 1, 0.3))
        cost = CostFunction.z_expectation(0)
        init = cfg.get_values()[None, :]
        res = CircuitOptimizer.multi_start(
            cfg, cost, n_starts=1, max_iterations=10,
            learning_rate=0.15, init_values=init)

        opt = CircuitOptimizer(cfg, cost, learning_rate=0.15,
                               max_iterations=10, tolerance=0.0,
                               gradient_method="autodiff")
        seq = opt.run()
        assert seq.iterations == 10
        # cost_histories[0, t] is the cost at the t-th visited point;
        # the sequential history records post-update costs, so compare
        # the sequential step-t cost with the scanned step-(t+1) visit.
        for t in range(9):
            assert res.cost_histories[0, t + 1] == pytest.approx(
                seq.history[t][1], abs=2e-3)
        assert res.optimal_cost == pytest.approx(seq.optimal_cost,
                                                 abs=2e-3)

    def test_multi_start_beats_worst_single_start(self):
        from quantum_simulator_tpu.optimizer import CircuitOptimizer
        cfg = ParameterizedCircuitConfig.auto_detect(ry_circuit(0.0))
        res = CircuitOptimizer.multi_start(
            cfg, CostFunction.z_expectation(0), n_starts=8,
            max_iterations=50, learning_rate=0.3, seed=3)
        assert res.optimal_cost < -0.99
        assert res.optimal_cost <= res.start_costs.max()

    def test_rejects_parameterless_and_bad_inits(self):
        from quantum_simulator_tpu.optimizer import CircuitOptimizer
        c = QuantumCircuit(1)
        c.add_gate(GateInstance("H", [0], [], column=0))
        cfg = ParameterizedCircuitConfig.auto_detect(c)
        with pytest.raises(ValueError):
            CircuitOptimizer.multi_start(
                cfg, CostFunction.z_expectation(0))
        cfg2 = ParameterizedCircuitConfig.auto_detect(ry_circuit())
        with pytest.raises(ValueError):
            CircuitOptimizer.multi_start(
                cfg2, CostFunction.z_expectation(0), n_starts=2,
                init_values=np.zeros((3, 1)))


class TestMPSEngine:
    """Variational optimization on the MPS engine: same optimizer
    surface, no 2^n state (optimizer.MPSParameterizedConfig)."""

    def test_cost_trace_matches_statevector(self):
        from quantum_simulator_tpu.optimizer import MPSParameterizedConfig
        c = ansatz(4, layers=2, theta=0.3)
        terms = [(-1.0, "ZZ", [q, q + 1]) for q in range(3)]
        terms += [(-0.6, "X", [q]) for q in range(4)]
        cost = CostFunction.vqe_hamiltonian(terms)
        runs = {}
        for name, cfg in (
                ("dense", ParameterizedCircuitConfig.auto_detect(c)),
                ("mps", MPSParameterizedConfig.auto_detect(c, chi=16))):
            opt = CircuitOptimizer(cfg, cost, learning_rate=0.2,
                                   max_iterations=4, tolerance=0.0)
            res = opt.run(seed=11)
            runs[name] = [h[1] for h in res.history]
        np.testing.assert_allclose(runs["mps"], runs["dense"], atol=1e-4)

    def test_vqe_at_40_qubits_descends(self):
        from quantum_simulator_tpu import mps
        from quantum_simulator_tpu.models.hamiltonians import zz_chain
        from quantum_simulator_tpu.optimizer import MPSParameterizedConfig
        n = 40
        c = ansatz(n, layers=1, theta=0.4)
        cfg = MPSParameterizedConfig.auto_detect(c, chi=8)
        assert cfg.num_params == n
        cost = CostFunction.vqe_hamiltonian(zz_chain(n, coeff=-1.0))
        opt = CircuitOptimizer(cfg, cost, learning_rate=0.3,
                               max_iterations=3, tolerance=0.0)
        first = opt._evaluate_cost(cfg.get_values())
        res = opt.run(seed=5)
        assert res.optimal_cost < first
        # The optimizer's cost agrees with the standalone MPS energy of
        # the bound circuit (independent contraction path).
        _, state = mps.MPSSimulator(chi=8).run(
            cfg.bind_values(res.optimal_values), shots=0)
        want = mps.expectation_hamiltonian(state, zz_chain(n, coeff=-1.0))
        assert res.optimal_cost == pytest.approx(want, abs=1e-4)

    def test_qaoa_constant_offset_carried(self):
        from quantum_simulator_tpu.optimizer import (GradientEstimator,
                                                     MPSParameterizedConfig)
        c = ansatz(3, layers=1, theta=0.5)
        cost = CostFunction.qaoa_maxcut([(0, 1), (1, 2)])
        dense = GradientEstimator._batched_costs(
            ParameterizedCircuitConfig.auto_detect(c), cost,
            np.array([[0.5, 0.2, 0.9]]))
        via_mps = GradientEstimator._batched_costs(
            MPSParameterizedConfig.auto_detect(c, chi=8), cost,
            np.array([[0.5, 0.2, 0.9]]))
        np.testing.assert_allclose(via_mps, dense, atol=1e-5)

    def test_rejects_termless_cost_and_reverse_mode(self):
        from quantum_simulator_tpu.optimizer import MPSParameterizedConfig
        cfg = MPSParameterizedConfig.auto_detect(ansatz(3), chi=4)
        with pytest.raises(ValueError, match="Hamiltonian-shaped"):
            CircuitOptimizer(cfg, CostFunction.state_fidelity(
                np.eye(8)[0]), max_iterations=1).step()
        cost = CostFunction.z_expectation(0)
        with pytest.raises(ValueError, match="parameter_shift"):
            CircuitOptimizer(cfg, cost,
                             gradient_method="autodiff").step()
        with pytest.raises(ValueError, match="parameter_shift"):
            CircuitOptimizer.multi_start(cfg, cost, n_starts=2,
                                         max_iterations=2)

    def test_barren_plateau_on_mps(self):
        from quantum_simulator_tpu.optimizer import MPSParameterizedConfig
        cfg = MPSParameterizedConfig.auto_detect(ansatz(3), chi=8)
        opt = CircuitOptimizer(cfg, CostFunction.z_expectation(0))
        out = opt.detect_barren_plateau(n_samples=4, seed=0)
        assert len(out["per_param"]) == cfg.num_params
        assert not out["is_barren"]
