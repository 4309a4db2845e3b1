"""Mixed-unitary noise-insertion trajectories (``ops/unitary_traj.py``).

For mixed-unitary channels the branch probabilities are state-
independent, so draws splice as unitaries into the group plan's
composition windows (~per-column passes instead of per-gate). Locks:

* draw-exactness vs ``plan.group_trajectory_body`` for the same key
  (same stochastic branches — n <= 13, several seeds);
* ensemble agreement with the exact density-matrix engine (including
  the correlated 2q depolarizing channel no per-target path supports);
* routing: mixed-unitary -> splice path, amplitude damping -> fold.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
from quantum_simulator_tpu.noise import (
    AmplitudeDampingNoise,
    BitFlipNoise,
    DepolarizingNoise,
    NoiseModel,
    PhaseFlipNoise,
    TwoQubitDepolarizingNoise,
)
from quantum_simulator_tpu.ops import program as prog
from quantum_simulator_tpu.ops.plan import group_trajectory_body
from quantum_simulator_tpu.ops.unitary_traj import (
    mixed_unitary_stack,
    unitary_insert_spec,
    unitary_insert_supported,
    unitary_insert_trajectory_body,
)


def brickwork(n, layers, *, rz=False):
    c = QuantumCircuit(n)
    col = 0
    for layer in range(layers):
        for q in range(n):
            c.add_gate(GateInstance("Ry", [q], [0.1 * (q + layer + 1)],
                                    column=col))
        col += 1
        for q in range(layer % 2, n - 1, 2):
            c.add_gate(GateInstance("CNOT", [q, q + 1], [], column=col))
        col += 1
    if rz:
        c.add_gate(GateInstance("Rz", [n // 3], [0.7], column=col))
    return c


class TestMixedUnitaryStack:
    def test_depolarizing_is_mixed_unitary(self):
        mu = mixed_unitary_stack(DepolarizingNoise(0.1).kraus_stack())
        assert mu is not None
        probs, units = mu
        np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-9)
        for U in units:
            np.testing.assert_allclose(U.conj().T @ U, np.eye(2),
                                       atol=1e-9)

    def test_two_qubit_depolarizing(self):
        mu = mixed_unitary_stack(
            TwoQubitDepolarizingNoise(0.2).kraus_stack())
        assert mu is not None
        probs, units = mu
        assert units.shape == (16, 4, 4)
        np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-9)

    def test_amplitude_damping_is_not(self):
        assert mixed_unitary_stack(
            AmplitudeDampingNoise(0.2).kraus_stack()) is None


def _draw_exact(circuit, nm, seeds=range(6)):
    p = prog.compile_circuit(circuit)
    params = jnp.asarray(p.initial_params)
    for seed in seeds:
        key = jax.random.PRNGKey(seed)
        ref = np.asarray(group_trajectory_body(p, nm, params, key,
                                               jnp.complex64))
        got = np.asarray(unitary_insert_trajectory_body(p, nm, params,
                                                        key))
        fid = abs(np.vdot(ref, got)) ** 2 / (
            np.vdot(ref, ref).real * np.vdot(got, got).real)
        assert fid > 1 - 1e-5, (seed, fid)
        np.testing.assert_allclose(np.vdot(got, got).real, 1.0, atol=1e-5)


class TestDrawExactness:
    def test_real_depolarizing(self):
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.1))
        _draw_exact(brickwork(10, 3), nm)

    def test_planar_depolarizing(self):
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.15))
        _draw_exact(brickwork(9, 2, rz=True), nm)

    def test_bit_and_phase_flip_gate_specific(self):
        nm = NoiseModel()
        nm.add_global_noise(BitFlipNoise(0.1))
        nm.add_gate_noise("CNOT", PhaseFlipNoise(0.2))
        _draw_exact(brickwork(8, 2), nm)

    def test_grover_prod_steps(self):
        from quantum_simulator_tpu.algorithms import AlgorithmTemplate
        full = AlgorithmTemplate.grover_search(9, marked_state=3,
                                               num_iterations=2)
        c = QuantumCircuit(9)
        for g in full.gates:
            if g.gate_name != "Measure":
                c.add_gate(g)
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.05))
        _draw_exact(c, nm, seeds=range(4))


class TestEnsembleVsDensityMatrix:
    def test_correlated_2q_depolarizing_matches_exact_rho(self):
        # The capability no per-target trajectory path has: correlated
        # 2q Kraus on CNOTs. Trajectory-ensemble Z expectations must
        # converge to the exact density-matrix engine's.
        from quantum_simulator_tpu.density import DensityMatrixSimulator

        c = brickwork(4, 2)
        nm = NoiseModel()
        nm.add_gate_noise("CNOT", TwoQubitDepolarizingNoise(0.3))
        assert unitary_insert_supported(prog.compile_circuit(c), nm)

        dm = DensityMatrixSimulator(noise_model=nm).run(c)
        p = prog.compile_circuit(c)
        params = jnp.asarray(p.initial_params)
        body = jax.jit(jax.vmap(
            lambda k: unitary_insert_trajectory_body(p, nm, params, k)))
        keys = jax.random.split(jax.random.PRNGKey(0), 600)
        states = np.asarray(body(keys))
        probs = (np.abs(states) ** 2).mean(axis=0)
        np.testing.assert_allclose(probs, dm.probabilities, atol=0.05)

    def test_depolarizing_matches_exact_rho(self):
        from quantum_simulator_tpu.density import DensityMatrixSimulator

        c = brickwork(4, 2, rz=True)
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.1))
        dm = DensityMatrixSimulator(noise_model=nm).run(c)
        p = prog.compile_circuit(c)
        params = jnp.asarray(p.initial_params)
        body = jax.jit(jax.vmap(
            lambda k: unitary_insert_trajectory_body(p, nm, params, k)))
        keys = jax.random.split(jax.random.PRNGKey(1), 600)
        states = np.asarray(body(keys))
        probs = (np.abs(states) ** 2).mean(axis=0)
        np.testing.assert_allclose(probs, dm.probabilities, atol=0.05)


class TestRoutingAndSpec:
    def test_generic_step_plan_stays_on_fold_path(self):
        # A 3-group-spanning dense gate forces a GenericStep into the
        # aug plan; the HUGE route must reject the splice (its caller
        # builds the state shape from trajectory_is_real, and a
        # GenericStep flattens the whole state to complex) and keep the
        # per-gate fold executor, whose 'bits' applier handles it.
        from quantum_simulator_tpu.ops.bigtraj import (
            huge_trajectory_state_body,
        )
        from quantum_simulator_tpu.ops.unitary_traj import (
            unitary_insert_evolve_ok,
        )

        c = QuantumCircuit(19)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("Toffoli", [0, 7, 14], [], column=1))
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.05))
        p = prog.compile_circuit(c)
        assert unitary_insert_supported(p, nm)  # channels ARE mu
        assert not unitary_insert_evolve_ok(p, nm)  # but plan is generic
        x, planar = huge_trajectory_state_body(
            p, nm, jnp.asarray(p.initial_params), jax.random.PRNGKey(0))
        flat = np.asarray(x if not planar
                          else x[0] + 1j * x[1]).reshape(-1)
        np.testing.assert_allclose(np.vdot(flat, flat).real, 1.0,
                                   atol=1e-4)

    def test_amplitude_damping_not_supported(self):
        nm = NoiseModel()
        nm.add_global_noise(AmplitudeDampingNoise(0.2))
        assert not unitary_insert_supported(
            prog.compile_circuit(brickwork(6, 1)), nm)

    def test_spec_draw_schedule_matches_fold(self):
        # Same (op, stack, target) -> draw-index allocation as the fold
        # path: len(stacks) * k draws per op, stack-major target-minor.
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.1))
        nm.add_global_noise(BitFlipNoise(0.05))
        p = prog.compile_circuit(brickwork(5, 1))
        spec = unitary_insert_spec(p, nm)
        expected = sum(2 * len(op.targets) for op in p.ops)
        assert spec.total_draws == expected
        assert [d.draw_index for d in spec.draws] == list(range(expected))

    def test_batched_trajectories_route_here(self):
        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.1))
        p = prog.compile_circuit(brickwork(7, 2))
        params = jnp.asarray(p.initial_params)
        keys = jax.random.split(jax.random.PRNGKey(5), 3)
        if not prog._use_group_path(p):
            pytest.skip("group path inactive on this backend/size")
        batched = prog.batched_trajectories_fn(p, nm)(params, keys)
        single = np.stack([
            np.asarray(unitary_insert_trajectory_body(p, nm, params, k))
            for k in keys])
        np.testing.assert_allclose(np.asarray(batched), single, atol=2e-6)


class TestHostDrawOverrides:
    """The interactive edit-hot path builds its overrides in host NumPy
    (``_draw_overrides_host``): the draws must be BIT-identical to the
    traced ``_draw_overrides`` (same categorical, prefix-stable key
    split under the 64-bucket padding)."""

    def test_split_prefix_stability(self):
        # The padding in _draw_overrides_host relies on this jax
        # property: split(key, n)[i] depends only on (key, i).
        key = jax.random.PRNGKey(123)
        big = jax.random.split(key, 256)
        small = jax.random.split(key, 100)
        np.testing.assert_array_equal(np.asarray(big[:100]),
                                      np.asarray(small))

    @pytest.mark.parametrize("seed", [0, 3, 11])
    def test_host_overrides_match_traced(self, seed):
        from quantum_simulator_tpu.ops.unitary_traj import (
            _draw_overrides,
            _draw_overrides_host,
        )

        nm = NoiseModel()
        nm.add_global_noise(DepolarizingNoise(0.1))
        nm.add_global_noise(BitFlipNoise(0.05))
        p = prog.compile_circuit(brickwork(8, 3, rz=True))
        spec = unitary_insert_spec(p, nm)
        key = jax.random.PRNGKey(seed)
        ov_t = _draw_overrides(spec, key)
        ov_h = _draw_overrides_host(spec, key)
        assert ov_t.pool_map == ov_h.pool_map
        assert set(ov_t.per_op) == set(ov_h.per_op)
        if ov_h.pool_rows is not None:
            np.testing.assert_array_equal(np.asarray(ov_t.pool_rows),
                                          ov_h.pool_rows)
        for oi in ov_h.per_op:
            np.testing.assert_array_equal(np.asarray(ov_t.per_op[oi]),
                                          ov_h.per_op[oi])

    def test_numpy_operand_build_matches_traced(self):
        from quantum_simulator_tpu.ops.plan import (
            build_group_operands,
            get_group_plan,
        )
        import jax.tree_util as jtu

        p = prog.compile_circuit(brickwork(9, 3, rz=True))
        plan = get_group_plan(p)
        o_j = build_group_operands(p, plan, jnp.asarray(p.initial_params),
                                   jnp.complex64)
        o_n = build_group_operands(p, plan, np.asarray(p.initial_params),
                                   jnp.complex64, xp=np)
        lj, tj = jtu.tree_flatten(o_j)
        ln, tn = jtu.tree_flatten(o_n)
        assert tj == tn
        for a, b in zip(lj, ln):
            a = np.asarray(a)
            b = np.asarray(b)
            assert a.shape == b.shape and a.dtype == b.dtype
            np.testing.assert_allclose(a, b, atol=5e-7)

    def test_numpy_build_honors_non_registry_builders(self):
        # density.superop_program emits conjugated column-side twins
        # UNDER THE ORIGINAL gate_name: the NumPy host build must
        # evaluate each op's ACTUAL builder, not the registry's
        # matrix_func for that name (caught in the r5 review — the
        # registry shortcut silently un-conjugated every column twin).
        from quantum_simulator_tpu.density import superop_program
        from quantum_simulator_tpu.ops.plan import (
            build_group_operands,
            get_group_plan,
        )
        import jax.tree_util as jtu

        c = QuantumCircuit(3)
        c.add_gate(GateInstance("H", [0], [], column=0))
        c.add_gate(GateInstance("Rz", [0], [0.7], column=1))
        c.add_gate(GateInstance("CNOT", [0, 1], [], column=2))
        c.add_gate(GateInstance("Rx", [2], [0.4], column=3))
        p2 = superop_program(prog.compile_circuit(c))
        plan = get_group_plan(p2)
        o_j = build_group_operands(p2, plan, jnp.asarray(p2.initial_params),
                                   jnp.complex64)
        o_n = build_group_operands(p2, plan, np.asarray(p2.initial_params),
                                   jnp.complex64, xp=np)
        for a, b in zip(*(jtu.tree_flatten(t)[0] for t in (o_j, o_n))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-7)
