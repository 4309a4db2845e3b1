"""Pallas step kernels vs the XLA einsum executor (interpreter mode).

On CPU the kernels run through the Pallas interpreter (INTERPRET=True),
which validates the block/grid geometry and the in-kernel math; the
Mosaic-compiled TPU path is driven by bench.py / scripts on the chip.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
from quantum_simulator_tpu.models import brickwork_circuit
from quantum_simulator_tpu.ops import pallas_exec
from quantum_simulator_tpu.ops import program as prog
from quantum_simulator_tpu.ops.plan import (
    _HI,
    AxisMatmulStep,
    CrossStep,
    _cross_spec,
    _dense_spec,
    _split_axis_bit,
    build_group_operands,
    get_group_plan,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_exec.INTERPRET = True
    yield
    pallas_exec.INTERPRET = False


def rand_state(dshape, planar, seed=0):
    rng = np.random.default_rng(seed)
    shape = ((2,) + dshape) if planar else dshape
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


class TestDense:
    @pytest.mark.parametrize("axis", [0, 1, 2])
    @pytest.mark.parametrize("planar,op_real", [(False, True),
                                                (True, True),
                                                (True, False)])
    def test_matches_einsum(self, axis, planar, op_real):
        dshape = (4, 16, 128)
        S = dshape[axis]
        rng = np.random.default_rng(1)
        fn = pallas_exec.lower_dense(dshape, axis, op_real, planar)
        assert fn is not None
        x = rand_state(dshape, planar)
        if op_real:
            op = jnp.asarray(rng.standard_normal((S, S)), jnp.float32)
            got = np.asarray(fn(x, op))
            spec = _dense_spec(3, axis, True, planar)
            want = np.asarray(jnp.einsum(spec, op, x, precision=_HI))
        else:
            re = jnp.asarray(rng.standard_normal((S, S)), jnp.float32)
            im = jnp.asarray(rng.standard_normal((S, S)), jnp.float32)
            blocked = jnp.stack([jnp.stack([re, -im]),
                                 jnp.stack([im, re])])
            got = np.asarray(fn(x, blocked))
            spec = _dense_spec(3, axis, False, planar)
            want = np.asarray(jnp.einsum(spec, blocked, x, precision=_HI))
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestCross:
    @pytest.mark.parametrize("s,pos,o", [
        (0, 1, 2),    # outside split, op on the minor axis (trailing)
        (0, 0, 1),    # outside split, op mid (leading)
        (1, 2, 0),    # outside split, op on the small leading axis
        (1, 3, 2),    # in-kernel bit (slice = second-minor), op minor
    ])
    @pytest.mark.parametrize("planar,op_real", [(False, True),
                                                (True, False)])
    def test_matches_einsum(self, s, pos, o, planar, op_real):
        dshape = (8, 16, 128)
        S = dshape[o]
        rng = np.random.default_rng(2)
        fn = pallas_exec.lower_cross(dshape, s, pos, o, op_real, planar)
        assert fn is not None
        x = rand_state(dshape, planar, seed=s * 7 + o)

        def einsum_ref(cop):
            new_shape, bit_axis = _split_axis_bit(dshape, s, pos)
            ov = o + 2 if o > s else o
            lead = (2,) if planar else ()
            xr = x.reshape(lead + new_shape)
            spec = _cross_spec(len(new_shape), bit_axis, ov, op_real,
                               planar)
            out = jnp.einsum(spec, cop, xr, precision=_HI)
            return np.asarray(out.reshape(x.shape))

        if op_real:
            cop = jnp.asarray(rng.standard_normal((2, S, 2, S)),
                              jnp.float32)
            got = np.asarray(fn(x, cop))
            want = einsum_ref(cop)
        else:
            re = jnp.asarray(rng.standard_normal((2, S, 2, S)), jnp.float32)
            im = jnp.asarray(rng.standard_normal((2, S, 2, S)), jnp.float32)
            blocked = jnp.stack([jnp.stack([re, -im]),
                                 jnp.stack([im, re])])
            got = np.asarray(fn(x, blocked))
            want = einsum_ref(blocked)
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_minor_slice_unsupported(self):
        assert pallas_exec.lower_cross((8, 16, 128), 2, 3, 0,
                                       True, False) is None


class TestEndToEnd:
    """Full circuits through the group executor with Pallas lowerings
    (interpret mode) vs the per-gate einsum engine."""

    def _compare(self, circuit):
        from quantum_simulator_tpu.ops.plan import group_forward_fn

        p = prog.compile_circuit(circuit)
        params = jnp.asarray(p.initial_params)
        expected = np.asarray(prog.forward_fn(p)(params))
        got = np.asarray(group_forward_fn(p)(params))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_brickwork_through_pallas_steps(self):
        self._compare(brickwork_circuit(10, 4, seed=11))

    def test_qft_through_pallas_steps(self):
        from quantum_simulator_tpu.algorithms import AlgorithmTemplate

        self._compare(AlgorithmTemplate.quantum_fourier_transform(9))

    def test_step_dispatch_covers_dense_and_cross(self):
        c = brickwork_circuit(10, 4, seed=3)
        p = prog.compile_circuit(c)
        plan = get_group_plan(p)
        operands = build_group_operands(p, plan,
                                        jnp.asarray(p.initial_params),
                                        jnp.complex64)
        kinds = {type(s).__name__ for s in plan.steps}
        lowered = sum(
            pallas_exec.maybe_lower_step(plan, s, operands, True)
            is not None for s in plan.steps)
        assert "AxisMatmulStep" in kinds
        assert lowered > 0
