"""Huge-state execution: in-place chunked passes for n >= 30.

A dense group-plan step at n=30 is one einsum whose input and output are
each 8 GiB (planar f32 state) — XLA allocates both, and 16 GiB is the
whole HBM of a v5e chip, so the whole-state executor dies with
RESOURCE_EXHAUSTED (measured; n=29 is the whole-state ceiling). But every
plan step touches only one or two tensor axes, so the state can be
processed in chunks along an *uninvolved* axis: ``fori_loop`` carrying
the full state, each iteration ``dynamic_slice`` -> step einsum on the
chunk -> ``dynamic_update_slice`` back. XLA keeps the loop carry in one
buffer and performs the update in place, so peak memory is

    state (2^(n+3) planar bytes) + 2 chunk temps (state / n_chunks each)

instead of 2x state. At n=30 with 8 chunks: 8 GiB + 2 GiB, comfortably
inside 16 GiB. The chunk einsums are the SAME contractions the
whole-state path runs (same MXU shapes, K=256), just restricted to
1/n_chunks of the uninvolved axis — throughput is unchanged because the
dense steps are MXU-compute-bound, not bandwidth-bound (ROADMAP.md).

The complex state is never materialized here: callers consume the planar
(2, *axis_sizes) f32 tensor directly (probabilities = x[0]^2 + x[1]^2),
because a complex64 copy at n=30 is another 8 GiB.

This extends the single-chip qubit ceiling past the reference's
documented 28-qubit / 8 GiB limit (``/root/reference/README.md:211-218``,
``resource_monitor.py:420-447``) on the SAME memory budget ratio: n=30
at complex64 precision in 16 GiB HBM with full-circuit execution.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import CONFIG
from .plan import (
    _HI,
    AxisMatmulStep,
    CrossStep,
    DiagPairStep,
    _cross_spec,
    _dense_spec,
    _diag_spec,
    _planar_basis_state,
    _split_axis_bit,
    build_group_operands,
    get_group_plan,
)

# Chunk the state when the whole-state executor's 2x-state peak would not
# fit: planar bytes = 2^(n+3); XLA needs ~2x that plus operands. 10 GiB
# leaves headroom for operand stacks and runtime buffers in 16 GiB HBM.
_WHOLE_STATE_PEAK_BUDGET = 10 * (1 << 30)
_DEFAULT_CHUNKS = 8


def auto_chunks(num_qubits: int) -> int:
    """1 (whole-state executor) below the memory cliff, 8 above it."""
    planar_bytes = 1 << (num_qubits + 3)
    return _DEFAULT_CHUNKS if 2 * planar_bytes > _WHOLE_STATE_PEAK_BUDGET \
        else 1


def _chunk_axis(shape: tuple[int, ...], involved: set[int]) -> int | None:
    """Largest tensor axis not touched by the step (None if all touched)."""
    best = None
    for i, size in enumerate(shape):
        if i in involved or size < 2:
            continue
        if best is None or size > shape[best]:
            best = i
    return best


def _chunked_pass(x: jnp.ndarray, involved: set[int], n_chunks: int,
                  apply_fn: Callable[[jnp.ndarray], jnp.ndarray]
                  ) -> jnp.ndarray:
    """Apply ``apply_fn`` (a full-rank planar-state transform) chunk by
    chunk along an uninvolved axis, updating the carried state in place."""
    shape = x.shape[1:]  # drop the leading re/im plane axis
    ax = _chunk_axis(shape, involved)
    if ax is None or n_chunks <= 1:
        return apply_fn(x)
    size = shape[ax]
    chunks = min(n_chunks, size)
    while size % chunks:  # axis sizes are powers of two; so are chunks
        chunks -= 1
    width = size // chunks
    tax = ax + 1  # planar tensor axis (leading re/im plane)
    sizes = x.shape[:tax] + (width,) + x.shape[tax + 1:]

    # Unrolled straight-line chunks, not a fori_loop: on the axon remote
    # compiler each additional while loop adds MINUTES of compile time
    # (measured 58s for one loop, 340s for two at n=30), while the
    # unrolled form compiles fast and XLA's copy insertion still performs
    # every dynamic_update_slice in place (the carried state stays one
    # buffer; peak = state + 2 chunk temps).
    for i in range(chunks):
        starts = [jnp.int32(0)] * x.ndim
        starts[tax] = i * width
        blk = jax.lax.dynamic_slice(x, starts, sizes)
        blk = apply_fn(blk)
        x = jax.lax.dynamic_update_slice(x, blk, starts)
    return x


def execute_group_plan_chunked(plan, operands, program, params, dtype,
                               x: jnp.ndarray, n_chunks: int) -> jnp.ndarray:
    """Run every plan step on the planar state ``x`` with each pass chunked
    along an uninvolved axis (in-place fori_loop carry). Identical math to
    ``plan.execute_group_plan``; only the memory schedule differs."""
    rank = len(plan.layout.axis_sizes)
    axis_stacks, cross_ops, diag_ops = operands

    for step in plan.steps:
        if isinstance(step, AxisMatmulStep):
            op = axis_stacks[step.axis][step.op_index]
            spec = _dense_spec(rank, step.axis)
            x = _chunked_pass(
                x, {step.axis}, n_chunks,
                lambda blk, op=op, spec=spec: jnp.einsum(
                    spec, op, blk, precision=_HI))
        elif isinstance(step, CrossStep):
            def cross_fn(blk, step=step):
                bshape = blk.shape[1:]
                new_shape, bit_axis = _split_axis_bit(
                    bshape, step.slice_axis, step.slice_pos)
                o = step.op_axis + (2 if step.op_axis > step.slice_axis
                                    else 0)
                xr = blk.reshape((2,) + new_shape)
                xr = jnp.einsum(_cross_spec(len(new_shape), bit_axis, o),
                                cross_ops[step.index], xr, precision=_HI)
                return xr.reshape(blk.shape)

            x = _chunked_pass(x, {step.slice_axis, step.op_axis}, n_chunks,
                              cross_fn)
        elif isinstance(step, DiagPairStep):
            spec = _diag_spec(rank, step.axis_a, step.axis_b)
            d = diag_ops[step.index]
            x = _chunked_pass(
                x, {step.axis_a, step.axis_b}, n_chunks,
                lambda blk, d=d, spec=spec: jnp.einsum(
                    spec, d, blk, precision=_HI))
        else:  # GenericStep: a 3-group gate — whole-state fallback. These
            # cannot appear in brickwork/QFT workloads; at n >= 30 the
            # complex round-trip would exceed HBM, which is acceptable for
            # the rare generic case.
            from .apply import apply_gate

            op = program.ops[step.program_op]
            u = program.op_matrix(op, params, dtype)
            flat = (x[0] + 1j * x[1]).reshape(-1).astype(dtype)
            flat = apply_gate(flat, u, op.targets, plan.layout.num_qubits)
            shaped = flat.reshape(tuple(plan.layout.axis_sizes))
            x = jnp.stack([jnp.real(shaped).astype(jnp.float32),
                           jnp.imag(shaped).astype(jnp.float32)])
    return x


def group_forward_planar_body(program, params, dtype=None,
                              n_chunks: int | None = None) -> jnp.ndarray:
    """Traceable forward pass returning the PLANAR (2, *axis_sizes) f32
    state — the n >= 30 entry point (no complex copy is ever built).
    ``n_chunks=None`` picks the memory schedule from the qubit count."""
    dtype = dtype or CONFIG.dtype
    plan = get_group_plan(program)
    operands = build_group_operands(program, plan, params, dtype)
    x = _planar_basis_state(plan.layout, program.initial_index)
    if n_chunks is None:
        n_chunks = auto_chunks(program.num_qubits)
    if n_chunks > 1:
        return execute_group_plan_chunked(plan, operands, program, params,
                                          dtype, x, n_chunks)
    from .plan import execute_group_plan

    return execute_group_plan(plan, operands, program, params, dtype, x)


def planar_probabilities(x: jnp.ndarray) -> jnp.ndarray:
    """|amp|^2 vector (2^n,) f32 from a planar state — half the memory of
    going through a complex copy."""
    return (x[0] * x[0] + x[1] * x[1]).reshape(-1)


def planar_norm_sq(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * x)
