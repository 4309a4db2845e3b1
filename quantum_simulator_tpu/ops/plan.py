"""Group-matmul circuit executor: the large-n XLA workhorse.

The per-gate einsum program (``ops/apply.py``) moves the full 2^n state
through HBM once per gate and compiles pathologically at n >= 20 on
remote-compile TPU runtimes. This executor partitions the n qubits into
ceil(n/7) groups of <= 7 bits and views the state as a tensor with one
axis of size <= 128 per group. Then:

* any run of consecutive gates confined to ONE group composes (matmul of
  small operators) into a single <=128x128 operator, applied as ONE
  dot_general over that axis — a whole rotation column costs ceil(n/7)
  passes over the state instead of n;
* a gate spanning two groups slices one target's bit (2x2 block
  structure) and applies four embedded operators on the other group's
  axis;
* anything else (3 groups touched) falls back to the generic
  segmented-einsum apply for that gate only.

All matmuls share a handful of shapes, so XLA compiles quickly, and every
pass is a large MXU contraction — bandwidth-optimal per step. Operators
are built inside jit from the parameter vector (no recompile on edits).

Complex state is carried as planar float32 (re, im) so every dot is a real
MXU matmul with HIGHEST precision.
"""

from __future__ import annotations

import string
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CONFIG
from . import program as prog
from .apply import apply_gate

GROUP_BITS = 7

_F32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Layout
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GroupLayout:
    """Qubits -> tensor axes. Axis 0 is the MOST significant group (may
    hold fewer than 7 bits); the last axis holds the 7 least significant
    qubits. qubit 0 = MSB of the basis index (engine convention)."""

    num_qubits: int
    axis_sizes: tuple[int, ...]        # tensor shape, most significant first
    axis_bits: tuple[int, ...]         # bits per axis

    @classmethod
    def for_qubits(cls, n: int) -> "GroupLayout":
        bits = []
        rem = n
        while rem > 0:
            take = min(GROUP_BITS, rem)
            bits.append(take)
            rem -= take
        # built from least significant; reverse to MSB-first
        bits = tuple(reversed(bits))
        return cls(num_qubits=n, axis_sizes=tuple(1 << b for b in bits),
                   axis_bits=bits)

    def axis_of(self, qubit: int) -> int:
        """Axis index holding this qubit."""
        bitpos = self.num_qubits - 1 - qubit  # bit position from LSB
        group_from_lsb = bitpos // GROUP_BITS
        return len(self.axis_bits) - 1 - group_from_lsb

    def pos_in_axis(self, qubit: int) -> int:
        """MSB-first bit position of the qubit within its axis."""
        bitpos = self.num_qubits - 1 - qubit
        within = bitpos % GROUP_BITS
        ax = self.axis_of(qubit)
        return self.axis_bits[ax] - 1 - within


# ---------------------------------------------------------------------------
# Plan
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AxisMatmulStep:
    axis: int
    op_index: int   # into that axis's operator stack


@dataclass(frozen=True)
class CrossStep:
    """One sliced bit on ``slice_axis`` x embedded operators on ``op_axis``:
    out_block[i] = sum_k op[i*2+k] applied to in_block[k]."""

    slice_axis: int
    slice_pos: int          # MSB-first bit position within slice_axis
    op_axis: int
    op_base: int            # 4 consecutive ops in op_axis's stack


@dataclass(frozen=True)
class GenericStep:
    program_op: int         # fall back to segmented-einsum apply


@dataclass(frozen=True)
class GroupPlan:
    layout: GroupLayout
    steps: tuple
    ops_per_axis: tuple[int, ...]       # stack sizes
    prelude: tuple                       # operator-build recipe


def build_group_plan(program: prog.CircuitProgram) -> GroupPlan:
    layout = GroupLayout.for_qubits(program.num_qubits)
    n_axes = len(layout.axis_sizes)
    steps: list = []
    prelude: list = []
    counts = [0] * n_axes
    pending: dict[int, list[int]] = {}  # axis -> program op indices

    def flush(axis: int):
        if pending.get(axis):
            steps.append(AxisMatmulStep(axis=axis, op_index=counts[axis]))
            prelude.append(("compose", axis, tuple(pending[axis]),
                            counts[axis]))
            counts[axis] += 1
            pending[axis] = []

    def flush_all():
        for ax in range(n_axes):
            flush(ax)

    for oi, op in enumerate(program.ops):
        axes = sorted({layout.axis_of(q) for q in op.targets})
        if len(axes) == 1:
            ax = axes[0]
            # composing is only safe against pending ops on the SAME axis;
            # ops on other axes commute (disjoint qubit sets), so pending
            # stacks on other axes can stay open.
            pending.setdefault(ax, []).append(oi)
        elif len(axes) == 2 and len(op.targets) <= 3:
            # pick the axis with exactly one target bit to slice
            by_axis: dict[int, list[int]] = {}
            for q in op.targets:
                by_axis.setdefault(layout.axis_of(q), []).append(q)
            lone = [ax for ax in axes if len(by_axis[ax]) == 1]
            if not lone:
                flush_all()
                steps.append(GenericStep(program_op=oi))
                continue
            slice_axis = lone[0]
            op_axis = axes[0] if axes[0] != slice_axis else axes[1]
            flush(slice_axis)
            flush(op_axis)
            steps.append(CrossStep(
                slice_axis=slice_axis,
                slice_pos=layout.pos_in_axis(by_axis[slice_axis][0]),
                op_axis=op_axis,
                op_base=counts[op_axis]))
            prelude.append(("cross", oi, slice_axis, op_axis,
                            counts[op_axis]))
            counts[op_axis] += 4
        else:
            flush_all()
            steps.append(GenericStep(program_op=oi))

    flush_all()
    return GroupPlan(layout=layout, steps=tuple(steps),
                     ops_per_axis=tuple(max(1, c) for c in counts),
                     prelude=tuple(prelude))


# ---------------------------------------------------------------------------
# Operator building (inside jit, from the parameter vector)
# ---------------------------------------------------------------------------

_EMBED_MASKS: dict[tuple, np.ndarray] = {}


def _embed_masks(positions: tuple[int, ...], axis_bits: int) -> np.ndarray:
    """Static (4^k, S, S) 0/1 masks such that the embedding of a 2^k
    operator U at the given bit positions is sum_e U.flat[e] * masks[e].
    Cached per (positions, axis_bits) — these are compile-time constants,
    so the traced embedding is ONE small contraction per gate (keeps
    compile time linear in circuit depth)."""
    key = (positions, axis_bits)
    cached = _EMBED_MASKS.get(key)
    if cached is not None:
        return cached
    k = len(positions)
    dim = 1 << axis_bits
    masks = np.zeros((4**k, dim, dim), dtype=np.float32)
    # For each axis index pair (row, col): identity on non-target bits;
    # the target bits select which U entry contributes.
    idx = np.arange(dim)
    non_target_mask = 0
    for b in range(axis_bits):
        if b not in positions:
            non_target_mask |= 1 << (axis_bits - 1 - b)

    def target_code(v: int) -> int:
        code = 0
        for p in positions:
            code = (code << 1) | ((v >> (axis_bits - 1 - p)) & 1)
        return code

    for row in range(dim):
        cols = idx[(idx & non_target_mask) == (row & non_target_mask)]
        r_code = target_code(row)
        for col in cols:
            e = r_code * (1 << k) + target_code(int(col))
            masks[e, row, col] = 1.0
    _EMBED_MASKS[key] = masks
    return masks


def _embed_in_axis(u: jnp.ndarray, positions: tuple[int, ...],
                   axis_bits: int) -> jnp.ndarray:
    """Embed a 2^k operator acting on the given MSB-first bit positions of
    an ``axis_bits``-bit axis into a (2^axis_bits, 2^axis_bits) operator."""
    masks = jnp.asarray(_embed_masks(positions, axis_bits))
    flat = u.reshape(-1)
    re = jnp.tensordot(jnp.real(flat).astype(_F32), masks, axes=1)
    im = jnp.tensordot(jnp.imag(flat).astype(_F32), masks, axes=1)
    return (re + 1j * im).astype(u.dtype)


def build_group_operands(program: prog.CircuitProgram, plan: GroupPlan,
                         params, dtype):
    """Per-axis operator stacks (re, im) float32, traced from params."""
    layout = plan.layout
    stacks: list[list] = [[None] * c for c in plan.ops_per_axis]

    def gate_matrix(op, qubit_order):
        u = program.op_matrix(op, params, dtype)
        k = len(op.targets)
        g = u.reshape((2,) * (2 * k))
        order = [op.targets.index(q) for q in qubit_order]
        if order != list(range(k)):
            perm = tuple(order) + tuple(k + i for i in order)
            g = g.transpose(perm)
        return g.reshape(1 << k, 1 << k)

    for item in plan.prelude:
        if item[0] == "compose":
            _, axis, op_indices, slot = item
            bits = layout.axis_bits[axis]
            combined = None
            for oi in op_indices:
                op = program.ops[oi]
                qubits = sorted(op.targets,
                                key=lambda q: layout.pos_in_axis(q))
                u = gate_matrix(op, qubits)
                pos = tuple(layout.pos_in_axis(q) for q in qubits)
                full = _embed_in_axis(u, pos, bits)
                combined = full if combined is None else jnp.matmul(
                    full, combined, precision=_HI)
            stacks[axis][slot] = combined
        else:  # cross
            _, oi, slice_axis, op_axis, base = item
            op = program.ops[oi]
            bits = layout.axis_bits[op_axis]
            slice_qubits = [q for q in op.targets
                            if layout.axis_of(q) == slice_axis]
            op_qubits = sorted(
                (q for q in op.targets if layout.axis_of(q) == op_axis),
                key=lambda q: layout.pos_in_axis(q))
            # order: sliced qubit first (MSB of gate index), then op-axis
            # qubits by axis position
            u = gate_matrix(op, slice_qubits + op_qubits)
            kl = len(op_qubits)
            gl = 1 << kl
            u4 = u.reshape(2, gl, 2, gl)
            pos = tuple(layout.pos_in_axis(q) for q in op_qubits)
            for i in range(2):
                for k in range(2):
                    stacks[op_axis][base + i * 2 + k] = _embed_in_axis(
                        u4[i, :, k, :], pos, bits)

    out = []
    for axis, stack in enumerate(stacks):
        dim = layout.axis_sizes[axis]
        filled = [s if s is not None else jnp.zeros((dim, dim), dtype)
                  for s in stack]
        stacked = jnp.stack(filled)
        out.append((jnp.real(stacked).astype(_F32),
                    jnp.imag(stacked).astype(_F32)))
    return out


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------

def _axis_matmul(xre, xim, lre, lim, axis: int, rank: int):
    """Contract operator (S, S) with tensor axis ``axis``: out[..a..] =
    sum_b op[a, b] x[..b..], preserving axis order.

    The complex product is ONE real matmul on a doubled axis:
    [re|im] contracted with the 2S x 2S block operator
    [[L_re, -L_im], [L_im, L_re]] — halves the kernel count vs the naive
    4-matmul + 2-add formulation."""
    letters = string.ascii_lowercase
    subs = list(letters[:rank])
    in_sub = "".join(subs)
    op_out, op_in = letters[rank], subs[axis]
    out_subs = list(subs)
    out_subs[axis] = op_out
    spec = f"{op_out}{op_in},{in_sub}->{''.join(out_subs)}"

    s = lre.shape[0]
    x2 = jnp.concatenate([xre, xim], axis=axis)
    block = jnp.concatenate([
        jnp.concatenate([lre, -lim], axis=1),
        jnp.concatenate([lim, lre], axis=1),
    ], axis=0)
    out = jnp.einsum(spec, block, x2, precision=_HI)
    idx_re = [slice(None)] * rank
    idx_re[axis] = slice(0, s)
    idx_im = [slice(None)] * rank
    idx_im[axis] = slice(s, 2 * s)
    return out[tuple(idx_re)], out[tuple(idx_im)]


def _apply_cross(xre, xim, blocks, slice_axis: int, slice_pos: int,
                 op_axis: int, shape: tuple[int, ...]):
    """Cross-axis gate as ONE complex matmul: the sliced bit merges with
    the operator axis (out[i] = sum_k Op_ik in[k] is a matmul over the
    combined 2S space). ``blocks``[i][k] are the four (S, S) operators."""
    new_shape, bit_axis = _split_axis_bit(shape, slice_axis, slice_pos)
    xr = xre.reshape(new_shape)
    xi = xim.reshape(new_shape)
    o = op_axis + (2 if op_axis > slice_axis else 0)

    if bit_axis < o:
        dest = o - 1
    else:
        dest = o
    xr = jnp.moveaxis(xr, bit_axis, dest)
    xi = jnp.moveaxis(xi, bit_axis, dest)
    # bit now sits immediately left of the op axis at (dest, dest+1)
    moved_shape = xr.shape
    s = moved_shape[dest + 1]
    merged_shape = (moved_shape[:dest] + (2 * s,)
                    + moved_shape[dest + 2:])
    xr = xr.reshape(merged_shape)
    xi = xi.reshape(merged_shape)

    full = jnp.concatenate([
        jnp.concatenate([blocks[0][0], blocks[0][1]], axis=1),
        jnp.concatenate([blocks[1][0], blocks[1][1]], axis=1),
    ], axis=0)
    xr, xi = _axis_matmul(xr, xi, jnp.real(full).astype(_F32),
                          jnp.imag(full).astype(_F32), dest,
                          len(merged_shape))

    xr = xr.reshape(moved_shape)
    xi = xi.reshape(moved_shape)
    xr = jnp.moveaxis(xr, dest, bit_axis)
    xi = jnp.moveaxis(xi, dest, bit_axis)
    return xr.reshape(shape), xi.reshape(shape)


def _split_axis_bit(shape: tuple[int, ...], axis: int, pos: int):
    """New shape exposing bit ``pos`` (MSB-first) of ``axis`` as its own
    dimension; returns (new_shape, bit_axis_index)."""
    bits = shape[axis].bit_length() - 1
    # MSB-first position ``pos`` has weight 2^(bits-1-pos) within the axis.
    pre = 1 << pos                # bits above (more significant)
    post = 1 << (bits - pos - 1)  # bits below
    new_shape = shape[:axis] + (pre, 2, post) + shape[axis + 1:]
    return new_shape, axis + 1


def execute_group_plan(plan: GroupPlan, axis_ops, program, params, dtype,
                       xre, xim):
    """Run all steps. (xre, xim) are float32 tensors shaped
    ``plan.layout.axis_sizes``."""
    layout = plan.layout
    rank = len(layout.axis_sizes)

    for step in plan.steps:
        if isinstance(step, AxisMatmulStep):
            lre, lim = axis_ops[step.axis]
            xre, xim = _axis_matmul(xre, xim, lre[step.op_index],
                                    lim[step.op_index], step.axis, rank)
        elif isinstance(step, CrossStep):
            lre, lim = axis_ops[step.op_axis]
            blocks = [[(lre[step.op_base + i * 2 + k]
                        + 1j * lim[step.op_base + i * 2 + k])
                       for k in (0, 1)] for i in (0, 1)]
            xre, xim = _apply_cross(xre, xim, blocks, step.slice_axis,
                                    step.slice_pos, step.op_axis,
                                    tuple(layout.axis_sizes))
        else:  # GenericStep
            op = program.ops[step.program_op]
            u = program.op_matrix(op, params, dtype)
            flat = (xre + 1j * xim).reshape(-1).astype(dtype)
            flat = apply_gate(flat, u, op.targets, layout.num_qubits)
            shaped = flat.reshape(layout.axis_sizes)
            xre = jnp.real(shaped).astype(_F32)
            xim = jnp.imag(shaped).astype(_F32)

    return xre, xim


def apply_gate_grouped(xre, xim, u, targets: tuple[int, ...],
                       layout: GroupLayout, dtype):
    """Apply one gate to a group-layout (re, im) state pair.

    Single-axis gates embed + matmul; two-axis gates with a lone bit on
    one axis use the 2x2-block cross mechanism; anything else falls back
    to the flat segmented-einsum apply.
    """
    rank = len(layout.axis_sizes)
    axes = sorted({layout.axis_of(q) for q in targets})
    k = len(targets)

    def ordered(u, qubit_order):
        g = u.reshape((2,) * (2 * k))
        order = [list(targets).index(q) for q in qubit_order]
        if order != list(range(k)):
            perm = tuple(order) + tuple(k + i for i in order)
            g = g.transpose(perm)
        return g.reshape(1 << k, 1 << k)

    if len(axes) == 1:
        ax = axes[0]
        qubits = sorted(targets, key=lambda q: layout.pos_in_axis(q))
        full = _embed_in_axis(ordered(u, qubits),
                              tuple(layout.pos_in_axis(q) for q in qubits),
                              layout.axis_bits[ax])
        return _axis_matmul(xre, xim, jnp.real(full).astype(_F32),
                            jnp.imag(full).astype(_F32), ax, rank)

    by_axis: dict[int, list[int]] = {}
    for q in targets:
        by_axis.setdefault(layout.axis_of(q), []).append(q)
    lone = [ax for ax in axes if len(by_axis[ax]) == 1]
    if len(axes) == 2 and lone:
        slice_axis = lone[0]
        op_axis = axes[0] if axes[0] != slice_axis else axes[1]
        slice_q = by_axis[slice_axis][0]
        op_qubits = sorted(by_axis[op_axis],
                           key=lambda q: layout.pos_in_axis(q))
        u4 = ordered(u, [slice_q] + op_qubits).reshape(
            2, 1 << len(op_qubits), 2, 1 << len(op_qubits))
        pos = tuple(layout.pos_in_axis(q) for q in op_qubits)
        bits = layout.axis_bits[op_axis]
        blocks = [[_embed_in_axis(u4[i, :, j, :], pos, bits)
                   for j in (0, 1)] for i in (0, 1)]
        return _apply_cross(xre, xim, blocks, slice_axis,
                            layout.pos_in_axis(slice_q), op_axis,
                            tuple(layout.axis_sizes))

    # Generic fallback: flat complex apply.
    flat = (xre + 1j * xim).reshape(-1).astype(dtype)
    flat = apply_gate(flat, u, targets, layout.num_qubits)
    shaped = flat.reshape(layout.axis_sizes)
    return jnp.real(shaped).astype(_F32), jnp.imag(shaped).astype(_F32)


def _rho_q_grouped(xre, xim, q: int, layout: GroupLayout):
    """Single-qubit reduced density matrix from a planar group state."""
    ax = layout.axis_of(q)
    pos = layout.pos_in_axis(q)
    shape = tuple(layout.axis_sizes)
    new_shape, bit_axis = _split_axis_bit(shape, ax, pos)
    yr = jnp.moveaxis(xre.reshape(new_shape), bit_axis, 0).reshape(2, -1)
    yi = jnp.moveaxis(xim.reshape(new_shape), bit_axis, 0).reshape(2, -1)
    mm = lambda a, b: jnp.matmul(a, b.T, precision=_HI)
    rr = mm(yr, yr) + mm(yi, yi)
    ri = mm(yi, yr) - mm(yr, yi)
    return rr + 1j * ri


def group_trajectory_body(program: prog.CircuitProgram, noise_model,
                          params, key, dtype=None,
                          record_columns: bool = False):
    """Stochastic-Kraus trajectory over the group layout: the large-n
    counterpart of ``ops/program._trajectory_body`` (which rides the
    einsum path that stops compiling around n=20)."""
    dtype = dtype or CONFIG.dtype
    layout = GroupLayout.for_qubits(program.num_qubits)
    shape = layout.axis_sizes

    total_draws = 0
    for op in program.ops:
        total_draws += len(noise_model.kraus_stacks_for_gate(op.gate_name)) \
            * len(op.targets)
    keys = jax.random.split(key, max(1, total_draws))
    draw = 0

    xre = jnp.zeros(shape, _F32).reshape(-1).at[
        program.initial_index].set(1.0).reshape(shape)
    xim = jnp.zeros(shape, _F32)
    snapshots = []

    def combine(a, b):
        return (a + 1j * b).reshape(-1).astype(dtype)

    if record_columns:
        snapshots.append(combine(xre, xim))

    op_i = 0
    for col in range(program.num_columns):
        while (op_i < len(program.ops)
               and program.ops[op_i].column_index == col):
            op = program.ops[op_i]
            u = program.op_matrix(op, params, dtype)
            xre, xim = apply_gate_grouped(xre, xim, u, op.targets, layout,
                                          dtype)
            for kraus_np in noise_model.kraus_stacks_for_gate(op.gate_name):
                kraus = jnp.asarray(kraus_np, dtype=dtype)
                for q in op.targets:
                    # Branch probabilities from the 1q reduced density
                    # matrix (one cheap pass), then apply ONLY the drawn
                    # Kraus operator.
                    rho = _rho_q_grouped(xre, xim, q, layout)
                    norms = jnp.real(jnp.einsum(
                        "mij,jk,mik->m", kraus, rho, jnp.conj(kraus),
                        precision=_HI))
                    idx = jax.random.categorical(
                        keys[draw], jnp.log(norms + 1e-30))
                    k_sel = jnp.take(kraus, idx, axis=0)
                    xre, xim = apply_gate_grouped(xre, xim, k_sel, (q,),
                                                  layout, dtype)
                    inv = 1.0 / jnp.sqrt(jnp.maximum(
                        jnp.take(norms, idx), 1e-30))
                    xre = xre * inv
                    xim = xim * inv
                    draw += 1
            op_i += 1
        if record_columns:
            snapshots.append(combine(xre, xim))

    if record_columns:
        return jnp.stack(snapshots)
    return combine(xre, xim)


_PLAN_CACHE: dict[tuple, Callable] = {}
_BUILT_PLANS: dict[tuple, GroupPlan] = {}


def group_forward_body(program: prog.CircuitProgram, params, dtype=None):
    """Traceable forward pass via the group plan (compose into larger
    programs; ``group_forward_fn`` is its jitted form)."""
    dtype = dtype or CONFIG.dtype
    plan = _BUILT_PLANS.get(program.compile_key)
    if plan is None:
        plan = build_group_plan(program)
        if len(_BUILT_PLANS) > 128:
            _BUILT_PLANS.pop(next(iter(_BUILT_PLANS)))
        _BUILT_PLANS[program.compile_key] = plan
    axis_ops = build_group_operands(program, plan, params, dtype)
    shape = plan.layout.axis_sizes
    xre = jnp.zeros(shape, _F32).reshape(-1).at[
        program.initial_index].set(1.0).reshape(shape)
    xim = jnp.zeros(shape, _F32)
    xre, xim = execute_group_plan(plan, axis_ops, program, params, dtype,
                                  xre, xim)
    return (xre + 1j * xim).reshape(-1).astype(dtype)


def group_forward_fn(program: prog.CircuitProgram, dtype=None) -> Callable:
    """jitted ``f(params) -> complex state (2^n,)`` via the group-matmul
    plan. Handles EVERY circuit (generic per-gate fallback for the rare
    3-group gates)."""
    dtype = dtype or CONFIG.dtype
    key = ("group-plan", program.compile_key, str(dtype))
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached

    fn = jax.jit(lambda params: group_forward_body(program, params, dtype))
    if len(_PLAN_CACHE) > 64:
        _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    _PLAN_CACHE[key] = fn
    return fn
