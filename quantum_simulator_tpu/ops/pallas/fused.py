"""Fused whole-circuit Pallas kernel: the state never leaves VMEM.

The XLA path pays one HBM round-trip of the full 2^n amplitude vector per
gate. This kernel reads the state ONCE, applies the entire compiled gate
program against VMEM-resident data, and writes it back ONCE — the
theoretical bandwidth floor for circuit application.

Data layout: complex amplitudes as planar float32 (re, im) matrices of
shape (2^(n-7), 128). With qubit 0 = MSB, the LAST 7 qubits index the lane
dimension and the first n-7 qubits the sublane/row dimension. Gate taxonomy:

* **lane gates** (all targets in the last 7 qubits): embedded into a
  128x128 "lane operator"; application = complex matmul on the MXU
  (4 real (R,128)x(128,128) dots). Consecutive lane gates are COMPOSED
  into one operator in the XLA prelude before the kernel runs.
* **row gates** (all targets in the first n-7 qubits): 2^k x 2^k scalar
  table; application = elementwise VPU combines of row-sliced sub-blocks.
* **mixed gates** (row + lane targets): block decomposition — a
  2^kr x 2^kr grid of 128x128 lane operators; application = grid of
  complex matmuls combined across row-bit slices.

The per-gate operators/scalars are built INSIDE jit from the program's
parameter vector (XLA prelude), so parameter edits don't recompile the
kernel. The kernel body itself is generated per circuit structure and
cached by the program's compile key.

Reference hot loop being replaced:
``/root/reference/quantum_sim/engine/state_vector.py:41-74`` (per-gate
``np.tensordot`` + transpose, one full state round-trip per gate).
"""

from __future__ import annotations

import string
from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import CONFIG
from .. import program as prog

LANE_BITS = 7
LANES = 1 << LANE_BITS

_F32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Plan construction (host side, static per circuit structure)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _LaneStep:
    """One kernel step backed by lane-operator matmuls.

    ``row_targets``: global qubit ids living in the row dimension (k_r of
    them); the operator grid has 2^k_r x 2^k_r lane ops stored at
    ``base .. base + 4^k_r`` in the stacked lane tensor.
    """

    row_targets: tuple[int, ...]
    base: int


@dataclass(frozen=True)
class _RowStep:
    """One kernel step on row qubits only: scalar-table combine."""

    row_targets: tuple[int, ...]
    scalar_base: int  # index into the (S, 2) scalar table


@dataclass(frozen=True)
class _FusedPlan:
    num_qubits: int
    steps: tuple
    num_lane_ops: int
    num_scalars: int
    # (op_index_in_program, ...) metadata for the prelude builder
    prelude: tuple


def _split_targets(targets: tuple[int, ...], n: int):
    row = tuple(t for t in targets if t < n - LANE_BITS)
    lane = tuple(t for t in targets if t >= n - LANE_BITS)
    return row, lane


def build_plan(program: prog.CircuitProgram) -> _FusedPlan:
    """Lower a circuit program to fused-kernel steps.

    Consecutive pure-lane gates collapse into one lane operator (composed
    in the prelude); everything else becomes its own step.
    """
    n = program.num_qubits
    steps: list = []
    prelude: list = []
    lane_ops = 0
    scalars = 0
    pending_lane: list[int] = []  # program op indices to compose

    def flush_lane():
        nonlocal lane_ops
        if pending_lane:
            steps.append(_LaneStep(row_targets=(), base=lane_ops))
            prelude.append(("compose_lane", tuple(pending_lane), lane_ops))
            lane_ops += 1
            pending_lane.clear()

    for oi, op in enumerate(program.ops):
        row, lane = _split_targets(op.targets, n)
        if not row:
            pending_lane.append(oi)
            continue
        flush_lane()
        if not lane:
            k = len(row)
            steps.append(_RowStep(row_targets=row, scalar_base=scalars))
            prelude.append(("row_scalars", oi, scalars))
            scalars += 4**k
        else:
            kr = len(row)
            grid = 1 << kr
            steps.append(_LaneStep(row_targets=row, base=lane_ops))
            prelude.append(("block_lane", oi, lane_ops))
            lane_ops += grid * grid
    flush_lane()

    return _FusedPlan(num_qubits=n, steps=tuple(steps),
                      num_lane_ops=max(1, lane_ops),
                      num_scalars=max(1, scalars),
                      prelude=tuple(prelude))


# ---------------------------------------------------------------------------
# XLA prelude: build lane operators / scalar tables from traced matrices
# ---------------------------------------------------------------------------

def _embed_lane_op(u: jnp.ndarray, lane_positions: tuple[int, ...]
                   ) -> jnp.ndarray:
    """Embed a 2^k x 2^k operator acting on the given lane-bit positions
    (0 = most significant of the 7 lane bits) into a 128x128 operator."""
    k = len(lane_positions)
    u_t = u.reshape((2,) * (2 * k))
    letters = string.ascii_lowercase
    out_l = [None] * LANE_BITS
    in_l = [None] * LANE_BITS
    operands = [u_t]
    specs = []
    li = 0
    # target bits take the operator's axes
    u_out = []
    u_in = []
    for p in lane_positions:
        out_l[p] = letters[li]
        u_out.append(letters[li])
        li += 1
        in_l[p] = letters[li]
        u_in.append(letters[li])
        li += 1
    specs.append("".join(u_out) + "".join(u_in))
    eye = jnp.eye(2, dtype=u.dtype)
    for b in range(LANE_BITS):
        if out_l[b] is None:
            out_l[b] = letters[li]
            li += 1
            in_l[b] = letters[li]
            li += 1
            operands.append(eye)
            specs.append(out_l[b] + in_l[b])
    spec = ",".join(specs) + "->" + "".join(out_l) + "".join(in_l)
    full = jnp.einsum(spec, *operands, precision=_HI)
    return full.reshape(LANES, LANES)


def _ordered_gate_tensor(u: jnp.ndarray, targets: tuple[int, ...],
                         order: list[int]) -> jnp.ndarray:
    """Permute gate tensor axes to the given target order."""
    k = len(targets)
    g = u.reshape((2,) * (2 * k))
    if order != list(range(k)):
        perm = tuple(order) + tuple(k + i for i in order)
        g = g.transpose(perm)
    return g.reshape(1 << k, 1 << k)


def build_operands(program: prog.CircuitProgram, plan: _FusedPlan, params,
                   dtype=jnp.complex64):
    """(lane_re, lane_im, scalars) tensors for the kernel, traced from the
    parameter vector."""
    n = program.num_qubits
    lane_ops = [None] * plan.num_lane_ops
    scalar_rows = [None] * plan.num_scalars

    for item in plan.prelude:
        kind = item[0]
        if kind == "compose_lane":
            _, op_indices, base = item
            combined = None
            for oi in op_indices:
                op = program.ops[oi]
                u = program.op_matrix(op, params, dtype)
                lane_pos = tuple(t - (n - LANE_BITS) for t in op.targets)
                full = _embed_lane_op(u, lane_pos)
                combined = full if combined is None else jnp.matmul(
                    full, combined, precision=_HI)
            lane_ops[base] = combined
        elif kind == "row_scalars":
            _, oi, base = item
            op = program.ops[oi]
            row, _ = _split_targets(op.targets, n)
            order = sorted(range(len(op.targets)),
                           key=lambda i: op.targets[i])
            u = _ordered_gate_tensor(
                program.op_matrix(op, params, dtype), op.targets, order)
            k = len(row)
            flat = u.reshape(-1)  # row-major (out, in)
            for j in range(4**k):
                scalar_rows[base + j] = jnp.stack(
                    [jnp.real(flat[j]), jnp.imag(flat[j])])
        elif kind == "block_lane":
            _, oi, base = item
            op = program.ops[oi]
            row, lane = _split_targets(op.targets, n)
            # order: row targets (sorted) first, then lane targets (sorted)
            sorted_all = sorted(row) + sorted(lane)
            order = [op.targets.index(q) for q in sorted_all]
            u = _ordered_gate_tensor(
                program.op_matrix(op, params, dtype), op.targets, order)
            kr, kl = len(row), len(lane)
            gr, gl = 1 << kr, 1 << kl
            u4 = u.reshape(gr, gl, gr, gl)
            lane_pos = tuple(q - (n - LANE_BITS) for q in sorted(lane))
            for r_out in range(gr):
                for r_in in range(gr):
                    lane_ops[base + r_out * gr + r_in] = _embed_lane_op(
                        u4[r_out, :, r_in, :], lane_pos)

    lane_stack = jnp.stack([
        op if op is not None else jnp.zeros((LANES, LANES), dtype)
        for op in lane_ops
    ])
    scalar_stack = jnp.stack([
        s if s is not None else jnp.zeros(2, _F32) for s in scalar_rows
    ]).astype(_F32)
    return (jnp.real(lane_stack).astype(_F32),
            jnp.imag(lane_stack).astype(_F32), scalar_stack)


# ---------------------------------------------------------------------------
# Kernel body generation
# ---------------------------------------------------------------------------

def _row_axis_split(x, row_targets: tuple[int, ...], n: int):
    """Reshape (R, 128) so each row-target bit is its own axis. Returns
    (reshaped, combo_indexer) where combo_indexer(arr, combo) slices the
    sub-block for a row-bit combination."""
    n_row = n - LANE_BITS
    # Row-bit position of qubit q (qubit 0 = MSB of the row index):
    positions = sorted(q for q in row_targets)  # qubit ids, ascending
    shape = []
    prev = -1
    axis_of_bit = []
    for q in positions:
        seg = q - prev - 1
        shape.append(1 << seg)
        axis_of_bit.append(len(shape))
        shape.append(2)
        prev = q
    shape.append(1 << (n_row - positions[-1] - 1))
    shape.append(LANES)
    xr = x.reshape(shape)

    def slicer(arr, combo: tuple[int, ...]):
        idx = [slice(None)] * len(shape)
        for ax, b in zip(axis_of_bit, combo):
            idx[ax] = b
        return arr[tuple(idx)]

    return xr, slicer, shape, axis_of_bit


def _assemble(parts: dict, shape, axis_of_bit, k: int):
    """Inverse of the slicer: stack 2^k sub-blocks back."""
    # Recursively stack along each split axis (innermost bit last).
    def rec(prefix: tuple[int, ...], depth: int):
        if depth == k:
            return parts[prefix]
        return jnp.stack([rec(prefix + (0,), depth + 1),
                          rec(prefix + (1,), depth + 1)],
                         axis=axis_of_bit[depth] - depth)
        # NOTE: after slicing, downstream axes shift left by the number of
        # consumed split axes; stacking back restores them outer-to-inner.

    return rec((), 0)


def _complex_matmul(xre, xim, lre, lim):
    """(..., 128) x (128, 128) complex matmul, contracting the lane dim
    with the operator's INPUT index (operator layout [out, in])."""
    nd = xre.ndim
    dn = (((nd - 1,), (1,)), ((), ()))
    mm = partial(jax.lax.dot_general, dimension_numbers=dn,
                 preferred_element_type=_F32, precision=_HI)
    re = mm(xre, lre) - mm(xim, lim)
    im = mm(xre, lim) + mm(xim, lre)
    return re, im


def _lane_consumption_order(plan: _FusedPlan) -> list[int]:
    """Lane-op indices in the order the kernel consumes them."""
    seq: list[int] = []
    for step in plan.steps:
        if isinstance(step, _LaneStep):
            gr = 1 << len(step.row_targets)
            seq.extend(step.base + j for j in range(gr * gr))
    return seq


class _LaneStreamer:
    """Double-buffered HBM->VMEM streaming of lane operators.

    The consumption order is static, so each fetch starts the DMA for the
    NEXT operator while the current one is being used (classic two-slot
    pipeline; see the Pallas guide's double-buffering pattern).
    """

    def __init__(self, lane_re_ref, lane_im_ref, scratch_re, scratch_im,
                 sems, seq: list[int]):
        self.re_ref = lane_re_ref
        self.im_ref = lane_im_ref
        self.sre = scratch_re
        self.sim = scratch_im
        self.sems = sems
        self.seq = seq
        self.pos = 0
        if seq:
            self._start(0)

    def _start(self, i: int):
        slot = i % 2
        idx = self.seq[i]
        pltpu.make_async_copy(self.re_ref.at[idx], self.sre.at[slot],
                              self.sems.at[slot, 0]).start()
        pltpu.make_async_copy(self.im_ref.at[idx], self.sim.at[slot],
                              self.sems.at[slot, 1]).start()

    def _wait(self, i: int):
        slot = i % 2
        idx = self.seq[i]
        pltpu.make_async_copy(self.re_ref.at[idx], self.sre.at[slot],
                              self.sems.at[slot, 0]).wait()
        pltpu.make_async_copy(self.im_ref.at[idx], self.sim.at[slot],
                              self.sems.at[slot, 1]).wait()

    def fetch(self, idx: int):
        i = self.pos
        assert self.seq[i] == idx, "lane ops must be consumed in order"
        self._wait(i)
        if i + 1 < len(self.seq):
            self._start(i + 1)
        self.pos += 1
        slot = i % 2
        return self.sre[slot], self.sim[slot]


class _LaneResident:
    """Lane operators fully resident in VMEM: direct indexing."""

    def __init__(self, lane_re_ref, lane_im_ref):
        self.re_ref = lane_re_ref
        self.im_ref = lane_im_ref

    def fetch(self, idx: int):
        return self.re_ref[idx], self.im_ref[idx]


# Lane stacks above this size stream from HBM instead of living in VMEM.
_RESIDENT_LIMIT_BYTES = 4 * 2**20


def _lane_bytes(plan: _FusedPlan) -> int:
    return plan.num_lane_ops * LANES * LANES * 4 * 2


def _execute_plan(plan: _FusedPlan, lanes, scal_get, xre, xim):
    """Run every plan step against (xre, xim). ``lanes.fetch(i)`` yields
    the i-th lane operator planes; ``scal_get(i)`` a (re, im) scalar pair.
    Shared by the Pallas kernel and the pure-XLA executor."""
    n = plan.num_qubits

    def combos(k):
        return [tuple((c >> (k - 1 - j)) & 1 for j in range(k))
                for c in range(1 << k)]

    for step in plan.steps:
        if isinstance(step, _LaneStep) and not step.row_targets:
            lre, lim = lanes.fetch(step.base)
            xre, xim = _complex_matmul(xre, xim, lre, lim)
            continue

        kr = len(step.row_targets)
        gr = 1 << kr
        xr_re, slicer, shape, axes = _row_axis_split(xre, step.row_targets,
                                                     n)
        xr_im, _, _, _ = _row_axis_split(xim, step.row_targets, n)
        cs = combos(kr)
        in_re = {c: slicer(xr_re, c) for c in cs}
        in_im = {c: slicer(xr_im, c) for c in cs}
        out_re = {}
        out_im = {}
        for co, combo_o in enumerate(cs):
            acc_re = None
            acc_im = None
            for ci, combo_i in enumerate(cs):
                if isinstance(step, _LaneStep):
                    lre, lim = lanes.fetch(step.base + co * gr + ci)
                    re_p, im_p = _complex_matmul(
                        in_re[combo_i], in_im[combo_i], lre, lim)
                else:
                    gre, gim = scal_get(step.scalar_base + co * gr + ci)
                    re_p = gre * in_re[combo_i] - gim * in_im[combo_i]
                    im_p = gre * in_im[combo_i] + gim * in_re[combo_i]
                acc_re = re_p if acc_re is None else acc_re + re_p
                acc_im = im_p if acc_im is None else acc_im + im_p
            out_re[combo_o] = acc_re
            out_im[combo_o] = acc_im
        xre = _assemble(out_re, shape, axes, kr).reshape(xre.shape)
        xim = _assemble(out_im, shape, axes, kr).reshape(xim.shape)
    return xre, xim


def make_kernel(plan: _FusedPlan, streaming: bool) -> Callable:
    """Generate the kernel body for a circuit plan (static unroll)."""
    seq = _lane_consumption_order(plan)

    def kernel(scal_ref, lane_re_ref, lane_im_ref, xre_ref, xim_ref,
               ore_ref, oim_ref, *scratch):
        if streaming:
            scratch_re, scratch_im, sems = scratch
            lanes = _LaneStreamer(lane_re_ref, lane_im_ref,
                                  scratch_re, scratch_im, sems, seq)
        else:
            lanes = _LaneResident(lane_re_ref, lane_im_ref)
        xre, xim = _execute_plan(
            plan, lanes, lambda i: (scal_ref[i, 0], scal_ref[i, 1]),
            xre_ref[:], xim_ref[:])
        ore_ref[:] = xre
        oim_ref[:] = xim

    return kernel


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def plan_supports(program: prog.CircuitProgram) -> bool:
    """The plan decomposition handles any gate with <= 2 row targets
    (gates fully inside the 7 lane qubits may be up to 3-qubit)."""
    n = program.num_qubits
    if n < LANE_BITS + 1:
        return False
    for op in program.ops:
        row, _ = _split_targets(op.targets, n)
        if len(row) > 2:
            return False
    return True


def supports(program: prog.CircuitProgram) -> bool:
    """Whole-state-in-VMEM Pallas kernel eligibility."""
    return (plan_supports(program)
            and program.num_qubits <= CONFIG.pallas_max_qubits)


_FUSED_CACHE: dict[tuple, Callable] = {}


def plan_forward_fn(program: prog.CircuitProgram, dtype=None) -> Callable:
    """jitted ``f(params) -> complex state`` executing the fused PLAN with
    plain XLA ops (no Pallas): lane gates become uniform (R,128)x(128,128)
    dots, row gates elementwise combines. Compiles far faster than the
    per-gate einsum program at large n (uniform dot shapes, and dots are
    fusion barriers so XLA cannot build pathological mega-fusions) while
    doing strictly less memory traffic per step."""
    dtype = dtype or CONFIG.dtype
    key = ("plan-xla", program.compile_key, str(dtype))
    cached = _FUSED_CACHE.get(key)
    if cached is not None:
        return cached

    plan = build_plan(program)
    n = program.num_qubits
    rows = 1 << (n - LANE_BITS)

    class _Arrays:
        def __init__(self, lre, lim):
            self.lre = lre
            self.lim = lim

        def fetch(self, i):
            return self.lre[i], self.lim[i]

    def f(params):
        lane_re, lane_im, scalars = build_operands(program, plan, params,
                                                   dtype)
        init = jnp.zeros((rows, LANES), _F32)
        r0, c0 = divmod(program.initial_index, LANES)
        xre = init.at[r0, c0].set(1.0)
        xre, xim = _execute_plan(
            plan, _Arrays(lane_re, lane_im),
            lambda i: (scalars[i, 0], scalars[i, 1]), xre, init)
        return (xre + 1j * xim).reshape(-1).astype(dtype)

    fn = jax.jit(f)
    _FUSED_CACHE[key] = fn
    return fn


def fused_forward_fn(program: prog.CircuitProgram, dtype=None,
                     interpret: bool = False) -> Callable:
    """jitted ``f(params) -> complex state (2^n,)`` running the whole
    circuit inside one Pallas kernel."""
    dtype = dtype or CONFIG.dtype
    key = ("fused", program.compile_key, str(dtype), interpret)
    cached = _FUSED_CACHE.get(key)
    if cached is not None:
        return cached

    plan = build_plan(program)
    streaming = _lane_bytes(plan) > _RESIDENT_LIMIT_BYTES
    kernel = make_kernel(plan, streaming)
    n = program.num_qubits
    rows = 1 << (n - LANE_BITS)

    lane_space = pltpu.ANY if streaming else pltpu.VMEM
    scratch_shapes = []
    if streaming:
        scratch_shapes = [
            pltpu.VMEM((2, LANES, LANES), _F32),
            pltpu.VMEM((2, LANES, LANES), _F32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]

    call = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), _F32),
                   jax.ShapeDtypeStruct((rows, LANES), _F32)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=lane_space),
            pl.BlockSpec(memory_space=lane_space),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )

    def f(params):
        lane_re, lane_im, scalars = build_operands(program, plan, params,
                                                   dtype)
        init = jnp.zeros((rows, LANES), _F32)
        r0, c0 = divmod(program.initial_index, LANES)
        xre = init.at[r0, c0].set(1.0)
        xim = init
        ore, oim = call(scalars, lane_re, lane_im, xre, xim)
        return (ore + 1j * oim).reshape(-1).astype(dtype)

    fn = jax.jit(f)
    if len(_FUSED_CACHE) > 32:
        _FUSED_CACHE.pop(next(iter(_FUSED_CACHE)))
    _FUSED_CACHE[key] = fn
    return fn
