"""In-place Pallas TPU kernels for group-plan steps.

The XLA einsum executor pays two structural costs at large ``n``:

* every matmul step allocates a fresh whole-state output next to its
  input (2x state peak -> the n >= 30 memory cliff that forces the
  chunked slice/update schedule and its (2k+4)/2k traffic overhead);
* measured on-chip (ROADMAP.md): ANY matmul/transpose-shaped XLA pass
  over a 4 GiB state runs at ~264 GB/s effective while a pure
  elementwise stream reaches ~438 GB/s -- the dot/copy emitters' tile
  traversal costs ~1.66x the streaming floor regardless of K (8..256),
  precision (HIGH vs HIGHEST), or contraction axis.

A Pallas grid kernel with ``input_output_aliases`` fixes both at once:
each program DMAs one block to VMEM, contracts it against the (tiny)
operator, and writes it back to the SAME buffer. Measured at n=30
(f32 real state, axis contraction K=128): 22.1 ms/pass vs 32.5 ms for
the XLA einsum IN ISOLATION, within 2.4e-7 of the einsum result, ~1 s
Mosaic compile (the round-2 whole-circuit-in-one-kernel design paid
205-306 s compiles and was abandoned; per-step kernels with operators
passed as arguments compile in seconds and cache per shape).

**Evaluated and DEFAULT-OFF** (``CONFIG.pallas_steps``): in the whole-
circuit context the isolated win inverts — XLA schedules consecutive
whole-state einsums at ~22 ms/pass effective (n=30 depth-8 brickwork:
416 ms all-XLA vs 505 ms with Pallas dense steps, 560 ms all-Pallas;
n=31 windowed XLA and all-Pallas tie at ~982 ms), because each
``pallas_call`` is an opaque boundary to XLA's fusion/pipelining. The
module stays correct (CPU-interpreter tests + on-chip exact matches)
as the starting point if Mosaic or the runtime changes the tradeoff.

Only dense (AxisMatmulStep) and cross (CrossStep) matmul steps lower
here -- they carry the matmul-pass penalty and the 2x-state peak.
Diagonal/broadcast steps are already streaming-rate elementwise fusions
in XLA, and exact-SWAP bit pairs fuse into one XLA transpose; both keep
their existing paths (under chunk windows where memory demands).

Unsupported shapes return ``None`` and the caller falls back to the XLA
einsum form, so enabling this module can never change reachability.

Reference anchor: the per-gate ``np.tensordot`` hot loop this replaces
is ``/root/reference/quantum_sim/engine/state_vector.py:41-74``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CONFIG

_HI = lax.Precision.HIGHEST

#: Flip in tests to validate kernels on CPU via the Pallas interpreter.
INTERPRET = False

#: Target state-block footprint (f32 elements). 2^17 * 4 B = 512 KiB per
#: buffer; with Pallas' double buffering the state blocks stay ~2 MiB,
#: far inside VMEM, while blocks stay large enough to amortize per-
#: program overhead.
_BLOCK_ELEMS = 1 << 17

#: Hard cap on a single state block (f32 elements): 1 MiB * 4. Plans
#: whose mandatory span (contraction axes + minor axis) exceeds this are
#: not lowered (e.g. a cross between two non-minor 128-wide axes).
_BLOCK_CAP = 1 << 20


def enabled() -> bool:
    """Pallas step kernels are TPU-only (Mosaic); CPU tests exercise the
    kernels explicitly through ``INTERPRET``."""
    if INTERPRET:
        return True
    return bool(getattr(CONFIG, "pallas_steps", True)) \
        and jax.default_backend() == "tpu"


def _plan_blocks(dshape: tuple[int, ...], span: set[int],
                 fill: int | None = None):
    """Choose per-dim block extents for a state of data shape ``dshape``:
    ``span`` dims and the minor dim are taken whole (TPU lane rule), the
    second-minor is 8-tiled when not spanned (sublane rule), and — when
    ``fill`` is given — other dims grow greedily toward ``fill`` elems.
    Only the single-temporary dense-real kernel uses a fill; kernels
    with many live block-sized temporaries (complex planes, cross
    quadrants) must stay at their mandatory span or Mosaic's 16 MiB
    scoped-VMEM stack overflows (measured: a complex cross with 8x-fill
    blocks hit 19.5 MiB). Returns ``(extents, grid, grid_dims)`` or
    None when the mandatory span alone exceeds ``_BLOCK_CAP``."""
    r = len(dshape)
    extents = [1] * r
    for i in span:
        extents[i] = dshape[i]
    extents[r - 1] = dshape[r - 1]
    if r >= 2 and extents[r - 2] == 1:
        extents[r - 2] = dshape[r - 2] if dshape[r - 2] < 8 else 8

    def elems() -> int:
        return int(np.prod(extents))

    if elems() > _BLOCK_CAP:
        return None
    if fill:
        for i in range(r - 3, -1, -1):
            while extents[i] < dshape[i] and elems() * 2 <= fill:
                extents[i] *= 2
    grid_dims = [i for i in range(r) if extents[i] < dshape[i]]
    grid = tuple(dshape[i] // extents[i] for i in grid_dims)
    return extents, grid, grid_dims


def _shrink_leading(dshape, extents, upto: int, keep: set[int]):
    """Force extent 1 on every dim before ``upto`` not in ``keep`` (the
    leading-matrix reshape needs the contraction dim to be the first
    non-unit block dim), then recompute the grid."""
    for i in range(upto):
        if i not in keep:
            extents[i] = 1
    grid_dims = [i for i in range(len(dshape)) if extents[i] < dshape[i]]
    grid = tuple(dshape[i] // extents[i] for i in grid_dims)
    return extents, grid, grid_dims


def _index_map(r: int, grid_dims: list[int], lead: int):
    def idx(*gids):
        full = [0] * (lead + r)
        for g, i in zip(gids, grid_dims):
            full[lead + i] = g
        return tuple(full)
    return idx


def _call(kernel, x, ops: list, bshape, grid, idx):
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ops]
    bspec = pl.BlockSpec(tuple(bshape), idx)
    kwargs = {}
    if not INTERPRET:
        # The default scoped-VMEM stack limit is 16 MiB; quadrant-heavy
        # kernels (complex cross: 8 sector mats + 8 dot partials) need
        # more live block-sized values than that at their mandatory
        # block span. v5e VMEM is larger than the default scope — lift
        # the cap rather than shrinking blocks below the lane/sublane
        # minimum.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=grid if grid else (1,),
        in_specs=specs + [bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        input_output_aliases={len(ops): 0},
        interpret=INTERPRET,
        **kwargs,
    )(*ops, x)
    return out


def _mm(u, m, leading: bool):
    """``u @ m`` (leading) or ``m @ u^T`` (trailing) at full precision."""
    if leading:
        return lax.dot_general(u, m, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)
    return lax.dot_general(m, u, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=_HI)


# ---------------------------------------------------------------------------
# Dense axis matmul
# ---------------------------------------------------------------------------

def lower_dense(dshape: tuple[int, ...], axis: int, op_real: bool,
                planar: bool):
    """In-place ``op @ state`` over one tensor axis. Returns
    ``fn(x, op) -> x`` or None. ``op`` is (S, S) f32 when ``op_real``
    else the planar-blocked (2, 2, S, S)."""
    r = len(dshape)
    S = dshape[axis]
    pb = _plan_blocks(dshape, {axis},
                      fill=_BLOCK_ELEMS if not planar and op_real
                      else None)
    if pb is None:
        return None
    extents, grid, grid_dims = pb
    leading = axis != r - 1
    if leading:
        extents, grid, grid_dims = _shrink_leading(dshape, extents, axis,
                                                   {axis})
    lead = 1 if planar else 0
    bshape = ([2] if planar else []) + extents
    dblock = tuple(extents)
    idx = _index_map(r, grid_dims, lead)

    def kernel(u_ref, x_ref, o_ref):
        def mat(v):
            return v.reshape(S, -1) if leading else v.reshape(-1, S)

        if planar and not op_real:
            ure, uim = u_ref[0, 0], u_ref[1, 0]
            mre, mim = mat(x_ref[0]), mat(x_ref[1])
            o_ref[0] = (_mm(ure, mre, leading)
                        - _mm(uim, mim, leading)).reshape(dblock)
            o_ref[1] = (_mm(ure, mim, leading)
                        + _mm(uim, mre, leading)).reshape(dblock)
        elif planar:
            u = u_ref[:]
            o_ref[0] = _mm(u, mat(x_ref[0]), leading).reshape(dblock)
            o_ref[1] = _mm(u, mat(x_ref[1]), leading).reshape(dblock)
        else:
            o_ref[...] = _mm(u_ref[:], mat(x_ref[...]),
                             leading).reshape(tuple(bshape))

    def fn(x, op):
        return _call(kernel, x, [op], bshape, grid, idx)

    return fn


# ---------------------------------------------------------------------------
# Cross step (one sliced bit x one full op axis)
# ---------------------------------------------------------------------------

def lower_cross(dshape: tuple[int, ...], slice_axis: int, slice_pos: int,
                op_axis: int, op_real: bool, planar: bool):
    """In-place blocked-cross contraction. The sliced bit is exposed as
    its own view dim when ``slice_axis`` is not among the last two dims
    (free reshape); for ``slice_axis == r-2`` the bit is split inside
    the kernel (VMEM sublane regroup). ``slice_axis == r-1`` (bit inside
    the lane dim) is not lowered. Returns ``fn(x, cop) -> x`` or None;
    ``cop`` is (2, S, 2, S) f32 when ``op_real`` else (2, 2, 2, S, 2, S)
    planar-blocked, indexed (i, y, k, x)."""
    r = len(dshape)
    S = dshape[op_axis]
    if slice_axis == r - 1:
        return None
    bits = dshape[slice_axis].bit_length() - 1
    in_kernel_bit = slice_axis == r - 2
    if in_kernel_bit:
        vshape = dshape
        span = {slice_axis, op_axis}
        bit_dim = None
        o_v = op_axis
        pre = 1 << slice_pos
        post = 1 << (bits - slice_pos - 1)
    else:
        pre = 1 << slice_pos
        post = 1 << (bits - slice_pos - 1)
        vshape = (dshape[:slice_axis] + (pre, 2, post)
                  + dshape[slice_axis + 1:])
        bit_dim = slice_axis + 1
        o_v = op_axis + 2 if op_axis > slice_axis else op_axis
        span = {bit_dim, o_v}
    rv = len(vshape)
    pb = _plan_blocks(vshape, span)  # no fill: many live temps
    if pb is None:
        return None
    extents, grid, grid_dims = pb
    leading = o_v != rv - 1
    if leading:
        keep = span
        extents, grid, grid_dims = _shrink_leading(vshape, extents, o_v,
                                                   keep)
    lead = 1 if planar else 0
    bshape = ([2] if planar else []) + extents
    idx = _index_map(rv, grid_dims, lead)

    def split_bit(v):
        """(v0, v1): the two sliced-bit sectors of a data block."""
        if in_kernel_bit:
            s = v.shape
            w = v.reshape(s[:slice_axis] + (pre, 2, post) + s[slice_axis + 1:])
            return (lax.index_in_dim(w, 0, axis=slice_axis + 1,
                                     keepdims=False),
                    lax.index_in_dim(w, 1, axis=slice_axis + 1,
                                     keepdims=False))
        return (lax.index_in_dim(v, 0, axis=bit_dim, keepdims=False),
                lax.index_in_dim(v, 1, axis=bit_dim, keepdims=False))

    def join_bit(y0, y1, dblock):
        ax = slice_axis + 1 if in_kernel_bit else bit_dim
        return jnp.stack([y0, y1], axis=ax).reshape(dblock)

    def kernel(c_ref, x_ref, o_ref):
        dblock = tuple(extents)

        def sector_mats(v):
            v0, v1 = split_bit(v)
            shape0 = v0.shape
            if leading:
                return v0.reshape(S, -1), v1.reshape(S, -1), shape0
            return v0.reshape(-1, S), v1.reshape(-1, S), shape0

        if planar and not op_real:
            cre, cim = c_ref[0, 0], c_ref[1, 0]   # (2, S, 2, S)
            r0, r1, s0 = sector_mats(x_ref[0])
            i0, i1, _ = sector_mats(x_ref[1])
            rs, ims = (r0, r1), (i0, i1)
            yre, yim = [], []
            for i in (0, 1):
                ar = sum(_mm(cre[i, :, k, :], rs[k], leading)
                         - _mm(cim[i, :, k, :], ims[k], leading)
                         for k in (0, 1))
                ai = sum(_mm(cre[i, :, k, :], ims[k], leading)
                         + _mm(cim[i, :, k, :], rs[k], leading)
                         for k in (0, 1))
                yre.append(ar.reshape(s0))
                yim.append(ai.reshape(s0))
            o_ref[0] = join_bit(yre[0], yre[1], dblock)
            o_ref[1] = join_bit(yim[0], yim[1], dblock)
        else:
            c = c_ref[:]                           # (2, S, 2, S)

            def apply_plane(v):
                m0, m1, s0 = sector_mats(v)
                ms = (m0, m1)
                ys = [sum(_mm(c[i, :, k, :], ms[k], leading)
                          for k in (0, 1)).reshape(s0) for i in (0, 1)]
                return join_bit(ys[0], ys[1], dblock)

            if planar:
                o_ref[0] = apply_plane(x_ref[0])
                o_ref[1] = apply_plane(x_ref[1])
            else:
                o_ref[...] = apply_plane(x_ref[...])

    def fn(x, cop):
        lead_shape = x.shape[:lead]
        xr = x.reshape(lead_shape + vshape)
        out = _call(kernel, xr, [cop], bshape, grid, idx)
        return out.reshape(x.shape)

    return fn


# ---------------------------------------------------------------------------
# Step dispatch (shared by the whole-state and chunked executors)
# ---------------------------------------------------------------------------

def maybe_lower_step(plan, step, operands, planar: bool):
    """``fn(x) -> x`` executing ``step`` in place via Pallas, or None to
    keep the XLA lowering. Never raises: any unsupported geometry falls
    back.

    Gated to rank-5 layouts (n >= 29): measured per-pass on chip, XLA's
    einsum already runs at the ~438 GB/s streaming rate on rank-4 states
    (n=28: 4.7 ms/pass) but degrades to ~264 GB/s once a small leading
    group axis appears (n=30: 32.5 ms vs the kernel's 22.1 ms) — and at
    n >= 30 the in-place aliasing is what keeps the whole-state schedule
    inside HBM at all."""
    from .plan import AxisMatmulStep, CrossStep

    dshape = tuple(plan.layout.axis_sizes)
    if len(dshape) < 5 and not INTERPRET:
        return None
    axis_stacks, cross_ops = operands[0], operands[1]
    if isinstance(step, AxisMatmulStep):
        real = plan.dense_real[step.axis][step.op_index]
        fn = lower_dense(dshape, step.axis, real, planar)
        if fn is None:
            return None
        op = axis_stacks[step.axis][step.op_index]
        op = op[0, 0] if real else op
        return lambda x: fn(x, op)
    if isinstance(step, CrossStep):
        real = plan.cross_real[step.index]
        fn = lower_cross(dshape, step.slice_axis, step.slice_pos,
                         step.op_axis, real, planar)
        if fn is None:
            return None
        cop = cross_ops[step.index]
        cop = cop[0, 0] if real else cop
        return lambda x: fn(x, cop)
    return None
