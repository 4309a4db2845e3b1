"""General-Kraus noise trajectories as classical draws spliced into the
group plan — the state-DEPENDENT-channel counterpart of
``ops/unitary_traj.py``.

Every channel the reference ships (``/root/reference/quantum_sim/engine/
noise.py:27-104``) — and this framework's ThermalRelaxationNoise, and
projective measurement itself — has Kraus operators that are MONOMIAL in
the computational basis: at most one nonzero entry per column AND per
row (generalized permutation matrices, possibly with zero rows/columns).
Amplitude damping: ``K0 = diag(1, sqrt(1-g))``, ``K1 = sqrt(g)|0><1|``.
For such operators a basis state maps to a (scaled) basis state:
``K_m |j> = c_{m,j} |f_m(j)>``, so branch probabilities carry no
interference: ``||K_m psi||^2 = sum_j |c_{m,j}|^2 P(j)``.

The sampling trick that removes the per-gate whole-state passes of the
fold executor (``ops/bigtraj.py``, one pass per gate): introduce an
auxiliary basis sample ``b ~ |psi|^2``. Because trace preservation gives
``sum_m |c_{m,j}|^2 = 1`` for every basis value ``j``, the joint law

    P(b, m_1, .., m_S) = P(b) * prod_i w_{m_i}(b at site i's targets)

is a valid probabilistic model whose marginal over ``b`` is EXACTLY the
sequential stochastic-Kraus law (each ``p_i = ||K_m psi_i||^2`` drawn on
the state conditioned on all earlier draws): given ``b`` the sites
become independent classical draws, and same-qubit site chains update
``b`` through the static index maps ``f_m``. So a trajectory is:

* run a composition window of gates through the group plan (the same
  ~per-column einsum passes the ideal forward uses),
* draw ONE basis sample from the state (a hierarchical per-axis
  categorical — one fused reduction pass + tiny conditional slices),
* draw every pending noise site classically from static ``|c|^2``
  tables (scalar ops), and splice the chosen Kraus operators into the
  NEXT window's plan as operand overrides,

instead of one whole-state pass per gate. Window boundaries are placed
exactly where a later gate touches a pending site's target (per column
in layered circuits). Exactness proof sketch above; locked by tests
against the exact density-matrix engine and the per-gate trajectory
paths (distribution-level: this path consumes PRNG keys differently
from ``plan.group_trajectory_body`` — same trajectory LAW, not the same
per-key branch sequence).

Projective mid-circuit measurement is the monomial channel
``{diag(1,0), diag(0,1)}`` whose draw given ``b`` is deterministic
(outcome = the sampled bit), which gives ``monitored_trajectories`` a
group-plan engine at every n (the reference SKIPS measurement during
evolution, ``/root/reference/quantum_sim/engine/simulator.py:61-65``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import program as prog
from .bigtraj import trajectory_is_real
from .plan import (
    _AXIS_LETTERS,
    GroupLayout,
    OperandOverrides,
    _planar_basis_state,
    _real_basis_state,
    build_group_operands,
    execute_group_plan,
    get_group_plan,
)

# Classification dummies (see unitary_traj): the plan reads static_matrix
# for realness/diagonality; operand values come from OperandOverrides.
_DUMMY_R1 = np.array([[1.0, 1.0], [1.0, -1.0]]) / np.sqrt(2)
_DUMMY_C1 = np.array([[1.0, 1.0], [1.0j, -1.0j]]) / np.sqrt(2)

# Measurement pseudo-stack: projectors onto |0>/|1>.
_MEASURE_STACK = np.stack([np.diag([1.0, 0.0]), np.diag([0.0, 1.0])]
                          ).astype(np.complex128)


class MonomialStack(NamedTuple):
    """Static per-stack data for a monomial (m, D, D) Kraus stack."""

    kraus: np.ndarray        # (m, D, D) complex64 raw Kraus operators
    kraus_real: object       # (m, D, D) f32 phase-real forms, or None
    w2: np.ndarray           # (m, D) f32: |c_{m,j}|^2 per input value j
    fmap: np.ndarray         # (m, D) int32: f_m(j) (identity where c=0)


def monomial_stack(raw: np.ndarray) -> MonomialStack | None:
    """(m, D, D) Kraus stack -> MonomialStack when every operator is a
    generalized permutation matrix (<= 1 nonzero per column AND per row,
    so basis states map to scaled basis states with no interference) and
    the stack is trace-preserving; else None."""
    st = np.asarray(raw, np.complex128)
    if st.ndim != 3 or st.shape[1] != st.shape[2]:
        return None
    m, D, _ = st.shape
    w2 = np.zeros((m, D), np.float64)
    fmap = np.tile(np.arange(D, dtype=np.int32), (m, 1))
    for mi, K in enumerate(st):
        used_rows: set[int] = set()
        for j in range(D):
            col = K[:, j]
            nz = np.flatnonzero(np.abs(col) > 1e-12)
            if nz.size > 1:
                return None
            if nz.size == 1:
                r = int(nz[0])
                if r in used_rows:
                    return None  # two columns hit one row: interference
                used_rows.add(r)
                w2[mi, j] = abs(col[r]) ** 2
                fmap[mi, j] = r
    if not np.allclose(w2.sum(axis=0), 1.0, atol=1e-6):
        return None  # not trace-preserving
    return MonomialStack(
        kraus=st.astype(np.complex64),
        kraus_real=_phase_real_generic(st),
        w2=w2.astype(np.float32),
        fmap=fmap,
    )


def _phase_real_generic(stack: np.ndarray):
    """(m, D, D) -> f32 real forms when every operator is real up to a
    global phase (unobservable per-branch), else None — the generic-D
    version of ``bigtraj.phase_real_stack``."""
    out = []
    for K in np.asarray(stack):
        flat = K.reshape(-1)
        j = int(np.argmax(np.abs(flat)))
        a = flat[j]
        if abs(a) < 1e-30:
            out.append(np.zeros_like(K, dtype=np.float64))
            continue
        R = K * (np.conj(a) / abs(a))
        if not np.allclose(R.imag, 0.0, atol=1e-10):
            return None
        out.append(R.real)
    return np.stack(out).astype(np.float32)


class _Site(NamedTuple):
    window: int              # which window's boundary sample it draws on
    seg_pos: int             # dummy-op index within segments[window + 1]
    stack_id: int
    targets: tuple[int, ...]
    key_index: int           # -1 for measurement (deterministic given b)
    event_index: int         # measurement outcome slot; -1 for noise


class MonomialSpec(NamedTuple):
    segments: tuple          # tuple[CircuitProgram]: len = n_windows + 1
    windows: tuple           # windows[w] = tuple[_Site] (in draw order)
    stacks: tuple            # tuple[MonomialStack]
    n_site_keys: int
    real: bool
    n_events: int


_SPEC_CACHE: dict[tuple, MonomialSpec | None] = {}


def _dummy_op(targets, mat, column_index) -> prog.ProgramOp:
    return prog.ProgramOp("__MONO_KRAUS__", tuple(targets), 0, 0,
                          column_index, mat, None, -1)


def monomial_spec(program: prog.CircuitProgram, noise_model,
                  events: tuple = ()) -> MonomialSpec | None:
    """Host-side splice plan, or None when any channel is not monomial
    (those circuits stay on the fold path). ``events`` are monitored
    ``(op_position, qubit)`` measurement sites firing before the op at
    that position (``program._monitored_body`` convention)."""
    key = (program.compile_key, noise_model.spec_key(), tuple(events))
    if key in _SPEC_CACHE:
        return _SPEC_CACHE[key]
    spec = _build_spec(program, noise_model, tuple(events))
    if len(_SPEC_CACHE) > 128:
        _SPEC_CACHE.pop(next(iter(_SPEC_CACHE)))
    _SPEC_CACHE[key] = spec
    return spec


def _events_real(program, noise_model, events) -> bool:
    """Realness for the monitored variant: projectors are real, so the
    base trajectory realness decides."""
    return trajectory_is_real(program, noise_model)


def _build_spec(program, noise_model, events):
    real = _events_real(program, noise_model, events)
    stacks: list[MonomialStack] = []
    stack_ids: dict[bytes, int] = {}
    by_gate: dict[str, list[int] | None] = {}

    def stack_id_for(raw) -> int | None:
        skey = np.asarray(raw).tobytes()
        sid = stack_ids.get(skey)
        if sid is not None:
            return sid
        ms = monomial_stack(raw)
        if ms is None or (real and ms.kraus_real is None):
            return None
        sid = len(stacks)
        stacks.append(ms)
        stack_ids[skey] = sid
        return sid

    measure_sid = stack_id_for(_MEASURE_STACK) if events else -1

    # Walk ops (events interleaved); windows close when an op touches a
    # pending site's target. segments[w] holds the gates of window w;
    # the window's spliced dummies head segments[w + 1].
    segments: list[list] = [[]]
    windows: list[list[_Site]] = []
    pending: list[tuple] = []   # (stack_id, targets, key_index, event_i)
    pending_qubits: set[int] = set()
    site_keys = 0
    n_events = len(events)

    def close_window():
        nonlocal pending, pending_qubits
        if not pending:
            return
        w = len(windows)
        seg: list = []
        sites: list[_Site] = []
        for sid, targets, ki, ev in pending:
            D = stacks[sid].kraus.shape[1]
            if D == 2:
                dummy = _DUMMY_R1 if real else _DUMMY_C1
            else:
                dummy = (np.kron(_DUMMY_R1, _DUMMY_R1) if real
                         else np.kron(_DUMMY_C1, _DUMMY_C1))
            sites.append(_Site(w, len(seg), sid, targets, ki, ev))
            seg.append(_dummy_op(targets, dummy, 0))
        windows.append(sites)
        segments.append(seg)
        pending = []
        pending_qubits = set()

    def pend_site(sid, targets, ev=-1):
        nonlocal site_keys
        ki = -1
        if ev < 0:
            ki = site_keys
            site_keys += 1
        pending.append((sid, tuple(targets), ki, ev))
        pending_qubits.update(targets)

    ev_i = 0
    for pos in range(len(program.ops) + 1):
        while ev_i < len(events) and events[ev_i][0] == pos:
            pend_site(measure_sid, (events[ev_i][1],), ev=ev_i)
            ev_i += 1
        if pos == len(program.ops):
            break
        op = program.ops[pos]
        if op.gate_name not in by_gate:
            sids = []
            for raw in noise_model.kraus_stacks_for_gate(op.gate_name):
                sid = stack_id_for(np.asarray(raw))
                if sid is None:
                    sids = None
                    break
                sids.append(sid)
            by_gate[op.gate_name] = sids
        sids = by_gate[op.gate_name]
        if sids is None:
            return None
        if pending_qubits & set(op.targets):
            close_window()
        segments[-1].append(op)
        k = len(op.targets)
        for sid in sids:
            D = stacks[sid].kraus.shape[1]
            if D == 2:
                for q in op.targets:
                    pend_site(sid, (q,))
            elif D == 1 << k and k == 2:
                pend_site(sid, op.targets)
            else:
                return None  # arity mismatch / wide correlated stack
    close_window()

    seg_programs = []
    for w, seg_ops in enumerate(segments):
        seg_programs.append(prog.CircuitProgram(
            num_qubits=program.num_qubits,
            initial_index=program.initial_index,
            ops=tuple(seg_ops),
            num_columns=1,
            num_params=program.num_params,
            initial_params=program.initial_params,
            compile_key=program.compile_key + (
                ("mono-seg", w, noise_model.spec_key(), tuple(events),
                 real),),
        ))
    return MonomialSpec(tuple(seg_programs),
                        tuple(tuple(ws) for ws in windows),
                        tuple(stacks), site_keys, real, n_events)


def monomial_insert_supported(program, noise_model,
                              events: tuple = ()) -> bool:
    return monomial_spec(program, noise_model, events) is not None


# ---------------------------------------------------------------------------
# Basis sampling: one hierarchical per-axis categorical from |psi|^2
# ---------------------------------------------------------------------------

def _sample_axes(x, planar: bool, layout: GroupLayout, key):
    """Draw one basis sample from the grouped state: per-axis categorical
    on the axis marginal, then condition by slicing (the first marginal
    is one fused reduction pass; every later one reads a 1/S slice).
    Returns (per-axis indices, norm^2 of the state — free from the first
    reduction, used to keep spliced-product norms in f32 range)."""
    rank = len(layout.axis_sizes)
    keys = jax.random.split(key, rank)
    lead = 1 if planar else 0
    y = x
    idxs = []
    nsq = None
    for ax in range(rank):
        nd = y.ndim
        letters = ("z" if planar else "") + _AXIS_LETTERS[:nd - lead]
        out = letters[lead]
        m = jnp.einsum(f"{letters},{letters}->{out}", y, y,
                       precision=jax.lax.Precision.HIGHEST)
        if ax == 0:
            nsq = jnp.sum(m)
        a = jax.random.categorical(keys[ax], jnp.log(m + 1e-30))
        idxs.append(a)
        y = jax.lax.dynamic_index_in_dim(y, a, axis=lead, keepdims=False)
    return idxs, nsq


def _decode_bit(idxs, layout: GroupLayout, q: int):
    ax = layout.axis_of(q)
    pos = layout.pos_in_axis(q)
    shift = layout.axis_bits[ax] - 1 - pos
    return (idxs[ax] >> shift) & 1


# ---------------------------------------------------------------------------
# Trajectory bodies
# ---------------------------------------------------------------------------

def _window_draws(spec: MonomialSpec, window, idxs, nsq, keys, layout,
                  bit_state: dict):
    """Classical draws for one window given the boundary basis sample.
    Returns (overrides for the next segment, outcome updates). The first
    operand is scaled by rsqrt(nsq) so the spliced product's norm stays
    O(1) per window (the true branch probabilities fold into the final
    exact normalization)."""
    inv_norm = jax.lax.rsqrt(jnp.maximum(nsq, 1e-30))
    pool_rows: list = []
    pool_map: dict[int, int] = {}
    per_op: dict[int, jnp.ndarray] = {}
    outcome_updates: list[tuple[int, jnp.ndarray]] = []
    for si, site in enumerate(window):
        st = spec.stacks[site.stack_id]
        if len(site.targets) == 1:
            q = site.targets[0]
            if q not in bit_state:
                bit_state[q] = _decode_bit(idxs, layout, q)
            bv = bit_state[q]
        else:
            for q in site.targets:
                if q not in bit_state:
                    bit_state[q] = _decode_bit(idxs, layout, q)
            q0, q1 = site.targets
            bv = bit_state[q0] * 2 + bit_state[q1]
        D = st.kraus.shape[1]
        if site.event_index >= 0:
            # Projective measurement: deterministic given b.
            m = bv
            outcome_updates.append((site.event_index, bv))
            scale = jnp.float32(1.0)
        else:
            w2_t = jnp.asarray(st.w2.T)          # (D, m) static
            probs = jnp.take(w2_t, bv, axis=0)    # (m,) traced gather
            m = jax.random.categorical(keys[site.key_index],
                                       jnp.log(probs + 1e-30))
            scale = jax.lax.rsqrt(jnp.maximum(jnp.take(probs, m), 1e-30))
        mats = st.kraus_real if spec.real else st.kraus
        operand = jnp.take(jnp.asarray(mats), m, axis=0) * scale
        if si == 0:
            operand = operand * inv_norm
        # Update the classical bit chain through f_m.
        fm_flat = jnp.asarray(st.fmap.reshape(-1))
        newv = jnp.take(fm_flat, m * D + bv)
        if len(site.targets) == 1:
            bit_state[site.targets[0]] = newv
        else:
            bit_state[site.targets[0]] = (newv >> 1) & 1
            bit_state[site.targets[1]] = newv & 1
        if D == 2:
            pool_map[site.seg_pos] = len(pool_rows)
            pool_rows.append(operand[None])
        else:
            per_op[site.seg_pos] = operand
    rows = (jnp.concatenate(pool_rows).astype(jnp.complex64)
            if pool_rows else None)
    return (OperandOverrides(pool_rows=rows, pool_map=pool_map,
                             per_op=per_op), outcome_updates)


def _run_spec(spec: MonomialSpec, params, key):
    """Execute all segments with boundary sampling between them.
    Returns (grouped state, planar flag, outcomes list)."""
    layout = GroupLayout.for_qubits(spec.segments[0].num_qubits)
    plans = [get_group_plan(s) for s in spec.segments]
    planar = not (spec.real and all(p.all_real for p in plans))
    n_windows = len(spec.windows)
    keys = jax.random.split(key, max(1, spec.n_site_keys + n_windows))
    x = (_planar_basis_state(layout, spec.segments[0].initial_index)
         if planar else
         _real_basis_state(layout, spec.segments[0].initial_index))
    outcomes: list = [jnp.int32(0)] * spec.n_events
    overrides = None
    for w in range(n_windows + 1):
        seg = spec.segments[w]
        plan = plans[w]
        operands = build_group_operands(seg, plan, params, jnp.complex64,
                                        overrides=overrides)
        x = execute_group_plan(plan, operands, seg, params, jnp.complex64,
                               x, planar=planar)
        if w == n_windows:
            break
        idxs, nsq = _sample_axes(x, planar, layout,
                                 keys[spec.n_site_keys + w])
        bit_state: dict = {}
        overrides, updates = _window_draws(spec, spec.windows[w], idxs,
                                           nsq, keys, layout, bit_state)
        for ev, bv in updates:
            outcomes[ev] = bv.astype(jnp.int32)
    return x, planar, outcomes


def _finalize(x, planar: bool, dtype):
    if planar:
        flat = (x[0] + 1j * x[1]).reshape(-1)
    else:
        flat = x.reshape(-1).astype(jnp.complex64)
    nsq = jnp.sum(jnp.real(flat) ** 2 + jnp.imag(flat) ** 2)
    return (flat / jnp.sqrt(jnp.maximum(nsq, 1e-30))).astype(dtype)


def monomial_trajectory_body(program, noise_model, params, key,
                             dtype=None) -> jnp.ndarray:
    """Traceable ``(params, key) -> flat complex state``: ONE stochastic
    trajectory with every (monomial-channel) noise draw spliced into the
    group plan, windows separated by basis-sample boundaries. Vmappable
    over keys (``program.batched_trajectories_fn`` routes here when
    channels are monomial but not all mixed-unitary)."""
    from ..config import CONFIG

    dtype = dtype or CONFIG.dtype
    spec = monomial_spec(program, noise_model)
    if spec is None:
        raise ValueError("noise model has non-monomial channels; use "
                         "the fold path (ops/bigtraj.py)")
    x, planar, _ = _run_spec(spec, params, key)
    return _finalize(x, planar, dtype)


def monomial_insert_evolve_ok(program, noise_model) -> bool:
    """Gate for the HUGE-path (n >= 30) monomial splice route: monomial
    channels AND GenericStep-free segment plans (a GenericStep would
    flatten the whole state to complex inside the chunked executor —
    the ~2x-state round trip the n >= 30 path exists to avoid)."""
    spec = monomial_spec(program, noise_model)
    if spec is None:
        return False
    from .plan import GenericStep

    return not any(
        isinstance(s, GenericStep)
        for seg in spec.segments
        for s in get_group_plan(seg).steps)


def _chunked_windows_evolve(spec: MonomialSpec, program, params, key,
                            x: jnp.ndarray,
                            n_chunks: int | None) -> tuple:
    """Shared chunked window loop for the huge (n >= 30) splice paths:
    segments run the chunked plan executor, each window boundary costs
    one fused |psi|^2 reduction plus geometrically shrinking
    conditional slices, and one chunked exact normalization at the end
    restores ||psi|| = 1. Returns ``(x, outcomes)`` — outcomes non-empty
    only when the spec carries measurement events."""
    from .bigstate import auto_chunks, execute_group_plan_chunked
    from .bigtraj import _apply_pass, _norm_sq_chunked

    layout = GroupLayout.for_qubits(program.num_qubits)
    planar = not spec.real
    lead = 1 if planar else 0
    if n_chunks is None:
        n_chunks = auto_chunks(program.num_qubits, planar=planar)
    n_windows = len(spec.windows)
    keys = jax.random.split(key, max(1, spec.n_site_keys + n_windows))
    outcomes: list = [jnp.int32(0)] * spec.n_events
    overrides = None
    for w in range(n_windows + 1):
        seg = spec.segments[w]
        plan = get_group_plan(seg)
        operands = build_group_operands(seg, plan, params, jnp.complex64,
                                        overrides=overrides)
        if n_chunks > 1:
            x = execute_group_plan_chunked(plan, operands, seg, params,
                                           jnp.complex64, x, n_chunks,
                                           planar=planar)
        else:
            x = execute_group_plan(plan, operands, seg, params,
                                   jnp.complex64, x, planar=planar)
        if w == n_windows:
            break
        idxs, nsq = _sample_axes(x, planar, layout,
                                 keys[spec.n_site_keys + w])
        overrides, updates = _window_draws(spec, spec.windows[w], idxs,
                                           nsq, keys, layout, {})
        for ev, bv in updates:
            outcomes[ev] = bv.astype(jnp.int32)
    nsq = _norm_sq_chunked(x, lead, n_chunks)
    inv = jax.lax.rsqrt(jnp.maximum(nsq, 1e-30))
    x, _ = _apply_pass(x, lead, n_chunks, set(), lambda blk: blk * inv,
                       planar=planar)
    return x, outcomes


def monomial_insert_evolve(program, noise_model, params, key,
                           x: jnp.ndarray, dtype=None,
                           n_chunks: int | None = None) -> jnp.ndarray:
    """Chunked monomial-splice evolution of a PROVIDED grouped state —
    the huge (n >= 30) counterpart of ``monomial_trajectory_body``, with
    the ``bigtraj.huge_trajectory_evolve`` signature so the huge-path
    donation/layout chain swaps it in for monomial (but not
    mixed-unitary) noise. Per-window cost: one fused |psi|^2 reduction
    plus scalar classical draws — vs one whole-state pass PER GATE on
    the fold executor this replaces."""
    del dtype  # canonicalized: f32 planes / complex64 compute only
    spec = monomial_spec(program, noise_model)
    if spec is None:
        raise ValueError("noise model has non-monomial channels; use "
                         "bigtraj.huge_trajectory_evolve")
    x, _ = _chunked_windows_evolve(spec, program, params, key, x, n_chunks)
    return x


def monomial_monitored_evolve_ok(program, noise_model,
                                 events: tuple) -> bool:
    """Gate for the huge (n >= 30) MONITORED splice route: monomial (or
    absent) noise channels AND GenericStep-free segment plans."""
    spec = monomial_spec(program, noise_model, tuple(events))
    if spec is None:
        return False
    from .plan import GenericStep

    return not any(
        isinstance(s, GenericStep)
        for seg in spec.segments
        for s in get_group_plan(seg).steps)


def monomial_monitored_evolve(program, noise_model, events, params, key,
                              x: jnp.ndarray,
                              n_chunks: int | None = None):
    """Chunked monitored evolution of a PROVIDED grouped state — the
    huge (n >= 30) counterpart of ``monomial_monitored_body``: projective
    collapse at the static ``(op_position, qubit)`` events splices as
    ``{|0><0|, |1><1|}`` projectors through the chunked plan executor.
    Returns ``(x, outcomes[M] int32)``. The reference cannot represent
    this regime at all (n <= 16 and MEASUREMENT skipped during
    evolution, ``/root/reference/quantum_sim/engine/simulator.py:61-65``)."""
    spec = monomial_spec(program, noise_model, tuple(events))
    if spec is None:
        raise ValueError("noise model has non-monomial channels; the "
                         "huge monitored path needs the reference "
                         "channel family (or no noise)")
    x, outcomes = _chunked_windows_evolve(spec, program, params, key, x,
                                          n_chunks)
    outs = (jnp.stack(outcomes) if outcomes
            else jnp.zeros((0,), jnp.int32))
    return x, outs


def monomial_monitored_body(program, noise_model, events, params, key,
                            dtype=None):
    """Traceable ``(params, key) -> (flat state, outcomes[M] int32)``:
    one monitored trajectory (mid-circuit projective collapse at the
    static ``(op_position, qubit)`` events, optional monomial noise)
    through the group plan — the executor that lifts
    ``Simulator.monitored_trajectories`` past the per-gate einsum
    path's n <= 18 ceiling."""
    from ..config import CONFIG

    dtype = dtype or CONFIG.dtype
    spec = monomial_spec(program, noise_model, tuple(events))
    if spec is None:
        raise ValueError("noise model has non-monomial channels; "
                         "monitored group path unavailable")
    x, planar, outcomes = _run_spec(spec, params, key)
    outs = (jnp.stack(outcomes) if outcomes
            else jnp.zeros((0,), jnp.int32))
    return _finalize(x, planar, dtype), outs
