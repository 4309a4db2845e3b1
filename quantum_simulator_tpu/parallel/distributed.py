"""Distributed statevector engine: shard_map over a device mesh.

The amplitude vector of an n-qubit state is split across D = 2^g devices:
basis index = [g device bits | n-g local bits], preserving the engine's
qubit-0-is-MSB convention — qubit q < g lives in the device index, qubit
q >= g in the local block. (The reference has no distributed backend at
all; this is the new capability called out in SURVEY.md §5/§7.)

Execution model (hand-rolled shard_map, not GSPMD auto-sharding, so the
collective schedule is explicit and predictable):

* a gate whose targets are all *local* applies inside the shard with the
  standard segmented-einsum kernel — zero communication;
* a gate touching a *global* qubit first swaps that qubit with a local
  position. The swap exchanges the half-block where (local bit != device
  bit) between device pairs differing in that bit — ONE ``ppermute`` of
  half the local block, the minimum possible traffic for moving a qubit
  across the mesh;
* a **layout tracker** keeps the logical->physical qubit permutation and
  does NOT swap back after each gate: consecutive gates on a formerly
  global qubit pay the exchange once. The layout is restored to identity
  at the end of the program so the output sharding is canonical.

Everything is traceable and differentiable (``ppermute`` has a transpose
rule), so distributed VQE gradients flow through the collective schedule.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..circuit import QuantumCircuit
from ..config import CONFIG
from ..ops import program as prog
from ..ops.apply import apply_gate
from ..utils.xfer import to_host_complex

AMP_AXIS = "amp"


def shard_map_compat(f, mesh, in_specs, out_specs):
    """shard_map across jax API generations (check_vma vs check_rep)."""
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def make_mesh(n_devices: int | None = None, axis_name: str = AMP_AXIS
              ) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (must be a power of 2
    for amplitude sharding)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices & (n_devices - 1):
        raise ValueError(f"n_devices must be a power of 2, got {n_devices}")
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


# ---------------------------------------------------------------------------
# Shard-local primitives
# ---------------------------------------------------------------------------

def _swap_global_local(block: jnp.ndarray, g_pos: int, l_pos: int,
                       g: int, n_local: int, axis: str, n_devices: int
                       ) -> jnp.ndarray:
    """Physically exchange global qubit position ``g_pos`` (a device-index
    bit) with local position ``l_pos``.

    new(gbit=m, lbit=b) = old(gbit=b, lbit=m): each device keeps its half
    with local bit == its own device bit and trades the other half with
    the partner device across bit ``g_pos``.
    """
    bit_shift = g - 1 - g_pos  # device-index bit position (qubit 0 = MSB)
    mask = 1 << bit_shift
    my = jax.lax.axis_index(axis)
    my_bit = (my >> bit_shift) & 1

    l_idx = l_pos - g
    a = 1 << l_idx
    b = 1 << (n_local - l_idx - 1)
    b3 = block.reshape(a, 2, b)

    send = jnp.take(b3, 1 - my_bit, axis=1)   # half with lbit != my bit
    keep = jnp.take(b3, my_bit, axis=1)       # half with lbit == my bit
    perm = [(d, d ^ mask) for d in range(n_devices)]
    recv = jax.lax.ppermute(send, axis, perm)

    h0 = jnp.where(my_bit == 0, keep, recv)   # slot lbit = 0
    h1 = jnp.where(my_bit == 0, recv, keep)   # slot lbit = 1
    return jnp.stack([h0, h1], axis=1).reshape(block.shape)


class _Layout:
    """Tracks the logical-qubit -> physical-position permutation during
    trace-time program construction (host-side bookkeeping; the device
    code only sees the resulting static swap/apply schedule)."""

    def __init__(self, n: int):
        self.pos_of = list(range(n))   # logical qubit -> physical position
        self.qubit_at = list(range(n))  # physical position -> logical qubit

    def swap_positions(self, p1: int, p2: int):
        q1, q2 = self.qubit_at[p1], self.qubit_at[p2]
        self.qubit_at[p1], self.qubit_at[p2] = q2, q1
        self.pos_of[q1], self.pos_of[q2] = p2, p1


def _build_local_body(program: prog.CircuitProgram, g: int, n_devices: int,
                      axis: str, dtype) -> Callable:
    """Per-shard body: (params, noise keys or None) -> local block."""
    n = program.num_qubits
    n_local = n - g
    if n_local < 1:
        raise ValueError("need at least 1 local qubit per shard")

    init_dev = program.initial_index >> n_local
    init_local = program.initial_index & ((1 << n_local) - 1)

    def body(params):
        my = jax.lax.axis_index(axis)
        amp0 = jnp.where(my == init_dev,
                         jnp.ones((), dtype=dtype), jnp.zeros((), dtype))
        block = jnp.zeros(1 << n_local, dtype=dtype).at[init_local].set(amp0)

        layout = _Layout(n)

        def ensure_local(qubits: tuple[int, ...]) -> list[int]:
            """Move every target's physical position into the local range,
            returning local axis indices. Updates layout + block."""
            nonlocal block
            positions = [layout.pos_of[q] for q in qubits]
            for i, p in enumerate(positions):
                if p < g:
                    # choose a local position not hosting another target
                    taken = set(layout.pos_of[q] for q in qubits)
                    scratch = next(sp for sp in range(n - 1, g - 1, -1)
                                   if sp not in taken)
                    block = _swap_global_local(block, p, scratch, g,
                                               n_local, axis, n_devices)
                    layout.swap_positions(p, scratch)
                    positions[i] = scratch
            return [p - g for p in positions]

        for op in program.ops:
            local_targets = ensure_local(op.targets)
            u = program.op_matrix(op, params, dtype)
            block = apply_gate(block, u, tuple(local_targets), n_local)

        # Restore identity layout so the output sharding is canonical.
        swap_mat = jnp.asarray(
            np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                      [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.complex128),
            dtype=dtype)
        for p_target in range(g):
            q = layout.qubit_at[p_target]
            if q == p_target:
                continue
            # qubit p_target currently sits at position s
            s = layout.pos_of[p_target]
            if s >= g:
                block = _swap_global_local(block, p_target, s, g,
                                           n_local, axis, n_devices)
                layout.swap_positions(p_target, s)
            else:
                # global<->global: route through a local scratch
                taken = {s, p_target}
                scratch = next(sp for sp in range(n - 1, g - 1, -1)
                               if sp not in taken)
                block = _swap_global_local(block, s, scratch, g,
                                           n_local, axis, n_devices)
                layout.swap_positions(s, scratch)
                block = _swap_global_local(block, p_target, scratch, g,
                                           n_local, axis, n_devices)
                layout.swap_positions(p_target, scratch)
        # Local positions: fix residual permutation with in-shard SWAPs.
        for p_target in range(g, n):
            while layout.qubit_at[p_target] != p_target:
                s = layout.pos_of[p_target]
                block = apply_gate(block, swap_mat,
                                   (p_target - g, s - g), n_local)
                layout.swap_positions(p_target, s)
        return block

    return body


def local_forward_body(program: prog.CircuitProgram, g: int,
                       n_devices: int, axis: str, dtype) -> Callable:
    """Public per-shard forward body: ``params -> local amplitude block``.

    Compose this into larger shard_map programs (cost functions, VQE
    steps — see ``parallel/vqe.py``). ``g`` = log2(n_devices) device-index
    bits; the block has the 2^(n-g) least-significant amplitudes.
    """
    return _build_local_body(program, g, n_devices, axis, dtype)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _build_noisy_local_body(program: prog.CircuitProgram, noise_model,
                            g: int, n_devices: int, axis: str,
                            dtype) -> Callable:
    """Per-shard stochastic-trajectory body: ``(params, key) -> block``.

    Kraus channels apply to LOCAL qubit positions (the layout tracker
    moves global targets down first); branch probabilities are global
    norms (``psum`` over the mesh), and the categorical draw uses the
    replicated key so every shard selects the same branch.
    """
    n = program.num_qubits
    n_local = n - g
    init_dev = program.initial_index >> n_local
    init_local = program.initial_index & ((1 << n_local) - 1)

    total_draws = 0
    for op in program.ops:
        total_draws += len(noise_model.kraus_stacks_for_gate(op.gate_name)) \
            * len(op.targets)
    total_draws = max(1, total_draws)

    def body(params, key):
        my = jax.lax.axis_index(axis)
        amp0 = jnp.where(my == init_dev,
                         jnp.ones((), dtype=dtype), jnp.zeros((), dtype))
        block = jnp.zeros(1 << n_local, dtype=dtype).at[init_local].set(amp0)
        keys = jax.random.split(key, total_draws)
        draw = 0

        layout = _Layout(n)

        def ensure_local(qubits: tuple[int, ...]) -> list[int]:
            nonlocal block
            positions = [layout.pos_of[q] for q in qubits]
            for i, p in enumerate(positions):
                if p < g:
                    taken = set(layout.pos_of[q] for q in qubits)
                    scratch = next(sp for sp in range(n - 1, g - 1, -1)
                                   if sp not in taken)
                    block = _swap_global_local(block, p, scratch, g,
                                               n_local, axis, n_devices)
                    layout.swap_positions(p, scratch)
                    positions[i] = scratch
            return [p - g for p in positions]

        for op in program.ops:
            local_targets = ensure_local(op.targets)
            u = program.op_matrix(op, params, dtype)
            block = apply_gate(block, u, tuple(local_targets), n_local)
            hi = jax.lax.Precision.HIGHEST
            for kraus_np in noise_model.kraus_stacks_for_gate(op.gate_name):
                kraus = jnp.asarray(kraus_np, dtype=dtype)
                for q in op.targets:
                    (lq,) = ensure_local((q,))
                    # Branch probabilities from the GLOBAL 1q reduced
                    # density matrix (local partial + psum), then apply
                    # only the drawn operator.
                    a = 1 << lq
                    b = 1 << (n_local - lq - 1)
                    st = block.reshape(a, 2, b)
                    rho = jax.lax.psum(
                        jnp.einsum("aib,ajb->ij", st, jnp.conj(st),
                                   precision=hi), axis)
                    norms = jnp.real(jnp.einsum(
                        "mij,jk,mik->m", kraus, rho, jnp.conj(kraus),
                        precision=hi))
                    idx = jax.random.categorical(
                        keys[draw], jnp.log(norms + 1e-30))
                    k_sel = jnp.take(kraus, idx, axis=0)
                    block = apply_gate(block, k_sel, (lq,), n_local)
                    block = block / jnp.sqrt(jnp.maximum(
                        jnp.take(norms, idx), 1e-30))
                    draw += 1

        # Restore identity layout (same procedure as the noiseless body).
        swap_mat = jnp.asarray(
            np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                      [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.complex128),
            dtype=dtype)
        for p_target in range(g):
            q = layout.qubit_at[p_target]
            if q == p_target:
                continue
            s = layout.pos_of[p_target]
            if s >= g:
                block = _swap_global_local(block, p_target, s, g,
                                           n_local, axis, n_devices)
                layout.swap_positions(p_target, s)
            else:
                taken = {s, p_target}
                scratch = next(sp for sp in range(n - 1, g - 1, -1)
                               if sp not in taken)
                block = _swap_global_local(block, s, scratch, g,
                                           n_local, axis, n_devices)
                layout.swap_positions(s, scratch)
                block = _swap_global_local(block, p_target, scratch, g,
                                           n_local, axis, n_devices)
                layout.swap_positions(p_target, scratch)
        for p_target in range(g, n):
            while layout.qubit_at[p_target] != p_target:
                s = layout.pos_of[p_target]
                block = apply_gate(block, swap_mat,
                                   (p_target - g, s - g), n_local)
                layout.swap_positions(p_target, s)
        return block

    return body


def sharded_trajectory_fn(program: prog.CircuitProgram, noise_model,
                          mesh: Mesh, dtype=None) -> Callable:
    """jitted ``f(params, key) -> sharded noisy state`` — one stochastic
    trajectory with every Kraus selection made consistently across the
    mesh (global branch norms by psum, replicated draw keys)."""
    dtype = dtype or CONFIG.dtype
    axis = mesh.axis_names[0]
    n_devices = mesh.shape[axis]
    g = int(math.log2(n_devices))
    body = _build_noisy_local_body(program, noise_model, g, n_devices,
                                   axis, dtype)
    fn = shard_map_compat(body, mesh=mesh, in_specs=(P(), P()),
                          out_specs=P(axis))
    return jax.jit(fn, out_shardings=NamedSharding(mesh, P(axis)))


def sharded_forward_fn(program: prog.CircuitProgram, mesh: Mesh,
                       dtype=None) -> Callable:
    """jitted ``f(params) -> global sharded state (2^n,)`` over ``mesh``."""
    dtype = dtype or CONFIG.dtype
    axis = mesh.axis_names[0]
    n_devices = mesh.shape[axis]
    g = int(math.log2(n_devices))
    if 2**g != n_devices:
        raise ValueError("mesh size must be a power of 2")

    body = _build_local_body(program, g, n_devices, axis, dtype)
    fn = shard_map_compat(body, mesh=mesh, in_specs=(P(),),
                          out_specs=P(axis))
    out_sharding = NamedSharding(mesh, P(axis))
    return jax.jit(fn, out_shardings=out_sharding)


class DistributedStateVector:
    """An n-qubit state sharded across a device mesh."""

    def __init__(self, global_array: jax.Array, num_qubits: int, mesh: Mesh):
        self._data = global_array
        self._num_qubits = num_qubits
        self._mesh = mesh

    @property
    def num_qubits(self) -> int:
        return self._num_qubits

    @property
    def device_data(self) -> jax.Array:
        return self._data

    @property
    def mesh(self) -> Mesh:
        return self._mesh

    @property
    def probabilities(self) -> np.ndarray:
        """Host copy of |amp|^2 (gathers across the mesh)."""
        return np.asarray(jnp.abs(self._data) ** 2, dtype=np.float64)

    @property
    def data(self) -> np.ndarray:
        """Host complex128 copy (gathers across the mesh)."""
        return to_host_complex(self._data)

    def norm(self) -> float:
        return float(jnp.sum(jnp.abs(self._data) ** 2))


class DistributedSimulator:
    """Circuit execution over a device mesh (forward path + sampling)."""

    def __init__(self, mesh: Mesh | None = None,
                 n_devices: int | None = None):
        self._mesh = mesh if mesh is not None else make_mesh(n_devices)

    @property
    def mesh(self) -> Mesh:
        return self._mesh

    def run(self, circuit: QuantumCircuit) -> DistributedStateVector:
        program = prog.compile_circuit(circuit)
        fn = sharded_forward_fn(program, self._mesh)
        state = fn(jnp.asarray(program.initial_params))
        return DistributedStateVector(state, circuit.num_qubits, self._mesh)

    def run_noisy_trajectory(self, circuit: QuantumCircuit, noise_model,
                             seed: int | None = None
                             ) -> DistributedStateVector:
        """One stochastic-Kraus trajectory over the mesh."""
        program = prog.compile_circuit(circuit)
        fn = sharded_trajectory_fn(program, noise_model, self._mesh)
        rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(int(rng.integers(0, 2**63)))
        state = fn(jnp.asarray(program.initial_params), key)
        return DistributedStateVector(state, circuit.num_qubits, self._mesh)

    def expectation_z(self, state: DistributedStateVector,
                      qubit: int) -> float:
        """<Z_qubit> on a sharded state without gathering it."""
        n = state.num_qubits
        probs = jnp.abs(state.device_data) ** 2
        idx = jnp.arange(2**n)
        sign = 1.0 - 2.0 * ((idx >> (n - 1 - qubit)) & 1)
        return float(jnp.sum(probs * sign))

    def fidelity(self, a: DistributedStateVector,
                 b: DistributedStateVector) -> float:
        """|<a|b>|^2 between two sharded states."""
        return float(jnp.abs(jnp.vdot(a.device_data, b.device_data)) ** 2)

    def sample(self, state: DistributedStateVector, shots: int,
               rng: np.random.Generator | None = None) -> dict[str, int]:
        """Multinomial counts from the sharded distribution."""
        from ..measurement import counts_from_array

        rng = rng or np.random.default_rng()
        probs = state.probabilities
        probs = probs / probs.sum()
        counts = rng.multinomial(shots, probs)
        return counts_from_array(counts, state.num_qubits)
