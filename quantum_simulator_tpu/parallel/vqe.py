"""Sharded VQE training step: the public multi-chip product surface.

Two live parallelism axes over one ``jax.sharding.Mesh``:

* ``amp``  — tensor-parallel analog: the 2^n amplitude vector is sharded
  across devices; gates on device-index qubits move data with ``ppermute``
  collectives (see ``parallel/distributed.py``);
* ``traj`` — data-parallel analog: the 2P+1 parameter-shift evaluations of
  one gradient are sharded across mesh rows.

One jitted ``train_step`` computes every shifted cost, assembles the
parameter-shift gradient, and applies an Adam update. The reference has no
distributed backend at all (SURVEY.md §5); its single-threaded equivalent
is ``/root/reference/quantum_sim/engine/optimizer.py:194-229`` (per-param
sequential re-simulation).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import CONFIG
from ..ops import program as prog
from .distributed import local_forward_body, shard_map_compat

TRAJ_AXIS = "traj"
AMP_AXIS = "amp"


def make_vqe_mesh(n_devices: int | None = None, *, max_amp: int = 4,
                  traj_axis: str = TRAJ_AXIS, amp_axis: str = AMP_AXIS
                  ) -> Mesh:
    """2-D (traj x amp) mesh over the first ``n_devices`` devices.

    The amp axis takes the largest power of two <= ``max_amp`` dividing
    the device count; the remainder becomes the data-parallel traj axis.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"need {n_devices} devices, have {len(devices)}")
    amp = 1
    while amp * 2 <= min(max_amp, n_devices) and n_devices % (amp * 2) == 0:
        amp *= 2
    traj = n_devices // amp
    return Mesh(np.array(devices[:n_devices]).reshape(traj, amp),
                (traj_axis, amp_axis))


def shard_local_z_sign(qubit: int, n: int, g: int, amp_axis: str):
    """±1 Z-parity factor for ``qubit`` as seen by one amplitude shard.

    Qubit 0 is the MSB of the basis index; the g device-index bits are the
    g most significant. Returns either a scalar (device-bit qubit) or a
    per-amplitude vector (local qubit) — never a 2^n global iota.
    """
    n_local = n - g
    if qubit < g:
        my = jax.lax.axis_index(amp_axis)
        return 1.0 - 2.0 * ((my >> (g - 1 - qubit)) & 1).astype(jnp.float32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1 << n_local, 1), 0)
    idx = idx.squeeze(-1)
    return (1.0 - 2.0 * ((idx >> (n - 1 - qubit)) & 1)).astype(jnp.float32)


class VQEState(NamedTuple):
    """Adam optimizer carry."""

    params: jax.Array
    m: jax.Array
    v: jax.Array
    t: jax.Array


@dataclass(frozen=True)
class ShardedVQEStep:
    """jitted parameter-shift + Adam step over a (traj x amp) mesh."""

    step: Callable[[VQEState], tuple]  # (state) -> (state, cost)
    init: VQEState
    mesh: Mesh
    num_params: int

    def run(self, iterations: int) -> tuple[VQEState, list[float]]:
        state, costs = self.init, []
        for _ in range(iterations):
            state, cost = self.step(state)
            costs.append(float(cost))
        return state, costs


def sharded_vqe_step(circuit, mesh: Mesh, *, qubit: int = 0,
                     observable: list[tuple[float, list[int]]] | None = None,
                     learning_rate: float = 0.1, dtype=None,
                     traj_axis: str = TRAJ_AXIS, amp_axis: str = AMP_AXIS
                     ) -> ShardedVQEStep:
    """Build the sharded VQE training step for ``circuit``.

    The cost is a Z-string Hamiltonian ``sum_i c_i <Z_{q...}>`` given as
    ``observable=[(coeff, [qubits]), ...]`` (default: ``<Z_qubit>``).
    Every term is diagonal, so each shard evaluates it from its own
    amplitudes with ±1 parity factors (device-index bits contribute a
    scalar, local bits a per-amplitude vector) + one psum — no gather.

    The returned ``step`` is a single jitted program: a (1+2P)-row batch of
    parameter vectors (base + per-parameter ±pi/2 shifts) is sharded over
    ``traj_axis``; inside each row the forward pass is amplitude-sharded
    over ``amp_axis`` with ppermute collectives for device-bit qubits.
    """
    dtype = dtype or CONFIG.dtype
    program = prog.compile_circuit(circuit)
    n = program.num_qubits
    amp = mesh.shape[amp_axis]
    traj = mesh.shape[traj_axis]
    g = int(math.log2(amp))
    if (1 << g) != amp:
        raise ValueError(f"amp axis size must be a power of 2, got {amp}")
    n_params = program.num_params
    if n_params == 0:
        raise ValueError("circuit has no trainable parameters")
    if observable is None:
        observable = [(1.0, [qubit])]
    for _, qs in observable:
        if not all(0 <= q < n for q in qs):
            raise ValueError(f"observable qubits out of range: {qs}")

    forward_block = local_forward_body(program, g, amp, amp_axis, dtype)

    def cost_local(block):
        probs = jnp.abs(block) ** 2
        total = jnp.float32(0.0)
        for coeff, qs in observable:
            sign = jnp.float32(1.0)
            for q in qs:
                sign = sign * shard_local_z_sign(q, n, g, amp_axis)
            total = total + coeff * jnp.sum(probs * sign)
        return jax.lax.psum(total, amp_axis)

    rows_total = 1 + 2 * n_params
    rows_padded = -(-rows_total // traj) * traj
    rows_per_shard = rows_padded // traj

    def shard_body(rows_shard):
        # vmap traces the circuit ONCE for all rows this shard owns
        # (ppermute has a batching rule); unrolling would grow the XLA
        # program by a full circuit copy per parameter-shift row.
        return jax.vmap(lambda row: cost_local(forward_block(row)))(
            rows_shard[:rows_per_shard])

    sharded_costs = shard_map_compat(
        shard_body, mesh=mesh,
        in_specs=(P(traj_axis, None),), out_specs=P(traj_axis))

    shift = math.pi / 2
    coeff = 1.0 / (2.0 * math.sin(shift))
    b1, b2, eps = 0.9, 0.999, 1e-8

    def train_step(state: VQEState):
        params = state.params
        eye = jnp.eye(n_params, dtype=params.dtype) * shift
        rows = jnp.concatenate([
            params[None, :], params[None, :] + eye, params[None, :] - eye,
            jnp.zeros((rows_padded - rows_total, n_params), params.dtype)])
        costs = sharded_costs(rows)
        cost0 = costs[0]
        grad = (costs[1:1 + n_params]
                - costs[1 + n_params:rows_total]) * coeff
        t = state.t + 1
        m = b1 * state.m + (1 - b1) * grad
        v = b2 * state.v + (1 - b2) * grad ** 2
        m_hat = m / (1 - b1 ** t)
        v_hat = v / (1 - b2 ** t)
        new_params = params - learning_rate * m_hat / (jnp.sqrt(v_hat) + eps)
        return VQEState(new_params, m, v, t), cost0

    init = VQEState(
        params=jnp.asarray(program.initial_params, dtype=jnp.float32),
        m=jnp.zeros(n_params, jnp.float32),
        v=jnp.zeros(n_params, jnp.float32),
        t=jnp.zeros((), jnp.int32))
    return ShardedVQEStep(step=jax.jit(train_step), init=init, mesh=mesh,
                          num_params=n_params)
