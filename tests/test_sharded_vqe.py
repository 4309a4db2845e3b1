"""Public sharded-VQE-step API (parallel/vqe.py) on the virtual CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantum_simulator_tpu import GateInstance, QuantumCircuit
from quantum_simulator_tpu.ops import program as prog
from quantum_simulator_tpu.parallel import (
    make_vqe_mesh,
    sharded_vqe_step,
)
from quantum_simulator_tpu.parallel.vqe import shard_local_z_sign


def _ansatz(n_q=4, layers=2):
    c = QuantumCircuit(n_q)
    col = 0
    for _ in range(layers):
        for q in range(n_q):
            c.add_gate(GateInstance("Ry", [q], [0.3], column=col))
        col += 1
        for q in range(n_q - 1):
            c.add_gate(GateInstance("CNOT", [q, q + 1], [], column=col))
            col += 1
    return c


def _single_device_cost(circuit, params, qubit=0):
    program = prog.compile_circuit(circuit)
    psi = prog.forward_body(program, jnp.asarray(params))
    probs = np.abs(np.asarray(psi)) ** 2
    n = circuit.num_qubits
    idx = np.arange(2 ** n)
    sign = 1.0 - 2.0 * ((idx >> (n - 1 - qubit)) & 1)
    return float(np.sum(probs * sign))


def test_make_vqe_mesh_shapes():
    mesh = make_vqe_mesh(8)
    assert mesh.shape["amp"] == 4 and mesh.shape["traj"] == 2
    mesh2 = make_vqe_mesh(2)
    assert mesh2.shape["amp"] == 2 and mesh2.shape["traj"] == 1
    with pytest.raises(ValueError):
        make_vqe_mesh(10**6)


def test_sharded_cost_matches_single_device():
    circuit = _ansatz()
    mesh = make_vqe_mesh(8)
    vqe = sharded_vqe_step(circuit, mesh)
    _, cost = vqe.step(vqe.init)
    expected = _single_device_cost(circuit, vqe.init.params)
    assert math.isfinite(float(cost))
    assert abs(float(cost) - expected) < 1e-5


def test_training_reduces_cost():
    circuit = _ansatz()
    mesh = make_vqe_mesh(8)
    vqe = sharded_vqe_step(circuit, mesh, learning_rate=0.2)
    state, costs = vqe.run(15)
    assert costs[-1] < costs[0]
    # Gradient step must match the single-device cost at the new params.
    expected = _single_device_cost(circuit, np.asarray(state.params))
    _, cost = vqe.step(state)
    # step() returns cost at `state.params` before the update
    assert abs(float(cost) - expected) < 1e-5


def test_shard_local_z_sign_paths():
    """Device-bit qubits use axis_index; local qubits a shard-local iota —
    neither path materializes a 2^n array."""
    mesh = make_vqe_mesh(8, max_amp=4)

    n, g = 4, 2

    def body():
        s_dev = shard_local_z_sign(0, n, g, "amp")   # device bit
        s_loc = shard_local_z_sign(3, n, g, "amp")   # local bit
        return (jnp.broadcast_to(s_dev, (1 << (n - g),)), s_loc)

    from quantum_simulator_tpu.parallel.distributed import shard_map_compat
    from jax.sharding import PartitionSpec as P

    fn = shard_map_compat(body, mesh=mesh, in_specs=(),
                          out_specs=(P("amp"), P("amp")))
    dev_sign, loc_sign = jax.jit(fn)()
    # qubit 0 = MSB: sign flips at the halfway point of the global index
    full = np.asarray(dev_sign)
    assert (full[: len(full) // 2] == 1).all()
    assert (full[len(full) // 2:] == -1).all()
    # qubit 3 = LSB: sign alternates every element
    loc = np.asarray(loc_sign)
    assert (loc == np.where(np.arange(len(loc)) % 2 == 0, 1, -1)).all()


def test_dryrun_multichip_self_provisions(tmp_path):
    """dryrun_multichip must succeed even when asked for more devices than
    the process has (re-exec with a virtual CPU mesh)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as entry_mod

    n = len(jax.devices()) * 2  # force the subprocess path
    entry_mod.dryrun_multichip(n)


def test_zz_chain_observable_matches_single_device():
    """General Z-string Hamiltonians evaluate shard-locally."""
    circuit = _ansatz()
    n = circuit.num_qubits
    ham = [(-1.0, [i, i + 1]) for i in range(n - 1)] + [(0.5, [0])]
    mesh = make_vqe_mesh(8)
    vqe = sharded_vqe_step(circuit, mesh, observable=ham)
    _, cost = vqe.step(vqe.init)

    program = prog.compile_circuit(circuit)
    psi = prog.forward_body(program, jnp.asarray(vqe.init.params))
    probs = np.abs(np.asarray(psi)) ** 2
    idx = np.arange(2 ** n)
    expected = 0.0
    for coeff, qs in ham:
        sign = np.ones(2 ** n)
        for q in qs:
            sign = sign * (1.0 - 2.0 * ((idx >> (n - 1 - q)) & 1))
        expected += coeff * float(np.sum(probs * sign))
    assert abs(float(cost) - expected) < 1e-5

    with pytest.raises(ValueError):
        sharded_vqe_step(circuit, mesh, observable=[(1.0, [99])])
