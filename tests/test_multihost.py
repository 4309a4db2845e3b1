"""Multi-host seam: spec resolution, mesh factoring, grouped shard path.

Real multi-host hardware is unavailable; these exercise the topology
logic and the single-process degenerate path (see parallel/multihost.py).
"""

import numpy as np
import pytest

from quantum_simulator_tpu.models import brickwork_circuit
from quantum_simulator_tpu.parallel import (
    DistributedSimulator,
    MultiHostSpec,
    amp_axis_split,
    initialize_multihost,
    make_multihost_mesh,
)


class TestSpec:
    def test_defaults(self, monkeypatch):
        for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        spec = MultiHostSpec.from_env()
        assert spec.num_processes == 1 and spec.process_id == 0

    def test_env_resolution(self, monkeypatch):
        monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setenv("NUM_PROCESSES", "4")
        monkeypatch.setenv("PROCESS_ID", "2")
        spec = MultiHostSpec.from_env()
        assert spec.coordinator == "10.0.0.1:1234"
        assert spec.num_processes == 4 and spec.process_id == 2

    def test_bad_process_id(self):
        with pytest.raises(ValueError):
            MultiHostSpec.from_env(num_processes=2, process_id=5)

    def test_single_process_init_is_noop(self, monkeypatch):
        for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        spec = initialize_multihost()
        assert spec.num_processes == 1


class TestMeshFactoring:
    def test_amp_axis_split(self):
        assert amp_axis_split(16, 2) == (2, 8)
        assert amp_axis_split(16, 4, 4) == (4, 4)
        with pytest.raises(ValueError):
            amp_axis_split(16, 3)
        with pytest.raises(ValueError):
            amp_axis_split(12, 2)  # 6 per host: not a power of 2

    def test_make_multihost_mesh(self):
        mesh = make_multihost_mesh(n_devices=8)
        assert mesh.shape["amp"] == 8
        with pytest.raises(ValueError):
            make_multihost_mesh(n_devices=6)


class TestGroupedShardPath:
    def test_large_shard_uses_group_plan_and_matches(self):
        """n=16 over 4 devices -> 14 local qubits: the grouped planar
        body engages and must match the single-device einsum path."""
        import jax.numpy as jnp

        from quantum_simulator_tpu.ops import program as prog
        from quantum_simulator_tpu.parallel.distributed import (
            _GROUPED_SHARD_MIN_QUBITS,
        )

        c = brickwork_circuit(16, 4, seed=11)
        sim = DistributedSimulator(n_devices=4)
        assert 16 - 2 >= _GROUPED_SHARD_MIN_QUBITS
        st = sim.run(c)
        p = prog.compile_circuit(c)
        expected = np.asarray(
            prog.forward_fn(p)(jnp.asarray(p.initial_params)))
        np.testing.assert_allclose(st.data, expected, atol=2e-5)

    def test_shard_local_sampler_statistics(self):
        """Device-side inverse-CDF sampler matches the distribution."""
        from quantum_simulator_tpu.algorithms import AlgorithmTemplate

        c = AlgorithmTemplate.ghz_state(16)
        sim = DistributedSimulator(n_devices=8)
        st = sim.run(c)
        counts = sim.sample(st, 4000, np.random.default_rng(5))
        assert sum(counts.values()) == 4000
        assert set(counts) == {"0" * 16, "1" * 16}
        frac = counts["0" * 16] / 4000
        assert 0.45 < frac < 0.55

    def test_shard_local_expectation(self):
        from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit

        c = QuantumCircuit(16)
        c.add_gate(GateInstance("X", [0], [], column=0))   # device bit
        c.add_gate(GateInstance("H", [15], [], column=0))  # local bit
        sim = DistributedSimulator(n_devices=8)
        st = sim.run(c)
        assert sim.expectation_z(st, 0) == pytest.approx(-1.0, abs=1e-6)
        assert sim.expectation_z(st, 15) == pytest.approx(0.0, abs=1e-6)
        assert sim.expectation_z(st, 5) == pytest.approx(1.0, abs=1e-6)


def test_host_major_bit_to_link_mapping():
    """The DCN claim, bit-level: with a host-major device order and
    power-of-two per-host factor, the partner of device d under a
    device-index-bit-k qubit exchange (d XOR (1 << (D-1-k)) for D device
    bits, bit 0 = most significant) crosses a host boundary iff
    k < log2(n_hosts) — i.e. only the LOW-index (rare) qubit swaps ride
    DCN, every other exchange stays on ICI."""
    from quantum_simulator_tpu.parallel.multihost import amp_axis_split

    n_devices, n_hosts = 8, 2
    dcn, ici = amp_axis_split(n_devices, n_hosts)
    assert (dcn, ici) == (2, 4)
    D = n_devices.bit_length() - 1  # 3 device bits
    host_of = [d // ici for d in range(n_devices)]  # host-major order
    for k in range(D):
        mask = 1 << (D - 1 - k)
        crosses = {host_of[d] != host_of[d ^ mask]
                   for d in range(n_devices)}
        assert crosses == ({True} if k < (dcn.bit_length() - 1)
                           else {False}), (k, crosses)


class TestProcessMajorOrdering:
    """The DCN claim in parallel/multihost.py: mesh order must be
    process-major so device-index bit k < log2(n_hosts) corresponds to
    DCN links. On this rig every device belongs to process 0 (degenerate
    group), so the test pins the ORDER INVARIANT the claim rests on:
    mesh positions follow (process_index, id) sort order, and each
    DCN-factored row is process-homogeneous."""

    def test_mesh_order_is_process_major(self):
        mesh = make_multihost_mesh(n_devices=8)
        devs = list(mesh.devices.ravel())
        keys = [(d.process_index, d.id) for d in devs]
        assert keys == sorted(keys)

    def test_dcn_rows_are_process_homogeneous(self):
        mesh = make_multihost_mesh(n_devices=8)
        devs = list(mesh.devices.ravel())
        dcn, ici = amp_axis_split(8, 2)
        rows = np.array([d.process_index for d in devs]).reshape(dcn, ici)
        assert all(len(set(row)) == 1 for row in rows.tolist())
