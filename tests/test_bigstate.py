"""Chunked in-place executor (ops/bigstate.py) vs the whole-state path.

The chunked schedule exists for n >= 30 (where one whole-state einsum's
in+out exceeds HBM); its math must be identical at every n, so it is
validated here at small n — forced on with explicit chunk counts —
against the whole-state group executor and the per-gate einsum program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quantum_simulator_tpu.circuit import GateInstance, QuantumCircuit
from quantum_simulator_tpu.models import brickwork_circuit
from quantum_simulator_tpu.ops import program as prog
from quantum_simulator_tpu.ops.bigstate import (
    auto_chunks,
    group_forward_planar_body,
    planar_norm_sq,
    planar_probabilities,
)


def planar_vs_reference(circuit, n_chunks, atol=1e-5):
    p = prog.compile_circuit(circuit)
    params = jnp.asarray(p.initial_params)
    x = jax.jit(lambda pr: group_forward_planar_body(
        p, pr, jnp.complex64, n_chunks=n_chunks))(params)
    got = np.asarray(x[0]) + 1j * np.asarray(x[1])
    expected = np.asarray(prog.forward_fn(p)(params))
    np.testing.assert_allclose(got.reshape(-1), expected, atol=atol)
    return x


class TestChunkedExecutor:
    def test_brickwork_chunk_counts(self):
        # n=16 -> axes (4, 128, 128): dense + cross steps, several
        # chunkable axes. Every divisor schedule must agree.
        c = brickwork_circuit(16, 6, seed=3)
        for chunks in (1, 2, 4, 8):
            planar_vs_reference(c, chunks)

    def test_qft_diag_pairs_chunked(self):
        from quantum_simulator_tpu.algorithms import AlgorithmTemplate

        c = AlgorithmTemplate.quantum_fourier_transform(12)
        planar_vs_reference(c, 4)

    def test_three_group_generic_fallback(self):
        # Toffoli spanning three groups at n=16 -> GenericStep inside the
        # chunked schedule (whole-state fallback for that op only).
        c = QuantumCircuit(16)
        c.add_gate(GateInstance("H", [1], [], column=0))
        c.add_gate(GateInstance("H", [5], [], column=0))
        c.add_gate(GateInstance("Toffoli", [1, 5, 12], [], column=1))
        planar_vs_reference(c, 4)

    def test_chunks_exceeding_axis_size_clamp(self):
        # n=9 -> axes (4, 128): a cross step touches both axes of the
        # 2-axis layout, so it must fall back to whole-state; dense steps
        # chunk along the other axis.
        c = brickwork_circuit(9, 4, seed=5)
        planar_vs_reference(c, 16)

    def test_planar_helpers(self):
        c = brickwork_circuit(10, 4, seed=1)
        x = planar_vs_reference(c, 2)
        probs = np.asarray(planar_probabilities(x))
        assert probs.shape == (1 << 10,)
        np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            float(planar_norm_sq(x)), 1.0, atol=1e-5)

    def test_auto_chunks_threshold(self):
        assert auto_chunks(16) == 1
        assert auto_chunks(28) == 1
        assert auto_chunks(29) == 1
        assert auto_chunks(30) == 8
        assert auto_chunks(32) == 8
