"""Shared dense-matrix oracles for cross-checking the tensor engines.

One source of truth for the kron-built Hamiltonian (and the Pauli
matrices it uses) so a convention change propagates to every test file.
Qubit 0 is the MSB of the kron order, matching the framework-wide
convention (CLAUDE.md)."""

import numpy as np

PAULIS = {
    "I": np.eye(2),
    "X": np.array([[0, 1], [1, 0]]),
    "Y": np.array([[0, -1j], [1j, 0]]),
    "Z": np.diag([1.0, -1.0]),
}


def dense_hamiltonian(n, terms):
    """2^n x 2^n matrix for (coeff, pauli_string, qubits) term lists."""
    h = np.zeros((2 ** n, 2 ** n), complex)
    for c, pstr, qs in terms:
        full = ["I"] * n
        for q, p in zip(qs, pstr):
            full[q] = p
        op = np.eye(1)
        for ch in full:
            op = np.kron(op, PAULIS[ch])
        h += c * op
    return h
