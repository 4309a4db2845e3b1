"""Quantum error correction: bit-flip, phase-flip, Steane [[7,1,3]],
rotated surface code [[9,1,3]].

Parity target: ``/root/reference/quantum_sim/engine/qec.py:25-701`` (QECCode
interface, the three codes with identical layouts/codewords/decode tables,
maximum-likelihood parity syndrome extraction, run_cycle semantics, the
three logical-error metrics of threshold_sweep, alternating |0>_L/|1>_L
trials, AVAILABLE_CODES).

TPU-native design — the whole QEC cycle is ONE compiled program:

* Pauli noise, X corrections and Z corrections reduce to index arithmetic:
  an X-mask is an XOR gather ``psi[i ^ mask]``, a Z-mask is a popcount sign
  ``(-1)^{|i & mask|}`` (Y = XZ up to a global phase, irrelevant for every
  reported metric). No per-gate matrix applications in the noise/correction
  path at all.
* Syndrome bits are ML parity decisions: precomputed {0,1} parity vectors
  dotted with the probability vector (the reference loops over all 2^n
  indices in Python per check, ``qec.py:476-486``).
* The noise probability is a runtime scalar and trials are vmapped, so one
  compile serves an entire threshold sweep: probs x trials cycles execute
  as a handful of device launches instead of O(probs*trials) Python cycles.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass


import jax
import jax.numpy as jnp
import numpy as np

from .analysis import StateAnalysis
from .circuit import GateInstance, QuantumCircuit
from .gates import H_MATRIX, X_MATRIX, Z_MATRIX
from .ops.apply import apply_gate
from .simulator import Simulator
from .utils.seeding import key_from_seed
from .state import StateVector


@dataclass
class QECResult:
    """Result of a single QEC cycle."""

    encoded_state: StateVector
    noisy_state: StateVector
    syndrome: list[int]
    corrected_state: StateVector
    fidelity_before: float
    fidelity_after: float
    correction_applied: list[tuple[str, int]]
    logical_z_expectation: float = 0.0
    logical_error_detected: bool = False


@dataclass
class ThresholdPoint:
    """Result at one physical error rate in a threshold sweep."""

    physical_rate: float
    logical_rate: float
    success_rate: float
    avg_fidelity: float
    logical_z_fidelity: float = 0.0
    decoder_success_rate: float = 0.0
    projection_logical_rate: float = 0.0


def _parity_vector(qubits: list[int], n: int) -> np.ndarray:
    """Static {0,1}^(2^n) vector: parity of the given qubits per index."""
    idx = np.arange(2**n, dtype=np.int64)
    parity = np.zeros(2**n, dtype=np.int64)
    for q in qubits:
        parity ^= (idx >> (n - 1 - q)) & 1
    return parity.astype(np.float32)


def _qubit_bit(q: int, n: int) -> int:
    return 1 << (n - 1 - q)


class QECCode(ABC):
    """Abstract base for quantum error correcting codes."""

    @property
    @abstractmethod
    def name(self) -> str: ...

    @property
    @abstractmethod
    def data_qubits(self) -> int: ...

    @property
    @abstractmethod
    def ancilla_qubits(self) -> int: ...

    @property
    def total_qubits(self) -> int:
        return self.data_qubits + self.ancilla_qubits

    @property
    @abstractmethod
    def code_distance(self) -> int: ...

    @abstractmethod
    def encode(self, logical_state: int) -> StateVector: ...

    @abstractmethod
    def decode_syndrome(self, syndrome: list[int]) -> list[tuple[str, int]]:
        """Syndrome -> [(gate_name, qubit)] correction list (host lookup)."""
        ...

    @abstractmethod
    def logical_z_operators(self) -> list[int]: ...

    # --- compiled-cycle hooks (code-specific static structure) ------------

    @abstractmethod
    def comp_frame_checks(self) -> list[list[int]]:
        """Parity checks evaluated on the computational-frame state."""
        ...

    def h_frame_checks(self) -> list[list[int]]:
        """Parity checks evaluated after H on the data qubits."""
        return []

    def logical_z_in_h_frame(self) -> bool:
        """True when Z_L must be read in the H-rotated frame."""
        return False

    @abstractmethod
    def decode_masks(self, syn_comp, syn_h, n: int):
        """Traceable decode: syndrome bit arrays -> (xor_mask, z_mask)."""
        ...

    # --- shared host API ---------------------------------------------------

    def extract_syndrome(self, state: StateVector,
                         rng: np.random.Generator | None = None
                         ) -> list[int]:
        """Maximum-likelihood parity syndrome (p_odd vs p_even per check)."""
        n = state.num_qubits
        probs = state.probabilities
        syndrome = []
        for check in self.comp_frame_checks():
            p_odd = float(probs @ _parity_vector(check, n))
            syndrome.append(1 if p_odd > 0.5 else 0)
        h_checks = self.h_frame_checks()
        if h_checks:
            temp = state.copy()
            for q in range(self.data_qubits):
                temp.apply_gate(H_MATRIX, [q])
            h_probs = temp.probabilities
            for check in h_checks:
                p_odd = float(h_probs @ _parity_vector(check, n))
                syndrome.append(1 if p_odd > 0.5 else 0)
        return syndrome

    def apply_correction(self, state: StateVector,
                         corrections: list[tuple[str, int]]) -> None:
        gate_map = {"X": X_MATRIX, "Z": Z_MATRIX}
        for gate_name, qubit in corrections:
            if gate_name in gate_map and qubit < state.num_qubits:
                state.apply_gate(gate_map[gate_name], [qubit])

    def logical_fidelity(self, state: StateVector,
                         logical_state: int) -> float:
        ideal = self.encode(logical_state)
        return StateAnalysis.process_fidelity(ideal, state)

    def logical_z_expectation(self, state: StateVector) -> float:
        """<Z_L> as a precomputed ±1 parity vector dotted with probs."""
        n = state.num_qubits
        if self.logical_z_in_h_frame():
            temp = state.copy()
            for q in range(self.data_qubits):
                temp.apply_gate(H_MATRIX, [q])
            probs = temp.probabilities
        else:
            probs = state.probabilities
        parity = _parity_vector(self.logical_z_operators(), n)
        return float(probs @ (1.0 - 2.0 * parity))


# ---------------------------------------------------------------------------
# Bit-flip [3,1,1]
# ---------------------------------------------------------------------------

class BitFlipCode(QECCode):
    """|0>_L = |000>, |1>_L = |111>; corrects single X errors.

    Layout: data 0-2, ancilla 3-4; checks Z0Z1 and Z1Z2."""

    @property
    def name(self) -> str:
        return "Bit-Flip [3,1,1]"

    @property
    def data_qubits(self) -> int:
        return 3

    @property
    def ancilla_qubits(self) -> int:
        return 2

    @property
    def code_distance(self) -> int:
        return 1

    def encode(self, logical_state: int) -> StateVector:
        qc = QuantumCircuit(5)
        if logical_state == 1:
            qc.add_gate(GateInstance("X", [0], [], 0))
        qc.add_gate(GateInstance("CNOT", [0, 1], [], 1))
        qc.add_gate(GateInstance("CNOT", [0, 2], [], 2))
        return Simulator().run(qc, shots=0).final_state

    def comp_frame_checks(self) -> list[list[int]]:
        return [[0, 1], [1, 2]]

    def decode_syndrome(self, syndrome: list[int]) -> list[tuple[str, int]]:
        table = {(0, 0): [], (1, 0): [("X", 0)],
                 (1, 1): [("X", 1)], (0, 1): [("X", 2)]}
        return table.get((syndrome[0], syndrome[1]), [])

    def decode_masks(self, syn_comp, syn_h, n: int):
        s0, s1 = syn_comp[0], syn_comp[1]
        xor_mask = (s0 * (1 - s1) * _qubit_bit(0, n)
                    + s0 * s1 * _qubit_bit(1, n)
                    + (1 - s0) * s1 * _qubit_bit(2, n))
        return xor_mask, jnp.zeros((), jnp.int32)

    def logical_z_operators(self) -> list[int]:
        return [0, 1, 2]


# ---------------------------------------------------------------------------
# Phase-flip [3,1,1]
# ---------------------------------------------------------------------------

class PhaseFlipCode(QECCode):
    """|0>_L = |+++>, |1>_L = |--->; corrects single Z errors.

    Syndrome read in the H-rotated frame; corrections are Z gates; the
    logical operator is X_L, measured by rotating to the X basis."""

    @property
    def name(self) -> str:
        return "Phase-Flip [3,1,1]"

    @property
    def data_qubits(self) -> int:
        return 3

    @property
    def ancilla_qubits(self) -> int:
        return 2

    @property
    def code_distance(self) -> int:
        return 1

    def encode(self, logical_state: int) -> StateVector:
        qc = QuantumCircuit(5)
        if logical_state == 1:
            qc.add_gate(GateInstance("X", [0], [], 0))
        qc.add_gate(GateInstance("CNOT", [0, 1], [], 1))
        qc.add_gate(GateInstance("CNOT", [0, 2], [], 2))
        for q in range(3):
            qc.add_gate(GateInstance("H", [q], [], 3))
        return Simulator().run(qc, shots=0).final_state

    def comp_frame_checks(self) -> list[list[int]]:
        return []

    def h_frame_checks(self) -> list[list[int]]:
        return [[0, 1], [1, 2]]

    def logical_z_in_h_frame(self) -> bool:
        return True

    def decode_syndrome(self, syndrome: list[int]) -> list[tuple[str, int]]:
        table = {(0, 0): [], (1, 0): [("Z", 0)],
                 (1, 1): [("Z", 1)], (0, 1): [("Z", 2)]}
        return table.get((syndrome[0], syndrome[1]), [])

    def decode_masks(self, syn_comp, syn_h, n: int):
        s0, s1 = syn_h[0], syn_h[1]
        z_mask = (s0 * (1 - s1) * _qubit_bit(0, n)
                  + s0 * s1 * _qubit_bit(1, n)
                  + (1 - s0) * s1 * _qubit_bit(2, n))
        return jnp.zeros((), jnp.int32), z_mask

    def logical_z_operators(self) -> list[int]:
        return [0, 1, 2]


# ---------------------------------------------------------------------------
# Steane [[7,1,3]]
# ---------------------------------------------------------------------------

class SteaneCode(QECCode):
    """Steane [[7,1,3]] CSS code: 7 data + 6 ancilla = 13 qubits.

    Codewords are superpositions of the [7,4,3] Hamming code's even-weight
    (|0>_L) and odd-weight (|1>_L) words, built directly into the amplitude
    array. Corrects any single-qubit error."""

    # Hamming [7,4,3] parity checks: qubit q participates in check i iff
    # bit i of (q+1) is set — so a single bit flip's syndrome integer IS
    # its 1-indexed position. (The reference hardcodes a generator matrix
    # inconsistent with these checks, ``qec.py:363-368``; here the
    # codewords are derived from the checks' null space directly.)
    _CHECKS = [[0, 2, 4, 6], [1, 2, 5, 6], [3, 4, 5, 6]]

    @property
    def name(self) -> str:
        return "Steane [[7,1,3]]"

    @property
    def data_qubits(self) -> int:
        return 7

    @property
    def ancilla_qubits(self) -> int:
        return 6

    @property
    def code_distance(self) -> int:
        return 3

    def _codewords(self) -> list[tuple[int, ...]]:
        """All 16 words in the null space of the Hamming checks."""
        words = []
        for v in range(128):
            bits = tuple((v >> (6 - q)) & 1 for q in range(7))
            if all(sum(bits[q] for q in check) % 2 == 0
                   for check in self._CHECKS):
                words.append(bits)
        assert len(words) == 16
        return words

    def encode(self, logical_state: int) -> StateVector:
        n_total = 13
        codewords = self._codewords()
        wanted = [cw for cw in codewords
                  if sum(cw) % 2 == (logical_state & 1)]
        amp = 1.0 / np.sqrt(len(wanted))
        data = np.zeros(2**n_total, dtype=np.complex128)
        for cw in wanted:
            idx = 0
            for qi, bit in enumerate(cw):
                if bit:
                    idx |= 1 << (n_total - 1 - qi)
            data[idx] = amp
        sv = StateVector(n_total)
        sv.data = data
        return sv

    def comp_frame_checks(self) -> list[list[int]]:
        return list(self._CHECKS)

    def h_frame_checks(self) -> list[list[int]]:
        return list(self._CHECKS)

    def decode_syndrome(self, syndrome: list[int]) -> list[tuple[str, int]]:
        """Computational-frame syndrome (bits 0-2, Z-stabilizer parities)
        locates X errors; H-frame syndrome (bits 3-5, X-stabilizer
        parities) locates Z errors. The syndrome integer is the 1-indexed
        error position. (The reference swaps these roles, ``qec.py:419-439``
        — a decoder bug; this is the physically correct mapping.)"""
        corrections = []
        x_pos = syndrome[0] + 2 * syndrome[1] + 4 * syndrome[2]
        if 0 < x_pos <= 7:
            corrections.append(("X", x_pos - 1))
        z_pos = syndrome[3] + 2 * syndrome[4] + 4 * syndrome[5]
        if 0 < z_pos <= 7:
            corrections.append(("Z", z_pos - 1))
        return corrections

    def decode_masks(self, syn_comp, syn_h, n: int):
        x_pos = syn_comp[0] + 2 * syn_comp[1] + 4 * syn_comp[2]
        xor_mask = jnp.where(
            x_pos > 0,
            jnp.left_shift(jnp.int32(1), jnp.int32(n) - x_pos),
            jnp.int32(0))
        z_pos = syn_h[0] + 2 * syn_h[1] + 4 * syn_h[2]
        z_mask = jnp.where(
            z_pos > 0,
            jnp.left_shift(jnp.int32(1), jnp.int32(n) - z_pos),
            jnp.int32(0))
        return xor_mask, z_mask

    def logical_z_operators(self) -> list[int]:
        return list(range(7))


# ---------------------------------------------------------------------------
# Rotated surface code [[d^2, 1, d]]
# ---------------------------------------------------------------------------

def _rotated_surface_geometry(distance: int):
    """Stabilizer geometry of the rotated surface code on a d x d grid.

    Data qubit (row, col) -> index ``row * d + col``.  A cell anchored at
    (r, c) covers the grid points {(r,c), (r,c+1), (r+1,c), (r+1,c+1)}
    clipped to the lattice; interior cells checkerboard Z/X by (r+c)
    parity (Z when even), and the weight-2 boundary half-cells keep only
    the X-type cells on the top/bottom rows and the Z-type cells on the
    left/right columns — the standard rotated layout with (d^2-1)/2
    stabilizers per sector.  Logical operators: Z_L = Z on row 0,
    X_L = X on column 0 (each crosses between its pair of boundaries and
    overlaps the other in exactly one qubit).

    Returns ``(z_checks, x_checks, z_logical, x_logical)`` as qubit-index
    lists.  Correctness (commutation, ranks, logical algebra) is locked
    by ``tests/test_surface_code.py``.
    """
    d = distance
    if d < 3 or d % 2 == 0:
        raise ValueError("distance must be odd and >= 3")
    z_checks: list[list[int]] = []
    x_checks: list[list[int]] = []
    for r in range(-1, d):
        for c in range(-1, d):
            cell = [(rr, cc) for rr in (r, r + 1) for cc in (c, c + 1)
                    if 0 <= rr < d and 0 <= cc < d]
            if len(cell) < 2:
                continue  # corner half-cells are never stabilizers
            is_z = (r + c) % 2 == 0
            qubits = [rr * d + cc for rr, cc in cell]
            if len(cell) == 2:
                on_row_edge = r == -1 or r == d - 1
                if on_row_edge and not is_z:
                    x_checks.append(qubits)
                elif not on_row_edge and is_z:
                    z_checks.append(qubits)
                continue
            (z_checks if is_z else x_checks).append(qubits)
    z_logical = list(range(d))
    x_logical = [r * d for r in range(d)]
    return z_checks, x_checks, z_logical, x_logical


def _coset_leader_lut(checks: np.ndarray) -> np.ndarray:
    """Exact minimum-weight decode table for one CSS error sector.

    ``checks`` is the (n_checks, dq) GF(2) parity-check matrix; the
    returned (2^n_checks, dq) 0/1 int32 table maps each syndrome to a
    minimum-weight error producing it (a coset leader).  Built by BFS
    over the syndrome graph whose edges are single-qubit toggles: a
    syndrome first reached at BFS layer w has minimum error weight
    exactly w, so every representative is minimal.  Memory is
    O(2^n_checks * dq) — callers cap the check count accordingly.
    """
    nch, dq = checks.shape
    n_syn = 1 << nch
    col_syn = np.zeros(dq, dtype=np.int64)
    for c in range(nch):
        col_syn |= checks[c].astype(np.int64) << c
    lut = np.zeros((n_syn, dq), dtype=np.int32)
    seen = np.zeros(n_syn, dtype=bool)
    seen[0] = True
    frontier = [0]
    found = 1
    while frontier and found < n_syn:
        nxt = []
        for s in frontier:
            for q in range(dq):
                s2 = s ^ int(col_syn[q])
                if not seen[s2]:
                    seen[s2] = True
                    lut[s2] = lut[s]
                    lut[s2, q] ^= 1
                    nxt.append(s2)
                    found += 1
        frontier = nxt
    if found < n_syn:
        raise ValueError("parity checks do not span the syndrome space")
    return lut


class RotatedSurfaceCode(QECCode):
    """Rotated surface code [[d^2, 1, d]] — a 2D topological code.

    A capability beyond the reference (its QEC zoo stops at Steane,
    ``/root/reference/quantum_sim/engine/qec.py:697-701``).  Syndrome
    extraction is ML-parity like the other codes here, so no ancilla
    circuit is needed (``ancilla_qubits = 0``, total = d^2 qubits) and
    the compiled cycle kernel serves it unchanged.  Decoding is exact
    minimum-weight per CSS sector via host-built coset-leader tables
    (``_coset_leader_lut``) — for surface codes this is the decoder
    MWPM approximates, computed exactly.

    The statevector realization is capped at d=3 (2^9 amplitudes per
    trial); larger distances run 2^n-free on the Pauli-frame engine
    (``qec_frame.surface_code_frame_spec``), which shares this geometry
    and is draw-exact against this class under the same seed.
    """

    def __init__(self, distance: int = 3):
        if distance != 3:
            raise ValueError(
                "statevector surface code is capped at d=3 (the cycle "
                "kernel materializes 2^(d^2) amplitudes per trial); use "
                "qec_frame.surface_code_frame_spec for d=5")
        self._d = distance
        z_checks, x_checks, z_log, x_log = \
            _rotated_surface_geometry(distance)
        self._z_checks = z_checks
        self._x_checks = x_checks
        self._z_logical = z_log
        self._x_logical = x_log
        dq = distance * distance
        comp = np.zeros((len(z_checks), dq), dtype=np.uint8)
        for i, qs in enumerate(z_checks):
            comp[i, qs] = 1
        h = np.zeros((len(x_checks), dq), dtype=np.uint8)
        for i, qs in enumerate(x_checks):
            h[i, qs] = 1
        self._lut_x = _coset_leader_lut(comp)   # comp syndrome -> X corr
        self._lut_z = _coset_leader_lut(h)      # h syndrome -> Z corr

    @property
    def name(self) -> str:
        return f"Surface [[{self._d * self._d},1,{self._d}]]"

    @property
    def data_qubits(self) -> int:
        return self._d * self._d

    @property
    def ancilla_qubits(self) -> int:
        return 0

    @property
    def code_distance(self) -> int:
        return self._d

    def encode(self, logical_state: int) -> StateVector:
        """|b>_L = X_L^b applied to the uniform X-stabilizer orbit of
        |0...0> (the CSS codeword construction, built directly into the
        amplitude array like SteaneCode.encode)."""
        n = self.data_qubits
        base = 0
        if logical_state & 1:
            for q in self._x_logical:
                base |= 1 << (n - 1 - q)
        masks = []
        for check in self._x_checks:
            m = 0
            for q in check:
                m |= 1 << (n - 1 - q)
            masks.append(m)
        indices = set()
        for sub in range(1 << len(masks)):
            idx = base
            for i, m in enumerate(masks):
                if (sub >> i) & 1:
                    idx ^= m
            indices.add(idx)
        amp = 1.0 / np.sqrt(len(indices))
        data = np.zeros(2 ** n, dtype=np.complex128)
        data[sorted(indices)] = amp
        sv = StateVector(n)
        sv.data = data
        return sv

    def comp_frame_checks(self) -> list[list[int]]:
        return [list(qs) for qs in self._z_checks]

    def h_frame_checks(self) -> list[list[int]]:
        return [list(qs) for qs in self._x_checks]

    def decode_syndrome(self, syndrome: list[int]) -> list[tuple[str, int]]:
        nc = len(self._z_checks)
        ic = sum(int(b) << i for i, b in enumerate(syndrome[:nc]))
        ih = sum(int(b) << i
                 for i, b in enumerate(syndrome[nc:nc + len(self._x_checks)]))
        corrections = [("X", int(q)) for q in np.nonzero(self._lut_x[ic])[0]]
        corrections += [("Z", int(q)) for q in np.nonzero(self._lut_z[ih])[0]]
        return corrections

    def decode_masks(self, syn_comp, syn_h, n: int):
        dq = self.data_qubits
        w = np.asarray([1 << (n - 1 - q) for q in range(dq)], dtype=np.int64)
        mask_x = jnp.asarray((self._lut_x @ w).astype(np.int32))
        mask_z = jnp.asarray((self._lut_z @ w).astype(np.int32))
        pow_c = jnp.asarray([1 << i for i in range(len(self._z_checks))],
                            jnp.int32)
        pow_h = jnp.asarray([1 << i for i in range(len(self._x_checks))],
                            jnp.int32)
        return (mask_x[jnp.sum(syn_comp * pow_c)],
                mask_z[jnp.sum(syn_h * pow_h)])

    def logical_z_operators(self) -> list[int]:
        return list(self._z_logical)

    def logical_x_operators(self) -> list[int]:
        return list(self._x_logical)


# ---------------------------------------------------------------------------
# Compiled cycle kernel
# ---------------------------------------------------------------------------

def _pauli_masks_from_draws(r, p, noise_type: str, data_qubits: int, n: int):
    """Per-qubit uniform draws -> (xor_mask, z_mask) int32 Pauli masks."""
    if noise_type == "bit_flip":
        x_bits = r < p
        z_bits = jnp.zeros_like(x_bits)
    elif noise_type == "phase_flip":
        x_bits = jnp.zeros_like(r < p)
        z_bits = r < p
    elif noise_type == "depolarizing":
        # r < p/3 -> X; p/3 <= r < 2p/3 -> Y (= X and Z); 2p/3 <= r < p -> Z
        x_bits = r < 2 * p / 3
        z_bits = (r >= p / 3) & (r < p)
    else:
        raise ValueError(f"Unknown noise type: {noise_type}")
    weights = jnp.asarray(
        [_qubit_bit(q, n) for q in range(data_qubits)], dtype=jnp.int32)
    xor_mask = jnp.sum(x_bits.astype(jnp.int32) * weights)
    z_mask = jnp.sum(z_bits.astype(jnp.int32) * weights)
    return xor_mask, z_mask


def _apply_masks(psi, xor_mask, z_mask, dim: int):
    """Apply an X-mask (XOR gather) and Z-mask (popcount sign) in one pass."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (dim, 1), 0).squeeze(-1)
    flipped = psi[idx ^ xor_mask]
    parity = jax.lax.population_count(idx & z_mask) & 1
    sign = (1.0 - 2.0 * parity.astype(jnp.float32))
    return flipped * sign


def _h_rotate_data(psi, data_qubits: int, n: int):
    h = jnp.asarray(H_MATRIX, dtype=psi.dtype)
    for q in range(data_qubits):
        psi = apply_gate(psi, h, (q,), n)
    return psi



_HI = jax.lax.Precision.HIGHEST


def _noise_syndrome_correct(code: "QECCode", noise_type: str,
                            comp_parities, h_parities, p, ideal, key):
    """Shared traceable pipeline: inject noise, extract the ML parity
    syndrome, decode, correct. Returns (noisy, corrected, syn_comp,
    syn_h, xor_corr, z_corr). One implementation serves both the metric
    cycle and the state-returning path (they previously drifted)."""
    n = code.total_qubits
    dim = 2**n
    dq = code.data_qubits
    r = jax.random.uniform(key, (dq,))
    xor_noise, z_noise = _pauli_masks_from_draws(r, p, noise_type, dq, n)
    noisy = _apply_masks(ideal, xor_noise, z_noise, dim)

    probs_comp = jnp.abs(noisy) ** 2
    syn_comp = (jnp.matmul(jnp.asarray(comp_parities), probs_comp,
                           precision=_HI) > 0.5).astype(jnp.int32)
    if code.h_frame_checks():
        probs_h = jnp.abs(_h_rotate_data(noisy, dq, n)) ** 2
    else:
        probs_h = probs_comp
    syn_h = (jnp.matmul(jnp.asarray(h_parities), probs_h,
                        precision=_HI) > 0.5).astype(jnp.int32)
    xor_corr, z_corr = code.decode_masks(syn_comp, syn_h, n)
    corrected = _apply_masks(noisy, jnp.int32(xor_corr),
                             jnp.int32(z_corr), dim)
    return noisy, corrected, syn_comp, syn_h, xor_corr, z_corr


def build_cycle_fn(code: QECCode, noise_type: str):
    """jitted, vmapped ``f(p, ideal_states[T, dim], keys[T]) -> metrics``.

    One compile serves a whole threshold sweep (p is a runtime scalar).
    Returns per-trial (fid_before, fid_after, z_exp, syndrome, xor, z).
    Inner products and parity reductions are elementwise-sum / HIGHEST
    precision: the TPU default bf16 matmul error (~1e-1) would swamp the
    ~1e-3 logical error rates the sweep measures.
    """
    n = code.total_qubits
    dim = 2**n
    dq = code.data_qubits
    comp_checks = code.comp_frame_checks()
    h_checks = code.h_frame_checks()
    comp_parities = np.stack([_parity_vector(c, n) for c in comp_checks]) \
        if comp_checks else np.zeros((0, dim), np.float32)
    h_parities = np.stack([_parity_vector(c, n) for c in h_checks]) \
        if h_checks else np.zeros((0, dim), np.float32)
    zl_parity = 1.0 - 2.0 * _parity_vector(code.logical_z_operators(), n)
    zl_in_h = code.logical_z_in_h_frame()

    def cycle(p, ideal, key):
        noisy, corrected, syn_comp, syn_h, xor_corr, z_corr = \
            _noise_syndrome_correct(code, noise_type, comp_parities,
                                    h_parities, p, ideal, key)
        fid_before = jnp.abs(jnp.sum(jnp.conj(ideal) * noisy)) ** 2
        fid_after = jnp.abs(jnp.sum(jnp.conj(ideal) * corrected)) ** 2
        if zl_in_h:
            corrected_read = _h_rotate_data(corrected, dq, n)
        else:
            corrected_read = corrected
        z_exp = jnp.sum(jnp.abs(corrected_read) ** 2
                        * jnp.asarray(zl_parity))
        return (fid_before, fid_after, z_exp,
                jnp.concatenate([syn_comp, syn_h]), xor_corr, z_corr)

    return jax.jit(jax.vmap(cycle, in_axes=(None, 0, 0)))


# ---------------------------------------------------------------------------
# QEC simulator
# ---------------------------------------------------------------------------

class QECSimulator:
    """Run QEC cycles and threshold sweeps on compiled cycle programs."""

    def __init__(self, code: QECCode):
        self._code = code
        self._cycle_fns: dict[str, callable] = {}
        self._states_fns: dict[str, callable] = {}
        self._encoded_cache: dict[int, StateVector] = {}

    @property
    def code(self) -> QECCode:
        return self._code

    def _cycle_fn(self, noise_type: str):
        fn = self._cycle_fns.get(noise_type)
        if fn is None:
            fn = build_cycle_fn(self._code, noise_type)
            self._cycle_fns[noise_type] = fn
        return fn

    def _encoded(self, logical_state: int) -> StateVector:
        sv = self._encoded_cache.get(logical_state)
        if sv is None:
            sv = self._code.encode(logical_state)
            self._encoded_cache[logical_state] = sv
        return sv

    def run_cycle(self, logical_state: int = 0,
                  noise_type: str = "bit_flip", noise_prob: float = 0.1,
                  seed: int | None = None) -> QECResult:
        """One encode -> noise -> syndrome -> correct cycle."""
        rng = np.random.default_rng(seed)
        ideal = self._encoded(logical_state)
        key = key_from_seed(int(rng.integers(0, 2**63)))

        fn = self._cycle_fn(noise_type)
        ideal_b = ideal.device_data[None, :]
        fb, fa, z_exp, syndrome, xor_corr, z_corr = fn(
            jnp.float32(noise_prob), ideal_b, key[None, :])

        syndrome_list = [int(b) for b in np.asarray(syndrome[0])]
        corrections = self._code.decode_syndrome(syndrome_list)

        # Materialize the (noisy, corrected) state pair for the result
        # object with the same key the batched cycle used.
        states_fn = self._states_fns.get(noise_type)
        if states_fn is None:
            states_fn = _build_states_fn(self._code, noise_type)
            self._states_fns[noise_type] = states_fn
        noisy_arr, corrected_arr = states_fn(jnp.float32(noise_prob),
                                             ideal.device_data, key)
        n = self._code.total_qubits
        noisy_sv = StateVector.from_device_array(noisy_arr, n)
        corrected_sv = StateVector.from_device_array(corrected_arr, n)

        expected_sign = 1.0 if logical_state == 0 else -1.0
        z_val = float(z_exp[0])
        return QECResult(
            encoded_state=ideal,
            noisy_state=noisy_sv,
            syndrome=syndrome_list,
            corrected_state=corrected_sv,
            fidelity_before=float(fb[0]),
            fidelity_after=float(fa[0]),
            correction_applied=corrections,
            logical_z_expectation=z_val,
            logical_error_detected=(z_val * expected_sign) < 0,
        )

    def threshold_sweep(self, noise_probs: list[float], n_trials: int = 100,
                        noise_type: str = "bit_flip",
                        seed: int | None = None) -> list[ThresholdPoint]:
        """Physical vs logical error rate: all trials at each p execute as
        one batched device launch; |0>_L / |1>_L alternate per trial."""
        rng = np.random.default_rng(seed)
        fn = self._cycle_fn(noise_type)

        logicals = np.arange(n_trials) % 2
        ideal0 = self._encoded(0).device_data
        ideal1 = self._encoded(1).device_data
        ideals = jnp.where((jnp.asarray(logicals) % 2 == 0)[:, None],
                           ideal0[None, :], ideal1[None, :])
        expected_signs = np.where(logicals == 0, 1.0, -1.0)

        results = []
        for p in noise_probs:
            seeds = rng.integers(0, 2**63, size=n_trials)
            keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
            fb, fa, z_exp, _, _, _ = fn(jnp.float32(p), ideals, keys)
            fa = np.asarray(fa, dtype=np.float64)
            z_exp = np.asarray(z_exp, dtype=np.float64)

            successes = int((fa > 0.5).sum())
            z_sign_correct = int(((z_exp * expected_signs) >= 0).sum())
            results.append(ThresholdPoint(
                physical_rate=float(p),
                logical_rate=1.0 - successes / n_trials,
                success_rate=successes / n_trials,
                avg_fidelity=float(fa.mean()),
                logical_z_fidelity=float(np.abs(z_exp).mean()),
                decoder_success_rate=z_sign_correct / n_trials,
                projection_logical_rate=float(1.0 - fa.mean()),
            ))
        return results

    def projection_logical_error(self, logical_state: int, noise_type: str,
                                 noise_prob: float, n_trials: int = 100,
                                 seed: int | None = None) -> dict:
        """1 - mean F(corrected, ideal) plus the Z_L-sign error rate."""
        rng = np.random.default_rng(seed)
        fn = self._cycle_fn(noise_type)
        ideal = self._encoded(logical_state).device_data
        ideals = jnp.broadcast_to(ideal, (n_trials, ideal.shape[0]))
        seeds = rng.integers(0, 2**63, size=n_trials)
        keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
        _, fa, z_exp, _, _, _ = fn(jnp.float32(noise_prob), ideals, keys)
        fa = np.asarray(fa, dtype=np.float64)
        z_exp = np.asarray(z_exp, dtype=np.float64)
        expected_sign = 1.0 if logical_state == 0 else -1.0
        mean_fid = float(fa.mean())
        return {
            "mean_fidelity": mean_fid,
            "logical_error_rate": 1.0 - mean_fid,
            "z_sign_error_rate": float(((z_exp * expected_sign) < 0).mean()),
            "n_trials": n_trials,
        }


def _build_states_fn(code, noise_type: str):
    """jitted (p, ideal, key) -> (noisy, corrected) state arrays (cached
    per QECSimulator/noise_type so run_cycle never recompiles). Shares
    the exact pipeline of build_cycle_fn via _noise_syndrome_correct."""
    n = code.total_qubits
    dim = 2**n
    comp_checks = code.comp_frame_checks()
    h_checks = code.h_frame_checks()
    comp_par = np.stack([_parity_vector(c, n) for c in comp_checks]) \
        if comp_checks else np.zeros((0, dim), np.float32)
    h_par = np.stack([_parity_vector(c, n) for c in h_checks]) \
        if h_checks else np.zeros((0, dim), np.float32)

    @jax.jit
    def states(p, ideal, k):
        noisy, corrected, *_ = _noise_syndrome_correct(
            code, noise_type, comp_par, h_par, p, ideal, k)
        return noisy, corrected

    return states


AVAILABLE_CODES = {
    "Bit-Flip [3,1,1]": BitFlipCode,
    "Phase-Flip [3,1,1]": PhaseFlipCode,
    "Steane [[7,1,3]]": SteaneCode,
    "Surface [[9,1,3]]": RotatedSurfaceCode,
}
