"""Global engine configuration for the TPU-native quantum simulator.

The reference engine (``/root/reference/quantum_sim/engine``) is pure NumPy
complex128 and hard-caps circuits at 16 qubits (``state_vector.py:16``,
``circuit.py:130``). This rebuild targets TPU, where the native complex type
is complex64 (complex128 is software-emulated and slow), and where sharding
over a device mesh lifts the qubit cap far beyond 16.

Precision policy:
  * device compute defaults to complex64 (TPU-native),
  * tiny host-side reductions (2x2 density matrices, eigenvalues, confusion
    matrices) run in NumPy float64/complex128 for reference-grade accuracy,
  * a complex128 device mode exists for verification on CPU backends.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class EngineConfig:
    """Mutable global knobs for the simulation engine."""

    # Device dtype for statevector amplitudes.
    dtype: object = jnp.complex64
    # Hard cap on single-host qubit count (2**30 complex64 = 8 GiB; a v5e
    # chip has 16 GiB HBM). Sharded states may exceed this per-mesh.
    max_qubits: int = 32
    # Structural cap on the circuit IR itself. Non-amplitude engines
    # (the Clifford tableau engine, the Pauli-frame QEC engine) hold
    # hundreds of qubits in O(n^2) bits, so the IR accepts far more than
    # the amplitude engines do; every amplitude path validates against
    # ``max_qubits`` at its own entry.
    max_circuit_qubits: int = 4096
    # Compile-cache size (circuit-structure keyed).
    compile_cache_size: int = 128
    # In-place Pallas kernels for dense/cross group-plan steps (TPU
    # only; see ops/pallas_exec.py). Default OFF: measured end-to-end
    # on chip they LOSE to XLA despite winning in isolation (n=30
    # brickwork: 416 ms all-XLA vs 505-571 ms with Pallas steps mixed
    # in) — XLA pipelines consecutive whole-state einsums to ~22 ms/pass
    # in context, and each pallas_call boundary breaks that scheduling.
    # Kept as an evaluated option; flip for experimentation.
    pallas_steps: bool = False
    # Interactive (edit-hot) forward routing: when True, a circuit
    # structure with no fused compiled program yet runs through the
    # skeleton-keyed executor (ops/plan.interactive_forward_fn) — a
    # 1-gate edit that preserves the plan's step skeleton reuses the
    # compiled executable instead of paying a fresh 20-60 s remote
    # compile. The GUI bootstrap flips this on; batch/bench paths keep
    # the fused (operands-in-trace) program.
    interactive: bool = False

    @property
    def real_dtype(self):
        return jnp.float64 if self.dtype == jnp.complex128 else jnp.float32


CONFIG = EngineConfig()


def _bootstrap_compilation_cache() -> str | None:
    """Point jax at a persistent on-disk compilation cache so expensive
    TPU compiles are paid once per MACHINE, not once per process
    (SURVEY §7 recompilation management).

    Env knobs: ``QSIM_COMPILE_CACHE=/path`` overrides the location (and
    force-enables on any platform), ``QSIM_COMPILE_CACHE=0`` disables.
    Only compiles slower than 1 s persist (keeps the cache to the
    expensive device programs; tiny CPU helper jits stay memory-only).

    Platform gating (both cases MEASURED, round 5):

    * the experimental ``axon`` tunnel plugin does not truly serialize
      executables — a persistent-cache HIT on the n=16 skeleton
      executor still paid the full server-side compile (child cold
      96-178 s vs parent cold 85 s; key hit confirmed in jax debug
      logs), so the cache is default-OFF there (a hit costs slightly
      MORE than a miss: the blob round-trips first);
    * pure-CPU processes (tests, the virtual mesh) also skip it:
      XLA:CPU AOT entries pin compile-machine features
      ("+prefer-no-gather") that the loader then rejects on the SAME
      host — every lookup logs a cpu_aot_loader error and recompiles
      anyway.

    On standard PJRT TPU runtimes (real deployments, where executable
    serialization works) the cache stays ON — enabled when
    JAX_PLATFORMS explicitly names such a platform (e.g. ``tpu``).
    An UNSET env var also stays off: plugin auto-discovery could still
    resolve to the axon tunnel, and sniffing the resolved backend here
    would force jax initialization at import time."""
    loc = os.environ.get("QSIM_COMPILE_CACHE", "")
    if loc in ("0", "off", "none"):
        return None
    platforms = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if platforms in ("", "cpu", "axon") and not loc:
        return None
    if not loc:
        loc = os.path.join(
            os.path.expanduser("~"), ".cache", "quantum_simulator_tpu",
            "xla_cache")
    try:
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - read-only FS / old jax
        return None
    return loc


COMPILE_CACHE_DIR = _bootstrap_compilation_cache()


def default_backend() -> str:
    return jax.default_backend()


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no devices at all
        return False


def statevector_dtype():
    return CONFIG.dtype


def np_dtype():
    """NumPy dtype mirror for host-side reference computations."""
    return np.complex128


def enable_complex128() -> None:
    """Switch the engine to complex128 verification mode.

    Requires x64 support in jax (enabled here); intended for CPU-backend
    numerical verification — complex128 on TPU is software-emulated and
    slow. Call BEFORE building any compiled programs.
    """
    jax.config.update("jax_enable_x64", True)
    CONFIG.dtype = jnp.complex128


def enable_complex64() -> None:
    """Back to the TPU-native default."""
    CONFIG.dtype = jnp.complex64
