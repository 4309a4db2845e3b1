"""Native (C) host-path accelerators with transparent build + fallback.

The compute path is JAX/XLA on the accelerator; this package holds
the C extension for host-side result processing (counts dicts, bitstring
packing). On first import it compiles ``qsim_native.c`` with the system
toolchain if no up-to-date shared object exists; every consumer falls back
to pure Python when compilation is impossible.
"""

from __future__ import annotations

import importlib.util
import logging
import os
import subprocess
import sys
import sysconfig

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "qsim_native.c")
_SO = os.path.join(
    _DIR, f"_qsim_native{sysconfig.get_config_var('EXT_SUFFIX') or '.so'}")


def _needs_build() -> bool:
    if not os.path.exists(_SO):
        return True
    if not os.path.exists(_SRC):
        return False   # deployed .so without the .c: use it as-is
    return os.path.getmtime(_SRC) > os.path.getmtime(_SO)


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CC", "gcc"), "-O2", "-shared", "-fPIC",
        f"-I{include}", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, OSError) as e:
        logger.info("native build skipped: %s", e)
        return False


def _load():
    if _needs_build() and not _build():
        return None
    try:
        spec = importlib.util.spec_from_file_location("_qsim_native", _SO)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module
    except Exception as e:  # pragma: no cover - corrupt .so etc.
        logger.info("native load failed: %s", e)
        return None


_native = _load()

HAS_NATIVE = _native is not None


def get_native_module():
    """The loaded C extension module, or None (callers fall back)."""
    return _native


def counts_from_array_native(counts_array, num_qubits: int):
    """C path for {bitstring: count} dict building, or None if no native
    module is available (callers fall back to Python)."""
    if _native is None:
        return None
    import numpy as np

    arr = np.ascontiguousarray(counts_array, dtype=np.int64)
    return _native.counts_from_array(memoryview(arr), int(num_qubits))


def histogram_from_indices_native(indices, num_qubits: int):
    if _native is None:
        return None
    import numpy as np

    arr = np.ascontiguousarray(indices, dtype=np.int64)
    return _native.histogram_from_indices(memoryview(arr), int(num_qubits))


def pack_bits_native(bits_matrix, num_qubits: int):
    if _native is None:
        return None
    import numpy as np

    arr = np.ascontiguousarray(bits_matrix, dtype=np.uint8)
    rows = arr.shape[0]
    return _native.pack_bits(memoryview(arr.reshape(-1)), rows,
                             int(num_qubits))
