"""Native C extension: builds in this environment and matches Python."""

import numpy as np
import pytest

from quantum_simulator_tpu.native import (
    HAS_NATIVE,
    counts_from_array_native,
    histogram_from_indices_native,
    pack_bits_native,
)


def test_native_builds_here():
    """This image ships gcc; the extension must actually build."""
    assert HAS_NATIVE


@pytest.mark.skipif(not HAS_NATIVE, reason="no native toolchain")
class TestNative:
    def test_counts_from_array_matches_python(self, rng):
        counts = rng.integers(0, 5, size=2**10).astype(np.int64)
        n = 10
        got = counts_from_array_native(counts, n)
        expected = {format(i, f"0{n}b"): int(c)
                    for i, c in enumerate(counts) if c}
        assert got == expected

    def test_counts_skips_zeros(self):
        arr = np.zeros(8, dtype=np.int64)
        arr[3] = 7
        assert counts_from_array_native(arr, 3) == {"011": 7}

    def test_histogram_from_indices(self):
        idx = np.array([0, 3, 3, 7, 3], dtype=np.int64)
        got = histogram_from_indices_native(idx, 3)
        assert got == {"000": 1, "011": 3, "111": 1}

    def test_pack_bits(self):
        bits = np.array([[1, 0, 1], [0, 1, 1]], dtype=np.uint8)
        assert pack_bits_native(bits, 3) == [0b101, 0b011]

    def test_counts_rejects_bad_qubits(self):
        import quantum_simulator_tpu.native as nat

        with pytest.raises(ValueError):
            nat._native.counts_from_array(
                memoryview(np.zeros(2, np.int64)), 0)

    def test_wired_into_measurement(self):
        from quantum_simulator_tpu.measurement import counts_from_array

        arr = np.zeros(16, dtype=np.int64)
        arr[5] = 2
        arr[15] = 1
        assert counts_from_array(arr, 4) == {"0101": 2, "1111": 1}

    def test_large_histogram_fast(self):
        import time

        counts = np.ones(2**16, dtype=np.int64)
        t0 = time.perf_counter()
        got = counts_from_array_native(counts, 16)
        elapsed = time.perf_counter() - t0
        assert len(got) == 2**16
        assert elapsed < 0.5
