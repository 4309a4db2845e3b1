"""Rotated surface code: geometry, statevector cycles, frame engine,
exact minimum-weight decoding, and the degenerate-ML space-time decoder.

The surface code is a capability beyond the reference (its QEC zoo stops
at Steane, ``/root/reference/quantum_sim/engine/qec.py:697-701``); these
tests lock the new geometry/decoders against first principles (CSS
commutation, brute-force minimum weights, dense-HMM posterior replay)
and against the engines already validated in ``tests/test_qec.py`` /
``tests/test_qec_frame.py``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantum_simulator_tpu.qec import (
    AVAILABLE_CODES,
    QECSimulator,
    RotatedSurfaceCode,
    _coset_leader_lut,
    _rotated_surface_geometry,
)
from quantum_simulator_tpu.qec_frame import (
    FrameQECSimulator,
    build_ml_css_memory_fn,
    build_ml_memory_fn,
    frame_spec_from_code,
    surface_code_frame_spec,
)


def _support_matrix(checks, dq):
    mat = np.zeros((len(checks), dq), dtype=np.uint8)
    for i, qs in enumerate(checks):
        mat[i, qs] = 1
    return mat


def _gf2_rank(mat):
    m = mat.astype(np.int8).copy()
    rank = 0
    for col in range(m.shape[1]):
        piv = None
        for r in range(rank, m.shape[0]):
            if m[r, col]:
                piv = r
                break
        if piv is None:
            continue
        m[[rank, piv]] = m[[piv, rank]]
        for r in range(m.shape[0]):
            if r != rank and m[r, col]:
                m[r] ^= m[rank]
        rank += 1
    return rank


class TestGeometry:
    @pytest.mark.parametrize("d", [3, 5, 7])
    def test_structure(self, d):
        z, x, zl, xl = _rotated_surface_geometry(d)
        dq = d * d
        assert len(z) == len(x) == (dq - 1) // 2
        weights = sorted(len(c) for c in z + x)
        assert set(weights) == {2, 4}
        assert weights.count(2) == 2 * (d - 1)
        # CSS commutation: opposite-type checks overlap evenly
        for zc in z:
            for xc in x:
                assert len(set(zc) & set(xc)) % 2 == 0
        # logical operators: commute with opposite checks, overlap once
        for xc in x:
            assert len(set(zl) & set(xc)) % 2 == 0
        for zc in z:
            assert len(set(xl) & set(zc)) % 2 == 0
        assert len(set(zl) & set(xl)) == 1
        # independent stabilizers, and the logicals are not stabilizers
        hz = _support_matrix(z, dq)
        hx = _support_matrix(x, dq)
        assert _gf2_rank(hz) == len(z)
        assert _gf2_rank(hx) == len(x)
        zl_row = _support_matrix([zl], dq)
        assert _gf2_rank(np.vstack([hz, zl_row])) == len(z) + 1
        xl_row = _support_matrix([xl], dq)
        assert _gf2_rank(np.vstack([hx, xl_row])) == len(x) + 1

    def test_rejects_even_or_small(self):
        with pytest.raises(ValueError):
            _rotated_surface_geometry(4)
        with pytest.raises(ValueError):
            _rotated_surface_geometry(1)


class TestCosetLeaderLut:
    def test_d3_minimum_weight_vs_brute_force(self):
        z, _, _, _ = _rotated_surface_geometry(3)
        hz = _support_matrix(z, 9)
        lut = _coset_leader_lut(hz)
        # brute force: min weight per syndrome over all 2^9 errors
        best = {}
        for e in range(2 ** 9):
            bits = np.array([(e >> q) & 1 for q in range(9)], np.int8)
            s = 0
            for i in range(hz.shape[0]):
                s |= (int(bits @ hz[i]) % 2) << i
            w = int(bits.sum())
            best[s] = min(best.get(s, 99), w)
        assert len(best) == 16
        for s in range(16):
            syn = (hz @ lut[s]) % 2
            assert all(int(syn[i]) == ((s >> i) & 1) for i in range(4))
            assert int(lut[s].sum()) == best[s]

    def test_d5_consistency(self):
        z, _, _, _ = _rotated_surface_geometry(5)
        hz = _support_matrix(z, 25)
        lut = _coset_leader_lut(hz)
        syn = (lut @ hz.T) % 2
        idx = syn @ (1 << np.arange(12))
        assert np.array_equal(idx, np.arange(4096))
        # any weight<=2 error decodes to a correction no heavier
        rng = np.random.default_rng(7)
        for _ in range(200):
            w = rng.integers(1, 3)
            qs = rng.choice(25, size=w, replace=False)
            e = np.zeros(25, np.int8)
            e[qs] = 1
            s = int(((hz @ e) % 2) @ (1 << np.arange(12)))
            assert int(lut[s].sum()) <= w


class TestStatevectorSurface:
    def test_registered(self):
        assert AVAILABLE_CODES["Surface [[9,1,3]]"] is RotatedSurfaceCode
        assert RotatedSurfaceCode().name == "Surface [[9,1,3]]"

    def test_encode_states(self):
        code = RotatedSurfaceCode()
        s0, s1 = code.encode(0), code.encode(1)
        assert abs(np.linalg.norm(s0.data) - 1.0) < 1e-12
        assert abs(np.linalg.norm(s1.data) - 1.0) < 1e-12
        assert abs(np.vdot(s0.data, s1.data)) < 1e-12
        assert code.logical_z_expectation(s0) == pytest.approx(1.0)
        assert code.logical_z_expectation(s1) == pytest.approx(-1.0)
        assert code.extract_syndrome(s0) == [0] * 8
        assert code.extract_syndrome(s1) == [0] * 8

    def test_distance_cap(self):
        with pytest.raises(ValueError):
            RotatedSurfaceCode(5)

    def test_single_error_cycles_correct(self):
        # d=3 corrects every single-qubit X, Z, and Y error exactly
        from quantum_simulator_tpu.gates import X_MATRIX, Z_MATRIX
        code = RotatedSurfaceCode()
        for q in range(9):
            for mats in ([X_MATRIX], [Z_MATRIX], [X_MATRIX, Z_MATRIX]):
                state = code.encode(0)
                for m in mats:
                    state.apply_gate(m, [q])
                syn = code.extract_syndrome(state)
                code.apply_correction(state, code.decode_syndrome(syn))
                assert code.logical_fidelity(state, 0) == pytest.approx(
                    1.0, abs=1e-9)

    def test_noiseless_cycle(self):
        sim = QECSimulator(RotatedSurfaceCode())
        res = sim.run_cycle(logical_state=0, noise_type="bit_flip",
                            noise_prob=0.0, seed=3)
        assert res.fidelity_after == pytest.approx(1.0, abs=1e-6)
        assert res.logical_z_expectation == pytest.approx(1.0, abs=1e-6)

    def test_threshold_sweep_suppresses_low_p(self):
        sim = QECSimulator(RotatedSurfaceCode())
        pts = sim.threshold_sweep([0.02], n_trials=150,
                                  noise_type="depolarizing", seed=11)
        # single-error events dominate and are all corrected
        assert pts[0].success_rate > 0.9


class TestFrameSurface:
    def test_frame_spec_shapes(self):
        spec = surface_code_frame_spec(3)
        assert spec.data_qubits == 9
        assert spec.comp_checks.shape == (4, 9)
        assert spec.h_checks.shape == (4, 9)
        spec5 = surface_code_frame_spec(5)
        assert spec5.data_qubits == 25
        assert spec5.comp_checks.shape == (12, 25)
        # d=7 routes to union-find matching (the exact tables cap at 5)
        spec7 = surface_code_frame_spec(7)
        assert spec7.data_qubits == 49
        with pytest.raises(ValueError):
            surface_code_frame_spec(7, decoder="exact")

    def test_draw_exact_vs_statevector(self):
        """Same seed -> identical per-trial outcomes on both engines."""
        code = RotatedSurfaceCode()
        sv = QECSimulator(code)
        fr = FrameQECSimulator(surface_code_frame_spec(3))
        for noise in ("bit_flip", "depolarizing"):
            a = sv.threshold_sweep([0.05, 0.15], n_trials=60,
                                   noise_type=noise, seed=5)
            b = fr.threshold_sweep([0.05, 0.15], n_trials=60,
                                   noise_type=noise, seed=5)
            for pa, pb in zip(a, b):
                assert pa.success_rate == pytest.approx(pb.success_rate)
                assert pa.logical_rate == pytest.approx(pb.logical_rate)
                assert pa.decoder_success_rate == pytest.approx(
                    pb.decoder_success_rate)

    def test_frame_spec_from_code_matches_native_spec(self):
        """The LUT lifted through RotatedSurfaceCode.decode_syndrome and
        the native coset-leader LUT decode identically."""
        lifted = frame_spec_from_code(RotatedSurfaceCode())
        native = surface_code_frame_spec(3)
        rng = np.random.default_rng(0)
        sc = jnp.asarray(rng.integers(0, 2, size=(64, 4)), jnp.int32)
        sh = jnp.asarray(rng.integers(0, 2, size=(64, 4)), jnp.int32)
        lx, lz = lifted.decode(sc, sh)
        nx, nz = native.decode(sc, sh)
        assert np.array_equal(np.asarray(lx), np.asarray(nx))
        assert np.array_equal(np.asarray(lz), np.asarray(nz))

    def test_distance_suppression(self):
        """Below threshold, d=5 beats d=3."""
        p = 0.04
        rates = {}
        for d in (3, 5):
            fr = FrameQECSimulator(surface_code_frame_spec(d))
            err, _ = fr.throughput_sweep(p, 20000, "bit_flip", seed=2)
            rates[d] = err
        assert rates[5] < rates[3] < 0.1

    def test_memory_experiment_runs(self):
        fr = FrameQECSimulator(surface_code_frame_spec(3))
        res = fr.memory_experiment(0.02, n_rounds=5, n_trials=2000,
                                   noise_type="bit_flip",
                                   meas_error_prob=0.02, seed=1)
        assert 0.0 <= res["logical_failure_probability"] <= 1.0
        longer = fr.memory_experiment(0.02, n_rounds=15, n_trials=2000,
                                      noise_type="bit_flip",
                                      meas_error_prob=0.02, seed=1)
        assert (longer["logical_failure_probability"]
                >= res["logical_failure_probability"])


class TestMLCssDecoder:
    def test_matches_repetition_ml(self):
        """On repetition-chain checks the general CSS decoder reproduces
        build_ml_memory_fn draw-for-draw (same keys, same fail flags)."""
        d, rounds = 5, 4
        checks = np.zeros((d - 1, d), np.uint8)
        for i in range(d - 1):
            checks[i, i] = checks[i, i + 1] = 1
        gen = build_ml_css_memory_fn(checks, np.ones(d, np.uint8), rounds)
        rep = build_ml_memory_fn(d, rounds)
        keys = jax.random.split(jax.random.PRNGKey(42), 400)
        g_ml, g_mw = gen(jnp.float32(0.08), jnp.float32(0.05), keys)
        r_ml, r_mw = rep(jnp.float32(0.08), jnp.float32(0.05), keys)
        assert np.array_equal(np.asarray(g_ml), np.asarray(r_ml))
        assert np.array_equal(np.asarray(g_mw), np.asarray(r_mw))

    def test_surface_posterior_vs_dense_hmm(self):
        """The WHT forward pass equals a dense 512x512 HMM replay: the
        per-trial ML decision matches brute-force exact inference."""
        z, _, zl, _ = _rotated_surface_geometry(3)
        hz = _support_matrix(z, 9)
        support = np.zeros(9, np.uint8)
        support[zl] = 1
        rounds = 3
        fn = build_ml_css_memory_fn(hz, support, rounds, return_trace=True)
        keys = jax.random.split(jax.random.PRNGKey(7), 50)
        p, q = 0.06, 0.08
        fail_ml, _, syndromes, x_final = fn(
            jnp.float32(p), jnp.float32(q), keys)
        syndromes = np.asarray(syndromes)      # (R, T, 4)
        x_final = np.asarray(x_final)
        fail_ml = np.asarray(fail_ml)

        # dense replay
        dim = 512
        idx = np.arange(dim)
        bits = ((idx[:, None] >> np.arange(9)) & 1).astype(np.int8)
        ham = (bits[:, None, :] != bits[None, :, :]).sum(axis=2)
        K = (p ** ham) * ((1 - p) ** (9 - ham))
        par = (bits @ hz.T) % 2                # (dim, 4)
        pow2 = 1 << np.arange(9)
        ker = []
        for e in range(dim):
            if np.all((bits[e] @ hz.T) % 2 == 0):
                ker.append(e)
        assert len(ker) == 32
        log_par = (bits @ support) % 2
        n_fail_mismatch = 0
        for t in range(syndromes.shape[1]):
            alpha = np.zeros(dim)
            alpha[0] = 1.0
            for r in range(rounds):
                alpha = K @ alpha
                s = syndromes[r, t]
                mis = (par != s[None, :]).sum(axis=1)
                alpha *= (q ** mis) * ((1 - q) ** (4 - mis))
                alpha /= alpha.sum()
            xf = int(x_final[t] @ pow2)
            sf = tuple((bits[xf] @ hz.T) % 2)
            m0 = m1 = 0.0
            for e in range(dim):
                if tuple(par[e]) == sf:
                    if log_par[e]:
                        m1 += alpha[e]
                    else:
                        m0 += alpha[e]
            pred = 1 if m1 > m0 else 0
            actual = int(log_par[xf])
            if (pred != actual) != bool(fail_ml[t]):
                n_fail_mismatch += 1
        assert n_fail_mismatch == 0

    def test_ml_beats_minweight_under_meas_noise(self):
        res = FrameQECSimulator.ml_surface_memory_experiment(
            0.04, n_rounds=8, n_trials=20000, meas_error_prob=0.04, seed=3)
        assert (res["ml_failure_probability"]
                <= res["final_syndrome_failure_probability"])
        assert res["ml_failure_probability"] < 0.5

    def test_caps(self):
        with pytest.raises(ValueError):
            build_ml_css_memory_fn(np.zeros((2, 15), np.uint8),
                                   np.ones(15, np.uint8), 3)
        with pytest.raises(ValueError):
            FrameQECSimulator.ml_surface_memory_experiment(
                0.01, 2, 10, distance=5)
