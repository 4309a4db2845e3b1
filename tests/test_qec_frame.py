"""Pauli-frame QEC engine vs the statevector engine: draw-exact parity.

The frame engine consumes PRNG keys in the statevector sweep's exact
order, so under the same seed the two must agree per-trial, not just in
aggregate (see quantum_simulator_tpu/qec_frame.py docstring)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantum_simulator_tpu.qec import (
    BitFlipCode, PhaseFlipCode, SteaneCode, QECSimulator, build_cycle_fn,
)
from quantum_simulator_tpu.qec_frame import (
    FrameQECSimulator, frame_spec_from_code, repetition_frame_spec,
    build_frame_sweep_fn,
)


CASES = [
    (BitFlipCode, "bit_flip"),
    (BitFlipCode, "depolarizing"),
    (PhaseFlipCode, "phase_flip"),
    (PhaseFlipCode, "depolarizing"),
    (SteaneCode, "depolarizing"),
    (SteaneCode, "bit_flip"),
]


@pytest.mark.parametrize("code_cls,noise_type", CASES)
def test_threshold_sweep_matches_statevector(code_cls, noise_type):
    code = code_cls()
    sv = QECSimulator(code)
    fr = FrameQECSimulator.from_code(code)
    probs = [0.05, 0.2]
    n_trials = 32
    pts_sv = sv.threshold_sweep(probs, n_trials=n_trials,
                                noise_type=noise_type, seed=7)
    pts_fr = fr.threshold_sweep(probs, n_trials=n_trials,
                                noise_type=noise_type, seed=7)
    for a, b in zip(pts_sv, pts_fr):
        assert a.physical_rate == b.physical_rate
        assert a.success_rate == b.success_rate
        assert a.logical_rate == b.logical_rate
        assert a.decoder_success_rate == b.decoder_success_rate
        assert abs(a.avg_fidelity - b.avg_fidelity) < 1e-5
        assert abs(a.logical_z_fidelity - b.logical_z_fidelity) < 1e-5
        assert abs(a.projection_logical_rate
                   - b.projection_logical_rate) < 1e-5


def test_per_trial_outcomes_match_statevector_cycle():
    """Same keys into both kernels -> identical per-trial flags."""
    code = SteaneCode()
    noise_type = "depolarizing"
    p = 0.15
    n_trials = 24
    keys = jnp.stack([jax.random.PRNGKey(1000 + i) for i in range(n_trials)])

    sim = QECSimulator(code)
    ideal0 = sim._encoded(0).device_data
    ideals = jnp.broadcast_to(ideal0, (n_trials, ideal0.shape[0]))
    fb, fa, z_exp, _, _, _ = build_cycle_fn(code, noise_type)(
        jnp.float32(p), ideals, keys)

    fn = build_frame_sweep_fn(frame_spec_from_code(code), noise_type)
    ok_before, ok_after, flip = fn(jnp.float32(p), keys)

    np.testing.assert_array_equal(
        np.asarray(fa) > 0.5, np.asarray(ok_after).astype(bool))
    np.testing.assert_array_equal(
        np.asarray(fb) > 0.5, np.asarray(ok_before).astype(bool))
    # z_exp is +-1 for the |0>_L ideal; its sign is the flip bit.
    np.testing.assert_array_equal(
        np.asarray(z_exp) < 0, np.asarray(flip).astype(bool))
    np.testing.assert_allclose(np.abs(np.asarray(z_exp)), 1.0, atol=1e-5)


def test_repetition_d3_equals_bitflip_code():
    """The d=3 repetition spec IS the BitFlipCode (same checks, same
    ML decode) — outcomes must be identical under shared keys."""
    keys = jax.random.split(jax.random.PRNGKey(5), 64)
    p = jnp.float32(0.2)
    out_rep = build_frame_sweep_fn(
        repetition_frame_spec(3, "bit_flip"), "bit_flip")(p, keys)
    out_code = build_frame_sweep_fn(
        frame_spec_from_code(BitFlipCode()), "bit_flip")(p, keys)
    for a, b in zip(out_rep, out_code):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_repetition_ml_decoder_corrects_minority_patterns():
    """Any weight-<=(d-1)/2 error must decode to zero residual."""
    d = 7
    spec = repetition_frame_spec(d, "bit_flip")
    checks = jnp.asarray(spec.comp_checks, jnp.int32)
    errors = []
    for w in range(0, (d - 1) // 2 + 1):
        rng = np.random.default_rng(w)
        for _ in range(8):
            e = np.zeros(d, np.int32)
            e[rng.choice(d, size=w, replace=False)] = 1
            errors.append(e)
    ex = jnp.asarray(np.stack(errors))
    syn = (ex @ checks.T) & 1
    cx, cz = spec.decode(syn, jnp.zeros((ex.shape[0], 0), jnp.int32))
    np.testing.assert_array_equal(np.asarray(ex ^ cx),
                                  np.zeros_like(np.asarray(ex)))
    np.testing.assert_array_equal(np.asarray(cz), 0)


def test_majority_failure_patterns_flip_logical():
    """A weight-(d+1)/2 contiguous error decodes to the complement ->
    logical flip, detected by ok_after=0 and flip=1 via the predicate."""
    d = 5
    spec = repetition_frame_spec(d, "bit_flip")
    checks = jnp.asarray(spec.comp_checks, jnp.int32)
    e = np.zeros((1, d), np.int32)
    e[0, :3] = 1  # weight 3 > d/2
    ex = jnp.asarray(e)
    syn = (ex @ checks.T) & 1
    cx, _ = spec.decode(syn, jnp.zeros((1, 0), jnp.int32))
    residual = np.asarray(ex ^ cx)
    np.testing.assert_array_equal(residual, np.ones((1, d), np.int32))


def test_logical_rate_improves_with_distance():
    p, trials = 0.05, 4096
    rates = []
    for d in (3, 9):
        fr = FrameQECSimulator(repetition_frame_spec(d, "bit_flip"))
        rate, _ = fr.throughput_sweep(p, trials, "bit_flip", seed=3)
        rates.append(rate)
    assert rates[1] < rates[0]


def test_phase_flip_repetition_suppresses_z_noise():
    fr = FrameQECSimulator(repetition_frame_spec(9, "phase_flip"))
    rate_z, _ = fr.throughput_sweep(0.05, 4096, "phase_flip", seed=11)
    assert rate_z < 0.01
    # ...and is blind to X noise (X acts trivially on |+...+>):
    rate_x, _ = fr.throughput_sweep(0.3, 1024, "bit_flip", seed=11)
    assert rate_x == 0.0


def test_projection_logical_error_matches_statevector():
    code = BitFlipCode()
    sv = QECSimulator(code).projection_logical_error(
        0, "bit_flip", 0.1, n_trials=40, seed=13)
    fr = FrameQECSimulator.from_code(code).projection_logical_error(
        0, "bit_flip", 0.1, n_trials=40, seed=13)
    assert abs(sv["mean_fidelity"] - fr["mean_fidelity"]) < 1e-5
    assert sv["z_sign_error_rate"] == fr["z_sign_error_rate"]
    assert sv["n_trials"] == fr["n_trials"]


def test_mesh_sharded_sweep_matches_single_device():
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("trials",))
    fr = FrameQECSimulator(repetition_frame_spec(5, "bit_flip"))
    keys = jax.random.split(jax.random.PRNGKey(9), 64)
    plain = fr.sweep_raw(0.1, 64, "bit_flip", keys=keys)
    sharded = fr.sweep_raw(0.1, 64, "bit_flip", keys=keys, mesh=mesh)
    for a, b in zip(plain, sharded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMemoryExperiment:
    def test_distance_suppresses_multi_round_failure(self):
        p, rounds, trials = 0.02, 10, 2048
        rates = []
        for d in (3, 7):
            fr = FrameQECSimulator(repetition_frame_spec(d, "bit_flip"))
            res = fr.memory_experiment(p, rounds, trials, "bit_flip",
                                       seed=21)
            rates.append(res["logical_failure_probability"])
        assert rates[1] < rates[0]

    def test_failure_accumulates_with_rounds(self):
        fr = FrameQECSimulator(repetition_frame_spec(3, "bit_flip"))
        p5 = fr.memory_experiment(0.08, 5, 2048, seed=2)
        p40 = fr.memory_experiment(0.08, 40, 2048, seed=2)
        assert (p40["logical_failure_probability"]
                > p5["logical_failure_probability"])
        # ...while the per-round rate stays comparable (memoryless-ish).
        assert p40["per_round_logical_rate"] == pytest.approx(
            p5["per_round_logical_rate"], rel=0.6)

    def test_measurement_noise_degrades_per_round_decoding(self):
        fr = FrameQECSimulator(repetition_frame_spec(5, "bit_flip"))
        clean = fr.memory_experiment(0.02, 8, 2048, seed=4)
        noisy = fr.memory_experiment(0.02, 8, 2048, seed=4,
                                     meas_error_prob=0.3)
        assert (noisy["logical_failure_probability"]
                > clean["logical_failure_probability"])

    def test_zero_noise_never_fails(self):
        fr = FrameQECSimulator(repetition_frame_spec(3, "bit_flip"))
        res = fr.memory_experiment(0.0, 12, 256, seed=5)
        assert res["logical_failure_probability"] == 0.0

    def test_steane_memory_runs_via_lut_decode(self):
        fr = FrameQECSimulator.from_code(SteaneCode())
        res = fr.memory_experiment(0.01, 4, 512, "depolarizing", seed=6)
        assert 0.0 <= res["logical_failure_probability"] < 0.2

    def test_mesh_sharded_memory_matches_single_device(self):
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("trials",))
        fr = FrameQECSimulator(repetition_frame_spec(5, "bit_flip"))
        a = fr.memory_experiment(0.05, 6, 64, seed=8)
        fr2 = FrameQECSimulator(repetition_frame_spec(5, "bit_flip"))
        b = fr2.memory_experiment(0.05, 6, 64, seed=8, mesh=mesh)
        assert a == b


class TestMLSpaceTimeDecoder:
    def test_matches_brute_force_posterior(self):
        """The WHT transfer-matrix decoder must reproduce the exact
        enumerated posterior argmax on every (non-tied) trial."""
        from quantum_simulator_tpu.qec_frame import build_ml_memory_fn
        import itertools

        d, R, p, q, T = 3, 2, 0.15, 0.12, 64
        fn = build_ml_memory_fn(d, R, return_trace=True)
        keys = jax.random.split(jax.random.PRNGKey(17), T)
        fail_ml, _, syndromes, X_final = fn(
            jnp.float32(p), jnp.float32(q), keys)
        syndromes = np.asarray(syndromes)      # (R, T, d-1)
        X_final = np.asarray(X_final)          # (T, d)
        fail_ml = np.asarray(fail_ml)

        def h(x):
            return x[:-1] ^ x[1:]

        flip_sets = [np.array(f, np.int32)
                     for f in itertools.product((0, 1), repeat=d)]
        for t in range(T):
            obs = syndromes[:, t, :]
            post = {}
            for f1 in flip_sets:
                for f2 in flip_sets:
                    x1, x2 = f1, f1 ^ f2
                    w = 1.0
                    for f in (f1, f2):
                        k = int(f.sum())
                        w *= p ** k * (1 - p) ** (d - k)
                    for x, o in ((x1, obs[0]), (x2, obs[1])):
                        m = int((h(x) ^ o).sum())
                        w *= q ** m * (1 - q) ** (d - 1 - m)
                    key = tuple(x2)
                    post[key] = post.get(key, 0.0) + w
            s_fin = h(X_final[t])
            e0 = np.concatenate([[0], np.cumsum(s_fin) % 2]).astype(np.int32)
            e1 = 1 - e0
            p0, p1 = post.get(tuple(e0), 0.0), post.get(tuple(e1), 0.0)
            if abs(p0 - p1) < 1e-12 * max(p0, p1, 1e-300):
                continue  # tie — decoder's choice is arbitrary
            brute_pred = e0[0] if p0 > p1 else e1[0]
            dec_pred = X_final[t, 0] ^ fail_ml[t]
            assert dec_pred == brute_pred, f"trial {t}"

    def test_ml_beats_single_shot_under_measurement_noise(self):
        from quantum_simulator_tpu.qec_frame import FrameQECSimulator
        res = FrameQECSimulator.ml_memory_experiment(
            distance=5, noise_prob=0.05, n_rounds=8, n_trials=4096,
            meas_error_prob=0.1, seed=23)
        assert (res["ml_failure_probability"]
                <= res["final_syndrome_failure_probability"])
        # With q=0.1 the history matters: strict improvement expected.
        assert (res["ml_failure_probability"]
                < res["final_syndrome_failure_probability"])

    def test_ml_uses_history_even_with_perfect_measurements(self):
        """Two single errors in different rounds can cumulate to a
        majority-weight pattern the single-shot decoder mispredicts;
        the history resolves it — strictly fewer failures."""
        from quantum_simulator_tpu.qec_frame import FrameQECSimulator
        res = FrameQECSimulator.ml_memory_experiment(
            distance=3, noise_prob=0.15, n_rounds=6, n_trials=8192,
            meas_error_prob=0.0, seed=31)
        assert (res["ml_failure_probability"]
                < res["final_syndrome_failure_probability"])

    def test_distance_suppression_with_ml(self):
        from quantum_simulator_tpu.qec_frame import FrameQECSimulator
        rates = []
        for d in (3, 7):
            res = FrameQECSimulator.ml_memory_experiment(
                distance=d, noise_prob=0.03, n_rounds=5, n_trials=4096,
                meas_error_prob=0.03, seed=37)
            rates.append(res["ml_failure_probability"])
        assert rates[1] < rates[0]

    def test_zero_noise_perfect(self):
        from quantum_simulator_tpu.qec_frame import FrameQECSimulator
        res = FrameQECSimulator.ml_memory_experiment(
            distance=5, noise_prob=0.0, n_rounds=4, n_trials=128, seed=2)
        assert res["ml_failure_probability"] == 0.0
        assert res["final_syndrome_failure_probability"] == 0.0

    def test_invalid_distance_rejected(self):
        from quantum_simulator_tpu.qec_frame import build_ml_memory_fn
        with pytest.raises(ValueError):
            build_ml_memory_fn(4, 2)
        with pytest.raises(ValueError):
            build_ml_memory_fn(17, 2)


def test_invalid_specs_rejected():
    with pytest.raises(ValueError):
        repetition_frame_spec(4)
    with pytest.raises(ValueError):
        repetition_frame_spec(3, "amplitude")
    fr = FrameQECSimulator(repetition_frame_spec(3))
    with pytest.raises(ValueError):
        fr.sweep_raw(0.1, 8, "amplitude_damping")
