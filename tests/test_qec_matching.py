"""Union-find matching decoder (`qec_matching`) + d>=7 surface frames.

Locks the three contracts the module documents:
  - C extension and pure-Python decoder are bit-identical,
  - every correction reproduces its syndrome exactly (H @ c % 2 == s),
  - near-ML accuracy: all weight-1 errors corrected, distance scaling
    below threshold, and within a bounded factor of the exact
    coset-leader decoder at d<=5.
"""

import numpy as np
import pytest

from quantum_simulator_tpu import qec_matching as qm
from quantum_simulator_tpu.qec import _rotated_surface_geometry
from quantum_simulator_tpu.qec_frame import (
    FrameQECSimulator, _checks_matrix, surface_code_frame_spec)


def _surface_z_sector(d):
    z_checks, _, _, _ = _rotated_surface_geometry(d)
    return _checks_matrix(z_checks, d * d)


def _repetition_checks(d):
    H = np.zeros((d - 1, d), dtype=np.uint8)
    for i in range(d - 1):
        H[i, i] = H[i, i + 1] = 1
    return H


# ---------------------------------------------------------------------------
# Graph construction
# ---------------------------------------------------------------------------

def test_from_checks_repetition_chain():
    g = qm.MatchingGraph.from_checks(_repetition_checks(5))
    assert g.n_checks == 4 and g.n_qubits == 5
    assert g.has_boundary and g.boundary == 4
    # end qubits hit the boundary vertex
    assert g.boundary in g.edges[0] and g.boundary in g.edges[4]


def test_from_checks_rejects_weight3_columns():
    H = np.array([[1, 1, 0], [1, 0, 1], [1, 1, 1]], dtype=np.uint8)
    with pytest.raises(ValueError, match="touches 3 checks"):
        qm.MatchingGraph.from_checks(H)


def test_surface_sectors_are_matchable_graphs():
    for d in (3, 5, 7):
        g = qm.MatchingGraph.from_checks(_surface_z_sector(d))
        assert g.n_qubits == d * d
        assert g.has_boundary


# ---------------------------------------------------------------------------
# Decoder correctness
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("d", [3, 5, 7, 9])
def test_syndrome_reproduction_invariant(d):
    H = _surface_z_sector(d)
    g = qm.MatchingGraph.from_checks(H)
    rng = np.random.default_rng(d)
    errs = (rng.random((256, d * d)) < 0.10).astype(np.uint8)
    syn = (errs @ H.T) % 2
    corr = qm.decode_batch(g, syn)
    assert (((corr @ H.T) % 2) == syn).all()


@pytest.mark.parametrize("d", [3, 5, 7])
def test_c_and_python_paths_bit_identical(d):
    H = _surface_z_sector(d)
    g = qm.MatchingGraph.from_checks(H)
    rng = np.random.default_rng(7 * d)
    syn = ((rng.random((128, d * d)) < 0.12).astype(np.uint8) @ H.T) % 2
    c_py = qm.decode_batch(g, syn, force_python=True)
    c_c = qm.decode_batch(g, syn)
    assert (c_py == c_c).all()


@pytest.mark.parametrize("d", [3, 5, 7])
def test_all_weight1_errors_corrected_up_to_stabilizer(d):
    """Every single data error must be corrected: the residual
    ``corr ^ err`` must be a stabilizer — weight-1 correction, zero
    syndrome, and no logical flip (even overlap with Z_L's support).
    Exact identity is NOT required: a boundary qubit's syndrome has
    degenerate weight-1 representatives and any of them is correct."""
    H = _surface_z_sector(d)
    _, _, z_logical, _ = _rotated_surface_geometry(d)
    sup = np.zeros(d * d, dtype=np.uint8)
    sup[z_logical] = 1
    g = qm.MatchingGraph.from_checks(H)
    errs = np.eye(d * d, dtype=np.uint8)
    corr = qm.decode_batch(g, (errs @ H.T) % 2)
    assert (corr.sum(axis=1) == 1).all()
    residual = corr ^ errs
    assert (((residual @ H.T) % 2) == 0).all()
    assert ((residual @ sup) % 2 == 0).all()


def test_repetition_matches_exact_coset_leaders():
    """On a chain graph union-find peeling IS min-weight: check every
    syndrome of the d=7 repetition code against the coset-leader LUT."""
    from quantum_simulator_tpu.qec import _coset_leader_lut
    H = _repetition_checks(7)
    g = qm.MatchingGraph.from_checks(H)
    lut = np.asarray(_coset_leader_lut(H))
    syn = np.array([[(s >> i) & 1 for i in range(6)] for s in range(64)],
                   dtype=np.uint8)
    corr = qm.decode_batch(g, syn)
    assert (corr.sum(axis=1) == lut.sum(axis=1)).all()


def test_unmatchable_ring_syndrome_raises():
    """A 4-cycle (toric-like, no boundary) with odd defect parity has no
    matching; both paths must reject rather than return garbage."""
    H = np.array([[1, 1, 0, 0],
                  [0, 1, 1, 0],
                  [0, 0, 1, 1],
                  [1, 0, 0, 1]], dtype=np.uint8)
    g = qm.MatchingGraph.from_checks(H)
    assert not g.has_boundary
    odd = np.array([[1, 0, 0, 0]], dtype=np.uint8)
    with pytest.raises((ValueError, RuntimeError)):
        qm.decode_batch(g, odd, force_python=True)
    with pytest.raises((ValueError, RuntimeError)):
        qm.decode_batch(g, odd)
    # even parity on the same ring decodes fine
    even = np.array([[1, 1, 0, 0], [1, 0, 1, 0]], dtype=np.uint8)
    corr = qm.decode_batch(g, even)
    assert (((corr @ H.T) % 2) == even).all()


def test_decode_batch_validates_shape():
    g = qm.MatchingGraph.from_checks(_repetition_checks(3))
    with pytest.raises(ValueError, match="syndromes must be"):
        qm.decode_batch(g, np.zeros((4, 7), dtype=np.uint8))


# ---------------------------------------------------------------------------
# Frame-spec integration (d >= 7 surface codes)
# ---------------------------------------------------------------------------

def test_surface_spec_decoder_selection():
    assert surface_code_frame_spec(3).name == "Surface [[9,1,3]]"
    assert surface_code_frame_spec(7).name == "Surface [[49,1,7]]"
    with pytest.raises(ValueError, match="union_find"):
        surface_code_frame_spec(7, decoder="exact")
    with pytest.raises(ValueError, match="unknown decoder"):
        surface_code_frame_spec(3, decoder="mwpm")


def test_union_find_close_to_exact_at_d3():
    """Same seed, same draws: union-find's logical rate may exceed the
    exact ML tables' but only boundedly (the accuracy-threshold gap)."""
    pts = {}
    for dec in ("exact", "union_find"):
        sim = FrameQECSimulator(surface_code_frame_spec(3, decoder=dec))
        pt = sim.threshold_sweep([0.06], n_trials=4096,
                                 noise_type="depolarizing", seed=5)[0]
        pts[dec] = pt.logical_rate
    assert pts["exact"] > 0.0
    assert pts["union_find"] <= 2.0 * pts["exact"] + 0.01


def test_union_find_distance_scaling_below_threshold():
    """Below the ~10% accuracy threshold, d=7 must beat d=3."""
    rates = {}
    for d in (3, 7):
        sim = FrameQECSimulator(surface_code_frame_spec(d,
                                                        decoder="union_find"))
        pt = sim.threshold_sweep([0.04], n_trials=4096,
                                 noise_type="depolarizing", seed=11)[0]
        rates[d] = pt.logical_rate
    assert rates[7] < rates[3]


def test_union_find_memory_experiment_d7():
    """The pure_callback decode must run inside the jitted scan."""
    sim = FrameQECSimulator(surface_code_frame_spec(7))
    res = sim.memory_experiment(0.01, n_rounds=3, n_trials=512,
                                noise_type="depolarizing",
                                meas_error_prob=0.0, seed=3)
    assert 0.0 <= res["logical_failure_probability"] <= 0.1
    zero = sim.memory_experiment(0.0, n_rounds=3, n_trials=64, seed=4)
    assert zero["logical_failure_probability"] == 0.0

# ---------------------------------------------------------------------------
# Space-time (phenomenological) matching memory
# ---------------------------------------------------------------------------

def test_space_time_graph_structure():
    H = _repetition_checks(5)          # 4 checks, 5 data qubits
    g = qm.space_time_graph(H, n_rounds=3)
    # (R+1) detection layers of 4 checks + boundary
    assert g.n_checks == 16 and g.has_boundary and g.boundary == 16
    # R*dq horizontal + R*nc vertical edges
    assert g.n_qubits == 3 * 5 + 3 * 4
    # horizontal edges live inside one layer (or hit the boundary)
    for r in range(3):
        for q in range(5):
            u, v = g.edges[r * 5 + q]
            assert u // 4 == r
            assert v == g.boundary or v // 4 == r
    # vertical edges connect the same check in consecutive layers
    for r in range(3):
        for c in range(4):
            u, v = g.edges[15 + r * 4 + c]
            assert v - u == 4 and u % 4 == c and u // 4 == r


def test_space_time_correction_reproduces_final_syndrome():
    """The telescoping guarantee: the folded horizontal correction has
    exactly the final syndrome, for random detection batches."""
    H = _surface_z_sector(5)
    decode = qm.space_time_decode_fn(H, n_rounds=4)
    rng = np.random.default_rng(3)
    # build detections from actual error histories so they're matchable
    errs = (rng.random((64, 4, 25)) < 0.04).astype(np.uint8)
    meas = (rng.random((64, 4, 12)) < 0.04).astype(np.uint8)
    X = np.bitwise_xor.accumulate(errs, axis=1)          # cumulative
    syn = (X @ H.T) % 2 ^ meas                           # noisy records
    final = (X[:, -1] @ H.T) % 2
    det = np.concatenate([syn[:, :1],
                          syn[:, 1:] ^ syn[:, :-1],
                          (final ^ syn[:, -1])[:, None]], axis=1)
    corr = decode(det.reshape(64, -1))
    assert (((corr ^ X[:, -1]) @ H.T) % 2 == 0).all()


def test_matching_memory_generator_draw_identical_to_ml():
    """Same (p, q, keys): the matching memory fn's single-shot baseline
    must equal the ML builder's min-weight final baseline PER TRIAL —
    on a repetition chain both decode the exact final syndrome by the
    (unique) min-weight rule, so equality locks the two generators'
    key schedules together."""
    import jax.numpy as jnp
    import jax.random as jr
    from quantum_simulator_tpu.qec_frame import (build_matching_memory_fn,
                                                 build_ml_css_memory_fn)
    H = _repetition_checks(5)
    sup = np.zeros(5, np.uint8)
    sup[0] = 1
    keys = jr.split(jr.PRNGKey(17), 600)
    _, fail_single = build_matching_memory_fn(H, sup, 4)(0.06, 0.06, keys)
    _, fail_minw = build_ml_css_memory_fn(H, sup, 4)(
        jnp.float32(0.06), jnp.float32(0.06), keys)
    assert (np.asarray(fail_single) == np.asarray(fail_minw)).all()


def test_space_time_between_ml_and_single_shot():
    """On identical draws the decoder ordering must hold statistically:
    exact ML <= space-time matching <= single-shot (within noise)."""
    import jax.numpy as jnp
    import jax.random as jr
    from quantum_simulator_tpu.qec_frame import (build_matching_memory_fn,
                                                 build_ml_css_memory_fn)
    H = _repetition_checks(3)
    sup = np.zeros(3, np.uint8)
    sup[0] = 1
    keys = jr.split(jr.PRNGKey(0), 3000)
    f_st, f_1 = build_matching_memory_fn(H, sup, 5)(0.05, 0.05, keys)
    f_ml, _ = build_ml_css_memory_fn(H, sup, 5)(
        jnp.float32(0.05), jnp.float32(0.05), keys)
    p_st, p_1 = f_st.mean(), f_1.mean()
    p_ml = np.asarray(f_ml).mean()
    assert p_ml - 0.01 <= p_st <= 1.5 * p_ml + 0.01
    assert p_st < p_1


def test_space_time_beats_single_shot_under_meas_noise():
    """The point of space-time decoding: at d=9, p=q=0.05 the joint
    decode is several times better than exact-final-syndrome decoding
    (measured ~9x; assert 3x with margin)."""
    import jax.random as jr
    from quantum_simulator_tpu.qec_frame import build_matching_memory_fn
    H = _repetition_checks(9)
    sup = np.zeros(9, np.uint8)
    sup[0] = 1
    fn = build_matching_memory_fn(H, sup, 8)
    f_st, f_1 = fn(0.05, 0.05, jr.split(jr.PRNGKey(1), 3000))
    assert 3.0 * f_st.mean() < f_1.mean()


def test_surface_matching_memory_distance_scaling():
    """Below threshold, surface-code memory improves with distance —
    including d=7 where no other decoder in the framework can run a
    measurement-noise memory experiment at all."""
    r3 = FrameQECSimulator.matching_memory_experiment(
        0.01, 6, n_trials=2000, meas_error_prob=0.01, distance=3, seed=7)
    r5 = FrameQECSimulator.matching_memory_experiment(
        0.01, 6, n_trials=2000, meas_error_prob=0.01, distance=5, seed=7)
    assert r5["matching_failure_probability"] \
        < r3["matching_failure_probability"]
    r7 = FrameQECSimulator.matching_memory_experiment(
        0.01, 3, n_trials=500, meas_error_prob=0.01, distance=7, seed=7)
    assert r7["matching_failure_probability"] <= \
        r5["matching_failure_probability"] + 0.01
    assert set(r7) >= {"matching_failure_probability",
                       "final_syndrome_failure_probability",
                       "per_round_matching_rate", "code"}


def test_meas_noise_only_never_fails():
    """p=0: every detection event is a measurement artifact; vertical
    matching must absorb them all (regression lock, fixed seed)."""
    import jax.random as jr
    from quantum_simulator_tpu.qec_frame import build_matching_memory_fn
    H = _repetition_checks(9)
    sup = np.zeros(9, np.uint8)
    sup[0] = 1
    f_st, _ = build_matching_memory_fn(H, sup, 6)(
        0.0, 0.08, jr.split(jr.PRNGKey(2), 2000))
    assert f_st.sum() == 0


def test_matching_memory_repetition_code_kwarg():
    res = FrameQECSimulator.matching_memory_experiment(
        0.04, 4, n_trials=500, meas_error_prob=0.04,
        distance=5, code="repetition", seed=9)
    assert 0.0 <= res["matching_failure_probability"] <= 0.2
    with pytest.raises(ValueError, match="unknown code"):
        FrameQECSimulator.matching_memory_experiment(
            0.01, 2, n_trials=8, code="steane")


# ---------------------------------------------------------------------------
# Weighted union-find
# ---------------------------------------------------------------------------

def test_weighted_growth_prefers_cheap_path():
    """Two defects joined by a heavy direct edge (w=3) and by two cheap
    boundary edges (w=1 each): weighted growth must fill the cheap path
    first and peel the correction through the boundary, leaving the
    heavy edge unused.  Unweighted, the direct edge wins in one round."""
    edges = np.array([[0, 1], [0, 2], [1, 2]], dtype=np.int32)
    syn = np.array([[1, 1]], dtype=np.uint8)
    flat = qm.MatchingGraph(n_checks=2, n_qubits=3, edges=edges,
                            has_boundary=True)
    corr_flat = qm.decode_batch(flat, syn, force_python=True)
    assert corr_flat.tolist() == [[1, 0, 0]]
    heavy = qm.MatchingGraph(n_checks=2, n_qubits=3, edges=edges,
                             has_boundary=True,
                             weights=np.array([3, 1, 1], dtype=np.int32))
    corr_w = qm.decode_batch(heavy, syn, force_python=True)
    assert corr_w.tolist() == [[0, 1, 1]]


def test_weighted_c_and_python_bit_identical():
    H = _surface_z_sector(5)
    g0 = qm.MatchingGraph.from_checks(H)
    rng = np.random.default_rng(11)
    w = rng.integers(1, 5, size=g0.n_qubits).astype(np.int32)
    g = qm.MatchingGraph(n_checks=g0.n_checks, n_qubits=g0.n_qubits,
                         edges=g0.edges, has_boundary=g0.has_boundary,
                         weights=w)
    syn = ((rng.random((96, 25)) < 0.12).astype(np.uint8) @ H.T) % 2
    c_py = qm.decode_batch(g, syn, force_python=True)
    c_c = qm.decode_batch(g, syn)
    assert (c_py == c_c).all()
    # weighted corrections still reproduce every syndrome
    assert (((c_py @ H.T) % 2) == syn).all()


def test_mesh_sweep_routes_through_split_kernel():
    """A union-find spec's pure_callback decoder would deadlock the CPU
    in-process communicator under a mesh; the sweep surface must route
    mesh runs through the split kernel (device draws -> host decode ->
    numpy algebra) and produce EXACTLY the single-device results (same
    keys, same draws)."""
    import jax
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:4]).reshape(4), ("t",))
    spec = surface_code_frame_spec(7)
    assert spec.host_decode is not None
    a = FrameQECSimulator(spec).threshold_sweep(
        [0.05], n_trials=512, noise_type="depolarizing", seed=3,
        mesh=mesh)[0]
    b = FrameQECSimulator(spec).threshold_sweep(
        [0.05], n_trials=512, noise_type="depolarizing", seed=3)[0]
    assert a.logical_rate == b.logical_rate
    assert a.success_rate == b.success_rate
    # the exact-table spec has no host_decode and keeps the jitted path
    assert surface_code_frame_spec(3).host_decode is None
    import pytest as _pytest
    with _pytest.raises(ValueError, match="cannot\\s+shard|deadlock"):
        FrameQECSimulator(spec).memory_experiment(
            0.01, n_rounds=2, n_trials=8, mesh=mesh)
