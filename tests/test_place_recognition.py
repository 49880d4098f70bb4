import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_nmi_tpu.config import SystemConfig, TrackingConfig
from orbslam2_nmi_tpu.geometry import se3
from orbslam2_nmi_tpu.slam.keyframe_database import KeyFrameDatabase
from orbslam2_nmi_tpu.slam.map_store import MapStore
from orbslam2_nmi_tpu.slam.vocabulary import Vocabulary, bow_l1_score
from orbslam2_nmi_tpu.solvers import pnp, sim3 as sim3_solver, pose_graph


def rand_desc(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


@pytest.fixture(scope="module")
def vocab():
    rng = np.random.default_rng(0)
    # clustered descriptors: 32 clusters with small bit flips
    centers = rand_desc(rng, 32)
    descs = []
    for c in centers:
        for _ in range(30):
            d = c.copy()
            for _ in range(4):
                w = rng.integers(0, 8)
                d[w] ^= np.uint32(1) << np.uint32(rng.integers(0, 32))
            descs.append(d)
    return Vocabulary.train(np.stack(descs), k=4, depth=3, seed=1)


def test_vocab_quantize_stability(vocab):
    """Same descriptor (and tiny perturbations of it) map to the same word."""
    rng = np.random.default_rng(2)
    d = rand_desc(rng, 1)[0]
    w0 = vocab.quantize(d[None])[0]
    d2 = d.copy()
    d2[0] ^= np.uint32(1)  # flip one bit
    w1 = vocab.quantize(d2[None])[0]
    assert w0 >= 0
    assert w0 == vocab.quantize(d[None])[0]
    # 1-bit flips usually stay in the same word for a coarse vocab
    assert w1 >= 0


def test_vocab_save_load(vocab, tmp_path):
    p = str(tmp_path / "voc.npz")
    vocab.save(p)
    v2 = Vocabulary.load(p)
    rng = np.random.default_rng(3)
    d = rand_desc(rng, 50)
    np.testing.assert_array_equal(vocab.quantize(d), v2.quantize(d))


def test_vocab_dbow2_text_roundtrip(vocab, tmp_path):
    """DBoW2 text format (the reference's ORBvoc.txt layout) round-trips:
    same quantization and same word weights after export + import."""
    p = str(tmp_path / "voc.txt")
    vocab.save_dbow2_text(p)
    v2 = Vocabulary.load(p)
    assert v2.k == vocab.k and v2.n_words == vocab.n_words
    np.testing.assert_allclose(v2.word_weight, vocab.word_weight, rtol=1e-6)
    rng = np.random.default_rng(7)
    d = rand_desc(rng, 100)
    np.testing.assert_array_equal(vocab.quantize(d), v2.quantize(d))


def test_vocab_dbow2_text_parses_reference_style(tmp_path):
    """A hand-written file in the exact ORBvoc.txt line format parses: k-ary
    tree, float-formatted is_leaf/byte fields (DBoW2 writes them as numbers
    that may carry decimal points), word ids in file order."""
    lines = ["2 1 0 0"]
    # two leaves under the root, 32 bytes each, weights 0.5 / 1.5
    lines.append("0 1 " + " ".join(["255"] * 32) + " 0.5")
    lines.append("0 1 " + " ".join(["0"] * 32) + " 1.5")
    p = str(tmp_path / "small_voc.txt")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    v = Vocabulary.load(p)
    assert v.n_words == 2
    np.testing.assert_allclose(v.word_weight, [0.5, 1.5])
    ones = np.full((1, 8), 0xFFFFFFFF, np.uint32)
    zeros = np.zeros((1, 8), np.uint32)
    assert v.quantize(ones)[0] == 0
    assert v.quantize(zeros)[0] == 1


def test_bow_self_similarity(vocab):
    rng = np.random.default_rng(4)
    d1 = rand_desc(rng, 200)
    d2 = rand_desc(rng, 200)
    v1 = vocab.bow_vector(d1)
    v2 = vocab.bow_vector(d2)
    s_self = float(bow_l1_score(jnp.asarray(v1), jnp.asarray(v1[None]))[0])
    s_cross = float(bow_l1_score(jnp.asarray(v1), jnp.asarray(v2[None]))[0])
    assert abs(s_self - 1.0) < 1e-5
    assert s_cross < s_self


def _make_map_with_kfs(vocab, kf_descs):
    cfg = SystemConfig(tracking=TrackingConfig(max_keyframes=16, max_map_points=512, max_features=64))
    m = MapStore(cfg)
    db = KeyFrameDatabase(vocab, 16)
    n = len(kf_descs[0])
    for i, d in enumerate(kf_descs):
        k = m.add_keyframe(
            np.eye(4, dtype=np.float32), i, float(i),
            np.zeros((n, 2), np.float32), np.zeros(n, np.int32), np.zeros(n, np.float32),
            d, np.ones(n, bool),
        )
        db.add(k, d, np.ones(n, bool))
    return m, db


def test_reloc_candidates_find_similar_keyframe(vocab):
    rng = np.random.default_rng(5)
    base = rand_desc(rng, 64)
    kf_descs = [rand_desc(rng, 64) for _ in range(5)] + [base]
    m, db = _make_map_with_kfs(vocab, kf_descs)
    # query = noisy copy of base
    query = base.copy()
    for i in range(6):
        query[i, 0] ^= np.uint32(3)
    cands = db.detect_relocalization_candidates(m, query, np.ones(64, bool))
    assert 5 in cands, cands


# ---------------------------------------------------------------- PnP


def test_pnp_ransac_with_outliers():
    rng = np.random.default_rng(6)
    K = jnp.asarray(np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32))
    n = 120
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(5, 12, n)], -1
    ).astype(np.float32)
    T_true = np.asarray(se3.se3_exp(jnp.asarray([0.2, -0.1, 0.3, 0.05, -0.03, 0.08], jnp.float32)))
    pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
    uv = pc[:, :2] / pc[:, 2:3] * 400.0 + [320.0, 240.0]
    uv[:30] += rng.uniform(40, 90, (30, 2))  # 25% outliers
    res = pnp.pnp_ransac(
        jax.random.PRNGKey(0), K, jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)),
        jnp.ones(n), jnp.ones(n, bool),
    )
    assert bool(res.ok)
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true) @ np.asarray(res.Tcw))))
    assert np.abs(err).max() < 0.01, err
    assert not np.asarray(res.inliers)[:30].any()


# ---------------------------------------------------------------- Sim3


def test_epnp_minimal_solver_exact():
    """epnp_pose on clean correspondences recovers the exact pose (<0.5 px)."""
    rng = np.random.default_rng(11)
    K = jnp.asarray(np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32))
    R_true = np.asarray(se3.so3_exp(jnp.asarray([0.1, -0.2, 0.15], jnp.float32)))
    t_true = np.array([0.3, -0.2, 0.5], np.float32)
    pw = rng.uniform(-2, 2, (24, 3)).astype(np.float32)
    pw[:, 2] += 6.0
    pc = pw @ R_true.T + t_true
    uv = np.stack(
        [300.0 * pc[:, 0] / pc[:, 2] + 160.0, 300.0 * pc[:, 1] / pc[:, 2] + 120.0], -1
    ).astype(np.float32)
    w = np.zeros(24, np.float32)
    w[[0, 5, 11, 17, 20, 23]] = 1.0  # 6-point sample
    T = np.asarray(pnp.epnp_pose(K, jnp.asarray(pw), jnp.asarray(uv), jnp.asarray(w)))
    err = np.asarray(pnp._reproj_err2(K, jnp.asarray(T), jnp.asarray(pw), jnp.asarray(uv)))
    assert np.sqrt(err.max()) < 0.5, np.sqrt(err.max())


def test_epnp_ransac_with_outliers():
    """EPnP RANSAC (sample size 4, the reference's mRansacMinSet) rejects 35%
    outliers and recovers the pose."""
    rng = np.random.default_rng(12)
    K = jnp.asarray(np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32))
    R_true = np.asarray(se3.so3_exp(jnp.asarray([-0.05, 0.12, 0.04], jnp.float32)))
    t_true = np.array([0.1, 0.25, -0.3], np.float32)
    n = 80
    pw = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    pw[:, 2] += 8.0
    pc = pw @ R_true.T + t_true
    uv = np.stack(
        [300.0 * pc[:, 0] / pc[:, 2] + 160.0, 300.0 * pc[:, 1] / pc[:, 2] + 120.0], -1
    ).astype(np.float32)
    uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)
    n_out = int(0.35 * n)
    uv[:n_out] = rng.uniform(0, 320, (n_out, 2)).astype(np.float32)
    res = pnp.pnp_ransac(
        jax.random.PRNGKey(0), K, jnp.asarray(pw), jnp.asarray(uv),
        jnp.ones(n), jnp.ones(n, bool), solver="epnp",
    )
    assert bool(res.ok)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = R_true
    T_true[:3, 3] = t_true
    d = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true) @ np.asarray(res.Tcw))))
    assert np.linalg.norm(d[:3]) < 0.05 and np.linalg.norm(d[3:]) < 0.01


def test_sim3_ransac_recovers_similarity():
    rng = np.random.default_rng(7)
    K = jnp.asarray(np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32))
    n = 80
    p2 = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(5, 10, n)], -1
    ).astype(np.float32)
    R_true = np.asarray(se3.so3_exp(jnp.asarray([0.05, -0.1, 0.08], jnp.float32)))
    s_true, t_true = 1.4, np.array([0.4, -0.2, 0.6], np.float32)
    p1 = s_true * (p2 @ R_true.T) + t_true
    p1[:15] += rng.uniform(1, 3, (15, 3))  # outliers

    def proj(p):
        return (p[:, :2] / p[:, 2:3] * 400.0 + [320.0, 240.0]).astype(np.float32)

    res = sim3_solver.sim3_ransac(
        jax.random.PRNGKey(1), K,
        jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(proj(p1)), jnp.asarray(proj(p2)),
        jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
    )
    assert bool(res.ok)
    assert abs(float(res.scale) - s_true) < 0.05
    S = np.asarray(res.S12)
    np.testing.assert_allclose(S[:3, :3] / float(res.scale), R_true, atol=5e-3)
    np.testing.assert_allclose(S[:3, 3], t_true, atol=5e-2)


# ---------------------------------------------------------------- pose graph


def test_pose_graph_closes_loop():
    """Chain of keyframes with accumulated drift; a loop edge to the start
    pulls everything back (the OptimizeEssentialGraph effect)."""
    V = 10
    rng = np.random.default_rng(8)
    # ground truth: cameras on a line
    gt = [np.asarray(se3.se3_exp(jnp.asarray([0.5 * i, 0, 0, 0, 0, 0], jnp.float32))) for i in range(V)]
    # drifted estimates: each relative step has a small consistent bias
    est = [gt[0]]
    for i in range(1, V):
        rel = gt[i] @ np.linalg.inv(gt[i - 1])
        bias = np.asarray(se3.se3_exp(jnp.asarray([0.02, 0.01, 0.0, 0.0, 0.004, 0.0], jnp.float32)))
        est.append(bias @ rel @ est[i - 1])
    est = np.stack(est)

    edge_i, edge_j, meas = [], [], []
    for i in range(V - 1):  # odometry edges measured from DRIFTED relative poses
        edge_i.append(i)
        edge_j.append(i + 1)
        meas.append(est[i + 1] @ np.linalg.inv(est[i]))
    # loop edge with the TRUE relative pose (what Sim3 matching found)
    edge_i.append(0)
    edge_j.append(V - 1)
    meas.append(gt[V - 1] @ np.linalg.inv(gt[0]))

    prob = pose_graph.PoseGraphProblem(
        Scw=jnp.asarray(est),
        fixed=jnp.asarray(np.arange(V) == 0),
        valid=jnp.ones(V, bool),
        edge_i=jnp.asarray(edge_i, jnp.int32),
        edge_j=jnp.asarray(edge_j, jnp.int32),
        edge_Sji=jnp.asarray(np.stack(meas).astype(np.float32)),
        edge_valid=jnp.ones(len(meas), bool),
    )
    out = np.asarray(pose_graph.optimize_pose_graph(prob, iters=15))
    # the last KF should now be near ground truth (loop edge satisfied)
    err_before = np.linalg.norm((est[-1] - gt[-1])[:3, 3])
    err_after = np.linalg.norm((out[-1] - gt[-1])[:3, 3])
    # drift redistributes along the chain (odometry and loop edges share equal
    # information, as in the reference's essential graph), so the endpoint
    # error shrinks substantially but not to zero
    assert err_after < 0.35 * err_before, (err_before, err_after)
    # scales should remain ~1
    for v in range(V):
        assert abs(float(se3.sim3_scale(jnp.asarray(out[v]))) - 1.0) < 0.05


def test_dbow2_text_roundtrip_at_scale(tmp_path):
    """load_dbow2_text on a reference-format file with 100k words (k=10,
    depth=5 — the reference's ORBvoc.txt is k=10, depth=6): vectorized parse,
    identical quantization after a save/load roundtrip."""
    voc = Vocabulary.synthetic(k=10, depth=5, seed=1)
    assert voc.n_words == 100_000
    p = str(tmp_path / "voc100k.txt")
    voc.save_dbow2_text(p)
    voc2 = Vocabulary.load(p)
    assert voc2.n_words == voc.n_words
    np.testing.assert_array_equal(voc2.node_desc, voc.node_desc)
    np.testing.assert_array_equal(voc2.children, voc.children)
    np.testing.assert_array_equal(voc2.leaf_id, voc.leaf_id)
    rng = np.random.default_rng(3)
    desc = rng.integers(0, 2**32, (512, 8), dtype=np.uint32)
    np.testing.assert_array_equal(voc.quantize(desc), voc2.quantize(desc))


def test_database_bounded_at_reference_scale():
    """2048 keyframes x 1M-word vocabulary: the inverted-file database stays
    bounded (the round-1 dense [K, V] store would need ~8 GB) and candidate
    queries work end-to-end."""
    from orbslam2_nmi_tpu.config import CameraConfig, SystemConfig, TrackingConfig
    from orbslam2_nmi_tpu.slam.map_store import MapStore

    voc = Vocabulary.synthetic(k=10, depth=6, seed=2)
    assert voc.n_words == 1_000_000
    K = 2048
    db = KeyFrameDatabase(voc, K, max_words=512)
    rng = np.random.default_rng(4)
    # every KF gets 300 random words; KF 7 and KF 2000 share most of theirs
    shared = rng.choice(voc.n_words, 300, replace=False).astype(np.int64)
    for kf in range(K):
        if kf in (7, 2000):
            words = np.sort(shared)
        else:
            words = np.sort(rng.choice(voc.n_words, 300, replace=False)).astype(np.int64)
        weights = np.full(len(words), 1.0 / len(words), np.float32)
        db.add_entry(kf, words, weights)

    footprint = db.kf_words.nbytes + db.kf_weights.nbytes + db.kf_nwords.nbytes
    assert footprint < 64 * 2**20, f"database arrays too large: {footprint/2**20:.0f} MB"

    cfg = SystemConfig(
        camera=CameraConfig(fx=1, fy=1, cx=0, cy=0, width=2, height=2),
        tracking=TrackingConfig(max_keyframes=K, max_map_points=16, max_features=4),
    )
    m = MapStore(cfg)
    m.n_keyframes = K
    m.kf_valid[:K] = True

    w7 = db.kf_words[7, : db.kf_nwords[7]]
    x7 = db.kf_weights[7, : db.kf_nwords[7]]
    cands = db.detect_loop_candidates(m, 7, w7, x7, min_score=0.0)
    assert 2000 in cands
    # an erased keyframe can no longer be returned as a candidate
    db.erase(2000)
    cands = db.detect_loop_candidates(m, 7, w7, x7, min_score=0.0)
    assert 2000 not in cands
