import numpy as np

from orbslam2_nmi_tpu.config import SystemConfig, TrackingConfig
from orbslam2_nmi_tpu.slam import checkpoint
from orbslam2_nmi_tpu.slam.map_store import MapStore


def small_cfg():
    return SystemConfig(tracking=TrackingConfig(max_keyframes=8, max_map_points=128, max_features=32))


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    m = MapStore(small_cfg())
    n = 32
    for i in range(3):
        m.add_keyframe(
            np.eye(4, dtype=np.float32) + 0.01 * i, i * 5, i * 0.5,
            rng.uniform(0, 100, (n, 2)).astype(np.float32),
            np.zeros(n, np.int32), np.zeros(n, np.float32),
            rng.integers(0, 2**32, (n, 8), dtype=np.uint32), np.ones(n, bool),
            nmi_relocalized=(i == 0),
        )
    p = m.add_map_point(np.array([1.0, 2, 8], np.float32), rng.integers(0, 2**32, 8, dtype=np.uint32), 0, np.zeros(3, np.float32))
    m.add_observation(0, 3, p)
    m.add_observation(1, 4, p)

    path = str(tmp_path / "map.npz")
    checkpoint.save_map(path, m, {"ref_kf": 2, "dist_since_nmi": np.array([1.0, 2, 3])})

    m2 = MapStore(small_cfg())
    hdr = checkpoint.load_map(path, m2)
    assert m2.n_keyframes == 3 and m2.n_points == 1
    np.testing.assert_array_equal(m2.kf_Tcw[:3], m.kf_Tcw[:3])
    np.testing.assert_array_equal(m2.kf_mp_idx[:3], m.kf_mp_idx[:3])
    np.testing.assert_array_equal(m2.covis[:3, :3], m.covis[:3, :3])
    assert m2.kf_nmi_reloc[0] and not m2.kf_nmi_reloc[1]
    assert int(hdr["ref_kf"]) == 2
    np.testing.assert_allclose(hdr["dist_since_nmi"], [1.0, 2, 3])


def test_checkpoint_capacity_mismatch(tmp_path):
    m = MapStore(small_cfg())
    path = str(tmp_path / "map.npz")
    checkpoint.save_map(path, m)
    big = SystemConfig(tracking=TrackingConfig(max_keyframes=16, max_map_points=128, max_features=32))
    m2 = MapStore(big)
    try:
        checkpoint.load_map(path, m2)
        assert False, "should reject capacity mismatch"
    except ValueError:
        pass
