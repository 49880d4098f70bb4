import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_nmi_tpu.config import ORBConfig
from orbslam2_nmi_tpu.ops import fast as fast_ops
from orbslam2_nmi_tpu.ops import orb, pyramid


def checkerboard(h=120, w=160, sq=20):
    ys, xs = np.mgrid[0:h, 0:w]
    return (((ys // sq) + (xs // sq)) % 2 * 255).astype(np.uint8)


def textured(h=120, w=160, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h // 4, w // 4))
    img = np.kron(img, np.ones((4, 4)))  # blocky texture => corners
    return img.astype(np.uint8)


# ---------------------------------------------------------------- FAST


def test_fast_detects_square_corner():
    img = np.zeros((64, 64), np.float32)
    img[20:44, 20:44] = 255.0
    corner, score = fast_ops.fast_response(jnp.asarray(img), 20.0)
    corner = np.asarray(corner)
    # corners of the square fire, flat regions don't
    assert corner[18:23, 18:23].any() or corner[20:25, 20:25].any()
    assert not corner[5:15, 5:15].any()
    # straight edge midpoints are not FAST-9 corners
    assert not corner[32, 18:23].any()


def test_fast_flat_image_no_corners():
    img = jnp.full((64, 64), 100.0)
    corner, _ = fast_ops.fast_response(img, 7.0)
    assert not np.asarray(corner).any()


def test_fast_naive_parity():
    """Dense bit-trick FAST == naive contiguous-arc check on random images."""
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (40, 40)).astype(np.float32)
    t = 20.0
    corner, _ = fast_ops.fast_response(jnp.asarray(img), t)
    corner = np.asarray(corner)
    offs = fast_ops.CIRCLE_OFFSETS
    for y in range(3, 37):
        for x in range(3, 37):
            circ = np.array([img[y + dr, x + dc] for dr, dc in offs])
            bright = circ > img[y, x] + t
            dark = circ < img[y, x] - t

            def arc(m):
                mm = np.concatenate([m, m])
                run = 0
                best = 0
                for v in mm:
                    run = run + 1 if v else 0
                    best = max(best, run)
                return best >= 9

            assert corner[y, x] == (arc(bright) or arc(dark)), (y, x)


def test_nms_keeps_single_peak():
    score = np.zeros((16, 16), np.float32)
    score[8, 8] = 5.0
    score[8, 9] = 3.0
    keep = np.asarray(fast_ops.nms3x3(jnp.asarray(score)))
    assert keep[8, 8] and not keep[8, 9]


def test_fallback_uses_min_threshold_in_weak_cells():
    img = np.zeros((90, 90), np.float32)
    img[20:40, 20:40] = 255.0  # strong square in one cell area
    img[60:75, 60:75] = 12.0  # weak square: passes th=7, fails th=20
    keep, score = fast_ops.detect_with_fallback(jnp.asarray(img), 20.0, 7.0, cell=30, border=4)
    keep = np.asarray(keep)
    assert keep[55:80, 55:80].any(), "weak cell should fall back to min threshold"


# ---------------------------------------------------------------- pyramid


def test_pyramid_sizes():
    img = jnp.zeros((540, 960))
    levels = pyramid.build_pyramid(img, 8, 1.2)
    assert len(levels) == 8
    assert levels[0].shape == (540, 960)
    assert levels[1].shape == (450, 800)
    assert levels[7].shape[0] == int(round(540 / 1.2**7))


def test_resize_preserves_constant():
    img = jnp.full((64, 64), 77.0)
    out = pyramid.resize_bilinear(img, 53, 53)
    np.testing.assert_allclose(np.asarray(out), 77.0, atol=1e-3)


def test_gaussian_blur_preserves_mean():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
    out = pyramid.gaussian_blur(img, 7, 2.0)
    assert abs(float(out.mean()) - float(img.mean())) < 2.0
    assert float(out.std()) < float(img.std())


# ---------------------------------------------------------------- orientation


def test_orientation_matches_naive():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (64, 64)).astype(np.float32)
    m10, m01 = orb.orientation_maps(jnp.asarray(img))
    umax = orb.circle_umax()
    y, x = 32, 30
    n10 = n01 = 0.0
    for dy in range(-15, 16):
        for dx in range(-15, 16):
            if abs(dx) <= umax[abs(dy)]:
                n10 += dx * img[y + dy, x + dx]
                n01 += dy * img[y + dy, x + dx]
    assert abs(float(m10[y, x]) - n10) / max(abs(n10), 1) < 1e-4
    assert abs(float(m01[y, x]) - n01) / max(abs(n01), 1) < 1e-4


def test_orientation_rotation_consistency():
    """Rotating the patch rotates the measured angle accordingly."""
    img = np.zeros((64, 64), np.float32)
    img[28:37, 32:48] = 200.0  # bright bar to the +x side of (32, 32)
    m10, m01 = orb.orientation_maps(jnp.asarray(img))
    ang = float(jnp.arctan2(m01[32, 32], m10[32, 32]))
    assert abs(ang) < 0.3  # centroid to the right -> angle ~ 0
    img_rot = img.T.copy()  # bar now below -> angle ~ +pi/2 (y down)
    m10r, m01r = orb.orientation_maps(jnp.asarray(img_rot))
    ang_r = float(jnp.arctan2(m01r[32, 32], m10r[32, 32]))
    assert abs(ang_r - np.pi / 2) < 0.3


# ---------------------------------------------------------------- descriptors


def naive_descriptor(img, x, y, angle, pattern):
    a, b = np.cos(angle), np.sin(angle)
    h, w = img.shape
    bits = []
    for px1, py1, px2, py2 in pattern:
        r1 = int(np.round(px1 * b + py1 * a)) + y
        c1 = int(np.round(px1 * a - py1 * b)) + x
        r2 = int(np.round(px2 * b + py2 * a)) + y
        c2 = int(np.round(px2 * a - py2 * b)) + x
        t0 = img[np.clip(r1, 0, h - 1), np.clip(c1, 0, w - 1)]
        t1 = img[np.clip(r2, 0, h - 1), np.clip(c2, 0, w - 1)]
        bits.append(1 if t0 < t1 else 0)
    words = np.zeros(8, np.uint32)
    for i, bit in enumerate(bits):
        words[i // 32] |= np.uint32(bit) << np.uint32(i % 32)
    return words


def test_descriptor_matches_naive():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (80, 80)).astype(np.float32)
    pattern = orb.load_pattern()
    xs = jnp.asarray([40, 30])
    ys = jnp.asarray([40, 35])
    angles = jnp.asarray([0.3, -1.2])
    desc = np.asarray(orb.compute_descriptors(jnp.asarray(img), xs, ys, angles))
    for i, (x, y, ang) in enumerate([(40, 40, 0.3), (30, 35, -1.2)]):
        expected = naive_descriptor(img, x, y, ang, pattern)
        assert (desc[i] == expected).all(), f"keypoint {i}"


def test_descriptor_rotation_invariance_tendency():
    """Descriptor computed with the patch's own orientation should be more
    stable under image rotation than with angle=0 (sanity of steering)."""
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, (33, 33)).astype(np.float32)
    big = np.tile(img, (3, 3))
    d0 = np.asarray(
        orb.compute_descriptors(jnp.asarray(big), jnp.asarray([49]), jnp.asarray([49]), jnp.asarray([0.0]))
    )
    d1 = np.asarray(
        orb.compute_descriptors(jnp.asarray(big), jnp.asarray([49]), jnp.asarray([49]), jnp.asarray([0.4]))
    )
    ham = bin(int(np.bitwise_xor(d0, d1).astype(np.uint64).sum())).count("1")
    assert ham > 0  # different steering -> different descriptor


# ---------------------------------------------------------------- end-to-end


@pytest.mark.parametrize("n_features", [200])
def test_extract_orb_end_to_end(n_features):
    cfg = ORBConfig(n_features=n_features, n_levels=4)
    img = jnp.asarray(textured(160, 200))
    feats = orb.extract_orb(img, cfg)
    assert feats.n == n_features
    v = np.asarray(feats.valid)
    assert v.sum() > 50, "textured image should yield many corners"
    xy = np.asarray(feats.xy)[v]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 200).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 160).all()
    # all levels represented
    assert len(np.unique(np.asarray(feats.octave))) == 4
    # descriptors vary
    d = np.asarray(feats.desc)[v]
    assert len(np.unique(d, axis=0)) > len(d) // 2


def test_extract_orb_spatial_spread():
    cfg = ORBConfig(n_features=150, n_levels=2)
    img = jnp.asarray(textured(160, 200, seed=5))
    feats = orb.extract_orb(img, cfg)
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[v]
    # keypoints should cover all four image quadrants
    for qx in (0, 1):
        for qy in (0, 1):
            inq = (
                (xy[:, 0] >= qx * 100)
                & (xy[:, 0] < (qx + 1) * 100)
                & (xy[:, 1] >= qy * 80)
                & (xy[:, 1] < (qy + 1) * 80)
            )
            assert inq.sum() > 3, f"quadrant {qx},{qy} empty"
