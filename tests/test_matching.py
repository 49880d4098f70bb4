import jax.numpy as jnp
import numpy as np

from orbslam2_nmi_tpu.ops import matching


def rand_desc(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def test_hamming_matrix_matches_naive():
    rng = np.random.default_rng(0)
    a, b = rand_desc(rng, 12), rand_desc(rng, 17)
    d = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    for i in range(12):
        for j in range(0, 17, 5):
            naive = sum(bin(int(a[i, w]) ^ int(b[j, w])).count("1") for w in range(8))
            assert d[i, j] == naive


def test_hamming_zero_for_identical():
    rng = np.random.default_rng(1)
    a = rand_desc(rng, 5)
    d = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(a)))
    assert (np.diag(d) == 0).all()


def test_match_descriptors_finds_permutation():
    rng = np.random.default_rng(2)
    b = rand_desc(rng, 64)
    perm = rng.permutation(64)
    a = b[perm].copy()
    # flip a couple of bits in a few descriptors (still well under TH_LOW)
    a[0, 0] ^= 0b111
    idx, dist = matching.match_descriptors(
        jnp.asarray(a), jnp.ones(64, bool), jnp.asarray(b), jnp.ones(64, bool),
        apply_ratio=True,
    )
    idx = np.asarray(idx)
    ok = idx >= 0
    assert ok.sum() > 55  # random 256-bit codes are far apart; ratio passes
    assert (idx[ok] == perm[ok]).all()
    assert np.asarray(dist)[0] == 3


def test_match_respects_spatial_mask():
    rng = np.random.default_rng(3)
    b = rand_desc(rng, 8)
    a = b.copy()
    mask = jnp.zeros((8, 8), dtype=bool)  # forbid everything
    idx, _ = matching.match_descriptors(
        jnp.asarray(a), jnp.ones(8, bool), jnp.asarray(b), jnp.ones(8, bool),
        spatial_mask=mask,
    )
    assert (np.asarray(idx) == -1).all()


def test_match_one_to_one():
    rng = np.random.default_rng(4)
    b = rand_desc(rng, 4)
    a = np.vstack([b[0], b[0], b[1], b[2]])  # two queries collide on b[0]
    idx, _ = matching.match_descriptors(
        jnp.asarray(a), jnp.ones(4, bool), jnp.asarray(b), jnp.ones(4, bool),
        apply_ratio=False,
    )
    idx = np.asarray(idx)
    matched = idx[idx >= 0]
    assert len(np.unique(matched)) == len(matched), "duplicate B assignment"


def test_window_mask():
    xa = jnp.asarray([[0.0, 0.0], [10.0, 10.0]])
    xb = jnp.asarray([[1.0, 1.0], [50.0, 50.0]])
    m = np.asarray(matching.window_mask(xa, xb, 5.0))
    assert m[0, 0] and not m[0, 1] and not m[1, 0] and not m[1, 1]


def test_rotation_consistency_rejects_outlier_rotation():
    n = 60
    rng = np.random.default_rng(5)
    angle_b = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    angle_a = angle_b + 0.5  # consistent global rotation
    angle_a[0] = angle_b[0] + 2.5  # inconsistent match
    idx = jnp.arange(n)
    valid = jnp.ones(n, bool)
    keep = np.asarray(
        matching.rotation_consistency_mask(
            jnp.asarray(angle_a), jnp.asarray(angle_b), idx, valid
        )
    )
    assert not keep[0]
    assert keep[1:].sum() >= n - 5
