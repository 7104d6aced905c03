import jax
import jax.numpy as jnp
import numpy as np

from perception_tpu.ops.pallas.ransac_score import ransac_score_pallas
from perception_tpu.ops import ransac as R


def oracle_score(points, mask, normals, d, tau):
    dist = np.abs(points @ normals.T + d[None, :])
    inl = (dist <= tau) & mask[:, None]
    return inl.sum(0).astype(np.float32)


def random_case(seed, n, k):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32)
    mask = rng.rand(n) > 0.2
    normals = rng.randn(k, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    d = rng.randn(k).astype(np.float32) * 0.5
    return pts, mask, normals, d


def test_matches_oracle_small():
    pts, mask, normals, d = random_case(0, 1000, 64)
    got = ransac_score_pallas(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(normals), jnp.asarray(d), 0.1,
        tile_n=256, tile_k=64,
    )
    expected = oracle_score(pts, mask, normals, d, 0.1)
    np.testing.assert_allclose(np.asarray(got), expected)


def test_matches_oracle_unaligned_sizes():
    # N and K not multiples of the tiles: padding must not leak.
    pts, mask, normals, d = random_case(1, 777, 100)
    got = ransac_score_pallas(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(normals), jnp.asarray(d), 0.05,
        tile_n=256, tile_k=64,
    )
    expected = oracle_score(pts, mask, normals, d, 0.05)
    np.testing.assert_allclose(np.asarray(got), expected)


def test_matches_jnp_score_in_ransac_module():
    pts, mask, normals, d = random_case(2, 2000, 128)
    jnp_scores = R._score(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(normals), jnp.asarray(d), 0.08
    )
    pallas_scores = ransac_score_pallas(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(normals), jnp.asarray(d), 0.08,
        tile_n=512, tile_k=128,
    )
    np.testing.assert_allclose(np.asarray(pallas_scores), np.asarray(jnp_scores).astype(np.float32))


def test_all_masked_scores_zero():
    pts, _, normals, d = random_case(3, 500, 32)
    got = ransac_score_pallas(
        jnp.asarray(pts), jnp.zeros(500, bool), jnp.asarray(normals), jnp.asarray(d), 0.1,
        tile_n=256, tile_k=32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.zeros(32, np.float32))
