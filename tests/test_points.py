import jax
import jax.numpy as jnp
import numpy as np

from perception_tpu.ops import points as P


def make_cloud(key, n=500, scale=1.0):
    pts = jax.random.normal(key, (n, 3)) * scale
    mask = jnp.ones(n, bool)
    return pts, mask


def test_passthrough_matches_numpy():
    pts, mask = make_cloud(jax.random.key(0))
    m = P.passthrough(pts, mask, 2, 0.0, 0.9)
    expected = (np.asarray(pts)[:, 2] >= 0.0) & (np.asarray(pts)[:, 2] <= 0.9)
    np.testing.assert_array_equal(np.asarray(m), expected)


def test_passthrough_respects_input_mask():
    pts, mask = make_cloud(jax.random.key(1))
    mask = mask.at[:100].set(False)
    m = P.passthrough(pts, mask, 0, -10.0, 10.0)
    assert not bool(m[:100].any())


def test_centroid_masked():
    pts = jnp.array([[1.0, 0, 0], [3.0, 0, 0], [100.0, 100, 100]])
    mask = jnp.array([True, True, False])
    np.testing.assert_allclose(P.centroid(pts, mask), [2.0, 0, 0], atol=1e-6)


def test_centroid_empty_is_zero():
    pts = jnp.ones((5, 3))
    mask = jnp.zeros(5, bool)
    np.testing.assert_allclose(P.centroid(pts, mask), jnp.zeros(3))


def test_voxel_downsample_merges_points():
    # Two tight clumps far apart -> exactly 2 output voxels at clump means.
    # Clumps centered inside cells (0.02 offset) so they don't straddle
    # a voxel boundary (grid origin -5, leaf 0.05 puts boundaries at 0.05k).
    rng = np.random.RandomState(0)
    a = rng.randn(50, 3) * 0.001 + 0.02
    b = rng.randn(50, 3) * 0.001 + 3.02
    pts = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    mask = jnp.ones(100, bool)
    out, out_mask = P.voxel_downsample(pts, mask, 0.05)
    assert int(out_mask.sum()) == 2
    got = np.sort(np.asarray(out)[np.asarray(out_mask)], axis=0)
    expected = np.sort(np.stack([a.mean(0), b.mean(0)]), axis=0)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_voxel_downsample_keeps_spread_cloud():
    # Points farther apart than the leaf never merge.
    pts = jnp.asarray(np.mgrid[0:5, 0:5, 0:5].reshape(3, -1).T * 0.1, jnp.float32)
    mask = jnp.ones(len(pts), bool)
    out, out_mask = P.voxel_downsample(pts, mask, 0.05)
    assert int(out_mask.sum()) == len(pts)


def test_voxel_downsample_ignores_invalid():
    pts = jnp.zeros((10, 3))
    mask = jnp.zeros(10, bool).at[0].set(True)
    out, out_mask = P.voxel_downsample(pts, mask, 0.1)
    assert int(out_mask.sum()) == 1


def test_compact_moves_valid_first():
    pts = jnp.arange(30, dtype=jnp.float32).reshape(10, 3)
    mask = jnp.array([False, True, False, True, True, False, False, False, True, False])
    out, out_mask = P.compact(pts, mask, 6)
    assert int(out_mask.sum()) == 4
    np.testing.assert_allclose(np.asarray(out[:4]), np.asarray(pts)[[1, 3, 4, 8]])


def test_bounds():
    pts = jnp.array([[0.0, 0, 0], [1, 2, 3], [-1, 5, -2], [999, 999, 999]])
    mask = jnp.array([True, True, True, False])
    lo, hi = P.bounds(pts, mask)
    np.testing.assert_allclose(lo, [-1, 0, -2])
    np.testing.assert_allclose(hi, [1, 5, 3])


def test_jit_voxel_downsample():
    f = jax.jit(lambda p, m: P.voxel_downsample(p, m, 0.05))
    pts, mask = make_cloud(jax.random.key(2), 256)
    out, om = f(pts, mask)
    out2, om2 = P.voxel_downsample(pts, mask, 0.05)
    np.testing.assert_allclose(out, out2)
