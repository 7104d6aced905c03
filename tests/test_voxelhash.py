import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perception_tpu.ops import nn as brute
from perception_tpu.ops.voxelhash import build, nearest_neighbor_voxelhash, query


def test_matches_brute_force_within_radius():
    rng = np.random.RandomState(0)
    ref = rng.uniform(-1, 1, (5000, 3)).astype(np.float32)
    q = (ref[:300] + rng.randn(300, 3) * 0.01).astype(np.float32)
    mask = np.ones(5000, bool)
    radius = 0.05
    nbr, d2, found = nearest_neighbor_voxelhash(
        jnp.asarray(q), jnp.asarray(ref), jnp.asarray(mask), radius, window=16
    )
    bidx, bd2 = brute.nearest_neighbor(jnp.asarray(q), jnp.asarray(ref), jnp.asarray(mask))
    bd2 = np.asarray(bd2)
    within = bd2 <= radius * radius
    assert found.sum() >= within.sum() * 0.98  # dense cells may truncate
    got = np.asarray(d2)[np.asarray(found) & within]
    exp = bd2[np.asarray(found) & within]
    # atol 1e-6: the brute-force |q|^2 - 2qr + |r|^2 expansion loses a
    # few ULPs vs the hash path's direct (p - q)^2.
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-6)


def test_miss_beyond_radius():
    ref = jnp.asarray(np.array([[0.0, 0, 0]], np.float32))
    q = jnp.asarray(np.array([[1.0, 1.0, 1.0]], np.float32))
    _, d2, found = nearest_neighbor_voxelhash(q, ref, jnp.ones(1, bool), radius=0.1)
    assert not bool(found[0])


def test_respects_ref_mask():
    ref = jnp.asarray(np.array([[0.0, 0, 0], [0.01, 0, 0]], np.float32))
    mask = jnp.asarray(np.array([False, True]))
    q = jnp.asarray(np.array([[0.0, 0, 0]], np.float32))
    nbr, d2, found = nearest_neighbor_voxelhash(q, ref, mask, radius=0.05)
    assert bool(found[0])
    np.testing.assert_allclose(np.asarray(nbr[0]), [0.01, 0, 0], atol=1e-6)


def test_query_tiling_unaligned():
    rng = np.random.RandomState(1)
    ref = rng.uniform(-1, 1, (777, 3)).astype(np.float32)
    q = ref[:123] + 0.001
    vh = build(jnp.asarray(ref), jnp.ones(777, bool), cell_size=0.05)
    idx, d2 = query(vh, jnp.asarray(q), window=8, tile=64)
    assert idx.shape == (123,)
    assert (np.asarray(d2) < 0.05**2).mean() > 0.95


def test_large_cloud_smoke():
    rng = np.random.RandomState(2)
    ref = rng.uniform(-2, 2, (100_000, 3)).astype(np.float32)
    q = (ref[::50] + rng.randn(2000, 3) * 0.005).astype(np.float32)
    nbr, d2, found = nearest_neighbor_voxelhash(
        jnp.asarray(q), jnp.asarray(ref), jnp.ones(100_000, bool), radius=0.05, window=8
    )
    assert float(np.asarray(found).mean()) > 0.95
