import jax
import jax.numpy as jnp
import numpy as np

from perception_tpu.ops.pallas.icp_gn import gn_system_oracle, gn_system_pallas


def case(seed=0, R=2, N=300, M=256):
    rng = np.random.RandomState(seed)
    src = rng.randn(R, N, 3).astype(np.float32) * 0.3
    smask = rng.rand(R, N) > 0.1
    tgt = rng.randn(M, 3).astype(np.float32) * 0.3
    tmask = rng.rand(M) > 0.1
    nrm = rng.randn(M, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return (jnp.asarray(src), jnp.asarray(smask), jnp.asarray(tgt),
            jnp.asarray(nrm), jnp.asarray(tmask))


def test_matches_oracle():
    args = case()
    got = gn_system_pallas(*args, 0.5, 0.02, block=128)
    exp = gn_system_oracle(*args, 0.5, 0.02)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-4, atol=1e-4)


def test_unaligned_sizes():
    args = case(seed=1, R=3, N=217, M=100)
    got = gn_system_pallas(*args, 0.3, 0.05, block=128)
    exp = gn_system_oracle(*args, 0.3, 0.05)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-4, atol=1e-4)


def test_stats_match_oracle():
    args = case(seed=3, R=2, N=200, M=128)
    got_M, got_s = gn_system_pallas(*args, 0.5, 0.02, block=128, return_stats=True)
    exp_M, exp_s = gn_system_oracle(*args, 0.5, 0.02, return_stats=True)
    np.testing.assert_allclose(np.asarray(got_M), np.asarray(exp_M), rtol=1e-4, atol=1e-4)
    # Gate counts exact; gated d2 sums to float tolerance.
    np.testing.assert_allclose(np.asarray(got_s[:, 0]), np.asarray(exp_s[:, 0]))
    np.testing.assert_allclose(np.asarray(got_s[:, 1]), np.asarray(exp_s[:, 1]), rtol=1e-3, atol=1e-5)


def test_gate_excludes_far_points():
    src = jnp.asarray(np.array([[[0.0, 0, 0], [5.0, 5, 5]]], np.float32))
    smask = jnp.ones((1, 2), bool)
    tgt = jnp.asarray(np.array([[0.01, 0, 0]], np.float32))
    nrm = jnp.asarray(np.array([[1.0, 0, 0]], np.float32))
    tmask = jnp.ones(1, bool)
    M = gn_system_pallas(src, smask, tgt, nrm, tmask, 0.1, 0.02, block=128)
    # Only the near point is gated in: sum W = 1.
    assert abs(float(M[0, 7, 7]) - 1.0) < 1e-5


def test_system_drives_gn_to_convergence():
    # Use the fused system inside a GN loop and check it aligns clouds.
    from perception_tpu.geometry import se3

    rng = np.random.RandomState(2)
    tgt = rng.uniform(-0.3, 0.3, (512, 3)).astype(np.float32)
    tgt[:170, 2] = 0.0
    tgt[170:340, 1] = 0.0
    tgt[340:, 0] = 0.0
    nrm = np.zeros_like(tgt)
    nrm[:170] = (0, 0, 1)
    nrm[170:340] = (0, 1, 0)
    nrm[340:] = (1, 0, 0)
    T_true = np.asarray(se3.se3_exp(jnp.asarray([0.03, -0.02, 0.04, 0.05, -0.04, 0.06], jnp.float32)))
    src = tgt @ np.linalg.inv(T_true)[:3, :3].T + np.linalg.inv(T_true)[:3, 3]

    T = jnp.eye(4)
    tgt_j, nrm_j = jnp.asarray(tgt), jnp.asarray(nrm)
    tmask = jnp.ones(512, bool)
    smask = jnp.ones((1, 512), bool)
    for _ in range(10):
        src_t = se3.transform_points(T, jnp.asarray(src))[None]
        M = gn_system_pallas(src_t, smask, tgt_j, nrm_j, tmask, 0.5, 0.05, block=128)[0]
        A = M[:6, :6] + 1e-6 * jnp.eye(6)
        b = -M[:6, 6]
        xi = jnp.linalg.solve(A, b)
        T = se3.se3_exp(xi) @ T
    np.testing.assert_allclose(np.asarray(T), T_true, atol=2e-3)
