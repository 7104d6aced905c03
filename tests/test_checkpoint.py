import jax
import jax.numpy as jnp
import numpy as np

from perception_tpu.geometry.camera import PinholeCamera
from perception_tpu.models.slam.odometry import OdometryConfig
from perception_tpu.models.slam.system import SlamConfig, slam_init
from perception_tpu.utils.checkpoint import load_npz, load_orbax, save_npz, save_orbax


def small_state():
    cam = PinholeCamera.from_K([60.0, 0, 48, 0, 60.0, 36, 0, 0, 1], width=96, height=72)
    depth = jnp.full((72, 96), 2.0)
    gray = jnp.zeros((72, 96))
    cfg = SlamConfig(
        odometry=OdometryConfig(point_budget=256, keyframe_budget=512),
        max_keyframes=8, max_edges=16, features_per_kf=64,
    )
    return slam_init(cam, depth, gray, cfg)


def assert_state_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_npz_roundtrip(tmp_path):
    state = small_state()
    p = tmp_path / "state.npz"
    save_npz(p, state)
    back = load_npz(p, state)
    assert_state_equal(state, back)
    assert type(back).__name__ == "SlamState"


def test_orbax_roundtrip(tmp_path):
    state = small_state()
    p = tmp_path / "ckpt"
    save_orbax(p, state)
    back = load_orbax(p, state)
    assert_state_equal(state, back)


def test_npz_roundtrip_preserves_dtypes(tmp_path):
    state = small_state()
    p = tmp_path / "s2.npz"
    save_npz(p, state)
    back = load_npz(p, state)
    assert back.keyframes.desc.dtype == jnp.uint32
    assert back.keyframes.count.dtype == jnp.int32
    assert back.keyframes.valid.dtype == jnp.bool_
