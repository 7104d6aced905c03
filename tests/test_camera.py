import jax
import jax.numpy as jnp
import numpy as np

from perception_tpu.geometry.camera import PinholeCamera, depth_from_u16


def test_project_backproject_roundtrip():
    # The image_geometry invariant: project(ray(uv) * z) == uv
    # (vision_opencv/image_geometry/test/directed.py:15-26).
    cam = PinholeCamera.d435_color()
    uv = jnp.array([[0.0, 0.0], [320.0, 240.0], [639.0, 479.0], [100.5, 380.25]])
    rays = cam.pixel_to_ray(uv)
    pts = rays * 2.5
    uv2 = cam.project(pts)
    np.testing.assert_allclose(uv2, uv, atol=1e-4)


def test_ray_center_pixel_is_axis():
    cam = PinholeCamera.d435_depth()
    ray = cam.pixel_to_ray(jnp.array([cam.cx, cam.cy]))
    np.testing.assert_allclose(ray, jnp.array([0.0, 0.0, 1.0]), atol=1e-6)


def test_rectify_unrectify_roundtrip():
    cam = PinholeCamera.from_K(
        [616.8, 0, 321.8, 0, 616.6, 239.9, 0, 0, 1],
        dist=[-0.1, 0.05, 0.001, -0.002, 0.01],
    )
    uv = jnp.array([[100.0, 100.0], [320.0, 240.0], [500.0, 400.0]])
    raw = cam.unrectify_point(uv)
    back = cam.rectify_point(raw)
    np.testing.assert_allclose(back, uv, atol=1e-2)


def test_zero_distortion_identity():
    cam = PinholeCamera.d435_color()
    uv = jnp.array([[123.0, 45.0]])
    np.testing.assert_allclose(cam.unrectify_point(uv), uv, atol=1e-4)
    np.testing.assert_allclose(cam.rectify_point(uv), uv, atol=1e-4)


def test_backproject_depth_shapes_and_mask():
    cam = PinholeCamera.d435_depth()
    depth = jnp.full((480, 640), 1.5, dtype=jnp.float32)
    depth = depth.at[0, 0].set(0.0)       # invalid: zero
    depth = depth.at[10, 10].set(jnp.nan)  # invalid: nan
    depth = depth.at[20, 20].set(50.0)     # invalid: too far
    pts, mask = cam.backproject_depth(depth)
    assert pts.shape == (480 * 640, 3)
    assert mask.shape == (480 * 640,)
    assert not mask[0]
    assert not mask[10 * 640 + 10]
    assert not mask[20 * 640 + 20]
    assert int(mask.sum()) == 480 * 640 - 3
    # Invalid points parked at origin, no NaNs anywhere.
    assert bool(jnp.isfinite(pts).all())
    np.testing.assert_allclose(pts[10 * 640 + 10], jnp.zeros(3))


def test_backproject_project_inverse():
    cam = PinholeCamera.d435_depth()
    depth = jnp.full((48, 64), 2.0, dtype=jnp.float32)
    pts, mask = cam.backproject_depth(depth)
    uv = cam.project(pts)
    uu = uv[:, 0].reshape(48, 64)
    vv = uv[:, 1].reshape(48, 64)
    np.testing.assert_allclose(uu[0], jnp.arange(64, dtype=jnp.float32), atol=1e-3)
    np.testing.assert_allclose(vv[:, 0], jnp.arange(48, dtype=jnp.float32), atol=1e-3)


def test_camera_is_pytree():
    cam = PinholeCamera.d435_depth()

    @jax.jit
    def f(c, uv):
        return c.project(c.pixel_to_ray(uv) * 3.0)

    uv = jnp.array([[10.0, 20.0]])
    np.testing.assert_allclose(f(cam, uv), uv, atol=1e-4)


def test_depth_from_u16_tum_convention():
    raw = np.array([[5000, 0], [10000, 2500]], dtype=np.uint16)
    d = depth_from_u16(raw)
    assert d[0, 0] == 1.0
    assert np.isnan(d[0, 1])
    assert d[1, 0] == 2.0
    assert d[1, 1] == 0.5
