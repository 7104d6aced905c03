import jax
import jax.numpy as jnp
import numpy as np

from perception_tpu.geometry import se3
from perception_tpu.geometry.camera import PinholeCamera
from perception_tpu.models.slam.odometry import OdometryConfig
from perception_tpu.models.slam.system import SlamConfig, run_slam, slam_init, slam_step


def cam():
    return PinholeCamera.from_K([60.0, 0, 48, 0, 60.0, 36, 0, 0, 1], width=96, height=72)


def render_textured_room(camera, T_wc, noise=0.0005, seed=0):
    """(gray, depth) of a room whose planes carry a deterministic
    square-pattern texture (world-anchored, so views are consistent)."""
    H, W = camera.height, camera.width
    fx, fy = float(camera.fx), float(camera.fy)
    cx, cy = float(camera.cx), float(camera.cy)
    vv, uu = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    rays_c = np.stack([(uu - cx) / fx, (vv - cy) / fy, np.ones_like(uu, float)], -1)
    T = np.asarray(T_wc, np.float64)
    o = T[:3, 3]
    d = rays_c @ T[:3, :3].T

    depth = np.full((H, W), np.inf)
    world = np.zeros((H, W, 3))
    planes = [((0, 1.0, 0), 0.9), ((0, -1.0, 0), 0.9), ((0, 0, 1.0), 3.0), ((1.0, 0, 0), 1.3), ((-1.0, 0, 0), 1.3)]
    for n, c in planes:
        n = np.asarray(n)
        denom = d @ n
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (c - o @ n) / denom
        t = np.where((t > 0.1) & (denom != 0), t, np.inf)
        z = t * rays_c[..., 2]
        closer = z < depth
        depth = np.where(closer, z, depth)
        pw = o + t[..., None] * d
        world = np.where(closer[..., None], pw, world)

    # World-anchored texture: intensity from a hash of 12 cm cells.
    cells = np.floor(world / 0.12).astype(np.int64)
    h = (cells[..., 0] * 73856093) ^ (cells[..., 1] * 19349663) ^ (cells[..., 2] * 83492791)
    gray = 60.0 + (np.abs(h) % 97) * 1.8

    depth[~np.isfinite(depth)] = 0.0
    rng = np.random.RandomState(seed)
    return gray.astype(np.float32), (depth + rng.randn(H, W) * noise).astype(np.float32)


def out_and_back_trajectory(n=14, radius=0.35):
    """Forward along +x then back — revisits the start (loop closure)."""
    Ts = []
    for k in range(n):
        frac = k / (n - 1)
        x = radius * np.sin(np.pi * frac * 2) if False else None
        # simple out-and-back on x with slight yaw
        half = (n - 1) / 2
        dist = (k if k <= half else (n - 1 - k)) * (radius / half)
        tw = jnp.asarray([dist, 0.0, 0.0, 0.0, 0.02 * np.sin(np.pi * frac), 0.0], jnp.float32)
        Ts.append(np.asarray(se3.se3_exp(tw)))
    return Ts


def make_seq(camera, gt):
    grays, depths = [], []
    for i, T in enumerate(gt):
        g, d = render_textured_room(camera, T, seed=i)
        grays.append(g)
        depths.append(d)
    return grays, depths


def slam_cfg():
    return SlamConfig(
        odometry=OdometryConfig(
            point_budget=1024, keyframe_budget=2048, icp_iterations=8,
            min_depth=0.1, max_depth=6.0, normal_max_edge=0.5,
            kf_translation=0.08, kf_rotation=0.1,
        ),
        max_keyframes=16,
        max_edges=40,
        features_per_kf=128,
        fast_threshold=15.0,
        lc_min_gap=2,
        lc_min_matches=15,
        lc_min_inliers=8,
    )


def test_slam_tracks_and_promotes():
    camera = cam()
    gt = out_and_back_trajectory()
    grays, depths = make_seq(camera, gt)
    state, poses, diags = run_slam(camera, depths, grays, slam_cfg())
    assert int(state.keyframes.count) >= 3
    # Trajectory error stays bounded.
    errs = [np.linalg.norm(np.asarray(p)[:3, 3] - g[:3, 3]) for p, g in zip(poses, gt)]
    assert max(errs) < 0.12, errs
    # Odometry edges exist between successive keyframes.
    assert int(state.edges.count) >= int(state.keyframes.count) - 1


def test_slam_init_state_shapes():
    camera = cam()
    g, d = render_textured_room(camera, np.eye(4))
    st = slam_init(camera, jnp.asarray(d), jnp.asarray(g), slam_cfg())
    assert st.keyframes.poses.shape == (16, 4, 4)
    assert bool(st.keyframes.valid[0]) and int(st.keyframes.count) == 1
    assert int(st.edges.count) == 0


def test_slam_step_jits_once():
    camera = cam()
    cfg = slam_cfg()
    gt = out_and_back_trajectory(6)
    grays, depths = make_seq(camera, gt)
    st = slam_init(camera, jnp.asarray(depths[0]), jnp.asarray(grays[0]), cfg)
    key = jax.random.key(0)
    st, diag = slam_step(st, jnp.asarray(depths[1]), jnp.asarray(grays[1]), camera, key, cfg)
    st, diag = slam_step(st, jnp.asarray(depths[2]), jnp.asarray(grays[2]), camera, key, cfg)
    assert np.isfinite(float(diag.overlap))
