"""Per-stage walltime breakdown of the cuboid pipeline on the live chip.

Times each stage as its own jitted function (steady state, median of
repeats) so we know where the frame budget goes before optimizing.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=50):
    """Enqueue ``reps`` calls then block once — pipelined dispatch, so
    the per-call figure is device time, not the ~25 ms tunnel round-trip
    floor that per-call block_until_ready timing measures."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return 1e3 * (time.perf_counter() - t0) / reps


def main():
    from perception_tpu.geometry.camera import PinholeCamera
    from perception_tpu.models.cuboid import (
        CuboidConfig, cuboid_pipeline_from_depth, estimate_cuboid_pose,
        segment_ground_plane, template_features,
    )
    from perception_tpu.ops import points as P
    from perception_tpu.ops.ransac import ransac_plane
    from benchmarks.scene import render_depth_tabletop, benchmark_template

    camera = PinholeCamera.d435_depth()
    config = CuboidConfig()
    template_np = benchmark_template()
    template, tnormals, tmask = template_features(
        template_np, np.ones(len(template_np), bool), config
    )
    depth = jnp.asarray(render_depth_tabletop(camera, seed=0))
    key = jax.random.key(0)

    # Stage 1: stride + backproject + passthrough + first compact.
    import dataclasses
    @jax.jit
    def s1(depth):
        st = config.depth_stride
        cam = camera
        if st > 1:
            o = st // 2
            depth = depth[o::st, o::st]
            cam = dataclasses.replace(camera, fx=camera.fx/st, fy=camera.fy/st,
                                      cx=(camera.cx-o)/st, cy=(camera.cy-o)/st,
                                      width=depth.shape[1], height=depth.shape[0])
        pts, m = cam.backproject_depth(depth)
        m = P.passthrough(pts, m, 2, *config.z_limits)
        m = P.passthrough(pts, m, 0, *config.x_limits)
        return P.compact(pts, m, config.pre_capacity)

    cpts, cm = s1(depth)
    print(f"s1 stride+backproject+compact: {timeit(s1, depth):7.3f} ms")

    # Stage 2: voxel downsample + compact.
    @jax.jit
    def s2(cpts, cm):
        d0, m0 = P.voxel_downsample(cpts, cm, config.voxel_size)
        return P.compact(d0, m0, config.work_capacity)

    dpts, dm = s2(cpts, cm)
    print(f"s2 voxel+compact:                   {timeit(s2, cpts, cm):7.3f} ms")

    # Stage 3: RANSAC plane.
    @jax.jit
    def s3(dpts, dm, key):
        return ransac_plane(dpts, dm, key, threshold=config.ransac_threshold,
                            num_hypotheses=config.ransac_hypotheses)

    fit = s3(dpts, dm, key)
    print(f"s3 ransac:                    {timeit(s3, dpts, dm, key):7.3f} ms")

    # Stage 4a: compact box + dominant-cluster filter.
    from perception_tpu.ops.cluster import euclidean_cluster
    @jax.jit
    def s4a(dpts, dm, inl):
        box_pts, box_m = P.compact(dpts, dm & ~inl, config.box_capacity)
        cl = euclidean_cluster(box_pts, box_m, tolerance=config.cluster_tolerance,
                               min_size=1, max_size=config.box_capacity, max_clusters=8)
        box_m = box_m & (cl.labels == 0)
        return P.apply_mask(box_pts, box_m), box_m

    box_pts, box_m = s4a(dpts, dm, fit.inliers)
    print(f"s4a compact+cluster:                   {timeit(s4a, dpts, dm, fit.inliers):7.3f} ms")

    # Stage 4b: multi-restart ICP.
    @jax.jit
    def s4(box_pts, box_m):
        return estimate_cuboid_pose(box_pts, box_m, template, tmask, config,
                                    template_normals=tnormals)

    _ = s4(box_pts, box_m)
    print(f"s4b icp({config.icp_restarts}x{config.icp_max_iterations}):                        {timeit(s4, box_pts, box_m):7.3f} ms")

    # Whole pipeline for reference.
    fn = jax.jit(lambda d, k: cuboid_pipeline_from_depth(
        d, camera, template, tmask, k, config, template_normals=tnormals))
    _ = fn(depth, key)
    print(f"full pipeline:                         {timeit(fn, depth, key):7.3f} ms")


if __name__ == "__main__":
    main()
