"""Headline benchmark: cuboid-ICP pipeline frames/s per chip at 640x480.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value      = frames/s of the full jitted pipeline (backproject ->
             passthrough -> voxel -> RANSAC plane -> multi-restart
             template ICP) on one TPU chip, steady-state.
vs_baseline= value / measured PCL-equivalent CPU frames/s (KD-tree ICP
             harness in benchmarks/cpu_baseline.py — BASELINE.md
             requires the denominator to be measured, not quoted).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from perception_tpu.geometry.camera import PinholeCamera
    from perception_tpu.models.cuboid import CuboidConfig, cuboid_pipeline_from_depth
    from benchmarks.scene import render_depth_tabletop, benchmark_template
    from benchmarks.cpu_baseline import measure_cpu_fps

    from perception_tpu.models.cuboid import template_features

    camera = PinholeCamera.d435_depth()
    template_np = benchmark_template()
    config = CuboidConfig()
    # One-time template preprocessing (downsample to pipeline resolution
    # + normals) — host-side numpy, session-constant; keep it off the
    # device so nothing round-trips the tunnel before the compile.
    template, tnormals, template_mask = template_features(
        template_np, np.ones(len(template_np), bool), config
    )

    frames = [
        render_depth_tabletop(camera, seed=s,
                              cuboid_pose_twist=(0.05, 0.03, 0.80, 0.0, 0.0, 0.3 + 0.05 * s))
        for s in range(8)
    ]

    fn = jax.jit(
        lambda depth, key: cuboid_pipeline_from_depth(
            depth, camera, template, template_mask, key, config,
            template_normals=tnormals,
        )
    )

    # Warmup/compile.
    key = jax.random.key(0)
    res = fn(jnp.asarray(frames[0]), key)
    jax.block_until_ready(res)
    print(f"warmup: accepted={bool(res.accepted)} fitness={float(res.fitness):.6f}",
          file=sys.stderr)

    # Steady-state timing (device-side arrays staged up front — frames
    # AND per-frame keys materialized before the clock starts; the host
    # loop double-buffers naturally because dispatch is async).
    dev_frames = [jnp.asarray(f) for f in frames]
    n_timed = 48
    key_list = [k for k in jax.random.split(key, n_timed)]
    for d in dev_frames + key_list:
        jax.block_until_ready(d)
    t0 = time.perf_counter()
    out = None
    for i in range(n_timed):
        out = fn(dev_frames[i % len(dev_frames)], key_list[i])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    tpu_fps = n_timed / dt
    print(f"tpu: {tpu_fps:.2f} frames/s ({dt/n_timed*1000:.1f} ms/frame)", file=sys.stderr)

    # Frame-batched throughput mode: vmap over blocks of B frames
    # (fps-vs-batch curve; the headline is the best steady-state rate).
    # Batch 8 is the knee: measured 322/303/292 fps at B=8/16/32 on the
    # live chip — beyond 8 the batched sorts/compacts outgrow VMEM and
    # spill, so larger blocks are not swept here.
    from perception_tpu.models.cuboid import cuboid_pipeline_batch

    fps_vs_batch = {1: tpu_fps}
    for B in (2, 4, 8):
        fn_b = jax.jit(
            lambda depths, keys: cuboid_pipeline_batch(
                depths, camera, template, template_mask, keys, config,
                template_normals=tnormals,
            )
        )
        blocks = [
            jnp.stack([dev_frames[(i * B + j) % len(dev_frames)] for j in range(B)])
            for i in range(4)
        ]
        kblocks = [jax.random.split(jax.random.key(100 + i), B) for i in range(4)]
        out_b = fn_b(blocks[0], kblocks[0])
        jax.block_until_ready(out_b)
        n_blocks = max(2, 48 // B)
        for d in blocks + kblocks:
            jax.block_until_ready(d)
        t0 = time.perf_counter()
        for i in range(n_blocks):
            out_b = fn_b(blocks[i % 4], kblocks[i % 4])
        jax.block_until_ready(out_b)
        dt_b = time.perf_counter() - t0
        fps_vs_batch[B] = n_blocks * B / dt_b
        print(f"batch {B}: {fps_vs_batch[B]:.2f} frames/s", file=sys.stderr)

    best_batch = max(fps_vs_batch, key=fps_vs_batch.get)
    tpu_fps = fps_vs_batch[best_batch]

    cpu_fps = measure_cpu_fps(frames, camera, template_np, max_frames=3)
    print(f"cpu baseline: {cpu_fps:.3f} frames/s", file=sys.stderr)

    # SLAM accuracy + throughput (BASELINE.md "ATE within bound"):
    # full system over a 300-frame revisit sweep; see benchmarks/slam_bench.
    extra = {
        "cpu_baseline_note": (
            "measured numpy/scipy cKDTree harness (PCL-equivalent), "
            "not PCL itself — see benchmarks/cpu_baseline.py"
        ),
        "fps_vs_batch": {str(k): round(v, 2) for k, v in fps_vs_batch.items()},
        "headline_batch": best_batch,
    }
    try:
        from benchmarks.slam_bench import run as run_slam_bench

        slam = run_slam_bench(frames=300)
        for k in ("ate_cm", "slam_fps", "loop_closures",
                  "pose_graph_corrections", "keyframes"):
            extra[k] = round(slam[k], 3) if isinstance(slam[k], float) else slam[k]
        extra["slam_frames"] = slam["frames"]
        extra["slam_resolution"] = slam["resolution"]
        print(f"slam: ate={slam['ate_cm']:.2f} cm, {slam['slam_fps']:.1f} fps, "
              f"{slam['loop_closures']} loop closures", file=sys.stderr)
    except Exception as e:  # never lose the headline metric
        extra["slam_error"] = repr(e)
        print(f"slam bench failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "cuboid_icp_frames_per_sec_per_chip_640x480",
        "value": round(tpu_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(tpu_fps / cpu_fps, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
