"""Full keyframe SLAM system: dense odometry + sparse loop closure +
pose-graph correction (BASELINE.json config #4).

Architecture (all state on-device, fixed capacities, one jitted step):

  depth, gray ──► odometry_step (dense point-to-plane GN vs current
                  keyframe — models/slam/odometry.py)
        │ promoted?
        ▼
  KeyframeStore: poses, subsampled clouds+normals (for ICP), FAST/BRIEF
  keypoints with 3-D backprojections (for loop closure), ring-buffer
  slots masked by validity
        │ on promotion
        ▼
  loop-closure probe: match the new keyframe's descriptors against all
  stored keyframes (batched Hamming), pick the best non-adjacent
  candidate, verify with RANSAC rigid 3D-3D; a verified closure appends
  a pose-graph edge
        │
        ▼
  pose-graph GN over keyframe poses (models/slam/backend.py) — invoked
  by the host when a closure arrives (the expensive, rare path).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from perception_tpu.geometry import se3
from perception_tpu.geometry.camera import PinholeCamera
from perception_tpu.models.slam.backend import PoseGraph, optimize_pose_graph
from perception_tpu.models.slam.odometry import (
    OdometryConfig,
    OdometryState,
    init_state as odom_init,
    odometry_step,
)
from perception_tpu.ops.features import (
    brief_describe,
    fast_detect,
    match_descriptors,
)
from perception_tpu.ops.registration import ransac_rigid


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    odometry: OdometryConfig = OdometryConfig()
    max_keyframes: int = 64
    max_edges: int = 160
    features_per_kf: int = 256
    fast_threshold: float = 25.0
    # Loop closure gates
    lc_min_gap: int = 3              # skip adjacent keyframes
    lc_min_matches: int = 25
    lc_ransac_threshold: float = 0.05
    lc_min_inliers: int = 12
    # Pose-graph correction fused into slam_step under lax.cond: the
    # graph GN runs on-device only on closure frames, and the host loop
    # never has to sync on loop_found (each host round-trip through the
    # remote-chip tunnel costs more than the whole step).
    correct_in_step: bool = True
    pg_iterations: int = 10


class KeyframeStore(NamedTuple):
    poses: jax.Array       # (K, 4, 4) world <- kf camera
    desc: jax.Array        # (K, F, 8) uint32 BRIEF
    kp_xyz: jax.Array      # (K, F, 3) keypoint 3-D points, kf camera frame
    kp_mask: jax.Array     # (K, F)
    valid: jax.Array       # (K,)
    stamp: jax.Array       # (K,) int32 insertion sequence number (-1 = never)
    count: jax.Array       # () int32 total insertions (ring write head = count % K)


class EdgeList(NamedTuple):
    i: jax.Array          # (E,)
    j: jax.Array          # (E,)
    T: jax.Array          # (E, 4, 4)
    weight: jax.Array     # (E,)
    mask: jax.Array       # (E,)
    count: jax.Array      # ()


class SlamState(NamedTuple):
    odom: OdometryState
    keyframes: KeyframeStore
    edges: EdgeList
    current_kf: jax.Array     # () int32 index of the active keyframe
    loop_found: jax.Array     # () bool — a closure was added this step


class SlamDiag(NamedTuple):
    promoted: jax.Array
    loop_candidate: jax.Array  # () int32 candidate kf (-1 none)
    loop_matches: jax.Array
    loop_inliers: jax.Array
    overlap: jax.Array


def _kf_features(camera: PinholeCamera, depth, gray, cfg: SlamConfig):
    """Sparse features of a frame for the loop-closure store."""
    kps = fast_detect(
        gray, threshold=cfg.fast_threshold, max_keypoints=cfg.features_per_kf
    )
    desc = brief_describe(gray, kps)
    # Backproject keypoints with the depth image.
    u = jnp.clip(kps.uv[:, 0].astype(jnp.int32), 0, camera.width - 1)
    v = jnp.clip(kps.uv[:, 1].astype(jnp.int32), 0, camera.height - 1)
    z = depth[v, u]
    ok = kps.mask & jnp.isfinite(z) & (z > 0.1)
    z = jnp.where(ok, z, 0.0)
    x = (u.astype(jnp.float32) - camera.cx) / camera.fx * z
    y = (v.astype(jnp.float32) - camera.cy) / camera.fy * z
    return desc, jnp.stack([x, y, z], axis=-1), ok


def slam_init(
    camera: PinholeCamera, depth0, gray0, cfg: SlamConfig = SlamConfig()
) -> SlamState:
    odom = odom_init(camera, depth0, cfg.odometry)
    K, F, E = cfg.max_keyframes, cfg.features_per_kf, cfg.max_edges
    desc0, xyz0, m0 = _kf_features(camera, depth0, gray0, cfg)

    kf = KeyframeStore(
        poses=jnp.broadcast_to(jnp.eye(4), (K, 4, 4)).at[0].set(jnp.eye(4)),
        desc=jnp.zeros((K, F, 8), jnp.uint32).at[0].set(desc0),
        kp_xyz=jnp.zeros((K, F, 3)).at[0].set(xyz0),
        kp_mask=jnp.zeros((K, F), bool).at[0].set(m0),
        valid=jnp.zeros(K, bool).at[0].set(True),
        stamp=jnp.full(K, -1, jnp.int32).at[0].set(0),
        count=jnp.int32(1),
    )
    edges = EdgeList(
        i=jnp.zeros(E, jnp.int32),
        j=jnp.zeros(E, jnp.int32),
        T=jnp.broadcast_to(jnp.eye(4), (E, 4, 4)),
        weight=jnp.zeros(E),
        mask=jnp.zeros(E, bool),
        count=jnp.int32(0),
    )
    return SlamState(
        odom=odom, keyframes=kf, edges=edges,
        current_kf=jnp.int32(0), loop_found=jnp.bool_(False),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def slam_step(
    state: SlamState,
    depth: jax.Array,
    gray: jax.Array,
    camera: PinholeCamera,
    key: jax.Array,
    cfg: SlamConfig = SlamConfig(),
) -> Tuple[SlamState, SlamDiag]:
    odom, odiag = odometry_step(state.odom, depth, camera, cfg.odometry)
    kf = state.keyframes
    edges = state.edges
    cur = state.current_kf

    promoted = odiag.promoted
    # Ring buffer: the write head wraps and evicts the oldest keyframe
    # once the store is full (round-1 saturation overwrote the *last*
    # slot forever — VERDICT r1 item 7).
    slot = kf.count % cfg.max_keyframes
    evict = promoted & (kf.count >= cfg.max_keyframes)

    # --- promotion-only work, skipped at runtime on ordinary frames ----
    # Feature extraction, the K x F x F descriptor match, and RANSAC
    # verification only matter when a keyframe is promoted (~10% of
    # frames); lax.cond executes just one branch, so tracking frames pay
    # only the odometry cost. (Matching runs against the pre-insertion
    # store; the new slot and the current keyframe are excluded from
    # eligibility either way.)
    F = cfg.features_per_kf

    def _probe_branch(_):
        desc, xyz, kpm = _kf_features(camera, depth, gray, cfg)

        def match_one(d_other, m_other):
            m = match_descriptors(desc, kpm, d_other, m_other, max_matches=F)
            return m.idx_a, m.idx_b, m.mask

        ia, ib, mm = jax.vmap(match_one)(kf.desc, kf.kp_mask)  # (K, F)
        match_counts = jnp.sum(mm, axis=1, dtype=jnp.int32)
        kf_idx = jnp.arange(cfg.max_keyframes)
        # Temporal adjacency via insertion stamps, not slot indices —
        # the ring wraps. The new keyframe's stamp is kf.count.
        eligible = (
            kf.valid
            & (kf.stamp >= 0)
            & (kf.count - kf.stamp >= cfg.lc_min_gap)
            & (kf_idx != slot)
            & (kf_idx != cur)
        )
        match_counts = jnp.where(eligible, match_counts, -1)
        cand = jnp.argmax(match_counts)
        cand_matches = match_counts[cand]

        # Geometric verification: rigid 3D-3D between matched keypoints.
        src = xyz[ia[cand]]
        dst = kf.kp_xyz[cand][ib[cand]]
        pair_mask = mm[cand] & kpm[ia[cand]] & kf.kp_mask[cand][ib[cand]]
        fit = ransac_rigid(
            src, dst, pair_mask, key,
            threshold=cfg.lc_ransac_threshold,
            num_hypotheses=128,
            min_inliers=cfg.lc_min_inliers,
        )
        return (desc, xyz, kpm, cand.astype(jnp.int32), cand_matches,
                fit.transform, fit.num_inliers, fit.valid)

    def _skip_branch(_):
        return (
            jnp.zeros((F, 8), jnp.uint32),
            jnp.zeros((F, 3), jnp.float32),
            jnp.zeros((F,), bool),
            jnp.int32(0),
            jnp.int32(-1),
            jnp.eye(4, dtype=kf.poses.dtype),
            jnp.int32(0),
            jnp.bool_(False),
        )

    (desc, xyz, kpm, cand, cand_matches, fit_T, fit_inliers, fit_valid) = (
        jax.lax.cond(promoted, _probe_branch, _skip_branch, None)
    )

    # --- keyframe insertion (masked write at `slot`) -------------------
    kf2 = KeyframeStore(
        poses=kf.poses.at[slot].set(jnp.where(promoted, odom.pose, kf.poses[slot])),
        desc=kf.desc.at[slot].set(jnp.where(promoted, desc, kf.desc[slot])),
        kp_xyz=kf.kp_xyz.at[slot].set(jnp.where(promoted, xyz, kf.kp_xyz[slot])),
        kp_mask=kf.kp_mask.at[slot].set(jnp.where(promoted, kpm, kf.kp_mask[slot])),
        valid=kf.valid.at[slot].set(jnp.where(promoted, True, kf.valid[slot])),
        stamp=kf.stamp.at[slot].set(jnp.where(promoted, kf.count, kf.stamp[slot])),
        count=kf.count + promoted.astype(jnp.int32),
    )

    # Eviction invalidates every edge that references the recycled slot
    # (its endpoints now describe a different keyframe).
    stale = evict & ((edges.i == slot) | (edges.j == slot))
    edges = edges._replace(mask=edges.mask & ~stale)

    # --- odometry edge cur -> slot on promotion (edge ring) ------------
    e_slot = edges.count % cfg.max_edges
    T_rel = se3.inverse(kf.poses[cur]) @ odom.pose
    edges2 = EdgeList(
        i=edges.i.at[e_slot].set(jnp.where(promoted, cur, edges.i[e_slot])),
        j=edges.j.at[e_slot].set(jnp.where(promoted, slot, edges.j[e_slot])),
        T=edges.T.at[e_slot].set(jnp.where(promoted, T_rel, edges.T[e_slot])),
        weight=edges.weight.at[e_slot].set(jnp.where(promoted, 1.0, edges.weight[e_slot])),
        mask=edges.mask.at[e_slot].set(jnp.where(promoted, True, edges.mask[e_slot])),
        count=edges.count + promoted.astype(jnp.int32),
    )

    # --- loop closure decision (probe results from the cond above) -----
    probe = promoted & (cand_matches >= cfg.lc_min_matches)
    loop_ok = probe & fit_valid

    e2 = edges2.count % cfg.max_edges
    edges3 = EdgeList(
        i=edges2.i.at[e2].set(jnp.where(loop_ok, cand, edges2.i[e2])),
        j=edges2.j.at[e2].set(jnp.where(loop_ok, slot, edges2.j[e2])),
        # fit maps new-kf points into candidate frame: T_cand_new.
        T=edges2.T.at[e2].set(jnp.where(loop_ok, fit_T, edges2.T[e2])),
        weight=edges2.weight.at[e2].set(jnp.where(loop_ok, 2.0, edges2.weight[e2])),
        mask=edges2.mask.at[e2].set(jnp.where(loop_ok, True, edges2.mask[e2])),
        count=edges2.count + loop_ok.astype(jnp.int32),
    )

    new_state = SlamState(
        odom=odom,
        keyframes=kf2,
        edges=edges3,
        current_kf=jnp.where(promoted, slot, cur),
        loop_found=loop_ok,
    )
    if cfg.correct_in_step:
        new_state = jax.lax.cond(
            loop_ok,
            lambda s: correct_with_pose_graph(s, iterations=cfg.pg_iterations),
            lambda s: s,
            new_state,
        )
    diag = SlamDiag(
        promoted=promoted,
        loop_candidate=jnp.where(probe, cand, -1).astype(jnp.int32),
        loop_matches=cand_matches,
        loop_inliers=fit_inliers,
        overlap=odiag.overlap,
    )
    return new_state, diag


def correct_with_pose_graph(state: SlamState, iterations: int = 10) -> SlamState:
    """Run pose-graph GN over the keyframe poses and write them back
    (host-triggered after a loop closure)."""
    graph = PoseGraph(
        poses_wc=state.keyframes.poses,
        edge_i=state.edges.i,
        edge_j=state.edges.j,
        edge_T=state.edges.T,
        edge_weight=state.edges.weight,
        edge_mask=state.edges.mask,
    )
    opt, c0, c1 = optimize_pose_graph(graph, iterations=iterations)
    # Keep invalid slots untouched; shift the live pose by the current
    # keyframe's correction.
    corr = opt[state.current_kf] @ se3.inverse(state.keyframes.poses[state.current_kf])
    new_poses = jnp.where(state.keyframes.valid[:, None, None], opt, state.keyframes.poses)
    new_poses = se3.orthonormalize_T(new_poses)
    new_odom = state.odom._replace(
        pose=se3.orthonormalize_T(corr @ state.odom.pose),
        kf_pose=se3.orthonormalize_T(corr @ state.odom.kf_pose),
    )
    return state._replace(
        keyframes=state.keyframes._replace(poses=new_poses),
        odom=new_odom,
    )


def run_slam(camera: PinholeCamera, depths, grays, cfg: SlamConfig = SlamConfig()):
    """Host loop: track every frame, correcting on loop closures.

    With ``cfg.correct_in_step`` (default) the pose-graph correction is
    fused into ``slam_step`` under ``lax.cond``, so this loop is pure
    async dispatch: zero host-device syncs until the trajectory is
    gathered at the end. The legacy host-triggered mode keeps the
    overlapped one-frame-late sync (the closure flag of step t is
    inspected after step t+1 is enqueued)."""
    state = slam_init(camera, jnp.asarray(depths[0]), jnp.asarray(grays[0]), cfg)
    poses = [jnp.eye(4)]
    diags = []
    key = jax.random.key(0)
    prev_flag = state.loop_found
    for d, g in zip(depths[1:], grays[1:]):
        key, sub = jax.random.split(key)
        state, diag = slam_step(state, jnp.asarray(d), jnp.asarray(g), camera, sub, cfg)
        if not cfg.correct_in_step:
            if bool(prev_flag):  # previous step — already materialized
                state = correct_with_pose_graph(state)
            prev_flag = state.loop_found
        poses.append(state.odom.pose)
        diags.append(diag)
    if not cfg.correct_in_step and bool(prev_flag):
        state = correct_with_pose_graph(state)
        poses[-1] = state.odom.pose
    return state, poses, diags
