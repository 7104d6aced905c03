"""Example 03 — human-pose keypoints from an image.

The OpenPose flow (poseExtractorCaffe.cpp:202-340): two-branch CNN ->
heatmap NMS with subpixel refinement -> PAF line-integral pair scoring
-> greedy skeleton assembly — all inside one jitted call, at a tiny net
resolution (the reference CI smoke-runs with --net_resolution -1x32 the
same way; no pretrained weights ship in this zero-egress build).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples._common import setup_backend  # noqa: E402

setup_backend()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from perception_tpu.models.pose import (  # noqa: E402
    TOPOLOGIES,
    extract_people,
    init_posenet,
)
from perception_tpu.utils.keypoints import keep_top_n_people  # noqa: E402


def main() -> None:
    topology = "COCO_18"
    net_hw = (64, 64)
    parts, pairs = TOPOLOGIES[topology]
    print(f"topology {topology}: {len(parts)} parts, {len(pairs)} limb pairs")

    params = init_posenet(jax.random.key(0), topology, net_hw=net_hw)
    image = jax.random.uniform(jax.random.key(1), (96, 96, 3))

    people = jax.block_until_ready(
        jax.jit(
            lambda p, im: extract_people(p, im, topology, scales=(1.0,), net_hw=net_hw)
        )(params, image)
    )
    kp = np.asarray(people.keypoints)
    n = int(np.asarray(people.mask).sum())
    print(f"people detected (random weights, so ~noise): {n}; "
          f"keypoint tensor {kp.shape}")

    top_kp, top_scores, top_mask = keep_top_n_people(
        people.keypoints, people.score, people.mask, n=2
    )
    print(f"keep_top_n_people(2) -> {int(np.asarray(top_mask).sum())} kept "
          f"of capacity {top_kp.shape[0]}")


if __name__ == "__main__":
    main()
