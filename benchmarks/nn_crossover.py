"""Nearest-neighbor crossover: MXU brute force vs voxel-hash grid.

North-star evidence for "batched voxel-hash NN-gather kernels replacing
PCL's KD-tree": the cuboid pipeline's 10^3-10^4 working sets favor the
MXU distance-tile brute force (ops/nn.py), while dense-map regimes
(full frames / >= 32k-point fused maps — the SLAM map mode) need the
sublinear sorted-cell-window gather (ops/voxelhash.py). This bench
prints ms per query set across sizes so the crossover is documented on
the current backend rather than asserted.

Run: python -m benchmarks.nn_crossover
"""

from __future__ import annotations

import time

import numpy as np


def time_fn(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


DEFAULT_SIZES = [(1024, 2048), (4096, 8192), (4096, 32768),
                 (4096, 131072), (16384, 131072), (307200, 32768)]


def measure(sizes=None) -> list:
    """Measured brute-vs-hash table; each row is a dict (recorded into
    the driver bench extra — VERDICT r2 item 2)."""
    import jax
    import jax.numpy as jnp

    from perception_tpu.ops import nn as _nn
    from perception_tpu.ops import voxelhash

    rng = np.random.RandomState(0)
    radius = 0.06
    rows = []
    for nq, m in sizes or DEFAULT_SIZES:
        # Surface-like cloud (2-D manifold in 3-D) — realistic density.
        ref = rng.randn(m, 3).astype(np.float32)
        ref[:, 2] = 0.2 * np.sin(ref[:, 0] * 3) * np.cos(ref[:, 1] * 3)
        q = ref[rng.randint(0, m, nq)] + rng.randn(nq, 3).astype(np.float32) * 0.01
        refj, qj = jnp.asarray(ref), jnp.asarray(q)
        mask = jnp.ones(m, bool)

        brute = jax.jit(lambda a, b, c: _nn.nearest_neighbor(a, b, c))
        t_brute = time_fn(brute, qj, refj, mask)

        vh = voxelhash.build(refj, mask, cell_size=radius)
        hashed = jax.jit(lambda v, a: voxelhash.query(v, a, window=16))
        t_hash = time_fn(hashed, vh, qj)

        bi, bd = brute(qj, refj, mask)
        hi, hd = hashed(vh, qj)
        # Agreement where the true NN is within the hash radius.
        # Relative tolerance: the MXU brute force computes d2 via the
        # |a|^2+|b|^2-2ab expansion, whose f32 cancellation error at
        # |p|~5 is ~1e-5 absolute — an atol at that scale misreads
        # near-zero distances as disagreement (measured: 2.8% "agree"
        # on identical answers).
        in_range = np.asarray(bd) <= radius * radius
        agree = np.mean(
            np.isclose(
                np.asarray(hd)[in_range], np.asarray(bd)[in_range],
                rtol=1e-2, atol=1e-5,
            )
        )
        rows.append({
            "nq": nq, "m": m,
            "brute_ms": round(t_brute, 3), "hash_ms": round(t_hash, 3),
            "hash_over_brute": round(t_hash / t_brute, 3),
            "agree_pct": round(float(agree) * 100, 1),
        })
    return rows


def main() -> None:
    rows = measure()
    print(f"{'Nq':>8} {'M':>8} {'brute ms':>10} {'hash ms':>10} "
          f"{'hash/brute':>11} {'agree %':>8}")
    for r in rows:
        print(f"{r['nq']:>8} {r['m']:>8} {r['brute_ms']:>10.3f} "
              f"{r['hash_ms']:>10.3f} {r['hash_over_brute']:>11.2f} "
              f"{r['agree_pct']:>7.1f}%")


if __name__ == "__main__":
    main()
