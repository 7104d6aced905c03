"""Honest device timing for the axon-tunnel TPU backend.

On the tunneled TPU platform, ``jax.block_until_ready`` can return
before the device has executed the queued work (execution is fully
async and only drains on a device-to-host read). Timing loops must
therefore end with a small D2H transfer: we fetch ONE element of one
output leaf, which (a) forces the FIFO device queue to drain and
(b) costs four bytes on the wire instead of the whole result.

Use ``bench_ms(fn, *args)`` for every perf number recorded anywhere in
this repo. The single tunnel round-trip is amortized over ``iters``.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def sync(out) -> None:
    """Force the device queue to drain: D2H-read one element."""
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "ravel")]
    if not leaves:
        return
    leaf = leaves[0]
    flat = leaf.ravel()
    np.asarray(flat[0:1] if flat.size else flat)


def bench_ms(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Milliseconds per call, queue-drained (one RTT amortized)."""
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def bench_ms_median(fn, *args, iters: int = 10, reps: int = 3) -> float:
    """Median of ``reps`` independent bench_ms runs."""
    return float(np.median([bench_ms(fn, *args, iters=iters)
                            for _ in range(reps)]))
