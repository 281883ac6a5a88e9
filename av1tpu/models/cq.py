"""Target-quality (CQ) search: pick the qindex whose encode hits a quality
target, per chunk.

Plays the role of av1an's --target-quality VMAF probe loop in the reference
pipeline (SURVEY §7 step 7 / BASELINE config #3), natively on TPU: because
qindex is a traced argument of the encoder, every probe reuses ONE compiled
executable; a probe is a single device round-trip (encode + metric, no level
fetch).  Quality is monotone non-increasing in qindex, so bisection over the
integer qindex range converges in ~8 probes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from av1tpu.metrics.quality import psnr, ssim, tpu_vmaf
from av1tpu.models.intra_v import encode_intra_v

# "tpu_vmaf" is the honest name: a VMAF-architecture score calibrated in
# this framework, NOT numerically interchangeable with libvmaf (see
# av1tpu/metrics/quality.py docstring).
METRICS = {"psnr": psnr, "ssim": ssim, "tpu_vmaf": tpu_vmaf}


@functools.partial(jax.jit,
                   static_argnames=("metric", "bit_depth", "partitions"))
def probe_quality(y, u, v, qindex, metric: str = "tpu_vmaf",
                  bit_depth: int = 8, partitions: bool = False):
    """Encode at qindex and score the luma recon against the source.
    Runs entirely on device; returns a scalar.  10-bit planes are scored in
    the 8-bit range (>> 2) so scores stay comparable across depths.
    partitions=True probes with the 32/16 partition pipeline (the quality
    preset's actual recon)."""
    if partitions:
        from av1tpu.models.intra_part import encode_intra_part
        out = encode_intra_part(y, u, v, qindex, bit_depth=bit_depth)
    else:
        out = encode_intra_v(y, u, v, qindex, bit_depth=bit_depth)
    sh = bit_depth - 8
    return METRICS[metric](y >> sh, out["recon_y"] >> sh)


def probe_quality_multi(frames, qindex, metric: str = "tpu_vmaf",
                        bit_depth: int = 8,
                        partitions: bool = False) -> float:
    """Worst (minimum) probe score over several sampled frames — a scene's
    q must hold on its hardest sampled frame, not just the first (av1an
    probes across the chunk).  frames: list of (y, u, v) plane tuples.
    Each call reuses the single compiled probe executable."""
    return min(
        float(probe_quality(y, u, v, qindex, metric=metric,
                            bit_depth=bit_depth, partitions=partitions))
        for (y, u, v) in frames)


def cq_search_multi(frames, target: float, metric: str = "tpu_vmaf",
                    qmin: int = 8, qmax: int = 255, log=None,
                    bit_depth: int = 8,
                    partitions: bool = False) -> tuple[int, float]:
    """cq_search scored by the min over sampled frames (see
    probe_quality_multi)."""
    lo, hi = qmin, qmax
    best_q, best_score = qmin, None
    while lo <= hi:
        mid = (lo + hi) // 2
        score = probe_quality_multi(frames, jnp.int32(mid), metric=metric,
                                    bit_depth=bit_depth,
                                    partitions=partitions)
        if log:
            log(f"cq probe q={mid} {metric}={score:.3f}")
        if score >= target:
            best_q, best_score = mid, score
            lo = mid + 1
        else:
            hi = mid - 1
    if best_score is None:
        best_score = probe_quality_multi(
            frames, jnp.int32(qmin), metric=metric, bit_depth=bit_depth,
            partitions=partitions)
        best_q = qmin
    return best_q, best_score


def cq_search(y, u, v, target: float, metric: str = "tpu_vmaf",
              qmin: int = 8, qmax: int = 255, log=None,
              bit_depth: int = 8,
              partitions: bool = False) -> tuple[int, float]:
    """Smallest-bitrate (largest) qindex whose score >= target; if even qmin
    misses the target, returns qmin.  Returns (qindex, achieved_score)."""
    return cq_search_multi([(y, u, v)], target, metric=metric, qmin=qmin,
                           qmax=qmax, log=log, bit_depth=bit_depth,
                           partitions=partitions)
