"""Benchmark entry point.  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Current stage benchmarked: jitted 1080p frame-analysis throughput (the
encoder pipeline grows each round; the metric converges on full 1080p encode
fps per chip vs SVT-AV1 preset 6 — see BASELINE.md).

Baseline numbers are read from benchmarks/baseline.json when present
(produced by tools/make_baseline.py on this machine).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from av1tpu.core.scenes import scene_scores

    t, h, w = 16, 1080, 1920
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randint(0, 255, size=(t, h, w)).astype(np.int32))

    fn = jax.jit(scene_scores)
    fn(y).block_until_ready()  # compile

    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(y)
    out.block_until_ready()
    dt = time.perf_counter() - start
    fps = iters * t / dt

    baseline_fps = None
    bpath = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline.json")
    if os.path.exists(bpath):
        with open(bpath) as f:
            baseline = json.load(f)
        baseline_fps = baseline.get("svt_preset6_1080p_fps")

    vs = (fps / baseline_fps) if baseline_fps else 0.0
    print(
        json.dumps(
            {
                "metric": "1080p_frame_analysis_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
