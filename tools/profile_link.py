"""Host<->device link characterization on the axon tunnel: transfer
rates by size/direction, duplex behavior, and overlap with device
compute.  The production encode ships ~3.1 MB up and ~1 MB down per
frame; whether those overlap each other and the compute determines the
fps ceiling more than any kernel optimization."""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from av1tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    res = {}

    # upload rate by size (fresh random arrays so nothing is cached)
    rng = np.random.RandomState(0)
    for mb in (1, 4, 16):
        arrs = [rng.randint(0, 255, (mb * 1024 * 1024,), dtype=np.uint8)
                for _ in range(3)]
        jax.device_put(arrs[0]).block_until_ready()
        t0 = time.perf_counter()
        for a in arrs:
            jax.device_put(a).block_until_ready()
        dt = (time.perf_counter() - t0) / 3
        res[f"up_{mb}mb_ms"] = dt * 1e3
        res[f"up_{mb}mb_MBps"] = mb / dt

    # download rate: fetch freshly COMPUTED device data (defeats caching)
    mix = jax.jit(lambda x, s: (x ^ (x >> 1)) + s)
    for mb in (1, 4):
        src = jax.device_put(rng.randint(
            0, 255, (mb * 1024 * 1024,), dtype=np.uint8).astype(np.int32))
        outs = [jax.block_until_ready(mix(src, i)) for i in range(3)]
        np.asarray(outs[0])
        t0 = time.perf_counter()
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / 3
        res[f"down_{mb*4}mb_ms"] = dt * 1e3          # int32 = 4 B/el
        res[f"down_{mb*4}mb_MBps"] = mb * 4 / dt

    # async upload: does device_put return before the bytes land?
    big = rng.randint(0, 255, (8 * 1024 * 1024,), dtype=np.uint8)
    t0 = time.perf_counter()
    h = jax.device_put(big)
    res["up_8mb_dispatch_ms"] = (time.perf_counter() - t0) * 1e3
    h.block_until_ready()
    res["up_8mb_complete_ms"] = (time.perf_counter() - t0) * 1e3

    # overlap: a ~140 ms device compute issued first, then an 8 MB upload
    # — if the link runs during compute, total ~= max(compute, upload)
    m = jax.device_put(rng.rand(4096, 4096).astype(np.float32))
    mm = jax.jit(lambda a: a @ a @ a @ a @ a @ a @ a @ a)
    jax.block_until_ready(mm(m))
    t0 = time.perf_counter()
    jax.block_until_ready(mm(m))
    res["compute_only_ms"] = (time.perf_counter() - t0) * 1e3
    big2 = rng.randint(0, 255, (8 * 1024 * 1024,), dtype=np.uint8)
    t0 = time.perf_counter()
    r = mm(m)                      # async dispatch
    h2 = jax.device_put(big2)      # upload while computing?
    h2.block_until_ready()
    jax.block_until_ready(r)
    res["compute_plus_up8mb_ms"] = (time.perf_counter() - t0) * 1e3

    # duplex: 8 MB up and ~4 MB down at once
    src = jax.device_put(rng.randint(
        0, 255, (1024 * 1024,), dtype=np.uint8).astype(np.int32))
    out = jax.block_until_ready(mix(src, 7))
    big3 = rng.randint(0, 255, (8 * 1024 * 1024,), dtype=np.uint8)
    t0 = time.perf_counter()
    h3 = jax.device_put(big3)
    np.asarray(out)
    h3.block_until_ready()
    res["duplex_up8_down4_ms"] = (time.perf_counter() - t0) * 1e3

    for k, v in res.items():
        print(json.dumps({k: round(v, 2)}))


if __name__ == "__main__":
    main()
