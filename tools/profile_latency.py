"""Axon-path latency probes: per-dispatch round-trip floor, device->host
transfer rate, and the chained-steps cost the production loop actually
pays.  Separates 'TPU compute' from 'tunnel latency' so speed work
targets the right one."""

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

    from av1tpu.models.inter_v import _gop_step_part
    from av1tpu.models.intra_v import fuse_planes
    from av1tpu.utils import synthetic_clip
    from av1tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    res = {}

    # 1. pure dispatch round trip: trivial jitted op
    f = jax.jit(lambda x: x + 1)
    x = jax.device_put(jnp.zeros((8, 128), jnp.int32))
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(f(x))
    res["tiny_dispatch_roundtrip_ms"] = (time.perf_counter() - t0) / 20 * 1e3

    # 1b. 20 chained tiny dispatches, one sync at the end
    t0 = time.perf_counter()
    y = x
    for _ in range(20):
        y = f(y)
    jax.block_until_ready(y)
    res["tiny_chain20_total_ms"] = (time.perf_counter() - t0) * 1e3

    # 2. transfer: fetch 1 MB / 8 MB device->host
    for mb in (1, 8):
        a = jax.device_put(jnp.zeros((mb * 512 * 1024,), jnp.int16))
        jax.block_until_ready(a)
        np.asarray(a)
        t0 = time.perf_counter()
        for _ in range(5):
            np.asarray(a)
        res[f"fetch_{mb}mb_ms"] = (time.perf_counter() - t0) / 5 * 1e3

    # 3. upload 3.1 MB (one fused 1080p frame)
    h = np.zeros((3110400,), np.uint8)
    jax.device_put(h).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        jax.device_put(h).block_until_ready()
    res["upload_3mb_ms"] = (time.perf_counter() - t0) / 5 * 1e3

    # 4. production-shaped chain: K gop steps, one sync, no buffer fetch
    q = 72
    ch, cw = 1088, 1920
    clip = synthetic_clip(1920, 1080, 2, seed=11)

    def pad(a, hh, ww):
        out = np.zeros((hh, ww), np.int32)
        ah, aw = a.shape
        out[:ah, :aw] = a
        out[ah:, :] = out[ah - 1 : ah, :]
        return out

    f1 = jax.device_put(np.asarray(fuse_planes(
        pad(clip.y[1].astype(np.int32), ch, cw),
        pad(clip.u[1].astype(np.int32), ch // 2, cw // 2),
        pad(clip.v[1].astype(np.int32), ch // 2, cw // 2))))
    y0 = pad(clip.y[0].astype(np.int32), ch, cw)
    u0 = pad(clip.u[0].astype(np.int32), ch // 2, cw // 2)
    v0 = pad(clip.v[0].astype(np.int32), ch // 2, cw // 2)
    ref0 = jax.device_put(np.concatenate(
        [y0.reshape(-1), u0.reshape(-1), v0.reshape(-1)]).astype(np.int32))
    gld = ref0
    cdef_j = jnp.asarray([3, 1, 3, 1], jnp.int32)
    pmv = jnp.zeros((ch // 16, cw // 16, 2), jnp.int32)

    def chain(k, fetch_each):
        ref = ref0
        mv = pmv
        bufs = []
        t0 = time.perf_counter()
        for _ in range(k):
            buf, ref, mv = _gop_step_part(f1, ref, q, ch, cw, 163840,
                                          lf=(21, 21, 21), cdef_s=cdef_j,
                                          gld_fused=gld, prev_mv=mv)
            if fetch_each:
                bufs.append(np.asarray(buf))
        jax.block_until_ready(ref)
        if not fetch_each:
            bufs = [np.asarray(b) for b in [buf]]
        return time.perf_counter() - t0

    chain(2, False)  # warm
    res["gop_chain4_nofetch_per_frame_ms"] = chain(4, False) / 4 * 1e3
    res["gop_chain8_nofetch_per_frame_ms"] = chain(8, False) / 8 * 1e3
    res["gop_chain8_fetch_each_per_frame_ms"] = chain(8, True) / 8 * 1e3

    for k, v in res.items():
        print(json.dumps({k: round(v, 2)}))


if __name__ == "__main__":
    main()
