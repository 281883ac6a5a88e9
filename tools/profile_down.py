"""Downlink scaling probes: single-stream device->host is ~16 MB/s on
the axon tunnel.  Tests whether concurrent fetches (threads /
jax.device_get batches / pre-staged copies) scale it."""

import concurrent.futures as cf
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    res = {}
    rng = np.random.RandomState(0)
    mix = jax.jit(lambda x, s: (x ^ (x >> 1)) + s)
    src = jax.device_put(rng.randint(0, 255, (512 * 1024,),
                                     dtype=np.uint8).astype(np.int32))
    outs = [jax.block_until_ready(mix(src, i)) for i in range(8)]  # 2MB ea
    np.asarray(outs[0])

    # serial fetch of 8 x 2 MB
    t0 = time.perf_counter()
    for o in outs:
        np.asarray(o)
    dt = time.perf_counter() - t0
    res["serial_8x2mb_MBps"] = 16 / dt

    # jax.device_get on the whole list
    t0 = time.perf_counter()
    jax.device_get(outs)
    dt = time.perf_counter() - t0
    res["device_get_list_MBps"] = 16 / dt

    # thread pool fetches
    for nt in (2, 4, 8):
        with cf.ThreadPoolExecutor(nt) as ex:
            t0 = time.perf_counter()
            list(ex.map(np.asarray, outs))
            dt = time.perf_counter() - t0
        res[f"threads{nt}_8x2mb_MBps"] = 16 / dt

    # .copy_to_host_async style: start all async copies then block
    try:
        t0 = time.perf_counter()
        for o in outs:
            o.copy_to_host_async()
        got = [np.asarray(o) for o in outs]
        dt = time.perf_counter() - t0
        res["copy_to_host_async_MBps"] = 16 / dt
    except Exception as e:  # pragma: no cover
        res["copy_to_host_async_err"] = str(e)[:40]

    # smaller pieces: 16 x 1MB via threads8
    outs1 = [jax.block_until_ready(mix(src[: 256 * 1024], i))
             for i in range(16)]
    np.asarray(outs1[0])
    with cf.ThreadPoolExecutor(8) as ex:
        t0 = time.perf_counter()
        list(ex.map(np.asarray, outs1))
        dt = time.perf_counter() - t0
    res["threads8_16x1mb_MBps"] = 16 / dt

    for k, v in res.items():
        print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)}))


if __name__ == "__main__":
    main()
