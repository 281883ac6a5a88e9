"""Does the axon tunnel scale with CONCURRENT transfers?  If the ~25
MB/s single-stream rate is a flow-control artifact, issuing N
device_puts before blocking may multiply effective throughput — the
difference between an 8 fps and a 20+ fps bench ceiling."""

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

    def up_batch(n, mb):
        arrs = [rng.randint(0, 255, (mb * 1024 * 1024,), dtype=np.uint8)
                for _ in range(n)]
        t0 = time.perf_counter()
        hs = [jax.device_put(a) for a in arrs]
        for h in hs:
            h.block_until_ready()
        dt = time.perf_counter() - t0
        return n * mb / dt, dt * 1e3

    jax.device_put(np.zeros(1024, np.uint8)).block_until_ready()
    for n, mb in ((1, 8), (8, 1), (4, 2), (16, 1)):
        rate, ms = up_batch(n, mb)
        res[f"up_{n}x{mb}mb_MBps"] = rate

    # queued-while-computing: dispatch a long compute, THEN the uploads
    m = jax.device_put(rng.rand(4096, 4096).astype(np.float32))
    mm = jax.jit(lambda a: a @ a @ a @ a @ a @ a @ a @ a)
    jax.block_until_ready(mm(m))
    arrs = [rng.randint(0, 255, (1024 * 1024,), dtype=np.uint8)
            for _ in range(8)]
    t0 = time.perf_counter()
    r = mm(m)
    hs = [jax.device_put(a) for a in arrs]
    for h in hs:
        h.block_until_ready()
    jax.block_until_ready(r)
    res["compute42ms_plus_8x1mb_ms"] = (time.perf_counter() - t0) * 1e3

    for k, v in res.items():
        print(json.dumps({k: round(v, 2)}))


if __name__ == "__main__":
    main()
