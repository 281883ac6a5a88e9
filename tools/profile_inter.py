"""Sub-stage device timing of the partitioned inter step at 1080p.

Jits each piece of _gop_step_part separately (search, sub8, chroma MC,
partition RDO, filters, compaction) and times it on the real chip, so
speed work targets the dominant device ops rather than guessing.
Pieces are timed in isolation (inputs pre-staged on device,
block_until_ready around each call).  Prints one JSON line per stage.
"""

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def t(fn, reps=5):
    import jax
    jax.block_until_ready(fn())  # compile/warm
    best = float("inf")
    for _ in range(reps):
        s = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - s)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from av1tpu.models import inter_v as iv
    from av1tpu.models.intra_v import fuse_planes, _plane_params
    from av1tpu.utils import synthetic_clip
    from av1tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    q = 72
    ch, cw = 1088, 1920
    clip = synthetic_clip(1920, 1080, 2, seed=11)

    def pad(a, h, w):
        out = np.zeros((h, w), np.int32)
        ah, aw = a.shape
        out[:ah, :aw] = a
        out[ah:, :] = out[ah - 1: ah, :]
        return out

    y0 = jax.device_put(pad(clip.y[0].astype(np.int32), ch, cw))
    u0 = jax.device_put(pad(clip.u[0].astype(np.int32), ch // 2, cw // 2))
    v0 = jax.device_put(pad(clip.v[0].astype(np.int32), ch // 2, cw // 2))
    y1 = jax.device_put(pad(clip.y[1].astype(np.int32), ch, cw))
    u1 = jax.device_put(pad(clip.u[1].astype(np.int32), ch // 2, cw // 2))
    v1 = jax.device_put(pad(clip.v[1].astype(np.int32), ch // 2, cw // 2))

    ac = _plane_params(q, 16, 8)[0][1]
    lam = float((ac * ac * 0.0234) ** 0.5)
    res = {}

    # --- full search (coarse + refine + global + subpel) ---
    sfn = jax.jit(lambda y, r: iv._search_mv(y, r, lam, 255))
    res["search_full"] = t(lambda: sfn(y1, y0))
    mv8, pred_y, src_b, (p40, mv_px) = sfn(y1, y0)
    mv8, pred_y, src_b, p40, mv_px = jax.block_until_ready(
        (mv8, pred_y, src_b, p40, mv_px))

    # --- search sub-pieces ---
    cfn = jax.jit(lambda y, r: iv._coarse_search(
        iv._block_sad(y, 4) // 16, iv._block_sad(r, 4) // 16,
        lam * iv._MV_BIAS / 16.0, lam * 14.0 / 16.0))
    res["search_coarse_qres"] = t(lambda: cfn(y1, y0))
    coarse, coarse2, shifts4 = jax.block_until_ready(cfn(y1, y0))

    pfn = jax.jit(lambda r, c: iv._patches_select(r, c))
    res["patches_select_1x"] = t(lambda: pfn(y0, coarse))
    patches = jax.block_until_ready(pfn(y0, coarse))

    rfn = jax.jit(lambda s, p, c: iv._refine_search(s, p, c, lam))
    res["refine_pm2_1x"] = t(lambda: rfn(src_b, patches, coarse))

    gfn = jax.jit(lambda y, r, s: iv._global_full(y, r, s))
    res["global_full"] = t(lambda: gfn(y1, y0, shifts4))

    p40fn = jax.jit(lambda r, c, o: iv._patches40_select(r, c, o))
    off = jnp.zeros_like(coarse)
    res["patches40_select"] = t(lambda: p40fn(y0, coarse, off))

    spfn = jax.jit(lambda s, p, m: iv._subpel_refine(s, p, m, lam, 255))
    res["subpel_refine"] = t(lambda: spfn(src_b, p40[..., 8:32, 8:32],
                                          mv_px))

    # --- sub8 stage ---
    s8fn = jax.jit(lambda y, ry, ru, rv, m, pb, p, mp: iv._sub8_stage(
        y, ry, ru, rv, m, pb, p, mp, lam, 255))
    res["sub8_stage"] = t(lambda: s8fn(y1, y0, u0, v0, mv8, pred_y, p40,
                                       mv_px))
    s8 = jax.block_until_ready(s8fn(y1, y0, u0, v0, mv8, pred_y, p40,
                                    mv_px))

    # --- chroma MC ---
    cmfn = jax.jit(lambda ru, rv, m: iv._chroma_mc_pair(ru, rv, m, 255))
    res["chroma_mc_pair"] = t(lambda: cmfn(u0, v0, mv8))
    pred_u, pred_v = jax.block_until_ready(cmfn(u0, v0, mv8))

    # --- partition RDO (coding) ---
    tb = iv._to_blocks
    partfn = jax.jit(functools.partial(iv._inter_partition, bit_depth=8))
    res["partition_rdo_with_sub8"] = t(lambda: partfn(
        src_b, pred_y, (tb(u1, 8), tb(v1, 8)), (pred_u, pred_v), mv8, q,
        sub8=s8))
    res["partition_rdo_no_sub8"] = t(lambda: partfn(
        src_b, pred_y, (tb(u1, 8), tb(v1, 8)), (pred_u, pred_v), mv8, q,
        sub8=None))

    # --- full step (everything + filters + compact) for reference ---
    f1 = jax.device_put(np.asarray(fuse_planes(
        pad(clip.y[1].astype(np.int32), ch, cw),
        pad(clip.u[1].astype(np.int32), ch // 2, cw // 2),
        pad(clip.v[1].astype(np.int32), ch // 2, cw // 2))))
    ref0 = jnp.concatenate([y0.reshape(-1), u0.reshape(-1),
                            v0.reshape(-1)])
    gld = jax.block_until_ready(ref0 + 0)
    cdef_j = jnp.asarray([3, 1, 3, 1], jnp.int32)
    pmv = jnp.zeros((ch // 16, cw // 16, 2), jnp.int32)
    res["gop_step_full"] = t(lambda: iv._gop_step_part(
        f1, ref0, q, ch, cw, 163840, lf=(21, 21, 21), cdef_s=cdef_j,
        gld_fused=gld, prev_mv=pmv))

    for k, v in res.items():
        print(json.dumps({"stage": k, "ms": round(v * 1e3, 2)}))
    acc = (res["search_full"] + res["sub8_stage"] + res["chroma_mc_pair"]
           + res["partition_rdo_with_sub8"])
    print(json.dumps({"sum_isolated_ms": round(acc * 1e3, 2),
                      "full_step_ms": round(res["gop_step_full"] * 1e3, 2)}))


if __name__ == "__main__":
    main()
