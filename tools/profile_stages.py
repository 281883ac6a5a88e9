"""Stage-level timing breakdown of the production encode path at 1080p.

Times each stage of what `av1tpu encode --preset quality` runs (the
bench.py operating point) separately on the attached TPU chip, so fps
work targets the actual bottleneck.  Prints one JSON object per stage.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def t(fn, *args, reps=3, **kw):
    fn(*args, **kw)  # compile / warm
    best = float("inf")
    for _ in range(reps):
        s = time.perf_counter()
        r = fn(*args, **kw)
        best = min(best, time.perf_counter() - s)
    return best, r


def main():
    import jax

    from av1tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from av1tpu.coding import Packer
    from av1tpu.core.scenes import scene_scores
    from av1tpu.models.cdef_tpu import (
        cdef_fused, select_strengths, skip8_host,
    )
    from av1tpu.models.cq import probe_quality
    from av1tpu.models.deblock_tpu import lf_levels
    from av1tpu.models.inter_v import (
        encode_gop_chunk_part, fetch_inter_part_prefix,
        split_compact_inter_part,
    )
    from av1tpu.models.intra_v import fuse_planes, split_compact
    from av1tpu.models.intra_wave import encode_intra_wave_key_recon
    from av1tpu.utils import synthetic_clip

    q = 72
    ch, cw = 1088, 1920
    chunk = 8
    clip = synthetic_clip(1920, 1080, chunk, seed=11)

    def pad(a, h, w):
        out = np.zeros((h, w), np.int32)
        ah, aw = a.shape
        out[:ah, :aw] = a
        out[ah:, :] = out[ah - 1: ah, :]
        return out

    planes = [(pad(clip.y[i].astype(np.int32), ch, cw),
               pad(clip.u[i].astype(np.int32), ch // 2, cw // 2),
               pad(clip.v[i].astype(np.int32), ch // 2, cw // 2))
              for i in range(chunk)]
    fused = np.stack([np.asarray(fuse_planes(*p)) for p in planes])
    fused_dev = jax.device_put(fused)
    f0 = jax.device_put(fused[0])
    res = {}

    # scene scores (whole clip, once per encode)
    ys = jax.numpy.asarray(clip.y.astype(np.int32))
    dt, _ = t(lambda: np.asarray(scene_scores(ys)))
    res["scene_scores_8f"] = dt

    # CQ/quality probe (once per scene)
    yj = jax.numpy.asarray(planes[0][0])
    uj = jax.numpy.asarray(planes[0][1])
    vj = jax.numpy.asarray(planes[0][2])
    dt, _ = t(lambda: float(probe_quality(yj, uj, vj, jax.numpy.int32(q),
                                          metric="psnr", partitions=True)))
    res["probe_once_per_scene"] = dt

    # wavefront keyframe (once per scene)
    klf = lf_levels(q - 24)
    dt, (kbuf, ref) = t(
        lambda: jax.block_until_ready(encode_intra_wave_key_recon(
            f0, q - 24, ch, cw, cap=163840,
            lf=(klf[0], klf[2], klf[3]))))
    res["keyframe_wavefront"] = dt
    kbuf_np = np.asarray(kbuf)

    # keyframe CDEF search + apply (once per scene)
    def cdef_stage():
        _, bm, _, _ = split_compact(kbuf_np, ch, cw)
        skip8 = jax.numpy.asarray(skip8_host(bm, ch, cw))
        s = select_strengths(ref, f0, skip8, ch, cw)
        return jax.block_until_ready(
            cdef_fused(ref, skip8, jax.numpy.asarray(s), ch, cw)), s

    dt, (ref_cdef, cdef_s) = t(cdef_stage)
    res["keyframe_cdef_search"] = dt

    # keyframe host pack (once per scene)
    packer = Packer()

    def pack_key():
        count, bm, vals, modes = split_compact(kbuf_np, ch, cw)
        return packer.pack_tile_compact(bm, vals, ch, cw, q - 24,
                                        modes=modes, uv_mode=0,
                                        tx_from_mode=True)

    dt, _ = t(pack_key)
    res["keyframe_host_pack"] = dt

    # inter chunk: device compute (per 8 frames)
    ilf = lf_levels(q)
    cdef_j = jax.numpy.asarray(cdef_s)

    fstate = {}

    def inter_chunk():
        bufs, r, _mv = encode_gop_chunk_part(
            fused_dev, ref_cdef, q, ch, cw, cap=163840,
            lf=(ilf[0], ilf[2], ilf[3]), cdef_s=cdef_j)
        out = [fetch_inter_part_prefix(b, ch, cw, fstate) for b in bufs]
        jax.block_until_ready(r)
        return out

    dt, bufs_np = t(inter_chunk)
    res["inter_chunk_8f_device+fetch"] = dt
    res["inter_per_frame_device"] = dt / chunk

    # inter host pack (per frame)
    cdfs = packer.new_cdf_blob()

    def pack_inter(buf):
        (count, bm, vals, s16, s32, s64, ref16,
         mv) = split_compact_inter_part(
            buf, ch, cw)
        return packer.pack_tile_inter_part(bm, vals, s32, s64, mv, ch, cw,
                                           q, cdf_in=cdfs, cdf_out=cdfs,
                                           split16=s16,
                                           refs=ref16 if ref16.any()
                                           else None)

    dt, _ = t(lambda: pack_inter(bufs_np[0]))
    res["inter_host_pack_per_frame"] = dt

    # split alone (host, per frame)
    dt, _ = t(lambda: split_compact_inter_part(bufs_np[0], ch, cw))
    res["inter_host_split_per_frame"] = dt

    for k, v in res.items():
        print(json.dumps({"stage": k, "seconds": round(v, 4)}))

    # modeled steady-state: per-frame inter cost (device+fetch serialized
    # with pack unless pipelined) + amortized per-scene costs over 48
    per_scene = (res["probe_once_per_scene"] + res["keyframe_wavefront"]
                 + res["keyframe_cdef_search"] + res["keyframe_host_pack"])
    per_frame_dev = res["inter_per_frame_device"]
    per_frame_host = res["inter_host_pack_per_frame"]
    ideal = max(per_frame_dev, per_frame_host)
    print(json.dumps({
        "per_scene_overhead_s": round(per_scene, 3),
        "per_frame_device_s": round(per_frame_dev, 4),
        "per_frame_host_pack_s": round(per_frame_host, 4),
        "fps_if_pipelined_48f": round(
            48 / (per_scene + 47 * ideal), 2),
        "fps_if_serialized_48f": round(
            48 / (per_scene + 47 * (per_frame_dev + per_frame_host)), 2),
    }))


if __name__ == "__main__":
    main()
