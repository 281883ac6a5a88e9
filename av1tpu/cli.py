"""Command-line encoder: the daemon's encode backend.

    python3 -m av1tpu.cli encode -i INPUT -o OUTPUT.ivf \
        [--qindex N] [--workers W] [--chunk K] [--max-frames N]

Replaces the reference's external `av1an` invocation
(reference crates/daemon/src/encode/av1an.rs:79-139): instead of shelling to
an SVT-AV1 chunk farm, frames go through the TPU intra pipeline
(av1tpu.models.intra_v) and the C++ entropy packer, producing an IVF.
Non-y4m inputs are demuxed/decoded to y4m via the native av1_tool first.

Prints one JSON stats line on success.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AV1_TOOL = os.path.join(REPO, "native", "build", "av1_tool")

# keyframe quality boost (qindex steps below the scene q); --key-q-boost
KEY_Q_BOOST = 24


class _StageClock:
    """Accumulating per-stage wall-clock timers (stats["stage_seconds"]):
    localizes where encode time goes on the real chip — device dispatch,
    host transfer, host pack, probes — without a profiler run."""

    def __init__(self):
        self.acc: dict[str, float] = {}

    def __call__(self, name: str):
        import contextlib

        @contextlib.contextmanager
        def _cm():
            t = time.perf_counter()
            try:
                yield
            finally:
                self.acc[name] = (self.acc.get(name, 0.0)
                                  + time.perf_counter() - t)

        return _cm()


class _CapacityExceeded(RuntimeError):
    """Compact-transport value list overflowed; retry with a larger cap."""

    def __init__(self, count: int):
        super().__init__(f"compact capacity exceeded ({count} values)")
        self.count = count


def _pad_plane(a: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.zeros((h, w), np.int32)
    ah, aw = a.shape
    out[:ah, :aw] = a
    if aw < w:
        out[:ah, aw:] = out[:ah, aw - 1 : aw]
    if ah < h:
        out[ah:, :] = out[ah - 1 : ah, :]
    return out


def encode_clip(clip, qindex: int, chunk: int = 4, progress=None,
                target_quality: float = 0.0, metric: str = "tpu_vmaf",
                partitions: bool = True, scene_threshold: float = 2.5,
                gop: bool = True, key_q_boost: int = KEY_Q_BOOST,
                key_lam_scale: float = 0.3, key_tf: bool = True,
                workers: int = 1, layers: int = 1,
                nr_q_delta: int = 12) -> tuple[list[bytes], dict]:
    """Encode a Clip into AV1 TUs.  gop=True (the production mode) codes one
    keyframe per scene and inter frames in between, matching the reference's
    operating point (av1an --keyint 240, crates/daemon/src/encode/av1an.rs:14);
    gop=False is the all-intra mode.  With target_quality > 0, a per-scene CQ
    bisection picks the coarsest qindex whose keyframe score meets the target
    (av1an --target-quality equivalent).  partitions=True uses the 32/16
    partition-RDO pipeline for keyframes.  Returns (per-frame OBU streams,
    stats)."""
    import jax

    from av1tpu.coding import Packer
    from av1tpu.models.cq import cq_search_multi, probe_quality_multi
    from av1tpu.models.inter_v import (
        encode_gop_chunk, encode_gop_chunk_part, encode_gop_chunk_layered,
        fetch_inter_part_prefix, split_compact_inter,
        split_compact_inter_part,
    )
    from av1tpu.models.intra_part import (
        encode_intra_key_recon, encode_intra_part_chunk, split_compact_part,
    )
    from av1tpu.models.intra_v import (
        encode_intra_v_chunk, encode_intra_v_key_recon, fuse_planes,
        split_compact,
    )
    from av1tpu.models.intra_wave import encode_intra_wave_key_recon
    from av1tpu.models.deblock_tpu import lf_levels
    from av1tpu.models.cdef_tpu import (
        cdef_fused, select_strengths, skip8_host,
    )

    from av1tpu.core.scenes import scene_scores, split_scenes

    width, height = clip.width, clip.height
    bd = clip.bit_depth
    cw = (width + 63) & ~63
    ch = (height + 63) & ~63
    inter_cap = max(131072, (ch * cw) // 8)
    packer = Packer()
    clock = _StageClock()
    streams: list[bytes] = []
    t0 = time.perf_counter()
    n = clip.num_frames
    q_used: list[int] = []
    scores: list[float] = []
    psnrs: list[float] = []

    # scene-aligned segments (the reference's av1an scene split): q is
    # selected once per scene, so CQ adapts at cuts instead of every chunk.
    # Luma is stride-decimated 4x on host and shipped in its native dtype:
    # the score is a diff/activity RATIO (scale-invariant), and full-res
    # int32 luma of a long clip is tens-to-hundreds of MB of host->device
    # transfer for a per-frame scalar
    if n > 1:
        with clock("scene_detect"):
            sc = np.asarray(scene_scores(
                jax.numpy.asarray(clip.y[:, ::4, ::4])))
        segments = split_scenes(sc, threshold=scene_threshold,
                                min_len=chunk, max_len=240)
    else:
        segments = [(0, n)]

    def padded(i):
        return (_pad_plane(clip.y[i].astype(np.int32), ch, cw),
                _pad_plane(clip.u[i].astype(np.int32), ch // 2, cw // 2),
                _pad_plane(clip.v[i].astype(np.int32), ch // 2, cw // 2))

    def _probe_frames(s0, e0, full: bool):
        """Sampled probe frames of a scene: first, middle and last when a
        CQ search needs the scene's hardest frame (av1an probes across the
        chunk); just the middle (most representative single sample) for
        the fixed-q stats score."""
        mid = (s0 + e0 - 1) // 2
        idxs = sorted({s0, mid, e0 - 1}) if full else [mid]
        return [tuple(jax.numpy.asarray(p) for p in padded(i))
                for i in idxs]

    def select_q(seg, probe_psnr=False):
        """Pick the scene qindex from multi-frame probes.  The intra probe
        at q is a conservative proxy for the emitted stream: the keyframe
        is actually coded at key_q <= q (better) and inter frames at q, so
        delivered quality is >= the probe score.  psnr_y in the stats is
        MEASURED from the emitted frames' reconstruction (GOP mode), not
        probed."""
        with clock("probe"):
            frames = _probe_frames(*seg, full=target_quality > 0)
        if target_quality > 0:
            q, score = cq_search_multi(frames, target_quality,
                                       metric=metric, bit_depth=bd,
                                       partitions=partitions)
        else:
            q = qindex
            score = probe_quality_multi(frames, jax.numpy.int32(q),
                                        metric=metric, bit_depth=bd,
                                        partitions=partitions)
        scores.append(score)
        if probe_psnr:
            psnrs.append(probe_quality_multi(frames, jax.numpy.int32(q),
                                             metric="psnr", bit_depth=bd,
                                             partitions=partitions))
        return q

    ny_pad = ch * cw
    sh8 = bd - 8

    @functools.partial(jax.jit, static_argnames=())
    def _recon_psnr(ref_fused, src_fused):
        """Measured luma PSNR of an emitted frame: recon (the exact pixels a
        decoder produces) vs source, scored in the 8-bit range."""
        r = (ref_fused[:ny_pad] >> sh8).astype(jax.numpy.float32)
        s = (src_fused[:ny_pad].astype(jax.numpy.int32) >> sh8).astype(
            jax.numpy.float32)
        mse = jax.numpy.maximum(jax.numpy.mean((r - s) ** 2), 1e-10)
        return 10.0 * jax.numpy.log10(255.0 * 255.0 / mse)

    def pack_key(buf, q, kind, lf, cdf_out=None, cdef=None):
        """cdf_out: optional CDF carry blob the keyframe's end-of-frame
        state is saved into (signalled via disable_frame_end_update_cdf=0;
        following inter frames load it with primary_ref_frame=0, so
        entropy contexts adapt across the whole scene instead of
        resetting per frame).  cdef: optional (pri_y, sec_y, pri_uv,
        sec_uv) strengths signalled in the headers (the recon must already
        be CDEF'd with the same values)."""
        if kind == "part":
            (count, bm, vals, m16, m32, sp,
             sp64) = split_compact_part(buf, ch, cw)
            if count > len(vals):
                raise _CapacityExceeded(count)
            tile = packer.pack_tile_part(bm, vals, m16, m32, sp, sp64,
                                         ch, cw, q, cdf_out=cdf_out)
        elif kind == "wave":
            from av1tpu.models.intra_wave import split_compact_wave
            count, bm, vals, modes, txd = split_compact_wave(buf, ch, cw)
            if count > len(vals):
                raise _CapacityExceeded(count)
            # the wavefront pipeline codes chroma DC_PRED (0), derives
            # each luma block's tx_type from its mode (Mode_To_Txfm) and
            # signals a per-block tx depth (TX_MODE_SELECT)
            tile = packer.pack_tile_compact(bm, vals, ch, cw, q,
                                            modes=modes, uv_mode=0,
                                            tx_from_mode=True,
                                            cdf_out=cdf_out, txd=txd)
        else:
            count, bm, vals, modes = split_compact(buf, ch, cw)
            if count > len(vals):
                raise _CapacityExceeded(count)
            tile = packer.pack_tile_compact(bm, vals, ch, cw, q,
                                            modes=modes, uv_mode=1,
                                            cdf_out=cdf_out)
        return _wrap_tu(tile, cw, ch, width, height, q, bd,
                        lf=(lf[0], lf[0], lf[1], lf[2]),
                        cdf_save=cdf_out is not None, cdef=cdef,
                        tx_select=kind == "wave")

    ncoef = ch * cw + 2 * (ch // 2) * (cw // 2)

    def pack_inter_tile(buf, q, cdfs_c, cdef_s, nonref: bool = False):
        """Split + pack one inter frame's compact buffer into a TU.
        nonref: a 2-layer pyramid non-reference frame — refresh no ref
        slots, leave the CDF chain untouched (cdf_out=None), and signal
        zero in-loop filters (the device skipped them, so decoder output
        still equals the device recon)."""
        if partitions:
            (count, bm, vals, s16, s32, s64, ref16,
             mv) = split_compact_inter_part(buf, ch, cw)
            if count > len(vals):
                raise _CapacityExceeded(count)
            tile = packer.pack_tile_inter_part(
                bm, vals, s32, s64, mv, ch, cw, q,
                cdf_in=cdfs_c, cdf_out=None if nonref else cdfs_c,
                split16=s16, refs=ref16 if ref16.any() else None)
        else:
            count, bm, vals, mv = split_compact_inter(buf, ch, cw)
            if count > len(vals):
                raise _CapacityExceeded(count)
            tile = packer.pack_tile_inter(
                bm, vals, mv, ch, cw, q,
                cdf_in=cdfs_c, cdf_out=cdfs_c)
        ilf = (0, 0, 0, 0) if nonref else lf_levels(q)
        return _wrap_tu_inter(
            tile, cw, ch, width, height, q, bd,
            lf=(ilf[0], ilf[0], ilf[2], ilf[3]), primary_ref=0,
            cdf_save=not nonref,
            cdef=(0, 0, 0, 0) if nonref else tuple(int(x) for x in cdef_s),
            golden=partitions, refresh=not nonref)

    n_dev = jax.device_count()
    if gop and workers > 1 and n_dev > 1 and len(segments) > 1:
        # multi-device production path: scenes are independent, so the
        # scene batch is sharded over the device mesh (the reference's
        # av1an --workers axis, crates/daemon/src/encode/av1an.rs:100)
        from av1tpu.parallel.gop import SceneBatchEncoder, scene_mesh

        wdev = min(workers, n_dev)
        mesh = scene_mesh(wdev)
        scenes = []
        for s0, e0 in segments:
            q = select_q((s0, e0))
            q_used.append(q)
            key_q = max(q - key_q_boost, 1) if e0 - s0 > 1 else q
            lyk, _, luk, lvk = lf_levels(key_q)
            ly_i, _, lu_i, lv_i = lf_levels(q)
            frames = np.stack([fuse_planes(*padded(i), bit_depth=bd)
                               for i in range(s0, e0)])
            ntf = min(7, e0 - s0 - 1) if key_tf else 0
            key_gate = 0.0
            inter_gate = 0.0
            if ntf > 0:
                from av1tpu.models.tfilter import temporal_filter_key
                with clock("tfilter"):
                    # pad with the KEY itself past the real neighbors
                    # (self-neighbor = exact match), matching the
                    # single-device path exactly — padding with the last
                    # real neighbor instead made workers-N streams
                    # diverge from workers-1 on short scenes
                    neigh = np.stack([frames[1 + j] if j < ntf
                                      else frames[0] for j in range(7)])
                    filt, sig, sig1 = temporal_filter_key(
                        jax.device_put(frames[0]), jax.device_put(neigh),
                        ch, cw, bit_depth=bd)
                    frames = frames.copy()
                    frames[0] = np.asarray(filt)
                    key_gate = float((3.0 * sig) ** 2)
                    # inter frames code raw sources: their residual noise
                    # is the full per-frame sigma, not the filtered one.
                    # 1.5x (not 3x): the per-coefficient noise ENERGY mean
                    # is sigma^2, and 9 sigma^2 pruned real signal (the
                    # keyframe's 3x rides on the ~sqrt(8)-smaller filtered
                    # sigma, so its effective floor is ~1.1 sigma^2)
                    inter_gate = float((1.5 * sig1) ** 2)
            scenes.append({
                "frames": frames,
                "q": q, "key_q": key_q,
                # wavefront keyframes signal TX_MODE_SELECT: sub-tx edges
                # are transform-block deblock edges the TPU deblock pass
                # does not model yet, so their in-loop filter is off
                # (CDEF still runs); fast-preset keyframes keep deblock
                "key_lf": (0, 0, 0) if partitions else (lyk, luk, lvk),
                "inter_lf": (ly_i, lu_i, lv_i),
                "key_gate": key_gate,
                "inter_gate": inter_gate,
            })
        key_kind = "wave" if partitions else "v"
        done_frames = 0
        for b0 in range(0, len(scenes), wdev):
            batch = scenes[b0 : b0 + wdev]
            enc = SceneBatchEncoder(batch, mesh, ch, cw, bit_depth=bd)
            key_cap, cap = 163840, inter_cap
            while True:
                results = enc.encode(
                    key_cap, cap, part=partitions,
                    skip8_host_fn=lambda buf: skip8_host(
                        split_compact(buf, ch, cw)[1], ch, cw),
                    key_lam_scale=key_lam_scale)
                try:
                    batch_tus = []
                    for sc, res in zip(batch, results):
                        cdfs = packer.new_cdf_blob()
                        cdef_t = tuple(int(x) for x in res["cdef_s"])
                        tus = [pack_key(res["key_buf"], sc["key_q"],
                                        key_kind, sc["key_lf"],
                                        cdf_out=cdfs, cdef=cdef_t)]
                        for buf in res["inter_bufs"]:
                            tus.append(pack_inter_tile(
                                buf, sc["q"], cdfs, res["cdef_s"]))
                        batch_tus.append(tus)
                    break
                except _CapacityExceeded as e:
                    key_cap = min(max(key_cap * 2, e.count), ncoef)
                    cap = min(max(cap * 2, e.count), ncoef)
            for sc, res, tus in zip(batch, results, batch_tus):
                streams.extend(tus)
                psnrs.append(float(_recon_psnr(
                    jax.numpy.asarray(res["ref"]),
                    jax.numpy.asarray(sc["frames"][-1]))))
                done_frames += sc["frames"].shape[0]
                if progress:
                    progress(done_frames, n)
    elif gop:
        for s0, e0 in segments:
            planes0 = padded(s0)
            q = select_q((s0, e0))
            q_used.append(q)
            # keyframe quality boost: the keyframe is every following
            # frame's (transitive) reference, so its distortion propagates
            # through the whole scene while its bits are paid once
            # (av1an/SVT boost keyframes the same way via --crf hierarchy)
            key_q = max(q - key_q_boost, 1) if e0 - s0 > 1 else q
            lyk, _, luk, lvk = lf_levels(key_q)
            # wavefront keyframes signal TX_MODE_SELECT: sub-tx edges are
            # transform-block deblock edges the TPU deblock pass does not
            # model yet, so their in-loop filter is off (CDEF still runs)
            key_lf = (0, 0, 0) if partitions else (lyk, luk, lvk)
            ly_i, _, lu_i, lv_i = lf_levels(q)
            inter_lf = (ly_i, lu_i, lv_i)
            fused0 = fuse_planes(*planes0, bit_depth=bd)
            ntf = min(7, e0 - s0 - 1) if key_tf else 0
            # quality preset: wavefront full-mode intra (DC/V/H/D45/D67/
            # SMOOTH*/PAETH) — the keyframe is the whole scene's transitive
            # reference, so its quality dominates; fast preset keeps the
            # row-parallel V-family pipeline
            key_fn = (encode_intra_wave_key_recon if partitions
                      else encode_intra_v_key_recon)
            key_kind = "wave" if partitions else "v"
            key_cap = 163840
            with clock("upload"):
                fused0_dev = jax.device_put(fused0)
            # motion-compensated temporal filter: the keyframe is coded
            # from a denoised average of itself + following frames (the
            # reference's SVT enable-tf; decoder-invisible).  Neighbor
            # count is static (7: residual noise sigma/sqrt(8) reaches
            # the anchor's alt-ref-filter quality band) — short scenes
            # pad with the key itself (exact match, just deepens the
            # average toward the key)
            key_src = fused0_dev
            key_gate = 0.0
            inter_gate = 0.0
            if ntf > 0:
                from av1tpu.models.tfilter import temporal_filter_key
                with clock("tfilter"):
                    neigh = np.stack(
                        [fuse_planes(*padded(min(s0 + 1 + j, e0 - 1)),
                                     bit_depth=bd) if j < ntf else fused0
                         for j in range(7)])
                    key_src, key_sig, key_sig1 = temporal_filter_key(
                        fused0_dev, jax.device_put(neigh), ch, cw,
                        bit_depth=bd)
                    # RDOQ noise floor for the keyframe: coefficients
                    # inside the (3 sigma)^2 band explain noise only.
                    # Python-float gates (not traced device scalars) so
                    # the single- and multi-device paths feed BIT-
                    # IDENTICAL values into the RDOQ compare — a 1-ulp
                    # difference flips keep/zero at the gate boundary
                    # and breaks workers-N stream identity
                    key_gate = float((3.0 * key_sig) ** 2)
                    # inter frames code raw sources (full per-frame
                    # noise); 1.5x — see the workers path note
                    inter_gate = float((1.5 * key_sig1) ** 2)
                    if os.environ.get("AV1TPU_NO_GATES"):
                        key_gate = 0.0
                        inter_gate = 0.0
                    if os.environ.get("AV1TPU_NO_KEYFILT"):
                        key_src = fused0_dev
                    if os.environ.get("AV1TPU_DEBUG_TF"):
                        _ky = np.asarray(key_src)[: ch * cw].astype(
                            np.float64)
                        _sy = fused0[: ch * cw].astype(np.float64)
                        print("TFDBG", float(key_sig), float(key_sig1),
                              float(np.mean((_ky - _sy) ** 2)),
                              key_gate, inter_gate, file=sys.stderr)
            # CDF carry chain: keyframe saves its end-of-frame CDFs, every
            # inter frame in the scene loads the previous frame's and saves
            # its own (primary_ref_frame = LAST)
            cdfs = packer.new_cdf_blob()
            key_kw = ({"lam_scale": key_lam_scale, "noise_gate": key_gate}
                      if partitions else {})
            while True:  # low-q keyframes can exceed the value capacity:
                with clock("key_device"):
                    buf, ref = key_fn(key_src, key_q, ch, cw,
                                      cap=key_cap, lf=key_lf, **key_kw)
                    buf_np = np.asarray(buf)
                # per-scene CDEF strength search on the keyframe: skip
                # gating from the coded significance bitmap, preset with
                # least distortion wins, recon becomes the CDEF'd frame
                # (deblock -> CDEF, the decoder's in-loop order)
                with clock("cdef"):
                    _, key_bm, _, _ = split_compact(buf_np, ch, cw)
                    skip8 = jax.numpy.asarray(skip8_host(key_bm, ch, cw))
                    cdef_s = select_strengths(ref, fused0_dev, skip8, ch,
                                              cw, bit_depth=bd)
                    cdef_j = jax.numpy.asarray(cdef_s)
                    ref = cdef_fused(ref, skip8, cdef_j, ch, cw,
                                     bit_depth=bd)
                try:
                    with clock("pack_key"):
                        streams.append(pack_key(buf_np, key_q,
                                                key_kind, key_lf,
                                                cdf_out=cdfs,
                                                cdef=tuple(int(x)
                                                           for x in cdef_s)))
                    break
                except _CapacityExceeded as e:  # retry, doubled transport
                    key_cap = min(max(key_cap * 2, e.count), ncoef)
            with clock("psnr"):
                psnrs.append(float(_recon_psnr(ref, fused0_dev)))
            if progress:
                progress(s0 + 1, n)
            cap = inter_cap
            gop_fn = (encode_gop_chunk_part if partitions
                      else encode_gop_chunk)
            bases = list(range(s0 + 1, e0, chunk))
            fetch_state: dict = {}  # prefix-fetch size predictor

            def prep(base):
                """Pad + fuse + upload one chunk.  Called for chunk N+1
                right after chunk N's (async) dispatch, so the host prep
                and the tunnel upload overlap chunk N's device compute."""
                k = min(chunk, e0 - base)
                with clock("host_prep"):
                    fused = np.stack([
                        fuse_planes(*padded(base + i), bit_depth=bd)
                        for i in range(k)])
                    if k < chunk:  # keep one compiled shape; the tail's
                        fused = np.concatenate(  # carry feeds only the
                            [fused,              # next keyframe
                             np.repeat(fused[-1:], chunk - k, axis=0)])
                with clock("upload"):
                    return k, jax.device_put(fused)

            # GOLDEN = the scene keyframe's filtered recon (ref slot 1),
            # device-resident and constant across the scene's inter chain
            gld = ref if partitions else None
            nxt = prep(bases[0]) if bases else None
            mv_carry = None  # temporal MV candidate chain (scene-local)
            layered = layers >= 2 and partitions
            q_nr = min(q + nr_q_delta, 255)
            for bi, base in enumerate(bases):
                k, fused_dev = nxt
                ref_in = ref
                mv_in = mv_carry
                pars = [0] * k
                first = True
                while True:
                    with clock("inter_dispatch"):
                        if layered:
                            bufs, pars, ref, mv_carry = \
                                encode_gop_chunk_layered(
                                    fused_dev, ref_in, q, q_nr, ch, cw,
                                    cap=cap, lf=inter_lf, cdef_s=cdef_j,
                                    gld_fused=gld, prev_mv=mv_in,
                                    start_parity=(base - s0) % 2,
                                    noise_gate=inter_gate)
                        elif partitions:
                            bufs, ref, mv_carry = gop_fn(
                                fused_dev, ref_in, q, ch, cw, cap=cap,
                                lf=inter_lf, cdef_s=cdef_j, gld_fused=gld,
                                prev_mv=mv_in, noise_gate=inter_gate)
                        else:
                            bufs, ref = gop_fn(fused_dev, ref_in,
                                               q, ch, cw, cap=cap,
                                               lf=inter_lf, cdef_s=cdef_j,
                                               gld_fused=gld)
                    if first:  # prefetch chunk N+1 behind N's compute
                        nxt = (prep(bases[bi + 1])
                               if bi + 1 < len(bases) else None)
                        first = False
                    tus = []
                    # chunk-local CDF chain: committed to `cdfs` only when
                    # the whole chunk packs (capacity retry restarts from
                    # the chunk-entry state)
                    cdfs_c = cdfs.copy()
                    try:
                        for i in range(k):
                            # per-frame PREFIX fetch (the device->host
                            # link is the bottleneck: only the used
                            # ~100 KB crosses, not the dense ~1 MB);
                            # frame i's transfer + host pack overlap
                            # frames i+1..'s TPU compute
                            with clock("inter_fetch"):
                                if partitions:
                                    buf = fetch_inter_part_prefix(
                                        bufs[i], ch, cw, fetch_state)
                                else:
                                    buf = np.asarray(bufs[i])
                            with clock("inter_pack"):
                                nr = bool(pars[i])
                                tus.append(pack_inter_tile(
                                    buf, q_nr if nr else q, cdfs_c,
                                    cdef_s, nonref=nr))
                        break
                    except _CapacityExceeded as e:
                        cap = min(max(cap * 2, e.count), ncoef)
                        cdfs_c = cdfs.copy()
                cdfs[:] = cdfs_c
                streams.extend(tus)
                # ref holds the recon of the chunk's last REFERENCE frame
                # (layered mode: the last even-parity frame)
                last_ref = max((i for i in range(k) if not pars[i]),
                               default=None)
                if k == chunk and last_ref is not None:
                    with clock("psnr"):  # emitted frame recon vs the
                        # already-resident chunk upload; kept as a device
                        # scalar so the pipeline never syncs on stats
                        psnrs.append(_recon_psnr(ref, fused_dev[last_ref]))
                if progress:
                    progress(base + k, n)
    else:
        plan: list[tuple[int, int, tuple | None]] = []  # (base, k, scene)
        for s0, e0 in segments:
            for base in range(s0, e0, chunk):
                plan.append((base, min(chunk, e0 - base),
                             (s0, e0) if base == s0 else None))

        for base, k, scene_seg in plan:
            planes = [padded(base + i) for i in range(k)]
            fused = np.stack([fuse_planes(*p, bit_depth=bd)
                              for p in planes])
            if k < chunk:  # keep one compiled shape
                fused = np.concatenate(
                    [fused, np.repeat(fused[-1:], chunk - k, axis=0)])

            if scene_seg or not q_used:
                q = select_q(scene_seg or (base, base + k),
                             probe_psnr=True)
            q_used.append(q)

            chunk_fn = (encode_intra_part_chunk if partitions
                        else encode_intra_v_chunk)
            cap = 163840
            while True:
                bufs = np.asarray(chunk_fn(jax.device_put(fused), q, ch,
                                           cw, cap=cap))
                try:
                    tus = [pack_key(bufs[i], q,
                                    "part" if partitions else "v",
                                    (0, 0, 0))
                           for i in range(k)]
                    break
                except _CapacityExceeded as e:
                    cap = min(max(cap * 2, e.count), ncoef)
            streams.extend(tus)
            if progress:
                progress(base + k, n)

    psnrs = [float(p) for p in psnrs]  # sync deferred stats scalars
    dt = time.perf_counter() - t0
    stats = {
        "frames": n,
        "bytes": sum(len(s) for s in streams),
        "encode_seconds": round(dt, 3),
        "encode_fps": round(n / dt, 3) if dt > 0 else 0.0,
        "width": width,
        "height": height,
        "qindex": round(sum(q_used) / len(q_used), 1),
        "scenes": len(segments),
        "keyframes": len(segments) if gop else n,
        "psnr_y": round(sum(psnrs) / len(psnrs), 3),
        metric if metric != "psnr" else "metric_score":
            round(sum(scores) / len(scores), 3),
        "stage_seconds": {k: round(v, 3)
                          for k, v in sorted(clock.acc.items())},
    }
    return streams, stats


def _cdef_cfg_kw(cdef):
    """EncoderConfig kwargs for a coded strength tuple (None = disabled)."""
    if cdef is None:
        return {}
    return {"enable_cdef": 1, "cdef_y_pri": cdef[0], "cdef_y_sec": cdef[1],
            "cdef_uv_pri": cdef[2], "cdef_uv_sec": cdef[3]}


def _wrap_tu(tile: bytes, coded_w: int, coded_h: int, render_w: int,
             render_h: int, qindex: int, bit_depth: int = 8,
             lf=(0, 0, 0, 0), cdf_save: bool = False,
             cdef=None, tx_select: bool = False) -> bytes:
    from av1tpu.spec.bits import BitWriter
    from av1tpu.spec.encode_frame import (
        EncoderConfig, make_frame_header, make_sequence_header,
    )
    from av1tpu.spec.headers import (
        write_frame_header_key, write_sequence_header,
    )
    from av1tpu.spec.obu import (
        OBU_FRAME, OBU_SEQUENCE_HEADER, build_obu, temporal_delimiter,
    )

    cfg = EncoderConfig(base_q_idx=qindex, bit_depth=bit_depth,
                        loop_filter_level=tuple(lf),
                        tx_mode_select=int(tx_select), **_cdef_cfg_kw(cdef))
    seq = make_sequence_header(coded_w, coded_h, cfg)
    fh = make_frame_header(seq, cfg)
    if cdf_save:  # decoder saves end-of-frame CDFs into the ref slots
        fh.disable_frame_end_update_cdf = 0
    fh.render_width, fh.render_height = render_w, render_h
    bw = BitWriter()
    write_frame_header_key(seq, fh, bw)
    bw.byte_align()
    return (temporal_delimiter()
            + build_obu(OBU_SEQUENCE_HEADER, write_sequence_header(seq))
            + build_obu(OBU_FRAME, bw.bytes() + tile))


def _wrap_tu_inter(tile: bytes, coded_w: int, coded_h: int, render_w: int,
                   render_h: int, qindex: int, bit_depth: int = 8,
                   lf=(0, 0, 0, 0), primary_ref: int | None = None,
                   cdf_save: bool = False, cdef=None,
                   golden: bool = False, refresh: bool = True) -> bytes:
    from av1tpu.spec.bits import BitWriter
    from av1tpu.spec.encode_frame import (
        EncoderConfig, make_frame_header_inter, make_sequence_header,
    )
    from av1tpu.spec.headers import write_frame_header_inter
    from av1tpu.spec.obu import OBU_FRAME, build_obu, temporal_delimiter

    cfg = EncoderConfig(base_q_idx=qindex, bit_depth=bit_depth,
                        loop_filter_level=tuple(lf), **_cdef_cfg_kw(cdef))
    seq = make_sequence_header(coded_w, coded_h, cfg)
    # golden: GOLDEN maps to slot 1, which holds the scene keyframe (the
    # keyframe refreshes every slot; inter frames refresh only slot 0)
    fh = make_frame_header_inter(seq, cfg, golden=golden, refresh=refresh)
    if primary_ref is not None:  # CDFs carried from LAST's saved state
        fh.primary_ref_frame = primary_ref
    if cdf_save:
        fh.disable_frame_end_update_cdf = 0
    fh.render_width, fh.render_height = render_w, render_h
    bw = BitWriter()
    write_frame_header_inter(seq, fh, bw)
    bw.byte_align()
    return temporal_delimiter() + build_obu(OBU_FRAME, bw.bytes() + tile)


def _to_y4m(path: str, tmpdir: str) -> str:
    if path.lower().endswith(".y4m"):
        return path
    if not os.path.exists(AV1_TOOL):
        raise RuntimeError("native av1_tool not built; cannot demux " + path)
    out = os.path.join(tmpdir, "source.y4m")
    r = subprocess.run([AV1_TOOL, "decode", path, out, "--codec", "auto"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError("source decode failed: " + r.stderr.strip())
    return out


def cmd_encode(args) -> int:
    from av1tpu.spec.obu import write_ivf
    from av1tpu.utils import read_y4m
    from av1tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from av1tpu.utils.log import get_logger, profile_trace

    log = get_logger("cli")
    with tempfile.TemporaryDirectory(dir=args.temp or None) as tmpdir:
        y4m = _to_y4m(args.input, tmpdir)
        clip = read_y4m(y4m)
        log.info("encoding %s: %dx%d %d frames %d-bit", args.input,
                 clip.width, clip.height, clip.num_frames, clip.bit_depth)
        if args.max_frames and clip.num_frames > args.max_frames:
            clip.y = clip.y[: args.max_frames]
            clip.u = clip.u[: args.max_frames]
            clip.v = clip.v[: args.max_frames]
        # live per-chunk progress lines (consumed by the daemon's
        # run_encode to drive the TUI Progress/FPS/ETA columns — the
        # reference never wired these, drift #5)
        t_start = time.perf_counter()

        def _progress(done: int, total: int) -> None:
            dt = time.perf_counter() - t_start
            print(json.dumps({
                "progress": round(done / total, 4),
                "frames_encoded": done,
                "total_frames": total,
                "fps": round(done / dt, 2) if dt > 0 else 0.0,
            }), flush=True)

        with profile_trace("encode_clip"):
            streams, stats = encode_clip(
                clip, args.qindex, chunk=args.chunk, progress=_progress,
                target_quality=args.target_quality, metric=args.metric,
                partitions=args.preset == "quality",
                scene_threshold=args.scene_threshold,
                gop=not args.all_intra, key_q_boost=args.key_q_boost,
                key_lam_scale=args.key_lam_scale,
                key_tf=not args.no_key_tf,
                workers=args.workers, layers=args.layers,
                nr_q_delta=args.nr_q_delta)
        log.info("encoded %d frames in %.2fs (%.2f fps), %d scenes",
                 stats["frames"], stats["encode_seconds"],
                 stats["encode_fps"], stats["scenes"])
        if args.output.lower().endswith(".ivf"):
            write_ivf(args.output, streams, clip.width, clip.height)
        else:
            # container output: mux the new AV1 video with every audio/
            # subtitle stream of the original (reference av1an does this via
            # --audio-params "-c:a copy", crates/daemon/src/encode/av1an.rs:96)
            ivf = os.path.join(tmpdir, "video.ivf")
            write_ivf(ivf, streams, clip.width, clip.height)
            src = "none" if args.input.lower().endswith(".y4m") else args.input
            r = subprocess.run([AV1_TOOL, "mux", ivf, src, args.output],
                               capture_output=True, text=True)
            if r.returncode != 0:
                raise RuntimeError("mux failed: " + r.stderr.strip())
            mux_stats = json.loads(r.stdout.strip().splitlines()[-1])
            stats["audio_streams"] = mux_stats["audio_streams"]
            stats["subtitle_streams"] = mux_stats["subtitle_streams"]
            stats["bytes"] = os.path.getsize(args.output)
    stats["output"] = args.output
    print(json.dumps(stats))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="av1tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    enc = sub.add_parser("encode", help="encode a video to AV1 (IVF)")
    enc.add_argument("-i", "--input", required=True)
    enc.add_argument("-o", "--output", required=True)
    enc.add_argument("--qindex", type=int, default=72)
    enc.add_argument("--workers", type=int, default=1,
                     help="devices to shard the scene batch across "
                          "(clamped to jax.device_count())")
    enc.add_argument("--key-q-boost", type=int, default=KEY_Q_BOOST,
                     help="keyframe qindex boost below the scene q "
                          "(RDO: keyframe distortion propagates through "
                          "the scene; swept on the corpus)")
    enc.add_argument("--key-lam-scale", type=float, default=0.3,
                     help="keyframe RDO lambda multiplier (<1 biases the "
                          "scene-long reference toward quality; the RDOQ "
                          "noise floor keeps the discount from re-"
                          "admitting sensor noise)")
    enc.add_argument("--no-key-tf", action="store_true",
                     help="disable motion-compensated temporal filtering "
                          "of keyframes (SVT enable-tf equivalent)")
    enc.add_argument("--chunk", type=int, default=4,
                     help="frames per TPU round-trip")
    enc.add_argument("--layers", type=int, choices=(1, 2), default=1,
                     help="temporal layers: 2 = alternate NON-REFERENCE "
                          "frames (refresh_frame_flags=0) coded at "
                          "qindex + --nr-q-delta — the low-delay half of "
                          "the anchor's lookahead pyramid")
    enc.add_argument("--nr-q-delta", type=int, default=12,
                     help="qindex penalty of non-reference frames "
                          "(--layers 2)")
    enc.add_argument("--temp", default=None, help="temp directory")
    enc.add_argument("--max-frames", type=int, default=0)
    enc.add_argument("--target-quality", type=float, default=0.0,
                     help="per-chunk CQ search: pick qindex hitting this "
                          "score on --metric (0 = fixed --qindex)")
    enc.add_argument("--metric", choices=("tpu_vmaf", "ssim", "psnr"),
                     default="tpu_vmaf")
    enc.add_argument("--scene-threshold", type=float, default=2.5,
                     help="scene-cut score threshold (chunking for "
                          "per-scene CQ)")
    enc.add_argument("--all-intra", action="store_true",
                     help="every frame a keyframe (default: one keyframe "
                          "per scene + inter frames, like the reference's "
                          "--keyint 240)")
    enc.add_argument("--preset", choices=("fast", "quality"),
                     default="quality",
                     help="fast: fixed 16x16 grid (max fps); quality: "
                          "32/16 partition RDO (~9%% lower BD-rate)")
    enc.set_defaults(fn=cmd_encode)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
