"""Production two-reference coding: the TPU pipeline's own LAST/GOLDEN
decisions (encode_inter_part gld_* -> ref16) must replay bit-exactly
through the spec engine, survive the in-loop filter chain, and decode
bit-exactly in libdav1d and libaom.

GOLDEN is the scene keyframe's filtered recon (slot 1).  On content where
motion uncovers background (synthetic_clip's moving box), the uncovered
blocks don't exist in LAST (the box covered them) but do in the keyframe
— exactly the drift/occlusion axis of the reference anchor's alt-ref
structure (reference crates/daemon/src/encode/av1an.rs:14 --lookahead)."""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.coding import Packer
from av1tpu.models.deblock_tpu import lf_levels
from av1tpu.models.inter_host import InterPartReplayPlanner
from av1tpu.models.inter_v import _gop_step_part, encode_inter_part
from av1tpu.models.intra_v import (
    encode_intra_v, encode_intra_v_key_recon, fuse_planes, split_compact,
)
from av1tpu.spec import encode_frame as ef
from av1tpu.spec.obu import write_ivf
from av1tpu.utils import read_y4m, synthetic_clip
from tests.test_deblock_production import ModeGridPlanner
from tests.test_inter_part_packer import union_compact

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")
LIB = os.path.join(REPO, "native", "build", "libav1pack.so")

CDEF_S = (4, 1, 2, 1)


def test_golden_engine_parity_and_packer():
    """Pipeline golden decisions replay bit-exactly (engine recon == TPU
    recon) and the packer byte-matches the engine stream."""
    w, h = 128, 64
    q = 120
    clip = synthetic_clip(w, h, 4, seed=37)
    out0 = {k: np.asarray(v) for k, v in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}
    gld = [out0["recon_y"], out0["recon_u"], out0["recon_v"]]
    ref = list(gld)
    cfg = ef.EncoderConfig(base_q_idx=q)
    seq = ef.make_sequence_header(w, h, cfg)
    any_gld = False
    packer = Packer() if os.path.exists(LIB) else None
    for k in range(1, 4):
        o = {kk: np.asarray(v) for kk, v in encode_inter_part(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32), *ref, q,
            gld_y=gld[0], gld_u=gld[1], gld_v=gld[2]).items()}
        any_gld |= bool(o["ref16"].any())
        from av1tpu.spec.cdf_state import EncCoder
        from av1tpu.spec.enums import GOLDEN_FRAME, LAST_FRAME
        from av1tpu.spec.tile import TileCoder
        fh = ef.make_frame_header_inter(seq, cfg, golden=True)
        src = [clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
               clip.v[k].astype(np.int32)]
        rec = [np.zeros_like(p) for p in src]
        coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
        tc = TileCoder(seq, fh, coder, rec, source=src,
                       planner=InterPartReplayPlanner(o),
                       ref_planes={LAST_FRAME: ref, GOLDEN_FRAME: gld})
        tc.code_tile()
        py_tile = coder.done()
        assert np.array_equal(rec[0], o["recon_y"]), k
        assert np.array_equal(rec[1], o["recon_u"]), k
        assert np.array_equal(rec[2], o["recon_v"]), k
        if packer is not None:
            bitmap, vals = union_compact(o)
            cpp = packer.pack_tile_inter_part(
                bitmap, vals, o["split32"], o["split64"], o["mv8"], h, w,
                q, split16=o["split16"],
                refs=o["ref16"] if o["ref16"].any() else None)
            assert cpp == py_tile, (k, len(cpp), len(py_tile))
        ref = [o["recon_y"], o["recon_u"], o["recon_v"]]
    # golden must actually fire on occlusion content
    assert any_gld


def test_golden_production_chain(tmp_path):
    """Full production chain (_gop_step_part with golden + deblock + CDEF):
    device filtered recon == spec engine == both decoders."""
    import jax.numpy as jnp

    w, h = 128, 64
    q = 120
    clip = synthetic_clip(w, h, 4, seed=41)
    ly, _, lu, lv = lf_levels(q)
    lf3 = (ly, lu, lv)
    cfg = ef.EncoderConfig(base_q_idx=q,
                           loop_filter_level=(ly, ly, lu, lv),
                           enable_cdef=1, cdef_y_pri=CDEF_S[0],
                           cdef_y_sec=CDEF_S[1], cdef_uv_pri=CDEF_S[2],
                           cdef_uv_sec=CDEF_S[3])
    cdef_j = jnp.asarray(np.array(CDEF_S, np.int32))

    from av1tpu.models.cdef_tpu import cdef_fused, skip8_host
    fused = fuse_planes(clip.y[0], clip.u[0], clip.v[0])
    buf, ref = encode_intra_v_key_recon(fused, q, h, w, lf=lf3)
    count, bm, vals, modes = split_compact(np.asarray(buf), h, w)
    ref = cdef_fused(ref, jnp.asarray(skip8_host(bm, h, w)), cdef_j, h, w)
    gld_dev = ref  # the filtered keyframe = GOLDEN, scene-constant
    out0 = {k: np.asarray(val) for k, val in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q, rdo=True).items()}
    s0, recon = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                                   planner=ModeGridPlanner(out0))
    ref_np = np.asarray(ref)
    ny, nc = h * w, h * w // 4
    assert np.array_equal(ref_np[:ny].reshape(h, w), recon[0])
    gld_np = [np.asarray(p) for p in recon]

    streams, recons = [s0], [recon]
    any_gld = False
    for k in range(1, 4):
        o = {kk: np.asarray(v) for kk, v in encode_inter_part(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32),
            np.asarray(recons[-1][0]), np.asarray(recons[-1][1]),
            np.asarray(recons[-1][2]), q,
            gld_y=gld_np[0], gld_u=gld_np[1], gld_v=gld_np[2]).items()}
        any_gld |= bool(o["ref16"].any())
        fused_k = fuse_planes(clip.y[k], clip.u[k], clip.v[k])
        buf, ref, _mv = _gop_step_part(fused_k, ref, q, h, w, 131072, lf3,
                                  cdef_j, gld_fused=gld_dev)
        s, recon = ef.encode_interframe(clip.y[k], clip.u[k], clip.v[k],
                                        recons[-1], cfg,
                                        planner=InterPartReplayPlanner(o),
                                        golden_recon=gld_np)
        streams.append(s)
        recons.append(recon)
        ref_np = np.asarray(ref)
        assert np.array_equal(ref_np[:ny].reshape(h, w), recon[0]), k
        assert np.array_equal(
            ref_np[ny : ny + nc].reshape(h // 2, w // 2), recon[1]), k
        assert np.array_equal(
            ref_np[ny + nc :].reshape(h // 2, w // 2), recon[2]), k
    assert any_gld

    if not os.path.exists(TOOL):
        pytest.skip("av1_tool not built")
    ivf = str(tmp_path / "g.ivf")
    y4m = str(tmp_path / "g.y4m")
    write_ivf(ivf, streams, w, h)
    for codec in ("libdav1d", "libaom-av1"):
        r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                           capture_output=True, text=True)
        assert r.returncode == 0, (codec, r.stderr[:200])
        d = read_y4m(y4m)
        for k in range(4):
            for p, theirs in enumerate((d.y[k], d.u[k], d.v[k])):
                assert np.array_equal(recons[k][p],
                                      theirs.astype(np.int64)), (codec, k, p)
