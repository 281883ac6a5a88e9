"""Production 8x8 sub-block splits: the TPU pipeline's own decisions
(encode_inter_part sub8 stage) must replay bit-exactly through the spec
engine, survive the full in-loop filter chain (8px/4px interior deblock
edges + filter-size caps + per-sub-block CDEF skip), and decode
bit-exactly in libdav1d and libaom.

Targets VERDICT r2 missing #1's root cause: a 16x16 MC grid cannot
straddle object boundaries (the synth corpus box ring re-coded every
frame).  synthetic_clip's moving textured box over a static background is
exactly that content."""

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


def test_sub8_engine_parity_and_packer():
    """The pipeline's own 8x8 decisions replay bit-exactly (engine recon ==
    TPU recon) and the packer byte-matches the engine stream."""
    w, h = 128, 64
    q = 120
    clip = synthetic_clip(w, h, 3, seed=31)
    out0 = {k: np.asarray(v) for k, v in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}
    ref = (out0["recon_y"], out0["recon_u"], out0["recon_v"])
    cfg = ef.EncoderConfig(base_q_idx=q)
    seq = ef.make_sequence_header(w, h, cfg)
    any_split = False
    packer = Packer() if os.path.exists(LIB) else None
    for k in range(1, 3):
        o = {kk: np.asarray(v) for kk, v in encode_inter_part(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32), *ref, q).items()}
        any_split |= bool(o["split16"].any())
        from av1tpu.spec.cdf_state import EncCoder
        from av1tpu.spec.tile import TileCoder
        fh = ef.make_frame_header_inter(seq, cfg)
        src = [clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
               clip.v[k].astype(np.int32)]
        rec = [np.zeros_like(p) for p in src]
        coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
        tc = TileCoder(seq, fh, coder, rec, source=src,
                       planner=InterPartReplayPlanner(o),
                       ref_planes=list(ref))
        tc.code_tile()
        py_tile = coder.done()
        # engine recon == TPU recon, all planes
        assert np.array_equal(rec[0], o["recon_y"]), k
        assert np.array_equal(rec[1], o["recon_u"]), k
        assert np.array_equal(rec[2], o["recon_v"]), k
        if packer is not None:
            bitmap, vals = union_compact(o)
            cpp = packer.pack_tile_inter_part(
                bitmap, vals, o["split32"], o["split64"], o["mv8"], h, w,
                q, split16=o["split16"])
            assert cpp == py_tile, (k, len(cpp), len(py_tile))
        ref = (o["recon_y"], o["recon_u"], o["recon_v"])
    # the stage must actually fire on boundary content, else this test
    # proves nothing
    assert any_split


def test_inter8_production_chain_deblock_cdef(tmp_path):
    """Full production chain (_gop_step_part with deblock + CDEF and 8x8
    splits active): device filtered recon == spec engine == decoders."""
    import jax.numpy as jnp

    w, h = 128, 64
    q = 120
    clip = synthetic_clip(w, h, 4, seed=33)
    ly, _, lu, lv = lf_levels(q)
    lf3 = (ly, lu, lv)
    cfg = ef.EncoderConfig(base_q_idx=q,
                           loop_filter_level=(ly, ly, lu, lv),
                           enable_cdef=1, cdef_y_pri=CDEF_S[0],
                           cdef_y_sec=CDEF_S[1], cdef_uv_pri=CDEF_S[2],
                           cdef_uv_sec=CDEF_S[3])
    cdef_j = jnp.asarray(np.array(CDEF_S, np.int32))

    # keyframe (16+-only; 8x8 is inter-only this round)
    from av1tpu.models.cdef_tpu import cdef_fused, skip8_host
    fused = fuse_planes(clip.y[0], clip.u[0], clip.v[0])
    buf, ref = encode_intra_v_key_recon(fused, q, h, w, lf=lf3)
    count, bm, vals, modes = split_compact(np.asarray(buf), h, w)
    ref = cdef_fused(ref, jnp.asarray(skip8_host(bm, h, w)), cdef_j, h, w)
    out0 = {k: np.asarray(val) for k, val in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q, rdo=True).items()}
    s0, recon = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                                   planner=ModeGridPlanner(out0))
    ref_np = np.asarray(ref)
    ny, nc = h * w, h * w // 4
    assert np.array_equal(ref_np[:ny].reshape(h, w), recon[0])

    streams, recons = [s0], [recon]
    any_split = False
    for k in range(1, 4):
        # same inputs -> same decisions: the replay grids come from a
        # direct encode_inter_part call on the previous FILTERED recon
        o = {kk: np.asarray(v) for kk, v in encode_inter_part(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32),
            np.asarray(recons[-1][0]), np.asarray(recons[-1][1]),
            np.asarray(recons[-1][2]), q).items()}
        any_split |= bool(o["split16"].any())
        fused_k = fuse_planes(clip.y[k], clip.u[k], clip.v[k])
        buf, ref, _mv = _gop_step_part(fused_k, ref, q, h, w, 131072, lf3,
                                  cdef_j)
        s, recon = ef.encode_interframe(clip.y[k], clip.u[k], clip.v[k],
                                        recons[-1], cfg,
                                        planner=InterPartReplayPlanner(o))
        streams.append(s)
        recons.append(recon)
        ref_np = np.asarray(ref)
        assert np.array_equal(ref_np[:ny].reshape(h, w), recon[0]), k
        assert np.array_equal(
            ref_np[ny : ny + nc].reshape(h // 2, w // 2), recon[1]), k
        assert np.array_equal(
            ref_np[ny + nc :].reshape(h // 2, w // 2), recon[2]), k
    assert any_split

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
