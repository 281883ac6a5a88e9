"""Production GOP with in-loop deblock + CDEF: the device-side filtered
recon chain (deblock_tpu -> cdef_tpu, skip gating recomputed from the
level grids the packer codes) must match the spec engine — and hence
libdav1d/libaom — bit-exactly."""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.models.cdef_tpu import cdef_fused, skip8_host
from av1tpu.models.deblock_tpu import lf_levels
from av1tpu.models.inter_host import InterReplayPlanner
from av1tpu.models.inter_v import (
    _gop_step, split_compact_inter, unpack_levels_inter,
)
from av1tpu.models.intra_v import (
    encode_intra_v, encode_intra_v_key_recon, fuse_planes, split_compact,
)
from av1tpu.spec import encode_frame as ef
from av1tpu.spec.obu import write_ivf
from av1tpu.utils import read_y4m
from tests.test_deblock_production import ModeGridPlanner
from tests.test_inter_pipeline import moving_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")

CDEF_S = (4, 1, 2, 1)


def test_cdef_gop_chain_matches_engine_and_decoder(tmp_path):
    import jax.numpy as jnp

    w, h = 128, 64
    q = 120
    clip = moving_clip(w, h, 4, seed=95, dy=2, dx=4)
    ly, _, lu, lv = lf_levels(q)
    lf3 = (ly, lu, lv)
    cfg = ef.EncoderConfig(base_q_idx=q, loop_filter_level=(ly, ly, lu, lv),
                           enable_cdef=1, cdef_y_pri=CDEF_S[0],
                           cdef_y_sec=CDEF_S[1], cdef_uv_pri=CDEF_S[2],
                           cdef_uv_sec=CDEF_S[3])
    cdef_j = jnp.asarray(np.array(CDEF_S, np.int32))

    # keyframe: device pipeline recon + post-hoc cdef_fused (the CLI's
    # order) vs the engine keyframe with LF+CDEF
    fused = fuse_planes(clip.y[0], clip.u[0], clip.v[0])
    buf, ref = encode_intra_v_key_recon(fused, q, h, w, lf=lf3)
    count, bm, vals, modes = split_compact(np.asarray(buf), h, w)
    skip8 = skip8_host(bm, h, w)
    ref = cdef_fused(ref, jnp.asarray(skip8), cdef_j, h, w)
    out0 = {k: np.asarray(val) for k, val in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q, rdo=True).items()}
    s0, recon = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                                   planner=ModeGridPlanner(out0))
    ref_np = np.asarray(ref)
    ny, nc = h * w, h * w // 4
    assert np.array_equal(ref_np[:ny].reshape(h, w), recon[0])
    assert np.array_equal(ref_np[ny : ny + nc].reshape(h // 2, w // 2),
                          recon[1])
    assert np.array_equal(ref_np[ny + nc :].reshape(h // 2, w // 2),
                          recon[2])

    # inter chain: device steps with cdef_s vs engine replay
    streams, recons = [s0], [recon]
    for k in range(1, 4):
        fused_k = fuse_planes(clip.y[k], clip.u[k], clip.v[k])
        buf, ref = _gop_step(fused_k, ref, q, h, w, 131072, lf3, cdef_j)
        count, bm, vals, mv = split_compact_inter(np.asarray(buf), h, w)
        lyv, luv, lvv = unpack_levels_inter(bm, vals, h, w)
        planner = InterReplayPlanner(mv, lyv, luv, lvv)
        s, recon = ef.encode_interframe(clip.y[k], clip.u[k], clip.v[k],
                                        recons[-1], cfg, planner=planner)
        streams.append(s)
        recons.append(recon)
        ref_np = np.asarray(ref)
        assert np.array_equal(ref_np[:ny].reshape(h, w), recon[0]), k
        assert np.array_equal(
            ref_np[ny : ny + nc].reshape(h // 2, w // 2), recon[1]), k
        assert np.array_equal(
            ref_np[ny + nc :].reshape(h // 2, w // 2), recon[2]), k

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
