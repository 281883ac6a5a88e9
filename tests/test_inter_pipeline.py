"""The TPU inter pipeline (models/inter_v.py) must reproduce the spec
engine bit-exactly when its decisions are replayed, and the resulting GOP
streams must decode bit-exactly in both system decoders.

Mirrors tests/test_tpu_pipeline.py for the intra plane.  Replaces the
reference's SVT-AV1 inter coding (reference
crates/daemon/src/encode/av1an.rs:14 --keyint 240).
"""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.models.inter_host import InterReplayPlanner
from av1tpu.models.inter_v import (
    encode_gop_chunk, encode_inter_v, split_compact_inter,
    unpack_levels_inter,
)
from av1tpu.models.intra_v import encode_intra_v, fuse_planes
from av1tpu.spec import encode_frame as ef
from av1tpu.spec.enums import V_PRED
from av1tpu.spec.obu import write_ivf
from av1tpu.spec.tile import FixedPartitionPlanner
from av1tpu.utils import read_y4m, synthetic_clip
from av1tpu.utils.yuv import Clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")


class GridPlanner(FixedPartitionPlanner):
    def __init__(self, out):
        super().__init__(leaf_bsize=6, y_mode=V_PRED, uv_mode=V_PRED)
        self.out = out

    def quantize(self, tc, coefs_f, plane, tx, dc_q, ac_q, shift, x=0, y=0):
        n = 16 if plane == 0 else 8
        grid = self.out[("levels_y", "levels_u", "levels_v")[plane]]
        return np.asarray(grid[y // n, x // n]).astype(np.int64)


def moving_clip(w, h, n, seed, dy=3, dx=5):
    """Global pan: frame k is a window shifted k*(dy, dx)."""
    big = synthetic_clip(w + 96, h + 96, 1, seed=seed)
    ys, us, vs = [], [], []
    for k in range(n):
        oy, ox = 48 - k * dy, 48 - k * dx
        ys.append(big.y[0][oy : oy + h, ox : ox + w].copy())
        us.append(big.u[0][oy // 2 : (oy + h) // 2,
                           ox // 2 : (ox + w) // 2].copy())
        vs.append(big.v[0][oy // 2 : (oy + h) // 2,
                           ox // 2 : (ox + w) // 2].copy())
    return Clip(y=np.stack(ys), u=np.stack(us), v=np.stack(vs))


def tpu_gop_encode(clip, q):
    """Keyframe through the intra TPU pipeline, the rest through the inter
    pipeline; replay everything through the spec engine.  Returns (streams,
    recons, tpu_recons)."""
    cfg = ef.EncoderConfig(base_q_idx=q)
    y0 = clip.y[0].astype(np.int32)
    out0 = {k: np.asarray(val) for k, val in
            encode_intra_v(y0, clip.u[0].astype(np.int32),
                           clip.v[0].astype(np.int32), q).items()}
    s0, recon = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                                   planner=GridPlanner(out0))
    streams, recons = [s0], [recon]
    tpu_recons = [(out0["recon_y"], out0["recon_u"], out0["recon_v"])]
    ref = tuple(np.asarray(p) for p in tpu_recons[0])
    for k in range(1, clip.num_frames):
        o = {kk: np.asarray(val) for kk, val in encode_inter_v(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32), *ref, q).items()}
        planner = InterReplayPlanner(o["mv"], o["levels_y"], o["levels_u"],
                                     o["levels_v"])
        s, recon = ef.encode_interframe(clip.y[k], clip.u[k], clip.v[k],
                                        recons[-1], cfg, planner=planner)
        streams.append(s)
        recons.append(recon)
        tpu_recons.append((o["recon_y"], o["recon_u"], o["recon_v"]))
        ref = (o["recon_y"], o["recon_u"], o["recon_v"])
    return streams, recons, tpu_recons


def check_decoders(tmp_path, streams, recons, w, h, n):
    ivf = str(tmp_path / "g.ivf")
    y4m = str(tmp_path / "g.y4m")
    write_ivf(ivf, streams, w, h)
    for codec in ("libdav1d", "libaom-av1"):
        r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                           capture_output=True, text=True)
        assert r.returncode == 0, (codec, r.stderr[:300])
        d = read_y4m(y4m)
        assert d.num_frames == n
        for k in range(n):
            for p, theirs in enumerate((d.y[k], d.u[k], d.v[k])):
                ours = recons[k][p][: theirs.shape[0], : theirs.shape[1]]
                assert np.array_equal(ours, theirs.astype(np.int64)), \
                    (codec, k, p)


@pytest.mark.parametrize("seed,motion", [(31, (3, 5)), (32, (0, 0)),
                                         (33, (-7, 11)), (34, (1, 3)),
                                         (35, (-3, -1))])
def test_inter_pipeline_matches_engine_and_decoders(tmp_path, seed, motion):
    clip = moving_clip(128, 64, 4, seed, *motion)
    q = 100
    streams, recons, tpu_recons = tpu_gop_encode(clip, q)
    for k in range(clip.num_frames):
        for p in range(3):
            assert np.array_equal(tpu_recons[k][p], recons[k][p]), (k, p)
    if not os.path.exists(TOOL):
        pytest.skip("av1_tool not built")
    check_decoders(tmp_path, streams, recons, 128, 64, clip.num_frames)


def test_gop_chunk_scan_matches_single_frames():
    """encode_gop_chunk's scanned frames must equal per-frame encodes, and
    the compact transport must round-trip levels + MVs."""
    clip = moving_clip(128, 64, 4, seed=41, dy=2, dx=4)
    q = 100
    y0 = clip.y[0].astype(np.int32)
    out0 = encode_intra_v(y0, clip.u[0].astype(np.int32),
                          clip.v[0].astype(np.int32), q)
    ref = np.concatenate([np.asarray(out0["recon_y"]).ravel(),
                          np.asarray(out0["recon_u"]).ravel(),
                          np.asarray(out0["recon_v"]).ravel()]).astype(
                              np.int32)
    frames = np.stack([fuse_planes(clip.y[k], clip.u[k], clip.v[k])
                       for k in range(1, 4)])
    bufs, final_ref = encode_gop_chunk(frames, ref, q, 64, 128)
    bufs = np.asarray(bufs)

    prev = (np.asarray(out0["recon_y"]), np.asarray(out0["recon_u"]),
            np.asarray(out0["recon_v"]))
    for k in range(3):
        o = {kk: np.asarray(val) for kk, val in encode_inter_v(
            clip.y[k + 1].astype(np.int32), clip.u[k + 1].astype(np.int32),
            clip.v[k + 1].astype(np.int32), *prev, q).items()}
        count, bitmap, vals, mv = split_compact_inter(bufs[k], 64, 128)
        assert count <= len(vals)
        ly, lu, lv = unpack_levels_inter(bitmap, vals, 64, 128)
        assert np.array_equal(ly, o["levels_y"])
        assert np.array_equal(lu, o["levels_u"])
        assert np.array_equal(lv, o["levels_v"])
        assert np.array_equal(mv, o["mv"])
        prev = (o["recon_y"], o["recon_u"], o["recon_v"])
    final = np.asarray(final_ref)
    assert np.array_equal(final[: 64 * 128].reshape(64, 128), prev[0])
