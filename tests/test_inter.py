"""Inter-frame conformance: multi-frame GOPs (key + inter) produced by the
spec engine must decode bit-exactly (vs the encoder's own reconstruction) in
BOTH system decoders (libdav1d and libaom) — the same oracle that validated
the intra engine in round 1.

Covers: GLOBALMV with coded residuals at 16/32/64 leaf sizes (the inter
tx-type set-3 path), NEWMV with real motion (MV stack, MV component coding,
DRL), mixed GLOBALMV/NEWMV blocks, NEARESTMV reuse of stack candidates, and
intra blocks inside inter frames.

Replaces what the reference delegates to SVT-AV1's inter coding
(reference crates/daemon/src/encode/av1an.rs:14 --keyint 240).
"""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.spec import encode_frame as ef
from av1tpu.spec.enums import DC_PRED, GLOBALMV, NEARESTMV, NEWMV
from av1tpu.spec.obu import write_ivf
from av1tpu.spec.tile import FixedPartitionPlanner
from av1tpu.utils import read_y4m, synthetic_clip
from av1tpu.utils.yuv import Clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")

pytestmark = pytest.mark.skipif(not os.path.exists(TOOL),
                                reason="av1_tool not built")


class MvPlanner(FixedPartitionPlanner):
    """Fixed NEWMV target, optionally mixing modes per block."""

    def __init__(self, mv, pattern=None, **kw):
        super().__init__(**kw)
        self.mv = mv
        self.pattern = pattern

    def inter_block(self, tc, r, c, bsize, stack):
        if self.pattern == "checker" and ((r // 4) + (c // 4)) % 2 == 0:
            return {"is_inter": True, "mode": GLOBALMV,
                    "mv": stack.global_mv, "ref_mv_idx": 0, "stack": stack}
        if self.pattern == "intra" and ((r // 4) + (c // 4)) % 3 == 0:
            return {"is_inter": False, "y_mode": DC_PRED,
                    "uv_mode": DC_PRED, "stack": stack}
        if (self.pattern == "near" and stack.num_found >= 1
                and stack.stack[0] == self.mv):
            return {"is_inter": True, "mode": NEARESTMV,
                    "mv": stack.stack[0], "ref_mv_idx": 0, "stack": stack}
        return {"is_inter": True, "mode": NEWMV, "mv": self.mv,
                "ref_mv_idx": 0, "stack": stack}


def shifted_clip(w, h, n, dy, dx, seed):
    """n frames where frame k is the source window shifted k*(dy,dx) px."""
    big = synthetic_clip(w + 64, h + 64, 1, seed=seed)
    ys, us, vs = [], [], []
    for k in range(n):
        oy, ox = 32 - k * dy, 32 - k * dx
        ys.append(big.y[0][oy : oy + h, ox : ox + w].copy())
        us.append(big.u[0][oy // 2 : (oy + h) // 2,
                           ox // 2 : (ox + w) // 2].copy())
        vs.append(big.v[0][oy // 2 : (oy + h) // 2,
                           ox // 2 : (ox + w) // 2].copy())
    return Clip(y=np.stack(ys), u=np.stack(us), v=np.stack(vs))


def encode_and_check(tmp_path, clip, planner, nframes=3, q=100):
    cfg = ef.EncoderConfig(base_q_idx=q)
    s0, r = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                               planner=FixedPartitionPlanner(leaf_bsize=6))
    streams, recons = [s0], [r]
    for k in range(1, nframes):
        s, r = ef.encode_interframe(clip.y[k], clip.u[k], clip.v[k], r, cfg,
                                    planner=planner)
        streams.append(s)
        recons.append(r)
    ivf = str(tmp_path / "gop.ivf")
    y4m = str(tmp_path / "gop.y4m")
    write_ivf(ivf, streams, clip.width, clip.height)
    for codec in ("libdav1d", "libaom-av1"):
        rr = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                            capture_output=True, text=True)
        assert rr.returncode == 0, (codec, rr.stderr[:200])
        d = read_y4m(y4m)
        assert d.num_frames == nframes
        for k in range(nframes):
            for p, theirs in enumerate((d.y[k], d.u[k], d.v[k])):
                ours = recons[k][p][: theirs.shape[0], : theirs.shape[1]]
                assert np.array_equal(ours, theirs.astype(np.int64)), \
                    (codec, k, p)


@pytest.mark.parametrize("leaf", [6, 9, 12])
def test_globalmv_gop_decodes_bit_exactly(tmp_path, leaf):
    clip = synthetic_clip(64, 64, 3, seed=11)
    encode_and_check(tmp_path, clip,
                     FixedPartitionPlanner(leaf_bsize=leaf))


def test_globalmv_large_frame(tmp_path):
    clip = synthetic_clip(192, 128, 3, seed=13)
    encode_and_check(tmp_path, clip, FixedPartitionPlanner(leaf_bsize=6))


@pytest.mark.parametrize("mv,dy,dx", [
    ((16, 32), 2, 4),      # class-0 row, class-1 col magnitudes
    ((96, 64), 12, 8),     # larger classes
    ((-32, -16), -4, -2),  # negative components
])
def test_newmv_motion(tmp_path, mv, dy, dx):
    clip = shifted_clip(128, 96, 3, dy, dx, seed=21)
    encode_and_check(tmp_path, clip, MvPlanner(mv, leaf_bsize=6))


def test_mixed_newmv_globalmv(tmp_path):
    clip = shifted_clip(128, 96, 3, 2, 4, seed=22)
    encode_and_check(tmp_path, clip,
                     MvPlanner((16, 32), "checker", leaf_bsize=6))


def test_nearestmv_reuses_stack(tmp_path):
    clip = shifted_clip(128, 96, 3, 2, 4, seed=23)
    encode_and_check(tmp_path, clip,
                     MvPlanner((16, 32), "near", leaf_bsize=6))


def test_intra_blocks_in_inter_frame(tmp_path):
    clip = shifted_clip(128, 96, 3, 2, 4, seed=24)
    encode_and_check(tmp_path, clip,
                     MvPlanner((16, 32), "intra", leaf_bsize=6))


def test_inter_self_roundtrip():
    """Engine symmetry: the inter tile decodes through our own DecCoder to
    the identical reconstruction (table-independent check)."""
    from av1tpu.spec.cdf_state import DecCoder, EncCoder
    from av1tpu.spec.encode_frame import _pad_to
    from av1tpu.spec.tile import TileCoder

    clip = synthetic_clip(96, 64, 2, seed=5)
    cfg = ef.EncoderConfig(base_q_idx=100)
    _, r0 = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg)
    seq = ef.make_sequence_header(96, 64, cfg)
    fh = ef.make_frame_header_inter(seq, cfg)
    mh, mw = fh.mi_rows * 4, fh.mi_cols * 4
    src = [_pad_to(clip.y[1].astype(np.int32), mh, mw),
           _pad_to(clip.u[1].astype(np.int32), mh // 2, mw // 2),
           _pad_to(clip.v[1].astype(np.int32), mh // 2, mw // 2)]
    recon = [np.zeros_like(p) for p in src]
    coder = EncCoder()
    tc = TileCoder(seq, fh, coder, recon, source=src,
                   planner=FixedPartitionPlanner(leaf_bsize=6),
                   ref_planes=r0)
    tc.code_tile()
    tile = coder.done()

    drecon = [np.zeros_like(p) for p in src]
    tdc = TileCoder(seq, fh, DecCoder(tile), drecon, ref_planes=r0)
    tdc.code_tile()
    for p in range(3):
        assert np.array_equal(recon[p], drecon[p])
