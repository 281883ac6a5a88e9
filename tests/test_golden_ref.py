"""Two-reference (LAST + GOLDEN) conformance: inter frames that mix
per-block LAST and GOLDEN references must decode bit-exactly in BOTH
system decoders.  GOLDEN maps to slot 1, which holds the scene keyframe
(keyframes refresh all slots, inter frames only slot 0), giving every
inter frame a drift-free anchor — the structural lever behind the
reference anchor's lookahead/alt-ref operating point
(reference crates/daemon/src/encode/av1an.rs:14 --lookahead 40)."""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.spec import encode_frame as ef
from av1tpu.spec.enums import (
    DC_PRED, GLOBALMV, GOLDEN_FRAME, LAST_FRAME, NEWMV,
)
from av1tpu.spec.mv import find_mv_stack
from av1tpu.spec.obu import write_ivf
from av1tpu.spec.tile import FixedPartitionPlanner
from av1tpu.utils import read_y4m, synthetic_clip
from av1tpu.utils.yuv import Clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")

pytestmark = pytest.mark.skipif(not os.path.exists(TOOL),
                                reason="av1_tool not built")


class TwoRefPlanner(FixedPartitionPlanner):
    """Per-block LAST/GOLDEN choice: `pattern` selects which blocks use
    GOLDEN; the MV is signalled with the cheapest mode against the chosen
    ref's own stack."""

    def __init__(self, mv_last, mv_golden, pattern="checker", **kw):
        super().__init__(**kw)
        self.mv_last = mv_last
        self.mv_golden = mv_golden
        self.pattern = pattern

    def _use_golden(self, r, c):
        if self.pattern == "checker":
            return ((r // 4) + (c // 4)) % 2 == 0
        if self.pattern == "all":
            return True
        return False

    def inter_block(self, tc, r, c, bsize, stack):
        if self._use_golden(r, c):
            gstack = find_mv_stack(tc, r, c, bsize, GOLDEN_FRAME)
            return {"is_inter": True, "mode": NEWMV, "ref": GOLDEN_FRAME,
                    "mv": self.mv_golden, "ref_mv_idx": 0,
                    "stack": gstack}
        return {"is_inter": True, "mode": NEWMV, "ref": LAST_FRAME,
                "mv": self.mv_last, "ref_mv_idx": 0, "stack": stack}


def shifted_clip(w, h, n, dy, dx, seed):
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


def encode_two_ref(clip, planners, q=100):
    """Keyframe + inter frames where inter frame k uses planners[k-1];
    GOLDEN is always the keyframe recon."""
    cfg = ef.EncoderConfig(base_q_idx=q)
    s0, r = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                               planner=FixedPartitionPlanner(leaf_bsize=6))
    golden = r
    streams, recons = [s0], [r]
    for k, planner in enumerate(planners, start=1):
        s, r = ef.encode_interframe(clip.y[k], clip.u[k], clip.v[k], r,
                                    cfg, planner=planner,
                                    golden_recon=golden)
        streams.append(s)
        recons.append(r)
    return streams, recons


def check_decodes(tmp_path, clip, streams, recons):
    ivf = str(tmp_path / "tworef.ivf")
    y4m = str(tmp_path / "tworef.y4m")
    write_ivf(ivf, streams, clip.width, clip.height)
    for codec in ("libdav1d", "libaom-av1"):
        rr = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                            capture_output=True, text=True)
        assert rr.returncode == 0, (codec, rr.stderr[:200])
        d = read_y4m(y4m)
        assert d.num_frames == len(streams)
        for k in range(d.num_frames):
            for p, theirs in enumerate((d.y[k], d.u[k], d.v[k])):
                ours = recons[k][p][: theirs.shape[0], : theirs.shape[1]]
                assert np.array_equal(ours, theirs.astype(np.int64)), \
                    (codec, k, p)


def test_golden_checker_decodes_bit_exactly(tmp_path):
    """Frame 2+: half the blocks compensate from the keyframe (GOLDEN,
    accumulated motion), half from the previous frame (LAST)."""
    clip = shifted_clip(128, 96, 4, 2, 4, seed=31)
    planners = [
        # frame k: LAST moved (2,4) px since prev; GOLDEN (the keyframe)
        # moved k*(2,4) px
        TwoRefPlanner((16, 32), (16 * k, 32 * k), "checker", leaf_bsize=6)
        for k in range(1, 4)
    ]
    streams, recons = encode_two_ref(clip, planners)
    check_decodes(tmp_path, clip, streams, recons)


def test_golden_all_blocks(tmp_path):
    """Every block referencing GOLDEN: LAST is never used after frame 1,
    exercising the single_ref tree + GOLDEN-only neighbor contexts."""
    clip = shifted_clip(128, 96, 3, 2, 4, seed=32)
    planners = [
        TwoRefPlanner((16, 32), (16 * k, 32 * k), "all", leaf_bsize=6)
        for k in range(1, 3)
    ]
    streams, recons = encode_two_ref(clip, planners)
    check_decodes(tmp_path, clip, streams, recons)


def test_golden_mv_stack_isolation(tmp_path):
    """A GOLDEN block's MV stack must only see GOLDEN neighbors: runs a
    GOP where LAST and GOLDEN MVs differ wildly, so stack contamination
    would desync recon immediately."""
    clip = shifted_clip(128, 96, 3, 6, -4, seed=33)
    planners = [
        TwoRefPlanner((48 * 1, -32 * 1), (48 * k, -32 * k), "checker",
                      leaf_bsize=6)
        for k in range(1, 3)
    ]
    streams, recons = encode_two_ref(clip, planners)
    check_decodes(tmp_path, clip, streams, recons)


def test_golden_beats_last_chain_on_returning_content(tmp_path):
    """BD-rate rationale check: when content returns to the keyframe
    (A-B-A), GOLDEN compensation from the keyframe reconstructs frame 2
    better than chaining through the unrelated middle frame."""
    base = synthetic_clip(128, 96, 1, seed=34)
    noise = synthetic_clip(128, 96, 1, seed=99)
    clip = Clip(y=np.stack([base.y[0], noise.y[0], base.y[0]]),
                u=np.stack([base.u[0], noise.u[0], base.u[0]]),
                v=np.stack([base.v[0], noise.v[0], base.v[0]]))
    cfg = ef.EncoderConfig(base_q_idx=100)
    s0, key = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                                 planner=FixedPartitionPlanner(leaf_bsize=6))

    class ZeroRef(FixedPartitionPlanner):
        def __init__(self, ref):
            super().__init__(leaf_bsize=6)
            self.ref = ref

        def inter_block(self, tc, r, c, bsize, stack):
            if self.ref == GOLDEN_FRAME:
                stack = find_mv_stack(tc, r, c, bsize, GOLDEN_FRAME)
            return {"is_inter": True, "mode": GLOBALMV, "ref": self.ref,
                    "mv": tuple(stack.global_mv), "ref_mv_idx": 0,
                    "stack": stack}

    s1, r1 = ef.encode_interframe(clip.y[1], clip.u[1], clip.v[1], key,
                                  cfg, planner=ZeroRef(LAST_FRAME),
                                  golden_recon=key)
    s2g, r2g = ef.encode_interframe(clip.y[2], clip.u[2], clip.v[2], r1,
                                    cfg, planner=ZeroRef(GOLDEN_FRAME),
                                    golden_recon=key)
    s2l, r2l = ef.encode_interframe(clip.y[2], clip.u[2], clip.v[2], r1,
                                    cfg, planner=ZeroRef(LAST_FRAME),
                                    golden_recon=key)
    # GOLDEN path must be both smaller and at-least-as-close to source
    err_g = float(np.abs(r2g[0] - clip.y[2].astype(np.int64)).mean())
    err_l = float(np.abs(r2l[0] - clip.y[2].astype(np.int64)).mean())
    assert len(s2g) < len(s2l)
    assert err_g <= err_l
    # and the GOLDEN stream decodes bit-exactly
    check_decodes(tmp_path, clip, [s0, s1, s2g], [key, r1, r2g])
