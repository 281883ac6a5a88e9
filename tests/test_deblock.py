"""Normative deblocking (spec 7.14): engine-filtered reconstructions must
match libdav1d and libaom bit-exactly across filter sizes (4/8/14-tap luma,
4/6-tap chroma), sharpness values, block sizes, and inter GOPs where the
filtered recon feeds the reference chain."""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.spec import encode_frame as ef
from av1tpu.spec.obu import write_ivf
from av1tpu.spec.tile import FixedPartitionPlanner
from av1tpu.utils import read_y4m, synthetic_clip
from tests.test_inter import MvPlanner, shifted_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")

pytestmark = pytest.mark.skipif(not os.path.exists(TOOL),
                                reason="av1_tool not built")


def check(tmp_path, streams, recons, w, h):
    ivf = str(tmp_path / "t.ivf")
    y4m = str(tmp_path / "t.y4m")
    write_ivf(ivf, streams, w, h)
    for codec in ("libdav1d", "libaom-av1"):
        r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                           capture_output=True, text=True)
        assert r.returncode == 0, (codec, r.stderr[:200])
        d = read_y4m(y4m)
        for k in range(len(streams)):
            for p, theirs in enumerate((d.y[k], d.u[k], d.v[k])):
                ours = recons[k][p][: theirs.shape[0], : theirs.shape[1]]
                assert np.array_equal(ours, theirs.astype(np.int64)), \
                    (codec, k, p)


@pytest.mark.parametrize("leaf", [6, 9, 12])
@pytest.mark.parametrize("sharpness", [0, 3, 6])
def test_deblock_keyframe(tmp_path, leaf, sharpness):
    clip = synthetic_clip(192, 128, 1, seed=leaf * 10 + sharpness)
    cfg = ef.EncoderConfig(base_q_idx=140,
                           loop_filter_level=(40, 40, 30, 30),
                           loop_filter_sharpness=sharpness)
    s, recon = ef.encode_keyframe(
        clip.y[0], clip.u[0], clip.v[0], cfg,
        planner=FixedPartitionPlanner(leaf_bsize=leaf))
    check(tmp_path, [s], [recon], 192, 128)


@pytest.mark.parametrize("lvl", [(4, 4, 2, 2), (63, 63, 63, 63)])
def test_deblock_levels(tmp_path, lvl):
    clip = synthetic_clip(96, 64, 1, seed=5)
    cfg = ef.EncoderConfig(base_q_idx=120, loop_filter_level=lvl)
    s, recon = ef.encode_keyframe(
        clip.y[0], clip.u[0], clip.v[0], cfg,
        planner=FixedPartitionPlanner(leaf_bsize=6))
    check(tmp_path, [s], [recon], 96, 64)


def test_deblock_inter_gop(tmp_path):
    """The filtered recon is the next frame's reference — any filter
    mismatch compounds and fails the exact-match check."""
    clip = shifted_clip(128, 96, 3, 2, 4, seed=55)
    cfg = ef.EncoderConfig(base_q_idx=120,
                           loop_filter_level=(28, 28, 20, 20))
    s0, r0 = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                                planner=FixedPartitionPlanner(leaf_bsize=6))
    streams, recons = [s0], [r0]
    r = r0
    for k in (1, 2):
        s, r = ef.encode_interframe(clip.y[k], clip.u[k], clip.v[k], r,
                                    cfg, planner=MvPlanner((16, 32),
                                                           leaf_bsize=6))
        streams.append(s)
        recons.append(r)
    check(tmp_path, streams, recons, 128, 96)
