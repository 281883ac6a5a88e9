"""Bitstream conformance: streams from the spec-model encoder must be decoded
bit-exactly by the system AV1 decoders (dav1d and libaom via av1_tool).

This is the project's ground-truth gate (SURVEY.md section 7, step 2): the
encoder's reconstruction must match what any conforming decoder produces.
Requires native/build/av1_tool; tests skip if it is not built.
"""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.spec import encode_frame as ef
from av1tpu.spec.obu import write_ivf
from av1tpu.spec.tile import FixedPartitionPlanner
from av1tpu.utils import read_y4m, synthetic_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")

pytestmark = pytest.mark.skipif(
    not os.path.exists(TOOL), reason="native av1_tool not built"
)


def roundtrip(clip, q=100, leaf=6, ym=0, uvm=0, codecs=("libdav1d", "libaom-av1"),
              tmpdir="/tmp"):
    planner = FixedPartitionPlanner(leaf_bsize=leaf, y_mode=ym, uv_mode=uvm)
    stream, recon = ef.encode_keyframe(
        clip.y[0], clip.u[0], clip.v[0],
        ef.EncoderConfig(base_q_idx=q, leaf_bsize=leaf), planner=planner)
    ivf = os.path.join(tmpdir, "conf.ivf")
    y4m = os.path.join(tmpdir, "conf.y4m")
    write_ivf(ivf, [stream], clip.width, clip.height)
    for codec in codecs:
        r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                           capture_output=True, text=True)
        assert r.returncode == 0, f"{codec} rejected stream: {r.stderr[:200]}"
        d = read_y4m(y4m)
        for p, theirs in enumerate((d.y[0], d.u[0], d.v[0])):
            ours = recon[p][: theirs.shape[0], : theirs.shape[1]]
            assert np.array_equal(ours, theirs.astype(np.int64)), (
                f"{codec} plane {p} mismatch "
                f"(max {np.abs(ours - theirs.astype(np.int64)).max()})")
    return len(stream)


@pytest.mark.parametrize("q", [20, 21, 60, 61, 100, 120, 121, 200, 255])
def test_q_sweep(q, tmp_path):
    roundtrip(synthetic_clip(64, 64, 1, seed=q), q=q, tmpdir=str(tmp_path))


@pytest.mark.parametrize("leaf", [3, 6, 9])
def test_leaf_sizes(leaf, tmp_path):
    roundtrip(synthetic_clip(96, 96, 1, seed=leaf), leaf=leaf,
              tmpdir=str(tmp_path))


@pytest.mark.parametrize("wh", [(96, 64), (80, 48), (72, 40), (200, 120),
                                (320, 180)])
def test_odd_sizes(wh, tmp_path):
    w, h = wh
    roundtrip(synthetic_clip(w, h, 1, seed=w), tmpdir=str(tmp_path))


@pytest.mark.parametrize("modes", [(0, 0), (1, 2), (9, 9), (10, 11), (12, 12)])
def test_intra_modes(modes, tmp_path):
    ym, uvm = modes
    roundtrip(synthetic_clip(96, 64, 1, seed=ym * 16 + uvm), ym=ym, uvm=uvm,
              tmpdir=str(tmp_path))


def test_multiframe(tmp_path):
    clip = synthetic_clip(96, 64, 3, seed=77)
    streams = []
    recons = []
    for t in range(3):
        s, r = ef.encode_keyframe(clip.y[t], clip.u[t], clip.v[t],
                                  ef.EncoderConfig(base_q_idx=90))
        streams.append(s)
        recons.append(r)
    ivf = str(tmp_path / "mf.ivf")
    y4m = str(tmp_path / "mf.y4m")
    write_ivf(ivf, streams, clip.width, clip.height)
    r = subprocess.run([TOOL, "decode", ivf, y4m], capture_output=True)
    assert r.returncode == 0
    d = read_y4m(y4m)
    assert d.num_frames == 3
    for t in range(3):
        for p, theirs in enumerate((d.y[t], d.u[t], d.v[t])):
            ours = recons[t][p][: theirs.shape[0], : theirs.shape[1]]
            assert np.array_equal(ours, theirs.astype(np.int64))
