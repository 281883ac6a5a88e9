"""End-to-end GOP encodes through encode_clip: keyframe + inter frames per
scene, decodable by both system decoders, with inter frames carrying most of
the compression (reference operating point: av1an --keyint 240,
crates/daemon/src/encode/av1an.rs:14)."""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.cli import encode_clip
from av1tpu.spec.obu import write_ivf
from av1tpu.utils import read_y4m
from tests.test_inter_pipeline import moving_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")

pytestmark = pytest.mark.skipif(not os.path.exists(TOOL),
                                reason="av1_tool not built")


@pytest.mark.parametrize("preset", ["fast", "quality"])
def test_gop_encode_decodes_and_saves_bits(tmp_path, preset):
    clip = moving_clip(128, 96, 8, seed=71, dy=2, dx=4)
    q = 120
    streams, stats = encode_clip(clip, q, chunk=4, metric="psnr",
                                 partitions=preset == "quality",
                                 scene_threshold=100.0, gop=True)
    assert stats["keyframes"] == 1
    assert len(streams) == 8
    if preset == "fast":
        # inter frames must be cheaper than the keyframe on a pure pan
        # (with partition RDO the keyframe is so small that fixed TU header
        # overhead dominates, so the comparison only holds for fast)
        key_bytes = len(streams[0])
        inter_bytes = [len(s) for s in streams[1:]]
        assert max(inter_bytes) < key_bytes

    ivf = str(tmp_path / "g.ivf")
    y4m = str(tmp_path / "g.y4m")
    write_ivf(ivf, streams, clip.width, clip.height)
    for codec in ("libdav1d", "libaom-av1"):
        r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                           capture_output=True, text=True)
        assert r.returncode == 0, (codec, r.stderr[:300])
        d = read_y4m(y4m)
        assert d.num_frames == 8
        # decoded result must track the source (coarse quality bound);
        # decoder output is the padded coded size -> crop to source dims
        for k in range(8):
            dy_ = d.y[k][: clip.height, : clip.width]
            err = np.mean((dy_.astype(np.float64)
                           - clip.y[k].astype(np.float64)) ** 2)
            psnr = 10 * np.log10(255.0 ** 2 / max(err, 1e-9))
            assert psnr > 28.0, (codec, k, psnr)


def test_gop_beats_all_intra_on_static_content(tmp_path):
    """A GOP encode of evenly-panning content (motion representable on the
    even-full-pel MV grid) must be much smaller than all-intra at the
    same q."""
    clip = moving_clip(128, 96, 8, seed=72, dy=0, dx=2)
    q = 120
    s_gop, _ = encode_clip(clip, q, chunk=4, metric="psnr",
                           partitions=False, scene_threshold=100.0,
                           gop=True)
    s_intra, _ = encode_clip(clip, q, chunk=4, metric="psnr",
                             partitions=False, scene_threshold=100.0,
                             gop=False)
    assert sum(map(len, s_gop)) < 0.6 * sum(map(len, s_intra))


def test_gop_multi_scene(tmp_path):
    """Two visually distinct scenes get two keyframes; streams decode."""
    a = moving_clip(128, 64, 5, seed=73, dy=1, dx=2)
    b = moving_clip(128, 64, 5, seed=99, dy=0, dx=3)
    from av1tpu.utils.yuv import Clip
    clip = Clip(y=np.concatenate([a.y, 255 - b.y]),
                u=np.concatenate([a.u, b.u]),
                v=np.concatenate([a.v, b.v]))
    streams, stats = encode_clip(clip, 120, chunk=4, metric="psnr",
                                 partitions=False, scene_threshold=2.5,
                                 gop=True)
    assert stats["keyframes"] >= 2
    ivf = str(tmp_path / "m.ivf")
    y4m = str(tmp_path / "m.y4m")
    write_ivf(ivf, streams, clip.width, clip.height)
    r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", "libdav1d"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[:300]
    assert read_y4m(y4m).num_frames == 10
