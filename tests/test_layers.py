"""2-layer low-delay pyramid (--layers 2): alternate frames are coded as
NON-REFERENCE (refresh_frame_flags = 0) at a coarser q; reference frames
code at temporal distance 2.  Conformance: both system decoders must
agree frame-for-frame on the decoded output (two independent decoders
matching is the oracle — non-ref recons never enter the encoder's chain,
so the usual recon-equality check does not apply to them).  Structure:
non-ref frames must be cheaper than reference frames on panning content.
Reference anchor: crates/daemon/src/encode/av1an.rs:14 --lookahead 40
(this is the low-delay half of that pyramid)."""

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


def _decode(ivf, y4m, codec):
    r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                       capture_output=True, text=True)
    assert r.returncode == 0, (codec, r.stderr[:300])
    return read_y4m(y4m)


def test_layered_gop_conformant_and_cheaper(tmp_path):
    clip = moving_clip(128, 96, 9, seed=81, dy=1, dx=3)
    q = 120
    streams, stats = encode_clip(clip, q, chunk=4, metric="psnr",
                                 partitions=True, scene_threshold=100.0,
                                 gop=True, layers=2, nr_q_delta=12)
    assert stats["keyframes"] == 1
    assert len(streams) == 9

    ivf = str(tmp_path / "l.ivf")
    write_ivf(ivf, streams, clip.width, clip.height)
    d1 = _decode(ivf, str(tmp_path / "a.y4m"), "libdav1d")
    d2 = _decode(ivf, str(tmp_path / "b.y4m"), "libaom-av1")
    assert d1.num_frames == d2.num_frames == 9
    for k in range(9):
        assert (d1.y[k] == d2.y[k]).all(), ("luma decoder mismatch", k)
        assert (d1.u[k] == d2.u[k]).all() and (d1.v[k] == d2.v[k]).all()
        # quality tracks the source on every frame, including non-refs
        dy_ = d1.y[k][: clip.height, : clip.width]
        err = np.mean((dy_.astype(np.float64)
                       - clip.y[k].astype(np.float64)) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / max(err, 1e-9))
        assert psnr > 28.0, (k, psnr)

    # frames 1,3,5,7 are non-ref (coarser q, no chain duty): cheaper on
    # average than the distance-2 reference frames 2,4,6,8
    nr = [len(streams[k]) for k in (1, 3, 5, 7)]
    rf = [len(streams[k]) for k in (2, 4, 6, 8)]
    assert np.mean(nr) < np.mean(rf), (nr, rf)


def test_layered_not_larger_than_single_layer(tmp_path):
    """At equal ref-frame q, the layered stream must not exceed the
    single-layer stream (non-refs only get cheaper)."""
    clip = moving_clip(128, 96, 8, seed=82, dy=0, dx=2)
    q = 120
    s1, _ = encode_clip(clip, q, chunk=4, metric="psnr", partitions=True,
                        scene_threshold=100.0, gop=True)
    s2, _ = encode_clip(clip, q, chunk=4, metric="psnr", partitions=True,
                        scene_threshold=100.0, gop=True, layers=2,
                        nr_q_delta=12)
    assert sum(map(len, s2)) <= sum(map(len, s1)) * 1.02
