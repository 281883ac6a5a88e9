"""The TPU intra pipeline must reproduce the spec model bit-exactly and its
streams must decode bit-exactly in the system decoders."""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.models.intra_v import encode_intra_v
from av1tpu.spec import encode_frame as ef
from av1tpu.spec.enums import V_PRED
from av1tpu.spec.obu import write_ivf
from av1tpu.spec.tile import FixedPartitionPlanner
from av1tpu.utils import read_y4m, synthetic_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")


class GridPlanner(FixedPartitionPlanner):
    """Feeds precomputed (TPU) levels through the spec engine."""

    def __init__(self, out):
        super().__init__(leaf_bsize=6, y_mode=V_PRED, uv_mode=V_PRED)
        self.out = out

    def quantize(self, tc, coefs_f, plane, tx, dc_q, ac_q, shift, x=0, y=0):
        n = 16 if plane == 0 else 8
        grid = self.out[("levels_y", "levels_u", "levels_v")[plane]]
        return np.asarray(grid[y // n, x // n]).astype(np.int64)


def test_tpu_pipeline_matches_spec_and_decoders(tmp_path):
    clip = synthetic_clip(96, 64, 1, seed=21)
    q = 100
    y = clip.y[0].astype(np.int32)
    u = clip.u[0].astype(np.int32)
    v = clip.v[0].astype(np.int32)
    out = {k: np.asarray(val) for k, val in
           encode_intra_v(y, u, v, q).items()}

    stream, recon = ef.encode_keyframe(
        clip.y[0], clip.u[0], clip.v[0],
        ef.EncoderConfig(base_q_idx=q), planner=GridPlanner(out))

    # TPU recon == engine recon (bit-exact)
    assert np.array_equal(out["recon_y"], recon[0])
    assert np.array_equal(out["recon_u"], recon[1])
    assert np.array_equal(out["recon_v"], recon[2])

    if not os.path.exists(TOOL):
        pytest.skip("av1_tool not built")
    ivf = str(tmp_path / "t.ivf")
    y4m = str(tmp_path / "t.y4m")
    write_ivf(ivf, [stream], clip.width, clip.height)
    for codec in ("libdav1d", "libaom-av1"):
        r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                           capture_output=True)
        assert r.returncode == 0
        d = read_y4m(y4m)
        for p, theirs in enumerate((d.y[0], d.u[0], d.v[0])):
            assert np.array_equal(recon[p][: theirs.shape[0], : theirs.shape[1]],
                                  theirs.astype(np.int64))
