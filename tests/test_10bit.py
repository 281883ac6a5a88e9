"""10-bit (yuv420p10) encode support — the reference's quality anchor depth
(SVT-AV1 yuv420p10le, reference crates/daemon/src/encode/av1an.rs:87)."""

import os
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from av1tpu.models.intra_v import encode_intra_v
from av1tpu.spec import encode_frame as ef
from av1tpu.spec.enums import V_PRED
from av1tpu.spec.obu import write_ivf
from av1tpu.spec.tile import FixedPartitionPlanner
from av1tpu.utils import read_y4m, synthetic_clip

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


@pytest.mark.parametrize("q", [60, 140])
def test_10bit_pipeline_matches_spec_and_decoders(tmp_path, q):
    clip = synthetic_clip(128, 64, 1, seed=31, bit_depth=10)
    y = clip.y[0].astype(np.int32)
    u = clip.u[0].astype(np.int32)
    v = clip.v[0].astype(np.int32)
    assert int(y.max()) > 255, "fixture should exercise the 10-bit range"
    out = {k: np.asarray(val) for k, val in
           encode_intra_v(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), q,
                          bit_depth=10).items()}
    assert int(out["recon_y"].max()) > 255

    stream, recon = ef.encode_keyframe(
        clip.y[0], clip.u[0], clip.v[0],
        ef.EncoderConfig(base_q_idx=q, bit_depth=10),
        planner=GridPlanner(out))

    # TPU recon == engine recon at 10-bit
    for k, r in zip(("recon_y", "recon_u", "recon_v"), recon):
        assert np.array_equal(out[k], r), k

    if not os.path.exists(TOOL):
        pytest.skip("av1_tool not built")
    ivf = str(tmp_path / "t10.ivf")
    y4m = str(tmp_path / "t10.y4m")
    write_ivf(ivf, [stream], clip.width, clip.height)
    for codec in ("libdav1d", "libaom-av1"):
        r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert '"bit_depth": 10' in r.stdout
        d = read_y4m(y4m)
        assert d.bit_depth == 10
        for mine, theirs in zip(recon, (d.y[0], d.u[0], d.v[0])):
            assert np.array_equal(mine, theirs.astype(np.int64))
