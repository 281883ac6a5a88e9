"""64-point transforms: the generic butterfly recursion must reproduce the
explicit ladders, and 64x64-block streams must decode bit-exactly."""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.spec import transforms as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")


def test_generic_recursion_reproduces_explicit_ladders():
    rng = np.random.RandomState(0)
    for n, ref in ((8, st.idct8), (16, st.idct16), (32, st.idct32)):
        x = rng.randint(-60000, 60000, size=(40, n)).astype(np.int64)
        assert np.array_equal(ref(x), st.idct_generic(x, n)), n


def test_64x64_blocks_decode_bit_exactly(tmp_path):
    """Engine encode with 64x64 leaves (TX_64X64 luma + 32x32 chroma,
    dequant shift 2, 32x32 coded area) vs both system decoders."""
    if not os.path.exists(TOOL):
        pytest.skip("av1_tool not built")
    import jax

    from av1tpu.spec import encode_frame as ef
    from av1tpu.spec.enums import V_PRED
    from av1tpu.spec.obu import write_ivf
    from av1tpu.spec.tile import FixedPartitionPlanner
    from av1tpu.utils import read_y4m, synthetic_clip

    clip = synthetic_clip(128, 128, 1, seed=4)
    pl = FixedPartitionPlanner(leaf_bsize=12, y_mode=V_PRED, uv_mode=V_PRED)
    stream, recon = ef.encode_keyframe(
        clip.y[0], clip.u[0], clip.v[0],
        ef.EncoderConfig(base_q_idx=100), planner=pl)
    ivf = str(tmp_path / "b64.ivf")
    y4m = str(tmp_path / "b64.y4m")
    write_ivf(ivf, [stream], 128, 128)
    for codec in ("libdav1d", "libaom-av1"):
        r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                           capture_output=True)
        assert r.returncode == 0, r.stderr.decode()
        d = read_y4m(y4m)
        for mine, theirs in zip(recon, (d.y[0], d.u[0], d.v[0])):
            assert np.array_equal(mine, theirs.astype(np.int64))
