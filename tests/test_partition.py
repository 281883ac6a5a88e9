"""32x32/16x16 partition RDO: TPU pipeline vs spec engine vs decoders."""

import os
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from av1tpu.models.intra_part import encode_intra_part
from av1tpu.spec import encode_frame as ef
from av1tpu.spec.enums import (
    BLOCK_16X16, BLOCK_32X32, PARTITION_NONE, PARTITION_SPLIT, V_PRED,
)
from av1tpu.spec.obu import write_ivf
from av1tpu.spec.tile import FixedPartitionPlanner
from av1tpu.utils import read_y4m, synthetic_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")


class PartGridPlanner(FixedPartitionPlanner):
    """Replays the TPU partition/mode/level decisions through the engine."""

    def __init__(self, out):
        super().__init__(leaf_bsize=6, y_mode=V_PRED, uv_mode=V_PRED)
        self.out = {k: np.asarray(v) for k, v in out.items()}

    def partition_choice(self, tc, r, c, bsize):
        if bsize > BLOCK_32X32:
            return (PARTITION_SPLIT if self.out["split64"][r // 16, c // 16]
                    else PARTITION_NONE)
        if bsize == BLOCK_32X32:
            return (PARTITION_SPLIT if self.out["split"][r // 8, c // 8]
                    else PARTITION_NONE)
        return PARTITION_NONE

    def modes(self, tc, r, c, bsize):
        if bsize > BLOCK_32X32:
            return V_PRED, V_PRED   # 64 candidates are V_PRED only
        if bsize == BLOCK_32X32:
            return int(self.out["modes32"][r // 8, c // 8]), V_PRED
        return int(self.out["modes16"][r // 4, c // 4]), V_PRED

    def quantize(self, tc, coefs_f, plane, tx, dc_q, ac_q, shift, x=0, y=0):
        if plane == 0:
            grid, n = {2: (self.out["levels_y64"], 64),
                       1: (self.out["levels_y32"], 32),
                       0: (self.out["levels_y16"], 16)}[shift]
        else:
            key = "levels_u" if plane == 1 else "levels_v"
            n = coefs_f.shape[0] if coefs_f.shape[0] != 32 else 32
            grid = self.out[f"{key}{n}"]
        lv = grid[y // n, x // n].astype(np.int64)
        if n == 64:  # coded 32x32 area scattered back into the 64x64 grid
            full = np.zeros((64, 64), np.int64)
            full[:32, :32] = lv
            return full
        return lv


@pytest.mark.parametrize("q", [60, 120])
def test_partition_packer_matches_engine(q):
    """C++ pack_tile_v3 must be byte-identical to the engine replay."""
    from av1tpu.coding import Packer
    from av1tpu.models.intra_part import (
        encode_intra_part_compact, split_compact_part,
    )
    from av1tpu.models.intra_v import fuse_planes
    from av1tpu.spec.cdf_state import EncCoder
    from av1tpu.spec.tile import TileCoder

    w, h = 192, 128
    clip = synthetic_clip(w, h, 1, seed=q + 3)
    y = clip.y[0].astype(np.int32)
    u = clip.u[0].astype(np.int32)
    v = clip.v[0].astype(np.int32)
    out = {k: np.asarray(val) for k, val in
           encode_intra_part(jnp.asarray(y), jnp.asarray(u),
                             jnp.asarray(v), q).items()}

    cfg = ef.EncoderConfig(base_q_idx=q)
    seq = ef.make_sequence_header(w, h, cfg)
    fh = ef.make_frame_header(seq, cfg)
    src = [y, u, v]
    recon = [np.zeros_like(p) for p in src]
    coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
    TileCoder(seq, fh, coder, recon, source=src,
              planner=PartGridPlanner(out)).code_tile()
    py_tile = coder.done()

    buf = np.asarray(encode_intra_part_compact(
        fuse_planes(y, u, v), q, h, w, cap=32768))
    count, bm, vals, m16, m32, split, split64 = split_compact_part(buf, h, w)
    assert count <= len(vals)
    assert np.array_equal(split.reshape(out["split"].shape),
                          out["split"].astype(np.int16))
    assert np.array_equal(split64.reshape(out["split64"].shape),
                          out["split64"].astype(np.int16))
    cpp_tile = Packer().pack_tile_part(bm, vals, m16, m32, split, split64,
                                       h, w, q)
    assert cpp_tile == py_tile


@pytest.mark.parametrize("q", [60, 120])
def test_partition_pipeline_matches_spec_and_decoders(tmp_path, q):
    clip = synthetic_clip(192, 128, 1, seed=q + 1)
    y = clip.y[0].astype(np.int32)
    u = clip.u[0].astype(np.int32)
    v = clip.v[0].astype(np.int32)
    out = encode_intra_part(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                            q)
    out = {k: np.asarray(val) for k, val in out.items()}
    split = out["split"]
    assert split[0].all(), "frame row 0 must be forced split"
    assert not split.all(), f"q={q}: expected some 32x32 choices"

    stream, recon = ef.encode_keyframe(
        clip.y[0], clip.u[0], clip.v[0],
        ef.EncoderConfig(base_q_idx=q), planner=PartGridPlanner(out))

    for k, r in zip(("recon_y", "recon_u", "recon_v"), recon):
        assert np.array_equal(out[k], r), k

    if not os.path.exists(TOOL):
        pytest.skip("av1_tool not built")
    ivf = str(tmp_path / "p.ivf")
    y4m = str(tmp_path / "p.y4m")
    write_ivf(ivf, [stream], clip.width, clip.height)
    for codec in ("libdav1d", "libaom-av1"):
        r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                           capture_output=True)
        assert r.returncode == 0, r.stderr.decode()
        d = read_y4m(y4m)
        for mine, theirs in zip(recon, (d.y[0], d.u[0], d.v[0])):
            assert np.array_equal(mine, theirs.astype(np.int64))
