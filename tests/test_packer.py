"""The production C++ tile packer must be byte-identical to the Python spec
engine, and its full streams must decode bit-exactly in the system decoders."""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.coding import Packer, encode_keyframe_tpu
from av1tpu.models.intra_v import encode_intra_v
from av1tpu.spec import encode_frame as ef
from av1tpu.spec.cdf_state import EncCoder
from av1tpu.spec.enums import V_PRED
from av1tpu.spec.obu import write_ivf
from av1tpu.spec.tile import FixedPartitionPlanner, TileCoder
from av1tpu.utils import read_y4m, synthetic_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")
LIB = os.path.join(REPO, "native", "build", "libav1pack.so")

pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="libav1pack not built")


class GridPlanner(FixedPartitionPlanner):
    def __init__(self, out):
        super().__init__(leaf_bsize=6, y_mode=V_PRED, uv_mode=V_PRED)
        self.out = out

    def quantize(self, tc, coefs_f, plane, tx, dc_q, ac_q, shift, x=0, y=0):
        n = 16 if plane == 0 else 8
        grid = self.out[("levels_y", "levels_u", "levels_v")[plane]]
        return np.asarray(grid[y // n, x // n]).astype(np.int64)


def _tpu_levels(w, h, q, seed):
    clip = synthetic_clip(w, h, 1, seed=seed)
    y = clip.y[0].astype(np.int32)
    u = clip.u[0].astype(np.int32)
    v = clip.v[0].astype(np.int32)
    out = {k: np.asarray(val) for k, val in encode_intra_v(y, u, v, q).items()}
    return clip, out


def _python_tile(clip, out, q):
    cfg = ef.EncoderConfig(base_q_idx=q)
    seq = ef.make_sequence_header(clip.width, clip.height, cfg)
    fh = ef.make_frame_header(seq, cfg)
    src = [clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
           clip.v[0].astype(np.int32)]
    recon = [np.zeros_like(p) for p in src]
    coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
    tc = TileCoder(seq, fh, coder, recon, source=src, planner=GridPlanner(out))
    tc.code_tile()
    return coder.done()


@pytest.mark.parametrize("w,h", [(128, 64), (64, 128), (192, 192)])
@pytest.mark.parametrize("q", [20, 100, 200])
def test_packer_matches_python_engine(w, h, q):
    clip, out = _tpu_levels(w, h, q, seed=w + h + q)
    py_tile = _python_tile(clip, out, q)
    cpp_tile = Packer().pack_tile(out["levels_y"], out["levels_u"],
                                  out["levels_v"], q)
    assert cpp_tile == py_tile


@pytest.mark.parametrize("q", [40, 100, 200])
def test_compact_path_matches_dense(q):
    import jax

    from av1tpu.models.intra_v import (
        encode_intra_v_compact, fuse_planes, split_compact,
    )

    w, h = 128, 128
    clip, out = _tpu_levels(w, h, q, seed=q)
    dense_tile = Packer().pack_tile(out["levels_y"], out["levels_u"],
                                    out["levels_v"], q)
    frame = fuse_planes(clip.y[0], clip.u[0], clip.v[0])
    buf = np.asarray(encode_intra_v_compact(frame, q, h, w, cap=8192,
                                            rdo=False))
    count, bm, vals, modes = split_compact(buf, h, w)
    assert count <= len(vals)
    assert count == int(np.concatenate(
        [np.asarray(out[k]).ravel() for k in
         ("levels_y", "levels_u", "levels_v")]).astype(bool).sum())
    assert np.all(np.asarray(modes) == 1)  # rdo off -> all V_PRED
    compact_tile = Packer().pack_tile_compact(bm, vals, h, w, q, modes=modes)
    assert compact_tile == dense_tile
    # modes=None must behave as all-V
    assert Packer().pack_tile_compact(bm, vals, h, w, q) == dense_tile


class ModeGridPlanner(GridPlanner):
    """Replays the TPU's per-block mode decisions through the spec engine."""

    def __init__(self, out):
        super().__init__(out)
        self.mode_grid = np.asarray(out["modes"])

    def modes(self, tc, r, c, bsize):
        return int(self.mode_grid[r // 4, c // 4]), V_PRED


@pytest.mark.parametrize("q", [60, 120])
def test_rdo_modes_end_to_end(tmp_path, q):
    """TPU mode RDO (V/D45/D67): engine recon equality, C++ packer byte
    equality, and decoder conformance."""
    import jax

    from av1tpu.models.intra_v import (
        encode_intra_v, encode_intra_v_compact, fuse_planes, split_compact,
    )
    from av1tpu.spec.obu import write_ivf
    from av1tpu.utils import read_y4m

    w, h = 192, 128
    clip = synthetic_clip(w, h, 1, seed=q + 7)
    y = clip.y[0].astype(np.int32)
    u = clip.u[0].astype(np.int32)
    v = clip.v[0].astype(np.int32)
    out = {k: np.asarray(val) for k, val in
           encode_intra_v(y, u, v, q, rdo=True).items()}
    used = set(np.unique(out["modes"]))
    assert used - {1, 3, 8} == set()
    assert len(used) > 1, "RDO should pick at least one directional mode"

    # engine replay: recon must match bit-exactly
    cfg = ef.EncoderConfig(base_q_idx=q)
    seq = ef.make_sequence_header(w, h, cfg)
    fh = ef.make_frame_header(seq, cfg)
    src = [y, u, v]
    recon = [np.zeros_like(p) for p in src]
    coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
    tc = TileCoder(seq, fh, coder, recon, source=src,
                   planner=ModeGridPlanner(out))
    tc.code_tile()
    py_tile = coder.done()
    for k, r in zip(("recon_y", "recon_u", "recon_v"), recon):
        assert np.array_equal(out[k], r), k

    # C++ packer byte equality through the compact transport
    frame = fuse_planes(y, u, v)
    buf = np.asarray(encode_intra_v_compact(frame, q, h, w, cap=16384))
    count, bm, vals, modes = split_compact(buf, h, w)
    assert np.array_equal(modes.reshape(out["modes"].shape), out["modes"])
    cpp_tile = Packer().pack_tile_compact(bm, vals, h, w, q, modes=modes)
    assert cpp_tile == py_tile

    # decoder conformance
    if not os.path.exists(TOOL):
        pytest.skip("av1_tool not built")
    stream = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                                planner=ModeGridPlanner(out))[0]
    ivf = str(tmp_path / "rdo.ivf")
    y4m = str(tmp_path / "rdo.y4m")
    write_ivf(ivf, [stream], w, h)
    for codec in ("libdav1d", "libaom-av1"):
        r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                           capture_output=True)
        assert r.returncode == 0, r.stderr.decode()
        d = read_y4m(y4m)
        for mine, theirs in zip(recon, (d.y[0], d.u[0], d.v[0])):
            assert np.array_equal(mine, theirs.astype(np.int64))


def test_packer_stream_decodes_in_system_decoders(tmp_path):
    if not os.path.exists(TOOL):
        pytest.skip("av1_tool not built")
    q = 100
    clip, out = _tpu_levels(192, 128, q, seed=3)
    stream = encode_keyframe_tpu(out, clip.width, clip.height, q)
    ivf = str(tmp_path / "t.ivf")
    y4m = str(tmp_path / "t.y4m")
    write_ivf(ivf, [stream], clip.width, clip.height)
    for codec in ("libdav1d", "libaom-av1"):
        r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                           capture_output=True)
        assert r.returncode == 0, r.stderr.decode()
        d = read_y4m(y4m)
        ours = (out["recon_y"], out["recon_u"], out["recon_v"])
        for mine, theirs in zip(ours, (d.y[0], d.u[0], d.v[0])):
            assert np.array_equal(np.asarray(mine), theirs.astype(np.int64))
