"""C++ packer two-reference (LAST/GOLDEN) support: with a per-block ref
grid the packed tile must be byte-identical to the Python spec engine
coding the same decisions, and full GOPs with mixed-ref inter frames must
decode bit-exactly in both system decoders."""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.coding import Packer
from av1tpu.models.inter_host import InterReplayPlanner
from av1tpu.models.inter_v import encode_inter_v
from av1tpu.models.intra_v import encode_intra_v
from av1tpu.spec import encode_frame as ef
from av1tpu.spec.cdf_state import EncCoder
from av1tpu.spec.enums import GOLDEN_FRAME, LAST_FRAME
from av1tpu.spec.obu import write_ivf
from av1tpu.spec.tile import TileCoder
from av1tpu.utils import read_y4m
from tests.test_inter_packer import compact_from_grids
from tests.test_inter_pipeline import GridPlanner, moving_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")
LIB = os.path.join(REPO, "native", "build", "libav1pack.so")

pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="libav1pack not built")


def _checker_refmap(h, w, golden_every=2):
    rows, cols = h // 16, w // 16
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    return np.where((rr + cc) % golden_every == 0, GOLDEN_FRAME,
                    LAST_FRAME).astype(np.int8)


def _python_tile_two_ref(clip_k, last, golden, o, ref_map, q, w, h):
    cfg = ef.EncoderConfig(base_q_idx=q)
    seq = ef.make_sequence_header(w, h, cfg)
    fh = ef.make_frame_header_inter(seq, cfg, golden=True)
    src = [clip_k[0].astype(np.int32), clip_k[1].astype(np.int32),
           clip_k[2].astype(np.int32)]
    recon = [np.zeros_like(p) for p in src]
    coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
    planner = InterReplayPlanner(o["mv"], o["levels_y"], o["levels_u"],
                                 o["levels_v"], ref_map=ref_map)
    tc = TileCoder(seq, fh, coder, recon, source=src, planner=planner,
                   ref_planes={LAST_FRAME: list(last),
                               GOLDEN_FRAME: list(golden)})
    tc.code_tile()
    return coder.done(), recon


def test_golden_packer_byte_identical():
    """Checkerboard LAST/GOLDEN refs: C++ tile == engine tile, byte for
    byte (ref tree symbols, ref-filtered MV stacks, mode choices)."""
    w, h = 128, 64
    clip = moving_clip(w, h, 3, 61, 2, 4)
    q = 100
    out0 = {k: np.asarray(v) for k, v in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}
    golden = (out0["recon_y"], out0["recon_u"], out0["recon_v"])
    ref = golden
    ref_map = _checker_refmap(h, w)
    packer = Packer()
    for k in range(1, 3):
        o = {kk: np.asarray(v) for kk, v in encode_inter_v(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32), *ref, q).items()}
        py_tile, recon = _python_tile_two_ref(
            (clip.y[k], clip.u[k], clip.v[k]), ref, golden, o, ref_map,
            q, w, h)
        bitmap, vals = compact_from_grids(o)
        cpp_tile = packer.pack_tile_inter(
            bitmap, vals, o["mv"], h, w, q,
            refs=(ref_map == GOLDEN_FRAME).astype(np.int16))
        assert cpp_tile == py_tile, (k, len(cpp_tile), len(py_tile))
        ref = tuple(recon)


def test_golden_packer_gop_decodes(tmp_path):
    """Keyframe + two mixed-ref inter frames, C++-packed, must decode
    bit-exactly (vs the engine recon) in dav1d and libaom."""
    from av1tpu.spec.bits import BitWriter
    from av1tpu.spec.headers import write_frame_header_inter
    from av1tpu.spec.obu import OBU_FRAME, build_obu, temporal_delimiter

    w, h = 128, 64
    clip = moving_clip(w, h, 3, seed=62, dy=2, dx=6)
    q = 100
    cfg = ef.EncoderConfig(base_q_idx=q)
    out0 = {k: np.asarray(v) for k, v in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}
    s0, recon0 = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                                    planner=GridPlanner(out0))
    golden = (out0["recon_y"], out0["recon_u"], out0["recon_v"])
    streams, recons = [s0], [recon0]
    ref = golden
    ref_map = _checker_refmap(h, w)
    packer = Packer()
    seq = ef.make_sequence_header(w, h, cfg)
    for k in range(1, 3):
        o = {kk: np.asarray(v) for kk, v in encode_inter_v(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32), *ref, q).items()}
        py_tile, recon = _python_tile_two_ref(
            (clip.y[k], clip.u[k], clip.v[k]), ref, golden, o, ref_map,
            q, w, h)
        bitmap, vals = compact_from_grids(o)
        tile = packer.pack_tile_inter(
            bitmap, vals, o["mv"], h, w, q,
            refs=(ref_map == GOLDEN_FRAME).astype(np.int16))
        assert tile == py_tile
        fh = ef.make_frame_header_inter(seq, cfg, golden=True)
        bw = BitWriter()
        write_frame_header_inter(seq, fh, bw)
        bw.byte_align()
        from av1tpu.spec.headers import write_sequence_header
        streams.append(
            temporal_delimiter()
            + build_obu(1, write_sequence_header(seq))  # OBU_SEQUENCE_HEADER
            + build_obu(OBU_FRAME, bw.bytes() + tile))
        recons.append(recon)
        ref = tuple(recon)

    ivf = str(tmp_path / "golden.ivf")
    y4m = str(tmp_path / "golden.y4m")
    write_ivf(ivf, streams, w, h)
    for codec in ("libdav1d", "libaom-av1"):
        rr = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                            capture_output=True, text=True)
        assert rr.returncode == 0, (codec, rr.stderr[:200])
        d = read_y4m(y4m)
        assert d.num_frames == 3
        for k in range(3):
            for p, theirs in enumerate((d.y[k], d.u[k], d.v[k])):
                ours = recons[k][p][: theirs.shape[0], : theirs.shape[1]]
                assert np.array_equal(ours, theirs.astype(np.int64)), \
                    (codec, k, p)
