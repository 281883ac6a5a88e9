"""The C++ inter tile packer must be byte-identical to the Python spec
engine on the TPU inter pipeline's decisions, and full GOP streams packed by
it must decode bit-exactly in the system decoders."""

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
from av1tpu.spec.obu import write_ivf
from av1tpu.spec.tile import TileCoder
from av1tpu.utils import read_y4m
from tests.test_inter_pipeline import GridPlanner, check_decoders, moving_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")
LIB = os.path.join(REPO, "native", "build", "libav1pack.so")

pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="libav1pack not built")


def compact_from_grids(o):
    """Host-side compact form (bitmap + vals) from inter level grids, the
    layout pack_tile_inter expects (y16 | u8 | v8, 16 coefs/word LSB)."""
    flat = np.concatenate([np.asarray(o["levels_y"]).reshape(-1),
                           np.asarray(o["levels_u"]).reshape(-1),
                           np.asarray(o["levels_v"]).reshape(-1)]).astype(
                               np.int16)
    sig = flat != 0
    bitmap = np.packbits(sig, bitorder="little").view(np.uint16)
    return bitmap, flat[sig]


def python_inter_tile(clip_k, ref_recon, o, q, w, h):
    cfg = ef.EncoderConfig(base_q_idx=q)
    seq = ef.make_sequence_header(w, h, cfg)
    fh = ef.make_frame_header_inter(seq, cfg)
    src = [clip_k[0].astype(np.int32), clip_k[1].astype(np.int32),
           clip_k[2].astype(np.int32)]
    recon = [np.zeros_like(p) for p in src]
    coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
    planner = InterReplayPlanner(o["mv"], o["levels_y"], o["levels_u"],
                                 o["levels_v"])
    tc = TileCoder(seq, fh, coder, recon, source=src, planner=planner,
                   ref_planes=list(ref_recon))
    tc.code_tile()
    return coder.done(), recon


@pytest.mark.parametrize("seed,motion", [(51, (3, 5)), (52, (0, 0)),
                                         (53, (-9, 13))])
def test_inter_packer_byte_identical(seed, motion):
    w, h = 128, 64
    clip = moving_clip(w, h, 3, seed, *motion)
    q = 100
    out0 = {k: np.asarray(val) for k, val in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}
    ref = (out0["recon_y"], out0["recon_u"], out0["recon_v"])
    packer = Packer()
    for k in range(1, 3):
        o = {kk: np.asarray(val) for kk, val in encode_inter_v(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32), *ref, q).items()}
        py_tile, _ = python_inter_tile(
            (clip.y[k], clip.u[k], clip.v[k]), ref, o, q, w, h)
        bitmap, vals = compact_from_grids(o)
        cpp_tile = packer.pack_tile_inter(bitmap, vals, o["mv"], h, w, q)
        assert cpp_tile == py_tile, (k, len(cpp_tile), len(py_tile))
        ref = (o["recon_y"], o["recon_u"], o["recon_v"])


def test_inter_packer_gop_decodes(tmp_path):
    """Full GOP: keyframe (engine) + C++-packed inter frames wrapped into
    TUs decode bit-exactly in dav1d and libaom."""
    from av1tpu.spec.bits import BitWriter
    from av1tpu.spec.headers import write_frame_header_inter
    from av1tpu.spec.obu import OBU_FRAME, build_obu, temporal_delimiter

    w, h = 128, 64
    clip = moving_clip(w, h, 4, seed=54, dy=2, dx=6)
    q = 100
    cfg = ef.EncoderConfig(base_q_idx=q)
    out0 = {k: np.asarray(val) for k, val in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}
    s0, recon0 = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                                    planner=GridPlanner(out0))
    streams = [s0]
    recons = [recon0]
    ref = (out0["recon_y"], out0["recon_u"], out0["recon_v"])
    packer = Packer()
    seq = ef.make_sequence_header(w, h, cfg)
    for k in range(1, 4):
        o = {kk: np.asarray(val) for kk, val in encode_inter_v(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32), *ref, q).items()}
        bitmap, vals = compact_from_grids(o)
        tile = packer.pack_tile_inter(bitmap, vals, o["mv"], h, w, q)
        fh = ef.make_frame_header_inter(seq, cfg)
        bw = BitWriter()
        write_frame_header_inter(seq, fh, bw)
        bw.byte_align()
        streams.append(temporal_delimiter()
                       + build_obu(OBU_FRAME, bw.bytes() + tile))
        ref = (o["recon_y"], o["recon_u"], o["recon_v"])
        recons.append([np.asarray(p) for p in ref])
    if not os.path.exists(TOOL):
        pytest.skip("av1_tool not built")
    check_decoders(tmp_path, streams, recons, w, h, 4)
