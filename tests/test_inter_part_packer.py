"""C++ pack_tile_inter_part must be byte-identical to the spec engine on
partitioned inter decisions, and full GOPs must decode in both decoders."""

import os

import numpy as np
import pytest

from av1tpu.coding import Packer
from av1tpu.models.inter_host import InterPartReplayPlanner
from av1tpu.models.inter_v import encode_inter_part
from av1tpu.models.intra_v import encode_intra_v
from av1tpu.spec import encode_frame as ef
from av1tpu.spec.cdf_state import EncCoder
from av1tpu.spec.tile import TileCoder
from tests.test_inter_pipeline import GridPlanner, check_decoders, moving_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")
LIB = os.path.join(REPO, "native", "build", "libav1pack.so")

pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="libav1pack not built")


def union_compact(o):
    """Host-side union-layout compact form from partitioned grids."""
    import jax.numpy as jnp
    from av1tpu.models.intra_part import _embed64, _merge_quads, _merge_tiles4
    y16 = _embed64(_merge_quads(jnp.asarray(o["lv16"]),
                                jnp.asarray(o["lv32"]), 16),
                   jnp.asarray(o["lv64"]))
    u8 = _merge_tiles4(_merge_quads(jnp.asarray(o["lu8"]),
                                    jnp.asarray(o["lu16"]), 8),
                       jnp.asarray(o["lu32"]), 8)
    v8 = _merge_tiles4(_merge_quads(jnp.asarray(o["lv8"]),
                                    jnp.asarray(o["lv16c"]), 8),
                       jnp.asarray(o["lv32c"]), 8)
    flat = np.concatenate([np.asarray(y16).ravel(), np.asarray(u8).ravel(),
                           np.asarray(v8).ravel()]).astype(np.int16)
    sig = flat != 0
    bitmap = np.packbits(sig, bitorder="little").view(np.uint16)
    return bitmap, flat[sig]


def python_tile(clip_k, ref_recon, o, q, w, h):
    cfg = ef.EncoderConfig(base_q_idx=q)
    seq = ef.make_sequence_header(w, h, cfg)
    fh = ef.make_frame_header_inter(seq, cfg)
    src = [clip_k[0].astype(np.int32), clip_k[1].astype(np.int32),
           clip_k[2].astype(np.int32)]
    recon = [np.zeros_like(p) for p in src]
    coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
    tc = TileCoder(seq, fh, coder, recon, source=src,
                   planner=InterPartReplayPlanner(o),
                   ref_planes=list(ref_recon))
    tc.code_tile()
    return coder.done(), recon


@pytest.mark.parametrize("seed,motion,q", [
    (81, (2, 4), 100), (82, (0, 0), 150), (83, (-6, 8), 70)])
def test_inter_part_packer_byte_identical(seed, motion, q):
    w, h = 192, 128
    clip = moving_clip(w, h, 3, seed, *motion)
    out0 = {k: np.asarray(v) for k, v in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}
    ref = (out0["recon_y"], out0["recon_u"], out0["recon_v"])
    packer = Packer()
    for k in range(1, 3):
        o = {kk: np.asarray(v) for kk, v in encode_inter_part(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32), *ref, q).items()}
        py_tile, _ = python_tile((clip.y[k], clip.u[k], clip.v[k]),
                                 ref, o, q, w, h)
        bitmap, vals = union_compact(o)
        cpp = packer.pack_tile_inter_part(bitmap, vals, o["split32"],
                                          o["split64"], o["mv8"], h, w, q,
                                          split16=o["split16"])
        assert cpp == py_tile, (k, len(cpp), len(py_tile))
        ref = (o["recon_y"], o["recon_u"], o["recon_v"])


def test_inter_part_packer_gop_decodes(tmp_path):
    from av1tpu.spec.bits import BitWriter
    from av1tpu.spec.headers import write_frame_header_inter
    from av1tpu.spec.obu import OBU_FRAME, build_obu, temporal_delimiter

    w, h = 192, 128
    clip = moving_clip(w, h, 4, seed=84, dy=2, dx=6)
    q = 110
    cfg = ef.EncoderConfig(base_q_idx=q)
    out0 = {k: np.asarray(v) for k, v in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}
    s0, recon0 = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                                    planner=GridPlanner(out0))
    streams, recons = [s0], [recon0]
    ref = (out0["recon_y"], out0["recon_u"], out0["recon_v"])
    packer = Packer()
    seq = ef.make_sequence_header(w, h, cfg)
    for k in range(1, 4):
        o = {kk: np.asarray(v) for kk, v in encode_inter_part(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32), *ref, q).items()}
        bitmap, vals = union_compact(o)
        tile = packer.pack_tile_inter_part(bitmap, vals, o["split32"],
                                           o["split64"], o["mv"], h, w, q)
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
