"""8x8 inter leaves (split-16 quads, TX_8X8 luma / TX_4X4 chroma): the C++
packer must be byte-identical to the spec engine, and GOPs mixing 8/16/32/64
blocks must decode bit-exactly in dav1d and libaom.

The reference's anchor encoder (SVT-AV1 preset 3, reference
crates/daemon/src/encode/av1an.rs:14) partitions below 16x16 on motion
boundaries; this is the bitstream plumbing for the TPU pipeline's 8x8
stage (VERDICT round-2 "what's missing" #1 follow-up: the 16x16 MC grid
cannot straddle object boundaries).
"""

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
from tests.test_inter_part_packer import python_tile, union_compact
from tests.test_inter_pipeline import GridPlanner, check_decoders, moving_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")
LIB = os.path.join(REPO, "native", "build", "libav1pack.so")

pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="libav1pack not built")


def add_split8(o, rng, p_split=0.45):
    """Derive random-but-consistent 8x8 decisions on top of a 16/32/64
    partition plan: pick eligible 16-leaves to split, give each 8x8
    sub-block a jittered MV and sparse random levels, and embed the levels
    into the parent slots (union layout)."""
    r16, c16 = o["mv"].shape[:2]
    rep = lambda a, f: np.repeat(np.repeat(np.asarray(a, bool), f, 0), f, 1)
    # eligible: blocks coded as 16-leaves (inside split 32s of split 64s)
    eligible = rep(o["split64"], 4) & rep(o["split32"], 2)
    split16 = eligible & (rng.random((r16, c16)) < p_split)

    mv8 = np.repeat(np.repeat(o["mv"], 2, 0), 2, 1).astype(np.int32)
    # quarter-pel jitter: allow_high_precision_mv=0 codes even 1/8-pel
    # components only
    jit = 2 * rng.integers(-10, 11, size=mv8.shape, dtype=np.int32)
    m8 = rep(split16, 2)
    mv8 = np.where(m8[..., None], mv8 + jit, mv8)

    def sparse(shape, n, p):
        lv = rng.integers(-6, 7, size=shape).astype(np.int16)
        keep = rng.random(shape) < p
        # bias toward low frequencies: kill the high-freq half
        keep[..., n // 2:, :] = False
        return np.where(keep, lv, 0)

    r8, c8 = 2 * r16, 2 * c16
    lv8y = sparse((r8, c8, 8, 8), 8, 0.15)
    lu4 = sparse((r8, c8, 4, 4), 4, 0.2)
    lv4 = sparse((r8, c8, 4, 4), 4, 0.2)
    # some sub-blocks fully skipped
    dead = rng.random((r8, c8)) < 0.3
    for a in (lv8y, lu4, lv4):
        a[dead] = 0
    z = ~m8
    for a in (lv8y, lu4, lv4):
        a[z] = 0

    # union embed: parent 16-slot quadrants <- 8x8 levels; 8-slot <- 4x4
    def embed(parent, sub, n):
        q = (sub.reshape(r16, 2, c16, 2, n // 2, n // 2)
             .transpose(0, 2, 1, 4, 3, 5).reshape(r16, c16, n, n))
        return np.where(split16[..., None, None], q, parent)

    o = dict(o)
    o["lv16"] = embed(np.asarray(o["lv16"]), lv8y, 16)
    o["lu8"] = embed(np.asarray(o["lu8"]), lu4, 8)
    o["lv8"] = embed(np.asarray(o["lv8"]), lv4, 8)
    o["split16"] = split16.astype(np.int16)
    o["mv8"] = mv8
    o["lv8y"], o["lu4"], o["lv4"] = lv8y, lu4, lv4
    return o


@pytest.mark.parametrize("seed,motion,q", [
    (91, (2, 4), 100), (92, (0, 0), 150), (93, (-6, 8), 70)])
def test_inter8_packer_byte_identical(seed, motion, q):
    w, h = 192, 128
    clip = moving_clip(w, h, 3, seed, *motion)
    out0 = {k: np.asarray(v) for k, v in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}
    ref = (out0["recon_y"], out0["recon_u"], out0["recon_v"])
    packer = Packer()
    rng = np.random.default_rng(seed)
    for k in range(1, 3):
        o = {kk: np.asarray(v) for kk, v in encode_inter_part(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32), *ref, q).items()}
        o = add_split8(o, rng)
        py_tile, recon = python_tile((clip.y[k], clip.u[k], clip.v[k]),
                                     ref, o, q, w, h)
        bitmap, vals = union_compact(o)
        cpp = packer.pack_tile_inter_part(bitmap, vals, o["split32"],
                                          o["split64"], o["mv8"], h, w, q,
                                          split16=o["split16"])
        assert cpp == py_tile, (k, len(cpp), len(py_tile))
        ref = tuple(np.asarray(p) for p in recon)


def test_inter8_gop_decodes_with_carry(tmp_path):
    """Key + 3 inter frames with 8x8 splits and the CDF carry chain
    (primary_ref=LAST from the second inter frame): the C++ blob carry
    must equal the engine snapshot carry byte-for-byte — including the
    TX_4X4 eob/level tables only 8x8 blocks touch — and the streams must
    decode bit-exactly in dav1d and libaom."""
    from av1tpu.spec.bits import BitWriter
    from av1tpu.spec.cdf_state import CdfState, load_cdfs, snapshot_cdfs
    from av1tpu.spec.headers import write_frame_header_inter
    from av1tpu.spec.obu import OBU_FRAME, build_obu, temporal_delimiter

    w, h = 192, 128
    clip = moving_clip(w, h, 4, seed=94, dy=2, dx=6)
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
    blob = packer.new_cdf_blob()
    py_snap = None
    seq = ef.make_sequence_header(w, h, cfg)
    rng = np.random.default_rng(95)
    for k in range(1, 4):
        o = {kk: np.asarray(v) for kk, v in encode_inter_part(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32), *ref, q).items()}
        o = add_split8(o, rng)
        fh = ef.make_frame_header_inter(seq, cfg)
        fh.disable_frame_end_update_cdf = 0
        cdfs = None
        if py_snap is not None:
            fh.primary_ref_frame = 0
            cdfs = CdfState(q)
            load_cdfs(cdfs, py_snap)
        src = [clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
               clip.v[k].astype(np.int32)]
        rec = [np.zeros_like(p) for p in src]
        coder = EncCoder()
        tc = TileCoder(seq, fh, coder, rec, source=src,
                       planner=InterPartReplayPlanner(o),
                       ref_planes=list(ref), cdfs=cdfs)
        tc.code_tile()
        py_snap = snapshot_cdfs(tc.cdfs)
        py_tile = coder.done()

        bitmap, vals = union_compact(o)
        tile = packer.pack_tile_inter_part(bitmap, vals, o["split32"],
                                           o["split64"], o["mv8"], h, w, q,
                                           split16=o["split16"],
                                           cdf_in=blob if k > 1 else None,
                                           cdf_out=blob)
        assert tile == py_tile, (k, len(tile), len(py_tile))
        bw = BitWriter()
        write_frame_header_inter(seq, fh, bw)
        bw.byte_align()
        streams.append(temporal_delimiter()
                       + build_obu(OBU_FRAME, bw.bytes() + py_tile))
        ref = tuple(np.asarray(p) for p in rec)
        recons.append([np.asarray(p) for p in rec])
    if not os.path.exists(TOOL):
        pytest.skip("av1_tool not built")
    check_decoders(tmp_path, streams, recons, w, h, 4)
