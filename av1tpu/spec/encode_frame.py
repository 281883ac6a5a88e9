"""Assemble complete AV1 streams from the spec-model encoder.

This is the reference (host, numpy) encode path: intra keyframes, single
tile, filters off.  The TPU pipeline replaces the per-block DSP while reusing
the same headers and symbol syntax.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .bits import BitWriter
from .cdf_state import CdfState, DecCoder, EncCoder, load_cdfs, snapshot_cdfs
from .enums import BLOCK_16X16
from .headers import (
    FrameHeader, INTER_FRAME, SequenceHeader, write_frame_header_inter,
    write_frame_header_key, write_sequence_header,
)
from .obu import OBU_FRAME, OBU_SEQUENCE_HEADER, build_obu, temporal_delimiter
from .tile import FixedPartitionPlanner, Planner, TileCoder


@dataclasses.dataclass
class EncoderConfig:
    base_q_idx: int = 100
    leaf_bsize: int = BLOCK_16X16
    bit_depth: int = 8
    disable_cdf_update: int = 0
    tx_mode_select: int = 0  # 1 = TX_MODE_SELECT (per-block tx depth)
    loop_filter_level: tuple = (0, 0, 0, 0)
    loop_filter_sharpness: int = 0
    # CDEF (spec 7.15): cdef_bits = 0, one frame-wide strength preset.
    # Strengths are the coded header values (sec == 3 means 4).
    enable_cdef: int = 0
    cdef_damping: int = 3
    cdef_y_pri: int = 0
    cdef_y_sec: int = 0
    cdef_uv_pri: int = 0
    cdef_uv_sec: int = 0


def make_sequence_header(width: int, height: int,
                         cfg: EncoderConfig) -> SequenceHeader:
    seq = SequenceHeader()
    seq.seq_profile = 0
    seq.seq_level_idx = 8
    seq.frame_width_bits = max(width - 1, 1).bit_length()
    seq.frame_height_bits = max(height - 1, 1).bit_length()
    seq.max_frame_width = width
    seq.max_frame_height = height
    seq.bit_depth = cfg.bit_depth
    seq.enable_cdef = cfg.enable_cdef
    return seq


def make_frame_header(seq: SequenceHeader, cfg: EncoderConfig) -> FrameHeader:
    fh = FrameHeader()
    fh.width = seq.max_frame_width
    fh.height = seq.max_frame_height
    fh.render_width, fh.render_height = fh.width, fh.height
    fh.base_q_idx = cfg.base_q_idx
    fh.disable_cdf_update = cfg.disable_cdf_update
    fh.disable_frame_end_update_cdf = 1
    if cfg.tx_mode_select:
        from av1tpu.spec.headers import TX_MODE_SELECT
        fh.tx_mode = TX_MODE_SELECT
    fh.loop_filter_level = cfg.loop_filter_level
    fh.loop_filter_sharpness = cfg.loop_filter_sharpness
    if cfg.enable_cdef:
        fh.cdef_damping = cfg.cdef_damping
        fh.cdef_y_pri_strength = (cfg.cdef_y_pri,)
        fh.cdef_y_sec_strength = (cfg.cdef_y_sec,)
        fh.cdef_uv_pri_strength = (cfg.cdef_uv_pri,)
        fh.cdef_uv_sec_strength = (cfg.cdef_uv_sec,)
    return fh


def _pad_to(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.zeros((h, w), np.int32)
    ah, aw = arr.shape
    out[:ah, :aw] = arr
    if aw < w:
        out[:ah, aw:] = arr[:, -1:]
    if ah < h:
        out[ah:, :] = out[ah - 1 : ah, :]
    return out


def _maybe_deblock(seq, fh, tc, recon) -> None:
    """Apply the normative loop filter to the reconstruction (spec 7.14) —
    part of the coding loop: the decoder does the same, and inter frames
    reference the filtered planes."""
    if not any(fh.loop_filter_level):
        return
    from .deblock import deblock_frame
    deblock_frame(fh, seq, recon, tc.blk_r0, tc.blk_c0, tc.mi_sizes,
                  tc.skips, tc.is_inters, bit_depth=seq.bit_depth)


def _maybe_cdef(seq, fh, tc, recon) -> None:
    """Apply CDEF to the deblocked reconstruction (spec 7.15) — also part
    of the coding loop."""
    if not seq.enable_cdef:
        return
    from .cdef import cdef_frame
    out = cdef_frame(recon, tc.skips,
                     fh.cdef_y_pri_strength[0], fh.cdef_y_sec_strength[0],
                     fh.cdef_uv_pri_strength[0], fh.cdef_uv_sec_strength[0],
                     fh.cdef_damping, bit_depth=seq.bit_depth)
    for p in range(3):
        recon[p][:] = out[p]


def encode_keyframe(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                    cfg: EncoderConfig,
                    planner: Planner | None = None,
                    out_cdfs: list | None = None) -> tuple[bytes, list]:
    """Encode one intra frame; returns (obu_bytes_for_one_TU, recon_planes).

    y: (H, W) uint8/uint16; u/v: (H/2, W/2).  out_cdfs: optional list the
    end-of-frame CDF snapshot is appended to (the keyframe refreshes all
    slots, so a following inter frame with primary_ref_frame = 0 inits
    from this state); passing it sets disable_frame_end_update_cdf = 0."""
    height, width = y.shape
    seq = make_sequence_header(width, height, cfg)
    fh = make_frame_header(seq, cfg)
    if out_cdfs is not None:
        fh.disable_frame_end_update_cdf = 0
    if planner is None:
        planner = FixedPartitionPlanner(leaf_bsize=cfg.leaf_bsize)

    # pad planes to the mi grid
    mh, mw = fh.mi_rows * 4, fh.mi_cols * 4
    src = [
        _pad_to(y.astype(np.int32), mh, mw),
        _pad_to(u.astype(np.int32), mh // 2, mw // 2),
        _pad_to(v.astype(np.int32), mh // 2, mw // 2),
    ]
    recon = [np.zeros_like(p) for p in src]

    coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
    tc = TileCoder(seq, fh, coder, recon, source=src, planner=planner)
    tc.code_tile()
    if out_cdfs is not None:
        out_cdfs.append(snapshot_cdfs(tc.cdfs))
    _maybe_deblock(seq, fh, tc, recon)
    _maybe_cdef(seq, fh, tc, recon)
    tile_bytes = coder.done()

    bw = BitWriter()
    write_frame_header_key(seq, fh, bw)
    bw.byte_align()
    payload = bw.bytes() + tile_bytes

    stream = (
        temporal_delimiter()
        + build_obu(OBU_SEQUENCE_HEADER, write_sequence_header(seq))
        + build_obu(OBU_FRAME, payload)
    )
    return stream, recon


def make_frame_header_inter(seq: SequenceHeader,
                            cfg: EncoderConfig,
                            golden: bool = False,
                            refresh: bool = True) -> FrameHeader:
    """Inter frame header at this encoder's operating point: LAST = slot 0
    (the previous frame), refresh slot 0, CDFs reset per frame
    (PRIMARY_REF_NONE), reduced tx set (inter tx-type set 3).  golden:
    also map GOLDEN to slot 1 — the scene keyframe, which refreshes every
    slot (0xFF) and stays in slot 1 because inter frames only refresh
    slot 0.  refresh=False codes a NON-REFERENCE frame
    (refresh_frame_flags = 0): nothing it decodes enters any ref slot, so
    the 2-layer pyramid can spend fewer bits on it without chain
    drift."""
    fh = make_frame_header(seq, cfg)
    fh.frame_type = INTER_FRAME
    fh.refresh_frame_flags = 0x01 if refresh else 0x00
    fh.ref_frame_idx = ((0, 0, 0, 1, 0, 0, 0) if golden
                        else (0, 0, 0, 0, 0, 0, 0))
    fh.reduced_tx_set = 1
    return fh


def encode_interframe(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                      ref_recon: list, cfg: EncoderConfig,
                      planner: Planner | None = None,
                      prev_cdfs=None,
                      out_cdfs: list | None = None,
                      golden_recon: list | None = None
                      ) -> tuple[bytes, list]:
    """Encode one INTER frame against ref_recon (the previous frame's recon
    planes, mi-grid padded).  Returns (obu_bytes_for_one_TU, recon).

    prev_cdfs: the previous frame's end-of-frame CDF snapshot — sets
    primary_ref_frame = 0 (LAST) so entropy contexts carry across the GOP
    instead of resetting to defaults.  out_cdfs: optional list this frame's
    end snapshot is appended to (chains to the next frame).

    golden_recon: optional second reference (the scene keyframe's recon,
    slot 1) — blocks may then code ref=GOLDEN_FRAME (planner decides),
    the two-reference structure that counters drift accumulation down the
    LAST chain (the reference anchor's lookahead/alt-ref analog,
    reference crates/daemon/src/encode/av1an.rs:14 --lookahead 40)."""
    height, width = y.shape
    seq = make_sequence_header(width, height, cfg)
    fh = make_frame_header_inter(seq, cfg, golden=golden_recon is not None)
    if prev_cdfs is not None:
        fh.primary_ref_frame = 0
    if out_cdfs is not None:
        fh.disable_frame_end_update_cdf = 0
    if planner is None:
        planner = FixedPartitionPlanner(leaf_bsize=cfg.leaf_bsize)

    mh, mw = fh.mi_rows * 4, fh.mi_cols * 4
    src = [
        _pad_to(y.astype(np.int32), mh, mw),
        _pad_to(u.astype(np.int32), mh // 2, mw // 2),
        _pad_to(v.astype(np.int32), mh // 2, mw // 2),
    ]
    recon = [np.zeros_like(p) for p in src]

    cdfs = None
    if prev_cdfs is not None:
        cdfs = CdfState(fh.base_q_idx)
        load_cdfs(cdfs, prev_cdfs)
    refs = ref_recon
    if golden_recon is not None:
        from .enums import GOLDEN_FRAME, LAST_FRAME

        refs = {LAST_FRAME: ref_recon, GOLDEN_FRAME: golden_recon}
    coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
    tc = TileCoder(seq, fh, coder, recon, source=src, planner=planner,
                   ref_planes=refs, cdfs=cdfs)
    tc.code_tile()
    if out_cdfs is not None:
        out_cdfs.append(snapshot_cdfs(tc.cdfs))
    _maybe_deblock(seq, fh, tc, recon)
    _maybe_cdef(seq, fh, tc, recon)
    tile_bytes = coder.done()

    bw = BitWriter()
    write_frame_header_inter(seq, fh, bw)
    bw.byte_align()
    payload = bw.bytes() + tile_bytes
    stream = (temporal_delimiter()
              + build_obu(OBU_SEQUENCE_HEADER, write_sequence_header(seq))
              + build_obu(OBU_FRAME, payload))
    return stream, recon


def encode_gop(clip_y, clip_u, clip_v, cfg: EncoderConfig,
               planners=None) -> tuple[list[bytes], list]:
    """Encode frame 0 as a keyframe and the rest as inter frames, each
    referencing the previous frame's reconstruction.  planners: optional
    per-frame planner list.  Returns (streams, last_recon)."""
    streams = []
    recon = None
    for i in range(len(clip_y)):
        planner = planners[i] if planners else None
        if i == 0:
            s, recon = encode_keyframe(clip_y[i], clip_u[i], clip_v[i], cfg,
                                       planner=planner)
        else:
            s, recon = encode_interframe(clip_y[i], clip_u[i], clip_v[i],
                                         recon, cfg, planner=planner)
        streams.append(s)
    return streams, recon


def decode_keyframe_tile(stream_payload: bytes, seq: SequenceHeader,
                         fh: FrameHeader) -> list[np.ndarray]:
    """Decode a single-tile key frame payload (tile bytes only) with the
    symmetric engine — used for self round-trip tests."""
    mh, mw = fh.mi_rows * 4, fh.mi_cols * 4
    recon = [
        np.zeros((mh, mw), np.int32),
        np.zeros((mh // 2, mw // 2), np.int32),
        np.zeros((mh // 2, mw // 2), np.int32),
    ]
    coder = DecCoder(stream_payload,
                     disable_cdf_update=bool(fh.disable_cdf_update))
    tc = TileCoder(seq, fh, coder, recon)
    tc.code_tile()
    return recon
