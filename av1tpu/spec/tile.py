"""Symmetric tile syntax engine (spec 5.11): one implementation of the intra
tile syntax driven in decode mode (reading a real bitstream, e.g. for
validation against libaom output) or encode mode (emitting our own stream,
with a Planner supplying the coding decisions).

The engine owns reconstruction: prediction, dequant, inverse transform and
context bookkeeping happen in coding order so encoder and decoder state match
symbol for symbol.  This is the framework's correctness reference; the TPU
pipeline precomputes decisions/coefficients and replays them through this
syntax (C++ coder for production).

Scope: intra (KEY/INTRA_ONLY) frames; partitions NONE/SPLIT/HORZ/VERT;
DC/V/H/SMOOTH*/PAETH modes; no palette/cfl/filter-intra/intrabc (the
sequence/frame headers we emit disable them; decoding a stream that uses
them raises NotImplementedError).
"""

from __future__ import annotations

import numpy as np

from . import tables
from .cdf_state import CdfState
from .enums import (
    BLOCK_8X8, BLOCK_H, BLOCK_W, DC_PRED, GLOBALMV, GOLDEN_FRAME,
    INTRA_MODE_CONTEXT,
    LAST_FRAME, MAX_TX_SIZE_RECT, MI_H, MI_H_LOG2, MI_W, MI_W_LOG2,
    MODE_TO_TXFM, NEARESTMV, NEARMV, NEWMV,
    PARTITION_HORZ, PARTITION_NONE, PARTITION_SPLIT, PARTITION_VERT,
    SIZE_GROUP, TX_32X32, TX_64X64, TX_H, TX_SET_INTER_3,
    TX_SET_INTER_3_TYPES, TX_SET_INTRA_1_TYPES, TX_SET_INTRA_2_TYPES,
    TX_SIZE_SQR, TX_SIZE_SQR_UP, TX_W, UV_CFL_PRED, DCT_DCT, default_scan,
    get_tx_set_inter, get_tx_set_intra, horz_subsize, split_subsize,
    tx_size_ctx, vert_subsize,
)
from .headers import (
    FrameHeader, INTER_FRAME, SequenceHeader, TX_MODE_LARGEST,
)
from .mv import code_mv, drl_ctx, find_mv_stack
from .predict import build_edges, predict_intra
from .transforms import forward_transform_2d, inverse_transform_2d, round2

PROB_TOP = 1 << 15

# chroma tx sizes are capped at 32 per dimension (av1_get_adjusted_tx_size)
_ADJUST_TX_32 = {4: 3, 11: 3, 12: 3, 17: 9, 18: 10}

# Sub_Tx_Size (one split step)
_SUB_TX = {1: 0, 2: 1, 3: 2, 4: 3, 5: 0, 6: 0, 7: 1, 8: 1, 9: 2, 10: 2,
           11: 3, 12: 3, 13: 5, 14: 6, 15: 7, 16: 8, 17: 9, 18: 10}


def _tx_size_cat(bsize: int) -> int:
    return min(TX_SIZE_SQR_UP[MAX_TX_SIZE_RECT[bsize]], TX_64X64) - 1


def _block_size_lookup(w_log2: int, h_log2: int) -> int:
    for bs in range(len(MI_W_LOG2)):
        if MI_W_LOG2[bs] == w_log2 and MI_H_LOG2[bs] == h_log2:
            return bs
    raise ValueError((w_log2, h_log2))


def chroma_bsize(bsize: int) -> int:
    """Plane block size for 4:2:0 chroma (get_plane_residual_size)."""
    wl = max(MI_W_LOG2[bsize] - 1, 0)
    hl = max(MI_H_LOG2[bsize] - 1, 0)
    return _block_size_lookup(wl, hl)


def _cdf_element_prob(icdf, e):
    prev = PROB_TOP if e == 0 else icdf[e - 1]
    return prev - icdf[e]


def _dq_shift(tx: int) -> int:
    sq_up = TX_SIZE_SQR_UP[tx]
    if sq_up == TX_64X64:
        return 2
    if sq_up == TX_32X32:
        return 1
    return 0


class Planner:
    """Encode-side decision provider.  Subclass for real encoders."""

    def partition_choice(self, tc, r, c, bsize) -> int:
        raise NotImplementedError

    def modes(self, tc, r, c, bsize) -> tuple[int, int]:
        return DC_PRED, DC_PRED

    def tx_type(self, tc, plane, tx, mode) -> int:
        return DCT_DCT

    def tx_depth(self, tc, r, c, bsize) -> int:
        """Uniform luma tx depth for an intra block (TX_MODE_SELECT):
        0 = largest, 1 = half, 2 = quarter (e.g. 16x16 -> TX_4X4)."""
        return 0

    def quantize(self, tc, coefs_f: np.ndarray, plane: int, tx: int,
                 dc_q: int, ac_q: int, shift: int, x: int = 0,
                 y: int = 0) -> np.ndarray:
        """Round-to-nearest against the effective dequant step q / 2^shift."""
        h, w = coefs_f.shape
        step = np.full((h, w), ac_q / (1 << shift), np.float64)
        step[0, 0] = dc_q / (1 << shift)
        lv = np.round(coefs_f / step).astype(np.int64)
        return np.clip(lv, -(1 << 15), (1 << 15) - 1)


class FixedPartitionPlanner(Planner):
    """Split to a fixed square leaf size; fixed intra modes."""

    def __init__(self, leaf_bsize: int = 6, y_mode: int = DC_PRED,
                 uv_mode: int = DC_PRED):
        self.leaf = leaf_bsize
        self.y_mode = y_mode
        self.uv_mode = uv_mode

    def partition_choice(self, tc, r, c, bsize) -> int:
        return PARTITION_NONE if bsize <= self.leaf else PARTITION_SPLIT

    def modes(self, tc, r, c, bsize):
        return self.y_mode, self.uv_mode

    def inter_block(self, tc, r, c, bsize, stack) -> dict:
        """Inter decision for one block.  Default: GLOBALMV (0,0)."""
        return {"is_inter": True, "mode": GLOBALMV,
                "mv": stack.global_mv, "ref_mv_idx": 0, "stack": stack}


class TileCoder:
    def __init__(self, seq: SequenceHeader, fh: FrameHeader, coder,
                 planes: list[np.ndarray], source=None,
                 planner: Planner | None = None,
                 mi_row_start=0, mi_row_end=None,
                 mi_col_start=0, mi_col_end=None,
                 ref_planes=None, cdfs=None):
        self.seq = seq
        self.fh = fh
        self.coder = coder
        self.planner = planner
        self.source = source  # [y, u, v] source planes (encode mode)
        self.encoding = coder.mode == "encode"
        self.inter_frame = fh.frame_type == INTER_FRAME
        # {ref_frame: [y, u, v]} recon planes; a bare [y, u, v] list means
        # LAST only (the single-ref low-delay chain)
        if ref_planes is not None and not isinstance(ref_planes, dict):
            ref_planes = {LAST_FRAME: ref_planes}
        self.ref_planes = ref_planes
        if self.inter_frame:
            assert ref_planes is not None, "inter tile needs a reference"
        # primary_ref_frame != NONE loads the referenced slot's saved CDFs
        # (passed in as `cdfs`) instead of the defaults (spec 7.20 / 5.9.2)
        self.cdfs = cdfs if cdfs is not None else CdfState(fh.base_q_idx)
        self.planes = planes  # [y, u, v] recon planes sized (mi*4 [>>sub])
        self.mi_rows = fh.mi_rows
        self.mi_cols = fh.mi_cols
        self.r0 = mi_row_start
        self.r1 = self.mi_rows if mi_row_end is None else mi_row_end
        self.c0 = mi_col_start
        self.c1 = self.mi_cols if mi_col_end is None else mi_col_end
        self.bd = seq.bit_depth
        self.pix_max = (1 << self.bd) - 1

        n_r, n_c = self.mi_rows, self.mi_cols
        self.y_modes = np.full((n_r, n_c), DC_PRED, np.int8)
        self.uv_modes = np.full((n_r, n_c), DC_PRED, np.int8)
        self.skips = np.zeros((n_r, n_c), np.int8)
        self.mi_sizes = np.zeros((n_r, n_c), np.int8)
        # block-origin grids (deblocking edge decisions, spec 7.14)
        self.blk_r0 = np.zeros((n_r, n_c), np.int32)
        self.blk_c0 = np.zeros((n_r, n_c), np.int32)
        # inter-frame neighbor state (MV stack + context sources)
        self.is_inters = np.zeros((n_r, n_c), np.int8)
        self.ref_frames = np.zeros((n_r, n_c), np.int8)  # 0 = intra
        self.mvs = np.zeros((n_r, n_c, 2), np.int32)     # 1/8-pel row,col
        self.has_newmvs = np.zeros((n_r, n_c), np.int8)
        self.above_part = np.zeros(n_c, np.int32)
        self.left_part = np.zeros(n_r, np.int32)
        # tx-size contexts (luma, coded tx width/height per mi unit)
        self.above_tx_w = np.full(n_c, 64, np.int32)
        self.left_tx_h = np.full(n_r, 64, np.int32)
        # coefficient contexts per plane, in plane 4-sample units
        self.above_lvl = [np.zeros(n_c + 8, np.int32) for _ in range(3)]
        self.left_lvl = [np.zeros(n_r + 8, np.int32) for _ in range(3)]
        self.above_dc = [np.zeros(n_c + 8, np.int32) for _ in range(3)]
        self.left_dc = [np.zeros(n_r + 8, np.int32) for _ in range(3)]

        q = fh.base_q_idx
        clip = lambda v: int(np.clip(v, 0, 255))
        self.plane_dc_q = [
            tables.dc_q(clip(q + fh.delta_q_y_dc), self.bd),
            tables.dc_q(clip(q + fh.delta_q_u_dc), self.bd),
            tables.dc_q(clip(q + fh.delta_q_v_dc), self.bd),
        ]
        self.plane_ac_q = [
            tables.ac_q(q, self.bd),
            tables.ac_q(clip(q + fh.delta_q_u_ac), self.bd),
            tables.ac_q(clip(q + fh.delta_q_v_ac), self.bd),
        ]

    # ------------------------------------------------------------------
    # top level
    # ------------------------------------------------------------------

    def code_tile(self):
        sb_mi = 32 if self.seq.use_128x128_superblock else 16
        sb_bsize = 15 if self.seq.use_128x128_superblock else 12
        for r in range(self.r0, self.r1, sb_mi):
            for c in range(self.c0, self.c1, sb_mi):
                self._clear_block_decoded(r, c, sb_mi)
                self.partition(r, c, sb_bsize)

    # ------------------------------------------------------------------
    # BlockDecoded flags (spec 5.11.3): per-superblock decoded map in plane
    # 4-sample units, driving above-right availability for directional modes
    # ------------------------------------------------------------------

    def _clear_block_decoded(self, r, c, sb_mi):
        self._sb_mi = (r, c)
        self._dec = []
        for plane in range(3):
            sub = 1 if plane else 0
            w4 = sb_mi >> sub
            f = np.zeros((w4 + 2, w4 + 2), np.int8)  # [-1..w4] each axis, +1
            f[0, :] = 1          # row above the SB: fully decoded territory
            f[: w4 + 1, 0] = 1   # col left of the SB, except y = sbH4
            self._dec.append(f)

    def _set_block_decoded(self, plane, x, y, tx):
        sub = 1 if plane else 0
        f = self._dec[plane]
        y0 = (y >> 2) - ((self._sb_mi[0] * 4) >> sub >> 2)
        x0 = (x >> 2) - ((self._sb_mi[1] * 4) >> sub >> 2)
        f[y0 + 1 : y0 + 1 + (TX_H[tx] >> 2),
          x0 + 1 : x0 + 1 + (TX_W[tx] >> 2)] = 1

    def _have_above_right(self, plane, x, y, tx):
        sub = 1 if plane else 0
        if x + TX_W[tx] >= ((self.c1 * 4) >> sub):
            return False  # above-right would start beyond the tile
        f = self._dec[plane]
        y0 = (y >> 2) - ((self._sb_mi[0] * 4) >> sub >> 2)
        x0 = (x >> 2) - ((self._sb_mi[1] * 4) >> sub >> 2)
        xq = x0 + (TX_W[tx] >> 2)
        if xq + 1 >= f.shape[1]:
            return False
        return bool(f[y0, xq + 1])

    def _have_below_left(self, plane, x, y, tx):
        """Below-left availability (the zone-3 directional modes'
        left-column extension): BlockDecoded at (y4 + h4, x4 - 1) —
        the mirror of _have_above_right."""
        sub = 1 if plane else 0
        if y + TX_H[tx] >= ((self.r1 * 4) >> sub):
            return False  # below-left would start beyond the tile
        f = self._dec[plane]
        y0 = (y >> 2) - ((self._sb_mi[0] * 4) >> sub >> 2)
        x0 = (x >> 2) - ((self._sb_mi[1] * 4) >> sub >> 2)
        yq = y0 + (TX_H[tx] >> 2)
        if yq + 1 >= f.shape[0]:
            return False
        return bool(f[yq + 1, x0])

    # ------------------------------------------------------------------
    # partition tree
    # ------------------------------------------------------------------

    def partition(self, r, c, bsize):
        if r >= self.r1 or c >= self.c1:
            return
        half = MI_W[bsize] >> 1
        has_rows = (r + half) < self.r1
        has_cols = (c + half) < self.c1
        bsl = MI_W_LOG2[bsize]
        ctx_idx = (bsl - 1) * 4 + self._part_ctx(r, c, bsl)
        cdf = self.cdfs.partition[ctx_idx]

        if has_rows and has_cols:
            if self.encoding:
                part = self.planner.partition_choice(self, r, c, bsize)
                self.coder.sym(cdf, part)
            else:
                part = self.coder.sym(cdf)
        elif has_cols:
            sym = self._edge_bool(cdf, bsize, horz_alike=False, r=r, c=c)
            part = PARTITION_SPLIT if sym else PARTITION_HORZ
        elif has_rows:
            sym = self._edge_bool(cdf, bsize, horz_alike=True, r=r, c=c)
            part = PARTITION_SPLIT if sym else PARTITION_VERT
        else:
            part = PARTITION_SPLIT

        if part == PARTITION_NONE:
            self.block(r, c, bsize)
            self._update_part_ctx(r, c, bsize, bsize)
        elif part == PARTITION_SPLIT:
            if bsize == BLOCK_8X8:
                # split of 8x8 -> four 4x4 blocks, no further syntax
                self.block(r, c, 0)
                self.block(r, c + 1, 0)
                self.block(r + 1, c, 0)
                self.block(r + 1, c + 1, 0)
                self._update_part_ctx(r, c, bsize, 0)
            else:
                sub = split_subsize(bsize)
                self.partition(r, c, sub)
                self.partition(r, c + half, sub)
                self.partition(r + half, c, sub)
                self.partition(r + half, c + half, sub)
        elif part == PARTITION_HORZ:
            sub = horz_subsize(bsize)
            self.block(r, c, sub)
            if has_rows:
                self.block(r + half, c, sub)
            self._update_part_ctx(r, c, bsize, sub)
        elif part == PARTITION_VERT:
            sub = vert_subsize(bsize)
            self.block(r, c, sub)
            if has_cols:
                self.block(r, c + half, sub)
            self._update_part_ctx(r, c, bsize, sub)
        else:
            raise NotImplementedError(f"partition type {part}")

    def _part_ctx(self, r, c, bsl):
        above = (int(self.above_part[c]) >> bsl) & 1 if r > self.r0 else 0
        left = (int(self.left_part[r]) >> bsl) & 1 if c > self.c0 else 0
        return left * 2 + above

    def _update_part_ctx(self, r, c, bsize, subsize):
        mi_w, mi_h = MI_W[bsize], MI_H[bsize]
        above_code = 64 - (1 << (MI_W_LOG2[subsize] + 1))
        left_code = 64 - (1 << (MI_H_LOG2[subsize] + 1))
        self.above_part[c : c + mi_w] = above_code
        self.left_part[r : r + mi_h] = left_code

    def _edge_bool(self, cdf, bsize, horz_alike: bool, r, c) -> int:
        """Forced-edge partition bool (spec split_or_horz / split_or_vert).

        horz_alike=False (bottom edge, HORZ vs SPLIT): subtract the
        probability of partitions with a vertical middle boundary is NOT it —
        mirrors libaom partition_gather_vert_alike / horz_alike."""
        icdf = cdf.icdf
        n = len(icdf)
        if horz_alike:  # right edge (VERT vs SPLIT): drop horizontal-ish
            drop = [PARTITION_HORZ, PARTITION_SPLIT, 4, 5, 6]
            if bsize != 15 and n > 8:
                drop.append(8)
        else:  # bottom edge (HORZ vs SPLIT): drop vertical-ish
            drop = [PARTITION_VERT, PARTITION_SPLIT, 4, 6, 7]
            if bsize != 15 and n > 9:
                drop.append(9)
        # gather: icdf[0] = sum of the dropped-set probabilities (validated
        # against dav1d on edge-partition streams; see tools/msac_trace.c)
        psum = 0
        for e in drop:
            if e < n:
                psum += _cdf_element_prob(icdf, e)
        bool_icdf = (min(max(psum, 4), PROB_TOP - 4), 0)
        if self.encoding:
            want = self.planner.partition_choice(self, r, c, bsize)
            sym = 1 if want == PARTITION_SPLIT else 0
            self.coder.ec.encode_symbol(sym, bool_icdf)
            return sym
        return self.coder.ec.decode_symbol(bool_icdf)

    # ------------------------------------------------------------------
    # block
    # ------------------------------------------------------------------

    def block(self, r, c, bsize):
        if self.inter_frame:
            self._inter_frame_block(r, c, bsize)
        else:
            self._key_frame_block(r, c, bsize)

    def _skip_cdf(self, r, c):
        skip_ctx = 0
        if r > self.r0:
            skip_ctx += int(self.skips[r - 1, c])
        if c > self.c0:
            skip_ctx += int(self.skips[r, c - 1])
        return self.cdfs.skip[skip_ctx]

    # ------------------------------------------------------------------
    # inter-frame block syntax (spec 5.11.15 inter_frame_mode_info)
    # ------------------------------------------------------------------

    def _intra_inter_ctx(self, r, c):
        has_above = r > self.r0
        has_left = c > self.c0
        if has_above and has_left:
            a_intra = not self.is_inters[r - 1, c]
            l_intra = not self.is_inters[r, c - 1]
            if a_intra and l_intra:
                return 3
            return int(a_intra or l_intra)
        if has_above or has_left:
            n = (r - 1, c) if has_above else (r, c - 1)
            return 2 * int(not self.is_inters[n])
        return 0

    def _neighbor_ref_counts(self, r, c):
        counts = [0] * 8
        if r > self.r0 and self.is_inters[r - 1, c]:
            counts[int(self.ref_frames[r - 1, c])] += 1
        if c > self.c0 and self.is_inters[r, c - 1]:
            counts[int(self.ref_frames[r, c - 1])] += 1
        return counts

    def _code_single_ref(self, r, c, ref=None):
        """Single-reference coding tree (spec read_ref_frames, single
        mode): LAST and GOLDEN are codable; LAST2/LAST3 and the backward
        refs stay out of this encoder's scope.  ref: the encoder's chosen
        reference (decode: None, returns the parsed one)."""
        cnt = self._neighbor_ref_counts(r, c)
        enc = self.encoding

        def ctx3(a, b):
            return 1 if a == b else (0 if a < b else 2)

        fwd = cnt[1] + cnt[2] + cnt[3] + cnt[4]
        bwd = cnt[5] + cnt[6] + cnt[7]
        b1 = self.coder.sym(self.cdfs.single_ref[ctx3(fwd, bwd)][0],
                            0 if enc else None)
        if b1:
            raise NotImplementedError("backward reference frames")
        b3 = self.coder.sym(
            self.cdfs.single_ref[ctx3(cnt[1] + cnt[2], cnt[3] + cnt[4])][2],
            int(ref == GOLDEN_FRAME) if enc else None)
        if b3:
            # single_ref_p5: LAST3 (0) vs GOLDEN (1)
            b5 = self.coder.sym(
                self.cdfs.single_ref[ctx3(cnt[3], cnt[4])][4],
                1 if enc else None)
            if not b5:
                raise NotImplementedError("LAST3 reference")
            return GOLDEN_FRAME
        b4 = self.coder.sym(self.cdfs.single_ref[ctx3(cnt[1], cnt[2])][3],
                            0 if enc else None)
        if b4:
            raise NotImplementedError("LAST2 reference")
        return LAST_FRAME

    def _code_inter_mode(self, stack, mode):
        c, coder = self.cdfs, self.coder
        if self.encoding:
            nm = int(mode != NEWMV)
            coder.sym(c.newmv[stack.new_mv_ctx], nm)
            if nm:
                zm = int(mode != GLOBALMV)
                coder.sym(c.zeromv[stack.zero_mv_ctx], zm)
                if zm:
                    coder.sym(c.refmv[stack.ref_mv_ctx],
                              int(mode != NEARESTMV))
            return mode
        if coder.sym(c.newmv[stack.new_mv_ctx]) == 0:
            return NEWMV
        if coder.sym(c.zeromv[stack.zero_mv_ctx]) == 0:
            return GLOBALMV
        if coder.sym(c.refmv[stack.ref_mv_ctx]) == 0:
            return NEARESTMV
        return NEARMV

    def _code_drl(self, stack, mode, ref_mv_idx):
        """DRL index (spec read_drl_idx); returns RefMvIdx."""
        n = stack.num_found
        if mode == NEWMV:
            out = 0
            for idx in range(2):
                if n > idx + 1:
                    ctx = drl_ctx(stack.weights, idx)
                    bit = (int(ref_mv_idx != idx) if self.encoding else None)
                    bit = self.coder.sym(self.cdfs.drl[ctx], bit)
                    if not bit:
                        return idx
                    out = idx + 1
            return out
        if mode == NEARMV:
            out = 0
            for idx in range(1, 3):
                if n > idx + 1:
                    ctx = drl_ctx(stack.weights, idx)
                    bit = (int(ref_mv_idx + 1 != idx)
                           if self.encoding else None)
                    bit = self.coder.sym(self.cdfs.drl[ctx], bit)
                    if not bit:
                        return idx - 1
                    out = idx
            return out
        return 0

    def _inter_frame_block(self, r, c, bsize):
        mi_w, mi_h = MI_W[bsize], MI_H[bsize]
        has_chroma = self._has_chroma(r, c, bsize)
        self._cur_tx = MAX_TX_SIZE_RECT[bsize]
        ref = LAST_FRAME

        if self.encoding:
            # the MV stack depends only on already-coded state, so encoder
            # and decoder compute it at the same point; the planner gets
            # the LAST stack (choosing ref=GOLDEN means it computed the
            # GOLDEN stack itself via find_mv_stack)
            stack = find_mv_stack(self, r, c, bsize, LAST_FRAME)
            dec = self.planner.inter_block(self, r, c, bsize, stack)
            is_inter = dec["is_inter"]
            ref = dec.get("ref", LAST_FRAME) if is_inter else LAST_FRAME
            if is_inter and ref != LAST_FRAME:
                stack = find_mv_stack(self, r, c, bsize, ref)
            mode = dec.get("mode", GLOBALMV)
            mv = dec.get("mv", (0, 0))
            ref_mv_idx = dec.get("ref_mv_idx", 0)
            y_mode = dec.get("y_mode", DC_PRED)
            uv_mode = dec.get("uv_mode", DC_PRED)
            planned = self._plan_residuals(
                r, c, bsize, y_mode, uv_mode, has_chroma,
                is_inter=is_inter, mv=mv, ref=ref)
            skip = int(all(t is None or t["eob"] == 0 for t in planned))
            self.coder.sym(self._skip_cdf(r, c), skip)
        else:
            planned = None
            skip = self.coder.sym(self._skip_cdf(r, c))

        ii_ctx = self._intra_inter_ctx(r, c)
        if self.encoding:
            self.coder.sym(self.cdfs.intra_inter[ii_ctx], int(is_inter))
        else:
            is_inter = bool(self.coder.sym(self.cdfs.intra_inter[ii_ctx]))

        if is_inter:
            if self.encoding:
                self._code_single_ref(r, c, ref)
            else:
                ref = self._code_single_ref(r, c)
                stack = find_mv_stack(self, r, c, bsize, ref)
                mode = None
                ref_mv_idx = 0
            mode = self._code_inter_mode(stack, mode)
            if mode in (NEWMV, NEARMV):
                ref_mv_idx = self._code_drl(
                    stack, mode, ref_mv_idx if self.encoding else None)
            if mode == NEWMV:
                pred = stack.stack[ref_mv_idx]
                mv = code_mv(self, pred, mv if self.encoding else None)
            elif mode == GLOBALMV:
                mv = stack.global_mv
            elif mode == NEARESTMV:
                mv = stack.stack[0]
            else:  # NEARMV
                # spec assign_mv: RefStackMv[RefMvIdx + 1]; the stack is
                # padded with global MVs to length >= 2, and ref_mv_idx > 0
                # is only codable when num_found > 2, so the index is always
                # in range — no clamp (ADVICE r2)
                mv = stack.stack[ref_mv_idx + 1]
            y_mode = uv_mode = DC_PRED
        else:
            mode = None
            mv = (0, 0)
            # intra in an inter frame: y_mode by size group, no kf contexts
            y_cdf = self.cdfs.y_mode[SIZE_GROUP[bsize]]
            if self.encoding:
                self.coder.sym(y_cdf, y_mode)
            else:
                y_mode = self.coder.sym(y_cdf)
            if self._is_directional(y_mode) and bsize >= BLOCK_8X8:
                self._angle_delta(y_mode)
            if has_chroma:
                cfl = int(BLOCK_W[bsize] <= 32 and BLOCK_H[bsize] <= 32)
                uv_cdf = self.cdfs.uv_mode[cfl][y_mode]
                if self.encoding:
                    self.coder.sym(uv_cdf, uv_mode)
                else:
                    uv_mode = self.coder.sym(uv_cdf)
                if uv_mode == UV_CFL_PRED:
                    raise NotImplementedError("CfL prediction")
                if self._is_directional(uv_mode) and bsize >= BLOCK_8X8:
                    self._angle_delta(uv_mode)
            else:
                uv_mode = DC_PRED

        self.y_modes[r : r + mi_h, c : c + mi_w] = y_mode
        self.uv_modes[r : r + mi_h, c : c + mi_w] = uv_mode
        self.skips[r : r + mi_h, c : c + mi_w] = skip
        self.mi_sizes[r : r + mi_h, c : c + mi_w] = bsize
        self.blk_r0[r : r + mi_h, c : c + mi_w] = r
        self.blk_c0[r : r + mi_h, c : c + mi_w] = c
        self.is_inters[r : r + mi_h, c : c + mi_w] = int(is_inter)
        self.ref_frames[r : r + mi_h, c : c + mi_w] = (
            ref if is_inter else 0)
        self.mvs[r : r + mi_h, c : c + mi_w] = mv
        self.has_newmvs[r : r + mi_h, c : c + mi_w] = int(mode == NEWMV)

        self._cur_tx = self._read_block_tx_size(r, c, bsize, skip)
        if skip:
            self.above_tx_w[c : c + mi_w] = BLOCK_W[bsize]
            self.left_tx_h[r : r + mi_h] = BLOCK_H[bsize]
        else:
            self.above_tx_w[c : c + mi_w] = TX_W[self._cur_tx]
            self.left_tx_h[r : r + mi_h] = TX_H[self._cur_tx]

        self._residual(r, c, bsize, y_mode, uv_mode, skip, has_chroma,
                       planned, is_inter=is_inter, mv=mv, ref=ref)

    # ------------------------------------------------------------------
    # key/intra-only frame block syntax
    # ------------------------------------------------------------------

    def _key_frame_block(self, r, c, bsize):
        mi_w, mi_h = MI_W[bsize], MI_H[bsize]
        if self.encoding:
            y_mode, uv_mode = self.planner.modes(self, r, c, bsize)
        else:
            y_mode = uv_mode = None

        skip_cdf = self._skip_cdf(r, c)

        has_chroma = self._has_chroma(r, c, bsize)
        self._cur_tx = MAX_TX_SIZE_RECT[bsize]  # refined after mode info
        if self.encoding:
            if self.fh.tx_mode == 2 and bsize != 0 and self.planner:
                # the planner's tx depth shapes the residual plan (txb
                # iteration, per-sub-block prediction); the matching
                # symbol is coded later by _read_block_tx_size
                for _ in range(int(self.planner.tx_depth(self, r, c,
                                                         bsize))):
                    self._cur_tx = _SUB_TX[self._cur_tx]
            planned = self._plan_residuals(r, c, bsize, y_mode, uv_mode,
                                           has_chroma)
            skip = int(all(t is None or t["eob"] == 0 for t in planned))
            self.coder.sym(skip_cdf, skip)
        else:
            skip = self.coder.sym(skip_cdf)
            planned = None

        above_mode = int(self.y_modes[r - 1, c]) if r > self.r0 else DC_PRED
        left_mode = int(self.y_modes[r, c - 1]) if c > self.c0 else DC_PRED
        kf_cdf = self.cdfs.kf_y_mode[INTRA_MODE_CONTEXT[above_mode]][
            INTRA_MODE_CONTEXT[left_mode]]
        if self.encoding:
            self.coder.sym(kf_cdf, y_mode)
        else:
            y_mode = self.coder.sym(kf_cdf)
        if self._is_directional(y_mode) and bsize >= BLOCK_8X8:
            self._angle_delta(y_mode)

        if has_chroma:
            cfl_allowed = int(BLOCK_W[bsize] <= 32 and BLOCK_H[bsize] <= 32)
            uv_cdf = self.cdfs.uv_mode[cfl_allowed][y_mode]
            if self.encoding:
                self.coder.sym(uv_cdf, uv_mode)
            else:
                uv_mode = self.coder.sym(uv_cdf)
            if uv_mode == UV_CFL_PRED:
                raise NotImplementedError("CfL prediction")
            if self._is_directional(uv_mode) and bsize >= BLOCK_8X8:
                self._angle_delta(uv_mode)
        else:
            uv_mode = DC_PRED

        self.y_modes[r : r + mi_h, c : c + mi_w] = y_mode
        self.uv_modes[r : r + mi_h, c : c + mi_w] = uv_mode
        self.skips[r : r + mi_h, c : c + mi_w] = skip
        self.mi_sizes[r : r + mi_h, c : c + mi_w] = bsize
        self.blk_r0[r : r + mi_h, c : c + mi_w] = r
        self.blk_c0[r : r + mi_h, c : c + mi_w] = c

        # luma tx size (spec read_block_tx_size; encoder uses TX_MODE_LARGEST)
        self._cur_tx = self._read_block_tx_size(r, c, bsize, skip)
        if skip:
            self.above_tx_w[c : c + mi_w] = BLOCK_W[bsize]
            self.left_tx_h[r : r + mi_h] = BLOCK_H[bsize]
        else:
            self.above_tx_w[c : c + mi_w] = TX_W[self._cur_tx]
            self.left_tx_h[r : r + mi_h] = TX_H[self._cur_tx]

        self._residual(r, c, bsize, y_mode, uv_mode, skip, has_chroma,
                       planned)

    def _is_directional(self, mode):
        return 1 <= mode <= 8

    def _angle_delta(self, mode):
        cdf = self.cdfs.angle_delta[mode - 1]
        if self.encoding:
            self.coder.sym(cdf, 3)  # angle delta 0
        else:
            if self.coder.sym(cdf) != 3:
                raise NotImplementedError("nonzero angle delta")

    def _has_chroma(self, r, c, bsize):
        if self.seq.mono_chrome:
            return False
        if MI_W[bsize] == 1 and (c & 1) == 0:
            return False
        if MI_H[bsize] == 1 and (r & 1) == 0:
            return False
        return True

    # ------------------------------------------------------------------
    # residual
    # ------------------------------------------------------------------

    def _read_block_tx_size(self, r, c, bsize, skip):
        # intra blocks code the tx depth whenever TX_MODE_SELECT, including
        # skipped blocks (the skip gate applies to inter blocks only)
        max_tx = MAX_TX_SIZE_RECT[bsize]
        if self.fh.tx_mode != 2 or bsize == 0:
            return max_tx
        cat = _tx_size_cat(bsize)
        max_w, max_h = TX_W[max_tx], TX_H[max_tx]
        has_above = r > self.r0
        has_left = c > self.c0
        a = int(self.above_tx_w[c] >= max_w)
        l = int(self.left_tx_h[r] >= max_h)
        if has_above and has_left:
            ctx = a + l
        elif has_above:
            ctx = a
        elif has_left:
            ctx = l
        else:
            ctx = 0
        if self.encoding:
            # planner-chosen uniform tx depth (spec: one depth per intra
            # block; every tx block predicts from its own local edges)
            depth = 0
            if self.planner is not None:
                depth = int(self.planner.tx_depth(self, r, c, bsize))
            self.coder.sym(self.cdfs.tx_size[cat][ctx], depth)
        else:
            depth = self.coder.sym(self.cdfs.tx_size[cat][ctx])
        tx = max_tx
        for _ in range(depth):
            tx = _SUB_TX[tx]
        return tx

    def _block_tx_size(self, plane, bsize):
        if plane == 0:
            return self._cur_tx
        tx = MAX_TX_SIZE_RECT[chroma_bsize(bsize)]
        return _ADJUST_TX_32.get(tx, tx)

    def _txb_iter(self, r, c, bsize, has_chroma):
        """Yield (plane, x, y, tx) for every coded transform block of the
        block, in bitstream order."""
        num_planes = 3 if has_chroma else 1
        for plane in range(num_planes):
            sub = 1 if plane else 0
            tx = self._block_tx_size(plane, bsize)
            tw4, th4 = TX_W[tx] >> 2, TX_H[tx] >> 2
            pb = chroma_bsize(bsize) if plane else bsize
            n4w, n4h = MI_W[pb], MI_H[pb]
            base_x = (c * 4) >> sub
            base_y = (r * 4) >> sub
            max_x = (self.mi_cols * 4) >> sub
            max_y = (self.mi_rows * 4) >> sub
            for ty in range(0, n4h, th4):
                for tx_i in range(0, n4w, tw4):
                    x = base_x + tx_i * 4
                    y = base_y + ty * 4
                    if x >= max_x or y >= max_y:
                        continue
                    yield plane, x, y, tx

    def _predict(self, plane, x, y, tx, mode):
        sub = 1 if plane else 0
        recon = self.planes[plane]
        w, h = TX_W[tx], TX_H[tx]
        have_above = y > ((self.r0 * 4) >> sub)
        have_left = x > ((self.c0 * 4) >> sub)
        have_ur = have_above and self._have_above_right(plane, x, y, tx)
        have_bl = have_left and self._have_below_left(plane, x, y, tx)
        above, left, corner = build_edges(
            recon, x, y, w, h, have_above, have_left, self.bd,
            have_above_right=have_ur, have_below_left=have_bl)
        return predict_intra(mode, above, left, corner, w, h,
                             have_above, have_left, self.bd)

    def _predict_inter(self, plane, x, y, tx, mv, ref_frame=LAST_FRAME):
        """Motion compensation from the chosen reference (spec 7.11.3
        block_inter_predict, translation-only): separable sub-pel
        interpolation (EIGHTTAP regular, the filter the headers signal;
        per spec 7.11.3.4 a prediction-block dimension <= 4 in this plane
        switches that direction to the 4-tap variant Subpel_Filters[3])
        with the normative two-stage rounding; reads are clamped to the
        frame bounds exactly as the normative predictor."""
        sub = 1 if plane else 0
        ref = self.ref_planes[ref_frame][plane]
        w, h = TX_W[tx], TX_H[tx]
        # plane-resolution sub-pel position: luma mv is 1/8-pel (even
        # 1/16ths); chroma samples are half-res, so the same vector has
        # full 1/16-pel resolution there
        if sub:
            iy, fy = mv[0] >> 4, mv[0] & 15
            ix, fx = mv[1] >> 4, mv[1] & 15
        else:
            iy, fy = mv[0] >> 3, (mv[0] & 7) << 1
            ix, fx = mv[1] >> 3, (mv[1] & 7) << 1
        fw = (self.fh.width + sub) >> sub
        fhh = (self.fh.height + sub) >> sub
        if fy == 0 and fx == 0:            # pure copy fast path
            rows = np.clip(np.arange(y + iy, y + iy + h), 0, fhh - 1)
            cols = np.clip(np.arange(x + ix, x + ix + w), 0, fw - 1)
            return ref[np.ix_(rows, cols)].astype(np.int64)
        banks = tables.subpel_filters()
        fxr = banks["regular_4" if w <= 4 else "regular"].astype(
            np.int64)[fx]
        fyr = banks["regular_4" if h <= 4 else "regular"].astype(
            np.int64)[fy]
        rows = np.clip(np.arange(y + iy - 3, y + iy + h + 4), 0, fhh - 1)
        cols = np.clip(np.arange(x + ix - 3, x + ix + w + 4), 0, fw - 1)
        patch = ref[np.ix_(rows, cols)].astype(np.int64)   # (h+7, w+7)
        hor = np.zeros((h + 7, w), np.int64)
        for k in range(8):
            hor += fxr[k] * patch[:, k : k + w]
        hor = round2(hor, 3)               # InterRound0 (8/10-bit)
        out = np.zeros((h, w), np.int64)
        for k in range(8):
            out += fyr[k] * hor[k : k + h, :]
        out = round2(out, 11)              # InterRound1, single reference
        return np.clip(out, 0, self.pix_max)

    def _plan_residuals(self, r, c, bsize, y_mode, uv_mode, has_chroma,
                        is_inter=False, mv=(0, 0), ref=LAST_FRAME):
        """Encoder pre-pass: predict, transform, quantize and reconstruct
        every txb of the block (recon is written so later txbs see correct
        edges).  Emission afterwards only codes symbols + contexts."""
        planned = []
        for plane, x, y, tx in self._txb_iter(r, c, bsize, has_chroma):
            mode = y_mode if plane == 0 else uv_mode
            if is_inter:
                pred = self._predict_inter(plane, x, y, tx, mv, ref)
            else:
                pred = self._predict(plane, x, y, tx, mode)
            w, h = TX_W[tx], TX_H[tx]
            src = self.source[plane][y : y + h, x : x + w].astype(np.int64)
            resid = src - pred
            if is_inter:
                ttype = DCT_DCT  # inter planner scope: DCT everywhere
            elif plane == 0:
                ttype = self.planner.tx_type(self, plane, tx, mode)
            else:
                ttype = self._chroma_tx_type(tx, mode)
            coefs_f = forward_transform_2d(resid, ttype)
            shift = _dq_shift(tx)
            levels = self.planner.quantize(
                self, coefs_f, plane, tx, self.plane_dc_q[plane],
                self.plane_ac_q[plane], shift, x=x, y=y)
            # zero out beyond the coded 32x32 area
            if w > 32:
                levels[:, 32:] = 0
            if h > 32:
                levels[32:, :] = 0
            # reconstruct
            dq = self._dequant(levels, plane, tx)
            recon_blk = np.clip(pred + inverse_transform_2d(dq, ttype),
                                0, self.pix_max)
            self.planes[plane][y : y + h, x : x + w] = recon_blk
            self._set_block_decoded(plane, x, y, tx)
            scan = default_scan(tx)
            cw = min(w, 32)
            lv_flat = levels[:min(h, 32), :cw].ravel()
            nz = np.nonzero(lv_flat[scan])[0]
            eob = int(nz[-1]) + 1 if len(nz) else 0
            planned.append({"plane": plane, "x": x, "y": y, "tx": tx,
                            "tx_type": ttype, "levels": levels, "eob": eob})
        return planned

    def _chroma_tx_type(self, tx, uv_mode):
        if TX_SIZE_SQR_UP[tx] > TX_32X32:
            return DCT_DCT
        ttype = MODE_TO_TXFM[uv_mode]
        tx_set = get_tx_set_intra(tx, self.fh.reduced_tx_set)
        allowed = ([DCT_DCT] if tx_set == 0 else
                   TX_SET_INTRA_1_TYPES if tx_set == 1 else
                   TX_SET_INTRA_2_TYPES)
        return ttype if ttype in allowed else DCT_DCT

    def _dequant(self, levels, plane, tx):
        h, w = levels.shape
        shift = _dq_shift(tx)
        q = np.full((h, w), self.plane_ac_q[plane], np.int64)
        q[0, 0] = self.plane_dc_q[plane]
        dq = levels.astype(np.int64) * q
        sign = np.sign(dq)
        dq = sign * ((np.abs(dq) & 0xFFFFFF) >> shift)
        return dq

    def _residual(self, r, c, bsize, y_mode, uv_mode, skip, has_chroma,
                  planned, is_inter=False, mv=(0, 0), ref=LAST_FRAME):
        idx = 0
        for plane, x, y, tx in self._txb_iter(r, c, bsize, has_chroma):
            mode = y_mode if plane == 0 else uv_mode
            pbsize = chroma_bsize(bsize) if plane else bsize
            if self.encoding:
                txb = planned[idx]
                idx += 1
                if skip:
                    self._set_coef_ctx(plane, x, y, tx, 0, 0)
                else:
                    self._code_coeffs(plane, x, y, tx, pbsize, mode,
                                      txb["tx_type"], txb["levels"],
                                      txb["eob"], is_inter=is_inter)
            else:
                if is_inter:
                    pred = self._predict_inter(plane, x, y, tx, mv, ref)
                else:
                    pred = self._predict(plane, x, y, tx, mode)
                w, h = TX_W[tx], TX_H[tx]
                if skip:
                    self._set_coef_ctx(plane, x, y, tx, 0, 0)
                    blk = np.clip(pred, 0, self.pix_max)
                else:
                    if is_inter:
                        # inter chroma follows the block's luma tx type
                        # (DCT in this encoder's scope); luma is coded
                        derived = DCT_DCT if plane else None
                    else:
                        derived = (None if plane == 0
                                   else self._chroma_tx_type(tx, mode))
                    levels, ttype = self._code_coeffs(
                        plane, x, y, tx, pbsize, mode, derived, None, None,
                        is_inter=is_inter)
                    dq = self._dequant(levels, plane, tx)
                    blk = np.clip(pred + inverse_transform_2d(dq, ttype),
                                  0, self.pix_max)
                self.planes[plane][y : y + h, x : x + w] = blk
                self._set_block_decoded(plane, x, y, tx)

    # ------------------------------------------------------------------
    # coefficients
    # ------------------------------------------------------------------

    def _set_coef_ctx(self, plane, x, y, tx, cul, dc_cat):
        x4, y4 = x >> 2, y >> 2
        w4, h4 = TX_W[tx] >> 2, TX_H[tx] >> 2
        self.above_lvl[plane][x4 : x4 + w4] = cul
        self.left_lvl[plane][y4 : y4 + h4] = cul
        self.above_dc[plane][x4 : x4 + w4] = dc_cat
        self.left_dc[plane][y4 : y4 + h4] = dc_cat

    def _txb_skip_ctx(self, plane, x, y, tx, pbsize):
        x4, y4 = x >> 2, y >> 2
        w4, h4 = TX_W[tx] >> 2, TX_H[tx] >> 2
        if plane == 0:
            if BLOCK_W[pbsize] == TX_W[tx] and BLOCK_H[pbsize] == TX_H[tx]:
                return 0
            top = min(int(self.above_lvl[0][x4 : x4 + w4].max()), 255)
            left = min(int(self.left_lvl[0][y4 : y4 + h4].max()), 255)
            if top == 0 and left == 0:
                return 1
            if top == 0 or left == 0:
                return 2 + (max(top, left) > 3)
            if max(top, left) <= 3:
                return 4
            if min(top, left) <= 3:
                return 5
            return 6
        above = int(self.above_lvl[plane][x4 : x4 + w4].any()
                    or self.above_dc[plane][x4 : x4 + w4].any())
        left = int(self.left_lvl[plane][y4 : y4 + h4].any()
                   or self.left_dc[plane][y4 : y4 + h4].any())
        return 7 + above + left

    @staticmethod
    def _base_ctx_offset(row, col, w, h):
        if row == 0 and col == 0:
            return 0
        if w > h and col < 2:
            return 16
        if h > w and row < 2:
            return 11
        s = row + col
        if s < 2:
            return 1
        if s < 4:
            return 6
        return 21

    def _code_tx_type(self, tx, mode, value):
        tx_set = get_tx_set_intra(tx, self.fh.reduced_tx_set)
        if tx_set == 0 or self.fh.base_q_idx == 0:
            return DCT_DCT
        types = TX_SET_INTRA_1_TYPES if tx_set == 1 else TX_SET_INTRA_2_TYPES
        cdf_tab = (self.cdfs.intra_ext_tx_1 if tx_set == 1
                   else self.cdfs.intra_ext_tx_2)
        cdf = cdf_tab[TX_SIZE_SQR[tx]][mode]
        if self.encoding:
            self.coder.sym(cdf, types.index(value))
            return value
        return types[self.coder.sym(cdf)]

    def _code_tx_type_inter(self, tx, value):
        tx_set = get_tx_set_inter(tx, self.fh.reduced_tx_set)
        if tx_set == 0 or self.fh.base_q_idx == 0:
            return DCT_DCT
        if tx_set != TX_SET_INTER_3:
            raise NotImplementedError(
                "inter tx sets 1/2 (use reduced_tx_set=1)")
        cdf = self.cdfs.inter_tx3[TX_SIZE_SQR[tx]]
        if self.encoding:
            self.coder.sym(cdf, TX_SET_INTER_3_TYPES.index(value))
            return value
        return TX_SET_INTER_3_TYPES[self.coder.sym(cdf)]

    def _code_coeffs(self, plane, x, y, tx, pbsize, mode, tx_type, levels,
                     eob, is_inter=False):
        """Symmetric coeffs() (spec 5.11.39).  Encode mode: levels/eob given.
        Decode mode: returns (levels, tx_type)."""
        w, h = TX_W[tx], TX_H[tx]
        cw, ch = min(w, 32), min(h, 32)
        txs_ctx = tx_size_ctx(tx)
        ptype = 1 if plane else 0
        c = self.cdfs

        ctx = self._txb_skip_ctx(plane, x, y, tx, pbsize)
        all_zero_cdf = c.txb_skip[txs_ctx][ctx]
        if self.encoding:
            all_zero = int(eob == 0)
            self.coder.sym(all_zero_cdf, all_zero)
        else:
            all_zero = self.coder.sym(all_zero_cdf)
        if all_zero:
            self._set_coef_ctx(plane, x, y, tx, 0, 0)
            if not self.encoding:
                return np.zeros((h, w), np.int64), DCT_DCT
            return

        if plane == 0:
            if is_inter:
                tx_type = self._code_tx_type_inter(tx, tx_type)
            else:
                tx_type = self._code_tx_type(tx, mode, tx_type)
        # (chroma tx type is derived, not coded)

        scan = default_scan(tx)
        n_coefs = cw * ch
        # eob_pt cdf slot for TX_CLASS_2D (determined by tracing dav1d: the
        # extracted 1024-coef table stores the 2D row first, smaller tables
        # store it second; the other slot belongs to 1D tx classes)
        is_1d_ctx = 0 if n_coefs == 1024 else 1

        if self.encoding:
            lv_grid = np.abs(levels[:ch, :cw])
            sign_grid = levels[:ch, :cw] < 0
            eob_pt = eob if eob <= 2 else (int(eob - 1).bit_length() + 1)
        else:
            lv_grid = np.zeros((ch, cw), np.int64)
            sign_grid = np.zeros((ch, cw), bool)
            eob_pt = None

        pt_cdf = c.eob_pt[n_coefs][ptype][is_1d_ctx]
        if self.encoding:
            self.coder.sym(pt_cdf, eob_pt - 1)
        else:
            eob_pt = self.coder.sym(pt_cdf) + 1

        if eob_pt <= 2:
            eob_v = eob_pt
        else:
            n_extra = eob_pt - 2
            base = (1 << (eob_pt - 2)) + 1
            rem = (eob - base) if self.encoding else 0
            bit = (rem >> (n_extra - 1)) & 1 if self.encoding else None
            extra_cdf = c.eob_extra[txs_ctx][ptype][eob_pt - 3]
            bit = self.coder.sym(extra_cdf, bit)
            eob_v = base + (bit << (n_extra - 1))
            for i in range(1, n_extra):
                sh = n_extra - 1 - i
                b = (rem >> sh) & 1 if self.encoding else None
                b = self.coder.literal(1, b)
                eob_v += b << sh
        if self.encoding:
            assert eob_v == eob, (eob_v, eob)
        eob = eob_v

        # padded level magnitudes for context reads
        lv_pad = np.zeros((ch + 2, cw + 2), np.int64)

        for ci in range(eob - 1, -1, -1):
            pos = int(scan[ci])
            row, col = pos // cw, pos % cw
            if ci == eob - 1:
                if ci == 0:
                    ectx = 0
                elif ci <= n_coefs // 8:
                    ectx = 1
                elif ci <= n_coefs // 4:
                    ectx = 2
                else:
                    ectx = 3
                cdf = c.coeff_base_eob[txs_ctx][ptype][ectx]
                if self.encoding:
                    full = int(lv_grid[row, col])
                    lv = min(full, 3)
                    self.coder.sym(cdf, lv - 1)
                else:
                    lv = self.coder.sym(cdf) + 1
            else:
                mag = (min(lv_pad[row, col + 1], 3)
                       + min(lv_pad[row + 1, col], 3)
                       + min(lv_pad[row + 1, col + 1], 3)
                       + min(lv_pad[row, col + 2], 3)
                       + min(lv_pad[row + 2, col], 3))
                bctx = min((int(mag) + 1) >> 1, 4) \
                    + self._base_ctx_offset(row, col, cw, ch)
                if pos == 0:
                    bctx = 0
                cdf = c.coeff_base[txs_ctx][ptype][bctx]
                if self.encoding:
                    full = int(lv_grid[row, col])
                    lv = min(full, 3)
                    self.coder.sym(cdf, lv)
                else:
                    lv = self.coder.sym(cdf)
            if lv > 2:
                brmag = (lv_pad[row, col + 1] + lv_pad[row + 1, col]
                         + lv_pad[row + 1, col + 1])
                brctx = min((int(brmag) + 1) >> 1, 6)
                if pos != 0:
                    brctx += 7 if (row < 2 and col < 2) else 14
                br_cdf = c.coeff_br[min(txs_ctx, 3)][ptype][brctx]
                for _ in range(4):
                    if self.encoding:
                        inc = min(full - lv, 3)
                        self.coder.sym(br_cdf, inc)
                        lv += inc
                        if inc < 3:
                            break
                    else:
                        b = self.coder.sym(br_cdf)
                        lv += b
                        if b < 3:
                            break
            if not self.encoding:
                lv_grid[row, col] = lv
            lv_pad[row, col] = min(lv if self.encoding
                                   else int(lv_grid[row, col]), 127)

        # signs and high-magnitude tails, forward order
        cul = 0
        dc_cat = 0
        for ci in range(eob):
            pos = int(scan[ci])
            row, col = pos // cw, pos % cw
            lv = int(lv_grid[row, col])
            if lv == 0:
                continue
            if ci == 0:
                dctx = self._dc_sign_ctx(plane, x, y, tx)
                sgn = self.coder.sym(c.dc_sign[ptype][dctx],
                                     int(sign_grid[row, col])
                                     if self.encoding else None)
            else:
                sgn = self.coder.literal(1, int(sign_grid[row, col])
                                         if self.encoding else None)
            if not self.encoding:
                sign_grid[row, col] = bool(sgn)
            if lv > 14:
                if self.encoding:
                    lv_full = lv
                    self._write_golomb(lv_full - 15)
                else:
                    lv_full = 15 + self._read_golomb()
                    lv_grid[row, col] = lv_full
                lv = lv_full
            if ci == 0:
                dc_cat = 2 if sgn else 1
            cul += lv
        cul = min(cul, 63)
        self._set_coef_ctx(plane, x, y, tx, cul, dc_cat)

        if not self.encoding:
            out = np.zeros((h, w), np.int64)
            out[:ch, :cw] = np.where(sign_grid, -lv_grid, lv_grid)
            return out, tx_type

    def _dc_sign_ctx(self, plane, x, y, tx):
        x4, y4 = x >> 2, y >> 2
        w4, h4 = TX_W[tx] >> 2, TX_H[tx] >> 2
        t = 0
        for v in self.above_dc[plane][x4 : x4 + w4]:
            t += 1 if v == 1 else (-1 if v == 2 else 0)
        for v in self.left_dc[plane][y4 : y4 + h4]:
            t += 1 if v == 1 else (-1 if v == 2 else 0)
        if t == 0:
            return 0
        return 2 if t > 0 else 1

    def _write_golomb(self, v):
        x = v + 1
        n = x.bit_length()
        for _ in range(n - 1):
            self.coder.literal(1, 0)
        for i in range(n - 1, -1, -1):
            self.coder.literal(1, (x >> i) & 1)

    def _read_golomb(self):
        z = 0
        while self.coder.literal(1) == 0:
            z += 1
            assert z < 24
        x = 1
        for _ in range(z):
            x = (x << 1) | self.coder.literal(1)
        return x - 1
