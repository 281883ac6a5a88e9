"""Motion-vector prediction and coding (spec 7.10.2 find_mv_stack and
5.11.31-34 mv syntax), single-reference path.

Scope matches the inter encoder's operating point: single ref frame (LAST),
no compound, no temporal MVs (sequence disables ref_frame_mvs), global
motion identity.  The stack construction mirrors the normative process
(scan row/col at -1/-3/-5, top-right and top-left points, nearest-weight
bump, extra single-ref fill, global-mv padding, clamping); conformance is
established behaviorally against libdav1d/libaom on multi-frame streams
(tests/test_inter.py) — the decoders reproduce our reconstruction
bit-exactly only if every context and predicted MV matches the spec.
"""

from __future__ import annotations

import numpy as np

from .enums import MI_H, MI_W

MV_BORDER = 128  # 1/8-pel units
REF_CAT_LEVEL = 640
MAX_REF_MV_STACK_SIZE = 8
MVREF_ROW_COLS = 3

MV_JOINT_ZERO = 0
MV_JOINT_HNZVZ = 1  # col nonzero
MV_JOINT_HZVNZ = 2  # row nonzero
MV_JOINT_HNZVNZ = 3

CLASS0_SIZE = 2
MV_MAX = (1 << 14) - 1  # spec mv magnitude bound (1/8 pel)


class MvStackResult:
    __slots__ = ("stack", "weights", "num_found", "new_mv_ctx",
                 "ref_mv_ctx", "zero_mv_ctx", "global_mv")

    def __init__(self):
        self.stack: list[tuple[int, int]] = []
        self.weights: list[int] = []
        self.num_found = 0
        self.new_mv_ctx = 0
        self.ref_mv_ctx = 0
        self.zero_mv_ctx = 0
        self.global_mv = (0, 0)


def drl_ctx(weights: list[int], idx: int) -> int:
    """spec Drl_Ctx: relative confidence of stack entries idx / idx+1."""
    if weights[idx] >= REF_CAT_LEVEL and weights[idx + 1] >= REF_CAT_LEVEL:
        return 0
    if weights[idx] >= REF_CAT_LEVEL and weights[idx + 1] < REF_CAT_LEVEL:
        return 1
    if weights[idx] < REF_CAT_LEVEL and weights[idx + 1] < REF_CAT_LEVEL:
        return 2
    return 0


class MvStackBuilder:
    """Builds the MV candidate stack for one block from tile neighbor state.

    The TileCoder exposes: mi_sizes, y_modes (inter modes included),
    ref_frames (int, 0 = intra/unset), mvs ((rows, cols, 2) int32 1/8-pel),
    is_inters, and tile bounds r0/r1/c0/c1.
    """

    def __init__(self, tc, r, c, bsize, ref_frame):
        self.tc = tc
        self.r = r
        self.c = c
        self.bsize = bsize
        self.ref_frame = ref_frame
        self.bw4 = MI_W[bsize]
        self.bh4 = MI_H[bsize]
        self.res = MvStackResult()
        self.new_mv_count = 0
        self.found_match = False

    # -- neighbor validity ------------------------------------------------

    def _is_inside(self, mv_row, mv_col):
        tc = self.tc
        return (tc.r0 <= mv_row < tc.r1 and tc.c0 <= mv_col < tc.c1)

    def _has_above(self):
        return self.r > self.tc.r0

    def _has_left(self):
        return self.c > self.tc.c0

    # -- candidate insertion ----------------------------------------------

    def _add_candidate(self, mv_row, mv_col, weight):
        tc = self.tc
        if not tc.is_inters[mv_row, mv_col]:
            return
        if int(tc.ref_frames[mv_row, mv_col]) != self.ref_frame:
            return
        cand_mv = (int(tc.mvs[mv_row, mv_col, 0]),
                   int(tc.mvs[mv_row, mv_col, 1]))
        res = self.res
        for idx, mv in enumerate(res.stack):
            if mv == cand_mv:
                res.weights[idx] += weight
                break
        else:
            if len(res.stack) < MAX_REF_MV_STACK_SIZE:
                res.stack.append(cand_mv)
                res.weights.append(weight)
        if tc.has_newmvs[mv_row, mv_col]:
            self.new_mv_count += 1
        self.found_match = True

    # -- scans --------------------------------------------------------------

    def _scan_row(self, delta_row, max_row_offset, processed_rows):
        tc = self.tc
        bw4 = self.bw4
        end4 = min(min(bw4, tc.c1 - self.c), 16)
        delta_col = 0
        use_step_16 = bw4 >= 16
        if abs(delta_row) > 1:
            delta_row += self.r & 1
            delta_col = 1 - (self.c & 1)
        i = 0
        new_processed = processed_rows
        while i < end4:
            mv_row = self.r + delta_row
            mv_col = self.c + delta_col + i
            if not self._is_inside(mv_row, mv_col):
                break
            cand_size = int(tc.mi_sizes[mv_row, mv_col])
            n4w = MI_W[cand_size]
            length = min(bw4, n4w)
            if use_step_16:
                length = max(4, length)
            elif abs(delta_row) > 1:
                length = max(2, length)
            weight = 2
            if bw4 >= 2 and bw4 <= n4w:
                inc = min(-max_row_offset + delta_row + 1,
                          MI_H[cand_size])
                weight = max(weight, inc)
                new_processed = max(new_processed, inc - delta_row - 1)
            self._add_candidate(mv_row, mv_col, length * weight)
            i += length
        return new_processed

    def _scan_col(self, delta_col, max_col_offset, processed_cols):
        tc = self.tc
        bh4 = self.bh4
        end4 = min(min(bh4, tc.r1 - self.r), 16)
        delta_row = 0
        use_step_16 = bh4 >= 16
        if abs(delta_col) > 1:
            delta_row = 1 - (self.r & 1)
            delta_col += self.c & 1
        i = 0
        new_processed = processed_cols
        while i < end4:
            mv_row = self.r + delta_row + i
            mv_col = self.c + delta_col
            if not self._is_inside(mv_row, mv_col):
                break
            cand_size = int(tc.mi_sizes[mv_row, mv_col])
            n4h = MI_H[cand_size]
            length = min(bh4, n4h)
            if use_step_16:
                length = max(4, length)
            elif abs(delta_col) > 1:
                length = max(2, length)
            weight = 2
            if bh4 >= 2 and bh4 <= n4h:
                inc = min(-max_col_offset + delta_col + 1,
                          MI_W[cand_size])
                weight = max(weight, inc)
                new_processed = max(new_processed, inc - delta_col - 1)
            self._add_candidate(mv_row, mv_col, length * weight)
            i += length
        return new_processed

    def _scan_point(self, delta_row, delta_col):
        mv_row = self.r + delta_row
        mv_col = self.c + delta_col
        if not self._is_inside(mv_row, mv_col):
            return
        if not self.tc.is_inters[mv_row, mv_col] and \
                self.tc.ref_frames[mv_row, mv_col] == 0:
            # candidate must hold coded mode info; unset mi (beyond coded
            # area) is excluded by is_inside, intra handled in _add
            pass
        self._add_candidate(mv_row, mv_col, 4)

    # -- extra single-ref fill ----------------------------------------------

    def _add_extra_candidate(self, mv_row, mv_col):
        tc = self.tc
        if not tc.is_inters[mv_row, mv_col]:
            return
        # single list: candidates regardless of ref frame, no sign bias
        # (order hints disabled -> all biases equal)
        cand_mv = (int(tc.mvs[mv_row, mv_col, 0]),
                   int(tc.mvs[mv_row, mv_col, 1]))
        res = self.res
        if len(res.stack) >= 2:
            return
        for mv in res.stack:
            if mv == cand_mv:
                return
        res.stack.append(cand_mv)
        res.weights.append(2)

    def _extra_search(self):
        tc = self.tc
        for pass_idx in range(2):
            if pass_idx == 0:
                if not self._has_above():
                    continue
                delta_row, delta_col = -1, 0
                w4 = min(min(self.bw4, tc.c1 - self.c), 16)
                i = 0
                while i < w4 and len(self.res.stack) < 2:
                    mv_row = self.r + delta_row
                    mv_col = self.c + delta_col + i
                    if not self._is_inside(mv_row, mv_col):
                        break
                    self._add_extra_candidate(mv_row, mv_col)
                    i += min(self.bw4,
                             MI_W[int(tc.mi_sizes[mv_row, mv_col])])
            else:
                if not self._has_left():
                    continue
                delta_row, delta_col = 0, -1
                h4 = min(min(self.bh4, tc.r1 - self.r), 16)
                i = 0
                while i < h4 and len(self.res.stack) < 2:
                    mv_row = self.r + delta_row + i
                    mv_col = self.c + delta_col
                    if not self._is_inside(mv_row, mv_col):
                        break
                    self._add_extra_candidate(mv_row, mv_col)
                    i += min(self.bh4,
                             MI_H[int(tc.mi_sizes[mv_row, mv_col])])

    # -- clamping -------------------------------------------------------------

    def _clamp_stack(self):
        tc = self.tc
        bw = self.bw4 * 4
        bh = self.bh4 * 4
        border_w = MV_BORDER + bw * 8
        border_h = MV_BORDER + bh * 8
        mb_to_top = -self.r * 4 * 8
        mb_to_bottom = (tc.mi_rows - self.bh4 - self.r) * 4 * 8
        mb_to_left = -self.c * 4 * 8
        mb_to_right = (tc.mi_cols - self.bw4 - self.c) * 4 * 8
        lo_r = mb_to_top - border_h
        hi_r = mb_to_bottom + border_h
        lo_c = mb_to_left - border_w
        hi_c = mb_to_right + border_w
        for idx, (mr, mc) in enumerate(self.res.stack):
            self.res.stack[idx] = (int(np.clip(mr, lo_r, hi_r)),
                                   int(np.clip(mc, lo_c, hi_c)))

    # -- main -------------------------------------------------------------------

    def build(self) -> MvStackResult:
        tc = self.tc
        res = self.res

        # valid scan offsets (libaom find_valid_row/col_offset: tile bounds)
        row_adj = (self.bh4 < 2) and (self.r & 1)
        col_adj = (self.bw4 < 2) and (self.c & 1)
        max_row_offset = 0
        if self._has_above():
            max_row_offset = -(MVREF_ROW_COLS << 1) + row_adj
            if self.bh4 < 2:
                max_row_offset = -(2 << 1) + row_adj
            max_row_offset = max(max_row_offset, tc.r0 - self.r)
        max_col_offset = 0
        if self._has_left():
            max_col_offset = -(MVREF_ROW_COLS << 1) + col_adj
            if self.bw4 < 2:
                max_col_offset = -(2 << 1) + col_adj
            max_col_offset = max(max_col_offset, tc.c0 - self.c)

        processed_rows = 0
        processed_cols = 0
        found_above = False
        found_left = False

        if max_row_offset:
            self.found_match = False
            processed_rows = self._scan_row(-1, max_row_offset, 0)
            found_above |= self.found_match
        if max_col_offset:
            self.found_match = False
            processed_cols = self._scan_col(-1, max_col_offset, 0)
            found_left |= self.found_match
        if max(self.bw4, self.bh4) <= 16:
            self.found_match = False
            self._scan_point(-1, self.bw4)
            found_above |= self.found_match

        close_matches = int(found_above) + int(found_left)
        num_nearest = len(res.stack)
        num_new = self.new_mv_count
        for idx in range(num_nearest):
            res.weights[idx] += REF_CAT_LEVEL

        # no temporal MVs (sequence disables ref_frame_mvs); zero-mv
        # context stays 0 (the temporal sample that would raise it is absent)
        res.zero_mv_ctx = 0

        self.found_match = False
        self._scan_point(-1, -1)
        found_above |= self.found_match

        for idx in range(2, MVREF_ROW_COLS + 1):
            row_offset = -(idx << 1) + 1 + row_adj
            col_offset = -(idx << 1) + 1 + col_adj
            if (abs(row_offset) <= abs(max_row_offset)
                    and abs(row_offset) > processed_rows):
                self.found_match = False
                processed_rows = self._scan_row(row_offset, max_row_offset,
                                                processed_rows)
                found_above |= self.found_match
            if (abs(col_offset) <= abs(max_col_offset)
                    and abs(col_offset) > processed_cols):
                self.found_match = False
                processed_cols = self._scan_col(col_offset, max_col_offset,
                                                processed_cols)
                found_left |= self.found_match

        total_matches = int(found_above) + int(found_left)

        # mode contexts (libaom setup_ref_mv_list switch(nearest_match))
        if close_matches == 0:
            res.new_mv_ctx = min(total_matches, 1)
            res.ref_mv_ctx = total_matches
        elif close_matches == 1:
            res.new_mv_ctx = 3 - min(num_new, 1)
            res.ref_mv_ctx = 2 + total_matches
        else:
            res.new_mv_ctx = 5 - min(num_new, 1)
            res.ref_mv_ctx = 5

        # stable sort by weight, nearest segment then the rest
        def stable_sort(lo, hi):
            order = sorted(range(lo, hi),
                           key=lambda i: -res.weights[i])
            res.stack[lo:hi] = [res.stack[i] for i in order]
            res.weights[lo:hi] = [res.weights[i] for i in order]

        stable_sort(0, num_nearest)
        stable_sort(num_nearest, len(res.stack))

        if len(res.stack) < 2:
            self._extra_search()
        # NumMvFound counts real candidates only; the global-mv padding
        # below fills stack slots for NEAREST/NEAR/pred reads but does NOT
        # count (drl bits are gated on the real count)
        res.num_found = len(res.stack)
        while len(res.stack) < 2:
            res.stack.append(res.global_mv)
            res.weights.append(2)

        self._clamp_stack()
        return res


def find_mv_stack(tc, r, c, bsize, ref_frame) -> MvStackResult:
    return MvStackBuilder(tc, r, c, bsize, ref_frame).build()


# ---------------------------------------------------------------------------
# MV syntax (spec 5.11.31-34), symmetric encode/decode
# ---------------------------------------------------------------------------


def _code_mv_component(tc, comp: int, value: int | None) -> int:
    """One MV component difference in 1/8-pel units.  Encode when value is
    given, decode otherwise.  allow_high_precision_mv=0,
    force_integer_mv=0 per the frame headers this encoder emits."""
    c = tc.cdfs
    coder = tc.coder
    encoding = tc.encoding
    if encoding:
        mag = abs(value)
        sign = int(value < 0)
        assert 0 < mag <= MV_MAX
        # allow_high_precision_mv == 0: the hp bit is implied 1, so the
        # coded magnitude z = mag - 1 must be odd (quarter-pel precision)
        assert mag % 2 == 0, "hp=0 requires even 1/8-pel components"
        z = mag - 1
        mv_class = 0 if z < 16 else (z >> 3).bit_length() - 1
    else:
        sign = None
        mv_class = None
        z = 0

    sign = coder.sym(c.mv_sign[comp], sign)
    mv_class = coder.sym(c.mv_classes[comp], mv_class)

    if mv_class == 0:
        if encoding:
            bit = z >> 3
            fr = (z >> 1) & 3
        else:
            bit = fr = None
        bit = coder.sym(c.mv_class0[comp], bit)
        fr = coder.sym(c.mv_class0_fp[comp][bit], fr)
        hp = 1  # spec: mv_class0_hp defaults to 1 when not read
        mag = ((bit << 3) | (fr << 1) | hp) + 1
    else:
        if encoding:
            base = CLASS0_SIZE << (mv_class + 2)
            rem = z - base  # 0 .. base-1
            d = rem >> 3
            fr = (rem >> 1) & 3
        else:
            d = fr = None
        bits_val = 0
        for i in range(mv_class):
            b = (d >> i) & 1 if encoding else None
            b = coder.sym(c.mv_bits[comp][i], b)
            bits_val |= b << i
        fr = coder.sym(c.mv_fp[comp], fr)
        hp = 1  # implied when allow_high_precision_mv == 0
        mag = CLASS0_SIZE << (mv_class + 2)
        mag += ((bits_val << 3) | (fr << 1) | hp) + 1

    result = -mag if sign else mag
    if encoding:
        assert result == value, (result, value, mv_class)
    return result


def code_mv(tc, pred: tuple[int, int],
            mv: tuple[int, int] | None) -> tuple[int, int]:
    """Code an MV as joint + component diffs against pred.  Returns the MV
    (decode mode reconstructs it)."""
    coder = tc.coder
    c = tc.cdfs
    if tc.encoding:
        diff = (mv[0] - pred[0], mv[1] - pred[1])
        if diff[0] == 0 and diff[1] == 0:
            joint = MV_JOINT_ZERO
        elif diff[0] == 0:
            joint = MV_JOINT_HNZVZ
        elif diff[1] == 0:
            joint = MV_JOINT_HZVNZ
        else:
            joint = MV_JOINT_HNZVNZ
    else:
        diff = None
        joint = None
    joint = coder.sym(c.mv_joints, joint)
    dr = dc = 0
    if joint in (MV_JOINT_HZVNZ, MV_JOINT_HNZVNZ):
        dr = _code_mv_component(tc, 0, diff[0] if tc.encoding else None)
    if joint in (MV_JOINT_HNZVZ, MV_JOINT_HNZVNZ):
        dc = _code_mv_component(tc, 1, diff[1] if tc.encoding else None)
    return (pred[0] + dr, pred[1] + dc)
