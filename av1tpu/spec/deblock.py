"""Normative in-loop deblocking filter (spec 7.14).

Scope matches the engine's operating point: TX_MODE_LARGEST (tx edges ==
prediction-block edges), no segment/mode/ref loop-filter deltas, sharpness
configurable.  Conformance is established behaviorally against libdav1d /
libaom on real streams (tests/test_deblock.py) — the decoders reproduce our
filtered reconstruction bit-exactly only if every mask, threshold and
filter tap matches the spec.
"""

from __future__ import annotations

import numpy as np


def _clip3(lo, hi, x):
    return np.clip(x, lo, hi)


def _round2(x, n):
    return (x + (1 << (n - 1))) >> n


class Deblocker:
    """Applies the loop filter to recon planes given the tile's per-mi
    state (mi block-origin grids, sizes, skips, inter flags)."""

    def __init__(self, fh, seq, planes, blk_r0, blk_c0, mi_sizes, skips,
                 is_inters, bit_depth=8):
        self.fh = fh
        self.seq = seq
        self.planes = planes
        self.blk_r0 = blk_r0
        self.blk_c0 = blk_c0
        self.mi_sizes = mi_sizes
        self.skips = skips
        self.is_inters = is_inters
        self.bd = bit_depth
        from .enums import BLOCK_H, BLOCK_W
        self.BLOCK_W = BLOCK_W
        self.BLOCK_H = BLOCK_H

    def _thresholds(self, lvl):
        sh = self.fh.loop_filter_sharpness
        if sh > 0:
            shift = 2 if sh > 4 else 1
            limit = _clip3(1, 9 - sh, lvl >> shift)
        else:
            limit = max(1, lvl)
        blimit = 2 * (lvl + 2) + limit
        thresh = lvl >> 4
        return limit, blimit, thresh

    def filter_frame(self):
        for plane in range(3 if not self.seq.mono_chrome else 1):
            for pass_ in (0, 1):           # 0 = vertical edges, 1 = horz
                lvl = self.fh.loop_filter_level[
                    pass_ if plane == 0 else plane + 1]
                if lvl == 0:
                    continue
                self._filter_pass(plane, pass_, lvl)

    # -- per-mi edge walk ------------------------------------------------

    def _filter_pass(self, plane, pass_, lvl):
        sub = 1 if plane else 0
        mi_rows, mi_cols = self.mi_sizes.shape
        limit, blimit, thresh = self._thresholds(lvl)
        p = self.planes[plane]
        ph, pw = p.shape
        # walk mi units; chroma edges live on the even-mi grid
        step = 1 << sub
        for r in range(0, mi_rows, step):
            for c in range(0, mi_cols, step):
                if pass_ == 0:
                    x = (c * 4) >> sub
                    if x == 0 or x >= pw:
                        continue
                    # tx/block left edge? (tx == block under TX_MODE_LARGEST)
                    if self.blk_c0[r, c] != c:
                        continue
                    # filter size from tx dims across the edge (plane tx
                    # dims = plane block dims here)
                    sz_t = (self.BLOCK_W[self.mi_sizes[r, c]] >> sub)
                    sz_o = (self.BLOCK_W[self.mi_sizes[r, c - step]] >> sub)
                    y = (r * 4) >> sub
                    n = (4 * step) >> sub  # 4 luma rows per mi walk step
                    self._filter_edge_v(p, y, min(n, ph - y), x,
                                        min(sz_t, sz_o), plane, limit,
                                        blimit, thresh)
                else:
                    y = (r * 4) >> sub
                    if y == 0 or y >= ph:
                        continue
                    if self.blk_r0[r, c] != r:
                        continue
                    sz_t = (self.BLOCK_H[self.mi_sizes[r, c]] >> sub)
                    sz_o = (self.BLOCK_H[self.mi_sizes[r - step, c]] >> sub)
                    x = (c * 4) >> sub
                    n = (4 * step) >> sub
                    self._filter_edge_h(p, x, min(n, pw - x), y,
                                        min(sz_t, sz_o), plane, limit,
                                        blimit, thresh)

    # -- edge filtering (vectorized over the 4-sample segment) -----------

    def _filter_edge_v(self, p, y0, n, x, min_dim, plane, limit, blimit,
                       thresh):
        taps = 7 if plane == 0 else 3
        lo = max(0, x - taps)
        hi = min(p.shape[1], x + taps)
        seg = p[y0 : y0 + n, lo:hi].astype(np.int64)
        out = self._filter_lines(seg, x - lo, min_dim, plane, limit,
                                 blimit, thresh)
        p[y0 : y0 + n, lo:hi] = out

    def _filter_edge_h(self, p, x0, n, y, min_dim, plane, limit, blimit,
                       thresh):
        taps = 7 if plane == 0 else 3
        lo = max(0, y - taps)
        hi = min(p.shape[0], y + taps)
        seg = p[lo:hi, x0 : x0 + n].astype(np.int64).T
        out = self._filter_lines(seg, y - lo, min_dim, plane, limit,
                                 blimit, thresh)
        p[lo:hi, x0 : x0 + n] = out.T

    def _filter_lines(self, seg, e, min_dim, plane, limit, blimit, thresh):
        """seg: (n_lines, width) window around the edge column e.  Filters
        each line independently per the sample filter process (7.14.6)."""
        bd = self.bd
        F = 1 << (bd - 8)
        mx = (1 << bd) - 1
        g = lambda k: seg[:, e + k] if 0 <= e + k < seg.shape[1] else None

        p0 = g(-1)
        q0 = g(0)
        if p0 is None or q0 is None:
            return seg
        p1 = g(-2)
        q1 = g(1)
        # filter size: 4 needs p1..q1; 8 needs p3..q3; 14 needs p6..q6.
        # available context limits the size as the spec does via tx dims
        if plane == 0:
            if min_dim >= 16:
                size = 14
            elif min_dim >= 8:
                size = 8
            else:
                size = 4
        else:
            size = 6 if min_dim >= 8 else 4
        have = lambda k: 0 <= e + k < seg.shape[1]
        if size >= 8 and not (have(-4) and have(3)):
            size = 4
        if size == 14 and not (have(-7) and have(6)):
            size = 8
        if size == 6 and not (have(-3) and have(2)):
            size = 4

        # base filter mask
        fm = ((np.abs(p1 - p0) <= limit * F)
              & (np.abs(q1 - q0) <= limit * F)
              & (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)
                 <= blimit * F))
        if size >= 8:
            p2, p3 = g(-3), g(-4)
            q2, q3 = g(2), g(3)
            fm = (fm & (np.abs(p2 - p1) <= limit * F)
                  & (np.abs(q2 - q1) <= limit * F)
                  & (np.abs(p3 - p2) <= limit * F)
                  & (np.abs(q3 - q2) <= limit * F))
        elif size == 6:
            p2, q2 = g(-3), g(2)
            fm = (fm & (np.abs(p2 - p1) <= limit * F)
                  & (np.abs(q2 - q1) <= limit * F))

        hev = (np.abs(p1 - p0) > thresh * F) | (np.abs(q1 - q0) > thresh * F)

        # narrow filter (4): always computed as the fallback
        lo_c, hi_c = -128 * F, 128 * F - 1
        fil = np.where(hev, _clip3(lo_c, hi_c, p1 - q1), 0)
        fil = _clip3(lo_c, hi_c, fil + 3 * (q0 - p0))
        f1 = _clip3(lo_c, hi_c, fil + 4) >> 3
        f2 = _clip3(lo_c, hi_c, fil + 3) >> 3
        n_q0 = _clip3(0, mx, q0 - f1)
        n_p0 = _clip3(0, mx, p0 + f2)
        f3 = _round2(f1, 1)
        n_q1 = np.where(hev, q1, _clip3(0, mx, q1 - f3))
        n_p1 = np.where(hev, p1, _clip3(0, mx, p1 + f3))

        out = seg.copy()

        def setcol(k, vals, mask):
            out[:, e + k] = np.where(mask, vals, out[:, e + k])

        if size == 4:
            setcol(-1, n_p0, fm)
            setcol(0, n_q0, fm)
            setcol(-2, n_p1, fm)
            setcol(1, n_q1, fm)
            return out

        if size == 6:
            flat = ((np.abs(p1 - p0) <= F) & (np.abs(q1 - q0) <= F)
                    & (np.abs(p2 - p0) <= F) & (np.abs(q2 - q0) <= F))
            m = fm & flat
            o_p1 = _round2(p2 * 3 + p1 * 2 + p0 * 2 + q0, 3)
            o_p0 = _round2(p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1, 3)
            o_q0 = _round2(p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2, 3)
            o_q1 = _round2(p0 + q0 * 2 + q1 * 2 + q2 * 3, 3)
            setcol(-2, np.where(m, o_p1, n_p1), fm)
            setcol(-1, np.where(m, o_p0, n_p0), fm)
            setcol(0, np.where(m, o_q0, n_q0), fm)
            setcol(1, np.where(m, o_q1, n_q1), fm)
            return out

        # size 8 / 14 (luma)
        flat = ((np.abs(p1 - p0) <= F) & (np.abs(q1 - q0) <= F)
                & (np.abs(p2 - p0) <= F) & (np.abs(q2 - q0) <= F)
                & (np.abs(p3 - p0) <= F) & (np.abs(q3 - q0) <= F))
        m8 = fm & flat
        o = {}
        o[-3] = _round2(p3 * 3 + p2 * 2 + p1 + p0 + q0, 3)
        o[-2] = _round2(p3 * 2 + p2 + p1 * 2 + p0 + q0 + q1, 3)
        o[-1] = _round2(p3 + p2 + p1 + p0 * 2 + q0 + q1 + q2, 3)
        o[0] = _round2(p2 + p1 + p0 + q0 * 2 + q1 + q2 + q3, 3)
        o[1] = _round2(p1 + p0 + q0 + q1 * 2 + q2 + q3 * 2, 3)
        o[2] = _round2(p0 + q0 + q1 + q2 * 2 + q3 * 3, 3)

        if size == 14:
            p4, p5, p6 = g(-5), g(-6), g(-7)
            q4, q5, q6 = g(4), g(5), g(6)
            flat2 = ((np.abs(p4 - p0) <= F) & (np.abs(q4 - q0) <= F)
                     & (np.abs(p5 - p0) <= F) & (np.abs(q5 - q0) <= F)
                     & (np.abs(p6 - p0) <= F) & (np.abs(q6 - q0) <= F))
            m14 = m8 & flat2
            # 13-tap wide filter: weights sum to 16 per output; validated
            # sample-exactly against libdav1d (tests/test_deblock.py)
            w = {}
            w[-6] = _round2(p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0
                            + q0, 4)
            w[-5] = _round2(p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1
                            + p0 + q0 + q1, 4)
            w[-4] = _round2(p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1
                            + p0 + q0 + q1 + q2, 4)
            w[-3] = _round2(p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2
                            + p0 + q0 + q1 + q2 + q3, 4)
            w[-2] = _round2(p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2
                            + p0 * 2 + q0 + q1 + q2 + q3 + q4, 4)
            w[-1] = _round2(p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2
                            + q0 * 2 + q1 + q2 + q3 + q4 + q5, 4)
            w[0] = _round2(q6 + q5 + q4 + q3 + q2 + q1 * 2 + q0 * 2
                           + p0 * 2 + p1 + p2 + p3 + p4 + p5, 4)
            w[1] = _round2(q6 * 2 + q5 + q4 + q3 + q2 * 2 + q1 * 2
                           + q0 * 2 + p0 + p1 + p2 + p3 + p4, 4)
            w[2] = _round2(q6 * 3 + q5 + q4 + q3 * 2 + q2 * 2 + q1 * 2
                           + q0 + p0 + p1 + p2 + p3, 4)
            w[3] = _round2(q6 * 4 + q5 + q4 * 2 + q3 * 2 + q2 * 2 + q1
                           + q0 + p0 + p1 + p2, 4)
            w[4] = _round2(q6 * 5 + q5 * 2 + q4 * 2 + q3 * 2 + q2 + q1
                           + q0 + p0 + p1, 4)
            w[5] = _round2(q6 * 7 + q5 * 2 + q4 * 2 + q3 + q2 + q1 + q0
                           + p0, 4)
            for k in range(-6, 6):
                # selection chain: m14 -> wide, else m8 -> 8-tap (where
                # defined), else narrow (where defined), else unchanged
                cur = out[:, e + k]
                if k in o:
                    if k == -2:
                        nar = n_p1
                    elif k == -1:
                        nar = n_p0
                    elif k == 0:
                        nar = n_q0
                    elif k == 1:
                        nar = n_q1
                    else:
                        nar = cur
                    mid = np.where(m8, o[k], np.where(fm, nar, cur))
                else:
                    mid = cur
                out[:, e + k] = np.where(m14, w[k], mid)
            return out

        # size == 8
        for k in range(-3, 3):
            if k == -2:
                nar = n_p1
            elif k == -1:
                nar = n_p0
            elif k == 0:
                nar = n_q0
            elif k == 1:
                nar = n_q1
            else:
                nar = out[:, e + k]
            out[:, e + k] = np.where(m8, o[k], np.where(fm, nar,
                                                        out[:, e + k]))
        return out


def deblock_frame(fh, seq, planes, blk_r0, blk_c0, mi_sizes, skips,
                  is_inters, bit_depth=8):
    """In-place loop filter over recon planes."""
    Deblocker(fh, seq, planes, blk_r0, blk_c0, mi_sizes, skips, is_inters,
              bit_depth).filter_frame()
