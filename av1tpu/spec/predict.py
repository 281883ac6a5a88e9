"""Intra prediction (spec 7.11.2), numpy reference.

Edge handling follows the spec: unavailable above row is filled from the
left column's top pixel (or mid-gray - 1), unavailable left column from the
above row's first pixel (or mid-gray + 1).

Directional modes and the intra edge filter are added with the full mode
search; the base modes here (DC/V/H/SMOOTH*/PAETH) are what the first
encoder slice signals.

Smooth weights verified against the constants embedded in libaom/dav1d.
"""

from __future__ import annotations

import numpy as np

from .enums import (
    D45_PRED, D67_PRED, D113_PRED, D135_PRED, D157_PRED, D203_PRED,
    DC_PRED, H_PRED, PAETH_PRED, SMOOTH_H_PRED, SMOOTH_PRED,
    SMOOTH_V_PRED, V_PRED,
)

# Dr_Intra_Derivative (spec 7.11.2.4): 1/64-pel per-row (or per-column)
# steps of the directional predictors, indexed by angle mod 90.  Full
# uint16[90] table extracted from the system libaom .rodata (byte offset
# 4688512 in libaom.so.3.6.0, anchored on the [3]=1023/[45]=64/[67]=27
# pattern), cross-checked against prediction behavior via the dav1d/
# libaom conformance oracle.  Base angles use {23, 45, 67}; the other
# entries are the +-3-degree delta-angle steps.
DR_INTRA_DERIVATIVE = {
    3: 1023, 6: 547, 9: 372, 14: 273, 17: 215, 20: 178, 23: 151, 26: 132,
    29: 116, 32: 102, 36: 90, 39: 80, 42: 71, 45: 64, 48: 57, 51: 51,
    54: 45, 58: 40, 61: 35, 64: 31, 67: 27, 70: 23, 73: 19, 76: 15,
    81: 11, 84: 7, 87: 3,
}

# base prediction angle per directional mode (spec Mode_To_Angle)
MODE_ANGLE = {V_PRED: 90, H_PRED: 180, D45_PRED: 45, D135_PRED: 135,
              D113_PRED: 113, D157_PRED: 157, D203_PRED: 203,
              D67_PRED: 67}

SM_WEIGHTS = {
    4: np.array([255, 149, 85, 64], np.int64),
    8: np.array([255, 197, 146, 105, 73, 50, 37, 32], np.int64),
    16: np.array([255, 225, 196, 170, 145, 123, 102, 84, 68, 54, 43, 33,
                  26, 20, 17, 16], np.int64),
    32: np.array([255, 240, 225, 210, 196, 182, 169, 157, 145, 133, 122,
                  111, 101, 92, 83, 74, 66, 59, 52, 45, 39, 34, 29, 25, 21,
                  17, 14, 12, 10, 9, 8, 8], np.int64),
    64: np.array([255, 248, 240, 233, 225, 218, 210, 203, 196, 189, 182,
                  176, 169, 163, 156, 150, 144, 138, 133, 127, 121, 116,
                  111, 106, 101, 96, 91, 86, 82, 77, 73, 69, 65, 61, 57,
                  54, 50, 47, 44, 41, 38, 35, 32, 29, 27, 25, 22, 20, 18,
                  16, 15, 13, 12, 10, 9, 8, 7, 6, 6, 5, 5, 4, 4, 4],
                 np.int64),
}


def _round2(x, n):
    return (x + (1 << (n - 1))) >> n


def build_edges(recon: np.ndarray, x: int, y: int, w: int, h: int,
                have_above: bool, have_left: bool, bit_depth: int = 8,
                have_above_right: bool = False,
                have_below_left: bool = False):
    """Returns (above_row[w + h], left_col[h + w], corner) int64 edge
    arrays.  above[w:] holds the above-right extension used by the
    zone-1 directional modes: real pixels when have_above_right
    (BlockDecoded at (y4-1, x4+w4), spec 5.11.3/7.11.2), otherwise
    above[w-1] replicated.  left[h:] is the symmetric below-left
    extension for the zone-3 modes (BlockDecoded at (y4+h4, x4-1))."""
    base = 1 << (bit_depth - 1)
    alen = w + h
    if have_above:
        avail_w = min(w, recon.shape[1] - x)
        above = np.empty(alen, np.int64)
        above[:avail_w] = recon[y - 1, x : x + avail_w]
        above[avail_w:] = above[avail_w - 1] if avail_w else base - 1
        if have_above_right and avail_w == w:
            ur = min(alen - w, recon.shape[1] - x - w)
            if ur > 0:
                above[w : w + ur] = recon[y - 1, x + w : x + w + ur]
                above[w + ur :] = above[w + ur - 1]
    elif have_left:
        above = np.full(alen, int(recon[y, x - 1]), np.int64)
    else:
        above = np.full(alen, base - 1, np.int64)
    llen = h + w
    if have_left:
        avail_h = min(h, recon.shape[0] - y)
        left = np.empty(llen, np.int64)
        left[:avail_h] = recon[y : y + avail_h, x - 1]
        left[avail_h:] = left[avail_h - 1] if avail_h else base + 1
        if have_below_left and avail_h == h:
            bl = min(llen - h, recon.shape[0] - y - h)
            if bl > 0:
                left[h : h + bl] = recon[y + h : y + h + bl, x - 1]
                left[h + bl :] = left[h + bl - 1]
    elif have_above:
        left = np.full(llen, int(recon[y - 1, x]), np.int64)
    else:
        left = np.full(llen, base + 1, np.int64)
    if have_above and have_left:
        corner = int(recon[y - 1, x - 1])
    elif have_above:
        corner = int(above[0])
    elif have_left:
        corner = int(left[0])
    else:
        corner = base
    return above, left, corner


def predict_intra(mode: int, above: np.ndarray, left: np.ndarray,
                  corner: int, w: int, h: int, have_above: bool,
                  have_left: bool, bit_depth: int = 8) -> np.ndarray:
    """Predict a (h, w) block from edges (spec prediction processes)."""
    if mode == DC_PRED:
        if have_above and have_left:
            s = int(above[:w].sum() + left[:h].sum())
            val = (s + ((w + h) >> 1)) // (w + h)
        elif have_above:
            val = (int(above[:w].sum()) + (w >> 1)) >> int(np.log2(w))
        elif have_left:
            val = (int(left[:h].sum()) + (h >> 1)) >> int(np.log2(h))
        else:
            val = 1 << (bit_depth - 1)
        return np.full((h, w), val, np.int64)
    if mode == V_PRED:
        return np.tile(above[:w], (h, 1))
    if mode == H_PRED:
        return np.tile(left[:h, None], (1, w))
    if mode == PAETH_PRED:
        a = above[None, :w]
        l = left[:h, None]
        base = a + l - corner
        pa = np.abs(base - a)
        pl = np.abs(base - l)
        pc = np.abs(base - corner)
        out = np.where((pa <= pl) & (pa <= pc), np.broadcast_to(a, (h, w)),
                       np.where(pl <= pc, np.broadcast_to(l, (h, w)), corner))
        return out.astype(np.int64)
    if mode == SMOOTH_PRED:
        wy = SM_WEIGHTS[h][:, None]
        wx = SM_WEIGHTS[w][None, :]
        below = int(left[h - 1])
        right = int(above[w - 1])
        num = (wy * above[None, :w] + (256 - wy) * below
               + wx * left[:h, None] + (256 - wx) * right)
        return _round2(num, 9)
    if mode == SMOOTH_V_PRED:
        wy = SM_WEIGHTS[h][:, None]
        below = int(left[h - 1])
        return _round2(wy * above[None, :w] + (256 - wy) * below, 8)
    if mode == SMOOTH_H_PRED:
        wx = SM_WEIGHTS[w][None, :]
        right = int(above[w - 1])
        return _round2(wx * left[:h, None] + (256 - wx) * right, 8)
    if mode in (D45_PRED, D67_PRED):
        # spec 7.11.2.4, pAngle < 90 (above-only), upsample/edge filter off
        dx = DR_INTRA_DERIVATIVE[MODE_ANGLE[mode]]
        i = np.arange(1, h + 1, dtype=np.int64)[:, None]
        j = np.arange(w, dtype=np.int64)[None, :]
        idx = i * dx
        pos = (idx >> 6) + j
        shift = (idx >> 1) & 0x1F
        max_base = w + h - 1
        b = np.minimum(pos, max_base)
        interp = _round2(above[b] * (32 - shift)
                         + above[np.minimum(b + 1, max_base)] * shift, 5)
        return np.where(pos < max_base, interp, above[max_base])
    if mode in (D113_PRED, D135_PRED, D157_PRED):
        # spec 7.11.2.4, 90 < pAngle < 180 (above + left through the
        # corner), upsample/edge filter off.  Per pixel the ray lands
        # either on the above row (base_x >= -1, index -1 = corner) or on
        # the left column (base_y >= -1 by the geometry).
        ang = MODE_ANGLE[mode]
        dx = DR_INTRA_DERIVATIVE[180 - ang]
        dy = DR_INTRA_DERIVATIVE[ang - 90]
        r = np.arange(h, dtype=np.int64)[:, None]
        c = np.arange(w, dtype=np.int64)[None, :]
        xi = (c << 6) - (r + 1) * dx
        base_x = xi >> 6
        shift_x = (xi >> 1) & 0x1F
        # above with corner at slot 0: aboveC[k] = above[k - 1]
        above_c = np.concatenate(([corner], above[: w + h - 1]))
        bx = np.clip(base_x + 1, 0, w + h - 1)
        vx = _round2(above_c[bx] * (32 - shift_x)
                     + above_c[np.minimum(bx + 1, w + h - 1)] * shift_x, 5)
        yi = (r << 6) - (c + 1) * dy
        base_y = yi >> 6
        shift_y = (yi >> 1) & 0x1F
        left_c = np.concatenate(([corner], left[: w + h - 1]))
        by = np.clip(base_y + 1, 0, w + h - 1)
        vy = _round2(left_c[by] * (32 - shift_y)
                     + left_c[np.minimum(by + 1, w + h - 1)] * shift_y, 5)
        return np.where(base_x >= -1, vx, vy)
    if mode == D203_PRED:
        # spec 7.11.2.4, pAngle > 180 (left-only; the transpose of the
        # zone-1 process), upsample/edge filter off
        dy = DR_INTRA_DERIVATIVE[270 - MODE_ANGLE[mode]]
        r = np.arange(h, dtype=np.int64)[:, None]
        c = np.arange(w, dtype=np.int64)[None, :]
        idx = (c + 1) * dy
        pos = (idx >> 6) + r
        shift = (idx >> 1) & 0x1F
        max_base = w + h - 1
        b = np.minimum(pos, max_base)
        interp = _round2(left[b] * (32 - shift)
                         + left[np.minimum(b + 1, max_base)] * shift, 5)
        return np.where(pos < max_base, interp, left[max_base])
    raise NotImplementedError(f"intra mode {mode}")
