"""Normative CDEF (Constrained Directional Enhancement Filter, spec 7.15).

Applied to the deblocked reconstruction, 8x8 luma units (4x4 chroma at
4:2:0), each unit direction-estimated on luma then filtered with primary
taps along the direction and secondary taps at +-45 degrees, all reads
from the pre-CDEF frame (CDEF_VERY_LARGE outside the frame).  An 8x8 unit
is filtered only if any of its mi units has skip == 0.

This is the engine-side oracle (numpy, mirrors spec pseudocode); the
production TPU pass (av1tpu/models/cdef_tpu.py) is validated against it
and against the system decoders.  Replaces capability the reference
delegates to SVT-AV1 (reference crates/daemon/src/encode/av1an.rs:14).
"""

from __future__ import annotations

import numpy as np

CDEF_VERY_LARGE = 0x4000

# CdefDirections[dir][k] = (dy, dx) of the k-th primary tap (spec 7.15.3)
CDEF_DIRECTIONS = (
    ((-1, 1), (-2, 2)),
    ((0, 1), (-1, 2)),
    ((0, 1), (0, 2)),
    ((0, 1), (1, 2)),
    ((1, 1), (2, 2)),
    ((1, 0), (2, 1)),
    ((1, 0), (2, 0)),
    ((1, 0), (2, -1)),
)

DIV_TABLE = (0, 840, 420, 280, 210, 168, 140, 120, 105)


def floor_log2(x: int) -> int:
    return int(x).bit_length() - 1


def constrain(diff: int, threshold: int, damping: int) -> int:
    if not threshold:
        return 0
    damp_adj = max(0, damping - floor_log2(threshold))
    sign = -1 if diff < 0 else 1
    return sign * min(abs(diff), max(0, threshold - (abs(diff) >> damp_adj)))


def find_dir(block8: np.ndarray, coeff_shift: int) -> tuple[int, int]:
    """Direction search on one 8x8 luma block (spec 7.15.2).  Returns
    (direction, variance)."""
    img = (block8 >> coeff_shift).astype(np.int64) - 128
    partial = [np.zeros(15, np.int64) for _ in range(8)]
    for i in range(8):
        for j in range(8):
            x = img[i, j]
            partial[0][i + j] += x
            partial[1][i + j // 2] += x
            partial[2][i] += x
            partial[3][3 + i - j // 2] += x
            partial[4][7 + i - j] += x
            partial[5][3 - i // 2 + j] += x
            partial[6][j] += x
            partial[7][i // 2 + j] += x
    cost = [0] * 8
    for i in range(8):
        cost[2] += int(partial[2][i]) ** 2
        cost[6] += int(partial[6][i]) ** 2
    cost[2] *= 105
    cost[6] *= 105
    for i in range(7):
        cost[0] += (int(partial[0][i]) ** 2
                    + int(partial[0][14 - i]) ** 2) * DIV_TABLE[i + 1]
        cost[4] += (int(partial[4][i]) ** 2
                    + int(partial[4][14 - i]) ** 2) * DIV_TABLE[i + 1]
    cost[0] += int(partial[0][7]) ** 2 * 105
    cost[4] += int(partial[4][7]) ** 2 * 105
    for d in range(1, 8, 2):
        for j in range(5):
            cost[d] += int(partial[d][3 + j]) ** 2
        cost[d] *= 105
        for j in range(3):
            cost[d] += (int(partial[d][j]) ** 2
                        + int(partial[d][10 - j]) ** 2) * DIV_TABLE[2 * j + 2]
    best = int(np.argmax(cost))
    var = (cost[best] - cost[best ^ 4]) >> 10
    return best, var


def adjust_strength(strength: int, var: int) -> int:
    """Luma primary strength modulated by directional variance."""
    if not var:
        return 0
    i = min(floor_log2(var >> 6), 12) if (var >> 6) else 0
    return (strength * (4 + i) + 8) >> 4


def _filter_block(dst, src_pad, by, bx, h, w, dirn, pri, sec, damping,
                  pix_max, coeff_shift):
    """Filter one h x w block at (by, bx) of dst in place.  src_pad: the
    pre-CDEF plane padded by 2 with CDEF_VERY_LARGE."""
    if (pri >> coeff_shift) & 1:
        pri_taps = (3, 3)
    else:
        pri_taps = (4, 2)
    sec_taps = (2, 1)
    for i in range(h):
        for j in range(w):
            y, x = by + i, bx + j
            px = int(src_pad[y + 2, x + 2])
            summ = 0
            mx, mn = px, px
            for k in range(2):
                # min/max clamp range tracks every available tap,
                # independent of strength (spec 7.15.3: strength only
                # gates the constrain() sum, not the Min/Max updates)
                dy, dx = CDEF_DIRECTIONS[dirn][k]
                for s in (1, -1):
                    p = int(src_pad[y + 2 + s * dy, x + 2 + s * dx])
                    summ += pri_taps[k] * constrain(p - px, pri, damping)
                    if p != CDEF_VERY_LARGE:
                        mx = max(mx, p)
                    mn = min(mn, p)
                for off in (2, 6):
                    d2 = (dirn + off) & 7
                    dy, dx = CDEF_DIRECTIONS[d2][k]
                    for s in (1, -1):
                        p = int(src_pad[y + 2 + s * dy, x + 2 + s * dx])
                        summ += sec_taps[k] * constrain(p - px, sec,
                                                        damping)
                        if p != CDEF_VERY_LARGE:
                            mx = max(mx, p)
                        mn = min(mn, p)
            v = px + ((8 + summ - (summ < 0)) >> 4)
            dst[y, x] = min(max(v, mn), mx)


def cdef_frame(planes: list[np.ndarray], skips: np.ndarray,
               pri_y: int, sec_y: int, pri_uv: int, sec_uv: int,
               damping: int, bit_depth: int = 8) -> list[np.ndarray]:
    """Apply CDEF to deblocked recon planes (spec 7.15, cdef_bits = 0: one
    preset frame-wide).  planes: [y, u, v] int arrays; skips: (mi_rows,
    mi_cols) coded skip flags.  Strengths are the CODED header values
    (sec value 3 means 4); at 8-bit no bitdepth scaling applies.  Returns
    new [y, u, v]."""
    coeff_shift = bit_depth - 8
    sec_y = sec_y + (sec_y == 3)
    sec_uv = sec_uv + (sec_uv == 3)
    pri_y <<= coeff_shift
    sec_y <<= coeff_shift
    pri_uv <<= coeff_shift
    sec_uv <<= coeff_shift
    pix_max = (1 << bit_depth) - 1
    yp, up, vp = planes
    h, w = yp.shape
    out = [yp.copy(), up.copy(), vp.copy()]
    if (pri_y == 0 and sec_y == 0 and pri_uv == 0 and sec_uv == 0):
        return out
    pads = []
    for p, plane in enumerate(planes):
        pad = np.full((plane.shape[0] + 4, plane.shape[1] + 4),
                      CDEF_VERY_LARGE, np.int64)
        pad[2:-2, 2:-2] = plane
        pads.append(pad)
    damping_y = damping + coeff_shift
    damping_uv = damping - 1 + coeff_shift
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            # an 8x8 unit is filtered iff any covering mi is non-skip
            mi_r, mi_c = by // 4, bx // 4
            sub = skips[mi_r : mi_r + 2, mi_c : mi_c + 2]
            if sub.size == 0 or sub.all():
                continue
            # direction search only runs when some primary strength is
            # nonzero (spec 7.15.1); secondary-only filters along dir 0
            if pri_y or pri_uv:
                dirn, var = find_dir(yp[by : by + 8, bx : bx + 8],
                                     coeff_shift)
            else:
                dirn, var = 0, 0
            if pri_y or sec_y:
                pri = adjust_strength(pri_y, var) if pri_y else 0
                _filter_block(out[0], pads[0], by, bx, 8, 8, dirn, pri,
                              sec_y, damping_y, pix_max, coeff_shift)
            if pri_uv or sec_uv:
                cy, cx = by // 2, bx // 2
                for p in (1, 2):
                    _filter_block(out[p], pads[p], cy, cx, 4, 4, dirn,
                                  pri_uv, sec_uv, damping_uv, pix_max,
                                  coeff_shift)
    return out
