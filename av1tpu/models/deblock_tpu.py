"""Jitted in-loop deblocking for the production TPU pipelines.

Bit-exact vectorization of the spec engine's filter (av1tpu/spec/deblock.py,
itself validated sample-exactly against libdav1d/libaom): the production
grids put block edges on 16-px luma / 8-px chroma multiples, the modified
region of an edge (±6 luma, ±2 chroma samples) never overlaps the next
edge, so each pass is a static slice → vectorized filter → static stitch,
with no gathers.  Interior edges of 32/64 merges are gated per-edge by the
split maps.

Filter sizes at this operating point: luma tx is always >= 16x16 so every
luma edge takes the 14-tap path (with its 8/4-tap mask fallbacks); chroma
tx >= 8x8 so chroma edges take the 6-tap path (4-tap fallback).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _thresholds(lvl, sharpness: int):
    """Traced-level thresholds (lvl may be a jnp scalar)."""
    if sharpness > 0:
        shift = 2 if sharpness > 4 else 1
        limit = jnp.clip(lvl >> shift, 1, 9 - sharpness)
    else:
        limit = jnp.maximum(1, lvl)
    blimit = 2 * (lvl + 2) + limit
    thresh = lvl >> 4
    return limit, blimit, thresh


def lf_levels(qindex: int):
    """Loop-filter level heuristic from qindex (host-side ints; the same
    values go into the frame header and the device filter)."""
    ly = int(np.clip(qindex // 4 - 6, 0, 63))
    lc = ly // 2
    return ly, ly, lc, lc


def edge_gates_j(split32, split64, rows: int, cols: int):
    """In-graph edge gates from merge split maps via block-id equality:
    an interior 16-boundary inside a merged 32/64 NONE block is not a
    tx/prediction edge.  Returns (v_on (rows, cols-1), h_on (rows-1,
    cols)) bool."""
    bid = jnp.arange(rows * cols, dtype=jnp.int32).reshape(rows, cols)
    m32 = jnp.repeat(jnp.repeat(~split32.astype(bool), 2, 0), 2, 1)
    id32 = jnp.repeat(jnp.repeat(
        jnp.arange((rows // 2) * (cols // 2), dtype=jnp.int32)
        .reshape(rows // 2, cols // 2), 2, 0), 2, 1) + rows * cols
    bid = jnp.where(m32, id32, bid)
    m64 = jnp.repeat(jnp.repeat(~split64.astype(bool), 4, 0), 4, 1)
    id64 = jnp.repeat(jnp.repeat(
        jnp.arange((rows // 4) * (cols // 4), dtype=jnp.int32)
        .reshape(rows // 4, cols // 4), 4, 0), 4, 1) + 2 * rows * cols
    bid = jnp.where(m64, id64, bid)
    return bid[:, 1:] != bid[:, :-1], bid[1:, :] != bid[:-1, :]


def _r2(x, n):
    return (x + (1 << (n - 1))) >> n


def _filter_luma_lines(win, limit, blimit, thresh, bd):
    """win: (..., 14) int32 samples [p6..p0, q0..q6] per line.  Returns the
    12 modified samples (..., 12) = [p5..p0, q0..q5] after the 14/8/4-tap
    selection chain (spec 7.14.6)."""
    F = 1 << (bd - 8)
    mx = (1 << bd) - 1
    s = [win[..., k] for k in range(14)]
    (p6, p5, p4, p3, p2, p1, p0, q0, q1, q2, q3, q4, q5, q6) = s

    fm = ((jnp.abs(p1 - p0) <= limit * F)
          & (jnp.abs(q1 - q0) <= limit * F)
          & (jnp.abs(p0 - q0) * 2 + (jnp.abs(p1 - q1) >> 1)
             <= blimit * F)
          & (jnp.abs(p2 - p1) <= limit * F)
          & (jnp.abs(q2 - q1) <= limit * F)
          & (jnp.abs(p3 - p2) <= limit * F)
          & (jnp.abs(q3 - q2) <= limit * F))
    hev = ((jnp.abs(p1 - p0) > thresh * F)
           | (jnp.abs(q1 - q0) > thresh * F))

    lo_c, hi_c = -128 * F, 128 * F - 1
    clip = lambda x: jnp.clip(x, lo_c, hi_c)
    fil = jnp.where(hev, clip(p1 - q1), 0)
    fil = clip(fil + 3 * (q0 - p0))
    f1 = clip(fil + 4) >> 3
    f2 = clip(fil + 3) >> 3
    n_q0 = jnp.clip(q0 - f1, 0, mx)
    n_p0 = jnp.clip(p0 + f2, 0, mx)
    f3 = _r2(f1, 1)
    n_q1 = jnp.where(hev, q1, jnp.clip(q1 - f3, 0, mx))
    n_p1 = jnp.where(hev, p1, jnp.clip(p1 + f3, 0, mx))

    flat = ((jnp.abs(p1 - p0) <= F) & (jnp.abs(q1 - q0) <= F)
            & (jnp.abs(p2 - p0) <= F) & (jnp.abs(q2 - q0) <= F)
            & (jnp.abs(p3 - p0) <= F) & (jnp.abs(q3 - q0) <= F))
    m8 = fm & flat
    o3p = _r2(p3 * 3 + p2 * 2 + p1 + p0 + q0, 3)
    o2p = _r2(p3 * 2 + p2 + p1 * 2 + p0 + q0 + q1, 3)
    o1p = _r2(p3 + p2 + p1 + p0 * 2 + q0 + q1 + q2, 3)
    o1q = _r2(p2 + p1 + p0 + q0 * 2 + q1 + q2 + q3, 3)
    o2q = _r2(p1 + p0 + q0 + q1 * 2 + q2 + q3 * 2, 3)
    o3q = _r2(p0 + q0 + q1 + q2 * 2 + q3 * 3, 3)

    flat2 = ((jnp.abs(p4 - p0) <= F) & (jnp.abs(q4 - q0) <= F)
             & (jnp.abs(p5 - p0) <= F) & (jnp.abs(q5 - q0) <= F)
             & (jnp.abs(p6 - p0) <= F) & (jnp.abs(q6 - q0) <= F))
    m14 = m8 & flat2
    w5p = _r2(p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0, 4)
    w4p = _r2(p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0 + q0 + q1,
              4)
    w3p = _r2(p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0 + q0 + q1
              + q2, 4)
    w2p = _r2(p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0 + q0 + q1
              + q2 + q3, 4)
    w1p = _r2(p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 + q0 + q1
              + q2 + q3 + q4, 4)
    w0p = _r2(p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + q2
              + q3 + q4 + q5, 4)
    w0q = _r2(q6 + q5 + q4 + q3 + q2 + q1 * 2 + q0 * 2 + p0 * 2 + p1 + p2
              + p3 + p4 + p5, 4)
    w1q = _r2(q6 * 2 + q5 + q4 + q3 + q2 * 2 + q1 * 2 + q0 * 2 + p0 + p1
              + p2 + p3 + p4, 4)
    w2q = _r2(q6 * 3 + q5 + q4 + q3 * 2 + q2 * 2 + q1 * 2 + q0 + p0 + p1
              + p2 + p3, 4)
    w3q = _r2(q6 * 4 + q5 + q4 * 2 + q3 * 2 + q2 * 2 + q1 + q0 + p0 + p1
              + p2, 4)
    w4q = _r2(q6 * 5 + q5 * 2 + q4 * 2 + q3 * 2 + q2 + q1 + q0 + p0 + p1,
              4)
    w5q = _r2(q6 * 7 + q5 * 2 + q4 * 2 + q3 + q2 + q1 + q0 + p0, 4)

    def pick(wide, eight, narrow, orig):
        # selection chain per sample: flat2 -> 14-tap, flat -> 8-tap
        # (modifies p2..q2), filterMask -> narrow (p1..q1), else unchanged
        mid = jnp.where(m8, eight, jnp.where(fm, narrow, orig))
        return jnp.where(m14, wide, mid)

    out = [
        pick(w5p, p5, p5, p5),
        pick(w4p, p4, p4, p4),
        pick(w3p, p3, p3, p3),
        pick(w2p, o3p, p2, p2),
        pick(w1p, o2p, n_p1, p1),
        pick(w0p, o1p, n_p0, p0),
        pick(w0q, o1q, n_q0, q0),
        pick(w1q, o2q, n_q1, q1),
        pick(w2q, o3q, q2, q2),
        pick(w3q, q3, q3, q3),
        pick(w4q, q4, q4, q4),
        pick(w5q, q5, q5, q5),
    ]
    return jnp.stack(out, axis=-1)


def _filter_chroma_lines(win, limit, blimit, thresh, bd):
    """win: (..., 6) [p2..p0, q0..q2].  Returns (..., 4) [p1, p0, q0, q1]
    after the 6/4-tap chain."""
    F = 1 << (bd - 8)
    mx = (1 << bd) - 1
    p2, p1, p0, q0, q1, q2 = [win[..., k] for k in range(6)]
    fm = ((jnp.abs(p1 - p0) <= limit * F)
          & (jnp.abs(q1 - q0) <= limit * F)
          & (jnp.abs(p0 - q0) * 2 + (jnp.abs(p1 - q1) >> 1)
             <= blimit * F)
          & (jnp.abs(p2 - p1) <= limit * F)
          & (jnp.abs(q2 - q1) <= limit * F))
    hev = ((jnp.abs(p1 - p0) > thresh * F)
           | (jnp.abs(q1 - q0) > thresh * F))
    lo_c, hi_c = -128 * F, 128 * F - 1
    clip = lambda x: jnp.clip(x, lo_c, hi_c)
    fil = jnp.where(hev, clip(p1 - q1), 0)
    fil = clip(fil + 3 * (q0 - p0))
    f1 = clip(fil + 4) >> 3
    f2 = clip(fil + 3) >> 3
    n_q0 = jnp.clip(q0 - f1, 0, mx)
    n_p0 = jnp.clip(p0 + f2, 0, mx)
    f3 = _r2(f1, 1)
    n_q1 = jnp.where(hev, q1, jnp.clip(q1 - f3, 0, mx))
    n_p1 = jnp.where(hev, p1, jnp.clip(p1 + f3, 0, mx))

    flat = ((jnp.abs(p1 - p0) <= F) & (jnp.abs(q1 - q0) <= F)
            & (jnp.abs(p2 - p0) <= F) & (jnp.abs(q2 - q0) <= F))
    m6 = fm & flat
    o_p1 = _r2(p2 * 3 + p1 * 2 + p0 * 2 + q0, 3)
    o_p0 = _r2(p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1, 3)
    o_q0 = _r2(p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2, 3)
    o_q1 = _r2(p0 + q0 * 2 + q1 * 2 + q2 * 3, 3)

    def pick(six, narrow, orig):
        return jnp.where(m6, six, jnp.where(fm, narrow, orig))

    return jnp.stack([pick(o_p1, n_p1, p1), pick(o_p0, n_p0, p0),
                      pick(o_q0, n_q0, q0), pick(o_q1, n_q1, q1)],
                     axis=-1)


def _deblock_plane_v(plane, nblk: int, edge_on, limit, blimit, thresh, bd,
                     luma: bool):
    """Vertical-edge pass.  plane: (H, W); edges between nblk-px block
    columns; edge_on: (H, n_edges) bool per line (split-map gating)."""
    h, w = plane.shape
    ne = w // nblk - 1
    taps = 7 if luma else 3
    mod = taps - 1
    # windows: (H, ne, 2*taps) around each edge
    cols = []
    for k in range(-taps, taps):
        cols.append(jax.lax.slice(
            plane, (0, nblk + k), (h, nblk + k + (ne - 1) * nblk + 1),
            (1, nblk)))
    win = jnp.stack(cols, axis=-1)         # (H, ne, 2*taps)
    if luma:
        out = _filter_luma_lines(win, limit, blimit, thresh, bd)
    else:
        out = _filter_chroma_lines(win, limit, blimit, thresh, bd)
    sel = jnp.where(edge_on[..., None], out, win[..., taps - mod : taps + mod])
    # stitch back: modified columns are x-mod..x+mod-1 for each edge
    blocks = plane.reshape(h, w // nblk, nblk)
    left_new = sel[..., :mod]              # tail of block i (cols nblk-mod..)
    right_new = sel[..., mod:]             # head of block i+1
    blocks = blocks.at[:, :-1, nblk - mod :].set(left_new)
    blocks = blocks.at[:, 1:, :mod].set(right_new)
    return blocks.reshape(h, w)


def _deblock_plane(plane, nblk: int, v_on, h_on, limit, blimit, thresh,
                   bd, luma: bool):
    p = _deblock_plane_v(plane, nblk, v_on, limit, blimit, thresh, bd,
                         luma)
    pt = _deblock_plane_v(p.T, nblk, h_on, limit, blimit, thresh, bd,
                          luma)
    return pt.T


def edge_gates(split32, split64, rows: int, cols: int):
    """Per-edge enable maps from the merge split maps: an interior
    16-boundary inside a 32/64 NONE block is not a prediction/tx edge.
    Returns (v_y (H?, ne) builder inputs) as per-16-block-boundary bool
    grids: v_on16 (rows, cols-1), h_on16 (rows-1, cols) in BLOCK units."""
    m32 = ~np.asarray(split32, bool)       # merged 32 regions
    m64 = ~np.asarray(split64, bool)
    v_on = np.ones((rows, cols - 1), bool)
    h_on = np.ones((rows - 1, cols), bool)
    for r32 in range(m32.shape[0]):
        for c32 in range(m32.shape[1]):
            if m32[r32, c32]:
                # interior vertical edge at block col 2*c32+1 (left of it)
                v_on[2 * r32 : 2 * r32 + 2, 2 * c32] = False
                h_on[2 * r32, 2 * c32 : 2 * c32 + 2] = False
    for r64 in range(m64.shape[0]):
        for c64 in range(m64.shape[1]):
            if m64[r64, c64]:
                v_on[4 * r64 : 4 * r64 + 4, 4 * c64 : 4 * c64 + 3] = False
                h_on[4 * r64 : 4 * r64 + 3, 4 * c64 : 4 * c64 + 4] = False
    return v_on, h_on


def deblock_planes(y, u, v, v_on16, h_on16, lvl_y, lvl_u, lvl_v,
                   sharpness: int = 0, bit_depth: int = 8):
    """Apply the loop filter to recon planes (composable inside other
    jits; levels may be traced scalars — a level of 0 disables the plane
    pass via the edge gates).  v_on16/h_on16: per-16-block boundary
    enables (rows, cols-1)/(rows-1, cols) from edge_gates[_j]."""
    # per-line gating: expand block-edge enables to sample lines; a zero
    # level gates the whole pass off
    v16 = jnp.asarray(v_on16)
    h16 = jnp.asarray(h_on16)
    v_lines = jnp.kron(v16.astype(jnp.int32),
                       jnp.ones((16, 1), jnp.int32)).astype(bool)
    h_lines = jnp.kron(h16.astype(jnp.int32),
                       jnp.ones((16, 1), jnp.int32).T).astype(bool).T
    li, bl, th = _thresholds(lvl_y, sharpness)
    yy = _deblock_plane(y, 16, v_lines & (lvl_y > 0),
                        h_lines & (lvl_y > 0), li, bl, th, bit_depth,
                        True)
    # chroma: 8-px blocks; merge gating maps 1:1 (chroma block grid ==
    # luma 16-block grid)
    vc_lines = jnp.kron(v16.astype(jnp.int32),
                        jnp.ones((8, 1), jnp.int32)).astype(bool)
    hc_lines = jnp.kron(h16.astype(jnp.int32),
                        jnp.ones((8, 1), jnp.int32).T).astype(bool).T
    li, bl, th = _thresholds(lvl_u, sharpness)
    uu = _deblock_plane(u, 8, vc_lines & (lvl_u > 0),
                        hc_lines & (lvl_u > 0), li, bl, th, bit_depth,
                        False)
    li, bl, th = _thresholds(lvl_v, sharpness)
    vv = _deblock_plane(v, 8, vc_lines & (lvl_v > 0),
                        hc_lines & (lvl_v > 0), li, bl, th, bit_depth,
                        False)
    return yy, uu, vv


@functools.partial(jax.jit, static_argnames=("sharpness", "bit_depth"))
def deblock_tpu(y, u, v, v_on16, h_on16, lvl_y, lvl_u, lvl_v,
                sharpness: int = 0, bit_depth: int = 8):
    return deblock_planes(y, u, v, v_on16, h_on16, lvl_y, lvl_u, lvl_v,
                          sharpness, bit_depth)
