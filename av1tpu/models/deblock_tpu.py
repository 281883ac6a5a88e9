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


def _filter_luma_lines(win, limit, blimit, thresh, bd, allow14=None):
    """win: (..., 14) int32 samples [p6..p0, q0..q6] per line.  Returns the
    12 modified samples (..., 12) = [p5..p0, q0..q5] after the 14/8/4-tap
    selection chain (spec 7.14.6).  allow14: per-line bool — False caps
    the filter at 8 taps (spec: filter size = min of the tx dims across
    the edge; an adjacent 8x8 tx caps a 16-px edge at 8)."""
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
    if allow14 is not None:
        m14 = m14 & allow14
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


def _filter_chroma_lines(win, limit, blimit, thresh, bd, allow6=None):
    """win: (..., 6) [p2..p0, q0..q2].  Returns (..., 4) [p1, p0, q0, q1]
    after the 6/4-tap chain.  allow6: per-line bool — False caps the
    filter at 4 taps (an adjacent 4x4 chroma tx), which also drops the
    p2/q2 terms from the filter mask (spec 7.14.6.2: the mask is built
    from the samples the chosen filter size reads)."""
    F = 1 << (bd - 8)
    mx = (1 << bd) - 1
    p2, p1, p0, q0, q1, q2 = [win[..., k] for k in range(6)]
    fm = ((jnp.abs(p1 - p0) <= limit * F)
          & (jnp.abs(q1 - q0) <= limit * F)
          & (jnp.abs(p0 - q0) * 2 + (jnp.abs(p1 - q1) >> 1)
             <= blimit * F))
    fm6 = (fm & (jnp.abs(p2 - p1) <= limit * F)
           & (jnp.abs(q2 - q1) <= limit * F))
    if allow6 is None:
        fm = fm6
    else:
        fm = jnp.where(allow6, fm6, fm)
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
    if allow6 is not None:
        m6 = m6 & allow6
    o_p1 = _r2(p2 * 3 + p1 * 2 + p0 * 2 + q0, 3)
    o_p0 = _r2(p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1, 3)
    o_q0 = _r2(p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2, 3)
    o_q1 = _r2(p0 + q0 * 2 + q1 * 2 + q2 * 3, 3)

    def pick(six, narrow, orig):
        return jnp.where(m6, six, jnp.where(fm, narrow, orig))

    return jnp.stack([pick(o_p1, n_p1, p1), pick(o_p0, n_p0, p0),
                      pick(o_q0, n_q0, q0), pick(o_q1, n_q1, q1)],
                     axis=-1)


def _filter_luma8_lines(win, limit, blimit, thresh, bd):
    """win: (..., 8) [p3..p0, q0..q3] per line — the 8/4-tap chain for
    edges whose filter size is capped at 8 (both sides 8x8 tx: the
    interior edge of a split-16 block).  Returns (..., 6) [p2..q2]."""
    F = 1 << (bd - 8)
    mx = (1 << bd) - 1
    p3, p2, p1, p0, q0, q1, q2, q3 = [win[..., k] for k in range(8)]
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

    def pick(eight, narrow, orig):
        return jnp.where(m8, eight, jnp.where(fm, narrow, orig))

    return jnp.stack([
        pick(o3p, p2, p2), pick(o2p, n_p1, p1), pick(o1p, n_p0, p0),
        pick(o1q, n_q0, q0), pick(o2q, n_q1, q1), pick(o3q, q2, q2),
    ], axis=-1)


def _filter_chroma4_lines(win, limit, blimit, thresh, bd):
    """win: (..., 4) [p1, p0, q0, q1] — the 4-tap chroma chain (both
    sides 4x4 tx: the interior edge of a split block's chroma).  Returns
    (..., 4) modified [p1, p0, q0, q1]."""
    F = 1 << (bd - 8)
    mx = (1 << bd) - 1
    p1, p0, q0, q1 = [win[..., k] for k in range(4)]
    fm = ((jnp.abs(p1 - p0) <= limit * F)
          & (jnp.abs(q1 - q0) <= limit * F)
          & (jnp.abs(p0 - q0) * 2 + (jnp.abs(p1 - q1) >> 1)
             <= blimit * F))
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
    sel = lambda new, old: jnp.where(fm, new, old)
    return jnp.stack([sel(n_p1, p1), sel(n_p0, p0), sel(n_q0, q0),
                      sel(n_q1, q1)], axis=-1)


def _deblock_interior_v(plane, stride: int, off: int, taps: int, mod: int,
                        edge_on, filt):
    """Interior-edge vertical pass: one edge per stride-px block column at
    x = off + stride*j.  The modified region (+-mod) stays inside the
    block, so the stitch is a static concatenate.  edge_on:
    (H, w//stride) per-line enables; filt(win (..., 2*taps)) -> (...,
    2*mod).

    The stitch deliberately avoids `.at[...].set` on the reshaped block
    view: XLA:CPU (jax 0.9.0) miscompiles that scatter when the pass
    output has multiple consumers in one fused graph (the filter's
    select chain silently picks the wrong branch on a handful of lanes —
    observed as 4-pixel recon divergence vs the op-by-op result).
    Concatenate lowers to pure slices and is immune."""
    h, w = plane.shape
    ne = w // stride
    cols = []
    for k in range(-taps, taps):
        cols.append(jax.lax.slice(
            plane, (0, off + k), (h, off + k + (ne - 1) * stride + 1),
            (1, stride)))
    win = jnp.stack(cols, axis=-1)
    out = filt(win)
    sel = jnp.where(edge_on[..., None], out,
                    win[..., taps - mod : taps + mod])
    blocks = plane.reshape(h, ne, stride)
    new = jnp.concatenate([blocks[:, :, : off - mod], sel,
                           blocks[:, :, off + mod :]], axis=-1)
    return new.reshape(h, w)


def _deblock_plane_v(plane, nblk: int, edge_on, limit, blimit, thresh, bd,
                     luma: bool, allow14=None):
    """Vertical-edge pass.  plane: (H, W); edges between nblk-px block
    columns; edge_on: (H, n_edges) bool per line (split-map gating).
    allow14: optional per-line size cap (False = an adjacent 8x8/4x4 tx
    caps the filter at 8 taps luma / 4 taps chroma)."""
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
        out = _filter_luma_lines(win, limit, blimit, thresh, bd,
                                 allow14=allow14)
    else:
        out = _filter_chroma_lines(win, limit, blimit, thresh, bd,
                                   allow6=allow14)
    sel = jnp.where(edge_on[..., None], out, win[..., taps - mod : taps + mod])
    # stitch back: modified columns are x-mod..x+mod-1 for each edge.
    # Concatenate, not `.at[].set` — the scatter form hits an XLA:CPU
    # multi-consumer fusion miscompile (see _deblock_interior_v).
    blocks = plane.reshape(h, w // nblk, nblk)
    left_new = sel[..., :mod]              # tail of block i (cols nblk-mod..)
    right_new = sel[..., mod:]             # head of block i+1
    heads = jnp.concatenate([blocks[:, :1, :mod], right_new], axis=1)
    tails = jnp.concatenate([left_new, blocks[:, -1:, nblk - mod :]],
                            axis=1)
    new = jnp.concatenate([heads, blocks[:, :, mod : nblk - mod], tails],
                          axis=-1)
    return new.reshape(h, w)


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
                   sharpness: int = 0, bit_depth: int = 8, split16=None):
    """Apply the loop filter to recon planes (composable inside other
    jits; levels may be traced scalars — a level of 0 disables the plane
    pass via the edge gates).  v_on16/h_on16: per-16-block boundary
    enables (rows, cols-1)/(rows-1, cols) from edge_gates[_j].

    split16: optional (rows, cols) map of 16-blocks split into 8x8 TX
    sub-blocks (av1tpu/models/inter_v.py).  Those blocks add interior tx
    edges at the 8-px (luma) / 4-px (chroma) offsets, and cap the filter
    size of their outer edges at 8 taps luma / 4 taps chroma (spec
    7.14.5: filter size = min tx dim across the edge).  The interior
    passes run FIRST: with the caps every edge's read/modify region is
    disjoint from the outer passes' regions, so this static-slice
    pipeline equals the spec's sequential in-place edge walk."""
    v16 = jnp.asarray(v_on16)
    h16 = jnp.asarray(h_on16)
    # per-line expansion helpers: block-edge maps -> sample-line maps.
    # Vertical passes run on the plane directly (lines = H); horizontal
    # passes run on the transposed plane (lines = W), so their maps are
    # built from the transposed block grids.
    ex = lambda a, n: jnp.kron(a.astype(jnp.int32),
                               jnp.ones((n, 1), jnp.int32)).astype(bool)
    li_y, bl_y, th_y = _thresholds(lvl_y, sharpness)
    li_u, bl_u, th_u = _thresholds(lvl_u, sharpness)
    li_v, bl_v, th_v = _thresholds(lvl_v, sharpness)

    if split16 is None:
        yy = _deblock_plane(y, 16, ex(v16, 16) & (lvl_y > 0),
                            ex(h16.T, 16) & (lvl_y > 0),
                            li_y, bl_y, th_y, bit_depth, True)
        uu = _deblock_plane(u, 8, ex(v16, 8) & (lvl_u > 0),
                            ex(h16.T, 8) & (lvl_u > 0), li_u, bl_u, th_u,
                            bit_depth, False)
        vv = _deblock_plane(v, 8, ex(v16, 8) & (lvl_v > 0),
                            ex(h16.T, 8) & (lvl_v > 0), li_v, bl_v, th_v,
                            bit_depth, False)
        return yy, uu, vv

    s = jnp.asarray(split16).astype(bool)
    cap_v = ~(s[:, 1:] | s[:, :-1])        # (rows, cols-1) both sides >=16
    cap_h = ~(s[1:, :] | s[:-1, :])        # (rows-1, cols)

    # spec pass order per plane: ALL vertical edges, then ALL horizontal
    # (spec 7.14.1).  Within a direction the interior (8/4-px) edges come
    # first — with the size caps their read/modify regions are disjoint
    # from the boundary edges' writes, except the boundary reads the
    # interior's outputs exactly as the raster edge walk would.
    f8y = lambda w: _filter_luma8_lines(w, li_y, bl_y, th_y, bit_depth)
    f4u = lambda w: _filter_chroma4_lines(w, li_u, bl_u, th_u, bit_depth)
    f4v = lambda w: _filter_chroma4_lines(w, li_v, bl_v, th_v, bit_depth)

    # luma: vertical (interior then boundary), then horizontal
    yy = _deblock_interior_v(y, 16, 8, 4, 3, ex(s, 16) & (lvl_y > 0), f8y)
    yy = _deblock_plane_v(yy, 16, ex(v16, 16) & (lvl_y > 0), li_y, bl_y,
                          th_y, bit_depth, True, allow14=ex(cap_v, 16))
    yy = yy.T
    yy = _deblock_interior_v(yy, 16, 8, 4, 3,
                             ex(s.T, 16) & (lvl_y > 0), f8y)
    yy = _deblock_plane_v(yy, 16, ex(h16.T, 16) & (lvl_y > 0), li_y,
                          bl_y, th_y, bit_depth, True,
                          allow14=ex(cap_h.T, 16)).T

    # chroma planes
    uu = _deblock_interior_v(u, 8, 4, 2, 2, ex(s, 8) & (lvl_u > 0), f4u)
    uu = _deblock_plane_v(uu, 8, ex(v16, 8) & (lvl_u > 0), li_u, bl_u,
                          th_u, bit_depth, False, allow14=ex(cap_v, 8))
    uu = uu.T
    uu = _deblock_interior_v(uu, 8, 4, 2, 2,
                             ex(s.T, 8) & (lvl_u > 0), f4u)
    uu = _deblock_plane_v(uu, 8, ex(h16.T, 8) & (lvl_u > 0), li_u,
                          bl_u, th_u, bit_depth, False,
                          allow14=ex(cap_h.T, 8)).T

    vv = _deblock_interior_v(v, 8, 4, 2, 2, ex(s, 8) & (lvl_v > 0), f4v)
    vv = _deblock_plane_v(vv, 8, ex(v16, 8) & (lvl_v > 0), li_v, bl_v,
                          th_v, bit_depth, False, allow14=ex(cap_v, 8))
    vv = vv.T
    vv = _deblock_interior_v(vv, 8, 4, 2, 2,
                             ex(s.T, 8) & (lvl_v > 0), f4v)
    vv = _deblock_plane_v(vv, 8, ex(h16.T, 8) & (lvl_v > 0), li_v,
                          bl_v, th_v, bit_depth, False,
                          allow14=ex(cap_h.T, 8)).T
    return yy, uu, vv


@functools.partial(jax.jit, static_argnames=("sharpness", "bit_depth"))
def deblock_tpu(y, u, v, v_on16, h_on16, lvl_y, lvl_u, lvl_v,
                sharpness: int = 0, bit_depth: int = 8):
    return deblock_planes(y, u, v, v_on16, h_on16, lvl_y, lvl_u, lvl_v,
                          sharpness, bit_depth)
