"""Jitted CDEF for the production TPU pipelines (spec 7.15).

Bit-exact vectorization of the engine oracle (av1tpu/spec/cdef.py, itself
validated sample-exactly against libdav1d/libaom):

- Direction search: each 8x8 luma block's eight directional partial-sum
  histograms are one matmul — blocks (N, 64) against a static 0/1
  assignment matrix (64, 90) mapping pixel position to (direction, bin) —
  so the whole frame's search rides the MXU; costs are exact int32
  (worst-case 8.8e8 < 2^31 per direction).
- Filtering: per direction the 4 primary + 8 secondary taps are static
  whole-plane shifts of the padded pre-CDEF image; constrain() sums and
  the min/max clamp are elementwise, and the per-pixel result is selected
  by the block direction map.  No gathers anywhere.

Strengths are traced scalars (frame-adaptive search recompiles nothing);
damping and bit depth are static.  Replaces capability the reference
delegates to SVT-AV1 (reference crates/daemon/src/encode/av1an.rs:14).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.spec.cdef import CDEF_DIRECTIONS, DIV_TABLE

CDEF_VERY_LARGE = 0x4000

# ---------------------------------------------------------------- direction

# bin index per direction for pixel (i, j) of an 8x8 block (spec 7.15.2)
_BIN_FN = (
    lambda i, j: i + j,            # 0: 15 bins
    lambda i, j: i + j // 2,       # 1: 11 bins
    lambda i, j: i,                # 2:  8 bins
    lambda i, j: 3 + i - j // 2,   # 3: 11 bins
    lambda i, j: 7 + i - j,        # 4: 15 bins
    lambda i, j: 3 - i // 2 + j,   # 5: 11 bins
    lambda i, j: j,                # 6:  8 bins
    lambda i, j: i // 2 + j,       # 7: 11 bins
)
_NBINS = (15, 11, 8, 11, 15, 11, 8, 11)


def _dir_tables():
    """(64, 90) 0/1 bin assignment and (90,) cost weights."""
    total = sum(_NBINS)
    a = np.zeros((64, total), np.float32)
    w = np.zeros(total, np.int32)
    w_even = [DIV_TABLE[min(i, 14 - i) + 1] for i in range(15)]
    w_odd = ([DIV_TABLE[2 * j + 2] for j in range(3)] + [105] * 5
             + [DIV_TABLE[2 * j + 2] for j in (2, 1, 0)])
    w_axis = [105] * 8
    per_dir_w = {0: w_even, 4: w_even, 2: w_axis, 6: w_axis}
    off = 0
    for d in range(8):
        nb = _NBINS[d]
        for i in range(8):
            for j in range(8):
                a[i * 8 + j, off + _BIN_FN[d](i, j)] = 1.0
        w[off : off + nb] = per_dir_w.get(d, w_odd)
        off += nb
    return a, w


_A, _W = _dir_tables()


def cdef_dirs(y: jnp.ndarray, coeff_shift: int):
    """Per-8x8-block (direction, variance) maps from the deblocked luma.
    y: (H, W) int; returns (dir (H/8, W/8) int32, var int32)."""
    h, w = y.shape
    nbr, nbc = h // 8, w // 8
    img = (y.astype(jnp.int32) >> coeff_shift) - 128
    blocks = img.reshape(nbr, 8, nbc, 8).transpose(0, 2, 1, 3).reshape(
        nbr * nbc, 64)
    # MXU matmul; |partial| <= 1024 so f32 accumulation is exact
    part = jnp.dot(blocks.astype(jnp.float32), jnp.asarray(_A),
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    # per-direction cost reduction in exact int32 (cost <= 8.8e8; f32
    # would round above 2^24)
    cb = part * part * jnp.asarray(_W)[None, :]
    off = 0
    cols = []
    for d in range(8):
        cols.append(cb[:, off : off + _NBINS[d]].sum(axis=1,
                                                     dtype=jnp.int32))
        off += _NBINS[d]
    cost = jnp.stack(cols, axis=-1)                       # (N, 8) exact
    best = jnp.argmax(cost, axis=-1).astype(jnp.int32)
    cbest = jnp.take_along_axis(cost, best[:, None], axis=-1)[:, 0]
    copp = jnp.take_along_axis(cost, (best ^ 4)[:, None], axis=-1)[:, 0]
    var = (cbest - copp) >> 10
    return best.reshape(nbr, nbc), var.reshape(nbr, nbc)


# ---------------------------------------------------------------- filtering

def _floor_log2(x):
    return 31 - jax.lax.clz(jnp.maximum(x, 1).astype(jnp.int32))


def _constrain(diff, threshold, damping):
    """Vector constrain (spec 7.15.3); threshold per-pixel or scalar
    (zero disables), damping a traced scalar."""
    damp_adj = jnp.maximum(0, damping - _floor_log2(threshold))
    ad = jnp.abs(diff)
    m = jnp.minimum(ad, jnp.maximum(0, threshold - (ad >> damp_adj)))
    return jnp.where(diff < 0, -m, m) * (threshold > 0)


def _filter_plane(plane, dir_px, pri_px, pri_parity, sec, damping, h, w):
    """One plane pass.  plane: (H, W) pre-CDEF samples; dir_px: per-pixel
    direction; pri_px: per-pixel effective primary strength (var-adjusted
    for luma, << coeff_shift); pri_parity: 0/1 per pixel or scalar —
    parity of the ADJUSTED strength in coded units (spec 7.15.3:
    (priStr >> coeffShift) & 1), picking (4,2) vs (3,3) primary taps;
    sec: scalar shifted secondary strength (3->4 applied); damping:
    traced plane-adjusted scalar."""
    pad = jnp.full((h + 4, w + 4), CDEF_VERY_LARGE, jnp.int32)
    pad = jax.lax.dynamic_update_slice(pad, plane.astype(jnp.int32), (2, 2))
    px = plane.astype(jnp.int32)
    pt = (jnp.int32(4) - pri_parity, jnp.int32(2) + pri_parity)
    st = (2, 1)
    sec_b = jnp.asarray(sec, jnp.int32)

    taps = {}

    def tap(dy, dx):
        if (dy, dx) not in taps:
            taps[(dy, dx)] = jax.lax.dynamic_slice(
                pad, (2 + dy, 2 + dx), (h, w))
        return taps[(dy, dx)]

    sum_sel = jnp.zeros_like(px)
    mn_sel = px
    mx_sel = px
    for d in range(8):
        summ = jnp.zeros_like(px)
        mn = px
        mx = px
        for k in range(2):
            dy, dx = CDEF_DIRECTIONS[d][k]
            for s in (1, -1):
                p = tap(s * dy, s * dx)
                summ = summ + pt[k] * _constrain(p - px, pri_px, damping)
                mx = jnp.maximum(mx, jnp.where(p == CDEF_VERY_LARGE,
                                               jnp.int32(-1), p))
                mn = jnp.minimum(mn, p)
            for off in (2, 6):
                d2 = (d + off) & 7
                dy2, dx2 = CDEF_DIRECTIONS[d2][k]
                for s in (1, -1):
                    p = tap(s * dy2, s * dx2)
                    summ = summ + st[k] * _constrain(p - px, sec_b,
                                                     damping)
                    mx = jnp.maximum(mx, jnp.where(p == CDEF_VERY_LARGE,
                                                   jnp.int32(-1), p))
                    mn = jnp.minimum(mn, p)
        m = dir_px == d
        sum_sel = jnp.where(m, summ, sum_sel)
        mn_sel = jnp.where(m, mn, mn_sel)
        mx_sel = jnp.where(m, mx, mx_sel)

    out = px + ((8 + sum_sel - (sum_sel < 0)) >> 4)
    return jnp.clip(out, mn_sel, mx_sel)


def cdef_planes(y, u, v, skip8, pri_y, sec_y, pri_uv, sec_uv,
                damping: int = 3, bit_depth: int = 8):
    """Apply CDEF to deblocked recon planes (cdef_bits = 0: one frame-wide
    preset).  y/u/v: int planes (4:2:0); skip8: (H/8, W/8) bool — True =
    every covering block coded skip (unit unfiltered, spec 7.15.1).
    pri/sec are the CODED header values as traced scalars (sec 3 means 4).
    Composable inside other jits; all-zero strengths pass through."""
    coeff_shift = bit_depth - 8
    h, w = y.shape
    pri_y = jnp.asarray(pri_y, jnp.int32)
    sec_y = jnp.asarray(sec_y, jnp.int32)
    pri_uv = jnp.asarray(pri_uv, jnp.int32)
    sec_uv = jnp.asarray(sec_uv, jnp.int32)
    sec_y_eff = (sec_y + (sec_y == 3)) << coeff_shift
    sec_uv_eff = (sec_uv + (sec_uv == 3)) << coeff_shift

    # direction search only when some primary strength is nonzero
    # (spec 7.15.1; secondary-only filters along dir 0 with var 0)
    any_pri = (pri_y > 0) | (pri_uv > 0)
    dir8, var8 = cdef_dirs(y, coeff_shift)
    dir8 = jnp.where(any_pri, dir8, 0)
    var8 = jnp.where(any_pri, var8, 0)

    # luma primary: variance-modulated per block (spec adjust_strength,
    # applied to the bitdepth-shifted strength)
    v6 = var8 >> 6
    i = jnp.where(v6 > 0, jnp.minimum(_floor_log2(v6), 12), 0)
    pri_y_sh = pri_y << coeff_shift
    pri_y_blk = jnp.where(var8 > 0, (pri_y_sh * (4 + i) + 8) >> 4, 0)

    up8 = lambda a: jnp.repeat(jnp.repeat(a, 8, 0), 8, 1)
    up4 = lambda a: jnp.repeat(jnp.repeat(a, 4, 0), 4, 1)
    live = ~skip8

    # tap-pair parity follows the per-block ADJUSTED strength
    par_y = (pri_y_blk >> coeff_shift) & 1
    yy = _filter_plane(y, up8(dir8), up8(pri_y_blk), up8(par_y),
                       sec_y_eff, damping + coeff_shift, h, w)
    yy = jnp.where(up8(live) & ((pri_y > 0) | (sec_y > 0)), yy,
                   y.astype(jnp.int32))

    ch, cw = u.shape
    dir_c = up4(dir8)
    pri_uv_px = jnp.broadcast_to(pri_uv << coeff_shift, (ch, cw))
    livec = up4(live) & ((pri_uv > 0) | (sec_uv > 0))
    dmp_c = damping - 1 + coeff_shift
    uu = _filter_plane(u, dir_c, pri_uv_px, pri_uv & 1, sec_uv_eff,
                       dmp_c, ch, cw)
    vv = _filter_plane(v, dir_c, pri_uv_px, pri_uv & 1, sec_uv_eff,
                       dmp_c, ch, cw)
    uu = jnp.where(livec, uu, u.astype(jnp.int32))
    vv = jnp.where(livec, vv, v.astype(jnp.int32))
    return yy, uu, vv


@functools.partial(jax.jit, static_argnames=("damping", "bit_depth"))
def cdef_tpu(y, u, v, skip8, pri_y, sec_y, pri_uv, sec_uv,
             damping: int = 3, bit_depth: int = 8):
    return cdef_planes(y, u, v, skip8, pri_y, sec_y, pri_uv, sec_uv,
                       damping, bit_depth)


# ------------------------------------------------------- production glue

def skip16_from_levels(y16, u8, v8):
    """Coded-skip per 16x16 block from slot-layout level grids — must
    match the packer's rule exactly (skip = zy && zu && zv,
    native/coding/pack.cpp code_block_common/code_block_inter): the
    decoder's CDEF gating reads these coded flags (spec 7.15.1)."""
    zy = (y16 == 0).all(axis=(2, 3))
    zu = (u8 == 0).all(axis=(2, 3))
    zv = (v8 == 0).all(axis=(2, 3))
    return zy & zu & zv


def merge_skip16(skip16, split32, split64):
    """Effective per-16-slot skip under 32/64 NONE merges: a merged
    block's single coded skip covers every slot, and it is skip iff all
    its slots' levels are zero."""
    r16, c16 = skip16.shape
    rep2 = lambda a: jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)
    rep4 = lambda a: jnp.repeat(jnp.repeat(a, 4, 0), 4, 1)
    g32 = skip16.reshape(r16 // 2, 2, c16 // 2, 2).all(axis=(1, 3))
    s = jnp.where(rep2(~split32.astype(bool)), rep2(g32), skip16)
    g64 = skip16.reshape(r16 // 4, 4, c16 // 4, 4).all(axis=(1, 3))
    s = jnp.where(rep4(~split64.astype(bool)), rep4(g64), s)
    return s


def skip8_of(skip16):
    """Per-8x8-CDEF-unit skip: each 16-block's flag covers its 4 units
    (all 4 mi of a unit lie inside one coded block)."""
    return jnp.repeat(jnp.repeat(skip16, 2, 0), 2, 1)


def skip8_split(skip16, split16, y16, u8, v8):
    """Per-8x8-unit skip when 16-blocks may split into 8x8 sub-blocks:
    each sub-block carries its own coded skip flag (= its quadrant of the
    union level slots is all-zero, matching the packer's
    GridsPart::load8 rule), while unsplit blocks keep the block flag."""
    r16, c16 = skip16.shape
    q = lambda a, n: (a.reshape(r16, c16, 2, n, 2, n) == 0).all(
        axis=(3, 5)).transpose(0, 2, 1, 3).reshape(2 * r16, 2 * c16)
    s8sub = q(y16, 8) & q(u8, 4) & q(v8, 4)
    rep2 = lambda a: jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)
    return jnp.where(rep2(split16.astype(bool)), s8sub, skip8_of(skip16))


def skip8_host(bitmap: np.ndarray, height: int, width: int,
               split32=None, split64=None) -> np.ndarray:
    """Host-side skip8 from a compact significance bitmap (the per-slot
    [y16 | u8 | v8] flat layout shared by every production transport).
    split maps (part layouts) apply the 32/64 merge rule."""
    r16, c16 = height // 16, width // 16
    nb = r16 * c16
    ncoef = nb * 256 + 2 * nb * 64
    sig = np.unpackbits(bitmap.view(np.uint8), bitorder="little")[:ncoef]
    ny = nb * 256
    y_nz = sig[:ny].reshape(nb, 256).any(axis=1)
    u_nz = sig[ny : ny + nb * 64].reshape(nb, 64).any(axis=1)
    v_nz = sig[ny + nb * 64 :].reshape(nb, 64).any(axis=1)
    s16 = (~(y_nz | u_nz | v_nz)).reshape(r16, c16)
    if split32 is not None:
        s16 = np.asarray(merge_skip16(jnp.asarray(s16),
                                      jnp.asarray(split32),
                                      jnp.asarray(split64)))
    return np.repeat(np.repeat(s16, 2, 0), 2, 1)


def _unfuse(f, height: int, width: int):
    ny = height * width
    nc = ny // 4
    return (f[:ny].reshape(height, width).astype(jnp.int32),
            f[ny : ny + nc].reshape(height // 2, width // 2)
            .astype(jnp.int32),
            f[ny + nc :].reshape(height // 2, width // 2)
            .astype(jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "damping",
                                    "bit_depth"))
def cdef_fused(ref_fused, skip8, cdef_s, height: int, width: int,
               damping: int = 3, bit_depth: int = 8):
    """Apply CDEF to a fused [y|u|v] recon (the CLI's reference carry
    format).  cdef_s: (4,) int32 coded strengths (pri_y, sec_y, pri_uv,
    sec_uv)."""
    y, u, v = _unfuse(ref_fused, height, width)
    yy, uu, vv = cdef_planes(y, u, v, skip8, cdef_s[0], cdef_s[1],
                             cdef_s[2], cdef_s[3], damping, bit_depth)
    return jnp.concatenate([yy.reshape(-1), uu.reshape(-1),
                            vv.reshape(-1)])


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "damping",
                                    "bit_depth"))
def cdef_sse_fused(ref_fused, src_fused, skip8, cdef_s, height: int,
                   width: int, damping: int = 3, bit_depth: int = 8):
    """Distortion of the CDEF'd recon vs the source (sum of squared error
    over all planes) — the per-preset score of the frame-level strength
    search."""
    y, u, v = _unfuse(ref_fused, height, width)
    sy, su, sv = _unfuse(src_fused.astype(jnp.int32), height, width)
    yy, uu, vv = cdef_planes(y, u, v, skip8, cdef_s[0], cdef_s[1],
                             cdef_s[2], cdef_s[3], damping, bit_depth)
    e = lambda a, b: jnp.sum((a - b).astype(jnp.float32) ** 2)
    return e(yy, sy) + e(uu, su) + e(vv, sv)


# candidate frame-wide presets for the per-scene strength search
# (weakest first: SSE ties resolve to less filtering)
CDEF_PRESETS = np.array([
    (0, 0, 0, 0), (1, 0, 1, 0), (1, 1, 1, 1), (2, 1, 2, 1),
    (4, 1, 3, 1), (6, 2, 4, 1), (9, 2, 6, 2), (12, 3, 9, 3),
], np.int32)


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "bit_depth"))
def _select_strengths_j(ref_fused, src_fused, skip8, height: int,
                        width: int, bit_depth: int = 8):
    presets = jnp.asarray(CDEF_PRESETS)
    sses = jax.vmap(
        lambda p: cdef_sse_fused(ref_fused, src_fused, skip8, p, height,
                                 width, 3, bit_depth))(presets)
    return jnp.argmin(sses)


def select_strengths(ref_fused, src_fused, skip8, height: int, width: int,
                     bit_depth: int = 8) -> np.ndarray:
    """Frame-level CDEF strength search: try each preset, keep the one
    with least distortion vs the source.  All presets evaluate in ONE
    vmapped dispatch (argmin on device; a single scalar crosses the
    link) — same tie-breaking as the scene-batched _scenes_cdef (first
    minimum = weakest preset)."""
    best = int(_select_strengths_j(ref_fused, src_fused, skip8, height,
                                   width, bit_depth))
    return CDEF_PRESETS[best]
