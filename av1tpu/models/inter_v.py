"""TPU inter-frame encode pipeline.

Unlike intra (wavefront-constrained), an inter frame is embarrassingly
block-parallel given the previous frame's reconstruction: every 16x16 block
independently searches motion in the reference, motion-compensates, and
codes its residual.  The whole frame is a handful of batched matmuls plus
two gathers — the shape TPUs like best.

Motion search is hierarchical and fully vectorized:
  1. coarse: 4x-downsampled SAD sweep over a +-8-sample grid (= +-32 px
     full res, 4-px granularity), row shifts batched into one tensor;
  2. refine: per-block reference patches assembled at the coarse MV
     (static tile concat + masked selects — no TPU gather), then a +-2 px
     full-pel sweep (static slices, batched);
  3. subpel: a +-3/4-px quarter-pel sweep (49 candidates) on re-assembled
     24x24 patches, every candidate interpolated with the normative 8-tap
     EIGHTTAP-regular filter (shared horizontal passes per column phase),
     with the same dominant-offset coherence snap as the integer stages.
Luma MVs are quarter-pel (even 1/8-pel units — allow_high_precision_mv=0);
both luma and chroma compensation use the normative separable 8-tap
interpolation, matching the spec engine's `_predict_inter`
(av1tpu/spec/tile.py) bit-exactly, including its frame-bound clamps
(index clips / edge padding here).

Residuals: luma DCT 16x16, chroma DCT 8x8 (inter chroma derives DCT_DCT,
spec tile.py:826), deadzone quantization shared with the intra pipeline.
Every partition size also runs a joint skip-vs-code RD choice (_skip_rdo):
with near-perfect MC the residual is the previous frame's quantization
noise, and re-coding it every frame is what SVT's skip decision avoids —
on translating/static content this is a multi-x bitrate lever.

Replaces the reference's SVT-AV1 inter coding (reference
crates/daemon/src/encode/av1an.rs:14 --keyint 240 --lookahead 40).
Conformance: tests/test_inter_pipeline.py replays these decisions through
the spec engine and both system decoders.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.models.intra_v import _plane_params, quantize_coefs
from av1tpu.ops.transforms_jax import forward_matrix, inverse_transform

_SPLIT_OVERHEAD_BITS = 12.0  # extra signaling of 4 sub-blocks vs 1 merged

# Merge-RDO lambda discount: every inter frame is the next frame's
# reference, so distortion admitted by a merge propagates down the chain
# while the bit saving is one-time.  Discounting lambda biases the
# comparison toward quality.  Swept on the corpus (benchmarks/).
_REF_LAM_SCALE = 0.3
# MV-rate bias weight in the search (swept on the corpus): real MV cost is
# the diff from the stack prediction, near zero for coherent motion fields,
# so the absolute-magnitude proxy must be weighted well below lambda*bits
_MV_BIAS = 0.3

# search geometry (full-pel luma units; odd MVs allowed — chroma gets
# normative half-pel interpolation)
_COARSE_R = 8      # +-8 at quarter res = +-32 px, step 4 px
_REFINE_R = 2      # +-2 px local refine, step 1 px (covers the 4-px coarse
#                    grid granularity at full-pel resolution)
_PATCH = 16 + 2 * _REFINE_R      # gathered per-block reference patch side
MAX_MV_PX = 4 * _COARSE_R + _REFINE_R
_GLOBAL_K = 4      # coarse global-shift candidates re-judged at full res


def _block_sad(diff, n: int):
    """(H, W) abs-diff -> (H/n, W/n) block sums (int32 accumulation: the
    inputs may be int16, whose 256-element block sums overflow)."""
    h, w = diff.shape
    return diff.reshape(h // n, n, w // n, n).sum(axis=(1, 3),
                                                  dtype=jnp.int32)


def _sdt(pix_max: int):
    """Smallest dtype holding a pixel: the search/MC patch tensors are
    HBM-bandwidth bound, and pixels need 1 (8-bit) or 2 (10-bit) bytes,
    not the int32 the coding path uses — a 4x/2x traffic cut on the
    masked-select patch assemblies, the SAD sweeps and the filter
    reads.  All arithmetic still happens in >=int16 registers (numpy
    promotion); only the stored/streamed tensors shrink."""
    return jnp.uint8 if pix_max == 255 else jnp.int16


def _coarse_search(src_q, ref_q, lam, snap_margin):
    """Quarter-res full search.  src_q/ref_q: (H/4, W/4) int32.  Returns
    (r16, c16, 2) int32 full-res even-pel MV (multiples of 4 px).

    Vectorized over row shifts (one stacked tensor) with a short loop over
    column shifts — 17 sizable ops instead of a 289-step scan, which on the
    remote-dispatch path is latency-, not FLOP-, bound."""
    hq, wq = src_q.shape
    rows, cols = hq // 4, wq // 4          # 4x4 quarter blocks = 16x16 full
    r = _COARSE_R
    nd = 2 * r + 1
    src_q = src_q.astype(jnp.int16)        # quarter-res means fit int16;
    pad = jnp.pad(ref_q.astype(jnp.int16), r, mode="edge")  # halves the
    rows_sh = jnp.stack([pad[r + dy : r + dy + hq, :]       # sweep reads
                         for dy in range(-r, r + 1)])   # (nd, hq, wq+2r)
    dys = jnp.arange(-r, r + 1, dtype=jnp.int32)

    # rate bias: prefer short MVs (and strongly prefer zero, which signals
    # as GLOBALMV); log-ish cost matches MV coding's class structure
    def mv_bias(m):
        m = jnp.abs(m).astype(jnp.float32) * 4.0
        return jnp.where(m > 0, 3.0 + jnp.log2(1.0 + m), 0.0)

    bias_dy = lam * mv_bias(dys)                        # (nd,)
    best_cost = jnp.full((rows, cols), jnp.inf, jnp.float32)
    best_sad = jnp.full((rows, cols), jnp.inf, jnp.float32)
    best_dy = jnp.zeros((rows, cols), jnp.int32)
    best_dx = jnp.zeros((rows, cols), jnp.int32)
    sad_cols = []                                       # per-dx (nd, r, c)
    for dx in range(-r, r + 1):
        cand = rows_sh[:, :, r + dx : r + dx + wq]      # (nd, hq, wq)
        diff = jnp.abs(src_q[None] - cand)
        sad = diff.reshape(nd, rows, 4, cols, 4).sum(
            axis=(2, 4), dtype=jnp.float32)             # (nd, rows, cols)
        sad_cols.append(sad)
        cost = sad + (bias_dy + lam * mv_bias(dx))[:, None, None]
        k = jnp.argmin(cost, axis=0)                    # (rows, cols)
        c = jnp.min(cost, axis=0)
        take = c < best_cost
        best_cost = jnp.where(take, c, best_cost)
        best_sad = jnp.where(take, jnp.min(sad, axis=0), best_sad)
        best_dy = jnp.where(take, dys[k], best_dy)
        best_dx = jnp.where(take, dx, best_dx)

    # coherence snap: an incoherent MV field costs a NEWMV diff per block
    # while residual-SAD differences on noisy content are just noise
    # fitting.  Snap each block to the frame-dominant shift whenever that
    # is nearly as good — the MV stack then makes those blocks almost free
    # (NEAREST/GLOBALMV).  For static content the dominant shift IS zero.
    all_sad = jnp.stack(sad_cols, 1)                    # (nd_dy, nd_dx, r, c)
    totals = all_sad.sum(axis=(2, 3))
    g = jnp.argmin(totals.reshape(-1))
    g_dy, g_dx = g // nd, g % nd
    sad_g = all_sad.reshape(nd * nd, rows, cols)[g]
    snap_g = sad_g <= best_sad + snap_margin

    # second coarse candidate per block, from a DIFFERENT basin (Chebyshev
    # > 1 q-sample from the winner): on fine texture the 4x4-pooled SAD at
    # the true-motion candidate is only marginally better than noise, so
    # the argmin routinely lands in a wrong basin the +-2 full-pel refine
    # can never escape — the full-resolution refine downstream re-judges
    # both candidates and keeps whichever truly matches (the per-block
    # analog of _global_full's top-K rescue)
    cost_vol = (all_sad + bias_dy[:, None, None, None]
                + bias_dy[None, :, None, None])         # (nd, nd, r, c)
    ddy = jnp.abs(dys[:, None, None, None] - best_dy[None, None])
    ddx = jnp.abs(dys[None, :, None, None] - best_dx[None, None])
    near = (jnp.maximum(ddy, ddx) <= 1)
    masked = jnp.where(near, jnp.inf, cost_vol).reshape(nd * nd, rows,
                                                        cols)
    k2 = jnp.argmin(masked, axis=0)
    c2_dy = dys[k2 // nd]
    c2_dx = dys[k2 % nd]

    best_dy = jnp.where(snap_g, dys[g_dy], best_dy)
    best_dx = jnp.where(snap_g, dys[g_dx], best_dx)
    # top-K global shift candidates by quarter-res totals, re-judged at
    # FULL resolution downstream (_global_full): box-pooled SAD aliases on
    # periodic texture — the quarter-res argmin alone routinely lands a
    # period off the true global motion, which the +-2 refine can never
    # recover (the texture-corpus MV bug this stage replaces)
    _, topi = jax.lax.top_k(-totals.reshape(-1), _GLOBAL_K)
    shifts4 = jnp.stack([dys[topi // nd], dys[topi % nd]], axis=-1) * 4
    return (jnp.stack([best_dy, best_dx], axis=-1) * 4,
            jnp.stack([c2_dy, c2_dx], axis=-1) * 4, shifts4)


def _patches_select(ref, coarse_px):
    """Per-block (_PATCH x _PATCH) reference patches at the coarse MV,
    built WITHOUT a gather: static overlapping 48x48 block tiles (pure
    reshape/concat), then masked selects over the coarse offset's
    block-aligned part (5x5) and 4-px remainders (4+4).  TPU gathers run
    on the scalar path (~10 ns/element); this formulation is pure vector
    selects.  Everything streams in the pixel dtype (ref arrives
    uint8/int16, see _sdt) — a 4x/2x HBM-traffic cut on the dominant
    masked-select reads vs the int32 original.  Bit-identical to
    _gather_patches(ref, coarse_px, 16, _REFINE_R) — the frame-bound
    clamp becomes edge padding."""
    h, w = ref.shape
    rows, cols = h // 16, w // 16
    R = _REFINE_R
    dt = ref.dtype
    # decompose coarse = 16*A + B, A in [-2, 2], B in {0, 4, 8, 12}
    A_r = (coarse_px[..., 0] + 32) // 16 - 2
    B_r = coarse_px[..., 0] - 16 * A_r
    A_c = (coarse_px[..., 1] + 32) // 16 - 2
    B_c = coarse_px[..., 1] - 16 * A_c

    # 48x48 tiles starting one block above/left of each (extended) block:
    # X[re, ce] = refp[(re-1)*16 : (re+2)*16, (ce-1)*16 : (ce+2)*16] over a
    # +-2-block extended grid, refp edge-padded by 3 blocks
    refp = jnp.pad(ref, 48, mode="edge")
    rowsE, colsE = rows + 4, cols + 4
    Bp = (refp.reshape(rows + 6, 16, cols + 6, 16)
          .transpose(0, 2, 1, 3))                  # (rows+6, cols+6, 16, 16)
    XR = jnp.concatenate([Bp[0:rowsE], Bp[1 : rowsE + 1],
                          Bp[2 : rowsE + 2]], axis=2)
    X = jnp.concatenate([XR[:, 0:colsE], XR[:, 1 : colsE + 1],
                         XR[:, 2 : colsE + 2]], axis=3)  # (rowsE,colsE,48,48)

    # block-aligned shift: 5x5 masked select (per-target-block masks;
    # both shift components vary per block, so the joint select cannot
    # be split into 1-D stages)
    Y = jnp.zeros((rows, cols, 48, 48), dt)
    for a in range(-2, 3):
        row_m = A_r == a
        for a2 in range(-2, 3):
            m = (row_m & (A_c == a2))[..., None, None]
            Y = Y + jnp.where(
                m, X[2 + a : 2 + a + rows, 2 + a2 : 2 + a2 + cols],
                0).astype(dt)

    # 4-px remainder: patch row k reads tile row B + 16 - R + k
    m0 = 16 - R
    Z = jnp.zeros((rows, cols, _PATCH, 48), dt)
    for b in range(0, 16, 4):
        m = (B_r == b)[..., None, None]
        Z = Z + jnp.where(m, Y[:, :, m0 + b : m0 + b + _PATCH, :],
                          0).astype(dt)
    P = jnp.zeros((rows, cols, _PATCH, _PATCH), dt)
    for b in range(0, 16, 4):
        m = (B_c == b)[..., None, None]
        P = P + jnp.where(m, Z[..., m0 + b : m0 + b + _PATCH],
                          0).astype(dt)
    return P


def _gather_patches(ref, mv_px, n: int, pad_each: int):
    """Per-block reference patches at the block MV.  ref: (H, W); mv_px:
    (rows, cols, 2) full-pel px.  Returns (rows, cols, n+2p, n+2p) with
    reads clamped to frame bounds (normative MC clamp)."""
    h, w = ref.shape
    rows, cols = mv_px.shape[:2]
    m = n + 2 * pad_each
    ys = (jnp.arange(rows)[:, None, None, None] * n - pad_each
          + jnp.arange(m)[None, None, :, None] + mv_px[:, :, 0:1, None])
    xs = (jnp.arange(cols)[None, :, None, None] * n - pad_each
          + jnp.arange(m)[None, None, None, :] + mv_px[:, :, None, 1:2])
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    return ref[ys, xs]


def _refine_search(src_b16, patches, coarse_px, lam):
    """+-_REFINE_R even-pel sweep on gathered patches with an incremental
    running minimum (no K-way candidate stack in HBM, no gather for the
    winner).  src_b16: (rows, cols, 16, 16) int16; patches: (rows, cols,
    _PATCH, _PATCH) in the pixel dtype.  Returns (mv (rows, cols, 2)
    full-res px, sad, cost).  The winning prediction is NOT carried: the
    subpel stage recomputes every candidate's normative MC anyway, so
    carrying it here was 25 dead full-frame selects per base.

    No per-offset coherence snap here: a frame-dominant offset relative
    to MIXED per-block coarse bases is meaningless (it once snapped flat
    blocks to junk on the texture corpus); field coherence comes from the
    absolute full-resolution global snap in _search_mv instead."""
    shape = src_b16.shape[:2]
    best_cost = jnp.full(shape, jnp.inf, jnp.float32)
    best_sad = jnp.full(shape, jnp.inf, jnp.float32)
    best = jnp.zeros(shape + (2,), jnp.int32)
    for dy in range(-_REFINE_R, _REFINE_R + 1):
        for dx in range(-_REFINE_R, _REFINE_R + 1):
            cand = patches[:, :, _REFINE_R + dy : _REFINE_R + dy + 16,
                           _REFINE_R + dx : _REFINE_R + dx + 16]
            sad = jnp.abs(src_b16 - cand.astype(jnp.int16)).sum(
                axis=(2, 3), dtype=jnp.float32)
            total = coarse_px + jnp.asarray([dy, dx], jnp.int32)
            # bias relative to the coarse MV: deviating from the local
            # prediction is what costs bits, not magnitude
            bias = lam * _MV_BIAS * 2.0 * (abs(dy) + abs(dx))
            cost = sad + bias
            take = cost < best_cost
            best_cost = jnp.where(take, cost, best_cost)
            best_sad = jnp.where(take, sad, best_sad)
            best = jnp.where(take[..., None], total, best)
    return best, best_sad, best_cost


def _global_full(src, ref, shifts4):
    """Frame-global motion at FULL resolution: sweep the +-_REFINE_R
    offsets around each coarse global candidate (top-2 by quarter-res
    totals, plus zero), judging every (candidate, offset) pair by
    whole-plane SAD.  Judging the 4-px bases alone is useless on fine
    texture — a base 1 px off the true shift scores as badly as one 3 px
    off — so the offset sweep runs per candidate.  The quarter-res winner
    is within 2 px of the true global shift by pooling (round-to-multiple
    -of-4), so its window contains the truth whenever the pooled ranking
    got the basin right; the runner-up and zero cover periodic aliasing
    and static content.  src/ref: (H, W) in any int dtype (streamed as
    int16/pixel-dtype — the 75 whole-plane SAD passes are pure HBM
    traffic); shifts4: (K, 2) int32 multiples of 4.  Returns (c0 (2,)
    the winning 4-px base, g_full (2,) = c0 + best offset, sad_g (rows,
    cols) per-block SAD at g_full)."""
    h, w = src.shape
    P = MAX_MV_PX + 8
    src = src.astype(jnp.int16)
    refp = jnp.pad(ref, P, mode="edge")  # stays in the pixel dtype

    def shifted(dyx):
        return jax.lax.dynamic_slice(refp, (P + dyx[0], P + dyx[1]),
                                     (h, w))

    cands = jnp.concatenate([shifts4[:2], jnp.zeros((1, 2), jnp.int32)])
    best_tot = jnp.float32(jnp.inf)
    g_full = cands[0]
    sad_g = None
    for k in range(cands.shape[0]):
        base = cands[k]
        for dy in range(-_REFINE_R, _REFINE_R + 1):
            for dx in range(-_REFINE_R, _REFINE_R + 1):
                d = base + jnp.asarray([dy, dx], jnp.int32)
                pl = shifted(d)
                sadb = _block_sad(jnp.abs(src - pl.astype(jnp.int16)),
                                  16).astype(jnp.float32)
                tot = sadb.sum()
                take = tot < best_tot
                best_tot = jnp.where(take, tot, best_tot)
                g_full = jnp.where(take, d, g_full)
                sad_g = sadb if sad_g is None else jnp.where(take, sadb,
                                                             sad_g)

    # iterative full-res descent: the candidate windows above tile only
    # {4k +- 2}, and on pure-periodic content the pooled ranking carries
    # no information about which base is right — walk the SAD surface
    # from the running winner instead (2 x (+-2) steps reach anything
    # within 4 px of the best window point, e.g. shifts == 3 mod 4)
    for _ in range(2):
        base = g_full
        for dy in range(-_REFINE_R, _REFINE_R + 1):
            for dx in range(-_REFINE_R, _REFINE_R + 1):
                d = jnp.clip(base + jnp.asarray([dy, dx], jnp.int32),
                             -MAX_MV_PX, MAX_MV_PX)
                pl = shifted(d)
                sadb = _block_sad(jnp.abs(src - pl.astype(jnp.int16)),
                                  16).astype(jnp.float32)
                tot = sadb.sum()
                take = tot < best_tot
                best_tot = jnp.where(take, tot, best_tot)
                g_full = jnp.where(take, d, g_full)
                sad_g = jnp.where(take, sadb, sad_g)

    # 4-px decomposition of the final winner (off in [-2, 2] for the
    # subpel patch assembly): nearest multiple of 4, clipped to the
    # coarse range
    c0 = jnp.clip(((g_full + 2) >> 2) << 2, -4 * _COARSE_R, 4 * _COARSE_R)
    return c0, g_full, sad_g


@functools.cache
def _subpel_bank() -> np.ndarray:
    from av1tpu.spec import tables
    return np.asarray(tables.subpel_filters()["regular"], np.int32)


@functools.cache
def _subpel_bank4() -> np.ndarray:
    """4-tap regular bank (stored 8-wide with zero taps 0,1,6,7), for
    prediction blocks with a dimension <= 4 (spec 7.11.3.4)."""
    from av1tpu.spec import tables
    return np.asarray(tables.subpel_filters()["regular_4"], np.int32)


_SUBPEL_D = (-6, -4, -2, 0, 2, 4, 6)   # 1/8-pel offsets (quarter-pel grid)


def _subpel_refine(src_b16, P24, mv_px, lam, pix_max):
    """Quarter-pel sweep around the full-pel winner.  src_b16: (rows,
    cols, 16, 16) int16; P24: 24x24 patches at mv_px (pad 4) in the pixel
    dtype.  Every candidate is the NORMATIVE motion-compensated
    prediction (8-tap EIGHTTAP-regular, InterRound0/1), so the winning
    pred is bit-exact vs the spec engine.  Filter intermediates are
    stored int16 (the spec guarantees the post-InterRound0 range fits;
    accumulation widens in registers), halving the sweep's HBM reads.
    Returns (mv8 1/8-pel, pred int32)."""
    bank = _subpel_bank()
    shape = src_b16.shape[:2]

    # shared horizontal passes, one per column offset (phase + int shift);
    # P24[..., r, c] = ref[16R + mv + (r - 4), 16C + mv + (c - 4)]
    hors = {}
    for dx in _SUBPEL_D:
        ix = dx >> 3                       # arithmetic: -1 for dx<0 else 0
        fx = (dx & 7) << 1                 # 1/16-pel phase {0, 4, 8, 12}
        f = bank[fx]
        h = jnp.zeros(shape + (24, 16), jnp.int32)
        for k in range(8):
            h = h + int(f[k]) * P24[..., :, 1 + ix + k : 17 + ix + k
                                    ].astype(jnp.int32)
        hors[dx] = ((h + 4) >> 3).astype(jnp.int16)  # InterRound0
    src_i32 = src_b16.astype(jnp.int32)

    best_cost = jnp.full(shape, jnp.inf, jnp.float32)
    best_sad = jnp.full(shape, jnp.inf, jnp.float32)
    best_d = jnp.zeros(shape + (2,), jnp.int32)
    best_pred = jnp.zeros(shape + (16, 16), jnp.int32)
    sads = []
    offs = []
    for dy in _SUBPEL_D:
        iy = dy >> 3
        fy = (dy & 7) << 1
        g = bank[fy]
        for dx in _SUBPEL_D:
            v = jnp.zeros(shape + (16, 16), jnp.int32)
            hh = hors[dx]
            for k in range(8):
                v = v + int(g[k]) * hh[..., 1 + iy + k : 17 + iy + k, :
                                       ].astype(jnp.int32)
            v = jnp.clip((v + 1024) >> 11, 0, pix_max)   # InterRound1
            sad = jnp.abs(src_i32 - v).sum(axis=(2, 3)).astype(jnp.float32)
            sads.append(sad)
            offs.append((dy, dx))
            # quarter-pel components add fr bits to the coded diff
            bias = lam * _MV_BIAS * (2.0 * (dy != 0) + 2.0 * (dx != 0))
            cost = sad + bias
            take = cost < best_cost
            best_cost = jnp.where(take, cost, best_cost)
            best_sad = jnp.where(take, sad, best_sad)
            best_d = jnp.where(take[..., None],
                               jnp.asarray([dy, dx], jnp.int32), best_d)
            best_pred = jnp.where(take[..., None, None], v, best_pred)

    # dominant-offset coherence snap (same rationale as the integer
    # stages): per-block subpel offsets decorrelate an otherwise-uniform
    # MV field, turning free NEAREST/GLOBAL signaling into per-block NEWMV
    # diffs; snap to the frame-dominant offset where nearly as good
    totals = jnp.stack([s.sum() for s in sads])
    gi = jnp.argmin(totals)
    off_arr = jnp.asarray(offs, jnp.int32)             # (49, 2)
    d_g = off_arr[gi]
    hor_g = jnp.zeros(shape + (24, 16), jnp.int16)
    for dx in _SUBPEL_D:
        hor_g = hor_g + jnp.where(d_g[1] == dx, hors[dx], 0)
    pred_g = jnp.zeros(shape + (16, 16), jnp.int32)
    for dy in _SUBPEL_D:
        iy = dy >> 3
        g = bank[(dy & 7) << 1]
        v = jnp.zeros(shape + (16, 16), jnp.int32)
        for k in range(8):
            v = v + int(g[k]) * hor_g[..., 1 + iy + k : 17 + iy + k, :
                                      ].astype(jnp.int32)
        v = jnp.clip((v + 1024) >> 11, 0, pix_max)
        pred_g = pred_g + jnp.where(d_g[0] == dy, v, 0)
    sad_g = jnp.abs(src_i32 - pred_g).sum(axis=(2, 3)).astype(jnp.float32)
    snap = sad_g <= best_sad + lam * 14.0
    best_d = jnp.where(snap[..., None], d_g, best_d)
    best_pred = jnp.where(snap[..., None, None], pred_g, best_pred)

    mv8 = mv_px * 8 + best_d
    return mv8, best_pred


def _chroma_patches_select(ref2, mv_int):
    """Per-block 16x16 chroma reference patches (8-block + 4 pad each
    side) at the integer chroma MV, built WITHOUT a gather — the same
    static-tile + masked-select formulation as the luma _patches_select
    (TPU gathers run on the scalar path; at 1080p the fancy-index version
    costs ~100 ms/plane).  ref2: (2, H/2, W/2) stacked u/v so one pass
    of selects serves both planes; mv_int: (rows, cols, 2) chroma px in
    [-18, 17].  Bit-identical to _gather_patches(ref, mv_int, 8, 4) per
    plane (frame-bound clamp becomes edge padding)."""
    _, h, w = ref2.shape
    rows, cols = h // 8, w // 8
    dt = ref2.dtype
    # decompose mv = 8*A + B, A in [-3, 2], B in [0, 8): the patch
    # [mv-4, mv+12) then lies inside blocks [A-1, A+2] (4 blocks = 32 px),
    # starting at row B+4 of that tile
    A_r = (mv_int[..., 0] + 24) >> 3
    B_r = mv_int[..., 0] - ((A_r - 3) << 3)   # A stored shifted: a+3 in 0..5
    A_c = (mv_int[..., 1] + 24) >> 3
    B_c = mv_int[..., 1] - ((A_c - 3) << 3)

    refp = jnp.pad(ref2, ((0, 0), (32, 32), (32, 32)), mode="edge")
    rowsE, colsE = rows + 5, cols + 5
    Bp = (refp.reshape(2, rows + 8, 8, cols + 8, 8)
          .transpose(0, 1, 3, 2, 4))        # (2, rows+8, cols+8, 8, 8)
    XR = jnp.concatenate([Bp[:, k : rowsE + k] for k in range(4)], axis=3)
    X = jnp.concatenate([XR[:, :, k : colsE + k] for k in range(4)],
                        axis=4)             # (2, rowsE, colsE, 32, 32)

    Y = jnp.zeros((2, rows, cols, 32, 32), dt)
    for s in range(6):                       # s = A + 3
        row_m = A_r == s
        for s2 in range(6):
            m = (row_m & (A_c == s2))[..., None, None]
            Y = Y + jnp.where(m, X[:, s : s + rows, s2 : s2 + cols],
                              0).astype(dt)

    Z = jnp.zeros((2, rows, cols, 16, 32), dt)
    for b in range(8):                       # patch rows = tile B+4..B+20
        m = (B_r == b)[..., None, None]
        Z = Z + jnp.where(m, Y[:, :, :, b + 4 : b + 20, :], 0).astype(dt)
    P = jnp.zeros((2, rows, cols, 16, 16), dt)
    for b in range(8):
        m = (B_c == b)[..., None, None]
        P = P + jnp.where(m, Z[..., b + 4 : b + 20], 0).astype(dt)
    return P


def _chroma_mc_pair(ref_u, ref_v, mv8, pix_max, bank=None):
    """8x8 chroma motion compensation of both planes for 1/8-pel luma MVs
    (spec 7.11.3: separable 8-tap EIGHTTAP-regular at 1/16-pel chroma
    resolution, rounding 3 then 11).  Bit-exact vs the engine's
    _predict_inter (av1tpu/spec/tile.py).  mv8: (rows, cols, 2) in
    1/8-pel luma units = 1/16-pel chroma units.  bank: filter bank
    override (the 4-tap variant for split-8 sub-blocks — zero-padded to
    8 taps, so the same separable loop applies).  Returns (pred_u,
    pred_v)."""
    mv_int = jnp.stack([mv8[..., 0] >> 4, mv8[..., 1] >> 4], -1)
    fy = mv8[..., 0] & 15
    fx = mv8[..., 1] & 15
    ref2 = jnp.stack([ref_u, ref_v]).astype(_sdt(pix_max))
    patch = _chroma_patches_select(ref2, mv_int)  # (2, rows, cols, 16, 16)
    if bank is None:
        bank = jnp.asarray(_subpel_bank())
    tx = bank[fx]                          # (rows, cols, 8)
    ty = bank[fy]
    hor = jnp.zeros(patch.shape[:3] + (16, 8), jnp.int32)
    for k in range(8):
        hor = hor + (tx[None, :, :, k, None, None]
                     * patch[..., :, k + 1 : k + 9].astype(jnp.int32))
    hor = ((hor + 4) >> 3).astype(jnp.int16)  # InterRound0 (16-bit range)
    out = jnp.zeros(patch.shape[:3] + (8, 8), jnp.int32)
    for k in range(8):
        out = out + (ty[None, :, :, k, None, None]
                     * hor[..., k + 1 : k + 9, :].astype(jnp.int32))
    out = (out + 1024) >> 11               # InterRound1
    out = jnp.clip(out, 0, pix_max)
    return out[0], out[1]


def _chroma_mc(ref, mv8, pix_max):
    """Single-plane wrapper kept for tests/probes; production uses
    _chroma_mc_pair (one select pass for u+v)."""
    return _chroma_mc_pair(ref, ref, mv8, pix_max)[0]


# ----------------------------------------------------------------------
# 8x8 sub-block stage: ONE extended 32x32 MC pass per 16-block at its own
# MV (an 8-px ring around the block).  Separable filtering is position-
# independent, so any aligned slice of an extended MC output is bit-exact
# the normative MC of that region at the same MV — which makes every
# adjacent-neighbor-MV candidate for a sub-block a pure SLICE of the
# neighbor's extended prediction (the ring covers exactly the sub-blocks
# touching that neighbor).  Chroma likewise: one extended 16x16 4-tap
# pass (4x4 chroma of an 8x8 inter block takes the 4-tap bank, spec
# 7.11.3.4).  This replaces an earlier formulation that re-ran full-frame
# MC once per neighbor field — 4 luma + 5 chroma passes whose graph blew
# up XLA compile time.
# ----------------------------------------------------------------------


def _patches40_select(ref, coarse_px, off_px):
    """Per-block 40x40 reference patches: row/col j <-> ref[16R + coarse
    + off + j - 12] — an 8-px ring plus 8-tap margins around the
    16-block at the full-pel MV.  Same static-tile masked-select
    machinery as _patches24_select; that function's output equals the
    [8:32, 8:32] center slice of this one."""
    h, w = ref.shape
    rows, cols = h // 16, w // 16
    dt = ref.dtype
    A_r = (coarse_px[..., 0] + 32) // 16 - 2          # [-2, 2]
    B_r = coarse_px[..., 0] - 16 * A_r                # {0, 4, 8, 12}
    A_c = (coarse_px[..., 1] + 32) // 16 - 2
    B_c = coarse_px[..., 1] - 16 * A_c

    refp = jnp.pad(ref, 64, mode="edge")
    rowsE, colsE = rows + 4, cols + 4
    Bp = (refp.reshape(rows + 8, 16, cols + 8, 16)
          .transpose(0, 2, 1, 3))                # (rows+8, cols+8, 16, 16)
    XR = jnp.concatenate([Bp[1 + k : 1 + k + rowsE] for k in range(4)],
                         axis=2)                 # (rowsE, cols+8, 64, 16)
    X = jnp.concatenate([XR[:, 1 + k : 1 + k + colsE] for k in range(4)],
                        axis=3)                  # (rowsE, colsE, 64, 64)

    Y = jnp.zeros((rows, cols, 64, 64), dt)
    for a in range(-2, 3):
        row_m = A_r == a
        for a2 in range(-2, 3):
            m = (row_m & (A_c == a2))[..., None, None]
            Y = Y + jnp.where(
                m, X[2 + a : 2 + a + rows, 2 + a2 : 2 + a2 + cols],
                0).astype(dt)

    # patch row 0 = tile row (B + off) + 4 with B in {0, 4, 8, 12} and
    # off in [-2, 2]: two 1-D stages on the SAME per-block axis (4 + 5
    # reads instead of the joint 17) — valid here because both shifts
    # index within the block's own tile, unlike the A-shift above
    Zb = jnp.zeros((rows, cols, 44, 64), dt)
    for b in range(0, 16, 4):
        m = (B_r == b)[..., None, None]
        Zb = Zb + jnp.where(m, Y[:, :, 2 + b : 2 + b + 44, :],
                            0).astype(dt)
    Z = jnp.zeros((rows, cols, 40, 64), dt)
    for o in range(-2, 3):
        m = (off_px[..., 0] == o)[..., None, None]
        Z = Z + jnp.where(m, Zb[:, :, 2 + o : 2 + o + 40, :],
                          0).astype(dt)
    Pb = jnp.zeros((rows, cols, 40, 44), dt)
    for b in range(0, 16, 4):
        m = (B_c == b)[..., None, None]
        Pb = Pb + jnp.where(m, Z[..., 2 + b : 2 + b + 44],
                            0).astype(dt)
    P = jnp.zeros((rows, cols, 40, 40), dt)
    for o in range(-2, 3):
        m = (off_px[..., 1] == o)[..., None, None]
        P = P + jnp.where(m, Pb[..., 2 + o : 2 + o + 40], 0).astype(dt)
    return P


def _mc_ext32(P40, mv8, mv_px, pix_max):
    """Extended 32x32 normative luma MC per 16-block at its own 1/8-pel
    MV: E[r, c][a, b] = MC of pixel (16r + a - 8, 16c + b - 8) at
    mv8[r, c] (EIGHTTAP regular, InterRound0/1 — spec 7.11.3.2), so the
    [8:24, 8:24] center equals the block's own prediction bit-exactly.
    P40: patches from _patches40_select at the full-pel search winner
    mv_px; mv8 = 8*mv_px + d with d in [-6, 6], so the integer part
    fp = mv8 >> 3 is mv_px or mv_px - 1 per axis — folded in as a +-1
    read shift (same trick as _subpel_refine's hors)."""
    fp = jnp.stack([mv8[..., 0] >> 3, mv8[..., 1] >> 3], -1)
    fr = jnp.stack([mv8[..., 0] & 7, mv8[..., 1] & 7], -1)
    sy = (fp[..., 0] - mv_px[..., 0])[..., None, None]   # {-1, 0}
    sx = (fp[..., 1] - mv_px[..., 1])[..., None, None]
    bank = jnp.asarray(_subpel_bank())
    tx = bank[fr[..., 1] << 1]                    # (rows, cols, 8)
    ty = bank[fr[..., 0] << 1]
    hor = jnp.zeros(P40.shape[:2] + (40, 32), jnp.int32)
    for k in range(8):
        rd = jnp.where(sx < 0, P40[..., :, k : 32 + k],
                       P40[..., :, 1 + k : 33 + k])
        hor = hor + tx[..., k, None, None] * rd.astype(jnp.int32)
    hor = ((hor + 4) >> 3).astype(jnp.int16)      # InterRound0
    out = jnp.zeros(P40.shape[:2] + (32, 32), jnp.int32)
    for k in range(8):
        rd = jnp.where(sy < 0, hor[..., k : 32 + k, :],
                       hor[..., 1 + k : 33 + k, :])
        out = out + ty[..., k, None, None] * rd.astype(jnp.int32)
    # store the extended predictions in the pixel dtype: every consumer
    # slices them for SADs/selects, and E is the sub8 stage's biggest
    # streamed tensor
    return jnp.clip((out + 1024) >> 11, 0, pix_max).astype(P40.dtype)


def _chroma_patches24_select(ref2, mv_int):
    """Per-block 24x24 chroma reference patches (8-block + 4-px ring +
    4-tap margins): row j <-> ref[8R' + cmv + j - 8].  Same tile
    machinery as _chroma_patches_select (whose output is the [4:20,
    4:20] center slice)."""
    _, h, w = ref2.shape
    rows, cols = h // 8, w // 8
    dt = ref2.dtype
    A_r = (mv_int[..., 0] + 24) >> 3
    B_r = mv_int[..., 0] - ((A_r - 3) << 3)
    A_c = (mv_int[..., 1] + 24) >> 3
    B_c = mv_int[..., 1] - ((A_c - 3) << 3)

    refp = jnp.pad(ref2, ((0, 0), (32, 32), (32, 32)), mode="edge")
    rowsE, colsE = rows + 5, cols + 5
    Bp = (refp.reshape(2, rows + 8, 8, cols + 8, 8)
          .transpose(0, 1, 3, 2, 4))        # (2, rows+8, cols+8, 8, 8)
    XR = jnp.concatenate([Bp[:, k : rowsE + k] for k in range(4)], axis=3)
    X = jnp.concatenate([XR[:, :, k : colsE + k] for k in range(4)],
                        axis=4)             # (2, rowsE, colsE, 32, 32)

    Y = jnp.zeros((2, rows, cols, 32, 32), dt)
    for s in range(6):                       # s = A + 3
        row_m = A_r == s
        for s2 in range(6):
            m = (row_m & (A_c == s2))[..., None, None]
            Y = Y + jnp.where(m, X[:, s : s + rows, s2 : s2 + cols],
                              0).astype(dt)

    Z = jnp.zeros((2, rows, cols, 24, 32), dt)
    for b in range(8):                       # patch rows = tile B..B+24
        m = (B_r == b)[..., None, None]
        Z = Z + jnp.where(m, Y[:, :, :, b : b + 24, :], 0).astype(dt)
    P = jnp.zeros((2, rows, cols, 24, 24), dt)
    for b in range(8):
        m = (B_c == b)[..., None, None]
        P = P + jnp.where(m, Z[..., b : b + 24], 0).astype(dt)
    return P


def _chroma_ext16(ref_u, ref_v, mv8, pix_max):
    """Extended 16x16 chroma MC of both planes with the normative 4-TAP
    bank (spec 7.11.3.4 — the 4x4 chroma of 8x8 inter blocks): Ec[p, r,
    c][a, b] = MC of chroma pixel (8r + a - 4, 8c + b - 4) at the
    block's mv8 (1/16-pel chroma units), so the [4:12, 4:12] center is
    the block's own 4-tap chroma prediction and the 4-px ring covers
    adjacent sub-blocks."""
    mv_int = jnp.stack([mv8[..., 0] >> 4, mv8[..., 1] >> 4], -1)
    fy = mv8[..., 0] & 15
    fx = mv8[..., 1] & 15
    dt = _sdt(pix_max)
    ref2 = jnp.stack([ref_u, ref_v]).astype(dt)
    patch = _chroma_patches24_select(ref2, mv_int)  # (2,rows,cols,24,24)
    bank = jnp.asarray(_subpel_bank4())
    tx = bank[fx]                          # (rows, cols, 8)
    ty = bank[fy]
    hor = jnp.zeros(patch.shape[:3] + (24, 16), jnp.int32)
    for k in range(8):
        hor = hor + (tx[None, :, :, k, None, None]
                     * patch[..., :, k + 1 : k + 17].astype(jnp.int32))
    hor = ((hor + 4) >> 3).astype(jnp.int16)  # InterRound0
    out = jnp.zeros(patch.shape[:3] + (16, 16), jnp.int32)
    for k in range(8):
        out = out + (ty[None, :, :, k, None, None]
                     * hor[..., k + 1 : k + 17, :].astype(jnp.int32))
    return jnp.clip((out + 1024) >> 11, 0,
                    pix_max).astype(dt)  # InterRound1


_SUB8_NONPARENT_BITS = 10.0   # NEWMV diff / DRL cost of a sub-block MV
_SUB8_HDR_BITS = 4.0          # per-sub-block skip+mode+ref signaling


def _quads(b, n: int):
    """(rows, cols, 2n, 2n) blocks -> (2*rows, 2*cols, n, n) quadrants."""
    rows, cols = b.shape[:2]
    return (b.reshape(rows, cols, 2, n, 2, n).transpose(0, 2, 1, 4, 3, 5)
            .reshape(2 * rows, 2 * cols, n, n))


def _unquads(b, n: int):
    """(2*rows, 2*cols, n, n) -> (rows, cols, 2n, 2n): inverse of _quads."""
    rows8, cols8 = b.shape[:2]
    rows, cols = rows8 // 2, cols8 // 2
    return (b.reshape(rows, 2, cols, 2, n, n).transpose(0, 2, 1, 4, 3, 5)
            .reshape(rows, cols, 2 * n, 2 * n))


def _sub8_stage(y, ref_y, ref_u, ref_v, mv16, pred_b16, p40, mv_px, lam,
                pix_max):
    """Per-8x8 sub-block MV selection for motion boundaries.

    A 16x16 block straddling an object edge motion-compensates one side
    wrongly no matter which MV it picks (VERDICT r2: the synth corpus box
    ring re-codes every frame).  Candidates per 8x8 sub-block: the parent
    16-block's MV (prediction free from the parent sweep), the zero MV
    (free slice of the reference), and the ADJACENT neighbor blocks' MVs
    (vertical neighbor for the touching half, horizontal for the other
    axis) — at a boundary the far-side sub-blocks pick the neighbor's
    motion, which the MV stack then signals nearly free.  All candidate
    predictions are slices of ONE extended 32x32 luma MC pass (_mc_ext32,
    reusing the search's 40x40 patches) and ONE extended 16x16 4-tap
    chroma pass (_chroma_ext16) — normative MC outputs, bit-exact vs the
    engine.  At frame edges the neighbor candidates degenerate to the
    parent (pred and MV stay consistent).

    Returns dict: mv8 (rows8, cols8, 2) 1/8-pel, pred (rows8, cols8, 8,
    8) luma, pred_uv (2, rows8, cols8, 4, 4), mv_bits (rows8, cols8)."""
    rows, cols = mv16.shape[:2]
    dt = _sdt(pix_max)
    src8 = _quads(_to_blocks(y.astype(jnp.int16), 16), 8)
    pred_p = _quads(pred_b16.astype(dt), 8)
    rep2 = lambda a: jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)
    mv_p = rep2(mv16)

    E = _mc_ext32(p40, mv16, mv_px, pix_max)          # (rows, cols, 32, 32)
    Ec = _chroma_ext16(ref_u, ref_v, mv16, pix_max)   # (2, rows, cols, 16, 16)

    # ---- vertical-adjacent candidate: qr=0 reads the up neighbor's
    # bottom ring, qr=1 the down neighbor's top ring; frame edges fall
    # back to the parent's own quadrant (whose MV the shift also yields)
    top = jnp.concatenate([E[:1, :, 8:16, 8:24],
                           E[:-1, :, 24:32, 8:24]], axis=0)
    bot = jnp.concatenate([E[1:, :, 0:8, 8:24],
                           E[-1:, :, 16:24, 8:24]], axis=0)
    vp = jnp.stack([top, bot], axis=1).reshape(2 * rows, cols, 8, 16)
    vpred = (vp.reshape(2 * rows, cols, 8, 2, 8).transpose(0, 1, 3, 2, 4)
             .reshape(2 * rows, 2 * cols, 8, 8))
    mvu = jnp.concatenate([mv16[:1], mv16[:-1]], 0)
    mvd = jnp.concatenate([mv16[1:], mv16[-1:]], 0)
    vmv = jnp.repeat(jnp.stack([mvu, mvd], axis=1)
                     .reshape(2 * rows, cols, 2), 2, axis=1)

    # ---- horizontal-adjacent candidate (same along columns)
    lef = jnp.concatenate([E[:, :1, 8:24, 8:16],
                           E[:, :-1, 8:24, 24:32]], axis=1)
    rig = jnp.concatenate([E[:, 1:, 8:24, 0:8],
                           E[:, -1:, 8:24, 16:24]], axis=1)
    hp = jnp.stack([lef, rig], axis=2).reshape(rows, 2 * cols, 16, 8)
    hpred = (hp.reshape(rows, 2 * cols, 2, 8, 8).transpose(0, 2, 1, 3, 4)
             .reshape(2 * rows, 2 * cols, 8, 8))
    mvl = jnp.concatenate([mv16[:, :1], mv16[:, :-1]], 1)
    mvr = jnp.concatenate([mv16[:, 1:], mv16[:, -1:]], 1)
    hmv = jnp.repeat(jnp.stack([mvl, mvr], axis=2)
                     .reshape(rows, 2 * cols, 2), 2, axis=0)

    best_cost = jnp.abs(src8 - pred_p.astype(jnp.int16)).sum(
        axis=(2, 3), dtype=jnp.float32)
    best_mv = mv_p                        # parent pays no extra signaling
    best_pred = pred_p
    best_idx = jnp.zeros((2 * rows, 2 * cols), jnp.int32)

    def consider(idx, mv_cand8, pred_cand, penalty):
        nonlocal best_cost, best_mv, best_pred, best_idx
        sad = jnp.abs(src8 - pred_cand.astype(jnp.int16)).sum(
            axis=(2, 3), dtype=jnp.float32)
        cost = sad + penalty
        take = cost < best_cost
        best_cost = jnp.where(take, cost, best_cost)
        best_idx = jnp.where(take, idx, best_idx)
        best_mv = jnp.where(take[..., None], mv_cand8, best_mv)
        best_pred = jnp.where(take[..., None, None], pred_cand, best_pred)

    # candidate 1 — zero MV: the co-located reference block, no filter
    consider(1, jnp.zeros_like(mv_p), _to_blocks(ref_y.astype(dt), 8),
             lam * _MV_BIAS * 4.0)
    consider(2, vmv, vpred, lam * _MV_BIAS * 6.0)
    consider(3, hmv, hpred, lam * _MV_BIAS * 6.0)

    # ---- chroma: slices of Ec / the reference, selected by winner index
    qc = lambda a: jnp.stack([_quads(a[0], 4), _quads(a[1], 4)])
    pred_uv = qc(Ec[:, :, :, 4:12, 4:12])             # parent (4-tap)
    zero_uv = qc(jnp.stack([_to_blocks(ref_u.astype(dt), 8),
                            _to_blocks(ref_v.astype(dt), 8)]))
    ctop = jnp.concatenate([Ec[:, :1, :, 4:8, 4:12],
                            Ec[:, :-1, :, 12:16, 4:12]], axis=1)
    cbot = jnp.concatenate([Ec[:, 1:, :, 0:4, 4:12],
                            Ec[:, -1:, :, 8:12, 4:12]], axis=1)
    cv = jnp.stack([ctop, cbot], axis=2).reshape(2, 2 * rows, cols, 4, 8)
    cvpred = (cv.reshape(2, 2 * rows, cols, 4, 2, 4)
              .transpose(0, 1, 2, 4, 3, 5)
              .reshape(2, 2 * rows, 2 * cols, 4, 4))
    clef = jnp.concatenate([Ec[:, :, :1, 4:12, 4:8],
                            Ec[:, :, :-1, 4:12, 12:16]], axis=2)
    crig = jnp.concatenate([Ec[:, :, 1:, 4:12, 0:4],
                            Ec[:, :, -1:, 4:12, 8:12]], axis=2)
    ch = jnp.stack([clef, crig], axis=3).reshape(2, rows, 2 * cols, 8, 4)
    chpred = (ch.reshape(2, rows, 2 * cols, 2, 4, 4)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(2, 2 * rows, 2 * cols, 4, 4))
    for i, cand in ((1, zero_uv), (2, cvpred), (3, chpred)):
        m = (best_idx == i)[None, :, :, None, None]
        pred_uv = jnp.where(m, cand, pred_uv)

    nonparent = best_idx != 0
    mv_bits = (_SUB8_HDR_BITS
               + jnp.where(nonparent, _SUB8_NONPARENT_BITS, 2.0))
    return {"mv8": best_mv, "pred": best_pred, "pred_uv": pred_uv,
            "mv_bits": mv_bits}


def _code_plane_inter(src, pred, qindex, n: int, bit_depth: int,
                      rm=None, qctx=None, lam=None):
    """Batched residual coding: (rows, cols, n, n) src/pred -> (levels i16
    (rows, cols, n, n), recon blocks, dist (rows, cols), dskip).  With
    rm/qctx/lam, near-threshold levels are RD-pruned (rdoq.rd_zero)."""
    rows, cols = src.shape[:2]
    pix_max = (1 << bit_depth) - 1
    fwd = jnp.asarray(forward_matrix(n, n, 0))
    step, q, cap = _plane_params(qindex, n, bit_depth)
    resid = (src - pred).reshape(-1, n * n).astype(jnp.float32)
    coefs = resid @ fwd.T
    lv = quantize_coefs(coefs, step, cap)
    if lam is not None and rm is not None:
        from av1tpu.models.rdoq import coef_gains, rd_zero
        lv = rd_zero(lv, coefs, q.astype(jnp.float32), lam, rm.tabs[qctx],
                     jnp.asarray(coef_gains(n)))
    r = inverse_transform((lv * q).reshape(-1, n, n), n, n, 0)
    rec = jnp.clip(pred.reshape(-1, n, n) + r, 0, pix_max)
    dist = jnp.sum((rec - src.reshape(-1, n, n)) ** 2,
                   axis=(1, 2)).astype(jnp.float32).reshape(rows, cols)
    dskip = jnp.sum(resid ** 2, axis=1).reshape(rows, cols)
    return (lv.reshape(rows, cols, n, n).astype(jnp.int16),
            rec.reshape(rows, cols, n, n), dist, dskip)


def _from_blocks(b):
    """(rows, cols, n, n) blocks -> (rows*n, cols*n) plane."""
    rows, cols, n = b.shape[0], b.shape[1], b.shape[2]
    return b.transpose(0, 2, 1, 3).reshape(rows * n, cols * n)


def _to_blocks(plane, n: int):
    h, w = plane.shape
    return (plane.reshape(h // n, n, w // n, n).transpose(0, 2, 1, 3))


def _search_mv(y, ref_y, lam, pix_max, prev_mv=None):
    """Full luma motion search: quarter-res coarse (+dominant snap), +-2
    full-pel refine around MULTIPLE candidate bases — the coarse winner,
    a second-basin coarse candidate, and the co-located previous frame's
    MV (temporal prediction; steady local motion like an object tracking
    across the scene is found once and then inherited) — a frame-global
    ABSOLUTE candidate chosen and judged at full resolution for every
    block (rescues blocks whose quarter-res SAD landscape aliased into a
    wrong basin — periodic texture — and coalesces the field so the MV
    stack codes it nearly free), then the quarter-pel subpel sweep.
    prev_mv: optional (rows, cols, 2) int32 full-pel MV field of the
    previous frame.  Returns (mv8 1/8-pel, pred_y, src_b, (p40, mv_px)) —
    the 40x40 patches and full-pel winner feed the 8x8 sub-block stage's
    extended MC (_mc_ext32) without a second patch assembly."""
    src_q = _block_sad(y, 4) // 16         # 4x4 mean pool (exact ints /16)
    ref_q = _block_sad(ref_y, 4) // 16
    coarse, coarse2, shifts4 = _coarse_search(
        src_q, ref_q, lam * _MV_BIAS / 16.0, lam * 14.0 / 16.0)
    # (quarter-res SADs are ~1/16 of pixel-domain SADs, so both the
    # MV-rate bias and the ~14-bit NEWMV-diff snap margin scale down by 16)
    src_b = _to_blocks(y, 16)
    dt = _sdt(pix_max)
    ref8 = ref_y.astype(dt)                # pixel-dtype ref: every patch
    src_b16 = src_b.astype(jnp.int16)      # assembly/SAD streams shrink

    bases = [coarse, coarse2]
    if prev_mv is not None:
        # temporal base: nearest 4-aligned point (the +-2 refine sweep
        # then covers the exact previous MV), clipped to the coarse range
        # _patches_select's decomposition assumes
        tmv = jnp.clip(((prev_mv + 2) >> 2) << 2,
                       -4 * _COARSE_R, 4 * _COARSE_R)
        bases.append(tmv)

    mv_px = best_sad = best_cost = base_f = None
    for b in bases:
        patches = _patches_select(ref8, b)
        m, sd, c = _refine_search(src_b16, patches, b, lam)
        if mv_px is None:
            mv_px, best_sad, best_cost = m, sd, c
            base_f = b
        else:
            take = c < best_cost
            mv_px = jnp.where(take[..., None], m, mv_px)
            best_sad = jnp.where(take, sd, best_sad)
            best_cost = jnp.where(take, c, best_cost)
            base_f = jnp.where(take[..., None], b, base_f)

    c0, g_full, sad_g = _global_full(y, ref8, shifts4)
    snap = sad_g <= best_sad + lam * 14.0
    mv_px = jnp.where(snap[..., None], g_full, mv_px)

    # every block's MV is base + off with off in [-2, 2]: the refine
    # winner by construction, and the global candidate c0 + off by the
    # same decomposition — keep the pair for subpel patch assembly
    coarse_f = jnp.where(snap[..., None], c0[None, None], base_f)
    off_f = mv_px - coarse_f
    p40 = _patches40_select(ref8, coarse_f, off_f)
    mv8, pred_y = _subpel_refine(src_b16, p40[..., 8:32, 8:32], mv_px,
                                 lam, pix_max)
    return mv8, pred_y, src_b, (p40, mv_px)


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def encode_inter_v(y, u, v, ref_y, ref_u, ref_v, qindex,
                   bit_depth: int = 8):
    """Encode one inter frame against the previous reconstruction.

    y: (H, W) int32, 64-multiple dims; u/v: (H/2, W/2).  ref_*: the LAST
    frame's reconstruction (same shapes).  Returns dict with levels_y
    (r16, c16, 16, 16) i16, levels_u/v (r16, c16, 8, 8) i16, mv (r16, c16,
    2) i32 in 1/8-pel (row, col), and recon planes."""
    ac = _plane_params(qindex, 16, bit_depth)[0][1]
    lam = (ac * ac * 0.0234) ** 0.5        # SAD-domain lambda (pixel rdo
    # lambda from the intra partition tuning, sqrt for the L1 domain)

    pix_max = (1 << bit_depth) - 1
    mv8, pred_y, src_b, _ = _search_mv(y, ref_y, lam, pix_max)

    # luma prediction came out of the subpel sweep (normative 8-tap MC);
    # chroma is interpolated at 1/16-pel chroma resolution
    pred_u, pred_v = _chroma_mc_pair(ref_u, ref_v, mv8, pix_max)

    from av1tpu.models.rates import RateModel, qctx_index

    qctx = qctx_index(qindex)
    lamp = ac * ac * 0.0234
    ly, ry, dy, dsky = _code_plane_inter(src_b, pred_y, qindex, 16,
                                         bit_depth, RateModel(16, 0),
                                         qctx, lamp)
    lu, ru, du_, dsku = _code_plane_inter(_to_blocks(u, 8), pred_u,
                                          qindex, 8, bit_depth,
                                          RateModel(8, 1), qctx, lamp)
    lv, rv, dv_, dskv = _code_plane_inter(_to_blocks(v, 8), pred_v,
                                          qindex, 8, bit_depth,
                                          RateModel(8, 1), qctx, lamp)
    # joint skip-vs-code RD per 16-block (one AV1 skip flag covers all
    # three planes; see _skip_rdo) with the log2-level rate proxy
    coded = (dy + du_ + dv_
             + lamp * (_rate_of(ly) + _rate_of(lu) + _rate_of(lv)))
    m = (dsky + dsku + dskv + lamp) < coded
    me = m[:, :, None, None]
    ly, lu, lv = (jnp.where(me, 0, l) for l in (ly, lu, lv))
    ry = jnp.where(me, pred_y, ry)
    ru = jnp.where(me, pred_u, ru)
    rv = jnp.where(me, pred_v, rv)
    return {"levels_y": ly, "levels_u": lu, "levels_v": lv,
            "mv": mv8,                     # 1/8-pel spec units
            "recon_y": _from_blocks(ry), "recon_u": _from_blocks(ru),
            "recon_v": _from_blocks(rv)}


# ----------------------------------------------------------------------
# partitioned inter: merge equal-MV 16-blocks into 32x32 / 64x64 NONE
# blocks by pixel-domain RD (mirrors the intra partition pipeline,
# av1tpu/models/intra_part.py; spec engine validates at every leaf size,
# tests/test_inter_part.py)
# ----------------------------------------------------------------------


def _join_blocks(b, f: int):
    """(rows, cols, n, n) -> (rows/f, cols/f, n*f, n*f) by tiling."""
    rows, cols, n = b.shape[0], b.shape[1], b.shape[2]
    return (b.reshape(rows // f, f, cols // f, f, n, n)
            .transpose(0, 2, 1, 4, 3, 5)
            .reshape(rows // f, cols // f, f * n, f * n))


def _rate_of(lv):
    a = jnp.abs(lv.astype(jnp.float32))
    return jnp.sum(jnp.where(a > 0, 2.0, 0.0) + jnp.log2(1.0 + a),
                   axis=(-2, -1))


def _code_nn(src, pred, fwd, step, q, dq_shift: int, cap, pix_max,
             rm=None, qctx=None, lam=None, gains=None, noise_gate=None):
    """Generic n x n DCT residual coding on (..., n, n) blocks.  Returns
    (levels i32, recon, dist_pix f32, rate f32).  rm: optional
    rates.RateModel — expected bits from the real coefficient CDFs
    (qctx: traced quality bucket); without it, the log2 proxy.  With lam
    + gains (rdoq.coef_gains), near-threshold levels whose bit cost
    exceeds their distortion value are pruned (rdoq.rd_zero).
    noise_gate: optional traced (3*sigma)^2 sensor-noise floor —
    coefficients inside it explain per-frame noise, useless to every
    frame referencing this one (the same floor the keyframe RDOQ uses;
    SVT's equivalent is its tf-guided dropout)."""
    n = src.shape[-1]
    sh = src.shape[:-2]
    resid = (src - pred).reshape(-1, n * n).astype(jnp.float32)
    coefs = resid @ fwd.T
    lv = quantize_coefs(coefs, step, cap)
    if lam is not None and rm is not None:
        from av1tpu.models.rdoq import rd_zero
        lv = rd_zero(lv, coefs,
                     q.astype(jnp.float32) * (0.5 ** dq_shift),
                     lam, rm.tabs[qctx], gains, noise_gate=noise_gate)
    dq = lv * q
    if dq_shift:
        dq = jnp.sign(dq) * (jnp.abs(dq) >> dq_shift)
    r = inverse_transform(dq.reshape(-1, n, n), n, n, 0)
    rec = jnp.clip(pred.reshape(-1, n, n) + r, 0, pix_max)
    dist = jnp.sum((rec - src.reshape(-1, n, n)) ** 2,
                   axis=(1, 2)).astype(jnp.float32)
    # skip distortion: recon == prediction (pred is already pixel-clipped
    # MC output, so clip(pred) == pred and the residual energy is exact)
    dskip = jnp.sum(resid ** 2, axis=1).reshape(sh)
    lv = lv.reshape(sh + (n, n))
    rate = rm(lv, qctx) if rm is not None else _rate_of(lv)
    return lv, rec.reshape(sh + (n, n)), dist.reshape(sh), rate, dskip


def _skip_rdo(lam, yt, ut, vt, py, pu, pv):
    """Joint skip-vs-code RD choice at one partition size.

    AV1 signals one skip flag per block covering all three planes
    (spec 5.11.16 read_skip; the packer derives it from all-zero level
    grids, native/coding/pack.cpp).  yt/ut/vt: (lv, rec, dist, rate,
    dskip) per plane from _code_nn; py/pu/pv: the MC predictions.  Where
    dskip_total + lam*1 beats dist_total + lam*rate_total, zero the
    levels (-> the packer codes skip=1, no residual), recon becomes the
    prediction, and the returned dist/rate feed the merge RDO honestly.
    Without this, near-perfect MC (static or translating content)
    re-codes propagated quantization noise every frame — the texture/
    screen corpus bleed (VERDICT r2)."""
    coded = (yt[2] + lam * yt[3] + ut[2] + lam * ut[3]
             + vt[2] + lam * vt[3])
    skipc = yt[4] + ut[4] + vt[4] + lam  # ~1 bit: the skip flag itself
    m = skipc < coded
    me = m[:, :, None, None]

    def sel(t, p):
        return (jnp.where(me, 0, t[0]), jnp.where(me, p, t[1]),
                jnp.where(m, t[4], t[2]), jnp.where(m, 0.0, t[3]))

    return m, sel(yt, py), sel(ut, pu), sel(vt, pv)


@functools.cache
def _fwd64_inter():
    from av1tpu.models.intra_part import _fwd64
    return _fwd64()


def _inter_partition(src_b, pred_b, src_cb, pred_cb, mv8, qindex,
                     bit_depth: int, sub8=None, use_g=None,
                     noise_gate=None):
    """Partition RDO on top of the 16-grid search results.

    src_b/pred_b: (rows, cols, 16, 16) luma; src_cb/pred_cb: pairs of
    (rows, cols, 8, 8) chroma (u, v).  sub8: optional _sub8_stage output
    (per-8x8 candidate MVs/preds) enabling 16->8x8 splits at motion
    boundaries.  use_g: optional (rows, cols) bool — blocks referencing
    GOLDEN (they never split to 8x8, and 32/64 merges require a uniform
    reference).  Returns dict of per-size level grids, split maps and
    recon planes (union-layout-ready)."""
    rows, cols = mv8.shape[:2]
    rows32, cols32 = rows // 2, cols // 2
    rows64, cols64 = rows // 4, cols // 4
    pix_max = (1 << bit_depth) - 1

    fwd16 = jnp.asarray(forward_matrix(16, 16, 0))
    fwd32 = jnp.asarray(forward_matrix(32, 32, 0))
    fwd8 = jnp.asarray(forward_matrix(8, 8, 0))
    f64 = jnp.asarray(_fwd64_inter())
    step16, q16, cap16 = _plane_params(qindex, 16, bit_depth)
    step32, q32, cap32 = _plane_params(qindex, 32, bit_depth)
    step8, q8, cap8 = _plane_params(qindex, 8, bit_depth)
    ac = step16[1]
    # two lambdas: merge-size choices use the reference-chain discount
    # (excess distortion in a merged block compounds down the chain), but
    # the skip and coefficient-pruning decisions use the FULL frame
    # lambda — residual noise is iid, so coding it never helps later
    # frames (it actively hurts: the reference then carries stale noise),
    # and a discounted lambda there re-codes sensor noise every frame
    lam_full = (ac * ac * 0.0234).astype(jnp.float32)
    lam = (lam_full * _REF_LAM_SCALE).astype(jnp.float32)

    # expected-bits models from the real coefficient CDFs (rates.py): the
    # merge RDO compares true costs instead of the log2 level proxy
    from av1tpu.models.rates import RateModel, qctx_index

    qctx = qctx_index(qindex)
    rm16y, rm8c = RateModel(16, 0), RateModel(8, 1)
    rm32y, rm16c = RateModel(32, 0), RateModel(16, 1)
    rm64y, rm32c = RateModel(64, 0), RateModel(32, 1)

    # MV equality maps (and reference uniformity: a merged block codes
    # ONE ref, so all children must agree)
    eq32 = jnp.all(
        mv8.reshape(rows32, 2, cols32, 2, 2)
        == mv8[::2, ::2][:, None, :, None, :], axis=(1, 3, 4))
    eq64 = jnp.all(
        mv8.reshape(rows64, 4, cols64, 4, 2)
        == mv8[::4, ::4][:, None, :, None, :], axis=(1, 3, 4))
    if use_g is not None:
        g32 = use_g.reshape(rows32, 2, cols32, 2).sum(axis=(1, 3))
        eq32 = eq32 & ((g32 == 0) | (g32 == 4))
        g64 = use_g.reshape(rows64, 4, cols64, 4).sum(axis=(1, 3))
        eq64 = eq64 & ((g64 == 0) | (g64 == 16))

    from av1tpu.models.rdoq import coef_gains, rd_zero

    g8, g16 = jnp.asarray(coef_gains(8)), jnp.asarray(coef_gains(16))
    g32, g64 = jnp.asarray(coef_gains(32)), jnp.asarray(coef_gains(64))

    def _code_nn_uv(src_pair, pred_pair, fwd, step, q, dq_shift, cap,
                    rm, gains):
        """u and v coded in ONE _code_nn instantiation (stacked leading
        axis): halves the chroma transform/rate-model graph, which is
        where the GOP step's HLO size (and so its compile time) lives."""
        t = _code_nn(jnp.stack(src_pair), jnp.stack(pred_pair), fwd, step,
                     q, dq_shift, cap, pix_max, rm, qctx, lam_full,
                     gains, noise_gate)
        return (tuple(x[0] for x in t), tuple(x[1] for x in t))

    # ---- 16 leaf (luma + chroma) ----
    y16t = _code_nn(src_b, pred_b, fwd16, step16, q16, 0,
                    cap16, pix_max, rm16y, qctx, lam_full, g16,
                    noise_gate)
    cl = _code_nn_uv(src_cb, pred_cb, fwd8, step8, q8, 0, cap8, rm8c, g8)
    _, (lv16, rec16, d16, r16), (lu8, recu8, du8, ru8), \
        (lv8, recv8, dv8, rv8) = _skip_rdo(lam_full, y16t, cl[0], cl[1],
                                           pred_b, pred_cb[0], pred_cb[1])

    # ---- 8x8 split (motion boundaries; TX_8X8 luma + TX_4X4 chroma) ----
    if sub8 is not None:
        from av1tpu.models.rdoq import coef_gains as _cg

        fwd4 = jnp.asarray(forward_matrix(4, 4, 0))
        step4, q4, cap4 = _plane_params(qindex, 4, bit_depth)
        rm8y, rm4c = RateModel(8, 0), RateModel(4, 1)
        g4g = jnp.asarray(_cg(4))
        g8g = jnp.asarray(_cg(8))
        src8 = _quads(src_b, 8)
        sc4 = [_quads(s, 4) for s in src_cb]
        pc4 = sub8["pred_uv"]              # (2, rows8, cols8, 4, 4)
        y8t = _code_nn(src8, sub8["pred"], fwd8, step8, q8, 0, cap8,
                       pix_max, rm8y, qctx, lam_full, g8g, noise_gate)
        c4 = _code_nn_uv(sc4, (pc4[0], pc4[1]), fwd4, step4, q4, 0, cap4,
                         rm4c, g4g)
        _, (l8y, rec8y, d8, r8), (l4u, rec4u, du4, ru4), \
            (l4v, rec4v, dv4, rv4) = _skip_rdo(lam_full, y8t, c4[0], c4[1],
                                               sub8["pred"], pc4[0],
                                               pc4[1])
        cost8 = (d8 + du4 + dv4
                 + lam * (r8 + ru4 + rv4 + sub8["mv_bits"]))
        q22 = lambda x: x.reshape(rows, 2, cols, 2).sum(axis=(1, 3))
        cost8s = q22(cost8) + lam * _SPLIT_OVERHEAD_BITS
        cost16leaf = d16 + du8 + dv8 + lam * (r16 + ru8 + rv8)
        split16 = cost8s < cost16leaf
        if use_g is not None:   # golden blocks never split (sub8
            split16 = split16 & ~use_g  # candidates are all LAST-MC)
    else:
        split16 = jnp.zeros((rows, cols), bool)

    # split blocks can't join a 32/64 merge
    eq32 = eq32 & ~(split16.reshape(rows32, 2, cols32, 2).any(axis=(1, 3)))
    eq64 = eq64 & ~(split16.reshape(rows64, 4, cols64, 4).any(axis=(1, 3)))

    # ---- 32 merge (luma 32 DCT shift1 + chroma 16 DCT) ----
    s32 = _join_blocks(src_b, 2)
    p32 = _join_blocks(pred_b, 2)
    y32t = _code_nn(s32, p32, fwd32, step32 * 0.5, q32, 1,
                    cap32, pix_max, rm32y, qctx, lam_full, g32,
                    noise_gate)
    sc16 = [_join_blocks(s, 2) for s in src_cb]
    pc16 = [_join_blocks(p, 2) for p in pred_cb]
    cc = _code_nn_uv(sc16, pc16, fwd16, step16, q16, 0, cap16, rm16c, g16)
    _, (lv32, rec32, d32, r32), (lu16, recu16, du16, ru16), \
        (lv16c, recv16, dv16, rv16) = _skip_rdo(lam_full, y32t, cc[0], cc[1],
                                                p32, pc16[0], pc16[1])

    def sum4(x, r2, c2):
        return x.reshape(r2, 2, c2, 2).sum(axis=(1, 3))

    d16s = (sum4(d16, rows32, cols32) + sum4(du8, rows32, cols32)
            + sum4(dv8, rows32, cols32))
    cost16 = (sum4(d16 + lam * r16, rows32, cols32)
              + sum4(du8 + lam * ru8, rows32, cols32)
              + sum4(dv8 + lam * rv8, rows32, cols32)
              + lam * _SPLIT_OVERHEAD_BITS)
    d32s = d32 + du16 + dv16
    cost32 = (d32 + lam * r32 + du16 + lam * ru16 + dv16 + lam * rv16)
    # distortion gate: merged blocks feed the reference chain, where excess
    # distortion compounds frame over frame while the bit saving is
    # one-time; only merge where quality is (near-)preserved
    ch32 = eq32 & (cost32 < cost16) & (d32s <= d16s * 1.1 + 64.0)

    # ---- 64 merge (luma TX_64X64, coded 32x32, shift2; chroma 32 shift1)
    s64 = _join_blocks(src_b, 4)
    p64 = _join_blocks(pred_b, 4)
    resid64 = (s64 - p64).reshape(-1, 4096).astype(jnp.float32)
    coef64 = resid64 @ f64.T
    lv64 = quantize_coefs(coef64, step32 * 0.25, cap32)
    lv64 = rd_zero(lv64, coef64, q32.astype(jnp.float32) * 0.25,
                   lam_full, rm64y.tabs[qctx], g64, noise_gate=noise_gate)
    dq64 = jnp.sign(lv64) * ((jnp.abs(lv64) * q32) >> 2)
    full = jnp.zeros((rows64 * cols64, 64, 64), jnp.int32).at[
        :, :32, :32].set(dq64.reshape(-1, 32, 32))
    rec64 = jnp.clip(p64.reshape(-1, 64, 64)
                     + inverse_transform(full, 64, 64, 0), 0, pix_max)
    d64 = jnp.sum((rec64 - s64.reshape(-1, 64, 64)) ** 2,
                  axis=(1, 2)).astype(jnp.float32).reshape(rows64, cols64)
    lv64 = lv64.reshape(rows64, cols64, 32, 32)
    r64l = rm64y(lv64, qctx)
    dsk64 = jnp.sum(resid64 ** 2, axis=1).reshape(rows64, cols64)
    y64t = (lv64, rec64.reshape(rows64, cols64, 64, 64), d64, r64l, dsk64)
    sc32 = [_join_blocks(s, 4) for s in src_cb]
    pc32 = [_join_blocks(p, 4) for p in pred_cb]
    c32 = _code_nn_uv(sc32, pc32, fwd32, step32 * 0.5, q32, 1, cap32,
                      rm32c, g32)
    _, (lv64, rec64q, d64, r64l), (lu32, recu32, du32, ru32), \
        (lv32c, recv32, dv32, rv32) = _skip_rdo(lam_full, y64t, c32[0], c32[1],
                                                p64, pc32[0], pc32[1])
    cost64 = d64 + lam * r64l + du32 + lam * ru32 + dv32 + lam * rv32
    cost_sel32 = jnp.where(ch32, cost32, cost16)
    cost_sub = (cost_sel32.reshape(rows64, 2, cols64, 2).sum(axis=(1, 3))
                + lam * _SPLIT_OVERHEAD_BITS)
    d64s = d64 + du32 + dv32
    d_sel32 = jnp.where(ch32, d32s, d16s)
    d_sub = d_sel32.reshape(rows64, 2, cols64, 2).sum(axis=(1, 3))
    ch64 = eq64 & (cost64 < cost_sub) & (d64s <= d_sub * 1.1 + 256.0)

    # ---- zero the losing branches ----
    k32 = jnp.repeat(jnp.repeat(ch64, 2, 0), 2, 1)    # per 32-region
    k16 = jnp.repeat(jnp.repeat(ch64, 4, 0), 4, 1)    # per 16-block
    ch32 = ch32 & ~k32
    m16 = jnp.repeat(jnp.repeat(ch32, 2, 0), 2, 1) | k16  # 16 losing

    z16 = lambda a: jnp.where(m16[:, :, None, None], 0, a)
    z32 = lambda a: jnp.where(ch32[:, :, None, None], a, 0)
    z64 = lambda a: jnp.where(ch64[:, :, None, None], a, 0)

    # ---- split-16 union embed: 8x8/4x4 levels into the parent slots ----
    if sub8 is not None:
        se = split16[:, :, None, None]
        s8e = jnp.repeat(jnp.repeat(split16, 2, 0), 2, 1)[..., None, None]
        z8 = lambda a: jnp.where(s8e, a, 0)
        lv16 = jnp.where(se, _unquads(z8(l8y), 8), lv16)
        lu8 = jnp.where(se, _unquads(z8(l4u), 4), lu8)
        lv8 = jnp.where(se, _unquads(z8(l4v), 4), lv8)

    out = {
        "lv16": z16(lv16).astype(jnp.int16),
        "lu8": z16(lu8).astype(jnp.int16),
        "lv8": z16(lv8).astype(jnp.int16),
        "lv32": z32(lv32).astype(jnp.int16),
        "lu16": z32(lu16).astype(jnp.int16),
        "lv16c": z32(lv16c).astype(jnp.int16),
        "lv64": z64(lv64).astype(jnp.int16),
        "lu32": z64(lu32).astype(jnp.int16),
        "lv32c": z64(lv32c).astype(jnp.int16),
        "split32": ~ch32 & ~k32,    # True = split into 16s (given no 64)
        "split64": ~ch64,           # True = split into 32-level
    }

    # ---- stitched recon planes ----
    def plane_recon(recS, rec32m, rec64m, n):
        """recS: (rows, cols, n, n); rec32m: (rows32, cols32, 2n, 2n);
        rec64m: (rows64, cols64, 4n, 4n) -> (H, W) selected."""
        s16 = jnp.where(m16[:, :, None, None], 0, recS)
        as16_32 = (rec32m.reshape(rows32, cols32, 2, n, 2, n)
                   .transpose(0, 2, 1, 4, 3, 5)
                   .reshape(rows, cols, n, n))
        s32 = jnp.where(
            jnp.repeat(jnp.repeat(ch32, 2, 0), 2, 1)[:, :, None, None],
            as16_32, 0)
        as16_64 = (rec64m.reshape(rows64, cols64, 4, n, 4, n)
                   .transpose(0, 2, 1, 4, 3, 5)
                   .reshape(rows, cols, n, n))
        s64 = jnp.where(k16[:, :, None, None], as16_64, 0)
        sel = s16 + s32 + s64
        return (sel.reshape(rows, cols, n, n).transpose(0, 2, 1, 3)
                .reshape(rows * n, cols * n))

    out["recon_y"] = plane_recon(rec16, rec32, rec64q, 16)
    out["recon_u"] = plane_recon(recu8, recu16, recu32, 8)
    out["recon_v"] = plane_recon(recv8, recv16, recv32, 8)

    if sub8 is not None:
        # recon override + per-8 MV transport for split blocks
        rep2 = lambda a: jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)
        s8 = rep2(split16)
        my = jnp.repeat(jnp.repeat(s8, 8, 0), 8, 1)    # luma pixel mask
        mc = jnp.repeat(jnp.repeat(s8, 4, 0), 4, 1)    # chroma pixel mask
        out["recon_y"] = jnp.where(my, _from_blocks(rec8y), out["recon_y"])
        out["recon_u"] = jnp.where(mc, _from_blocks(rec4u), out["recon_u"])
        out["recon_v"] = jnp.where(mc, _from_blocks(rec4v), out["recon_v"])
        out["split16"] = split16
        out["mv8"] = jnp.where(s8[..., None], sub8["mv8"], rep2(mv8))
        # zeroed-where-unsplit grids for CDEF skip gating / engine replay
        s8e = s8[..., None, None]
        out["lv8y"] = jnp.where(s8e, l8y, 0).astype(jnp.int16)
        out["lu4"] = jnp.where(s8e, l4u, 0).astype(jnp.int16)
        out["lv4"] = jnp.where(s8e, l4v, 0).astype(jnp.int16)
    else:
        out["split16"] = split16
        out["mv8"] = jnp.repeat(jnp.repeat(mv8, 2, 0), 2, 1)
    return out


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def encode_inter_part(y, u, v, ref_y, ref_u, ref_v, qindex,
                      bit_depth: int = 8, sub8: bool = True,
                      gld_y=None, gld_u=None, gld_v=None, prev_mv=None,
                      noise_gate=None):
    """Partitioned inter encode: 16-grid motion search, 16->8x8 splits at
    motion boundaries, then 32/64 merge RDO.  Returns per-size level
    grids, MV grids (per-16 "mv" + per-8 "mv8"), split maps, a per-16
    reference map ("ref16": 0=LAST, 1=GOLDEN) and recon planes.

    gld_y/u/v: optional GOLDEN reference planes (the scene keyframe's
    in-loop-filtered recon, ref slot 1).  Blocks where the co-located
    GOLDEN block beats the LAST motion-searched prediction switch to
    ref=GOLDEN at the zero MV — the drift-arrest axis of the reference
    anchor's alt-ref structure (av1an.rs:14 --lookahead 40): content
    occluded or noise-drifted along the LAST chain re-anchors to the
    clean keyframe."""
    ac = _plane_params(qindex, 16, bit_depth)[0][1]
    lam = (ac * ac * 0.0234) ** 0.5

    pix_max = (1 << bit_depth) - 1
    mv8, pred_y, src_b, (p40, mv_px) = _search_mv(y, ref_y, lam, pix_max,
                                                  prev_mv=prev_mv)
    pred_u, pred_v = _chroma_mc_pair(ref_u, ref_v, mv8, pix_max)

    s8 = None
    if sub8:
        # pure-LAST stage: golden overrides come after, and golden blocks
        # never split (their candidates would mix references)
        s8 = _sub8_stage(y, ref_y, ref_u, ref_v, mv8, pred_y, p40, mv_px,
                         lam, pix_max)

    use_g = None
    if gld_y is not None:
        gzy = _to_blocks(gld_y, 16)
        sad_l = jnp.abs(src_b - pred_y).sum(axis=(2, 3)).astype(jnp.float32)
        sad_g = jnp.abs(src_b - gzy).sum(axis=(2, 3)).astype(jnp.float32)
        # the ref flag costs ~2 bits and breaking the LAST MV field's
        # coherence costs neighbors' stack quality: golden must win by a
        # clear margin
        use_g = sad_g + lam * _MV_BIAS * 6.0 < sad_l
        ge = use_g[..., None, None]
        mv8 = jnp.where(use_g[..., None], 0, mv8)
        pred_y = jnp.where(ge, gzy, pred_y)
        pred_u = jnp.where(ge, _to_blocks(gld_u, 8), pred_u)
        pred_v = jnp.where(ge, _to_blocks(gld_v, 8), pred_v)

    out = _inter_partition(src_b, pred_y,
                           (_to_blocks(u, 8), _to_blocks(v, 8)),
                           (pred_u, pred_v), mv8, qindex, bit_depth,
                           sub8=s8, use_g=use_g, noise_gate=noise_gate)
    out["mv"] = mv8
    out["mv_px"] = mv_px               # full-pel per-16 winner: the next
    # frame's temporal search candidate (golden blocks keep their
    # searched LAST MV here — it is a search hint, not a coded value)
    out["ref16"] = (use_g if use_g is not None
                    else jnp.zeros(mv8.shape[:2], bool))
    return out


def inter_part_sizes(height: int, width: int):
    nb = (height // 16) * (width // 16)
    nb32 = (height // 32) * (width // 32)
    nb64 = (height // 64) * (width // 64)
    ncoef = nb * 256 + 2 * nb * 64      # union layout: y16 | u8 | v8
    return nb, nb32, nb64, ncoef


def _gop_step_part_body(frame_u8, ref_fused, qindex, height: int,
                        width: int, cap: int, lf3=None, cdef_s=None,
                        gld_fused=None, prev_mv=None, noise_gate=None):
    """Partitioned _gop_step body: one inter frame, union-layout compact
    transport [count, bitmap, vals, split16, split32, split64, ref16,
    mv_y, mv_x].  lf3/cdef_s may be traced (see _gop_step_body); the
    in-loop filter chain is deblock -> CDEF exactly as the decoder runs
    it, with the skip gating recomputed from the same level grids the
    packer codes.  gld_fused: optional fused GOLDEN reference (the
    scene keyframe's filtered recon) enabling per-block LAST/GOLDEN."""
    from av1tpu.models.intra_part import (
        _embed64, _merge_quads, _merge_tiles4,
    )
    bit_depth = 8 if frame_u8.dtype == jnp.uint8 else 10
    ny = height * width
    nc = ny // 4

    def unfuse(f):
        return (f[:ny].reshape(height, width).astype(jnp.int32),
                f[ny : ny + nc].reshape(height // 2, width // 2)
                .astype(jnp.int32),
                f[ny + nc :].reshape(height // 2, width // 2)
                .astype(jnp.int32))

    yy, uu, vv = unfuse(frame_u8)
    ry, ru, rv = unfuse(ref_fused)
    gkw = {}
    if gld_fused is not None:
        gy, gu, gv = unfuse(gld_fused)
        gkw = {"gld_y": gy, "gld_u": gu, "gld_v": gv}
    o = encode_inter_part(yy, uu, vv, ry, ru, rv, qindex,
                          bit_depth=bit_depth, prev_mv=prev_mv,
                          noise_gate=noise_gate, **gkw)
    y16 = _merge_quads(o["lv16"], o["lv32"], 16)
    y16 = _embed64(y16, o["lv64"])
    u8 = _merge_quads(o["lu8"], o["lu16"], 8)
    u8 = _merge_tiles4(u8, o["lu32"], 8)
    v8 = _merge_quads(o["lv8"], o["lv16c"], 8)
    v8 = _merge_tiles4(v8, o["lv32c"], 8)
    flat = jnp.concatenate([y16.reshape(-1), u8.reshape(-1),
                            v8.reshape(-1)])
    # ---- prefix transport (see inter_part_layout): the device->host
    # link is the production bottleneck (~17 MB/s on the dev tunnel), so
    # the buffer is laid out [head | small fixed region | one compacted
    # dynamic stream] and the host fetches ONLY the used prefix — ~100 KB
    # per frame instead of the ~1 MB dense form.  The dynamic stream is
    # one lax.sort compaction of three keyed sections in order: nonzero
    # significance-bitmap words, nonzero coefficient levels, and the 8x8
    # sub-MVs of split16 blocks.  Dense-form capacity retries are gone:
    # the stream's device-side length covers the worst case and only the
    # prefix ever crosses the link.
    sig = flat != 0
    m = sig.shape[0]
    nwords = m // 16
    rows, cols = height // 16, width // 16
    nb = rows * cols
    bits = sig.reshape(nwords, 16).astype(jnp.uint16)
    bitmap = (bits << jnp.arange(16, dtype=jnp.uint16)).sum(
        axis=-1, dtype=jnp.uint16)
    count = jnp.sum(sig.astype(jnp.int32))
    w_nz = bitmap != 0
    countw = jnp.sum(w_nz.astype(jnp.int32))
    ns = jnp.sum(o["split16"].astype(jnp.int32))
    # L2: one bit per bitmap word (nwords is a multiple of 16 for
    # 64-aligned frames)
    l2bits = w_nz.reshape(nwords // 16, 16).astype(jnp.uint16)
    l2 = (l2bits << jnp.arange(16, dtype=jnp.uint16)).sum(
        axis=-1, dtype=jnp.uint16)

    def packb(b):
        v = b.reshape(-1).astype(jnp.uint16)
        pad = (-v.shape[0]) % 16
        if pad:
            v = jnp.concatenate([v, jnp.zeros(pad, jnp.uint16)])
        return jax.lax.bitcast_convert_type(
            (v.reshape(-1, 16) << jnp.arange(16, dtype=jnp.uint16)).sum(
                axis=-1, dtype=jnp.uint16), jnp.int16)

    # per-16-block groups of 8 sub-MVs [y00 x00 y01 x01 y10 x10 y11 x11]
    mvd = (o["mv8"].reshape(rows, 2, cols, 2, 2)
           .transpose(0, 2, 1, 3, 4).reshape(nb * 8))
    s16_rep = jnp.repeat(o["split16"].reshape(-1), 8)
    BIG = jnp.int32(0x7FFFFFFF)
    keys = jnp.concatenate([
        jnp.where(w_nz, jnp.arange(nwords, dtype=jnp.int32), BIG),
        jnp.where(sig, nwords + jnp.arange(m, dtype=jnp.int32), BIG),
        jnp.where(s16_rep, nwords + m + jnp.arange(nb * 8,
                                                   dtype=jnp.int32), BIG),
    ])
    stream = jnp.concatenate([
        jax.lax.bitcast_convert_type(bitmap, jnp.int16), flat,
        mvd.astype(jnp.int16)])
    _, dyn = jax.lax.sort((keys, stream), num_keys=1)
    head = jnp.stack([count & 0x7FFF, count >> 15,
                      countw & 0x7FFF, countw >> 15,
                      ns & 0x7FFF, ns >> 15,
                      jnp.int32(0), jnp.int32(0)]).astype(jnp.int16)
    buf = jnp.concatenate([
        head, jax.lax.bitcast_convert_type(l2, jnp.int16),
        packb(o["split16"]), packb(o["split32"]), packb(o["split64"]),
        packb(o["ref16"]),
        o["mv"][..., 0].reshape(-1).astype(jnp.int16),
        o["mv"][..., 1].reshape(-1).astype(jnp.int16),
        dyn])
    rcy, rcu, rcv = o["recon_y"], o["recon_u"], o["recon_v"]
    if lf3 is not None:
        from av1tpu.models.deblock_tpu import deblock_planes, edge_gates_j
        rows, cols = height // 16, width // 16
        v_on, h_on = edge_gates_j(o["split32"], o["split64"], rows, cols)
        rcy, rcu, rcv = deblock_planes(rcy, rcu, rcv, v_on, h_on,
                                       lf3[0], lf3[1], lf3[2], 0,
                                       bit_depth, split16=o["split16"])
    if cdef_s is not None:
        from av1tpu.models.cdef_tpu import (
            cdef_planes, merge_skip16, skip8_split, skip16_from_levels,
        )
        r16g, c16g = height // 16, width // 16
        y16g = y16.reshape(r16g, c16g, 16, 16)
        u8g = u8.reshape(r16g, c16g, 8, 8)
        v8g = v8.reshape(r16g, c16g, 8, 8)
        s16 = skip16_from_levels(y16g, u8g, v8g)
        s16 = merge_skip16(s16, o["split32"], o["split64"])
        rcy, rcu, rcv = cdef_planes(rcy, rcu, rcv,
                                    skip8_split(s16, o["split16"],
                                                y16g, u8g, v8g),
                                    cdef_s[0], cdef_s[1], cdef_s[2],
                                    cdef_s[3], 3, bit_depth)
    new_ref = jnp.concatenate([rcy.reshape(-1), rcu.reshape(-1),
                               rcv.reshape(-1)])
    return buf, new_ref, o["mv_px"]


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap", "lf"))
def _gop_step_part(frame_u8, ref_fused, qindex, height: int, width: int,
                   cap: int, lf=None, cdef_s=None, gld_fused=None,
                   prev_mv=None, noise_gate=None):
    """Jit of _gop_step_part_body with static lf levels (the single-device
    CLI path)."""
    lf3 = jnp.asarray(lf, jnp.int32) if (lf is not None and any(lf)) \
        else None
    return _gop_step_part_body(frame_u8, ref_fused, qindex, height, width,
                               cap, lf3, cdef_s, gld_fused, prev_mv,
                               noise_gate)


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap", "lf"))
def _gop_chunk_scan(frames_u8, q_f, is_ref, mv_scale, ref_fused, prev_mv,
                    height: int, width: int, cap: int, lf=None,
                    cdef_s=None, gld_fused=None, noise_gate=None):
    """ONE launch per chunk: lax.scan of the partitioned step over the
    frame axis (the body compiles once — no unrolling — and the recon/
    CDF-hint carries never leave the device).  The axon dispatch path
    charges ~25 ms per program launch, so scanning K frames in one
    launch beats K separate dispatches by ~20 ms/frame at identical
    math (the scan body is the same jaxpr the per-frame jit traced).

    Per-frame scanned inputs make one compiled graph serve both GOP
    modes: q_f (per-frame qindex), is_ref (non-reference frames leave
    the recon/MV carries untouched — the 2-layer pyramid), mv_scale
    (temporal-MV hint scale: 2 for distance-2 reference frames)."""
    lf3 = jnp.asarray(lf, jnp.int32) if (lf is not None and any(lf)) \
        else None
    if prev_mv is None:
        prev_mv = jnp.zeros((height // 16, width // 16, 2), jnp.int32)

    def body(carry, x):
        ref, pm = carry
        frame, qf, isr, msc = x
        buf, new_ref, mvpx = _gop_step_part_body(
            frame, ref, qf, height, width, cap, lf3, cdef_s, gld_fused,
            pm * msc, noise_gate)
        keep = isr != 0
        ref = jnp.where(keep, new_ref, ref)
        # per-frame motion field: a distance-2 ref frame's MVs halve
        pm = jnp.where(keep, jnp.where(msc > 1, mvpx >> 1, mvpx), mvpx)
        return (ref, pm), buf

    (ref, pm), bufs = jax.lax.scan(
        body, (ref_fused, prev_mv), (frames_u8, q_f, is_ref, mv_scale))
    return bufs, ref, pm


def encode_gop_chunk_part(frames_u8, ref_fused, qindex, height: int,
                          width: int, cap: int = 131072, lf=None,
                          cdef_s=None, gld_fused=None, prev_mv=None,
                          noise_gate=None):
    """Partitioned GOP chunk: one scanned launch, device carry.
    gld_fused: optional GOLDEN reference (the scene keyframe's filtered
    recon), constant across the scene.  prev_mv: optional (rows, cols, 2)
    full-pel MV field carried from the previous chunk's last frame (the
    temporal search candidate).  Returns (bufs (K, L) device array, ref,
    mv) — thread mv into the next chunk's prev_mv; fetch per-frame
    prefixes with fetch_inter_part_prefix(bufs[k], ...)."""
    frames_u8 = jnp.asarray(frames_u8)
    k = frames_u8.shape[0]
    q_f = jnp.full((k,), qindex, jnp.int32)
    ones = jnp.ones((k,), jnp.int32)
    return _gop_chunk_scan(frames_u8, q_f, ones, ones, ref_fused,
                           prev_mv, height, width, cap, lf, cdef_s,
                           gld_fused, noise_gate)


def encode_gop_chunk_layered(frames_u8, ref_fused, qindex, q_nr,
                             height: int, width: int, cap: int = 131072,
                             lf=None, cdef_s=None, gld_fused=None,
                             prev_mv=None, start_parity: int = 1,
                             noise_gate=None):
    """2-layer low-delay pyramid chunk: odd-parity frames are
    NON-REFERENCE (refresh_frame_flags = 0 downstream) — coded at the
    coarser q_nr against the running reference, with in-loop filters
    skipped (their recon is never referenced; the headers signal zero
    filter levels so decoder output still equals the device recon), and
    the recon/CDF chains advance only on even-parity frames.  Reference
    frames then code at temporal distance 2, seeded with a doubled
    temporal MV hint.  The structural half of the anchor's --lookahead
    pyramid (crates/daemon/src/encode/av1an.rs:14) without frame
    reordering.  Returns (bufs, parities, ref, per-frame mv hint)."""
    frames_u8 = jnp.asarray(frames_u8)
    k = frames_u8.shape[0]
    pars = [(start_parity + i) % 2 for i in range(k)]
    par = jnp.asarray(pars, jnp.int32)
    q_f = jnp.where(par == 1, q_nr, qindex).astype(jnp.int32)
    is_ref = (1 - par).astype(jnp.int32)
    mv_scale = jnp.where(par == 0, 2, 1).astype(jnp.int32)
    bufs, ref, pm = _gop_chunk_scan(frames_u8, q_f, is_ref, mv_scale,
                                    ref_fused, prev_mv, height, width,
                                    cap, lf, cdef_s, gld_fused,
                                    noise_gate)
    return bufs, pars, ref, pm


def inter_part_layout(height: int, width: int):
    """Prefix-transport layout of the partitioned inter buffer:
    [head(8) | L2 word-bitmap | packed split16/32/64 + ref16 flags |
     per-16 mv (y then x) | dynamic stream].  The host needs only
    head+fixed plus the dynamic prefix of length countw + count + 8*ns
    (nonzero bitmap words, nonzero levels, split-block sub-MVs)."""
    nb, nb32, nb64, ncoef = inter_part_sizes(height, width)
    nwords = ncoef // 16
    l2 = nwords // 16
    w = lambda n: (n + 15) // 16
    off_l2 = 8
    off_s16 = off_l2 + l2
    off_s32 = off_s16 + w(nb)
    off_s64 = off_s32 + w(nb32)
    off_ref = off_s64 + w(nb64)
    off_mv = off_ref + w(nb)
    fixed = off_mv + 2 * nb
    total = fixed + nwords + ncoef + 8 * nb
    return {"nb": nb, "nb32": nb32, "nb64": nb64, "ncoef": ncoef,
            "nwords": nwords, "l2": l2, "off_l2": off_l2,
            "off_s16": off_s16, "off_s32": off_s32, "off_s64": off_s64,
            "off_ref": off_ref, "off_mv": off_mv, "fixed": fixed,
            "total": total}


def _unpackb(words: np.ndarray, n: int):
    """Inverse of the device-side packb: int16 words -> (n,) bool."""
    return np.unpackbits(words.view(np.uint16).view(np.uint8),
                         bitorder="little")[:n].astype(bool)


def inter_part_prefix_len(head: np.ndarray, height: int, width: int):
    """Total prefix elements (head+fixed+dynamic) needed from a
    partitioned inter buffer whose first 8 int16s are `head`."""
    lay = inter_part_layout(height, width)
    count = int(head[0]) | (int(head[1]) << 15)
    countw = int(head[2]) | (int(head[3]) << 15)
    ns = int(head[4]) | (int(head[5]) << 15)
    return lay["fixed"] + countw + count + 8 * ns


def fetch_inter_part_prefix(buf_dev, height: int, width: int,
                            state: dict | None = None) -> np.ndarray:
    """Fetch ONLY the used prefix of a partitioned inter buffer over the
    (slow) device->host link: one speculative fetch sized from the last
    frame's usage, plus a tail fetch on undershoot.  Returns an np array
    `split_compact_inter_part` accepts."""
    lay = inter_part_layout(height, width)
    guess = lay["fixed"] + 98304
    if state is not None:
        guess = state.get("guess", guess)
    first = np.asarray(buf_dev[: min(guess, lay["total"])])
    need = inter_part_prefix_len(first[:8], height, width)
    if need > len(first):
        first = np.concatenate(
            [first, np.asarray(buf_dev[len(first) : need])])
    if state is not None:  # 1.5x headroom keeps refetches rare
        state["guess"] = need + (need - lay["fixed"]) // 2 + 4096
    return first[:need]


def split_compact_inter_part(buf: np.ndarray, height: int, width: int):
    """Host split of the prefix transport -> (count, bitmap u16 dense,
    vals i16, split16, split32, split64, ref16, mv (r8, c8, 2) i32
    per-8-block).  `buf` may be the full device buffer or just the used
    prefix — only head + fixed + dynamic-prefix elements are read."""
    buf = np.asarray(buf)
    lay = inter_part_layout(height, width)
    nb, nb32, nb64 = lay["nb"], lay["nb32"], lay["nb64"]
    nwords = lay["nwords"]
    r16, c16 = height // 16, width // 16
    count = int(buf[0]) | (int(buf[1]) << 15)
    countw = int(buf[2]) | (int(buf[3]) << 15)
    ns = int(buf[4]) | (int(buf[5]) << 15)
    w_nz = _unpackb(buf[lay["off_l2"] : lay["off_s16"]], nwords)
    split16 = _unpackb(buf[lay["off_s16"] : lay["off_s32"]],
                       nb).reshape(r16, c16)
    split32 = _unpackb(buf[lay["off_s32"] : lay["off_s64"]],
                       nb32).reshape(height // 32, width // 32)
    split64 = _unpackb(buf[lay["off_s64"] : lay["off_ref"]],
                       nb64).reshape(height // 64, width // 64)
    ref16 = _unpackb(buf[lay["off_ref"] : lay["off_mv"]],
                     nb).reshape(r16, c16)
    mv16 = np.asarray(buf[lay["off_mv"] : lay["fixed"]]).astype(np.int32)
    dyn = buf[lay["fixed"] : lay["fixed"] + countw + count + 8 * ns]
    bitmap = np.zeros(nwords, np.uint16)
    bitmap[w_nz] = dyn[:countw].view(np.uint16)
    vals = dyn[countw : countw + count]
    # per-8 MV grid: parent per-16 MV everywhere, split blocks overridden
    # by their transported sub-MVs
    mv = np.stack([mv16[:nb], mv16[nb:]], axis=-1).reshape(r16, c16, 2)
    mv8 = np.repeat(np.repeat(mv.reshape(r16, 1, c16, 1, 2), 2, 1),
                    2, 3)
    if ns:
        mvd = np.asarray(dyn[countw + count :]).astype(
            np.int32).reshape(ns, 2, 2, 2)
        ri, ci = np.nonzero(split16)
        mv8[ri, :, ci, :, :] = mvd
    mv8 = mv8.reshape(height // 8, width // 8, 2)
    return count, bitmap, vals, split16, split32, split64, ref16, mv8


def inter_sizes(height: int, width: int):
    nb = (height // 16) * (width // 16)
    ncoef = nb * 256 + 2 * nb * 64
    return nb, ncoef


def _compact(levels_flat, mv, cap: int):
    """[count_lo, count_hi, bitmap, vals(cap), mv_y, mv_x] int16.

    Stream compaction via lax.sort (stable sort by "position if nonzero
    else +inf") — measurably cheaper than the equivalent 3M-element
    scatter on TPU, which serializes on the scalar core."""
    sig = levels_flat != 0
    m = sig.shape[0]
    bits = sig.reshape(m // 16, 16).astype(jnp.uint16)
    bitmap = (bits << jnp.arange(16, dtype=jnp.uint16)).sum(
        axis=-1, dtype=jnp.uint16)
    count = jnp.sum(sig.astype(jnp.int32))
    key = jnp.where(sig, jnp.arange(m, dtype=jnp.int32),
                    jnp.int32(0x7FFFFFFF))
    _, vals = jax.lax.sort((key, levels_flat), num_keys=1)
    vals = vals[:cap]
    head = jnp.stack([count & 0x7FFF, count >> 15]).astype(jnp.int16)
    return jnp.concatenate([
        head, jax.lax.bitcast_convert_type(bitmap, jnp.int16), vals,
        mv[..., 0].reshape(-1).astype(jnp.int16),
        mv[..., 1].reshape(-1).astype(jnp.int16)])


def split_compact_inter(buf: np.ndarray, height: int, width: int):
    """Host split -> (count, bitmap u16, vals i16, mv (r16, c16, 2) i32)."""
    nb, ncoef = inter_sizes(height, width)
    nwords = ncoef // 16
    count = int(buf[0]) | (int(buf[1]) << 15)
    bitmap = buf[2 : 2 + nwords].view(np.uint16)
    vals = buf[2 + nwords : len(buf) - 2 * nb]
    mvs = buf[len(buf) - 2 * nb :].astype(np.int32)
    mv = np.stack([mvs[:nb], mvs[nb:]], axis=-1).reshape(
        height // 16, width // 16, 2)
    return count, bitmap, vals, mv


def unpack_levels_inter(bitmap: np.ndarray, vals: np.ndarray, height: int,
                        width: int):
    """Expand the compact form back into (ly, lu, lv) grids (host side)."""
    nb, ncoef = inter_sizes(height, width)
    sig = np.unpackbits(bitmap.view(np.uint8), bitorder="little")[:ncoef]
    flat = np.zeros(ncoef, np.int16)
    flat[sig.astype(bool)] = vals[: int(sig.sum())]
    r16, c16 = height // 16, width // 16
    ny = nb * 256
    ly = flat[:ny].reshape(r16, c16, 16, 16)
    lu = flat[ny : ny + nb * 64].reshape(r16, c16, 8, 8)
    lv = flat[ny + nb * 64 :].reshape(r16, c16, 8, 8)
    return ly, lu, lv


def _gop_step_body(frame_u8, ref_fused, qindex, height: int, width: int,
                   cap: int, lf3=None, cdef_s=None):
    """One inter frame against the fused running recon (composable: the
    single-device jit and the vmapped scene-batched path both wrap this).
    lf3: None or (3,) loop-filter levels — traced is fine (a level of 0
    disables the pass via the edge gates); cdef_s: None or (4,) coded
    CDEF strengths, also traced (zeros pass through).  Returns (compact
    int16 buffer, new fused recon int32)."""
    bit_depth = 8 if frame_u8.dtype == jnp.uint8 else 10
    ny = height * width
    nc = ny // 4

    def unfuse(f):
        return (f[:ny].reshape(height, width).astype(jnp.int32),
                f[ny : ny + nc].reshape(height // 2, width // 2)
                .astype(jnp.int32),
                f[ny + nc :].reshape(height // 2, width // 2)
                .astype(jnp.int32))

    yy, uu, vv = unfuse(frame_u8)
    ry, ru, rv = unfuse(ref_fused)
    o = encode_inter_v(yy, uu, vv, ry, ru, rv, qindex, bit_depth=bit_depth)
    flat = jnp.concatenate([o["levels_y"].reshape(-1),
                            o["levels_u"].reshape(-1),
                            o["levels_v"].reshape(-1)])
    buf = _compact(flat, o["mv"], cap)
    rcy, rcu, rcv = o["recon_y"], o["recon_u"], o["recon_v"]
    if lf3 is not None:
        from av1tpu.models.deblock_tpu import deblock_planes
        rows, cols = height // 16, width // 16
        rcy, rcu, rcv = deblock_planes(
            rcy, rcu, rcv, jnp.ones((rows, cols - 1), bool),
            jnp.ones((rows - 1, cols), bool), lf3[0], lf3[1], lf3[2],
            0, bit_depth)
    if cdef_s is not None:
        from av1tpu.models.cdef_tpu import (
            cdef_planes, skip8_of, skip16_from_levels,
        )
        s16 = skip16_from_levels(o["levels_y"], o["levels_u"],
                                 o["levels_v"])
        rcy, rcu, rcv = cdef_planes(rcy, rcu, rcv, skip8_of(s16),
                                    cdef_s[0], cdef_s[1], cdef_s[2],
                                    cdef_s[3], 3, bit_depth)
    new_ref = jnp.concatenate([rcy.reshape(-1), rcu.reshape(-1),
                               rcv.reshape(-1)])
    return buf, new_ref


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap", "lf"))
def _gop_step(frame_u8, ref_fused, qindex, height: int, width: int,
              cap: int, lf=None, cdef_s=None):
    """One inter frame against the fused running recon.  Returns (compact
    int16 buffer, new fused recon int32).  lf: optional static
    (ly, lu, lv) loop-filter levels — the in-loop deblock runs on the
    recon exactly as the decoder will (spec 7.14).  cdef_s: optional (4,)
    int32 coded CDEF strengths (deblock -> CDEF order, spec 7.15)."""
    lf3 = jnp.asarray(lf, jnp.int32) if (lf is not None and any(lf)) \
        else None
    return _gop_step_body(frame_u8, ref_fused, qindex, height, width,
                          cap, lf3, cdef_s)


def encode_gop_chunk(frames_u8, ref_fused, qindex, height: int, width: int,
                     cap: int = 131072, lf=None, cdef_s=None,
                     gld_fused=None):
    """Encode a chunk of inter frames against a running reconstruction.

    frames_u8: (K, n_pixels) fused sources (uint8/uint16; see
    intra_v.fuse_planes); ref_fused: (n_pixels,) int32 fused recon of the
    preceding frame.  Returns ((K, compact_len) int16 buffers, final fused
    recon int32).  A host loop over a single-frame jit rather than
    lax.scan: the compiled graph is the one-frame body (seconds, not
    minutes of XLA time on the remote compile path), dispatches are async
    so frame k's transfer overlaps frame k+1's compute, and the recon
    carry never leaves the device."""
    assert gld_fused is None, "two-ref coding needs the partitioned path"
    frames_u8 = jnp.asarray(frames_u8)
    bufs = []
    ref = ref_fused
    for k in range(frames_u8.shape[0]):
        buf, ref = _gop_step(frames_u8[k], ref, qindex, height, width, cap,
                             lf, cdef_s)
        bufs.append(buf)
    # a list, not a stacked array: callers fetch frame k's buffer while
    # frames k+1.. are still computing (async dispatch)
    return bufs, ref
