"""TPU wavefront intra pipeline: full mode RDO on anti-diagonals.

The row-parallel pipelines (intra_v/intra_part) restrict luma to
above-row-only modes {V, D45, D67}; on detailed content (textures, screen
text) the left-edge modes carry most of the intra gain.  This pipeline
processes the 16x16 block grid along anti-diagonals (SURVEY §7 hard part
(c)): blocks on a diagonal depend only on earlier diagonals, so each
lax.scan step codes a whole diagonal batch with the full spec mode set
{DC, V, H, D45, D67, SMOOTH, SMOOTH_V, SMOOTH_H, PAETH}.

Chroma is 8x8 DC_PRED (derived tx DCT_DCT).  Every prediction mirrors
av1tpu/spec/predict.py bit-exactly (same availability substitutions),
which the engine replay tests enforce (tests/test_intra_wave.py).

Keyframes are ~1/240 frames at the production operating point, so the
longer wavefront schedule (one scan step per diagonal) amortizes to
negligible per-frame cost while lifting keyframe quality — which every
inter frame in the scene then references.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.models.intra_v import _plane_params, quantize_coefs
from av1tpu.ops.transforms_jax import forward_matrix, inverse_transform
from av1tpu.spec.enums import (
    D45_PRED, D67_PRED, D113_PRED, D135_PRED, D157_PRED, D203_PRED,
    DC_PRED, H_PRED, PAETH_PRED, SMOOTH_H_PRED, SMOOTH_PRED,
    SMOOTH_V_PRED, V_PRED,
)
from av1tpu.spec.predict import (
    DR_INTRA_DERIVATIVE, MODE_ANGLE, SM_WEIGHTS,
)

WAVE_MODES = (DC_PRED, V_PRED, H_PRED, D45_PRED, D67_PRED, SMOOTH_PRED,
              SMOOTH_V_PRED, SMOOTH_H_PRED, PAETH_PRED, D135_PRED,
              D113_PRED, D157_PRED, D203_PRED)
# per-mode signaling bits from the kf_y_mode CDFs, context-averaged
# (av1tpu/models/rates.py kf_mode_bits) — replaces hand-set constants

# luma residuals are coded with the mode's derived transform (spec
# Mode_To_Txfm): vertical prediction leaves horizontally-smooth residual
# ramps ADST models better than DCT, etc.  Modes grouped by tx type so
# each group is one batched matmul; tx values are the spec enums
# (DCT_DCT=0, ADST_DCT=1, DCT_ADST=2, ADST_ADST=3).  The C++ packer and
# the engine replay derive the same mapping from the coded mode.
_TX_GROUPS = (
    (0, (0, 3)),            # DC, D45                  -> DCT_DCT
    (1, (1, 4, 6, 10)),     # V, D67, SMOOTH_V, D113   -> ADST_DCT
    (2, (2, 7, 11, 12)),    # H, SMOOTH_H, D157, D203  -> DCT_ADST
    (3, (5, 8, 9)),         # SMOOTH, PAETH, D135      -> ADST_ADST
)
_TX_ORDER = tuple(i for _, idxs in _TX_GROUPS for i in idxs)
_D203_POS = _TX_ORDER.index(12)  # cost row to mask where the decoder
# would read real below-left pixels (anti-causal for the wavefront)


def _r2(x, n):
    return (x + (1 << (n - 1))) >> n


def _ur_avail_grid(rows: int, cols: int) -> np.ndarray:
    """Above-right availability per 16-block (spec BlockDecoded model;
    matches intra_v._avail_ur_grid)."""
    m = np.array([[1, 1, 1, 1], [1, 0, 1, 0], [1, 1, 1, 0], [1, 0, 1, 0]],
                 np.bool_)
    g = np.zeros((rows, cols), np.bool_)
    for r in range(1, rows):
        g[r] = m[r % 4][np.arange(cols) % 4]
    g[:, cols - 1] = False
    return g


def _bl_avail_grid(rows: int, cols: int) -> np.ndarray:
    """Decoder-side below-left availability per 16-block (spec
    BlockDecoded in z-scan order, mirroring tile.py _have_below_left).
    A wavefront encoder can never produce those pixels in time (they lie
    on a LATER diagonal), so D203 is excluded from the RDO wherever the
    decoder would read them — everywhere else the decoder replicates
    left[15] exactly as the encoder predicts."""
    # z-order of the 4x4 16-block grid inside a 64 SB: below-left (i+1,
    # j-1) precedes (i, j) only at j % 4 == 0 (left SB, i % 4 < 3) and
    # j % 4 == 2 with even i % 4
    m = np.zeros((4, 4), np.bool_)
    m[:3, 0] = True
    m[0::2, 2] = True
    g = np.zeros((rows, cols), np.bool_)
    for r in range(rows - 1):      # frame-bottom row: no pixels below
        g[r] = m[r % 4][np.arange(cols) % 4]
    g[:, 0] = False                # frame col 0: have_left is false
    return g


def _diagonals(rows: int, cols: int):
    """Static wavefront schedule: (ndiag, L) r/c indices + validity.

    Diagonals follow d = 2r + c (the WPP slope): the above-right neighbor
    (r-1, c+1) then lands on d-1, so above, left, above-left AND
    above-right contexts are all complete before a block is coded.  A
    plain r+c anti-diagonal puts (r-1, c+1) on the SAME diagonal and the
    directional modes read stale context."""
    nd = 2 * (rows - 1) + cols
    sched = []
    for d in range(nd):
        blocks = [(r, d - 2 * r) for r in range(rows)
                  if 0 <= d - 2 * r < cols]
        sched.append(blocks)
    L = max(len(b) for b in sched)
    r_i = np.zeros((nd, L), np.int32)
    c_i = np.zeros((nd, L), np.int32)
    valid = np.zeros((nd, L), np.bool_)
    for d, blocks in enumerate(sched):
        for k, (r, c) in enumerate(blocks):
            r_i[d, k] = r
            c_i[d, k] = c
            valid[d, k] = True
    return r_i, c_i, valid


def _predict_modes(above32, left2n, corner, have_a, have_l, base, n=16):
    """Vectorized predictions for every WAVE_MODES entry.
    above32: (L, 2n); left2n: (L, 2n) — the below-left half real where
    the decoder would see decoded pixels, else the caller replicates
    left[n-1]; corner: (L,); have_a/have_l: (L,) bool.  Returns
    (n_modes, L, n, n) int32."""
    L = above32.shape[0]
    above = above32[:, :n]
    left = left2n[:, :n]
    preds = []
    for mode in WAVE_MODES:
        if mode == DC_PRED:
            lg = n.bit_length() - 1
            sa = above.sum(axis=1)
            sl = left.sum(axis=1)
            both = (sa + sl + n) >> (lg + 1)
            a_only = (sa + (n >> 1)) >> lg
            l_only = (sl + (n >> 1)) >> lg
            val = jnp.where(have_a & have_l, both,
                            jnp.where(have_a, a_only,
                                      jnp.where(have_l, l_only, base)))
            p = jnp.broadcast_to(val[:, None, None], (L, n, n))
        elif mode == V_PRED:
            p = jnp.broadcast_to(above[:, None, :], (L, n, n))
        elif mode == H_PRED:
            p = jnp.broadcast_to(left[:, :, None], (L, n, n))
        elif mode == PAETH_PRED:
            a = above[:, None, :]
            lft = left[:, :, None]
            co = corner[:, None, None]
            b = a + lft - co
            pa = jnp.abs(b - a)
            pl = jnp.abs(b - lft)
            pc = jnp.abs(b - co)
            p = jnp.where((pa <= pl) & (pa <= pc),
                          jnp.broadcast_to(a, (L, n, n)),
                          jnp.where(pl <= pc,
                                    jnp.broadcast_to(lft, (L, n, n)),
                                    jnp.broadcast_to(co, (L, n, n))))
        elif mode == SMOOTH_PRED:
            wy = jnp.asarray(SM_WEIGHTS[n], jnp.int32)[None, :, None]
            wx = jnp.asarray(SM_WEIGHTS[n], jnp.int32)[None, None, :]
            below = left[:, n - 1][:, None, None]
            right = above[:, n - 1][:, None, None]
            num = (wy * above[:, None, :] + (256 - wy) * below
                   + wx * left[:, :, None] + (256 - wx) * right)
            p = _r2(num, 9)
        elif mode == SMOOTH_V_PRED:
            wy = jnp.asarray(SM_WEIGHTS[n], jnp.int32)[None, :, None]
            below = left[:, n - 1][:, None, None]
            p = _r2(wy * above[:, None, :] + (256 - wy) * below, 8)
        elif mode == SMOOTH_H_PRED:
            wx = jnp.asarray(SM_WEIGHTS[n], jnp.int32)[None, None, :]
            right = above[:, n - 1][:, None, None]
            p = _r2(wx * left[:, :, None] + (256 - wx) * right, 8)
        elif mode in (D45_PRED, D67_PRED):
            dx = DR_INTRA_DERIVATIVE[MODE_ANGLE[mode]]
            i = np.arange(1, n + 1, dtype=np.int64)[:, None]
            j = np.arange(n, dtype=np.int64)[None, :]
            idx = i * dx
            pos = (idx >> 6) + j
            shift = ((idx >> 1) & 0x1F).astype(np.int32)
            max_base = 2 * n - 1
            b = np.minimum(pos, max_base)
            b1 = np.minimum(b + 1, max_base)
            g0 = jnp.take(above32, jnp.asarray(b.ravel()), axis=1)
            g1 = jnp.take(above32, jnp.asarray(b1.ravel()), axis=1)
            interp = _r2(g0.reshape(L, n, n) * (32 - jnp.asarray(shift))
                         + g1.reshape(L, n, n) * jnp.asarray(shift), 5)
            p = jnp.where(jnp.asarray(pos < max_base)[None],
                          interp, above32[:, max_base][:, None, None])
        elif mode in (D113_PRED, D135_PRED, D157_PRED):
            # zone 2 (spec 7.11.2.4, 90 < angle < 180): each pixel's ray
            # lands on the above row (through the corner at index -1) or
            # the left column; both branches computed, static select
            ang = MODE_ANGLE[mode]
            dx = DR_INTRA_DERIVATIVE[180 - ang]
            dy = DR_INTRA_DERIVATIVE[ang - 90]
            ri = np.arange(n, dtype=np.int64)[:, None]
            ci = np.arange(n, dtype=np.int64)[None, :]
            xi = (ci << 6) - (ri + 1) * dx
            base_x = xi >> 6                       # >= -1 when above-hit
            shift_x = ((xi >> 1) & 0x1F).astype(np.int32)
            above_c = jnp.concatenate(
                [corner[:, None], above32[:, : 2 * n - 1]], axis=1)
            bx = np.clip(base_x + 1, 0, 2 * n - 1)
            bx1 = np.minimum(bx + 1, 2 * n - 1)
            g0 = jnp.take(above_c, jnp.asarray(bx.ravel()), axis=1)
            g1 = jnp.take(above_c, jnp.asarray(bx1.ravel()), axis=1)
            vx = _r2(g0.reshape(L, n, n) * (32 - jnp.asarray(shift_x))
                     + g1.reshape(L, n, n) * jnp.asarray(shift_x), 5)
            yi = (ri << 6) - (ci + 1) * dy
            base_y = yi >> 6                       # >= -1 by geometry
            shift_y = ((yi >> 1) & 0x1F).astype(np.int32)
            left_c = jnp.concatenate([corner[:, None], left], axis=1)
            by = np.clip(base_y + 1, 0, n)
            by1 = np.minimum(by + 1, n)
            h0 = jnp.take(left_c, jnp.asarray(by.ravel()), axis=1)
            h1 = jnp.take(left_c, jnp.asarray(by1.ravel()), axis=1)
            vy = _r2(h0.reshape(L, n, n) * (32 - jnp.asarray(shift_y))
                     + h1.reshape(L, n, n) * jnp.asarray(shift_y), 5)
            p = jnp.where(jnp.asarray(base_x >= -1)[None], vx, vy)
        else:  # D203: zone 3 (left-only, the transpose of zone 1); reads
            # the left2n extension (real below-left pixels where decoded,
            # caller-replicated otherwise; the 16-level RDO masks this
            # mode wherever the decoder would see pixels the wavefront
            # cannot produce in time)
            dy = DR_INTRA_DERIVATIVE[270 - MODE_ANGLE[mode]]
            ri = np.arange(n, dtype=np.int64)[:, None]
            ci = np.arange(n, dtype=np.int64)[None, :]
            idx = (ci + 1) * dy
            pos = (idx >> 6) + ri
            shift = ((idx >> 1) & 0x1F).astype(np.int32)
            max_base = 2 * n - 1
            b = np.minimum(pos, max_base)
            b1 = np.minimum(b + 1, max_base)
            g0 = jnp.take(left2n, jnp.asarray(b.ravel()), axis=1)
            g1 = jnp.take(left2n, jnp.asarray(b1.ravel()), axis=1)
            interp = _r2(g0.reshape(L, n, n) * (32 - jnp.asarray(shift))
                         + g1.reshape(L, n, n) * jnp.asarray(shift), 5)
            p = jnp.where(jnp.asarray(pos < max_base)[None],
                          interp, left2n[:, max_base][:, None, None])
        preds.append(p.astype(jnp.int32))
    return jnp.stack(preds)


def _edges_from_blocks(rec, r_i, c_i, have_a, have_l, ur_ok, base, n):
    """Edge arrays for a diagonal batch from the carried block tensor
    rec (rows, cols, n, n).  Returns (above2n (L, 2n), left (L, n),
    corner (L,)), with the spec's availability substitutions."""
    rows, cols = rec.shape[:2]
    rm = jnp.maximum(r_i - 1, 0)
    cm = jnp.maximum(c_i - 1, 0)
    cp = jnp.minimum(c_i + 1, cols - 1)
    above_raw = rec[rm, c_i][:, n - 1, :]          # (L, n)
    left_raw = rec[r_i, cm][:, :, n - 1]           # (L, n)
    ur_raw = rec[rm, cp][:, n - 1, :]              # (L, n)
    corner_raw = rec[rm, cm][:, n - 1, n - 1]      # (L,)

    left0 = left_raw[:, 0]
    above = jnp.where(have_a[:, None], above_raw,
                      jnp.where(have_l[:, None], left0[:, None],
                                base - 1))
    left = jnp.where(have_l[:, None], left_raw,
                     jnp.where(have_a[:, None], above_raw[:, 0:1],
                               base + 1))
    corner = jnp.where(have_a & have_l, corner_raw,
                       jnp.where(have_a, above[:, 0],
                                 jnp.where(have_l, left[:, 0], base)))
    ur = jnp.where((ur_ok & have_a)[:, None], ur_raw,
                   above[:, n - 1][:, None])
    return jnp.concatenate([above, ur], axis=1), left, corner


@functools.partial(jax.jit, static_argnames=("bit_depth", "lam_scale"))
def encode_intra_wave(y, u, v, qindex, bit_depth: int = 8,
                      lam_scale: float = 1.0, noise_gate=0.0):
    """Full-frame wavefront intra encode.  Returns level grids, recon
    planes and per-block luma modes (uv is DC_PRED everywhere).

    lam_scale: RDO lambda multiplier.  A GOP keyframe's reconstruction is
    referenced by every following frame in the scene (and carried through
    their skip blocks verbatim), so its distortion is paid ~scene-length
    times while its bits are paid once; the CLI passes the same
    _REF_LAM_SCALE discount the inter merge RDO uses (inter_v.py)."""
    h, w = y.shape
    rows, cols = h // 16, w // 16
    base = 1 << (bit_depth - 1)
    pix_max = (1 << bit_depth) - 1
    nd = rows + cols - 1
    L = min(rows, cols)

    fwd16t = {t: jnp.asarray(forward_matrix(16, 16, t))
              for t, _ in _TX_GROUPS}
    fwd8 = jnp.asarray(forward_matrix(8, 8, 0))     # chroma DC -> DCT
    step16, q16, cap16 = _plane_params(qindex, 16, bit_depth)
    step8, q8, cap8 = _plane_params(qindex, 8, bit_depth)
    ac = step16[1]
    lam = (ac * ac * 0.0234 * lam_scale).astype(jnp.float32)
    from av1tpu.models.rates import RateModel, kf_mode_bits, qctx_index

    # mode candidates in _TX_ORDER (grouped by derived transform)
    mode_bits = jnp.asarray(
        kf_mode_bits()[[WAVE_MODES[i] for i in _TX_ORDER]])
    mode_vals = jnp.asarray([WAVE_MODES[i] for i in _TX_ORDER], jnp.int8)
    qctx = qctx_index(qindex)
    rm16y = RateModel(16, 0)

    src_y = (y.reshape(rows, 16, cols, 16).transpose(0, 2, 1, 3)
             .astype(jnp.int32))
    src_u = (u.reshape(rows, 8, cols, 8).transpose(0, 2, 1, 3)
             .astype(jnp.int32))
    src_v = (v.reshape(rows, 8, cols, 8).transpose(0, 2, 1, 3)
             .astype(jnp.int32))

    r_np, c_np, valid_np = _diagonals(rows, cols)
    ur_np = _ur_avail_grid(rows, cols)
    bl_np = _bl_avail_grid(rows, cols)
    xs = {
        "r": jnp.asarray(r_np), "c": jnp.asarray(c_np),
        "valid": jnp.asarray(valid_np),
        "ur": jnp.asarray(ur_np[r_np, c_np] & valid_np),
        "bl": jnp.asarray(bl_np[r_np, c_np] & valid_np),
    }

    from av1tpu.models.rdoq import coef_gains, rd_zero

    rm8c = RateModel(8, 1)
    g16t = {t: jnp.asarray(coef_gains(16, t)) for t, _ in _TX_GROUPS}
    g8 = jnp.asarray(coef_gains(8))

    # sub-tx (TX_MODE_SELECT) refinement constants: the winning mode is
    # re-coded at TX_8X8 and TX_4X4 with per-tx-block prediction — on
    # detailed content the 4/8-px-away edges predict far better than the
    # block's outer edges, cutting residual rate AND distortion at once
    # (the lever SVT's intra tx-size RDO provides; headers then signal
    # TX_MODE_SELECT and the packer codes one tx-depth symbol per block)
    fwd8t = {t: jnp.asarray(forward_matrix(8, 8, t)) for t, _ in _TX_GROUPS}
    fwd4t = {t: jnp.asarray(forward_matrix(4, 4, t)) for t, _ in _TX_GROUPS}
    step4, q4, cap4 = _plane_params(qindex, 4, bit_depth)
    rm8y, rm4y = RateModel(8, 0), RateModel(4, 0)
    g8s = jnp.stack([jnp.asarray(coef_gains(8, t)) for t in range(4)])
    g4s = jnp.stack([jnp.asarray(coef_gains(4, t)) for t in range(4)])
    grp_of_pos = jnp.asarray([t for t, idxs in _TX_GROUPS for _ in idxs],
                             jnp.int32)
    # tx-depth symbol bits from the default tx_size cdf (category 1)
    _TXD_BITS = (1.42, 0.87, 3.66)

    def code_blocks(src, pred, fwd, stepq, q, cap, n, rm=None, tx=0,
                    gains=None):
        """(..., n, n) -> levels, recon, dist, rate.  rm: optional
        rates.RateModel (real-CDF expected bits; else the log2 proxy).
        tx/gains: transform type + its coefficient gains (luma groups).
        Near-threshold levels are RD-pruned against the frame lambda
        (rdoq.rd_zero) — on noisy sources this is what keeps the
        keyframe from coding sensor noise coefficient by coefficient."""
        sh = src.shape[:-2]
        resid = (src - pred).reshape(-1, n * n).astype(jnp.float32)
        coefs = resid @ fwd.T
        lv = quantize_coefs(coefs, stepq, cap)
        rdm = rm if rm is not None else rm8c
        lv = rd_zero(lv, coefs, q.astype(jnp.float32), lam,
                     rdm.tabs[qctx], gains if gains is not None else g8,
                     noise_gate=jnp.asarray(noise_gate, jnp.float32))
        rec = jnp.clip(pred.reshape(-1, n, n)
                       + inverse_transform((lv * q).reshape(-1, n, n),
                                           n, n, tx), 0, pix_max)
        dist = jnp.sum((rec - src.reshape(-1, n, n)) ** 2,
                       axis=(1, 2)).astype(jnp.float32)
        if rm is not None:
            rate = rm(lv.reshape(-1, n, n), qctx)
        else:
            a = jnp.abs(lv.astype(jnp.float32))
            rate = jnp.sum(jnp.where(a > 0, 2.0, 0.0)
                           + jnp.log2(1.0 + a), axis=1)
        return (lv.reshape(sh + (n, n)), rec.reshape(sh + (n, n)),
                dist.reshape(sh), rate.reshape(sh))

    def step(carry, x):
        rec_y, rec_u, rec_v, lv_y, lv_u, lv_v, modes, txds = carry
        r_i, c_i, valid, ur_ok = x["r"], x["c"], x["valid"], x["ur"]
        have_a = (r_i > 0) & valid
        have_l = (c_i > 0) & valid

        # ---- luma: full-mode RDO at TX_16X16 ----
        above32, left, corner = _edges_from_blocks(
            rec_y, r_i, c_i, have_a, have_l, ur_ok, base, 16)
        left2n = jnp.concatenate(
            [left, jnp.repeat(left[:, 15:], 16, axis=1)], axis=1)
        preds = _predict_modes(above32, left2n, corner, have_a, have_l,
                               base)                    # (M, L, 16, 16)
        src_b = src_y[r_i, c_i]                         # (L, 16, 16)
        # per-tx-group residual coding (preds reordered to _TX_ORDER so
        # the concatenated candidates line up with mode_vals/mode_bits)
        parts = []
        for t, idxs in _TX_GROUPS:
            pg = preds[jnp.asarray(idxs)]
            srcg = jnp.broadcast_to(src_b[None], pg.shape)
            parts.append(code_blocks(srcg, pg, fwd16t[t], step16, q16,
                                     cap16, 16, rm=rm16y, tx=t,
                                     gains=g16t[t]))
        lv, rec, dist, rate = (jnp.concatenate([p[k] for p in parts],
                                               axis=0) for k in range(4))
        cost = dist + lam * (rate + mode_bits[:, None])
        # D203 is anti-causal where the decoder has real below-left
        # pixels (see _bl_avail_grid): exclude it there
        cost = cost.at[_D203_POS].add(
            jnp.where(x["bl"], jnp.inf, 0.0))
        pick = jnp.argmin(cost, axis=0)                 # (L,)
        sel = lambda t: jnp.take_along_axis(
            t, pick[None, :, None, None], axis=0)[0]
        lv_b = sel(lv)
        rec_b = sel(rec)
        mode_b = mode_vals[pick]
        cost_b = jnp.min(cost, axis=0) + lam * _TXD_BITS[0]
        grp_b = grp_of_pos[pick]                        # (L,) tx group
        L_ = pick.shape[0]

        def sub_chain(ns, fwds, stepq, qq, capn, rm, gstack):
            """Re-code every lane's winning mode at tx size ns with
            per-tx-block prediction (raster order inside the block, the
            decoder's coding order; edges come from already-reconstructed
            sub-blocks, with the spec's availability substitutions)."""
            k = 16 // ns
            recb = jnp.zeros((L_, 16, 16), jnp.int32)
            lvb = jnp.zeros((L_, 16, 16), jnp.int16)
            distb = jnp.zeros(L_, jnp.float32)
            rateb = jnp.zeros(L_, jnp.float32)
            qf = qq.astype(jnp.float32)
            gain_l = jnp.take(gstack, grp_b, axis=0)    # (L, ns*ns)
            tcdf = rm.tabs[qctx]
            ones = jnp.ones_like(have_a)
            for si in range(k):
                for sj in range(k):
                    y0, x0 = si * ns, sj * ns
                    if si == 0:
                        a2 = above32[:, x0 : x0 + 2 * ns]
                        if sj > 0:  # frame-top row: decoder substitutes
                            # from the left neighbor's TOP pixel
                            a2 = jnp.where(have_a[:, None], a2,
                                           recb[:, 0, x0 - 1][:, None])
                    else:
                        row = recb[:, y0 - 1, :]
                        idx = np.minimum(np.arange(x0, x0 + 2 * ns), 15)
                        # above-right: real rec through col 15 (the sub
                        # above-right is already decoded in raster),
                        # clamp-replicated past the block edge
                        a2 = row[:, idx]
                    if sj == 0:
                        idx = np.minimum(np.arange(y0, y0 + 2 * ns), 15)
                        l2 = left[:, idx]
                        if si > 0:  # frame-left col substitution
                            l2 = jnp.where(have_l[:, None], l2,
                                           recb[:, y0 - 1, 0][:, None])
                    else:
                        col = recb[:, :, x0 - 1]
                        idx = np.minimum(np.arange(y0, y0 + 2 * ns),
                                         y0 + ns - 1)  # below-left of an
                        # interior sub is never decoded yet: replicate
                        l2 = col[:, idx]
                    if si == 0 and sj == 0:
                        co = corner
                    elif si == 0:
                        co = jnp.where(have_a, above32[:, x0 - 1],
                                       recb[:, 0, x0 - 1])
                    elif sj == 0:
                        co = jnp.where(have_l, left[:, y0 - 1],
                                       recb[:, y0 - 1, 0])
                    else:
                        co = recb[:, y0 - 1, x0 - 1]
                    ha = have_a if si == 0 else ones
                    hl = have_l if sj == 0 else ones
                    ps = _predict_modes(a2, l2, co, ha, hl, base, n=ns)
                    pred = jnp.take_along_axis(
                        ps, pick[None, :, None, None], axis=0)[0]
                    srcs = src_b[:, y0 : y0 + ns, x0 : x0 + ns]
                    resid = (srcs - pred).reshape(L_, ns * ns).astype(
                        jnp.float32)
                    coefs = jnp.zeros_like(resid)
                    for t, _ in _TX_GROUPS:
                        m = (grp_b == t)[:, None]
                        coefs = coefs + jnp.where(m, resid @ fwds[t].T, 0)
                    lvq = quantize_coefs(coefs, stepq, capn)
                    lvq = rd_zero(lvq, coefs, qf, lam, tcdf, gain_l,
                                  noise_gate=jnp.asarray(noise_gate,
                                                         jnp.float32))
                    inv = jnp.zeros((L_, ns, ns), jnp.float32)
                    dq = (lvq * qq).reshape(L_, ns, ns)
                    for t, _ in _TX_GROUPS:
                        m = (grp_b == t)[:, None, None]
                        inv = inv + jnp.where(
                            m, inverse_transform(dq, ns, ns, t), 0)
                    recs = jnp.clip(pred + inv, 0, pix_max).astype(
                        jnp.int32)
                    distb = distb + jnp.sum(
                        (recs - srcs) ** 2, axis=(1, 2)).astype(
                            jnp.float32)
                    rateb = rateb + rm(lvq.reshape(L_, ns, ns), qctx)
                    recb = recb.at[:, y0 : y0 + ns, x0 : x0 + ns].set(recs)
                    lvb = lvb.at[:, y0 : y0 + ns, x0 : x0 + ns].set(
                        lvq.reshape(L_, ns, ns).astype(jnp.int16))
            return lvb, recb, distb, rateb

        lv8, rec8, dist8, rate8 = sub_chain(8, fwd8t, step8, q8, cap8,
                                            rm8y, g8s)
        lv4, rec4, dist4, rate4 = sub_chain(4, fwd4t, step4, q4, cap4,
                                            rm4y, g4s)
        cost8 = dist8 + lam * (rate8 + mode_bits[pick] + _TXD_BITS[1])
        cost4 = dist4 + lam * (rate4 + mode_bits[pick] + _TXD_BITS[2])
        txd_b = jnp.where(cost8 < jnp.minimum(cost_b, cost4), 1,
                          jnp.where(cost4 < cost_b, 2, 0)).astype(jnp.int8)
        d1 = (txd_b == 1)[:, None, None]
        d2 = (txd_b == 2)[:, None, None]
        lv_b = jnp.where(d1, lv8, jnp.where(d2, lv4, lv_b))
        rec_b = jnp.where(d1, rec8, jnp.where(d2, rec4, rec_b))

        # ---- chroma: DC only ----
        au, lu_e, cu = _edges_from_blocks(rec_u, r_i, c_i, have_a, have_l,
                                          ur_ok, base, 8)
        av, lv_e, cv = _edges_from_blocks(rec_v, r_i, c_i, have_a, have_l,
                                          ur_ok, base, 8)

        def dc8(above2n, left8):
            sa = above2n[:, :8].sum(axis=1)
            sl = left8.sum(axis=1)
            val = jnp.where(have_a & have_l, (sa + sl + 8) >> 4,
                            jnp.where(have_a, (sa + 4) >> 3,
                                      jnp.where(have_l, (sl + 4) >> 3,
                                                base)))
            return jnp.broadcast_to(val[:, None, None],
                                    (val.shape[0], 8, 8)).astype(jnp.int32)

        pu = dc8(au, lu_e)
        pv = dc8(av, lv_e)
        lvu_b, recu_b, _, _ = code_blocks(src_u[r_i, c_i], pu, fwd8,
                                          step8, q8, cap8, 8)
        lvv_b, recv_b, _, _ = code_blocks(src_v[r_i, c_i], pv, fwd8,
                                          step8, q8, cap8, 8)

        # padding lanes carry duplicate (0, 0) indices; send them
        # out-of-bounds so mode="drop" discards them instead of racing
        # the valid lane's write
        ri_s = jnp.where(valid, r_i, rows)
        ci_s = jnp.where(valid, c_i, cols)
        upd = lambda g, vals: g.at[ri_s, ci_s].set(vals, mode="drop")
        rec_y = upd(rec_y, rec_b)
        rec_u = upd(rec_u, recu_b)
        rec_v = upd(rec_v, recv_b)
        lv_y = upd(lv_y, lv_b.astype(jnp.int16))
        lv_u = upd(lv_u, lvu_b.astype(jnp.int16))
        lv_v = upd(lv_v, lvv_b.astype(jnp.int16))
        modes = modes.at[ri_s, ci_s].set(mode_b, mode="drop")
        txds = txds.at[ri_s, ci_s].set(txd_b, mode="drop")
        return (rec_y, rec_u, rec_v, lv_y, lv_u, lv_v, modes, txds), None

    init = (jnp.zeros((rows, cols, 16, 16), jnp.int32),
            jnp.zeros((rows, cols, 8, 8), jnp.int32),
            jnp.zeros((rows, cols, 8, 8), jnp.int32),
            jnp.zeros((rows, cols, 16, 16), jnp.int16),
            jnp.zeros((rows, cols, 8, 8), jnp.int16),
            jnp.zeros((rows, cols, 8, 8), jnp.int16),
            jnp.zeros((rows, cols), jnp.int8),
            jnp.zeros((rows, cols), jnp.int8))
    (rec_y, rec_u, rec_v, lv_y, lv_u, lv_v,
     modes, txds), _ = jax.lax.scan(step, init, xs)

    def unblk(t, n):
        r2, c2 = t.shape[:2]
        return t.transpose(0, 2, 1, 3).reshape(r2 * n, c2 * n)

    return {"levels_y": lv_y, "levels_u": lv_u, "levels_v": lv_v,
            "modes": modes, "txd": txds,
            "recon_y": unblk(rec_y, 16), "recon_u": unblk(rec_u, 8),
            "recon_v": unblk(rec_v, 8)}


def _wave_key_body(frame_u8, qindex, height: int, width: int,
                   cap: int = 163840, lf3=None, lam_scale: float = 1.0,
                   noise_gate=0.0):
    """Wavefront keyframe for a GOP: compact transport (same layout as
    intra_v's [head | bitmap | vals | modes]) + fused int32 recon kept on
    device as the inter scan's starting reference.  lf3: None or (3,)
    loop-filter levels, traced is fine (composable: the single-device jit
    and the vmapped scene-batched path both wrap this)."""
    bit_depth = 8 if frame_u8.dtype == jnp.uint8 else 10
    ny = height * width
    nc = ny // 4
    yy = frame_u8[:ny].reshape(height, width).astype(jnp.int32)
    uu = frame_u8[ny : ny + nc].reshape(height // 2,
                                        width // 2).astype(jnp.int32)
    vv = frame_u8[ny + nc :].reshape(height // 2,
                                     width // 2).astype(jnp.int32)
    o = encode_intra_wave(yy, uu, vv, qindex, bit_depth=bit_depth,
                          lam_scale=lam_scale, noise_gate=noise_gate)
    flat = jnp.concatenate([o["levels_y"].reshape(-1),
                            o["levels_u"].reshape(-1),
                            o["levels_v"].reshape(-1)])
    sig = flat != 0
    m = sig.shape[0]
    bits = sig.reshape(m // 16, 16).astype(jnp.uint16)
    bitmap = (bits << jnp.arange(16, dtype=jnp.uint16)).sum(
        axis=-1, dtype=jnp.uint16)
    count = jnp.sum(sig.astype(jnp.int32))
    key = jnp.where(sig, jnp.arange(m, dtype=jnp.int32),
                    jnp.int32(0x7FFFFFFF))
    _, vals = jax.lax.sort((key, flat), num_keys=1)
    head = jnp.stack([count & 0x7FFF, count >> 15]).astype(jnp.int16)
    buf = jnp.concatenate([head,
                           jax.lax.bitcast_convert_type(bitmap, jnp.int16),
                           vals[:cap],
                           o["modes"].reshape(-1).astype(jnp.int16),
                           o["txd"].reshape(-1).astype(jnp.int16)])
    rcy, rcu, rcv = o["recon_y"], o["recon_u"], o["recon_v"]
    if lf3 is not None:
        from av1tpu.models.deblock_tpu import deblock_planes
        rows, cols = height // 16, width // 16
        rcy, rcu, rcv = deblock_planes(
            rcy, rcu, rcv, jnp.ones((rows, cols - 1), bool),
            jnp.ones((rows - 1, cols), bool), lf3[0], lf3[1], lf3[2], 0,
            bit_depth)
    recon = jnp.concatenate([rcy.reshape(-1), rcu.reshape(-1),
                             rcv.reshape(-1)]).astype(jnp.int32)
    return buf, recon


def split_compact_wave(buf: np.ndarray, height: int, width: int):
    """Host-side split of the wavefront compact buffer
    [head | bitmap | vals | modes | txd].  Returns (count, bitmap uint16,
    values int16, modes int16, txd int16)."""
    count = int(buf[0]) | (int(buf[1]) << 15)
    nwords = (height * width + height * width // 2) // 16
    nblocks = (height // 16) * (width // 16)
    bitmap = buf[2 : 2 + nwords].view(np.uint16)
    vals = buf[2 + nwords : len(buf) - 2 * nblocks]
    modes = buf[len(buf) - 2 * nblocks : len(buf) - nblocks]
    txd = buf[len(buf) - nblocks :]
    return count, bitmap, vals, modes, txd


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap", "lf",
                                    "lam_scale"))
def encode_intra_wave_key_recon(frame_u8, qindex, height: int, width: int,
                                cap: int = 163840, lf=None,
                                lam_scale: float = 1.0, noise_gate=0.0):
    """Jit of _wave_key_body with static lf levels (the single-device CLI
    path).  noise_gate: traced (3*sigma)^2 RDOQ noise floor (0 = off)."""
    lf3 = jnp.asarray(lf, jnp.int32) if (lf is not None and any(lf)) \
        else None
    return _wave_key_body(frame_u8, qindex, height, width, cap, lf3,
                          lam_scale, noise_gate)
