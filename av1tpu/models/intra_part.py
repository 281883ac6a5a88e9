"""TPU intra pipeline with 32x32/16x16 partition RDO.

Extends the row-parallel design of intra_v: the frame is processed in
32-luma-pixel block rows; within each, both 16x16 candidates (two RDO'd
16-rows, V/D45/D67 per block) and a 32x32 candidate (V/D45/D67, DCT,
dequant shift 1) are coded, and each 32x32 region picks NONE vs SPLIT by
pixel-domain rate-distortion cost.  Chroma block size is dictated by the
luma choice (spec: chroma bsize for a 32 block is 16x16 with derived
ADST_DCT), so both the 8x8 two-row and 16x16 one-row chroma codings are
computed and selected by the split grid.

All prediction stays above-row-only, so every step remains one batched
matmul + vectorized integer butterflies; the only sequencing is the scan
over 32-rows (and the first frame row's per-column chain).

Costs: coefficient-domain SSE divided by the measured coef/pixel ratio
(6.4 for 16x16, 1.51 for 32x32 at this transform scaling) + lambda * rate,
lambda = 0.047 * ac^2 (the 0.3 coefficient-domain value from intra_v
converted to pixel domain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.models.intra_v import (
    _RDO_MODES, _UR_MASK, _directional_pred, _plane_params, quantize_coefs,
)
from av1tpu.ops.transforms_jax import forward_matrix, inverse_transform

_RATIO = {16: 6.4, 32: 1.51, 64: 1.51}  # 64 shares the shift-(2,4) scaling
_SPLIT_OVERHEAD_BITS = 12.0  # extra signaling of 4 blocks vs 1


@functools.cache
def _fwd64() -> np.ndarray:
    """Forward transform for TX_64X64 as a (1024, 4096) float32 matrix:
    pseudo-inverse of the integer inverse linearized over the 1024 coded
    (top-left 32x32) coefficients — the only ones the bitstream carries."""
    from av1tpu.spec.transforms import idct64, round2
    units = np.zeros((1024, 64, 64), np.int64)
    idx = np.arange(1024)
    units[idx, idx // 32, idx % 32] = 1 << 12  # scale for rounding fidelity
    t = round2(idct64(units), 2)
    t = round2(idct64(np.swapaxes(t, -1, -2)), 4)
    pixels = np.swapaxes(t, -1, -2).reshape(1024, 4096) / (1 << 12)
    return np.linalg.pinv(pixels.T).astype(np.float32)


def _avail16_grid(rows: int, cols: int) -> np.ndarray:
    g = np.zeros((rows, cols), np.bool_)
    for r in range(1, rows):
        g[r] = _UR_MASK[r % 4][np.arange(cols) % 4]
    g[:, cols - 1] = False
    return g


def _avail32_grid(rows32: int, cols32: int) -> np.ndarray:
    # 32-blocks form 2x2 per SB; Z-order: only the SB's bottom-right 32
    # lacks above-right (plus the frame's last column / first row)
    m = np.array([[1, 1], [1, 0]], np.bool_)
    g = np.zeros((rows32, cols32), np.bool_)
    for r in range(1, rows32):
        g[r] = m[r % 2][np.arange(cols32) % 2]
    g[:, cols32 - 1] = False
    return g


def _edges(bottom, av, n: int, cols: int):
    """(cols, 2n) above edges with above-right from a full-width bottom
    row carry, replicated where unavailable."""
    padded = jnp.concatenate([bottom, bottom[-1:].repeat(n)])
    win = jnp.asarray(np.arange(cols)[:, None] * n
                      + np.arange(2 * n)[None, :])
    ae = jnp.take(padded, win)
    repl = ae[:, n - 1][:, None]
    k = jnp.arange(2 * n)[None, :]
    return jnp.where((k < n) | av[:, None], ae, repl)


def _mode_rdo(blocks, ae, consts):
    """Shared V/D45/D67 RD selection for one row of n x n blocks.
    Returns (lv int32 (cols,n,n), pred (cols,n,n), modes int8, cost_pix)."""
    n, fwd, step_eff, cap, lam_pix, tab, gains = consts
    cols = blocks.shape[0]
    pred_v = jnp.repeat(ae[:, None, :n], n, axis=1)
    cands = [(1, pred_v)]
    for mode_val, dx in _RDO_MODES:
        cands.append((mode_val, _directional_pred(ae, dx, n)))
    nm = len(cands)
    preds = jnp.concatenate([p for _, p in cands], axis=0)
    blocks_r = jnp.tile(blocks, (nm, 1, 1))
    resid = (blocks_r - preds).reshape(nm * cols, n * n).astype(jnp.float32)
    coefs = resid @ fwd.T
    lv_all = quantize_coefs(coefs, step_eff, cap)
    if tab is not None:
        from av1tpu.models.rdoq import rd_zero
        lv_all = rd_zero(lv_all, coefs, step_eff, lam_pix, tab, gains)
    dist = (jnp.sum((coefs - lv_all * step_eff) ** 2, axis=1)
            / _RATIO[n]).reshape(nm, -1)
    alv = jnp.abs(lv_all.astype(jnp.float32))
    rate = jnp.sum(jnp.where(alv > 0, 2.0, 0.0) + jnp.log2(1.0 + alv),
                   axis=1).reshape(nm, -1)
    rate = rate + jnp.array([0.0] + [4.0] * (nm - 1), jnp.float32)[:, None]
    cost = dist + lam_pix * rate
    choice = jnp.argmin(cost, axis=0)
    lv = jnp.take_along_axis(lv_all.reshape(nm, cols, n, n),
                             choice[None, :, None, None], axis=0)[0]
    pred = jnp.take_along_axis(preds.reshape(nm, cols, n, n),
                               choice[None, :, None, None], axis=0)[0]
    modes = jnp.asarray([m for m, _ in cands], jnp.int8)[choice]
    best = jnp.take_along_axis(cost, choice[None], axis=0)[0]
    return lv, pred, modes, best


def _recon16(lv, pred, q, pix_max):
    r = inverse_transform(lv * q.reshape(16, 16), 16, 16, 0)
    return jnp.clip(pred + r, 0, pix_max)


def _recon32(lv, pred, q, pix_max):
    dq = jnp.sign(lv) * ((jnp.abs(lv) * q.reshape(32, 32)) >> 1)
    r = inverse_transform(dq, 32, 32, 0)
    return jnp.clip(pred + r, 0, pix_max)


def _encode_luma_part(src, qindex, bit_depth: int = 8):
    """Returns (lv16 (r16,c16,16,16) i16, lv32 (r32,c32,32,32) i16,
    modes16 i8, modes32 i8, split (r32,c32) bool, recon)."""
    h, w = src.shape
    rows16, cols16 = h // 16, w // 16
    rows32, cols32 = h // 32, w // 32
    pix_max = (1 << bit_depth) - 1
    base = 1 << (bit_depth - 1)

    fwd16 = jnp.asarray(forward_matrix(16, 16, 0))
    fwd32 = jnp.asarray(forward_matrix(32, 32, 0))
    step16, q16, cap16 = _plane_params(qindex, 16, bit_depth)
    step32, q32, cap32 = _plane_params(qindex, 32, bit_depth)
    ac = step16[1]
    lam_pix = (ac * ac * 0.0234).astype(jnp.float32)
    from av1tpu.models.rates import RateModel, qctx_index
    from av1tpu.models.rdoq import coef_gains

    qctx = qctx_index(qindex)
    c16 = (16, fwd16, step16, cap16, lam_pix,
           RateModel(16, 0).tabs[qctx], jnp.asarray(coef_gains(16)))
    c32 = (32, fwd32, step32 * 0.5, cap32, lam_pix,   # dequant shift 1
           RateModel(32, 0).tabs[qctx], jnp.asarray(coef_gains(32)))

    src16 = src.reshape(rows16, 16, cols16, 16).transpose(0, 2, 1, 3)
    src32 = src.reshape(rows32, 32, cols32, 32).transpose(0, 2, 1, 3)
    av16 = jnp.asarray(_avail16_grid(rows16, cols16))
    av32 = jnp.asarray(_avail32_grid(rows32, cols32))

    def rdo16_row(bottom, blocks, av):
        ae = _edges(bottom, av, 16, cols16)
        lv, pred, modes, cost = _mode_rdo(blocks, ae, c16)
        rec = _recon16(lv, pred, q16, pix_max)
        return lv, rec, modes, cost

    # ---- frame row 0: forced SPLIT; top 16-row is the sequential chain ----
    def col_step(edge_val, block):
        pred = jnp.full((16, 16), edge_val, jnp.int32)
        resid = (block - pred).reshape(1, 256).astype(jnp.float32)
        coefs = resid @ fwd16.T
        lv = quantize_coefs(coefs, step16, cap16).reshape(16, 16)
        rec = _recon16(lv[None], pred[None], q16, pix_max)[0]
        return rec[0, 15], (lv, rec)

    _, (lv_r0t, rec_r0t) = jax.lax.scan(col_step, jnp.int32(base - 1),
                                        src16[0])
    lv_r0b, rec_r0b, modes_r0b, _ = rdo16_row(
        rec_r0t[:, 15, :].reshape(-1), src16[1], av16[1])
    row0 = {
        "lv16": jnp.stack([lv_r0t.astype(jnp.int16),
                           lv_r0b.astype(jnp.int16)]),
        "modes16": jnp.stack([jnp.full((cols16,), 1, jnp.int8), modes_r0b]),
        "rec": jnp.stack([rec_r0t, rec_r0b]),
        "split": jnp.ones((cols32,), bool),
        "lv32": jnp.zeros((cols32, 32, 32), jnp.int16),
        "modes32": jnp.full((cols32,), 1, jnp.int8),
    }

    def row32_step(bottom, xs):
        blocks16_t, blocks16_b, blocks32, av_t, av_b, av3 = xs
        lv_t, rec_t, modes_t, cost_t = rdo16_row(bottom, blocks16_t, av_t)
        lv_b, rec_b, modes_b, cost_b = rdo16_row(
            rec_t[:, 15, :].reshape(-1), blocks16_b, av_b)
        ae32 = _edges(bottom, av3, 32, cols32)
        lv32, pred32, modes32, cost32 = _mode_rdo(blocks32, ae32, c32)
        rec32 = _recon32(lv32, pred32, q32, pix_max)

        cost_16s = (cost_t.reshape(cols32, 2).sum(1)
                    + cost_b.reshape(cols32, 2).sum(1)
                    + lam_pix * _SPLIT_OVERHEAD_BITS)
        split = cost_16s < cost32                       # (cols32,)

        # zero the losing branch's levels
        s4 = jnp.repeat(split, 2)
        lv_t = jnp.where(s4[:, None, None], lv_t, 0).astype(jnp.int16)
        lv_b = jnp.where(s4[:, None, None], lv_b, 0).astype(jnp.int16)
        lv32 = jnp.where(split[:, None, None], 0, lv32).astype(jnp.int16)

        # carry: bottom pixel row from the winning branch
        bot16 = rec_b[:, 15, :].reshape(cols32, 32)
        bot32 = rec32[:, 31, :]
        carry = jnp.where(split[:, None], bot16, bot32).reshape(-1)
        # recon rows (2, cols16, 16, 16) from the winning branch
        rec32_as16 = (rec32.reshape(cols32, 2, 16, 2, 16)
                      .transpose(1, 0, 3, 2, 4)
                      .reshape(2, cols16, 16, 16))
        rec16_pair = jnp.stack([rec_t, rec_b])
        rec = jnp.where(s4[None, :, None, None], rec16_pair, rec32_as16)
        # exact pixel-domain cost of the SELECTED coding per region, so the
        # 64x64 comparison (whose distortion is also pixel-exact) is fair
        blocks_pair = jnp.stack([blocks16_t, blocks16_b])
        d_sel = jnp.sum((rec - blocks_pair) ** 2,
                        axis=(0, 2, 3)).astype(jnp.float32)
        d_region = d_sel.reshape(cols32, 2).sum(1)
        a16 = jnp.abs(jnp.stack([lv_t, lv_b]).astype(jnp.float32))
        r16 = jnp.sum(jnp.where(a16 > 0, 2.0, 0.0) + jnp.log2(1.0 + a16),
                      axis=(0, 2, 3)).reshape(cols32, 2).sum(1)
        a32 = jnp.abs(lv32.astype(jnp.float32))
        r32 = jnp.sum(jnp.where(a32 > 0, 2.0, 0.0) + jnp.log2(1.0 + a32),
                      axis=(1, 2))
        cost_region = d_region + lam_pix * (r16 + r32)
        return carry, {"lv16": jnp.stack([lv_t, lv_b]),
                       "modes16": jnp.stack([modes_t, modes_b]),
                       "rec": rec, "split": split, "lv32": lv32,
                       "modes32": modes32, "cost": cost_region}

    # ---- third level: one 64x64 V_PRED candidate per superblock ----
    cols64 = cols32 // 2
    rows64 = rows32 // 2
    f64 = jnp.asarray(_fwd64())
    # 1024 coded coefficients, dc at [0]: reuse the 32x32-shaped quantizer
    # rows; effective step is q/4 (TX_64X64 dequant shift 2)
    step64_base, q64, cap64 = _plane_params(qindex, 32, bit_depth)
    step64 = step64_base * 0.25
    tab64 = RateModel(64, 0).tabs[qctx]
    g64 = jnp.asarray(coef_gains(64))
    src64 = src.reshape(rows64, 64, cols64, 64).transpose(0, 2, 1, 3)
    # above-right of a 64 block = the next SB at the fully-decoded row above
    av64_np = np.zeros((rows64, cols64), np.bool_)
    av64_np[1:, : cols64 - 1] = True
    av64 = jnp.asarray(av64_np)

    def sb_step(bottom, xs):
        xs_a, xs_b, blocks64, av6 = xs
        c1, o1 = row32_step(bottom, xs_a)
        c2, o2 = row32_step(c1, xs_b)

        ae64 = _edges(bottom, av6, 64, cols64)
        pred64 = jnp.repeat(ae64[:, None, :64], 64, axis=1)
        resid = (blocks64 - pred64).reshape(cols64, 4096).astype(jnp.float32)
        coefs = resid @ f64.T                      # (cols64, 1024)
        lv64 = quantize_coefs(coefs, step64, cap64)
        from av1tpu.models.rdoq import rd_zero as _rdz
        lv64 = _rdz(lv64, coefs, q64.astype(jnp.float32) * 0.25, lam_pix,
                    tab64, g64)
        dq = jnp.sign(lv64) * ((jnp.abs(lv64) * q64) >> 2)
        full = jnp.zeros((cols64, 64, 64), jnp.int32).at[
            :, :32, :32].set(dq.reshape(cols64, 32, 32))
        rec64 = jnp.clip(pred64 + inverse_transform(full, 64, 64, 0),
                         0, pix_max)
        # 64 distortion must be pixel-domain: the truncated high frequencies
        # are invisible in the coefficient domain
        d64 = jnp.sum((rec64 - blocks64) ** 2,
                      axis=(1, 2)).astype(jnp.float32)
        alv = jnp.abs(lv64.astype(jnp.float32))
        r64 = jnp.sum(jnp.where(alv > 0, 2.0, 0.0) + jnp.log2(1.0 + alv),
                      axis=1)
        cost64 = d64 + lam_pix * r64
        cost_sub = (o1["cost"].reshape(cols64, 2).sum(1)
                    + o2["cost"].reshape(cols64, 2).sum(1)
                    + lam_pix * _SPLIT_OVERHEAD_BITS)
        split64 = cost_sub < cost64                # (cols64,) True = split

        lv64 = jnp.where(split64[:, None], 0, lv64).astype(jnp.int16)
        # zero the sub-level grids where the 64 wins
        k2 = jnp.repeat(split64, 2)                # per 32-region
        k4 = jnp.repeat(split64, 4)                # per 16-col
        outs = {}
        for idx, o in enumerate((o1, o2)):
            o = dict(o)
            o["lv16"] = jnp.where(k4[None, :, None, None], o["lv16"], 0)
            o["lv32"] = jnp.where(k2[:, None, None], o["lv32"], 0)
            o["split"] = o["split"] & k2
            outs[idx] = o
        # carry + recon rows from the winner
        bot_sub = c2.reshape(cols64, 64)
        carry = jnp.where(split64[:, None], bot_sub,
                          rec64[:, 63, :]).reshape(-1)
        rec64_as16 = (rec64.reshape(cols64, 4, 16, 4, 16)
                      .transpose(1, 0, 3, 2, 4).reshape(4, cols16, 16, 16))
        rec_sub = jnp.concatenate([outs[0]["rec"], outs[1]["rec"]], axis=0)
        rec = jnp.where(k4[None, :, None, None], rec_sub, rec64_as16)
        ys = {"lv16": jnp.concatenate([outs[0]["lv16"], outs[1]["lv16"]]),
              "modes16": jnp.concatenate([outs[0]["modes16"],
                                          outs[1]["modes16"]]),
              "rec": rec,
              "split": jnp.stack([outs[0]["split"], outs[1]["split"]]),
              "lv32": jnp.stack([outs[0]["lv32"], outs[1]["lv32"]]),
              "modes32": jnp.stack([outs[0]["modes32"],
                                    outs[1]["modes32"]]),
              "lv64": lv64, "split64": split64}
        return carry, ys

    # SB row 0: frame row 0 forces splitting; no 64 candidate
    carry0 = rec_r0b[:, 15, :].reshape(-1)
    xs_r1 = (src16[2], src16[3], src32[1], av16[2], av16[3], av32[1])
    c_r1, o_r1 = row32_step(carry0, xs_r1)
    sb0 = {"lv16": jnp.concatenate([row0["lv16"], o_r1["lv16"]]),
           "modes16": jnp.concatenate([row0["modes16"], o_r1["modes16"]]),
           "rec": jnp.concatenate([row0["rec"], o_r1["rec"]]),
           "split": jnp.stack([row0["split"], o_r1["split"]]),
           "lv32": jnp.stack([row0["lv32"], o_r1["lv32"]]),
           "modes32": jnp.stack([row0["modes32"], o_r1["modes32"]]),
           "lv64": jnp.zeros((cols64, 1024), jnp.int16),
           "split64": jnp.ones((cols64,), bool)}

    if rows64 > 1:
        xs = (
            (src16[4::4], src16[5::4], src32[2::2],
             av16[4::4], av16[5::4], av32[2::2]),
            (src16[6::4], src16[7::4], src32[3::2],
             av16[6::4], av16[7::4], av32[3::2]),
            src64[1:], av64[1:],
        )
        _, rest = jax.lax.scan(sb_step, c_r1, xs)
        out = {k: jnp.concatenate([sb0[k][None], rest[k]], axis=0)
               for k in sb0}
    else:
        out = {k: v[None] for k, v in sb0.items()}

    lv16 = out["lv16"].reshape(rows16, cols16, 16, 16)
    modes16 = out["modes16"].reshape(rows16, cols16)
    recon = (out["rec"].reshape(rows64, 4, cols16, 16, 16)
             .transpose(0, 1, 3, 2, 4).reshape(h, w))
    return (lv16, out["lv32"].reshape(rows32, cols32, 32, 32),
            modes16, out["modes32"].reshape(rows32, cols32),
            out["split"].reshape(rows32, cols32), recon,
            out["lv64"].reshape(rows64, cols64, 32, 32), out["split64"])


def _encode_chroma_dual(src, split, split64, qindex, bit_depth: int = 8):
    """Chroma plane with size dictated by the luma partition grids: 8x8
    blocks where a 32-region split, a 16x16 ADST_DCT block where a 32 won,
    and a 32x32 DCT block where the 64 won.  Returns (lv8, lv16, recon,
    lv32)."""
    h, w = src.shape
    rows8, cols8 = h // 8, w // 8
    rows16c, cols16c = h // 16, w // 16  # == rows32, cols32 of luma
    pix_max = (1 << bit_depth) - 1
    base = 1 << (bit_depth - 1)

    fwd8 = jnp.asarray(forward_matrix(8, 8, 1))    # ADST_DCT (uv V_PRED)
    fwd16 = jnp.asarray(forward_matrix(16, 16, 1))
    step8, q8, cap8 = _plane_params(qindex, 8, bit_depth)
    step16, q16, cap16 = _plane_params(qindex, 16, bit_depth)

    from av1tpu.models.rates import RateModel, qctx_index
    from av1tpu.models.rdoq import coef_gains, rd_zero

    qctx = qctx_index(qindex)
    ac = _plane_params(qindex, 16, bit_depth)[0][1]
    lam_pix = (ac * ac * 0.0234).astype(jnp.float32)
    ctabs = {8: RateModel(8, 1).tabs[qctx], 16: RateModel(16, 1).tabs[qctx],
             32: RateModel(32, 1).tabs[qctx]}
    cgains = {(8, 1): jnp.asarray(coef_gains(8, 1)),
              (16, 1): jnp.asarray(coef_gains(16, 1)),
              (32, 0): jnp.asarray(coef_gains(32, 0))}

    src8 = src.reshape(rows8, 8, cols8, 8).transpose(0, 2, 1, 3)
    src16 = src.reshape(rows16c, 16, cols16c, 16).transpose(0, 2, 1, 3)

    def enc(blocks, pred, fwd, step, q, cap, n, tt):
        b = blocks.shape[0]
        resid = (blocks - pred).reshape(b, n * n).astype(jnp.float32)
        coefs = resid @ fwd.T
        lv = quantize_coefs(coefs, step, cap)
        lv = rd_zero(lv, coefs, q.astype(jnp.float32), lam_pix,
                     ctabs[n], cgains[(n, tt)])
        r = inverse_transform((lv * q).reshape(b, n, n), n, n, tt)
        return lv.reshape(b, n, n), jnp.clip(pred + r, 0, pix_max)

    def row8_v(bottom, blocks):
        pred = jnp.repeat(bottom.reshape(cols8, 1, 8), 8, axis=1)
        return enc(blocks, pred, fwd8, step8, q8, cap8, 8, 1)

    # frame row 0 (always split): sequential 8x8 chain
    def col_step(edge_val, block):
        pred = jnp.full((8, 8), edge_val, jnp.int32)
        lv, rec = enc(block[None], pred[None], fwd8, step8, q8, cap8, 8, 1)
        return rec[0, 0, 7], (lv[0], rec[0])

    _, (lv8_0t, rec8_0t) = jax.lax.scan(col_step, jnp.int32(base - 1),
                                        src8[0])
    lv8_0b, rec8_0b = row8_v(rec8_0t[:, 7, :], src8[1])
    row0 = {
        "lv8": jnp.stack([lv8_0t, lv8_0b]).astype(jnp.int16),
        "lv16": jnp.zeros((cols16c, 16, 16), jnp.int16),
        "rec": jnp.stack([rec8_0t, rec8_0b]),
    }

    def row16_step(bottom, xs):
        blocks8_t, blocks8_b, blocks16, sp = xs
        lv8_t, rec8_t = row8_v(bottom.reshape(cols8, 8), blocks8_t)
        lv8_b, rec8_b = row8_v(rec8_t[:, 7, :], blocks8_b)
        pred16 = jnp.repeat(bottom.reshape(cols16c, 1, 16), 16, axis=1)
        lv16, rec16 = enc(blocks16, pred16, fwd16, step16, q16, cap16,
                          16, 1)
        s2 = jnp.repeat(sp, 2)
        lv8_t = jnp.where(s2[:, None, None], lv8_t, 0)
        lv8_b = jnp.where(s2[:, None, None], lv8_b, 0)
        lv16 = jnp.where(sp[:, None, None], 0, lv16)
        bot8 = rec8_b[:, 7, :].reshape(cols16c, 16)
        bot16 = rec16[:, 15, :]
        carry = jnp.where(sp[:, None], bot8, bot16).reshape(-1)
        rec16_as8 = (rec16.reshape(cols16c, 2, 8, 2, 8)
                     .transpose(1, 0, 3, 2, 4).reshape(2, cols8, 8, 8))
        rec8_pair = jnp.stack([rec8_t, rec8_b])
        rec = jnp.where(s2[None, :, None, None], rec8_pair, rec16_as8)
        return carry, {"lv8": jnp.stack([lv8_t, lv8_b]).astype(jnp.int16),
                       "lv16": lv16.astype(jnp.int16), "rec": rec}

    # ---- third level: one 32x32 DCT chroma block where the luma chose 64
    cols32c = w // 32              # == cols64 of luma
    rows32c = h // 32              # == rows64
    fwd32 = jnp.asarray(forward_matrix(32, 32, 0))  # chroma 32: derived DCT
    step32b, q32, cap32 = _plane_params(qindex, 32, bit_depth)
    step32 = step32b * 0.5         # dequant shift 1
    src32 = src.reshape(rows32c, 32, cols32c, 32).transpose(0, 2, 1, 3)

    def chroma_sb_step(bottom, xs):
        xs_a, xs_b, blocks32, sp64 = xs
        c1, o1 = row16_step(bottom, xs_a)
        c2, o2 = row16_step(c1, xs_b)
        pred32 = jnp.repeat(bottom.reshape(cols32c, 1, 32), 32, axis=1)
        resid = (blocks32 - pred32).reshape(cols32c, 1024).astype(
            jnp.float32)
        coefs = resid @ fwd32.T
        lv32 = quantize_coefs(coefs, step32, cap32)
        lv32 = rd_zero(lv32, coefs, q32.astype(jnp.float32) * 0.5,
                       lam_pix, ctabs[32], cgains[(32, 0)])
        dq = jnp.sign(lv32) * ((jnp.abs(lv32) * q32) >> 1)
        rec32 = jnp.clip(
            pred32 + inverse_transform(dq.reshape(cols32c, 32, 32),
                                       32, 32, 0), 0, pix_max)
        k2 = jnp.repeat(sp64, 2)   # per 16c-region
        k4 = jnp.repeat(sp64, 4)   # per 8-col
        outs = []
        for o in (o1, o2):
            o = dict(o)
            o["lv8"] = jnp.where(k4[None, :, None, None], o["lv8"], 0)
            o["lv16"] = jnp.where(k2[:, None, None], o["lv16"], 0)
            outs.append(o)
        lv32 = jnp.where(sp64[:, None], 0, lv32).astype(jnp.int16)
        bot_sub = c2.reshape(cols32c, 32)
        carry = jnp.where(sp64[:, None], bot_sub,
                          rec32[:, 31, :]).reshape(-1)
        rec32_as8 = (rec32.reshape(cols32c, 4, 8, 4, 8)
                     .transpose(1, 0, 3, 2, 4).reshape(4, cols8, 8, 8))
        rec_sub = jnp.concatenate([outs[0]["rec"], outs[1]["rec"]], axis=0)
        rec = jnp.where(k4[None, :, None, None], rec_sub, rec32_as8)
        return carry, {
            "lv8": jnp.concatenate([outs[0]["lv8"], outs[1]["lv8"]]),
            "lv16": jnp.stack([outs[0]["lv16"], outs[1]["lv16"]]),
            "rec": rec, "lv32": lv32}

    # SB row 0 (no 64): frame chroma row 0 special + one normal 16c-row
    carry0 = rec8_0b[:, 7, :].reshape(-1)
    c_r1, o_r1 = row16_step(carry0, (src8[2], src8[3], src16[1], split[1]))
    sb0 = {"lv8": jnp.concatenate([row0["lv8"], o_r1["lv8"]]),
           "lv16": jnp.stack([row0["lv16"], o_r1["lv16"]]),
           "rec": jnp.concatenate([row0["rec"], o_r1["rec"]]),
           "lv32": jnp.zeros((cols32c, 1024), jnp.int16)}

    if rows32c > 1:
        xs = ((src8[4::4], src8[5::4], src16[2::2], split[2::2]),
              (src8[6::4], src8[7::4], src16[3::2], split[3::2]),
              src32[1:], split64[1:])
        _, rest = jax.lax.scan(chroma_sb_step, c_r1, xs)
        out = {k: jnp.concatenate([sb0[k][None], rest[k]], axis=0)
               for k in sb0}
    else:
        out = {k: v[None] for k, v in sb0.items()}

    lv8 = out["lv8"].reshape(rows8, cols8, 8, 8)
    recon = (out["rec"].reshape(rows32c, 4, cols8, 8, 8)
             .transpose(0, 1, 3, 2, 4).reshape(h, w))
    return (lv8, out["lv16"].reshape(rows16c, cols16c, 16, 16), recon,
            out["lv32"].reshape(rows32c, cols32c, 32, 32))


def _part_compact_and_recon(frame_u8, qindex, height: int, width: int,
                            cap: int, lf=None):
    bit_depth = 8 if frame_u8.dtype == jnp.uint8 else 10
    ny = height * width
    nc = ny // 4
    y = frame_u8[:ny].reshape(height, width).astype(jnp.int32)
    u = frame_u8[ny : ny + nc].reshape(height // 2,
                                       width // 2).astype(jnp.int32)
    v = frame_u8[ny + nc :].reshape(height // 2,
                                    width // 2).astype(jnp.int32)
    o = encode_intra_part(y, u, v, qindex, bit_depth=bit_depth)
    # union layout: the 32x32 (and chroma 16x16) winners' coefficients are
    # scattered into the losing branch's zeroed 16x16 (8x8) grid slots as
    # raster quadrants, so the transport is exactly the fast path's size +
    # the tiny meta arrays.  The split map tells the packer how to read.
    y16 = _merge_quads(o["levels_y16"], o["levels_y32"], 16)
    y16 = _embed64(y16, o["levels_y64"])
    u8 = _merge_quads(o["levels_u8"], o["levels_u16"], 8)
    u8 = _merge_tiles4(u8, o["levels_u32"], 8)
    v8 = _merge_quads(o["levels_v8"], o["levels_v16"], 8)
    v8 = _merge_tiles4(v8, o["levels_v32"], 8)
    flat = jnp.concatenate([y16.reshape(-1), u8.reshape(-1),
                            v8.reshape(-1)])
    sig = flat != 0
    m = sig.shape[0]
    bits = sig.reshape(m // 16, 16).astype(jnp.uint16)
    bitmap = (bits << jnp.arange(16, dtype=jnp.uint16)).sum(
        axis=-1, dtype=jnp.uint16)
    pos = jnp.cumsum(sig.astype(jnp.int32)) - 1
    count = pos[-1] + 1
    vals = jnp.zeros((cap,), jnp.int16).at[
        jnp.where(sig, pos, cap)].set(flat, mode="drop")
    head = jnp.stack([count & 0x7FFF, count >> 15]).astype(jnp.int16)
    buf = jnp.concatenate([
        head, jax.lax.bitcast_convert_type(bitmap, jnp.int16), vals,
        o["modes16"].reshape(-1).astype(jnp.int16),
        o["modes32"].reshape(-1).astype(jnp.int16),
        o["split"].reshape(-1).astype(jnp.int16),
        o["split64"].reshape(-1).astype(jnp.int16)])
    rcy, rcu, rcv = o["recon_y"], o["recon_u"], o["recon_v"]
    if lf is not None and any(lf):
        from av1tpu.models.deblock_tpu import deblock_planes, edge_gates_j
        rows, cols = height // 16, width // 16
        v_on, h_on = edge_gates_j(o["split"], o["split64"], rows, cols)
        rcy, rcu, rcv = deblock_planes(rcy, rcu, rcv, v_on, h_on,
                                       lf[0], lf[1], lf[2], 0, bit_depth)
    recon = jnp.concatenate([rcy.reshape(-1), rcu.reshape(-1),
                             rcv.reshape(-1)]).astype(jnp.int32)
    return buf, recon


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap"))
def encode_intra_part_compact(frame_u8, qindex, height: int, width: int,
                              cap: int = 163840):
    """Compact transport for the partition pipeline: ONE int16 buffer
    [count_lo, count_hi, bitmap over the section layout
    (y16|y32|u8|v8|u16|v16), values (cap), modes16, modes32, split]."""
    return _part_compact_and_recon(frame_u8, qindex, height, width, cap)[0]


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap", "lf"))
def encode_intra_key_recon(frame_u8, qindex, height: int, width: int,
                           cap: int = 163840, lf=None):
    """Keyframe for a GOP: compact transport + fused int32 reconstruction
    (kept on device as the inter scan's starting reference).  lf: static
    (ly, lu, lv) levels — the recon is deblocked in-loop, with merged
    32/64 interior edges gated off per the split maps."""
    buf, recon = _part_compact_and_recon(frame_u8, qindex, height, width,
                                         cap, lf=lf)
    return buf, recon


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap"))
def encode_intra_part_chunk(frames_u8, qindex, height: int, width: int,
                            cap: int = 163840):
    """(K, n_pixels) fused sources -> (K, compact_len) int16, one upload and
    one fetch RPC per chunk (see intra_v.encode_intra_v_chunk)."""
    return jax.vmap(
        lambda f: encode_intra_part_compact(f, qindex, height, width, cap)
    )(frames_u8)


def _merge_quads(small, big, n: int):
    """Scatter (r_big, c_big, 2n, 2n) winner blocks into the zeroed
    (r, c, n, n) grid as raster quadrants (slots are disjoint since the
    losing branch was zeroed)."""
    rb, cb = big.shape[0], big.shape[1]
    quads = (big.reshape(rb, cb, 2, n, 2, n)
             .transpose(0, 2, 1, 4, 3, 5)          # (rb, 2, cb, 2, n, n)
             .reshape(rb * 2, cb * 2, n, n))
    return small + quads


def _embed64(y16, lv64):
    """Scatter each SB's 64-winner coded 32x32 as 2x2 quadrants into the
    SB's top-left 16-slots (the rest of the SB's slots are zero)."""
    rb, cb = lv64.shape[:2]
    quads = (lv64.reshape(rb, cb, 2, 16, 2, 16)
             .transpose(0, 2, 1, 4, 3, 5))          # (rb, 2, cb, 2, 16, 16)
    emb = jnp.zeros((rb, 4, cb, 4, 16, 16), lv64.dtype)
    emb = emb.at[:, :2, :, :2].set(quads)
    return y16 + emb.reshape(rb * 4, cb * 4, 16, 16)


def _merge_tiles4(small, big, n: int):
    """Scatter (rb, cb, 4n, 4n) winner blocks as a 4x4 grid of n x n tiles
    into the zeroed (rb*4, cb*4, n, n) slot grid."""
    rb, cb = big.shape[:2]
    tiles = (big.reshape(rb, cb, 4, n, 4, n)
             .transpose(0, 2, 1, 4, 3, 5).reshape(rb * 4, cb * 4, n, n))
    return small + tiles


def part_sizes(height: int, width: int):
    r16, c16 = height // 16, width // 16
    r32, c32 = height // 32, width // 32
    r64, c64 = height // 64, width // 64
    ncoef = r16 * c16 * 256 + 2 * r16 * c16 * 64  # union layout
    return r16 * c16, r32 * c32, r64 * c64, ncoef


def split_compact_part(buf: np.ndarray, height: int, width: int):
    """Host split: (count, bitmap u16, vals i16, modes16, modes32, split,
    split64)."""
    nb16, nb32, nb64, ncoef = part_sizes(height, width)
    nwords = ncoef // 16
    count = int(buf[0]) | (int(buf[1]) << 15)
    bitmap = buf[2 : 2 + nwords].view(np.uint16)
    tail = nb16 + 2 * nb32 + nb64
    vals = buf[2 + nwords : len(buf) - tail]
    meta = buf[len(buf) - tail :]
    return (count, bitmap, vals, meta[:nb16], meta[nb16 : nb16 + nb32],
            meta[nb16 + nb32 : nb16 + 2 * nb32], meta[nb16 + 2 * nb32 :])


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def encode_intra_part(y, u, v, qindex, bit_depth: int = 8):
    """Full-frame intra encode with 32/16 partition RDO.  Dims must be
    64-multiples.  Returns level grids per size, modes, split map and
    reconstructions."""
    (ly16, ly32, m16, m32, split, ry,
     ly64, split64) = _encode_luma_part(y, qindex, bit_depth)
    lu8, lu16, ru, lu32 = _encode_chroma_dual(u, split, split64, qindex,
                                              bit_depth)
    lv8, lv16c, rv, lv32c = _encode_chroma_dual(v, split, split64, qindex,
                                                bit_depth)
    return {"levels_y16": ly16, "levels_y32": ly32, "levels_y64": ly64,
            "modes16": m16, "modes32": m32,
            "split": split, "split64": split64,
            "levels_u8": lu8, "levels_u16": lu16, "levels_u32": lu32,
            "levels_v8": lv8, "levels_v16": lv16c, "levels_v32": lv32c,
            "recon_y": ry, "recon_u": ru, "recon_v": rv}
