"""TPU intra encode pipeline, V_PRED variant.

The first end-to-end TPU encode plane: fixed 16x16 luma / 8x8 chroma blocks,
vertical prediction, DCT, uniform quantization.  V_PRED makes every block row
depend only on the reconstructed bottom row of the row above, so the frame
encodes as a lax.scan over block rows with all columns batched — each step is
a large batched matmul (forward DCT) plus vectorized integer butterflies
(normative inverse DCT), which is exactly the shape TPUs like.

The one sequential seam is the first block row (blocks there predict from
their left neighbor's top edge pixel per the spec's missing-above rule);
it is handled by a small per-column scan.

Outputs are quantized level grids plus the bit-exact reconstruction; the host
entropy coder (native/coding) serializes the levels into a conformant tile.
Bit-exactness of the recon against the spec model (and hence against dav1d)
is covered by tests/test_tpu_pipeline.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from av1tpu.kernels.transform_quant import transform_quantize
from av1tpu.ops.transforms_jax import forward_matrix, inverse_transform
from av1tpu.spec import tables

# Fused Pallas transform+quant kernel (AV1TPU_PALLAS=1 to enable).  Off by
# default: called inside the per-row lax.scan it launches once per block row
# and re-stages the transform matrix into VMEM each step, measured slower
# than the XLA-fused expression (123 vs 94 ms/frame e2e on v5e).  The win
# needs a whole-plane kernel that keeps the matrix and row state resident
# across the scan — tracked for the kernelization pass.
_USE_PALLAS = os.environ.get("AV1TPU_PALLAS", "0") != "0"

# Quantization rounding offset: 0.5 = round-to-nearest; smaller biases small
# coefficients toward zero (a deadzone), trading a little distortion for
# fewer coded levels — a classic intra RD win.  Swept on the BD-rate clip.
_Q_OFFSET = float(os.environ.get("AV1TPU_QOFFSET", "0.25"))
_Q_OFFSET_DC = float(os.environ.get("AV1TPU_QOFFSET_DC", "0.25"))


def quantize_coefs(coefs, step, cap):
    """Deadzone quantizer: sign(c) * floor(|c|/step + offset), clipped.
    coefs: (..., n*n) with the DC coefficient at index 0."""
    off = jnp.full((coefs.shape[-1],), _Q_OFFSET,
                   jnp.float32).at[0].set(_Q_OFFSET_DC)
    mag = jnp.floor(jnp.abs(coefs) / step + off).astype(jnp.int32)
    lv = jnp.sign(coefs).astype(jnp.int32) * mag
    return jnp.clip(lv, -cap, cap)



@functools.cache
def _quant_tables(bit_depth: int = 8):
    # cache numpy (jnp constants created inside a trace must not be cached —
    # they are tracers there)
    q = tables.quant()
    return (np.asarray(q[f"dc_q_{bit_depth}"], np.int32),
            np.asarray(q[f"ac_q_{bit_depth}"], np.int32))


def _plane_params(qindex, n: int, bit_depth: int = 8):
    """Quantizer rows for a traced qindex: step (f32), q (i32), cap (i32),
    each (n*n,).  Traced lookup keeps one compiled encoder for every q —
    what makes per-chunk CQ search cheap."""
    dcq_np, acq_np = _quant_tables(bit_depth)
    dc = jnp.asarray(dcq_np)[qindex]
    ac = jnp.asarray(acq_np)[qindex]
    q = jnp.full((n * n,), ac, jnp.int32).at[0].set(dc)
    # cap levels so dequantized values stay well inside int32 headroom AND
    # below the decoder's inter-stage clamp (+-2^(bd+7)), so the normative
    # clamps never activate and recon stays exact at both depths
    cap = jnp.minimum((1 << 16) // q, 1 << 14)
    return q.astype(jnp.float32), q, cap


# above-right availability for 16x16 blocks in 64x64 superblocks, derived
# from the spec's BlockDecoded model (5.11.3: the row above the SB is fully
# decoded; inside the SB, Z-order decides).  Rows indexed by block row % 4,
# cols by block col % 4; the frame's last block column is never available.
_UR_MASK = np.array([[1, 1, 1, 1],
                     [1, 0, 1, 0],
                     [1, 1, 1, 0],
                     [1, 0, 1, 0]], np.bool_)

# (mode value, Dr_Intra_Derivative dx) for the above-only directional modes
_RDO_MODES = ((3, 64), (8, 27))  # D45, D67; V handled separately


def _avail_ur_grid(rows: int, cols: int) -> np.ndarray:
    g = np.zeros((rows, cols), np.bool_)
    for r in range(1, rows):
        g[r] = _UR_MASK[r % 4][np.arange(cols) % 4]
    g[:, cols - 1] = False
    return g


def _directional_pred(ae, dx: int, n: int):
    """ae: (cols, 2n) above edge (with above-right) -> (cols, n, n) pred.
    Spec 7.11.2.4 for pAngle < 90, upsample/edge-filter off."""
    i = np.arange(1, n + 1, dtype=np.int64)[:, None]
    j = np.arange(n, dtype=np.int64)[None, :]
    idx = i * dx
    pos = np.minimum((idx >> 6) + j, 2 * n - 1)
    shift = ((idx >> 1) & 0x1F).astype(np.int32)
    hit_max = ((idx >> 6) + j) >= (2 * n - 1)
    gathered = jnp.take(ae, jnp.asarray(pos.ravel()), axis=1)
    gathered1 = jnp.take(ae, jnp.asarray(np.minimum(pos + 1,
                                                    2 * n - 1).ravel()),
                         axis=1)
    p = _rs_pred(gathered.reshape(-1, n, n) * (32 - shift)
                 + gathered1.reshape(-1, n, n) * shift)
    last = ae[:, 2 * n - 1][:, None, None]
    return jnp.where(jnp.asarray(hit_max)[None], last, p)


def _rs_pred(x):
    return (x + 16) >> 5


def _encode_plane(src, qindex: int, n: int, base: int, tx_type: int = 0,
                  bit_depth: int = 8):
    """Encode one plane with n x n blocks, V_PRED.  src: (H, W) int32 with
    H, W multiples of n.  Returns (levels (rows, cols, n, n) int32,
    recon (H, W) int32)."""
    h, w = src.shape
    rows, cols = h // n, w // n
    pix_max = (1 << bit_depth) - 1
    fwd = jnp.asarray(forward_matrix(n, n, tx_type))  # (n*n, n*n)
    step, q, cap = _plane_params(qindex, n, bit_depth)

    src_rows = src.reshape(rows, n, cols, n).transpose(0, 2, 1, 3)

    def encode_blocks(blocks, pred):
        """blocks, pred: (B, n, n) -> (levels, recon)."""
        b = blocks.shape[0]
        resid = (blocks - pred).reshape(b, n * n).astype(jnp.float32)
        if _USE_PALLAS:
            lv16, dq = transform_quantize(resid, fwd.T, step[None, :],
                                          q[None, :], cap[None, :])
            lv = lv16.astype(jnp.int32)
        else:
            coefs = resid @ fwd.T
            lv = quantize_coefs(coefs, step, cap)
            dq = lv * q
        r = inverse_transform(dq.reshape(b, n, n), n, n, tx_type)
        rec = jnp.clip(pred + r, 0, pix_max)
        # int16 keeps the host fetch small (levels are capped at 2^14)
        return lv.reshape(b, n, n).astype(jnp.int16), rec

    # first block row: per-column scan (missing-above rule: the edge value is
    # 127 for the corner, else the left neighbor's reconstructed top pixel)
    def col_step(edge_val, block):
        pred = jnp.full((n, n), edge_val, jnp.int32)
        lv, rec = encode_blocks(block[None], pred[None])
        return rec[0, 0, n - 1], (lv[0], rec[0])

    _, (lv0, rec0) = jax.lax.scan(
        col_step, jnp.int32(base - 1), src_rows[0])

    # remaining rows: scan over rows, columns batched
    def row_step(bottom, blocks):
        pred = jnp.repeat(bottom[:, None, :], n, axis=1)
        lv, rec = encode_blocks(blocks, pred)
        return rec[:, n - 1, :], (lv, rec)

    if rows > 1:
        _, (lv_rest, rec_rest) = jax.lax.scan(
            row_step, rec0[:, n - 1, :], src_rows[1:])
        levels = jnp.concatenate([lv0[None], lv_rest], axis=0)
        recs = jnp.concatenate([rec0[None], rec_rest], axis=0)
    else:
        levels, recs = lv0[None], rec0[None]

    recon = recs.transpose(0, 2, 1, 3).reshape(h, w)
    return levels, recon


def _encode_plane_rdo(src, qindex, n: int, base: int, bit_depth: int = 8):
    """Luma encode with per-block intra mode RDO over the above-only mode set
    {V_PRED, D45, D67} — modes whose prediction needs only the reconstructed
    row above (+ its above-right extension per the spec availability rules),
    so the row-parallel scan shape is preserved.  Returns (levels, recon,
    modes) with modes (rows, cols) int8 holding AV1 mode values."""
    h, w = src.shape
    rows, cols = h // n, w // n
    pix_max = (1 << bit_depth) - 1
    fwd = jnp.asarray(forward_matrix(n, n, 0))
    step, q, cap = _plane_params(qindex, n, bit_depth)
    # true RD cost evaluated in the coefficient domain (Parseval: coef-SSE ~
    # 6.4x pixel-SSE for this transform scaling, measured), so mode selection
    # needs no inverse transform per candidate: cost = D_coef + lambda * R.
    # lambda ~ Qstep^2 as in classic RDO, calibrated on the BD-rate clip
    # (swept on the BD-rate clip with the deadzone active; 0.15 minimizes).
    ac = step[1]
    lam = (ac * ac * 0.15).astype(jnp.float32)

    src_rows = src.reshape(rows, n, cols, n).transpose(0, 2, 1, 3)
    avail = jnp.asarray(_avail_ur_grid(rows, cols))

    def tq_recon(blocks, pred):
        b = blocks.shape[0]
        resid = (blocks - pred).reshape(b, n * n).astype(jnp.float32)
        coefs = resid @ fwd.T
        lv = quantize_coefs(coefs, step, cap)
        dq = lv * q
        r = inverse_transform(dq.reshape(b, n, n), n, n, 0)
        rec = jnp.clip(pred + r, 0, pix_max)
        return lv.reshape(b, n, n).astype(jnp.int16), rec

    # first block row: V_PRED via the per-column scan (no above row)
    def col_step(edge_val, block):
        pred = jnp.full((n, n), edge_val, jnp.int32)
        lv, rec = tq_recon(block[None], pred[None])
        return rec[0, 0, n - 1], (lv[0], rec[0])

    _, (lv0, rec0) = jax.lax.scan(col_step, jnp.int32(base - 1), src_rows[0])
    modes0 = jnp.full((cols,), 1, jnp.int8)

    def row_step(bottom, xs):
        blocks, av = xs
        # above edge with above-right extension: (cols, 2n) strided windows
        padded = jnp.concatenate([bottom, bottom[-1:].repeat(n)])
        win_idx = jnp.asarray(np.arange(cols)[:, None] * n
                              + np.arange(2 * n)[None, :])
        ae = jnp.take(padded, win_idx)
        # unavailable above-right -> replicate above[n-1]
        repl = ae[:, n - 1][:, None]
        k = jnp.arange(2 * n)[None, :]
        ae = jnp.where((k < n) | av[:, None], ae, repl)

        pred_v = jnp.repeat(ae[:, None, :n], n, axis=1)
        cands = [(1, pred_v)]
        for mode_val, dx in _RDO_MODES:
            cands.append((mode_val, _directional_pred(ae, dx, n)))
        nm = len(cands)
        preds = jnp.concatenate([p for _, p in cands], axis=0)  # (nm*cols,..)
        blocks_r = jnp.tile(blocks, (nm, 1, 1))
        # forward + quantize for every candidate; distortion measured in the
        # coefficient domain so no per-candidate inverse transform is needed
        resid = (blocks_r - preds).reshape(nm * cols, n * n).astype(
            jnp.float32)
        coefs = resid @ fwd.T
        lv_all = quantize_coefs(coefs, step, cap)
        dist = jnp.sum((coefs - lv_all * step) ** 2, axis=1).reshape(nm, -1)
        alv = jnp.abs(lv_all.astype(jnp.float32))
        rate = jnp.sum(jnp.where(alv > 0, 2.0, 0.0)
                       + jnp.log2(1.0 + alv), axis=1).reshape(nm, -1)
        # + a few bits of mode signaling for the non-default modes
        rate = rate + jnp.array([0.0] + [4.0] * (nm - 1),
                                jnp.float32)[:, None]
        cost = dist + lam * rate                            # (nm, cols)
        choice = jnp.argmin(cost, axis=0)                   # (cols,)
        # reconstruct only the winning mode
        lv_all = lv_all.reshape(nm, cols, n, n)
        preds = preds.reshape(nm, cols, n, n)
        lv = jnp.take_along_axis(lv_all, choice[None, :, None, None],
                                 axis=0)[0]
        pred = jnp.take_along_axis(preds, choice[None, :, None, None],
                                   axis=0)[0]
        r = inverse_transform(lv * q.reshape(n, n), n, n, 0)
        rec = jnp.clip(pred + r, 0, pix_max)
        mode_vals = jnp.asarray([m for m, _ in cands], jnp.int8)
        modes = mode_vals[choice]
        return rec[:, n - 1, :].reshape(-1), (lv.astype(jnp.int16), rec,
                                              modes)

    if rows > 1:
        bottom0 = rec0[:, n - 1, :].reshape(-1)
        _, (lv_rest, rec_rest, modes_rest) = jax.lax.scan(
            row_step, bottom0, (src_rows[1:], avail[1:]))
        levels = jnp.concatenate([lv0[None], lv_rest], axis=0)
        recs = jnp.concatenate([rec0[None], rec_rest], axis=0)
        modes = jnp.concatenate([modes0[None], modes_rest], axis=0)
    else:
        levels, recs, modes = lv0[None], rec0[None], modes0[None]

    recon = recs.transpose(0, 2, 1, 3).reshape(h, w)
    return levels, recon, modes


@functools.partial(jax.jit, static_argnames=("height", "width", "rdo"))
def encode_intra_v_u8(frame_u8, qindex: int, height: int, width: int,
                      rdo: bool = True):
    """I/O-optimized end-to-end variant for the production path: source is ONE
    fused buffer (y | u | v concatenated flat, padded luma dims height x
    width) and the result is ONE fused int16 buffer [levels | modes] —
    single dense transfers in each direction run at full host-link
    bandwidth.  The buffer dtype selects the depth: uint8 -> 8-bit,
    uint16 -> 10-bit."""
    bit_depth = 8 if frame_u8.dtype == jnp.uint8 else 10
    ny = height * width
    nc = ny // 4
    y = frame_u8[:ny].reshape(height, width).astype(jnp.int32)
    u = frame_u8[ny : ny + nc].reshape(height // 2, width // 2).astype(jnp.int32)
    v = frame_u8[ny + nc :].reshape(height // 2, width // 2).astype(jnp.int32)
    o = encode_intra_v(y, u, v, qindex, bit_depth=bit_depth, rdo=rdo)
    return jnp.concatenate([o["levels_y"].reshape(-1),
                            o["levels_u"].reshape(-1),
                            o["levels_v"].reshape(-1),
                            o["modes"].reshape(-1).astype(jnp.int16)])


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap", "rdo"))
def encode_intra_v_compact(frame_u8, qindex: int, height: int, width: int,
                           cap: int = 163840, rdo: bool = True):
    """Bandwidth-optimal variant: returns ONE int16 buffer holding
    [count_lo, count_hi, significance bitmap (1 bit/coef, 16 coefs per word,
    LSB first), nonzero values (cap slots), per-block luma modes].  Levels
    are ~95% zero at normal q, so this cuts the host fetch ~8x vs the dense
    buffer.  If count > cap the value list is truncated; the host retries
    with a larger cap."""
    nblocks = (height // 16) * (width // 16)
    full = encode_intra_v_u8(frame_u8, qindex, height, width, rdo=rdo)
    flat = full[:-nblocks]
    modes = full[-nblocks:]
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
    return jnp.concatenate(
        [head, jax.lax.bitcast_convert_type(bitmap, jnp.int16), vals, modes])




def _apply_lf(o, lf, height: int, width: int, bit_depth: int):
    """In-loop deblock of keyframe recon (uniform 16-block edges)."""
    if lf is None or not any(lf):
        return o
    from av1tpu.models.deblock_tpu import deblock_planes
    rows, cols = height // 16, width // 16
    ry, ru, rv = deblock_planes(
        o["recon_y"], o["recon_u"], o["recon_v"],
        jnp.ones((rows, cols - 1), bool), jnp.ones((rows - 1, cols), bool),
        lf[0], lf[1], lf[2], 0, bit_depth)
    o = dict(o)
    o["recon_y"], o["recon_u"], o["recon_v"] = ry, ru, rv
    return o

@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap", "rdo", "lf"))
def encode_intra_v_key_recon(frame_u8, qindex: int, height: int, width: int,
                             cap: int = 163840, rdo: bool = True, lf=None):
    """Fast-preset keyframe for a GOP: compact transport + fused int32
    reconstruction (device-resident reference for the inter scan)."""
    bit_depth = 8 if frame_u8.dtype == jnp.uint8 else 10
    ny = height * width
    nc = ny // 4
    y = frame_u8[:ny].reshape(height, width).astype(jnp.int32)
    u = frame_u8[ny : ny + nc].reshape(height // 2,
                                       width // 2).astype(jnp.int32)
    v = frame_u8[ny + nc :].reshape(height // 2,
                                    width // 2).astype(jnp.int32)
    o = encode_intra_v(y, u, v, qindex, bit_depth=bit_depth, rdo=rdo)
    o = _apply_lf(o, lf, height, width, bit_depth)
    flat = jnp.concatenate([o["levels_y"].reshape(-1),
                            o["levels_u"].reshape(-1),
                            o["levels_v"].reshape(-1)])
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
    buf = jnp.concatenate([head,
                           jax.lax.bitcast_convert_type(bitmap, jnp.int16),
                           vals, o["modes"].reshape(-1).astype(jnp.int16)])
    recon = jnp.concatenate([o["recon_y"].reshape(-1),
                             o["recon_u"].reshape(-1),
                             o["recon_v"].reshape(-1)]).astype(jnp.int32)
    return buf, recon


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap", "rdo"))
def encode_intra_v_chunk(frames_u8, qindex: int, height: int, width: int,
                         cap: int = 163840, rdo: bool = True):
    """Chunked production variant: frames_u8 is (K, n_pixels) fused uint8
    sources; returns (K, compact_len) int16.  One upload RPC and one fetch
    RPC per chunk amortize the per-transfer fixed cost of the host link."""
    return jax.vmap(
        lambda f: encode_intra_v_compact(f, qindex, height, width, cap, rdo)
    )(frames_u8)


def split_compact(buf: np.ndarray, height: int, width: int):
    """Host-side split of the encode_intra_v_compact buffer.
    Returns (count, bitmap uint16, values int16, modes int16)."""
    count = int(buf[0]) | (int(buf[1]) << 15)
    nwords = (height * width + height * width // 2) // 16
    nblocks = (height // 16) * (width // 16)
    bitmap = buf[2 : 2 + nwords].view(np.uint16)
    vals = buf[2 + nwords : len(buf) - nblocks]
    modes = buf[len(buf) - nblocks :]
    return count, bitmap, vals, modes


def fuse_planes(y, u, v, bit_depth: int = 8) -> np.ndarray:
    """Concatenate padded planes into the fused source buffer
    encode_intra_v_u8 expects (uint8 for 8-bit, uint16 for 10-bit)."""
    dt = np.uint8 if bit_depth == 8 else np.uint16
    return np.concatenate([np.asarray(y, dt).ravel(),
                           np.asarray(u, dt).ravel(),
                           np.asarray(v, dt).ravel()])


@jax.jit
def encode_intra_v_levels(y, u, v, qindex: int):
    """Transfer-optimized variant: returns the three level grids fused into
    ONE flat int16 buffer (host slices it apart).  A single dense buffer
    fetches at full host-link bandwidth; separate 4D outputs do not."""
    o = encode_intra_v(y, u, v, qindex)
    return jnp.concatenate([o["levels_y"].reshape(-1),
                            o["levels_u"].reshape(-1),
                            o["levels_v"].reshape(-1)])


def split_levels(flat, height: int, width: int):
    """Slice the fused buffer from encode_intra_v_levels back into
    (levels_y, levels_u, levels_v) grids.  height/width: padded luma dims."""
    rows, cols = height // 16, width // 16
    ny = rows * cols * 256
    nc = rows * cols * 64
    ly = flat[:ny].reshape(rows, cols, 16, 16)
    lu = flat[ny : ny + nc].reshape(rows, cols, 8, 8)
    lv = flat[ny + nc : ny + 2 * nc].reshape(rows, cols, 8, 8)
    return ly, lu, lv


@functools.partial(jax.jit, static_argnames=("bit_depth", "rdo"))
def encode_intra_v(y, u, v, qindex: int, bit_depth: int = 8,
                   rdo: bool = False):
    """Full-frame intra encode.  y: (H, W) int32 (16-aligned), u/v: (H/2,
    W/2) int32 (8-aligned).  Returns dict of level grids, reconstructions
    and per-block luma modes.  bit_depth 8 or 10.  rdo=True selects the
    luma mode per block from {V, D45, D67}; otherwise all V_PRED.  Chroma is
    always V_PRED (tx type derived: ADST_DCT, spec Mode_To_Txfm)."""
    base = 1 << (bit_depth - 1)
    if rdo:
        ly, ry, modes = _encode_plane_rdo(y, qindex, 16, base,
                                          bit_depth=bit_depth)
    else:
        ly, ry = _encode_plane(y, qindex, 16, base, tx_type=0,
                               bit_depth=bit_depth)
        modes = jnp.full((y.shape[0] // 16, y.shape[1] // 16), 1, jnp.int8)
    lu, ru = _encode_plane(u, qindex, 8, base, tx_type=1,
                           bit_depth=bit_depth)
    lv, rv = _encode_plane(v, qindex, 8, base, tx_type=1,
                           bit_depth=bit_depth)
    return {"levels_y": ly, "levels_u": lu, "levels_v": lv,
            "recon_y": ry, "recon_u": ru, "recon_v": rv, "modes": modes}
