"""TPU inter-frame encode pipeline.

Unlike intra (wavefront-constrained), an inter frame is embarrassingly
block-parallel given the previous frame's reconstruction: every 16x16 block
independently searches motion in the reference, motion-compensates, and
codes its residual.  The whole frame is a handful of batched matmuls plus
two gathers — the shape TPUs like best.

Motion search is hierarchical and fully vectorized:
  1. coarse: 4x-downsampled SAD scan over a +-8-sample grid (= +-32 px full
     res, 4-px granularity), one `lax.scan` over candidate shifts with all
     blocks batched;
  2. refine: per-block 28x28 reference patches gathered at the coarse MV,
     then a +-6 px even-full-pel local sweep (static slices, batched).
MVs stay on the even full-pel grid so chroma motion compensation is an
exact pixel copy (subpel interpolation lands later); the spec engine's
`_predict_inter` (av1tpu/spec/tile.py:715) clamps reads to frame bounds,
reproduced here with index clips.

Residuals: luma DCT 16x16, chroma DCT 8x8 (inter chroma derives DCT_DCT,
spec tile.py:826), deadzone quantization shared with the intra pipeline.

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

# search geometry (even-full-pel luma units)
_COARSE_R = 8      # +-8 at quarter res = +-32 px, step 4 px
_REFINE_R = 6      # +-6 px local refine, step 2 px
_PATCH = 16 + 2 * _REFINE_R      # gathered per-block reference patch side
MAX_MV_PX = 4 * _COARSE_R + _REFINE_R


def _block_sad(diff, n: int):
    """(H, W) abs-diff -> (H/n, W/n) block sums."""
    h, w = diff.shape
    return diff.reshape(h // n, n, w // n, n).sum(axis=(1, 3))


def _coarse_search(src_q, ref_q, lam):
    """Quarter-res full search.  src_q/ref_q: (H/4, W/4) int32.  Returns
    (r16, c16, 2) int32 full-res even-pel MV (multiples of 4 px)."""
    hq, wq = src_q.shape
    rows, cols = hq // 4, wq // 4          # 4x4 quarter blocks = 16x16 full
    r = _COARSE_R
    pad = jnp.pad(ref_q, r, mode="edge")
    shifts = jnp.asarray([(dy, dx)
                          for dy in range(-r, r + 1)
                          for dx in range(-r, r + 1)], jnp.int32)
    # rate bias: prefer short MVs (and strongly prefer zero, which signals
    # as GLOBALMV); log-ish cost matches MV coding's class structure
    mag = jnp.abs(shifts).astype(jnp.float32) * 4.0
    bias = lam * (jnp.where(mag > 0, 3.0 + jnp.log2(1.0 + mag), 0.0)
                  .sum(axis=1))

    def step(best, i):
        dy, dx = shifts[i, 0], shifts[i, 1]
        cand = jax.lax.dynamic_slice(pad, (r + dy, r + dx), (hq, wq))
        sad = _block_sad(jnp.abs(src_q - cand), 4).astype(jnp.float32)
        cost = sad + bias[i]
        best_cost, best_idx = best
        take = cost < best_cost
        return (jnp.where(take, cost, best_cost),
                jnp.where(take, i, best_idx)), None

    init = (jnp.full((rows, cols), jnp.inf, jnp.float32),
            jnp.zeros((rows, cols), jnp.int32))
    (_, idx), _ = jax.lax.scan(step, init, jnp.arange(shifts.shape[0]))
    return shifts[idx] * 4                 # full-res px


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


def _refine_search(src_b, patches, coarse_px, lam):
    """+-_REFINE_R even-pel sweep on gathered patches.  src_b: (rows, cols,
    16, 16); patches: (rows, cols, _PATCH, _PATCH).  Returns final
    (rows, cols, 2) full-res px MV."""
    offs = [(dy, dx)
            for dy in range(-_REFINE_R, _REFINE_R + 1, 2)
            for dx in range(-_REFINE_R, _REFINE_R + 1, 2)]
    cands = jnp.stack([
        patches[:, :, _REFINE_R + dy : _REFINE_R + dy + 16,
                _REFINE_R + dx : _REFINE_R + dx + 16]
        for dy, dx in offs])                       # (K, rows, cols, 16, 16)
    sad = jnp.abs(src_b[None] - cands).sum(axis=(3, 4)).astype(jnp.float32)
    off_arr = jnp.asarray(offs, jnp.int32)         # (K, 2)
    total = coarse_px[None] + off_arr[:, None, None, :]
    mag = jnp.abs(total).astype(jnp.float32)
    bias = lam * jnp.where(mag > 0, 3.0 + jnp.log2(1.0 + mag), 0.0
                           ).sum(axis=-1)
    choice = jnp.argmin(sad + bias, axis=0)        # (rows, cols)
    return jnp.take_along_axis(
        total, choice[None, :, :, None], axis=0)[0]


def _code_plane_inter(src, pred, qindex, n: int, bit_depth: int):
    """Batched residual coding: (rows, cols, n, n) src/pred -> (levels i16,
    recon (H, W))."""
    rows, cols = src.shape[:2]
    pix_max = (1 << bit_depth) - 1
    fwd = jnp.asarray(forward_matrix(n, n, 0))
    step, q, cap = _plane_params(qindex, n, bit_depth)
    resid = (src - pred).reshape(-1, n * n).astype(jnp.float32)
    coefs = resid @ fwd.T
    lv = quantize_coefs(coefs, step, cap)
    r = inverse_transform((lv * q).reshape(-1, n, n), n, n, 0)
    rec = jnp.clip(pred.reshape(-1, n, n) + r, 0, pix_max)
    recon = (rec.reshape(rows, cols, n, n).transpose(0, 2, 1, 3)
             .reshape(rows * n, cols * n))
    return lv.reshape(rows, cols, n, n).astype(jnp.int16), recon


def _to_blocks(plane, n: int):
    h, w = plane.shape
    return (plane.reshape(h // n, n, w // n, n).transpose(0, 2, 1, 3))


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

    # hierarchical motion search on luma
    src_q = _block_sad(y, 4) // 16         # 4x4 mean pool (exact ints /16)
    ref_q = _block_sad(ref_y, 4) // 16
    coarse = _coarse_search(src_q, ref_q, lam * 16.0)
    src_b = _to_blocks(y, 16)
    patches = _gather_patches(ref_y, coarse, 16, _REFINE_R)
    mv_px = _refine_search(src_b, patches, coarse, lam)

    # motion compensation (exact copies on the even full-pel grid)
    pred_y = _gather_patches(ref_y, mv_px, 16, 0)
    mv_c = mv_px // 2
    pred_u = _gather_patches(ref_u, mv_c, 8, 0)
    pred_v = _gather_patches(ref_v, mv_c, 8, 0)

    ly, ry = _code_plane_inter(src_b, pred_y, qindex, 16, bit_depth)
    lu, ru = _code_plane_inter(_to_blocks(u, 8), pred_u, qindex, 8,
                               bit_depth)
    lv, rv = _code_plane_inter(_to_blocks(v, 8), pred_v, qindex, 8,
                               bit_depth)
    return {"levels_y": ly, "levels_u": lu, "levels_v": lv,
            "mv": mv_px * 8,               # 1/8-pel spec units
            "recon_y": ry, "recon_u": ru, "recon_v": rv}


# ----------------------------------------------------------------------
# GOP scan + compact transport
# ----------------------------------------------------------------------

def inter_sizes(height: int, width: int):
    nb = (height // 16) * (width // 16)
    ncoef = nb * 256 + 2 * nb * 64
    return nb, ncoef


def _compact(levels_flat, mv, cap: int):
    """[count_lo, count_hi, bitmap, vals(cap), mv_y, mv_x] int16."""
    sig = levels_flat != 0
    m = sig.shape[0]
    bits = sig.reshape(m // 16, 16).astype(jnp.uint16)
    bitmap = (bits << jnp.arange(16, dtype=jnp.uint16)).sum(
        axis=-1, dtype=jnp.uint16)
    pos = jnp.cumsum(sig.astype(jnp.int32)) - 1
    count = pos[-1] + 1
    vals = jnp.zeros((cap,), jnp.int16).at[
        jnp.where(sig, pos, cap)].set(levels_flat, mode="drop")
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


@functools.partial(jax.jit, static_argnames=("height", "width", "cap"))
def encode_gop_chunk(frames_u8, ref_fused, qindex, height: int, width: int,
                     cap: int = 131072):
    """Scan a chunk of inter frames against a running reconstruction.

    frames_u8: (K, n_pixels) fused sources (uint8/uint16; see
    intra_v.fuse_planes); ref_fused: (n_pixels,) int32 fused recon of the
    preceding frame.  Returns ((K, compact_len) int16 buffers,
    final fused recon int32) — one upload and one fetch per chunk."""
    bit_depth = 8 if frames_u8.dtype == jnp.uint8 else 10
    ny = height * width
    nc = ny // 4

    def unfuse(f):
        return (f[:ny].reshape(height, width).astype(jnp.int32),
                f[ny : ny + nc].reshape(height // 2, width // 2)
                .astype(jnp.int32),
                f[ny + nc :].reshape(height // 2, width // 2)
                .astype(jnp.int32))

    def step(ref, frame):
        yy, uu, vv = unfuse(frame)
        ry, ru, rv = unfuse(ref)
        o = encode_inter_v(yy, uu, vv, ry, ru, rv, qindex,
                           bit_depth=bit_depth)
        flat = jnp.concatenate([o["levels_y"].reshape(-1),
                                o["levels_u"].reshape(-1),
                                o["levels_v"].reshape(-1)])
        buf = _compact(flat, o["mv"], cap)
        new_ref = jnp.concatenate([o["recon_y"].reshape(-1),
                                   o["recon_u"].reshape(-1),
                                   o["recon_v"].reshape(-1)])
        return new_ref, buf

    final_ref, bufs = jax.lax.scan(step, ref_fused, frames_u8)
    return bufs, final_ref
