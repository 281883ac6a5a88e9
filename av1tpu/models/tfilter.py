"""Motion-compensated temporal filtering of GOP keyframes.

The reference's SVT-AV1 backend temporally filters keyframes/alt-refs
(enable-tf, on by default at the daemon's operating point, reference
crates/daemon/src/encode/av1an.rs:14): each keyframe is replaced by a
motion-compensated weighted average of itself and nearby source frames
before encoding.  On noisy sources this cancels sensor noise ~sqrt(K)x,
so the keyframe codes the underlying content instead of one frame's
noise realization — an order-of-magnitude keyframe rate saving at the
same perceived (and chain-PSNR) quality, because per-frame noise is
useless to every later frame that references the keyframe.

Decoder-invisible: only the ENCODER's input frame changes; conformance
is untouched.  TPU-native: reuses the inter pipeline's hierarchical
motion search and normative MC (av1tpu/models/inter_v) to warp each
neighbor onto the keyframe, then per-pixel similarity weights
(exp(-(d/h)^2), h from the median block SAD so the scale tracks the
actual noise level) with a per-block gate at 3x the median SAD to shut
out mismatched motion.

Compiled as ONE jitted step per neighbor (driven by a host loop) rather
than a 7-neighbor unrolled graph: the unrolled form inlined seven full
copies of the motion search and took tens of minutes of XLA time on the
remote-compile path for zero runtime benefit (the neighbor steps are
serial either way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from av1tpu.models.inter_v import _block_sad, _chroma_mc_pair, _search_mv


def _unfuse(f, height, width):
    ny = height * width
    nc = ny // 4
    return (f[:ny].reshape(height, width).astype(jnp.int32),
            f[ny : ny + nc].reshape(height // 2, width // 2)
            .astype(jnp.int32),
            f[ny + nc :].reshape(height // 2, width // 2)
            .astype(jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "bit_depth"))
def _tf_neighbor(key_fused, neigh_j, num_y, den_y, num_u, den_u, num_v,
                 den_v, height: int, width: int, bit_depth: int):
    """Warp one neighbor onto the keyframe and fold it into the running
    weighted average.  Returns (num/den accumulators..., med) — med of
    the matched-block SADs feeds the sigma estimate."""
    pix_max = (1 << bit_depth) - 1
    ky, ku, kv = _unfuse(key_fused, height, width)
    nyp, nup, nvp = _unfuse(neigh_j, height, width)
    # warp neighbor onto the keyframe grid (predict key FROM neighbor)
    mv8, pred_y, *_ = _search_mv(ky, nyp, jnp.float32(4.0), pix_max)
    pred_u, pred_v = _chroma_mc_pair(nup, nvp, mv8, pix_max)
    pred_yp = pred_y.transpose(0, 2, 1, 3).reshape(height, width)
    pred_up = pred_u.transpose(0, 2, 1, 3).reshape(height // 2,
                                                   width // 2)
    pred_vp = pred_v.transpose(0, 2, 1, 3).reshape(height // 2,
                                                   width // 2)

    sad = _block_sad(jnp.abs(ky - pred_yp), 16).astype(jnp.float32)
    med = jnp.median(sad)
    # relative gate (3x the median matched-block SAD) AND an absolute
    # cap: the relative gate alone fails open when NOTHING matches
    # (mis-detected scene cut -> median is itself mismatch-sized);
    # mean |d| of matched blocks is ~1.13 * sigma * sqrt(2), so 16/px
    # admits sensor noise up to sigma ~ 10 and rejects foreign content
    gate = ((sad <= 3.0 * med + 1.0)
            & (sad <= 256.0 * 16.0)).astype(jnp.float32)
    # per-pixel similarity: h tracks the per-pixel noise scale,
    # clamped to the same plausible-noise band
    h = jnp.clip(med / 256.0, 0.5, 8.0) * 2.0
    gate_y = jnp.repeat(jnp.repeat(gate, 16, 0), 16, 1)
    gate_c = jnp.repeat(jnp.repeat(gate, 8, 0), 8, 1)

    def acc(num, den, k, pred, g):
        d = (k - pred).astype(jnp.float32)
        w = g * jnp.exp(-(d / h) ** 2)
        return num + w * pred, den + w

    num_y, den_y = acc(num_y, den_y, ky, pred_yp, gate_y)
    num_u, den_u = acc(num_u, den_u, ku, pred_up, gate_c)
    num_v, den_v = acc(num_v, den_v, kv, pred_vp, gate_c)
    return num_y, den_y, num_u, den_u, num_v, den_v, med


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "bit_depth"))
def _tf_init(key_fused, height: int, width: int, bit_depth: int):
    ky, ku, kv = _unfuse(key_fused, height, width)
    return (ky.astype(jnp.float32), jnp.ones((height, width),
                                             jnp.float32),
            ku.astype(jnp.float32), jnp.ones((height // 2, width // 2),
                                             jnp.float32),
            kv.astype(jnp.float32), jnp.ones((height // 2, width // 2),
                                             jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "bit_depth",
                                    "dtype"))
def _tf_final(num_y, den_y, num_u, den_u, num_v, den_v, med0,
              height: int, width: int, bit_depth: int, dtype=jnp.uint8):
    pix_max = (1 << bit_depth) - 1
    out_y = jnp.clip(jnp.round(num_y / den_y), 0, pix_max)
    out_u = jnp.clip(jnp.round(num_u / den_u), 0, pix_max)
    out_v = jnp.clip(jnp.round(num_v / den_v), 0, pix_max)
    # per-frame sensor-noise estimate from the closest neighbor: for
    # matched blocks mean |d|/px = E|N(0, sigma*sqrt(2))| = 1.596 * sigma
    sigma1 = med0 / (256.0 * 1.596)
    # residual noise of the filtered frame: averaging D matched samples
    # divides the variance by ~D (per-pixel weights make it approximate)
    sigma_tf = sigma1 / jnp.sqrt(jnp.maximum(jnp.mean(den_y), 1.0))
    return (jnp.concatenate([out_y.reshape(-1), out_u.reshape(-1),
                             out_v.reshape(-1)]).astype(dtype), sigma_tf,
            sigma1)


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "bit_depth",
                                    "dtype"))
def _tf_scan(key_fused, neigh_fused, height: int, width: int,
             bit_depth: int, dtype):
    """One launch: lax.scan of the per-neighbor warp+accumulate (the body
    compiles once; ~25 ms/launch axon dispatch overhead is paid once per
    keyframe instead of once per neighbor)."""
    state = _tf_init(key_fused, height, width, bit_depth)

    def body(carry, neigh_j):
        *nxt, med = _tf_neighbor(key_fused, neigh_j, *carry,
                                 height=height, width=width,
                                 bit_depth=bit_depth)
        return tuple(nxt), med

    state, meds = jax.lax.scan(body, state, neigh_fused)
    return _tf_final(*state, meds[0], height, width, bit_depth,
                     dtype=dtype)


def temporal_filter_key(key_fused, neigh_fused, height: int, width: int,
                        bit_depth: int = 8):
    """Filter one fused keyframe against (K, n_pix) fused neighbors.
    Returns (filtered fused frame in the source dtype, estimated residual
    noise sigma of the filtered frame — feeds the keyframe RDOQ noise
    floor, and the UNfiltered per-frame sensor-noise sigma — feeds the
    inter frames' noise floor, since they code raw sources whose residual
    carries the full per-frame noise).  Callers pad the neighbor stack
    with copies of the key itself to keep one compiled shape (a
    self-neighbor is an exact match and just deepens the average toward
    the key)."""
    key_fused = jnp.asarray(key_fused)
    neigh_fused = jnp.asarray(neigh_fused)
    return _tf_scan(key_fused, neigh_fused, height, width, bit_depth,
                    key_fused.dtype)
