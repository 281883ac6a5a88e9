"""Keyframe temporal-filter tests (av1tpu/models/tfilter).

The filter must denoise matched content toward the clean signal, pass a
noise-free frame through (nearly) unchanged, and refuse to blend
mismatched content (scene-cut neighbor).
"""

import numpy as np
import jax
import jax.numpy as jnp

from av1tpu.models.intra_v import fuse_planes
from av1tpu.models.tfilter import temporal_filter_key

H, W = 128, 192


def _smooth_canvas(rng, h, w):
    """Band-limited random canvas (separable box blurs) so motion search
    has structure to lock onto."""
    c = rng.randint(0, 255, (h, w)).astype(np.float64)
    k = np.ones(9) / 9.0
    for _ in range(3):
        c = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 1, c)
        c = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 0, c)
    return 40.0 + (c - c.min()) * (180.0 / max(float(np.ptp(c)), 1e-9))


def _fused(y):
    u = np.full((H // 2, W // 2), 128, np.int32)
    return fuse_planes(np.clip(np.round(y), 0, 255).astype(np.int32), u, u)


def test_denoises_matched_pan():
    rng = np.random.RandomState(1)
    canvas = _smooth_canvas(rng, H + 64, W + 64)
    clean0 = canvas[:H, :W]
    frames = [_fused(canvas[2 * t : 2 * t + H, 3 * t : 3 * t + W]
                     + rng.normal(0, 2.0, (H, W))) for t in range(4)]
    out, sig, sig1 = temporal_filter_key(
        jax.device_put(frames[0]), jnp.asarray(np.stack(frames[1:])),
        H, W)
    out = np.asarray(out)
    assert 0.5 < float(sig) < 3.0  # sigma=2 source, ~halved by TF
    assert 1.0 < float(sig1) < 4.0  # unfiltered per-frame sigma ~ 2
    noisy = np.asarray(frames[0][: H * W]).reshape(H, W).astype(np.float64)
    filt = out[: H * W].reshape(H, W).astype(np.float64)
    mse_noisy = float(np.mean((noisy - clean0) ** 2))
    mse_filt = float(np.mean((filt - clean0) ** 2))
    assert mse_filt < 0.6 * mse_noisy, (mse_noisy, mse_filt)


def test_self_neighbors_identity():
    rng = np.random.RandomState(2)
    key = _fused(rng.randint(0, 255, (H, W)))
    out = np.asarray(temporal_filter_key(
        jax.device_put(key), jnp.asarray(np.stack([key] * 3)), H, W)[0])
    assert (out == np.asarray(key)).all()


def test_scene_cut_neighbor_rejected():
    """A high-contrast foreign frame (mis-detected scene cut) must be
    gated out by the absolute SAD cap.  (Two equally smooth, similarly
    ranged frames may legitimately blend a little — that case is bounded
    by the per-pixel weights, not asserted here.)"""
    rng = np.random.RandomState(3)
    canvas = _smooth_canvas(rng, H, W)
    key = _fused(canvas)
    other = _fused(np.random.RandomState(9).randint(0, 255, (H, W)))
    out = np.asarray(temporal_filter_key(
        jax.device_put(key), jnp.asarray(np.stack([other] * 3)), H, W)[0])
    ky = np.asarray(key[: H * W]).astype(np.float64)
    fy = out[: H * W].astype(np.float64)
    assert float(np.mean((ky - fy) ** 2)) < 1.0
