"""Scene-change detection as a jitted frame-delta metric.

The reference delegates scene detection to av1an's external scene splitter
(reference crates/daemon/src/encode/av1an.rs:79-107 passes the whole file to
`av1an`, which scene-splits internally).  Here it is a cheap jitted metric over
downsampled luma deltas: per-frame mean absolute difference of 8x8 block means,
normalized by in-frame activity, thresholded on host to produce chunk
boundaries.  Keyframes are forced at every scene cut, making chunks
independently decodable (same property av1an relies on for chunk concat).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["scene_scores", "split_scenes"]


@functools.partial(jax.jit, static_argnames=("block",))
def scene_scores(y: jnp.ndarray, block: int = 8) -> jnp.ndarray:
    """Per-frame scene-change scores for luma ``y`` of shape (T, H, W).

    Returns (T,) float32; score[0] == inf stand-in (first frame is always a
    scene start).  Score is MAD of blockwise means between consecutive frames
    divided by (intra-frame activity + eps), which suppresses false cuts in
    noisy-but-static content.
    """
    t, h, w = y.shape
    hb, wb = h // block, w // block
    blocks = y[:, : hb * block, : wb * block].astype(jnp.float32)
    blocks = blocks.reshape(t, hb, block, wb, block).mean(axis=(2, 4))

    diff = jnp.abs(blocks[1:] - blocks[:-1]).mean(axis=(1, 2))
    # activity: mean |dx| + |dy| of block means within the earlier frame
    act = (
        jnp.abs(jnp.diff(blocks[:-1], axis=1)).mean(axis=(1, 2))
        + jnp.abs(jnp.diff(blocks[:-1], axis=2)).mean(axis=(1, 2))
        + 1e-3
    )
    scores = diff / act
    return jnp.concatenate([jnp.full((1,), jnp.inf, scores.dtype), scores])


def split_scenes(
    scores: np.ndarray,
    threshold: float = 2.5,
    min_len: int = 24,
    max_len: int = 240,
    adapt_ratio: float = 3.0,
    adapt_floor: float = 0.15,
) -> list[tuple[int, int]]:
    """Turn per-frame scores into chunk [start, end) ranges.

    Cuts where score exceeds ``threshold`` absolutely, OR spikes
    ``adapt_ratio``x above the trailing-window median while clearing
    ``adapt_floor`` (high-activity content normalizes hard cuts well
    below any usable absolute threshold — the relative test is what
    av1an-style detectors key on; the floor stops near-static content
    from cutting on noise).  Cuts are merged to honor ``min_len`` and
    force-split to honor ``max_len`` (mirrors the reference's keyint 240
    cap, reference crates/daemon/src/encode/av1an.rs:14).
    """
    scores = np.asarray(scores)
    n = len(scores)
    cuts = [0]
    for i in range(1, n):
        if i - cuts[-1] < min_len:
            continue
        recent = scores[max(i - 16, 1) : i]
        med = float(np.median(recent)) if len(recent) else 0.0
        if scores[i] > threshold or (
            scores[i] > adapt_floor and scores[i] > adapt_ratio * med
        ):
            cuts.append(i)
    cuts.append(n)

    ranges: list[tuple[int, int]] = []
    for s, e in zip(cuts[:-1], cuts[1:]):
        while e - s > max_len:
            ranges.append((s, s + max_len))
            s += max_len
        if e - s:
            ranges.append((s, e))
    return ranges
