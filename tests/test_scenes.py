"""Scene detection and scene-aligned chunking."""

import numpy as np

import jax.numpy as jnp

from av1tpu.core.scenes import scene_scores, split_scenes
from av1tpu.utils import Clip, synthetic_clip


def _glued_clip():
    a = synthetic_clip(192, 128, 8, seed=1)
    b = synthetic_clip(192, 128, 8, seed=2)
    return Clip(y=np.concatenate([a.y, b.y]),
                u=np.concatenate([a.u, b.u]),
                v=np.concatenate([a.v, b.v]))


def test_scene_score_spikes_at_cut():
    clip = _glued_clip()
    s = np.asarray(scene_scores(jnp.asarray(clip.y.astype(np.int32))))
    body = np.concatenate([s[1:8], s[9:]])
    assert s[8] > 2.0 * body.max(), (s[8], body.max())


def test_split_scenes_rules():
    scores = np.array([np.inf, 0.1, 0.1, 5.0, 0.1, 0.1, 5.0, 0.1])
    # min_len forbids the cut at 3 -> only 6 splits
    assert split_scenes(scores, threshold=2.5, min_len=4, max_len=100) == \
        [(0, 6), (6, 8)]
    # max_len force-splits long scenes
    flat = np.array([np.inf] + [0.0] * 9)
    assert split_scenes(flat, threshold=2.5, min_len=2, max_len=4) == \
        [(0, 4), (4, 8), (8, 10)]


def test_encode_clip_uses_scene_segments():
    from av1tpu.cli import encode_clip

    clip = _glued_clip()
    streams, stats = encode_clip(clip, 150, chunk=4, partitions=False,
                                 scene_threshold=0.45, metric="psnr")
    assert stats["scenes"] == 2
    assert stats["frames"] == 16
    assert len(streams) == 16
