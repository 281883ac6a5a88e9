"""CQ (target-quality) search behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

from av1tpu.models.cq import cq_search, probe_quality
from av1tpu.utils import synthetic_clip


@pytest.fixture(scope="module")
def planes():
    clip = synthetic_clip(192, 128, 1, seed=13)
    return (jnp.asarray(clip.y[0].astype(np.int32)),
            jnp.asarray(clip.u[0].astype(np.int32)),
            jnp.asarray(clip.v[0].astype(np.int32)))


def test_probe_monotone(planes):
    y, u, v = planes
    s = [float(probe_quality(y, u, v, jnp.int32(q), metric="psnr"))
         for q in (20, 100, 220)]
    assert s[0] > s[1] > s[2]


def test_cq_hits_target(planes):
    y, u, v = planes
    target = float(probe_quality(y, u, v, jnp.int32(120), metric="psnr"))
    q, score = cq_search(y, u, v, target, metric="psnr")
    assert score >= target
    # the next coarser q must miss the target (tightness), unless at qmax
    if q < 255:
        worse = float(probe_quality(y, u, v, jnp.int32(q + 1),
                                    metric="psnr"))
        assert worse < target
    # and q should be near the q that generated the target
    assert abs(q - 120) <= 2


def test_cq_unreachable_target_returns_qmin(planes):
    y, u, v = planes
    q, score = cq_search(y, u, v, 1000.0, metric="psnr", qmin=30)
    assert q == 30
    assert score < 1000.0
