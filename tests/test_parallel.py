"""Chunk-parallel encode over the virtual 8-device mesh: sharded results
must be identical to single-device results, and the batch must actually be
distributed."""

import numpy as np
import pytest

import jax

from av1tpu.models.intra_v import encode_intra_v_compact, fuse_planes
from av1tpu.parallel import chunk_mesh, encode_batch, shard_frames
from av1tpu.utils import synthetic_clip


def _frames(k, w=64, h=64):
    clip = synthetic_clip(w, h, k, seed=23)
    return np.stack([
        fuse_planes(clip.y[i], clip.u[i], clip.v[i]) for i in range(k)])


def test_mesh_uses_all_devices():
    mesh = chunk_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices


def test_sharded_encode_matches_single_device():
    frames = _frames(8)
    mesh = chunk_mesh()
    out = encode_batch(frames, 100, 64, 64, mesh=mesh, cap=2048)
    for i in range(8):
        single = np.asarray(
            encode_intra_v_compact(frames[i], 100, 64, 64, cap=2048))
        assert np.array_equal(out[i], single), f"frame {i}"


def test_shard_placement():
    frames = _frames(8)
    mesh = chunk_mesh()
    sharded = shard_frames(frames, mesh)
    assert len(sharded.addressable_shards) == 8
    sizes = {s.data.shape[0] for s in sharded.addressable_shards}
    assert sizes == {1}  # one frame per device


def test_indivisible_batch_rejected():
    frames = _frames(3)
    with pytest.raises(ValueError, match="not divisible"):
        shard_frames(frames, chunk_mesh())
