"""Scene-parallel production GOP encode over the virtual 8-device mesh
(av1tpu/parallel/gop.py, the CLI --workers path): batched results must be
identical to the single-device pipeline per scene, the scene batch must
actually be distributed, and the full CLI --workers encode must produce
the same streams as --workers 1."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from av1tpu.models.cdef_tpu import skip8_host
from av1tpu.models.intra_v import fuse_planes, split_compact
from av1tpu.parallel.gop import SceneBatchEncoder, _shard, scene_mesh
from av1tpu.utils import synthetic_clip


def _scene(w, h, k, seed):
    clip = synthetic_clip(w, h, k, seed=seed)
    return np.stack([fuse_planes(clip.y[i], clip.u[i], clip.v[i])
                     for i in range(k)])


def _skip_fn(h, w):
    return lambda buf: skip8_host(split_compact(buf, h, w)[1], h, w)


def _mk_scenes(nsc, w, h, lens):
    return [{
        "frames": _scene(w, h, lens[s], seed=100 + s),
        "q": 100 + 4 * (s % 3), "key_q": 80 + 4 * (s % 3),
        "key_lf": (10, 7, 7), "inter_lf": (12, 8, 8),
    } for s in range(nsc)]


def test_scene_batch_matches_single_device():
    """Each scene's batched key/inter buffers and CDEF choice equal the
    same scene encoded alone on a 1-device mesh."""
    w = h = 64
    lens = [3, 2, 4, 3, 2, 2, 3, 2]
    scenes = _mk_scenes(8, w, h, lens)
    enc = SceneBatchEncoder(scenes, scene_mesh(8), h, w)
    res8 = enc.encode(8192, 8192, part=True, skip8_host_fn=_skip_fn(h, w))
    for s in range(8):
        enc1 = SceneBatchEncoder([scenes[s]], scene_mesh(1), h, w)
        res1 = enc1.encode(8192, 8192, part=True,
                           skip8_host_fn=_skip_fn(h, w))[0]
        assert np.array_equal(res8[s]["key_buf"], res1["key_buf"]), s
        assert np.array_equal(res8[s]["cdef_s"], res1["cdef_s"]), s
        assert len(res8[s]["inter_bufs"]) == lens[s] - 1
        for t, (a, b) in enumerate(zip(res8[s]["inter_bufs"],
                                       res1["inter_bufs"])):
            assert np.array_equal(a, b), (s, t)
        assert np.array_equal(res8[s]["ref"], res1["ref"]), s


def test_scene_shard_placement():
    """The sharded scene axis puts one scene on each device."""
    mesh = scene_mesh(8)
    frames0 = np.stack([_scene(64, 64, 1, seed=s)[0] for s in range(8)])
    sharded = _shard(mesh, frames0)
    assert len(sharded.addressable_shards) == 8
    assert {s.data.shape[0] for s in sharded.addressable_shards} == {1}
    devs = {s.device for s in sharded.addressable_shards}
    assert len(devs) == 8  # distinct devices, not replicas


def test_batch_padding_to_mesh():
    """3 scenes on an 8-device mesh: batch pads with scene-0 copies whose
    outputs are discarded."""
    w = h = 64
    scenes = _mk_scenes(3, w, h, [2, 3, 2])
    enc = SceneBatchEncoder(scenes, scene_mesh(8), h, w)
    res = enc.encode(8192, 8192, part=True, skip8_host_fn=_skip_fn(h, w))
    assert len(res) == 3
    assert [len(r["inter_bufs"]) for r in res] == [1, 2, 1]


def test_cli_workers_streams_identical(tmp_path):
    """encode_clip --workers 8 produces byte-identical TUs to --workers 1
    (multi-scene clip crossing a hard cut)."""
    from av1tpu.cli import encode_clip
    from av1tpu.utils import synthetic_clip as synth

    w, h = 128, 64
    clip = synth(w, h, 8, seed=3)
    # force a scene cut mid-clip: invert the second half
    clip.y[4:] = 255 - clip.y[4:]
    s1, st1 = encode_clip(clip, 100, chunk=2, metric="psnr", gop=True,
                          workers=1)
    s8, st8 = encode_clip(clip, 100, chunk=2, metric="psnr", gop=True,
                          workers=8)
    assert st1["scenes"] >= 2
    assert len(s1) == len(s8) == 8
    for k, (a, b) in enumerate(zip(s1, s8)):
        assert a == b, k
