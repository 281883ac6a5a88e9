import numpy as np

from av1tpu.core import from_clip, pad_to_multiple, scene_scores, split_scenes
from av1tpu.utils import Clip, read_y4m, synthetic_clip, write_y4m


def test_synthetic_clip_shapes():
    c = synthetic_clip(width=100, height=62, frames=3)
    c.validate()
    assert c.y.shape == (3, 62, 100)
    assert c.u.shape == (3, 31, 50)


def test_y4m_roundtrip(tmp_path):
    c = synthetic_clip(width=64, height=48, frames=4, seed=3)
    p = str(tmp_path / "t.y4m")
    write_y4m(p, c)
    c2 = read_y4m(p)
    assert np.array_equal(c.y, c2.y)
    assert np.array_equal(c.u, c2.u)
    assert np.array_equal(c.v, c2.v)
    assert c2.bit_depth == 8


def test_y4m_10bit_roundtrip(tmp_path):
    c = synthetic_clip(width=32, height=32, frames=2, bit_depth=10)
    p = str(tmp_path / "t10.y4m")
    write_y4m(p, c)
    c2 = read_y4m(p)
    assert c2.bit_depth == 10
    assert np.array_equal(c.y, c2.y)


def test_pad_to_multiple():
    x = np.arange(12, dtype=np.int32).reshape(3, 4)
    p = pad_to_multiple(x, 8)
    assert p.shape == (8, 8)
    # edge replication
    assert (p[3:, :4] == x[2]).all()
    assert (p[:3, 4:] == x[:, 3:4]).all()


def test_from_clip_pads_to_superblocks():
    c = synthetic_clip(width=100, height=62, frames=2)
    fb = from_clip(c, sb_size=64)
    assert fb.padded_width == 128 and fb.padded_height == 64
    assert fb.u.shape == (2, 32, 64)
    assert fb.width == 100 and fb.height == 62


def test_scene_detection_finds_hard_cut():
    a = synthetic_clip(width=96, height=64, frames=10, seed=1)
    b = synthetic_clip(width=96, height=64, frames=10, seed=2)
    # splice: second half is inverted content = hard cut at frame 10
    y = np.concatenate([a.y, 255 - b.y])
    u = np.concatenate([a.u, b.u])
    v = np.concatenate([a.v, b.v])
    c = Clip(y=y, u=u, v=v)
    scores = np.asarray(scene_scores(c.y.astype(np.int32)))
    assert scores[10] == max(scores[1:])

    ranges = split_scenes(scores, threshold=2.5, min_len=4, max_len=240)
    assert (10 in [s for s, _ in ranges]) or len(ranges) >= 1


def test_split_scenes_max_len():
    scores = np.zeros(500)
    ranges = split_scenes(scores, max_len=240)
    assert ranges == [(0, 240), (240, 480), (480, 500)]
    assert sum(e - s for s, e in ranges) == 500
