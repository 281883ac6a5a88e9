"""TPU CDEF pass (models/cdef_tpu.py) must match the engine oracle
(spec/cdef.py, itself decoder-validated) sample-exactly: direction search,
variance-adjusted primary strength, tap parity, skip gating, clamping,
chroma damping, and 10-bit scaling."""

import numpy as np
import pytest

from av1tpu.models.cdef_tpu import cdef_dirs, cdef_tpu
from av1tpu.spec.cdef import cdef_frame, find_dir


def rand_planes(rng, h, w, bit_depth=8):
    mx = (1 << bit_depth) - 1
    y = rng.integers(0, mx + 1, (h, w)).astype(np.int64)
    u = rng.integers(0, mx + 1, (h // 2, w // 2)).astype(np.int64)
    v = rng.integers(0, mx + 1, (h // 2, w // 2)).astype(np.int64)
    return y, u, v


def smooth_planes(rng, h, w, bit_depth=8):
    """Low-frequency content — exercises var==0 / flat-block paths."""
    mx = (1 << bit_depth) - 1
    base = rng.integers(0, mx + 1, (h // 16 + 1, w // 16 + 1))
    y = np.kron(base, np.ones((16, 16)))[:h, :w].astype(np.int64)
    u = y[::2, ::2] // 2
    v = mx - y[::2, ::2]
    return y, u, v


def test_dir_search_matches_oracle():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (64, 128)).astype(np.int64)
    d8, v8 = cdef_dirs(y, 0)
    d8, v8 = np.asarray(d8), np.asarray(v8)
    for br in range(8):
        for bc in range(16):
            dd, vv = find_dir(y[br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8],
                              0)
            assert d8[br, bc] == dd and v8[br, bc] == vv, (br, bc)


@pytest.mark.parametrize("pri_y,sec_y,pri_uv,sec_uv", [
    (4, 2, 2, 1), (15, 3, 15, 3), (0, 2, 0, 1), (5, 0, 3, 0),
    (1, 1, 1, 1), (0, 0, 0, 0),
])
@pytest.mark.parametrize("damping", [3, 5])
def test_filter_matches_oracle(pri_y, sec_y, pri_uv, sec_uv, damping):
    rng = np.random.default_rng(pri_y * 31 + sec_y * 7 + damping)
    h, w = 64, 96
    y, u, v = rand_planes(rng, h, w)
    skips = rng.integers(0, 2, (h // 4, w // 4)).astype(np.int8)
    ref = cdef_frame([y, u, v], skips, pri_y, sec_y, pri_uv, sec_uv,
                     damping)
    skip8 = skips.reshape(h // 8, 2, w // 8, 2).all(axis=(1, 3))
    got = cdef_tpu(y, u, v, skip8, pri_y, sec_y, pri_uv, sec_uv,
                   damping=damping)
    for p in range(3):
        assert np.array_equal(np.asarray(got[p]), ref[p]), \
            (p, int(np.abs(np.asarray(got[p]) - ref[p]).max()))


@pytest.mark.parametrize("kind", ["rand", "smooth"])
def test_filter_matches_oracle_10bit(kind):
    rng = np.random.default_rng(11)
    h, w = 64, 64
    fn = rand_planes if kind == "rand" else smooth_planes
    y, u, v = fn(rng, h, w, bit_depth=10)
    skips = np.zeros((h // 4, w // 4), np.int8)
    ref = cdef_frame([y, u, v], skips, 6, 1, 4, 2, 4, bit_depth=10)
    skip8 = np.zeros((h // 8, w // 8), bool)
    got = cdef_tpu(y, u, v, skip8, 6, 1, 4, 2, damping=4, bit_depth=10)
    for p in range(3):
        assert np.array_equal(np.asarray(got[p]), ref[p]), \
            (p, int(np.abs(np.asarray(got[p]) - ref[p]).max()))


def test_filter_smooth_var_zero_blocks():
    """Flat blocks: var == 0 turns the luma primary off (spec)."""
    rng = np.random.default_rng(21)
    y, u, v = smooth_planes(rng, 64, 64)
    skips = np.zeros((16, 16), np.int8)
    ref = cdef_frame([y, u, v], skips, 8, 2, 6, 1, 3)
    got = cdef_tpu(y, u, v, np.zeros((8, 8), bool), 8, 2, 6, 1)
    for p in range(3):
        assert np.array_equal(np.asarray(got[p]), ref[p]), p
