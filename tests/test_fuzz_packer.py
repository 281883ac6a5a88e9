"""Fuzz the C++ packer against the Python engine with adversarial level
grids — extreme magnitudes, dense/sparse mixes, sign patterns, random modes.
The reference's proptest discipline (SURVEY §4) applied to the one component
where a single wrong context bit corrupts whole streams."""

import os

import numpy as np
import pytest

from av1tpu.coding import Packer
from av1tpu.spec import encode_frame as ef
from av1tpu.spec.cdf_state import EncCoder
from av1tpu.spec.enums import V_PRED
from av1tpu.spec.tile import FixedPartitionPlanner, TileCoder

LIB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "native", "build", "libav1pack.so")

pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="libav1pack not built")


class FuzzPartPlanner(FixedPartitionPlanner):
    """Arbitrary split map + grids through the engine (quadrant union
    layout, as the TPU transport stores it)."""

    def __init__(self, ly, lu, lv, modes16, modes32, split):
        super().__init__(leaf_bsize=6, y_mode=V_PRED, uv_mode=V_PRED)
        self.grids = (ly, lu, lv)
        self.m16, self.m32, self.split_grid = modes16, modes32, split

    def partition_choice(self, tc, r, c, bsize):
        if bsize > 9:
            return 3  # SPLIT
        if bsize == 9:
            return 3 if self.split_grid[r // 8, c // 8] else 0
        return 0

    def modes(self, tc, r, c, bsize):
        if bsize == 9:
            return int(self.m32[r // 8, c // 8]), V_PRED
        return int(self.m16[r // 4, c // 4]), V_PRED

    def quantize(self, tc, coefs_f, plane, tx, dc_q, ac_q, shift, x=0, y=0):
        n = coefs_f.shape[0]
        g = self.grids[plane]
        ns = 16 if plane == 0 else 8  # slot size
        if n == ns:  # 16-block (or 8x8 chroma): direct slot
            return g[y // ns, x // ns].astype(np.int64)
        # 32-block (16x16 chroma): reassemble 2x2 quadrants from slots
        out = np.zeros((n, n), np.int64)
        for qr in range(2):
            for qc in range(2):
                out[qr * ns : qr * ns + ns, qc * ns : qc * ns + ns] = \
                    g[y // ns + qr, x // ns + qc]
        return out


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_partition_packer(seed):
    from av1tpu.coding import Packer
    from av1tpu.spec import encode_frame as ef2

    rng = np.random.RandomState(1000 + seed)
    rows, cols = 2, 3
    w, h = cols * 64, rows * 64
    density = rng.choice([0.01, 0.2, 0.9])
    maxmag = int(rng.choice([2, 30, 900]))
    q = int(rng.choice([20, 100, 230]))
    ly, lu, lv = _random_grids(rng, rows * 4, cols * 4, density, maxmag)
    m16 = rng.choice([1, 3, 8], size=(rows * 4, cols * 4)).astype(np.int16)
    m32 = rng.choice([1, 3, 8], size=(rows * 2, cols * 2)).astype(np.int16)
    split = rng.choice([0, 1], size=(rows * 2, cols * 2)).astype(np.int16)

    cfg = ef2.EncoderConfig(base_q_idx=q)
    seq = ef2.make_sequence_header(w, h, cfg)
    fh = ef2.make_frame_header(seq, cfg)
    src = [np.zeros((h, w), np.int32), np.zeros((h // 2, w // 2), np.int32),
           np.zeros((h // 2, w // 2), np.int32)]
    recon = [np.zeros_like(p) for p in src]
    coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
    TileCoder(seq, fh, coder, recon, source=src,
              planner=FuzzPartPlanner(ly, lu, lv, m16, m32,
                                      split)).code_tile()
    py_tile = coder.done()

    flat = np.concatenate([ly.ravel(), lu.ravel(), lv.ravel()])
    sig = flat != 0
    bitmap = (sig.reshape(-1, 16).astype(np.uint16)
              << np.arange(16, dtype=np.uint16)).sum(1).astype(np.uint16)
    vals = flat[sig].astype(np.int16)
    split64 = np.ones((rows, cols), np.int16)  # always split to 32-level
    cpp = Packer().pack_tile_part(bitmap, vals, m16.ravel(), m32.ravel(),
                                  split.ravel(), split64.ravel(), h, w, q)
    assert cpp == py_tile


class FuzzPlanner(FixedPartitionPlanner):
    """Feeds arbitrary level grids + modes through the spec engine."""

    def __init__(self, ly, lu, lv, modes):
        super().__init__(leaf_bsize=6, y_mode=V_PRED, uv_mode=V_PRED)
        self.grids = (ly, lu, lv)
        self.mode_grid = modes

    def modes(self, tc, r, c, bsize):
        return int(self.mode_grid[r // 4, c // 4]), V_PRED

    def quantize(self, tc, coefs_f, plane, tx, dc_q, ac_q, shift, x=0, y=0):
        n = 16 if plane == 0 else 8
        return self.grids[plane][y // n, x // n].astype(np.int64)


def _random_grids(rng, rows, cols, density, maxmag):
    def grid(n):
        g = rng.randint(-maxmag, maxmag + 1, size=(rows, cols, n, n))
        mask = rng.random(g.shape) < density
        return (g * mask).astype(np.int64)
    return grid(16), grid(8), grid(8)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_packer_matches_engine(seed):
    rng = np.random.RandomState(seed)
    rows, cols = 2, 3  # 128x192 frame, multiple SBs incl. partial edge ctx
    w, h = cols * 64, rows * 64
    density = rng.choice([0.001, 0.02, 0.3, 0.95])
    maxmag = int(rng.choice([1, 3, 14, 200, 16000]))
    q = int(rng.choice([8, 60, 150, 255]))
    ly, lu, lv = _random_grids(rng, rows * 4, cols * 4, density, maxmag)
    modes = rng.choice([1, 3, 8], size=(rows * 4, cols * 4)).astype(np.int8)

    cfg = ef.EncoderConfig(base_q_idx=q)
    seq = ef.make_sequence_header(w, h, cfg)
    fh = ef.make_frame_header(seq, cfg)
    src = [np.zeros((h, w), np.int32), np.zeros((h // 2, w // 2), np.int32),
           np.zeros((h // 2, w // 2), np.int32)]
    recon = [np.zeros_like(p) for p in src]
    coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
    tc = TileCoder(seq, fh, coder, recon, source=src,
                   planner=FuzzPlanner(ly, lu, lv, modes))
    tc.code_tile()
    py_tile = coder.done()

    cpp_tile = Packer().pack_tile(ly, lu, lv, q)
    if np.all(modes == 1):
        assert cpp_tile == py_tile

    # compact path with modes: build bitmap/values on the host
    flat = np.concatenate([ly.ravel(), lu.ravel(), lv.ravel()])
    clipped = np.clip(flat, -(1 << 14), 1 << 14).astype(np.int64)
    # engine must see the same clipped values (int16 transport range)
    if not np.array_equal(clipped, flat):
        return  # magnitudes beyond transport range: covered by cap in prod
    sig = flat != 0
    bitmap = (sig.reshape(-1, 16).astype(np.uint16)
              << np.arange(16, dtype=np.uint16)).sum(1).astype(np.uint16)
    vals = flat[sig].astype(np.int16)
    cpp_compact = Packer().pack_tile_compact(
        bitmap, vals, h, w, q, modes=modes.ravel().astype(np.int16))
    assert cpp_compact == py_tile
