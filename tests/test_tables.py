"""Structural invariants of the extracted spec tables."""

import numpy as np

from av1tpu.spec import tables


def _check_icdf_rows(t, arity=None):
    rows = t.reshape(-1, t.shape[-1])
    for row in rows:
        nz = row[row > 0]
        # strictly decreasing, bounded, terminated by zeros
        assert (nz < 32768).all()
        assert (np.diff(nz.astype(np.int64)) < 0).all()
        k = len(nz)
        assert (row[k:] == 0).all()
        if arity is not None:
            assert k == arity - 1, (k, arity)


def test_quant_tables():
    q = tables.quant()
    for name, t in q.items():
        assert t.shape == (256,)
        assert (np.diff(t.astype(np.int64)) >= 0).all()
    assert q["dc_q_8"][0] == 4 and q["dc_q_8"][255] == 1336
    assert q["ac_q_8"][255] == 1828
    assert tables.dc_q(0) == 4  # lossless anchor


def test_coef_cdf_shapes():
    c = tables.coef_cdfs()
    assert c["coeff_base"].shape == (4, 5, 2, 42, 4)
    assert c["coeff_br"].shape == (4, 5, 2, 21, 4)
    assert c["coeff_base_eob"].shape == (4, 5, 2, 4, 3)
    assert c["txb_skip"].shape == (4, 5, 13, 2)
    assert c["dc_sign"].shape == (4, 2, 3, 2)
    _check_icdf_rows(c["coeff_base"], arity=4)
    _check_icdf_rows(c["coeff_br"], arity=4)
    _check_icdf_rows(c["txb_skip"], arity=2)
    for area, nsym in ((16, 5), (32, 6), (64, 7), (128, 8),
                       (256, 9), (512, 10), (1024, 11)):
        t = c[f"eob_pt_{area}"]
        assert t.shape == (4, 2, 2, nsym)
        _check_icdf_rows(t, arity=nsym)


def test_mode_cdf_shapes():
    m = tables.mode_cdfs()
    p = m["partition"]
    assert p.shape == (20, 10)
    # arity pattern: 4 (w8), 10 (w16-w64), 8 (w128)
    for i in range(4):
        _check_icdf_rows(p[i], arity=4)
    for i in range(4, 16):
        _check_icdf_rows(p[i], arity=10)
    for i in range(16, 20):
        _check_icdf_rows(p[i], arity=8)
    assert m["kf_y_mode"].shape == (5, 5, 13)
    _check_icdf_rows(m["kf_y_mode"], arity=13)


def test_qctx_buckets():
    assert tables.coef_qctx(0) == 0
    assert tables.coef_qctx(21) == 1
    assert tables.coef_qctx(61) == 2
    assert tables.coef_qctx(200) == 3
