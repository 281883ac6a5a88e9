"""RDOQ-lite unit tests (av1tpu/models/rdoq.py).

The pruning must only ever zero levels (never alter magnitudes), keep
every large coefficient, and behave monotonically in lambda.  The gain
approximation (1/rownorm^2 of the forward matrix) must stay within a few
percent of the exact inverse-column norms it stands in for.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from av1tpu.models.intra_v import quantize_coefs
from av1tpu.models.rates import coef_rate_tables
from av1tpu.models.rdoq import _KEEP_ALWAYS, coef_gains, rd_zero


@pytest.fixture(scope="module")
def setup16():
    rng = np.random.RandomState(3)
    coefs = jnp.asarray(rng.normal(0, 40, (32, 256)), jnp.float32)
    step = jnp.full((256,), 18.0, jnp.float32)
    lv = quantize_coefs(coefs, step, jnp.full((256,), 4000))
    tab = jnp.asarray(coef_rate_tables(2, 0)[1])
    gains = jnp.asarray(coef_gains(16))
    return coefs, step, lv, tab, gains


def test_zero_or_identity(setup16):
    coefs, step, lv, tab, gains = setup16
    out = rd_zero(lv, coefs, step, jnp.float32(20.0), tab, gains)
    out = np.asarray(out)
    lv = np.asarray(lv)
    assert ((out == 0) | (out == lv)).all()


def test_large_levels_kept(setup16):
    coefs, step, lv, tab, gains = setup16
    out = np.asarray(rd_zero(lv, coefs, step, jnp.float32(1e9), tab,
                             gains))
    big = np.abs(np.asarray(lv)) >= _KEEP_ALWAYS
    assert (out[big] == np.asarray(lv)[big]).all()


def test_lambda_monotone(setup16):
    coefs, step, lv, tab, gains = setup16
    kept = [int((np.asarray(rd_zero(lv, coefs, step, jnp.float32(lam),
                                    tab, gains)) != 0).sum())
            for lam in (0.0, 5.0, 20.0, 80.0)]
    assert kept[0] == int((np.asarray(lv) != 0).sum())  # lam 0: no pruning
    assert kept == sorted(kept, reverse=True)


def test_gain_approximation_accuracy():
    from av1tpu.spec.transforms import _inverse_matrix

    for n in (8, 16):
        m = _inverse_matrix(n, n, 0)
        exact = (m * m).sum(axis=0)
        approx = np.asarray(coef_gains(n), np.float64)
        assert np.abs(approx / exact - 1).max() < 0.02
