"""Pallas kernel correctness: the fused transform+quant kernel must match the
plain XLA expression exactly (CPU interpreter mode here; the TPU path is
exercised by bench.py and the pipeline tests on hardware)."""

import jax.numpy as jnp
import numpy as np

from av1tpu.kernels.transform_quant import transform_quantize
from av1tpu.ops.transforms_jax import forward_matrix


def _reference(resid, fwdt, step, q, cap):
    from av1tpu.models.intra_v import quantize_coefs
    coefs = resid @ fwdt
    lv = quantize_coefs(coefs, step, cap)
    return lv.astype(jnp.int16), lv * q


def _case(n, b, seed):
    rng = np.random.RandomState(seed)
    resid = jnp.asarray(rng.randint(-255, 255, size=(b, n * n))
                        .astype(np.float32))
    fwdt = jnp.asarray(forward_matrix(n, n, 0).T)
    step = np.full((1, n * n), 19.0, np.float32)
    step[0, 0] = 17.0
    q = np.full((1, n * n), 19, np.int32)
    q[0, 0] = 17
    cap = np.full((1, n * n), 1 << 14, np.int32)
    return resid, fwdt, jnp.asarray(step), jnp.asarray(q), jnp.asarray(cap)


def test_kernel_matches_reference_16x16():
    args = _case(16, 120, 0)
    lv, dq = transform_quantize(*args)
    rlv, rdq = _reference(*args)
    assert np.array_equal(np.asarray(lv), np.asarray(rlv))
    assert np.array_equal(np.asarray(dq), np.asarray(rdq))


def test_kernel_matches_reference_8x8_lane_padding():
    args = _case(8, 37, 1)  # N2=64 exercises lane padding; odd B, sublane pad
    lv, dq = transform_quantize(*args)
    rlv, rdq = _reference(*args)
    assert lv.shape == (37, 64) and dq.shape == (37, 64)
    assert np.array_equal(np.asarray(lv), np.asarray(rlv))
    assert np.array_equal(np.asarray(dq), np.asarray(rdq))
