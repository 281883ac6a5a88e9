"""Per-coefficient rate-distortion quantization (RDOQ-lite).

The deadzone quantizer keeps every coefficient whose magnitude clears a
fixed fraction of the step — on noisy content that codes thousands of
near-threshold noise coefficients whose rate cost far exceeds their
distortion value (the reference's SVT-AV1 backend prunes these in its
RDOQ/dropout stage, which is why its keyframes on noisy sources are an
order of magnitude smaller at equal PSNR; reference operating point
crates/daemon/src/encode/av1an.rs:14).

This is the TPU-native equivalent: a fully vectorized zero-vs-keep test
per coefficient,

    keep  <=>  gain_j * (c^2 - (c - dq)^2)  >  lambda * bits(|lv|)

where gain_j converts coefficient-domain squared error to pixel-domain
SSE (column norm^2 of the linearized normative inverse transform,
approximated as 1/rownorm^2 of the cached forward matrix — <=2% error,
verified against the exact column norms), and bits(|lv|) is the marginal
cost of coding the level vs zero from the real coefficient CDFs
(av1tpu/models/rates.py tables).  Magnitudes >= _KEEP_ALWAYS are kept
unconditionally: their distortion saving dominates any plausible rate, so
the select chain stays short (pure VPU compares, no gather).

Elementwise and context-free by design: no trellis, no eob shortening —
the whole-block zero case is handled by the callers' skip/txb RDO.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# magnitudes >= this are kept unconditionally (distortion saving of a
# large coefficient always beats its bit cost at the lambdas in use)
_KEEP_ALWAYS = 8


@functools.cache
def coef_gains(n: int, tx_type: int = 0) -> np.ndarray:
    """(m,) pixel-SSE gain of each coded coefficient for the n x n
    transform (m = min(n, 32)^2: TX_64X64 codes the top-left 32x32)."""
    if n == 64:
        from av1tpu.models.intra_part import _fwd64

        fwd = np.asarray(_fwd64(), np.float64)
    else:
        from av1tpu.ops.transforms_jax import forward_matrix

        fwd = np.asarray(forward_matrix(n, n, tx_type), np.float64)
    return (1.0 / (fwd * fwd).sum(axis=1)).astype(np.float32)


def rd_zero(lv, coefs, dq_scale, lam, tab, gains, noise_gate=None):
    """Zero every level whose rate exceeds its distortion value.

    lv: (..., m) int32 levels from the deadzone quantizer; coefs: the
    float32 forward-transform coefficients lv was quantized from;
    dq_scale: (m,) float32 effective dequant per level unit (q row, with
    any 32/64 downshift folded in — float vs the decoder's integer
    shift differs by <1 ulp, irrelevant for an RD decision); lam:
    pixel-domain lambda (SSE per bit), traced; tab: (>=_KEEP_ALWAYS,)
    expected bits per magnitude from the coefficient CDFs at the frame's
    quality bucket (rates.RateModel.tabs[qctx]), traced; gains: (m,)
    float32 from coef_gains.  Returns pruned levels.
    """
    a = jnp.abs(lv)
    c = jnp.abs(coefs)
    save = gains * (c * c - (c - a.astype(jnp.float32) * dq_scale) ** 2)
    # marginal bits of magnitude k vs zero, exact for the near-threshold
    # range 1.._KEEP_ALWAYS-1 where the decision is actually close
    bits = jnp.zeros(a.shape, jnp.float32)
    for k in range(1, _KEEP_ALWAYS):
        bits = bits + jnp.where(a == k, tab[k] - tab[0], 0.0)
    keep = (a >= _KEEP_ALWAYS) | (save > lam * bits) | (a == 0)
    if noise_gate is not None:
        # noise floor: a coefficient whose pixel-domain energy sits inside
        # the (estimated) sensor-noise band explains noise, not content —
        # zero it regardless of lambda (noise is useless to every frame
        # that references this one).  noise_gate = (3 * sigma_resid)^2.
        above_floor = ((gains * c * c > noise_gate)
                       | (a >= _KEEP_ALWAYS) | (a == 0))
        keep = keep & above_floor
    return jnp.where(keep, lv, 0)
