"""Pallas TPU kernel: fused forward transform + quantization + dequant.

The encoder's per-block-row hot op is `levels = clip(round((resid @ F^T) /
step), -cap, cap); dq = levels * q`.  XLA already fuses this reasonably, but
the Pallas version keeps the (B, N^2) residual tile, the transform matrix and
the quantizer rows resident in VMEM across the matmul (MXU) and the
elementwise tail (VPU), with no HBM round-trip for the coefficients.

Bit-compatibility: the float forward transform + rounding only choose the
levels (quality); reconstruction exactness comes from the integer inverse
transform downstream, so MXU accumulation-order differences vs the XLA path
are conformance-safe.  On CPU (tests) the kernel runs in interpreter mode and
matches the jnp reference exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tq_kernel(resid_ref, fwdt_ref, step_ref, off_ref, q_ref, cap_ref,
               lv_ref, dq_ref):
    coefs = jnp.dot(resid_ref[:], fwdt_ref[:],
                    preferred_element_type=jnp.float32)
    mag = jnp.floor(jnp.abs(coefs) / step_ref[:] + off_ref[:]).astype(
        jnp.int32)
    lv = jnp.clip(jnp.sign(coefs).astype(jnp.int32) * mag,
                  -cap_ref[:], cap_ref[:])
    lv_ref[:] = lv.astype(jnp.int16)
    dq_ref[:] = lv * q_ref[:]


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=())
def transform_quantize(resid, fwdt, step, q, cap):
    """resid: (B, N2) float32 residual rows; fwdt: (N2, N2) float32 (already
    transposed so that coefs = resid @ fwdt); step: (1, N2) float32;
    q, cap: (1, N2) int32.  Returns (levels int16 (B, N2), dq int32 (B, N2)).
    """
    from av1tpu.models.intra_v import _Q_OFFSET, _Q_OFFSET_DC
    off = jnp.full((1, resid.shape[1]), _Q_OFFSET,
                   jnp.float32).at[0, 0].set(_Q_OFFSET_DC)
    b, n2 = resid.shape
    pad_b = (-b) % 8        # float32 sublane multiple
    pad_n = (-n2) % 128     # lane multiple (8x8 blocks have N2=64)
    if pad_b:
        resid = jnp.pad(resid, ((0, pad_b), (0, 0)))
    if pad_n:
        resid = jnp.pad(resid, ((0, 0), (0, pad_n)))
        fwdt = jnp.pad(fwdt, ((0, pad_n), (0, pad_n)))
        step = jnp.pad(step, ((0, 0), (0, pad_n)), constant_values=1.0)
        off = jnp.pad(off, ((0, 0), (0, pad_n)))
        q = jnp.pad(q, ((0, 0), (0, pad_n)))          # q=0 -> dq 0
        cap = jnp.pad(cap, ((0, 0), (0, pad_n)))      # cap=0 -> level 0
    bp, np_ = b + pad_b, n2 + pad_n
    out = pl.pallas_call(
        _tq_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bp, np_), jnp.int16),
            jax.ShapeDtypeStruct((bp, np_), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=_interpret(),
    )(resid, fwdt, step, off, q, cap)
    lv, dq = out
    return lv[:b, :n2], dq[:b, :n2]
