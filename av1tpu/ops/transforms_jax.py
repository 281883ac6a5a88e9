"""Jittable integer-exact AV1 inverse transforms (+ forward matrices).

Ports av1tpu.spec.transforms to JAX with full batching: every function takes
(..., N) int32 arrays and vectorizes over leading axes, so a whole frame of
transform blocks runs as a handful of fused XLA ops on TPU.

Exactness: same butterfly structure and per-stage roundings as the numpy spec
model (which is validated bit-exactly against dav1d).  int32 throughout; the
encoder caps dequantized coefficients (see quantize_levels) so intermediates
stay within int32 without the spec's conformance clamps.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from av1tpu.spec.transforms import COS128, _forward_matrix

COS = [int(v) for v in COS128]


def _rs(x, n):
    """round2: (x + 2^(n-1)) >> n, exact arithmetic shift."""
    return (x + (1 << (n - 1))) >> n


def _btf(w0, a, w1, b):
    return _rs(w0 * a + w1 * b, 12)


def idct4(x):
    b0, b1, b2, b3 = x[..., 0], x[..., 2], x[..., 1], x[..., 3]
    s0 = _btf(COS[32], b0, COS[32], b1)
    s1 = _btf(COS[32], b0, -COS[32], b1)
    s2 = _btf(COS[48], b2, -COS[16], b3)
    s3 = _btf(COS[16], b2, COS[48], b3)
    return jnp.stack([s0 + s3, s1 + s2, s1 - s2, s0 - s3], axis=-1)


def idct8(x):
    e = idct4(x[..., 0::2])
    b4, b5, b6, b7 = x[..., 1], x[..., 5], x[..., 3], x[..., 7]
    s4 = _btf(COS[56], b4, -COS[8], b7)
    s5 = _btf(COS[24], b5, -COS[40], b6)
    s6 = _btf(COS[40], b5, COS[24], b6)
    s7 = _btf(COS[8], b4, COS[56], b7)
    t4 = s4 + s5
    t5 = s4 - s5
    t6 = -s6 + s7
    t7 = s6 + s7
    u5 = _btf(-COS[32], t5, COS[32], t6)
    u6 = _btf(COS[32], t5, COS[32], t6)
    o = [e[..., 0] + t7, e[..., 1] + u6, e[..., 2] + u5, e[..., 3] + t4,
         e[..., 3] - t4, e[..., 2] - u5, e[..., 1] - u6, e[..., 0] - t7]
    return jnp.stack(o, axis=-1)


def idct16(x):
    e = idct8(x[..., 0::2])
    b = [x[..., 1], x[..., 9], x[..., 5], x[..., 13],
         x[..., 3], x[..., 11], x[..., 7], x[..., 15]]
    s8 = _btf(COS[60], b[0], -COS[4], b[7])
    s9 = _btf(COS[28], b[1], -COS[36], b[6])
    s10 = _btf(COS[44], b[2], -COS[20], b[5])
    s11 = _btf(COS[12], b[3], -COS[52], b[4])
    s12 = _btf(COS[52], b[3], COS[12], b[4])
    s13 = _btf(COS[20], b[2], COS[44], b[5])
    s14 = _btf(COS[36], b[1], COS[28], b[6])
    s15 = _btf(COS[4], b[0], COS[60], b[7])
    t8 = s8 + s9
    t9 = s8 - s9
    t10 = -s10 + s11
    t11 = s10 + s11
    t12 = s12 + s13
    t13 = s12 - s13
    t14 = -s14 + s15
    t15 = s14 + s15
    u9 = _btf(-COS[16], t9, COS[48], t14)
    u10 = _btf(-COS[48], t10, -COS[16], t13)
    u13 = _btf(-COS[16], t10, COS[48], t13)
    u14 = _btf(COS[48], t9, COS[16], t14)
    v8 = t8 + t11
    v9 = u9 + u10
    v10 = u9 - u10
    v11 = t8 - t11
    v12 = -t12 + t15
    v13 = -u13 + u14
    v14 = u13 + u14
    v15 = t12 + t15
    w10 = _btf(-COS[32], v10, COS[32], v13)
    w11 = _btf(-COS[32], v11, COS[32], v12)
    w12 = _btf(COS[32], v11, COS[32], v12)
    w13 = _btf(COS[32], v10, COS[32], v13)
    odd = [v15, v14, w13, w12, w11, w10, v9, v8]
    o = [e[..., i] + odd[i] for i in range(8)] + \
        [e[..., 7 - i] - odd[7 - i] for i in range(8)]
    return jnp.stack(o, axis=-1)


def iadst8(x):
    b = [x[..., 7], x[..., 0], x[..., 5], x[..., 2],
         x[..., 3], x[..., 4], x[..., 1], x[..., 6]]
    s = [
        _btf(COS[4], b[0], COS[60], b[1]),
        _btf(COS[60], b[0], -COS[4], b[1]),
        _btf(COS[20], b[2], COS[44], b[3]),
        _btf(COS[44], b[2], -COS[20], b[3]),
        _btf(COS[36], b[4], COS[28], b[5]),
        _btf(COS[28], b[4], -COS[36], b[5]),
        _btf(COS[52], b[6], COS[12], b[7]),
        _btf(COS[12], b[6], -COS[52], b[7]),
    ]
    t = [s[0] + s[4], s[1] + s[5], s[2] + s[6], s[3] + s[7],
         s[0] - s[4], s[1] - s[5], s[2] - s[6], s[3] - s[7]]
    u = t[:4] + [
        _btf(COS[16], t[4], COS[48], t[5]),
        _btf(COS[48], t[4], -COS[16], t[5]),
        _btf(-COS[48], t[6], COS[16], t[7]),
        _btf(COS[16], t[6], COS[48], t[7]),
    ]
    v = [u[0] + u[2], u[1] + u[3], u[0] - u[2], u[1] - u[3],
         u[4] + u[6], u[5] + u[7], u[4] - u[6], u[5] - u[7]]
    w = [v[0], v[1],
         _btf(COS[32], v[2], COS[32], v[3]),
         _btf(COS[32], v[2], -COS[32], v[3]),
         v[4], v[5],
         _btf(COS[32], v[6], COS[32], v[7]),
         _btf(COS[32], v[6], -COS[32], v[7])]
    return jnp.stack([w[0], -w[4], w[6], -w[2], w[3], -w[7], w[5], -w[1]],
                     axis=-1)


_1D = {("d", 4): idct4, ("d", 8): idct8, ("d", 16): idct16, ("a", 8): iadst8}

# (vertical kind, horizontal kind) for the tx types the pipeline emits
_TX_KIND = {0: ("d", "d"), 1: ("a", "d"), 2: ("d", "a")}

_ROW_SHIFT = {(4, 4): 0, (8, 8): 1, (16, 16): 2}


def inverse_transform(coefs, w: int, h: int, tx_type: int = 0):
    """Normative 2D inverse transform.  coefs: (..., h, w) int32."""
    assert w == h, "square only in the v1 TPU pipeline"
    vk, hk = _TX_KIND[tx_type]
    t = _rs(_1D[(hk, w)](coefs), _ROW_SHIFT[(w, h)])
    t = _1D[(vk, h)](jnp.swapaxes(t, -1, -2))
    return _rs(jnp.swapaxes(t, -1, -2), 4)


@functools.cache
def forward_matrix(w: int, h: int, tx_type: int = 0) -> np.ndarray:
    """Encoder forward transform as a (h*w, h*w) float32 matrix (pinv of the
    linearized normative inverse)."""
    return _forward_matrix(w, h, tx_type).astype(np.float32)
