"""AV1 transforms: normative integer inverses + calibrated forward analogs.

The INVERSE transforms are normative (spec 7.13.3): the encoder must run them
for reconstruction so its recon matches any conforming decoder bit-exactly.
They are implemented here as the standard AV1 butterfly networks with 12-bit
cos/sin constants and per-stage rounding; validated against dav1d by decoding
single-coefficient probe streams (tests).

The FORWARD transforms are an encoder choice (not normative).  We derive them
numerically: linearize the integer inverse into a matrix and use its scaled
pseudo-inverse, so quant->dequant->inverse round-trips with minimal error.

numpy int64 arithmetic throughout; these are the reference ops the Pallas
kernels are tested against.
"""

from __future__ import annotations

import functools

import numpy as np

from .enums import (
    ADST_ADST, ADST_DCT, DCT_ADST, DCT_DCT, DCT_FLIPADST, FLIPADST_ADST,
    FLIPADST_DCT, FLIPADST_FLIPADST, ADST_FLIPADST, H_ADST, H_DCT,
    H_FLIPADST, IDTX, V_ADST, V_DCT, V_FLIPADST,
)

# 12-bit cosine table: cos128(i) = round(cos(i*pi/128) * 4096) (spec cos128)
COS128 = np.round(np.cos(np.arange(65) * np.pi / 128) * 4096).astype(np.int64)


def cos128(angle: int) -> int:
    angle &= 255
    if angle <= 64:
        return int(COS128[angle])
    if angle <= 128:
        return -int(COS128[128 - angle])
    if angle <= 192:
        return -int(COS128[angle - 128])
    return int(COS128[256 - angle])


def cospi(i: int) -> int:
    """cos(i*pi/128) in 12-bit fixed point, i in [0, 64)."""
    return int(COS128[i])


SINPI = [0, 1321, 2482, 3344, 3803]  # round(sin(i*pi/9) * sqrt2 * 4096) anchors


def round2(x, n: int):
    if n == 0:
        return x
    return (x + (1 << (n - 1))) >> n


def _half_btf(w0, a, w1, b):
    return round2(w0 * a + w1 * b, 12)


# All 1D transforms operate on numpy int64 arrays of shape (..., N): the
# leading axes are vectorized (all rows/columns at once).


def idct4(x):
    b0, b1, b2, b3 = x[..., 0], x[..., 2], x[..., 1], x[..., 3]
    s0 = _half_btf(cospi(32), b0, cospi(32), b1)
    s1 = _half_btf(cospi(32), b0, -cospi(32), b1)
    s2 = _half_btf(cospi(48), b2, -cospi(16), b3)
    s3 = _half_btf(cospi(16), b2, cospi(48), b3)
    return np.stack([s0 + s3, s1 + s2, s1 - s2, s0 - s3], axis=-1)


def idct8(x):
    e = idct4(x[..., [0, 2, 4, 6]])
    b4, b5, b6, b7 = x[..., 1], x[..., 5], x[..., 3], x[..., 7]
    s4 = _half_btf(cospi(56), b4, -cospi(8), b7)
    s5 = _half_btf(cospi(24), b5, -cospi(40), b6)
    s6 = _half_btf(cospi(40), b5, cospi(24), b6)
    s7 = _half_btf(cospi(8), b4, cospi(56), b7)
    t4 = s4 + s5
    t5 = s4 - s5
    t6 = -s6 + s7
    t7 = s6 + s7
    u5 = _half_btf(-cospi(32), t5, cospi(32), t6)
    u6 = _half_btf(cospi(32), t5, cospi(32), t6)
    o = [e[..., 0] + t7, e[..., 1] + u6, e[..., 2] + u5, e[..., 3] + t4,
         e[..., 3] - t4, e[..., 2] - u5, e[..., 1] - u6, e[..., 0] - t7]
    return np.stack(o, axis=-1)


def idct16(x):
    e = idct8(x[..., 0::2])
    b = [x[..., 1], x[..., 9], x[..., 5], x[..., 13],
         x[..., 3], x[..., 11], x[..., 7], x[..., 15]]
    s8 = _half_btf(cospi(60), b[0], -cospi(4), b[7])
    s9 = _half_btf(cospi(28), b[1], -cospi(36), b[6])
    s10 = _half_btf(cospi(44), b[2], -cospi(20), b[5])
    s11 = _half_btf(cospi(12), b[3], -cospi(52), b[4])
    s12 = _half_btf(cospi(52), b[3], cospi(12), b[4])
    s13 = _half_btf(cospi(20), b[2], cospi(44), b[5])
    s14 = _half_btf(cospi(36), b[1], cospi(28), b[6])
    s15 = _half_btf(cospi(4), b[0], cospi(60), b[7])
    t8 = s8 + s9
    t9 = s8 - s9
    t10 = -s10 + s11
    t11 = s10 + s11
    t12 = s12 + s13
    t13 = s12 - s13
    t14 = -s14 + s15
    t15 = s14 + s15
    u9 = _half_btf(-cospi(16), t9, cospi(48), t14)
    u10 = _half_btf(-cospi(48), t10, -cospi(16), t13)
    u13 = _half_btf(-cospi(16), t10, cospi(48), t13)
    u14 = _half_btf(cospi(48), t9, cospi(16), t14)
    v8 = t8 + t11
    v9 = u9 + u10
    v10 = u9 - u10
    v11 = t8 - t11
    v12 = -t12 + t15
    v13 = -u13 + u14
    v14 = u13 + u14
    v15 = t12 + t15
    w10 = _half_btf(-cospi(32), v10, cospi(32), v13)
    w11 = _half_btf(-cospi(32), v11, cospi(32), v12)
    w12 = _half_btf(cospi(32), v11, cospi(32), v12)
    w13 = _half_btf(cospi(32), v10, cospi(32), v13)
    odd = [v15, v14, w13, w12, w11, w10, v9, v8]  # odd[k] pairs e[k]
    o = [e[..., i] + odd[i] for i in range(8)] + \
        [e[..., 7 - i] - odd[7 - i] for i in range(8)]
    return np.stack(o, axis=-1)


def idct32(x):
    e = idct16(x[..., 0::2])
    # odd inputs in butterfly order bf0[16..31]
    xo = [x[..., i] for i in (1, 17, 9, 25, 5, 21, 13, 29,
                              3, 19, 11, 27, 7, 23, 15, 31)]
    # stage 2: rotate pairs (bf0[16+k], bf0[31-k])
    angles = [(62, 2), (30, 34), (46, 18), (14, 50),
              (54, 10), (22, 42), (38, 26), (6, 58)]
    s = [None] * 16
    for k, (a1, a2) in enumerate(angles):
        lo, hi = xo[k], xo[15 - k]
        s[k] = _half_btf(cos128(a1), lo, -cos128(a2), hi)
        s[15 - k] = _half_btf(cos128(a2), lo, cos128(a1), hi)
    # stage: pairwise add/sub within groups of 2
    t = [None] * 16
    for i in range(0, 16, 4):
        t[i] = s[i] + s[i + 1]
        t[i + 1] = s[i] - s[i + 1]
        t[i + 2] = -s[i + 2] + s[i + 3]
        t[i + 3] = s[i + 2] + s[i + 3]
    u = list(t)
    u[1] = _half_btf(-cospi(8), t[1], cospi(56), t[14])
    u[2] = _half_btf(-cospi(56), t[2], -cospi(8), t[13])
    u[13] = _half_btf(-cospi(8), t[2], cospi(56), t[13])
    u[14] = _half_btf(cospi(56), t[1], cospi(8), t[14])
    u[5] = _half_btf(-cospi(40), t[5], cospi(24), t[10])
    u[6] = _half_btf(-cospi(24), t[6], -cospi(40), t[9])
    u[9] = _half_btf(-cospi(40), t[6], cospi(24), t[9])
    u[10] = _half_btf(cospi(24), t[5], cospi(40), t[10])
    v = [None] * 16
    for i in range(4):
        v[i] = u[i] + u[7 - i] if i < 4 else None
    v[0] = u[0] + u[3]
    v[1] = u[1] + u[2]
    v[2] = u[1] - u[2]
    v[3] = u[0] - u[3]
    v[4] = -u[4] + u[7]
    v[5] = -u[5] + u[6]
    v[6] = u[5] + u[6]
    v[7] = u[4] + u[7]
    v[8] = u[8] + u[11]
    v[9] = u[9] + u[10]
    v[10] = u[9] - u[10]
    v[11] = u[8] - u[11]
    v[12] = -u[12] + u[15]
    v[13] = -u[13] + u[14]
    v[14] = u[13] + u[14]
    v[15] = u[12] + u[15]
    w = list(v)
    w[2] = _half_btf(-cospi(16), v[2], cospi(48), v[13])
    w[3] = _half_btf(-cospi(16), v[3], cospi(48), v[12])
    w[12] = _half_btf(cospi(48), v[3], cospi(16), v[12])
    w[13] = _half_btf(cospi(48), v[2], cospi(16), v[13])
    w[4] = _half_btf(-cospi(48), v[4], -cospi(16), v[11])
    w[5] = _half_btf(-cospi(48), v[5], -cospi(16), v[10])
    w[10] = _half_btf(-cospi(16), v[5], cospi(48), v[10])
    w[11] = _half_btf(-cospi(16), v[4], cospi(48), v[11])
    y = [None] * 16
    y[0] = w[0] + w[7]
    y[1] = w[1] + w[6]
    y[2] = w[2] + w[5]
    y[3] = w[3] + w[4]
    y[4] = w[3] - w[4]
    y[5] = w[2] - w[5]
    y[6] = w[1] - w[6]
    y[7] = w[0] - w[7]
    y[8] = -w[8] + w[15]
    y[9] = -w[9] + w[14]
    y[10] = -w[10] + w[13]
    y[11] = -w[11] + w[12]
    y[12] = w[11] + w[12]
    y[13] = w[10] + w[13]
    y[14] = w[9] + w[14]
    y[15] = w[8] + w[15]
    z = list(y)
    for i in (4, 5, 6, 7):
        z[i] = _half_btf(-cospi(32), y[i], cospi(32), y[15 - i])
        z[15 - i] = _half_btf(cospi(32), y[i], cospi(32), y[15 - i])
    # out[i] = even[i] + odd[15-i]; out[16+i] = even[15-i] - odd[i]
    o = [e[..., i] + z[15 - i] for i in range(16)] + \
        [e[..., 15 - i] - z[i] for i in range(16)]
    return np.stack(o, axis=-1)


def iadst4(x):
    x0, x1, x2, x3 = (x[..., i] for i in range(4))
    s0 = SINPI[1] * x0
    s1 = SINPI[2] * x0
    s2 = SINPI[3] * x1
    s3 = SINPI[4] * x2
    s4 = SINPI[1] * x2
    s5 = SINPI[2] * x3
    s6 = SINPI[4] * x3
    a7 = x0 - x2
    b7 = a7 + x3
    s0 = s0 + s3
    s1 = s1 - s4
    s3b = s2
    s2 = SINPI[3] * b7
    s0 = s0 + s5
    s1 = s1 - s6
    o0 = s0 + s3b
    o1 = s1 + s3b
    o2 = s2
    o3 = s0 + s1 - s3b
    return np.stack([round2(o, 12) for o in (o0, o1, o2, o3)], axis=-1)


def iadst8(x):
    b = [x[..., 7], x[..., 0], x[..., 5], x[..., 2],
         x[..., 3], x[..., 4], x[..., 1], x[..., 6]]
    s = [
        _half_btf(cospi(4), b[0], cospi(60), b[1]),
        _half_btf(cospi(60), b[0], -cospi(4), b[1]),
        _half_btf(cospi(20), b[2], cospi(44), b[3]),
        _half_btf(cospi(44), b[2], -cospi(20), b[3]),
        _half_btf(cospi(36), b[4], cospi(28), b[5]),
        _half_btf(cospi(28), b[4], -cospi(36), b[5]),
        _half_btf(cospi(52), b[6], cospi(12), b[7]),
        _half_btf(cospi(12), b[6], -cospi(52), b[7]),
    ]
    t = [s[0] + s[4], s[1] + s[5], s[2] + s[6], s[3] + s[7],
         s[0] - s[4], s[1] - s[5], s[2] - s[6], s[3] - s[7]]
    u = t[:4] + [
        _half_btf(cospi(16), t[4], cospi(48), t[5]),
        _half_btf(cospi(48), t[4], -cospi(16), t[5]),
        _half_btf(-cospi(48), t[6], cospi(16), t[7]),
        _half_btf(cospi(16), t[6], cospi(48), t[7]),
    ]
    v = [u[0] + u[2], u[1] + u[3], u[0] - u[2], u[1] - u[3],
         u[4] + u[6], u[5] + u[7], u[4] - u[6], u[5] - u[7]]
    w = [v[0], v[1],
         _half_btf(cospi(32), v[2], cospi(32), v[3]),
         _half_btf(cospi(32), v[2], -cospi(32), v[3]),
         v[4], v[5],
         _half_btf(cospi(32), v[6], cospi(32), v[7]),
         _half_btf(cospi(32), v[6], -cospi(32), v[7])]
    return np.stack([w[0], -w[4], w[6], -w[2], w[3], -w[7], w[5], -w[1]],
                    axis=-1)


def iadst16(x):
    b = [x[..., 15], x[..., 0], x[..., 13], x[..., 2],
         x[..., 11], x[..., 4], x[..., 9], x[..., 6],
         x[..., 7], x[..., 8], x[..., 5], x[..., 10],
         x[..., 3], x[..., 12], x[..., 1], x[..., 14]]
    ang = [2, 10, 18, 26, 34, 42, 50, 58]
    s = [None] * 16
    for i in range(8):
        a = ang[i]
        s[2 * i] = _half_btf(cos128(a), b[2 * i], cos128(64 - a), b[2 * i + 1])
        s[2 * i + 1] = _half_btf(cos128(64 - a), b[2 * i], -cos128(a), b[2 * i + 1])
    t = [s[i] + s[i + 8] for i in range(8)] + \
        [s[i] - s[i + 8] for i in range(8)]
    u = t[:8] + [
        _half_btf(cospi(8), t[8], cospi(56), t[9]),
        _half_btf(cospi(56), t[8], -cospi(8), t[9]),
        _half_btf(cospi(40), t[10], cospi(24), t[11]),
        _half_btf(cospi(24), t[10], -cospi(40), t[11]),
        _half_btf(-cospi(56), t[12], cospi(8), t[13]),
        _half_btf(cospi(8), t[12], cospi(56), t[13]),
        _half_btf(-cospi(24), t[14], cospi(40), t[15]),
        _half_btf(cospi(40), t[14], cospi(24), t[15]),
    ]
    v = [u[i] + u[i + 4] for i in range(4)] + \
        [u[i] - u[i + 4] for i in range(4)] + \
        [u[8 + i] + u[12 + i] for i in range(4)] + \
        [u[8 + i] - u[12 + i] for i in range(4)]
    w = v[:4] + [
        _half_btf(cospi(16), v[4], cospi(48), v[5]),
        _half_btf(cospi(48), v[4], -cospi(16), v[5]),
        _half_btf(-cospi(48), v[6], cospi(16), v[7]),
        _half_btf(cospi(16), v[6], cospi(48), v[7]),
    ] + v[8:12] + [
        _half_btf(cospi(16), v[12], cospi(48), v[13]),
        _half_btf(cospi(48), v[12], -cospi(16), v[13]),
        _half_btf(-cospi(48), v[14], cospi(16), v[15]),
        _half_btf(cospi(16), v[14], cospi(48), v[15]),
    ]
    y = [w[0] + w[2], w[1] + w[3], w[0] - w[2], w[1] - w[3],
         w[4] + w[6], w[5] + w[7], w[4] - w[6], w[5] - w[7],
         w[8] + w[10], w[9] + w[11], w[8] - w[10], w[9] - w[11],
         w[12] + w[14], w[13] + w[15], w[12] - w[14], w[13] - w[15]]
    z = list(y)
    for i in (2, 6, 10, 14):
        z[i] = _half_btf(cospi(32), y[i], cospi(32), y[i + 1])
        z[i + 1] = _half_btf(cospi(32), y[i], -cospi(32), y[i + 1])
    return np.stack(
        [z[0], -z[8], z[12], -z[4], z[6], -z[14], z[10], -z[2],
         z[3], -z[11], z[15], -z[7], z[5], -z[13], z[9], -z[1]],
        axis=-1,
    )


def iidentity(x, n: int):
    if n == 4:
        return round2(x * 5793, 12)
    if n == 8:
        return x * 2
    if n == 16:
        return round2(x * 2 * 5793, 12)
    if n == 32:
        return x * 4
    raise ValueError(n)


_IDCT = {4: idct4, 8: idct8, 16: idct16, 32: idct32}
_IADST = {4: iadst4, 8: iadst8, 16: iadst16}

# (vertical, horizontal) 1D kinds per tx type; kinds: d=dct a=adst f=flipadst
# i=identity
_TX_KIND = {
    DCT_DCT: ("d", "d"), ADST_DCT: ("a", "d"), DCT_ADST: ("d", "a"),
    ADST_ADST: ("a", "a"), FLIPADST_DCT: ("f", "d"), DCT_FLIPADST: ("d", "f"),
    FLIPADST_FLIPADST: ("f", "f"), ADST_FLIPADST: ("a", "f"),
    FLIPADST_ADST: ("f", "a"), IDTX: ("i", "i"), V_DCT: ("d", "i"),
    H_DCT: ("i", "d"), V_ADST: ("a", "i"), H_ADST: ("i", "a"),
    V_FLIPADST: ("f", "i"), H_FLIPADST: ("i", "f"),
}

# (row_shift, col_shift) after the respective 1D passes (libaom inv_shift)
_INV_SHIFT = {
    (4, 4): (0, 4), (8, 8): (1, 4), (16, 16): (2, 4), (32, 32): (2, 4),
    (64, 64): (2, 4), (4, 8): (0, 4), (8, 4): (0, 4), (8, 16): (1, 4),
    (16, 8): (1, 4), (16, 32): (1, 4), (32, 16): (1, 4), (32, 64): (1, 4),
    (64, 32): (1, 4), (4, 16): (1, 4), (16, 4): (1, 4), (8, 32): (2, 4),
    (32, 8): (2, 4), (16, 64): (2, 4), (64, 16): (2, 4),
}


def _apply_1d(kind: str, vec, n: int):
    if kind == "d":
        if n == 64:
            return idct64(vec)
        return _IDCT[n](vec)
    if kind in ("a", "f"):
        out = _IADST[n](vec)
        return out
    if kind == "i":
        return iidentity(vec, n)
    raise ValueError(kind)


def _brev(v: int, bits: int) -> int:
    out = 0
    for _ in range(bits):
        out = (out << 1) | (v & 1)
        v >>= 1
    return out


def _idct_odd(x, n: int):
    """Odd half of the recursive inverse DCT: consumes the N odd-indexed
    inputs of a 2N-point transform, returns z[0..N-1] such that
    out[i] = even[i] + z[N-1-i], out[N+i] = even[N-1-i] - z[i].

    The butterfly network is the generalization of the explicit idct8/16/32
    ladders above (validated to reproduce them value-for-value); idct64 is
    the same recursion one doubling further."""
    m = n  # odd-part length
    bits = int(np.log2(m))
    # stage 1: bit-reversed odd input selection
    a = [x[..., 2 * _brev(k, bits) + 1] for k in range(m)]
    # stage 2: input rotations, pairs (k, m-1-k), angle 2*brev+1 scaled
    s = [None] * m
    for k in range(m // 2):
        a2 = (32 // m) * (2 * _brev(k, bits) + 1)
        lo, hi = a[k], a[m - 1 - k]
        s[k] = _half_btf(cos128(64 - a2), lo, -cos128(a2), hi)
        s[m - 1 - k] = _half_btf(cos128(a2), lo, cos128(64 - a2), hi)
    a = s
    # alternating butterfly / rotation stages, group size doubling
    g = 4
    while g <= m:
        h = g // 2
        b = [None] * m
        for base in range(0, m, g):
            for i in range(h // 2):
                lo, hi = a[base + i], a[base + h - 1 - i]
                b[base + i] = lo + hi
                b[base + h - 1 - i] = lo - hi
                lo2, hi2 = a[base + h + i], a[base + g - 1 - i]
                b[base + h + i] = -lo2 + hi2
                b[base + g - 1 - i] = lo2 + hi2
        a = b
        c = list(a)
        if g == m:  # final rotation, all angle 32
            for i in range(m // 4, m // 2):
                lo, hi = a[i], a[m - 1 - i]
                c[i] = _half_btf(-cospi(32), lo, cospi(32), hi)
                c[m - 1 - i] = _half_btf(cospi(32), lo, cospi(32), hi)
        else:
            a_base = 32 * g // m
            blk_bits = bits - int(np.log2(2 * g)) + 1
            for i in range(m // 2):
                r = i % g
                j = i // g
                aa = a_base * (2 * _brev(j, blk_bits) + 1)
                bb = 64 - aa
                lo, hi = a[i], a[m - 1 - i]
                if g // 4 <= r < g // 2:       # role 1
                    c[i] = _half_btf(-cospi(aa), lo, cospi(bb), hi)
                    c[m - 1 - i] = _half_btf(cospi(bb), lo, cospi(aa), hi)
                elif g // 2 <= r < 3 * g // 4:  # role 2
                    c[i] = _half_btf(-cospi(bb), lo, -cospi(aa), hi)
                    c[m - 1 - i] = _half_btf(-cospi(aa), lo, cospi(bb), hi)
        a = c
        g *= 2
    return a


def idct_generic(x, size: int):
    """Recursive inverse DCT via the generic odd ladder (any power of 2)."""
    if size == 4:
        return idct4(x)
    half = size // 2
    e = {4: idct4, 8: idct8, 16: idct16, 32: idct32}.get(half)
    e = e(x[..., 0::2]) if e else idct_generic(x[..., 0::2], half)
    z = _idct_odd(x, half)
    o = [e[..., i] + z[half - 1 - i] for i in range(half)] + \
        [e[..., half - 1 - i] - z[i] for i in range(half)]
    return np.stack(o, axis=-1)


def idct64(x):
    return idct_generic(x, 64)


def inverse_transform_2d(coefs: np.ndarray, tx_type: int) -> np.ndarray:
    """Normative 2D inverse transform.  coefs: (h, w) dequantized values
    (full-size array; for 64-wide/high transforms only the top-left 32x32 may
    be nonzero).  Returns residual (h, w) int64."""
    h, w = coefs.shape
    vk, hk = _TX_KIND[tx_type]
    row_shift, col_shift = _INV_SHIFT[(w, h)]
    t = coefs.astype(np.int64)
    if abs(int(np.log2(w)) - int(np.log2(h))) == 1:
        t = round2(t * 2896, 12)
    # row transforms (horizontal pass), vectorized over rows
    t = _apply_1d(hk, t, w)
    t = round2(t, row_shift)
    # column transforms (vertical pass)
    t = _apply_1d(vk, t.swapaxes(-1, -2), h).swapaxes(-1, -2)
    t = round2(t, col_shift)
    # flips
    if vk == "f":
        t = t[::-1, :]
    if hk == "f":
        t = t[:, ::-1]
    return t


@functools.cache
def _inverse_matrix(w: int, h: int, tx_type: int) -> np.ndarray:
    """Linearized inverse as a (h*w, h*w) float matrix (columns = responses
    to unit coefficients, amplitude-normalized)."""
    n = h * w
    amp = 1 << 10
    m = np.zeros((n, n))
    eye = np.zeros((h, w), dtype=np.int64)
    for k in range(n):
        eye.flat[k] = amp
        m[:, k] = inverse_transform_2d(eye, tx_type).astype(np.float64).ravel() / amp
        eye.flat[k] = 0
    return m


@functools.cache
def _forward_matrix(w: int, h: int, tx_type: int) -> np.ndarray:
    return np.linalg.pinv(_inverse_matrix(w, h, tx_type))


def forward_transform_2d(residual: np.ndarray, tx_type: int) -> np.ndarray:
    """Encoder forward transform: coefficients c such that the normative
    inverse reproduces `residual` as closely as possible (before quantization).
    residual: (h, w) int; returns (h, w) float64 coefficients."""
    h, w = residual.shape
    m = _forward_matrix(w, h, tx_type)
    return (m @ residual.astype(np.float64).ravel()).reshape(h, w)
