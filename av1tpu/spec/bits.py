"""Bit-level primitives for AV1 uncompressed syntax (spec section 4/5.3).

Headers (everything outside tile data) are plain big-endian bit strings —
only tile payloads use the range coder (av1tpu.spec.entropy).
"""

from __future__ import annotations

__all__ = ["BitReader", "BitWriter", "read_leb128", "write_leb128"]


class BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def f(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def su(self, n: int) -> int:
        """Signed integer: n bits magnitude+sign (spec su(1+n) convention is
        handled by callers passing total bit count)."""
        v = self.f(n)
        sign_mask = 1 << (n - 1)
        if v & sign_mask:
            v -= 2 * sign_mask
        return v

    def uvlc(self) -> int:
        lz = 0
        while self.f(1) == 0:
            lz += 1
            if lz >= 32:
                return (1 << 32) - 1
        return self.f(lz) + (1 << lz) - 1

    def ns(self, n: int) -> int:
        """Non-symmetric unsigned with max n (spec ns(n))."""
        w = n.bit_length()
        m = (1 << w) - n
        v = self.f(w - 1)
        if v < m:
            return v
        extra = self.f(1)
        return (v << 1) - m + extra

    def le(self, n: int) -> int:
        """n-byte little-endian (must be byte aligned)."""
        assert self.pos % 8 == 0
        v = 0
        for i in range(n):
            v |= self.data[self.pos >> 3] << (8 * i)
            self.pos += 8
        return v

    def leb128(self) -> int:
        assert self.pos % 8 == 0
        v = 0
        for i in range(8):
            b = self.data[self.pos >> 3]
            self.pos += 8
            v |= (b & 0x7F) << (7 * i)
            if not (b & 0x80):
                break
        return v

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def f(self, v: int, n: int) -> "BitWriter":
        assert 0 <= v < (1 << n), (v, n)
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def su(self, v: int, n: int) -> "BitWriter":
        sign_mask = 1 << (n - 1)
        if v < 0:
            v += 2 * sign_mask
        return self.f(v, n)

    def uvlc(self, v: int) -> "BitWriter":
        lz = (v + 1).bit_length() - 1
        self.f(0, lz)  # leading zeros
        self.f(1, 1)
        if lz:
            self.f(v - ((1 << lz) - 1), lz)
        return self

    def ns(self, v: int, n: int) -> "BitWriter":
        w = n.bit_length()
        m = (1 << w) - n
        if v < m:
            return self.f(v, w - 1)
        x = v + m
        return self.f(x >> 1, w - 1).f(x & 1, 1)

    def byte_align(self) -> "BitWriter":
        while len(self.bits) % 8:
            self.bits.append(0)
        return self

    def trailing_bits(self) -> "BitWriter":
        """spec trailing_bits(): a 1 then zeros to byte alignment."""
        self.bits.append(1)
        return self.byte_align()

    def tell_bits(self) -> int:
        return len(self.bits)

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0, "call byte_align()/trailing_bits()"
        out = bytearray(len(self.bits) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (7 - (i & 7))
        return bytes(out)


def read_leb128(data: bytes, pos: int) -> tuple[int, int]:
    """Returns (value, new_pos) reading from byte offset pos."""
    v = 0
    for i in range(8):
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << (7 * i)
        if not (b & 0x80):
            break
    return v, pos


def write_leb128(v: int, min_bytes: int = 1) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v or len(out) + 1 < min_bytes:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    return bytes(out)
