"""AV1 multi-symbol range coder (the daala entropy coder), spec-exact.

Decoder follows the normative process (AV1 spec section 8.2: init_symbol /
decode_symbol / CDF adaptation).  The encoder is derived from the decoder's
arithmetic: it tracks the same (low, range) interval refinement with an
arbitrary-precision ``low`` and at ``done()`` emits the (nearly) shortest bit
string whose decoder trajectory reproduces the encoded symbols.  Correctness
is therefore reducible to decoder correctness, which is validated by decoding
real libaom/SVT-AV1 bitstreams (tests/test_entropy.py, tools/).

CDFs use the inverted (aom "iCDF") convention throughout: ``icdf[k]`` is
32768 minus the cumulative probability of symbols <= k, so arrays are
strictly decreasing and end with 0.  An adaptation counter is kept separately.

This is the reference implementation; the production entropy coder is C++
(native/coding) and must match this bit-for-bit.
"""

from __future__ import annotations

__all__ = [
    "EC_PROB_SHIFT",
    "EC_MIN_PROB",
    "Decoder",
    "Encoder",
    "update_cdf",
    "cdf_from_probs",
]

EC_PROB_SHIFT = 6
EC_MIN_PROB = 4
PROB_TOP = 1 << 15


def _floor_log2(x: int) -> int:
    return x.bit_length() - 1


def _cut(rng: int, f: int, remaining: int) -> int:
    """Interval cut point for an (inverted) cdf value ``f`` when ``remaining``
    symbols lie above it (spec decode_symbol inner expression)."""
    return (
        ((rng >> 8) * (f >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)
    ) + EC_MIN_PROB * remaining


class Decoder:
    """Normative symbol decoder over a byte buffer."""

    def __init__(self, data: bytes):
        self.data = data
        self.nbits_total = len(data) * 8
        num_bits = min(self.nbits_total, 15)
        buf = 0
        self._bitpos = 0
        for _ in range(num_bits):
            buf = (buf << 1) | self._read_bit_raw()
        padded = buf << (15 - num_bits)
        self.val = (PROB_TOP - 1) ^ padded
        self.rng = PROB_TOP

    def _read_bit_raw(self) -> int:
        p = self._bitpos
        if p >= self.nbits_total:
            self._bitpos += 1
            return 0
        self._bitpos += 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def _renorm(self) -> None:
        while self.rng < PROB_TOP:
            self.rng <<= 1
            self.val = ((self.val << 1) | (self._read_bit_raw() ^ 1)) & 0xFFFF

    def decode_symbol(self, icdf) -> int:
        """Decode one symbol with inverted cdf ``icdf`` (len N, icdf[N-1]==0).

        Does NOT adapt the cdf; callers use ``update_cdf`` when the frame has
        CDF updates enabled.
        """
        n = len(icdf)
        cur = self.rng
        s = -1
        while True:
            s += 1
            prev = cur
            cur = _cut(self.rng, int(icdf[s]), n - 1 - s)
            if self.val >= cur:
                break
        self.rng = prev - cur
        self.val -= cur
        self._renorm()
        return s

    def decode_bool(self, f_inv: int = PROB_TOP // 2) -> int:
        """Decode a boolean with inverted probability ``f_inv`` of being 1
        (f_inv = 32768 - 64*p(zero_region)...); default is equiprobable.
        Equivalent to decode_symbol([f_inv, 0])."""
        return self.decode_symbol((f_inv, 0))

    def decode_literal(self, n: int) -> int:
        """n-bit literal, MSB first, each bit equiprobable (spec L(n))."""
        x = 0
        for _ in range(n):
            x = (x << 1) | self.decode_bool()
        return x

    def tell_bits_consumed(self) -> int:
        """Bits of input consumed so far (includes the 15-bit preload)."""
        return self._bitpos


class Encoder:
    """Range encoder producing bitstreams for :class:`Decoder`.

    Maintains ``low`` as an arbitrary-precision integer (no carry handling
    needed) and mirrors the decoder's interval arithmetic exactly.  Suitable
    as a reference/test encoder; the C++ production coder matches its output
    semantics (any byte string it emits decodes identically).
    """

    def __init__(self):
        self.low = 0
        self.rng = PROB_TOP
        self.nbits = 15  # decoder preloads 15 bits

    def encode_symbol(self, s: int, icdf) -> None:
        # The decoder's val is an inverted quantity: symbol s is decoded when
        # cut(icdf[s]) <= val < cut(icdf[s-1]) (cut of the previous symbol, or
        # rng for s == 0), and val is reduced by cut(icdf[s]).  Mirror that:
        # low accumulates the subtracted cuts, rng becomes the interval width.
        n = len(icdf)
        r = self.rng
        v = _cut(r, int(icdf[s]), n - 1 - s)
        u = _cut(r, int(icdf[s - 1]), n - s) if s > 0 else r
        self.low += v
        self.rng = u - v
        while self.rng < PROB_TOP:
            self.rng <<= 1
            self.low <<= 1
            self.nbits += 1

    def encode_bool(self, b: int, f_inv: int = PROB_TOP // 2) -> None:
        self.encode_symbol(int(b), (f_inv, 0))

    def encode_literal(self, x: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.encode_bool((x >> i) & 1)

    def done(self) -> bytes:
        """Finalize with the canonical daala terminator (od_ec_enc_done).

        In stream space the valid encodings form the interval
        [low_d, low_d + rng) where low_d = 2^n - low - rng (our ``low``
        accumulates bottom-edge cuts in value space; the stream value is its
        complement).  The normative terminator rounds low_d up to the next
        odd multiple of 2^14 (a 1 "marker" bit followed by zeros) and emits
        everything above the low 14 bits; conforming decoders (libaom)
        verify this exact padding form.
        """
        n = self.nbits
        low_d = (1 << n) - self.low - self.rng
        assert low_d >= 0
        m = (1 << 14) - 1
        e = ((low_d + m) & ~m) | (m + 1)
        nbits_out = n - 14
        b = e >> 14
        nbytes = max((nbits_out + 7) // 8, 1)
        return int(b << (nbytes * 8 - nbits_out)).to_bytes(nbytes, "big")


def update_cdf(icdf, count: int, symbol: int) -> int:
    """Adapt an inverted cdf in place after coding ``symbol``; returns the new
    adaptation count.  Mirrors the normative update (spec 8.2.? / libaom
    update_cdf): rate = 3 + (cnt>15) + (cnt>31) + min(floor_log2(N), 2)."""
    n = len(icdf)
    rate = 3 + (count > 15) + (count > 31) + min(_floor_log2(n), 2)
    tmp = PROB_TOP
    for i in range(n - 1):
        if i == symbol:
            tmp = 0
        c = int(icdf[i])
        if tmp < c:
            icdf[i] = c - ((c - tmp) >> rate)
        else:
            icdf[i] = c + ((tmp - c) >> rate)
    return count + (count < 32)


def cdf_from_probs(probs) -> list[int]:
    """Build an inverted cdf from (approximate) symbol probabilities, for
    tests and for rate-estimation tables."""
    total = float(sum(probs))
    acc = 0.0
    out = []
    for p in probs[:-1]:
        acc += p / total
        v = PROB_TOP - int(round(acc * PROB_TOP))
        v = max(v, EC_MIN_PROB * (len(probs) - 1 - len(out)))
        out.append(min(v, PROB_TOP - 1))
    out.append(0)
    # enforce strict decrease
    for i in range(len(out) - 2, -1, -1):
        if out[i] <= out[i + 1]:
            out[i] = out[i + 1] + 1
    return out
