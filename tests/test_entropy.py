"""Round-trip property tests for the spec range coder.

Decoder-vs-spec exactness is additionally validated by decoding real
libaom/SVT bitstreams (see tools/ and later test modules); these tests pin
encoder<->decoder consistency over randomized symbol streams.
"""

import random

import pytest

from av1tpu.spec.entropy import (
    Decoder,
    Encoder,
    cdf_from_probs,
    update_cdf,
)


def _random_icdf(rng, n):
    probs = [rng.uniform(0.01, 1.0) for _ in range(n)]
    return cdf_from_probs(probs)


@pytest.mark.parametrize("seed", range(8))
def test_roundtrip_symbols(seed):
    rng = random.Random(seed)
    num = rng.randint(1, 400)
    events = []
    for _ in range(num):
        kind = rng.random()
        if kind < 0.5:
            n = rng.randint(2, 16)
            icdf = _random_icdf(rng, n)
            s = rng.randrange(n)
            events.append(("sym", tuple(icdf), s))
        elif kind < 0.8:
            events.append(("bool", rng.randint(0, 1)))
        else:
            bits = rng.randint(1, 12)
            events.append(("lit", bits, rng.getrandbits(bits)))

    enc = Encoder()
    for ev in events:
        if ev[0] == "sym":
            enc.encode_symbol(ev[2], ev[1])
        elif ev[0] == "bool":
            enc.encode_bool(ev[1])
        else:
            enc.encode_literal(ev[2], ev[1])
    data = enc.done()

    dec = Decoder(data)
    for ev in events:
        if ev[0] == "sym":
            assert dec.decode_symbol(ev[1]) == ev[2]
        elif ev[0] == "bool":
            assert dec.decode_bool() == ev[1]
        else:
            assert dec.decode_literal(ev[1]) == ev[2]


def test_roundtrip_with_adaptation():
    rng = random.Random(42)
    icdf_enc = cdf_from_probs([0.5, 0.2, 0.2, 0.1])
    icdf_dec = list(icdf_enc)
    syms = [rng.randrange(4) for _ in range(300)]

    enc = Encoder()
    cnt = 0
    work = list(icdf_enc)
    for s in syms:
        enc.encode_symbol(s, work)
        cnt = update_cdf(work, cnt, s)
    data = enc.done()

    dec = Decoder(data)
    cnt = 0
    for s in syms:
        assert dec.decode_symbol(icdf_dec) == s
        cnt = update_cdf(icdf_dec, cnt, s)
    assert icdf_dec == work


def test_empty_and_single():
    enc = Encoder()
    enc.encode_bool(1)
    data = enc.done()
    assert len(data) >= 1
    assert Decoder(data).decode_bool() == 1
