"""Call dav1d's internal msac decoder directly (ground-truth EC oracle).

libdav1d.so exports no internal symbols, but the C fallback implementations
of the symbol decoder are at stable offsets in this system build (located by
disassembly signature: the EC_MIN_PROB ladder table at .rodata 0x15b020).
We dlopen the library, compute absolute addresses from /proc/self/maps, and
call the functions with a hand-built MsacContext.  Used by tests to verify
our range coder byte-for-byte against dav1d.

MsacContext layout (from disassembly):
  0x00 buf_pos (u8*), 0x08 buf_end (u8*), 0x10 dif (u64),
  0x18 rng (u32), 0x1c cnt (i32), 0x20 allow_update_cdf (u32)
"""

import ctypes

LIB = "/usr/lib/x86_64-linux-gnu/libdav1d.so.6"

# function offsets (this build; validated behaviorally in tests)
OFF_SYMBOL_ADAPT4 = 0x12160   # n_symbols <= 3 (SSE c-equivalent)
OFF_SYMBOL_ADAPT16 = 0x122B0  # up to 16


class Msac(ctypes.Structure):
    _fields_ = [
        ("buf_pos", ctypes.c_void_p),
        ("buf_end", ctypes.c_void_p),
        ("dif", ctypes.c_uint64),
        ("rng", ctypes.c_uint32),
        ("cnt", ctypes.c_int32),
        ("allow_update_cdf", ctypes.c_uint32),
    ]


_lib = ctypes.CDLL(LIB)


def _base_address():
    with open("/proc/self/maps") as f:
        for line in f:
            if "libdav1d" in line and "r-xp" in line:
                lo = int(line.split("-")[0], 16)
                # x segment may not start at file offset 0; use the first
                # mapping of the file instead
        for line in open("/proc/self/maps"):
            if "libdav1d" in line:
                return int(line.split("-")[0], 16)
    raise RuntimeError("libdav1d not mapped")


_BASE = _base_address()
_FN = ctypes.CFUNCTYPE(
    ctypes.c_uint, ctypes.POINTER(Msac), ctypes.POINTER(ctypes.c_uint16),
    ctypes.c_size_t,
)
symbol_adapt4 = _FN(_BASE + OFF_SYMBOL_ADAPT4)
symbol_adapt16 = _FN(_BASE + OFF_SYMBOL_ADAPT16)


class Dav1dDecoder:
    """Mirror of MY Decoder API, backed by dav1d's machine code."""

    def __init__(self, data: bytes, allow_update: bool = True):
        self.buf = ctypes.create_string_buffer(data, len(data))
        self.ctx = Msac()
        addr = ctypes.addressof(self.buf)
        self.ctx.buf_pos = addr
        self.ctx.buf_end = addr + len(data)
        self.ctx.dif = (1 << 63) - 1
        self.ctx.rng = 0x8000
        self.ctx.cnt = -15
        self.ctx.allow_update_cdf = 1 if allow_update else 0
        self._refill()

    def _refill(self):
        c = 64 - self.ctx.cnt - 24
        dif = self.ctx.dif
        pos = self.ctx.buf_pos
        end = self.ctx.buf_end
        while c >= 0 and pos < end:
            b = ctypes.cast(pos, ctypes.POINTER(ctypes.c_ubyte))[0]
            dif ^= b << c
            c -= 8
            pos += 1
        self.ctx.cnt = 64 - c - 24
        self.ctx.dif = dif
        self.ctx.buf_pos = pos

    def decode_symbol(self, icdf) -> int:
        """icdf: inverted cdf WITHOUT trailing count (terminal 0 included)."""
        n = len(icdf)  # number of symbols
        arr = (ctypes.c_uint16 * (n + 1))()
        for i, v in enumerate(icdf):
            arr[i] = v
        # dav1d layout: n-1 values + count slot; our icdf has terminal 0 at
        # index n-1 which doubles as the count (0)
        fn = symbol_adapt4 if n <= 4 else symbol_adapt16
        s = fn(ctypes.byref(self.ctx), arr, n - 1)
        new = [arr[i] for i in range(n)]
        return s, new

    @property
    def state(self):
        return (self.ctx.dif, self.ctx.rng, self.ctx.cnt)
