"""Scan codec shared libraries for AV1 spec constant tables.

The AV1 spec mandates large constant tables (quantizer lookups, default CDFs,
scan orders, filter taps).  They are data, not code; any conforming
implementation embeds identical values.  We recover them from the system
libraries' read-only data sections (libaom.so, libdav1d.so) by structural
signature matching, and cross-confirm every candidate by requiring the same
values in BOTH independent implementations.  Final acceptance is behavioral:
streams decoded with the extracted tables must match the system decoders
bit-exactly (see av1tpu/spec and tests).
"""

from __future__ import annotations

import numpy as np
from elftools.elf.elffile import ELFFile

LIBAOM = "/usr/lib/x86_64-linux-gnu/libaom.so.3"
LIBDAV1D = "/usr/lib/x86_64-linux-gnu/libdav1d.so.6"


def load_rodata_u16(path: str) -> dict[str, np.ndarray]:
    """Return {section_name: uint16 little-endian view} for data sections."""
    out = {}
    with open(path, "rb") as f:
        elf = ELFFile(f)
        for name in (".rodata", ".data.rel.ro", ".data"):
            sec = elf.get_section_by_name(name)
            if sec is None:
                continue
            raw = sec.data()
            if len(raw) % 2:
                raw = raw[:-1]
            out[name] = np.frombuffer(raw, dtype="<u2")
    return out


def find_monotone_u16(
    arr: np.ndarray,
    length: int,
    nondecreasing: bool = True,
    first_max: int | None = None,
    last_min: int | None = None,
) -> list[int]:
    """Offsets (in u16 units) of monotone runs of exactly `length` values."""
    a = arr.astype(np.int32)
    d = np.diff(a)
    ok = d >= 0 if nondecreasing else d <= 0
    # run[i] true if a[i:i+length] monotone
    # cumulative trick: count of ok in window == length-1
    c = np.concatenate([[0], np.cumsum(ok)])
    win = c[length - 1 :] - c[: len(c) - length + 1]
    cand = np.nonzero(win == length - 1)[0]
    res = []
    for i in cand:
        if first_max is not None and a[i] > first_max:
            continue
        if last_min is not None and a[i + length - 1] < last_min:
            continue
        res.append(int(i))
    return res


def values_at(arr: np.ndarray, off: int, length: int) -> np.ndarray:
    return arr[off : off + length].copy()


def cross_confirm(
    cands_a: list[np.ndarray], cands_b: list[np.ndarray]
) -> list[np.ndarray]:
    """Arrays (by value) present in both candidate lists, deduplicated."""
    seen_b = {a.tobytes() for a in cands_b}
    out, seen = [], set()
    for a in cands_a:
        k = a.tobytes()
        if k in seen_b and k not in seen:
            seen.add(k)
            out.append(a)
    return out


def iter_cdf_runs(arr: np.ndarray, min_arity: int = 2, max_arity: int = 16):
    """Yield (offset, values) for candidate single CDFs: strictly decreasing
    uint16 sequences, all < 32768, terminated by a 0.

    The yielded values exclude the trailing zero; arity = len(values) + 1
    (the final symbol's cdf entry is the 0).
    """
    a = arr
    n = len(a)
    i = 0
    while i < n:
        if a[i] == 0 or a[i] >= 32768:
            i += 1
            continue
        j = i
        while j + 1 < n and 0 < a[j + 1] < a[j]:
            j += 1
        # run a[i..j] strictly decreasing nonzero; check terminator
        if j + 1 < n and a[j + 1] == 0:
            ln = j - i + 1
            if min_arity - 1 <= ln <= max_arity - 1:
                yield i, a[i : j + 2].copy()
        i = j + 1
    return
