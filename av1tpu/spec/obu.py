"""OBU framing (spec section 5.3) and IVF container helpers."""

from __future__ import annotations

import dataclasses
import struct

from .bits import read_leb128, write_leb128

OBU_SEQUENCE_HEADER = 1
OBU_TEMPORAL_DELIMITER = 2
OBU_FRAME_HEADER = 3
OBU_TILE_GROUP = 4
OBU_METADATA = 5
OBU_FRAME = 6
OBU_REDUNDANT_FRAME_HEADER = 7
OBU_TILE_LIST = 8
OBU_PADDING = 15


@dataclasses.dataclass
class Obu:
    type: int
    payload: bytes
    temporal_id: int = 0
    spatial_id: int = 0


def parse_obus(data: bytes) -> list[Obu]:
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        b0 = data[pos]
        assert (b0 & 0x80) == 0, "obu_forbidden_bit set"
        otype = (b0 >> 3) & 0xF
        ext = (b0 >> 2) & 1
        has_size = (b0 >> 1) & 1
        pos += 1
        tid = sid = 0
        if ext:
            tid = data[pos] >> 5
            sid = (data[pos] >> 3) & 3
            pos += 1
        if has_size:
            size, pos = read_leb128(data, pos)
        else:
            size = n - pos
        out.append(Obu(otype, data[pos : pos + size], tid, sid))
        pos += size
    return out


def build_obu(otype: int, payload: bytes) -> bytes:
    header = bytes([(otype << 3) | 0x02])  # has_size_field=1, no extension
    return header + write_leb128(len(payload)) + payload


def temporal_delimiter() -> bytes:
    return build_obu(OBU_TEMPORAL_DELIMITER, b"")


# ---------------------------------------------------------------------------
# IVF container (what av1_tool and the system tools exchange)
# ---------------------------------------------------------------------------


def write_ivf(path: str, frames: list[bytes], width: int, height: int,
              fps_num: int = 30, fps_den: int = 1) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack(
            "<4sHH4sHHIII4x", b"DKIF", 0, 32, b"AV01",
            width, height, fps_num, fps_den, len(frames),
        ))
        for i, data in enumerate(frames):
            f.write(struct.pack("<IQ", len(data), i))
            f.write(data)


def read_ivf(path: str) -> tuple[dict, list[bytes]]:
    with open(path, "rb") as f:
        hdr = f.read(32)
        magic, ver, hdrlen, fourcc, w, h, num, den, nframes = struct.unpack(
            "<4sHH4sHHIII4x", hdr
        )
        assert magic == b"DKIF", "not an IVF file"
        frames = []
        while True:
            fh = f.read(12)
            if len(fh) < 12:
                break
            size, _pts = struct.unpack("<IQ", fh)
            frames.append(f.read(size))
    info = {"fourcc": fourcc.decode(), "width": w, "height": h,
            "fps_num": num, "fps_den": den}
    return info, frames
