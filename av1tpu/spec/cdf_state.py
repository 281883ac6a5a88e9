"""Per-tile adaptive CDF state and symmetric symbol coders.

``CdfState`` materializes every default CDF table (av1tpu.spec.tables) as a
mutable [values..., count] list so both encoder and decoder adapt identically
(spec: CDFs reset to defaults at keyframes, adapt per symbol unless
disable_cdf_update).

``DecCoder``/``EncCoder`` expose the same interface so tile syntax is written
once and driven in either direction (see tile.py).
"""

from __future__ import annotations

import numpy as np

from . import tables
from .entropy import Decoder, Encoder, update_cdf


class Cdf:
    __slots__ = ("icdf", "count")

    def __init__(self, values):
        self.icdf = [int(v) for v in values]
        # strip trailing padding zeros beyond the terminal zero
        while len(self.icdf) >= 2 and self.icdf[-2] == 0:
            self.icdf.pop()
        assert self.icdf[-1] == 0
        self.count = 0

    def update(self, symbol: int) -> None:
        self.count = update_cdf(self.icdf, self.count, symbol)


SKIP_OVERRIDE = None


def _wrap(arr: np.ndarray):
    """Recursively wrap trailing cdf rows of an ndarray into Cdf objects."""
    if arr.ndim == 1:
        return Cdf(arr)
    return [_wrap(a) for a in arr]


class CdfState:
    """All adaptive CDFs for one tile (reset from defaults per frame)."""

    def __init__(self, base_q_idx: int):
        qctx = tables.coef_qctx(base_q_idx)
        c = tables.coef_cdfs()
        m = tables.mode_cdfs()
        self.txb_skip = _wrap(c["txb_skip"][qctx])          # [5][13]
        self.eob_pt = {
            area: _wrap(c[f"eob_pt_{area}"][qctx])           # [2][2]
            for area in (16, 32, 64, 128, 256, 512, 1024)
        }
        self.eob_extra = _wrap(c["eob_extra"][qctx])        # [5][2][9]
        self.coeff_base_eob = _wrap(c["coeff_base_eob"][qctx])  # [5][2][4]
        self.coeff_base = _wrap(c["coeff_base"][qctx])      # [5][2][42]
        self.coeff_br = _wrap(c["coeff_br"][qctx])          # [5][2][21]
        self.dc_sign = _wrap(c["dc_sign"][qctx])            # [2][3]
        self.partition = _wrap(m["partition"])               # [20]
        self.kf_y_mode = _wrap(m["kf_y_mode"])               # [5][5]
        for name in ("uv_mode", "skip", "angle_delta", "intra_ext_tx_1",
                     "intra_ext_tx_2", "filter_intra", "tx_size"):
            if name in m:
                setattr(self, name, _wrap(m[name]))
        if SKIP_OVERRIDE is not None:
            self.skip = [Cdf(row) for row in SKIP_OVERRIDE]
        if not hasattr(self, "skip"):
            # provisional equiprobable skip cdfs until the default table is
            # behaviorally identified (tools/find_skip_cdf.py)
            self.skip = [Cdf([16384, 0]) for _ in range(3)]


class DecCoder:
    """Symbol reader: decodes from a tile payload, adapting CDFs."""

    mode = "decode"

    def __init__(self, data: bytes, disable_cdf_update: bool = False):
        self.ec = Decoder(data)
        self.disable_update = disable_cdf_update

    def sym(self, cdf: Cdf, value: int | None = None) -> int:
        s = self.ec.decode_symbol(cdf.icdf)
        if not self.disable_update:
            cdf.update(s)
        return s

    def bool_(self, value: int | None = None) -> int:
        return self.ec.decode_bool()

    def literal(self, n: int, value: int | None = None) -> int:
        return self.ec.decode_literal(n)


class EncCoder:
    """Symbol writer: encodes given values, adapting CDFs identically."""

    mode = "encode"

    def __init__(self, disable_cdf_update: bool = False):
        self.ec = Encoder()
        self.disable_update = disable_cdf_update

    def sym(self, cdf: Cdf, value: int | None = None) -> int:
        assert value is not None
        self.ec.encode_symbol(value, cdf.icdf)
        if not self.disable_update:
            cdf.update(value)
        return value

    def bool_(self, value: int | None = None) -> int:
        assert value is not None
        self.ec.encode_bool(value)
        return value

    def literal(self, n: int, value: int | None = None) -> int:
        assert value is not None
        self.ec.encode_literal(value, n)
        return value

    def done(self) -> bytes:
        return self.ec.done()
