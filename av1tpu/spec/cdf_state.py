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
# behavioral-identification hooks (tools/find_inter_cdfs.py): candidate
# tables injected here override the npz/defaults below
INTRA_INTER_OVERRIDE = None   # [4][2]
SINGLE_REF_OVERRIDE = None    # [3][6][2]
INTER_TX3_OVERRIDE = None     # [4][2]  (inter tx-type set 3: IDTX/DCT)


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

        # inter-frame tables (structural extraction; see tables.inter_cdfs)
        i = tables.inter_cdfs()
        self.newmv = _wrap(i["newmv"])              # [6]
        self.zeromv = _wrap(i["zeromv"])            # [2]
        self.refmv = _wrap(i["refmv"])              # [6]
        self.drl = _wrap(i["drl"])                  # [3]
        self.y_mode = _wrap(i["y_mode"])            # [4 size groups]
        self.mv_joints = Cdf(i["mv_joints"])
        # the two MV components (row, col) adapt independently from
        # identical defaults
        self.mv_sign = [Cdf(i["mv_sign"]) for _ in range(2)]
        self.mv_classes = [Cdf(i["mv_classes"]) for _ in range(2)]
        self.mv_class0 = [Cdf(i["mv_class0"]) for _ in range(2)]
        self.mv_class0_fp = [_wrap(i["mv_class0_fp"]) for _ in range(2)]
        self.mv_fp = [Cdf(i["mv_fp"]) for _ in range(2)]
        self.mv_bits = [_wrap(i["mv_bits"]) for _ in range(2)]

        def _behavioral(name, override, shape):
            if override is not None:
                src = np.asarray(override)
            elif name in i:
                src = i[name]
            else:  # not yet identified: equiprobable placeholder
                src = np.full(shape, 0, np.int32)
                src[..., 0] = 16384
            return _wrap(src)

        self.intra_inter = _behavioral(
            "intra_inter", INTRA_INTER_OVERRIDE, (4, 2))
        self.single_ref = _behavioral(
            "single_ref", SINGLE_REF_OVERRIDE, (3, 6, 2))
        self.inter_tx3 = _behavioral(
            "inter_tx3", INTER_TX3_OVERRIDE, (4, 2))


def _walk_val(v):
    if isinstance(v, Cdf):
        yield v
    elif isinstance(v, list):
        for x in v:
            yield from _walk_val(x)
    elif isinstance(v, dict):
        for k in sorted(v):
            yield from _walk_val(v[k])


def iter_cdfs(state: "CdfState"):
    """Every Cdf of a CdfState in a deterministic order (sorted attribute
    names, nested lists/dicts in order)."""
    for name in sorted(vars(state)):
        yield from _walk_val(getattr(state, name))


def snapshot_cdfs(state: "CdfState") -> list[list[int]]:
    """End-of-frame CDF save (spec: decode_frame_wrapup saves the CDF
    arrays of the context_update_tile_id tile into each refreshed slot,
    with the per-CDF symbol counters reset to zero — dav1d
    cdf_thread_update zeroes the count element on copy)."""
    return [list(c.icdf) for c in iter_cdfs(state)]


def load_cdfs(state: "CdfState", snap: list[list[int]]) -> None:
    """Frame init with primary_ref_frame != PRIMARY_REF_NONE: CDFs load
    from the referenced slot's saved state instead of the defaults
    (counts start at zero)."""
    cs = list(iter_cdfs(state))
    assert len(cs) == len(snap), (len(cs), len(snap))
    for c, s in zip(cs, snap):
        assert len(c.icdf) == len(s)
        c.icdf = list(s)
        c.count = 0


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
