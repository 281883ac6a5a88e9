"""ctypes bridge to the production C++ tile packer (native/coding/pack.cpp)
plus the full TPU keyframe path: TPU level grids -> C++ tile bytes -> OBUs.

The packer is validated byte-for-byte against the Python spec engine
(tests/test_packer.py), which itself is bit-exact against dav1d/libaom.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(REPO, "native", "build", "libav1pack.so")

_I32P = ctypes.POINTER(ctypes.c_int32)


class Packer:
    """Serialize fixed-grid level arrays into an AV1 tile payload."""

    def __init__(self, lib_path: str = _LIB_PATH):
        self._lib = ctypes.CDLL(lib_path)
        fn = self._lib.pack_tile_v1
        fn.restype = ctypes.c_size_t
        fn.argtypes = [_I32P, _I32P, _I32P, ctypes.c_int, ctypes.c_int,
                       ctypes.c_int, ctypes.c_int,
                       ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t]
        self._fn = fn
        f3 = self._lib.pack_tile_v3
        f3.restype = ctypes.c_size_t
        f3.argtypes = [ctypes.POINTER(ctypes.c_uint16)] + \
                      [ctypes.POINTER(ctypes.c_int16)] * 5 + \
                      [ctypes.c_int] * 4 + \
                      [ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                       _I32P, _I32P]
        self._fn3 = f3
        fp = self._lib.pack_tile_inter_part
        fp.restype = ctypes.c_size_t
        fp.argtypes = [ctypes.POINTER(ctypes.c_uint16)] + \
                      [ctypes.POINTER(ctypes.c_int16)] * 6 + \
                      [ctypes.c_int] + \
                      [ctypes.POINTER(ctypes.c_int16)] + \
                      [ctypes.c_int] * 4 + \
                      [ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                       _I32P, _I32P]
        self._fnp = fp
        fi = self._lib.pack_tile_inter
        fi.restype = ctypes.c_size_t
        fi.argtypes = [ctypes.POINTER(ctypes.c_uint16)] + \
                      [ctypes.POINTER(ctypes.c_int16)] * 4 + \
                      [ctypes.c_int] * 4 + \
                      [ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                       _I32P, _I32P]
        self._fni = fi
        fw = self._lib.av1pack_cdf_words
        fw.restype = ctypes.c_int
        fw.argtypes = []
        self.cdf_words = int(fw())
        f2 = self._lib.pack_tile_v2
        f2.restype = ctypes.c_size_t
        f2.argtypes = [ctypes.POINTER(ctypes.c_uint16),
                       ctypes.POINTER(ctypes.c_int16),
                       ctypes.POINTER(ctypes.c_int16),
                       ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                       ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t]
        self._fn2 = f2
        f2u = self._lib.pack_tile_v2_uv
        f2u.restype = ctypes.c_size_t
        f2u.argtypes = [ctypes.POINTER(ctypes.c_uint16),
                        ctypes.POINTER(ctypes.c_int16),
                        ctypes.POINTER(ctypes.c_int16),
                        ctypes.c_int, ctypes.c_int, ctypes.c_int,
                        ctypes.c_int, ctypes.c_int, ctypes.c_int,
                        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                        _I32P, _I32P,
                        ctypes.POINTER(ctypes.c_int16)]
        self._fn2u = f2u

    def new_cdf_blob(self) -> np.ndarray:
        """Allocate a CDF carry blob (one frame's end-of-frame CDF save;
        pass as cdf_out to a pack call, then as cdf_in to the next frame's
        — the C++ equivalent of the decoder's ref-slot CDF save/load)."""
        return np.zeros(self.cdf_words, np.int32)

    @staticmethod
    def _cdf_ptrs(cdf_in, cdf_out):
        null = _I32P()
        pi = cdf_in.ctypes.data_as(_I32P) if cdf_in is not None else null
        po = cdf_out.ctypes.data_as(_I32P) if cdf_out is not None else null
        return pi, po

    def pack_tile(self, levels_y: np.ndarray, levels_u: np.ndarray,
                  levels_v: np.ndarray, qindex: int,
                  disable_cdf_update: bool = False) -> bytes:
        """levels_y: (rows, cols, 16, 16) int32 block grid; levels_u/v:
        (rows, cols, 8, 8).  Luma dims must be multiples of 64."""
        ly = np.ascontiguousarray(levels_y, np.int32)
        lu = np.ascontiguousarray(levels_u, np.int32)
        lv = np.ascontiguousarray(levels_v, np.int32)
        rows, cols = ly.shape[0], ly.shape[1]
        assert lu.shape[:2] == (rows, cols) and lv.shape[:2] == (rows, cols)
        mi_rows, mi_cols = rows * 4, cols * 4
        assert mi_rows % 16 == 0 and mi_cols % 16 == 0, \
            "packer v1 needs 64-multiple luma dims"
        cap = ly.nbytes + lu.nbytes + lv.nbytes + 65536
        out = (ctypes.c_uint8 * cap)()
        n = self._fn(ly.ctypes.data_as(_I32P), lu.ctypes.data_as(_I32P),
                     lv.ctypes.data_as(_I32P), mi_rows, mi_cols, qindex,
                     int(disable_cdf_update), out, cap)
        if n == 0:
            raise RuntimeError("pack_tile_v1 failed (buffer too small?)")
        return bytes(bytearray(out)[:n])

    def pack_tile_compact(self, bitmap: np.ndarray, vals: np.ndarray,
                          height: int, width: int, qindex: int,
                          disable_cdf_update: bool = False,
                          modes: np.ndarray | None = None,
                          uv_mode: int = 1, tx_from_mode: bool = False,
                          cdf_in: np.ndarray | None = None,
                          cdf_out: np.ndarray | None = None,
                          txd: np.ndarray | None = None) -> bytes:
        """Pack from the compact form produced by encode_intra_v_compact:
        significance bitmap (uint16 words) + nonzero values (int16) +
        optional per-block luma modes (None = all V_PRED) + a frame-wide
        chroma mode (V_PRED default; the wavefront pipeline uses DC).
        tx_from_mode: luma tx_type derived from the mode (Mode_To_Txfm —
        the wavefront ADST pipeline); False = DCT everywhere.
        txd: optional per-block luma tx depth (0..2) — its presence means
        the frame header signals TX_MODE_SELECT and every block codes a
        tx-depth symbol; sub-tx luma levels live in the 16x16 slot as
        raster nt x nt tiles.  height/width: padded luma dims (multiples
        of 64)."""
        bm = np.ascontiguousarray(bitmap, np.uint16)
        vv = np.ascontiguousarray(vals, np.int16)
        if modes is not None:
            mm = np.ascontiguousarray(modes, np.int16)
            mptr = mm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        else:
            mptr = ctypes.POINTER(ctypes.c_int16)()
        if txd is not None:
            tt = np.ascontiguousarray(txd, np.int16)
            tptr = tt.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        else:
            tptr = ctypes.POINTER(ctypes.c_int16)()
        mi_rows, mi_cols = height // 4, width // 4
        # worst case ~40 bits per coefficient (1.5 coefs per luma pixel)
        cap = height * width * 8 + 65536
        out = (ctypes.c_uint8 * cap)()
        n = self._fn2u(bm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                       vv.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                       mptr, uv_mode, int(tx_from_mode),
                       mi_rows, mi_cols, qindex, int(disable_cdf_update),
                       out, cap, *self._cdf_ptrs(cdf_in, cdf_out), tptr)
        if n == 0:
            raise RuntimeError("pack_tile_v2 failed (buffer too small?)")
        return bytes(bytearray(out)[:n])

    def pack_tile_inter(self, bitmap: np.ndarray, vals: np.ndarray,
                        mv: np.ndarray, height: int, width: int,
                        qindex: int,
                        disable_cdf_update: bool = False,
                        cdf_in: np.ndarray | None = None,
                        cdf_out: np.ndarray | None = None,
                        refs: np.ndarray | None = None) -> bytes:
        """Pack one inter tile from the compact form produced by
        encode_inter_v/_compact: significance bitmap + nonzero values +
        per-16x16-block MV grid (r16, c16, 2) int 1/8-pel.  refs:
        optional per-16-block reference grid (0=LAST, 1=GOLDEN; None =
        the single-ref LAST chain)."""
        i16p = ctypes.POINTER(ctypes.c_int16)
        bm = np.ascontiguousarray(bitmap, np.uint16)
        vv = np.ascontiguousarray(vals, np.int16)
        mv = np.asarray(mv)
        mvr = np.ascontiguousarray(mv[..., 0].reshape(-1), np.int16)
        mvc = np.ascontiguousarray(mv[..., 1].reshape(-1), np.int16)
        rfp = None
        if refs is not None:
            rf = np.ascontiguousarray(np.asarray(refs).reshape(-1),
                                      np.int16)
            rfp = rf.ctypes.data_as(i16p)
        cap = height * width * 8 + 65536
        out = (ctypes.c_uint8 * cap)()
        n = self._fni(bm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                      vv.ctypes.data_as(i16p), mvr.ctypes.data_as(i16p),
                      mvc.ctypes.data_as(i16p), rfp,
                      height // 4, width // 4, qindex,
                      int(disable_cdf_update), out, cap,
                      *self._cdf_ptrs(cdf_in, cdf_out))
        if n == 0:
            raise RuntimeError("pack_tile_inter failed (buffer too small?)")
        return bytes(bytearray(out)[:n])

    def pack_tile_inter_part(self, bitmap: np.ndarray, vals: np.ndarray,
                             split32: np.ndarray, split64: np.ndarray,
                             mv: np.ndarray, height: int, width: int,
                             qindex: int,
                             disable_cdf_update: bool = False,
                             cdf_in: np.ndarray | None = None,
                             cdf_out: np.ndarray | None = None,
                             refs: np.ndarray | None = None,
                             split16: np.ndarray | None = None) -> bytes:
        """Pack one partitioned inter tile (union-layout compact form from
        encode_inter_part/_gop_step_part + split maps + MV grid).  refs:
        optional per-16-block reference grid (0=LAST, 1=GOLDEN; merged
        blocks take their top-left entry).  split16: optional per-16-block
        map; nonzero blocks split into four 8x8 sub-blocks whose levels
        live in the parent slot's quadrants.  The MV grid granularity is
        inferred from mv.shape: (h/16, w/16, 2) = per-16-block, (h/8, w/8,
        2) = per-8-block (required when split16 is given)."""
        i16p = ctypes.POINTER(ctypes.c_int16)
        bm = np.ascontiguousarray(bitmap, np.uint16)
        vv = np.ascontiguousarray(vals, np.int16)
        s32 = np.ascontiguousarray(np.asarray(split32).reshape(-1),
                                   np.int16)
        s64 = np.ascontiguousarray(np.asarray(split64).reshape(-1),
                                   np.int16)
        mv = np.asarray(mv)
        mv_per8 = int(mv.shape[0] == height // 8)
        if split16 is not None and not mv_per8:
            raise ValueError("split16 needs a per-8-block MV grid")
        mvr = np.ascontiguousarray(mv[..., 0].reshape(-1), np.int16)
        mvc = np.ascontiguousarray(mv[..., 1].reshape(-1), np.int16)
        s16p = i16p()
        if split16 is not None:
            s16 = np.ascontiguousarray(np.asarray(split16).reshape(-1),
                                       np.int16)
            s16p = s16.ctypes.data_as(i16p)
        rfp = None
        if refs is not None:
            rf = np.ascontiguousarray(np.asarray(refs).reshape(-1),
                                      np.int16)
            rfp = rf.ctypes.data_as(i16p)
        cap = height * width * 8 + 65536
        out = (ctypes.c_uint8 * cap)()
        n = self._fnp(bm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                      vv.ctypes.data_as(i16p), s16p,
                      s32.ctypes.data_as(i16p),
                      s64.ctypes.data_as(i16p), mvr.ctypes.data_as(i16p),
                      mvc.ctypes.data_as(i16p), mv_per8, rfp,
                      height // 4, width // 4, qindex,
                      int(disable_cdf_update), out, cap,
                      *self._cdf_ptrs(cdf_in, cdf_out))
        if n == 0:
            raise RuntimeError("pack_tile_inter_part failed")
        return bytes(bytearray(out)[:n])

    def pack_tile_part(self, bitmap: np.ndarray, vals: np.ndarray,
                       modes16: np.ndarray, modes32: np.ndarray,
                       split: np.ndarray, split64: np.ndarray,
                       height: int, width: int, qindex: int,
                       disable_cdf_update: bool = False,
                       cdf_in: np.ndarray | None = None,
                       cdf_out: np.ndarray | None = None) -> bytes:
        """Pack from the partition-RDO compact form (intra_part layout)."""
        i16p = ctypes.POINTER(ctypes.c_int16)
        bm = np.ascontiguousarray(bitmap, np.uint16)
        arrs = [np.ascontiguousarray(a, np.int16)
                for a in (vals, modes16, modes32, split, split64)]
        cap = height * width * 8 + 65536
        out = (ctypes.c_uint8 * cap)()
        n = self._fn3(bm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                      *(a.ctypes.data_as(i16p) for a in arrs),
                      height // 4, width // 4, qindex,
                      int(disable_cdf_update), out, cap,
                      *self._cdf_ptrs(cdf_in, cdf_out))
        if n == 0:
            raise RuntimeError("pack_tile_v3 failed (buffer too small?)")
        return bytes(bytearray(out)[:n])


_packer: Packer | None = None


def _get_packer() -> Packer:
    global _packer
    if _packer is None:
        _packer = Packer()
    return _packer


def encode_keyframe_tpu(out: dict, width: int, height: int,
                        qindex: int) -> bytes:
    """Wrap TPU pipeline output (encode_intra_v result dict, padded to
    64-multiples) into a complete temporal unit.  width/height are the
    render dimensions signalled in the frame header."""
    from av1tpu.spec.bits import BitWriter
    from av1tpu.spec.encode_frame import (
        EncoderConfig, make_frame_header, make_sequence_header,
    )
    from av1tpu.spec.headers import write_frame_header_key, write_sequence_header
    from av1tpu.spec.obu import (
        OBU_FRAME, OBU_SEQUENCE_HEADER, build_obu, temporal_delimiter,
    )

    ly = np.asarray(out["levels_y"])
    coded_h, coded_w = ly.shape[0] * 16, ly.shape[1] * 16
    cfg = EncoderConfig(base_q_idx=qindex)
    seq = make_sequence_header(coded_w, coded_h, cfg)
    fh = make_frame_header(seq, cfg)
    fh.render_width, fh.render_height = width, height

    tile = _get_packer().pack_tile(ly, out["levels_u"], out["levels_v"],
                                   qindex, bool(cfg.disable_cdf_update))
    bw = BitWriter()
    write_frame_header_key(seq, fh, bw)
    bw.byte_align()
    return (temporal_delimiter()
            + build_obu(OBU_SEQUENCE_HEADER, write_sequence_header(seq))
            + build_obu(OBU_FRAME, bw.bytes() + tile))
