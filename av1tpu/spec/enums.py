"""AV1 enums and block geometry (spec section 6.10.4 and annex tables)."""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# block sizes
# ---------------------------------------------------------------------------

BLOCK_4X4 = 0
BLOCK_4X8 = 1
BLOCK_8X4 = 2
BLOCK_8X8 = 3
BLOCK_8X16 = 4
BLOCK_16X8 = 5
BLOCK_16X16 = 6
BLOCK_16X32 = 7
BLOCK_32X16 = 8
BLOCK_32X32 = 9
BLOCK_32X64 = 10
BLOCK_64X32 = 11
BLOCK_64X64 = 12
BLOCK_64X128 = 13
BLOCK_128X64 = 14
BLOCK_128X128 = 15
BLOCK_4X16 = 16
BLOCK_16X4 = 17
BLOCK_8X32 = 18
BLOCK_32X8 = 19
BLOCK_16X64 = 20
BLOCK_64X16 = 21
BLOCK_SIZES = 22

BLOCK_W = [4, 4, 8, 8, 8, 16, 16, 16, 32, 32, 32, 64, 64, 64, 128, 128,
           4, 16, 8, 32, 16, 64]
BLOCK_H = [4, 8, 4, 8, 16, 8, 16, 32, 16, 32, 64, 32, 64, 128, 64, 128,
           16, 4, 32, 8, 64, 16]

# mi units are 4x4
MI_W = [w >> 2 for w in BLOCK_W]
MI_H = [h >> 2 for h in BLOCK_H]
MI_W_LOG2 = [int(np.log2(w)) for w in MI_W]
MI_H_LOG2 = [int(np.log2(h)) for h in MI_H]

# partition
PARTITION_NONE = 0
PARTITION_HORZ = 1
PARTITION_VERT = 2
PARTITION_SPLIT = 3
PARTITION_HORZ_A = 4
PARTITION_HORZ_B = 5
PARTITION_VERT_A = 6
PARTITION_VERT_B = 7
PARTITION_HORZ_4 = 8
PARTITION_VERT_4 = 9

# Partition_Subsize[partition][bSize] for square sizes 8..128
SQUARE_SIZES = [BLOCK_8X8, BLOCK_16X16, BLOCK_32X32, BLOCK_64X64, BLOCK_128X128]


def split_subsize(bsize: int) -> int:
    """PARTITION_SPLIT quarter size of a square block."""
    m = {BLOCK_128X128: BLOCK_64X64, BLOCK_64X64: BLOCK_32X32,
         BLOCK_32X32: BLOCK_16X16, BLOCK_16X16: BLOCK_8X8,
         BLOCK_8X8: BLOCK_4X4}
    return m[bsize]


def horz_subsize(bsize: int) -> int:
    m = {BLOCK_128X128: BLOCK_128X64, BLOCK_64X64: BLOCK_64X32,
         BLOCK_32X32: BLOCK_32X16, BLOCK_16X16: BLOCK_16X8,
         BLOCK_8X8: BLOCK_8X4}
    return m[bsize]


def vert_subsize(bsize: int) -> int:
    m = {BLOCK_128X128: BLOCK_64X128, BLOCK_64X64: BLOCK_32X64,
         BLOCK_32X32: BLOCK_16X32, BLOCK_16X16: BLOCK_8X16,
         BLOCK_8X8: BLOCK_4X8}
    return m[bsize]


# ---------------------------------------------------------------------------
# transform sizes
# ---------------------------------------------------------------------------

TX_4X4 = 0
TX_8X8 = 1
TX_16X16 = 2
TX_32X32 = 3
TX_64X64 = 4
TX_4X8 = 5
TX_8X4 = 6
TX_8X16 = 7
TX_16X8 = 8
TX_16X32 = 9
TX_32X16 = 10
TX_32X64 = 11
TX_64X32 = 12
TX_4X16 = 13
TX_16X4 = 14
TX_8X32 = 15
TX_32X8 = 16
TX_16X64 = 17
TX_64X16 = 18
TX_SIZES_ALL = 19

TX_W = [4, 8, 16, 32, 64, 4, 8, 8, 16, 16, 32, 32, 64, 4, 16, 8, 32, 16, 64]
TX_H = [4, 8, 16, 32, 64, 8, 4, 16, 8, 32, 16, 64, 32, 16, 4, 32, 8, 64, 16]
TX_W_LOG2 = [int(np.log2(w)) for w in TX_W]
TX_H_LOG2 = [int(np.log2(h)) for h in TX_H]

# Tx_Size_Sqr / Tx_Size_Sqr_Up (spec tables)
TX_SIZE_SQR = [TX_4X4, TX_8X8, TX_16X16, TX_32X32, TX_64X64,
               TX_4X4, TX_4X4, TX_8X8, TX_8X8, TX_16X16, TX_16X16,
               TX_32X32, TX_32X32, TX_4X4, TX_4X4, TX_8X8, TX_8X8,
               TX_16X16, TX_16X16]
TX_SIZE_SQR_UP = [TX_4X4, TX_8X8, TX_16X16, TX_32X32, TX_64X64,
                  TX_8X8, TX_8X8, TX_16X16, TX_16X16, TX_32X32, TX_32X32,
                  TX_64X64, TX_64X64, TX_16X16, TX_16X16, TX_32X32,
                  TX_32X32, TX_64X64, TX_64X64]

# Max_Tx_Size_Rect[bSize]: largest rect tx fitting the block
MAX_TX_SIZE_RECT = [
    TX_4X4, TX_4X8, TX_8X4, TX_8X8, TX_8X16, TX_16X8, TX_16X16,
    TX_16X32, TX_32X16, TX_32X32, TX_32X64, TX_64X32, TX_64X64,
    TX_64X64, TX_64X64, TX_64X64, TX_4X16, TX_16X4, TX_8X32, TX_32X8,
    TX_16X64, TX_64X16,
]

# ---------------------------------------------------------------------------
# intra modes
# ---------------------------------------------------------------------------

# reference frames
INTRA_FRAME = 0
LAST_FRAME = 1
LAST2_FRAME = 2
LAST3_FRAME = 3
GOLDEN_FRAME = 4
BWDREF_FRAME = 5
ALTREF2_FRAME = 6
ALTREF_FRAME = 7

# inter (single) Y modes, continuing the intra enumeration
NEARESTMV = 13
NEARMV = 14
GLOBALMV = 15
NEWMV = 16

DC_PRED = 0
V_PRED = 1
H_PRED = 2
D45_PRED = 3
D135_PRED = 4
D113_PRED = 5
D157_PRED = 6
D203_PRED = 7
D67_PRED = 8
SMOOTH_PRED = 9
SMOOTH_V_PRED = 10
SMOOTH_H_PRED = 11
PAETH_PRED = 12
UV_CFL_PRED = 13
INTRA_MODES = 13

# spec Intra_Mode_Context
INTRA_MODE_CONTEXT = [0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0]

# ---------------------------------------------------------------------------
# transform types
# ---------------------------------------------------------------------------

DCT_DCT = 0
ADST_DCT = 1
DCT_ADST = 2
ADST_ADST = 3
FLIPADST_DCT = 4
DCT_FLIPADST = 5
FLIPADST_FLIPADST = 6
ADST_FLIPADST = 7
FLIPADST_ADST = 8
IDTX = 9
V_DCT = 10
H_DCT = 11
V_ADST = 12
H_ADST = 13
V_FLIPADST = 14
H_FLIPADST = 15
TX_TYPES = 16

TX_SET_DCTONLY = 0
TX_SET_INTRA_1 = 1  # DTT4 + IDTX + 1D DCT (7 types)
TX_SET_INTRA_2 = 2  # DTT4 + IDTX (5 types)

# symbol orderings for intra tx-type signaling (spec Tx_Type ordering)
TX_SET_INTRA_1_TYPES = [IDTX, DCT_DCT, V_DCT, H_DCT, ADST_ADST, ADST_DCT,
                        DCT_ADST]
TX_SET_INTRA_2_TYPES = [IDTX, DCT_DCT, ADST_ADST, ADST_DCT, DCT_ADST]

# Mode_To_Txfm: tx type implied for chroma intra blocks (spec)
MODE_TO_TXFM = {
    DC_PRED: DCT_DCT, V_PRED: ADST_DCT, H_PRED: DCT_ADST,
    D45_PRED: DCT_DCT, D135_PRED: ADST_ADST, D113_PRED: ADST_DCT,
    D157_PRED: DCT_ADST, D203_PRED: DCT_ADST, D67_PRED: ADST_DCT,
    SMOOTH_PRED: ADST_ADST, SMOOTH_V_PRED: ADST_DCT,
    SMOOTH_H_PRED: DCT_ADST, PAETH_PRED: ADST_ADST,
    UV_CFL_PRED: DCT_DCT,
}


TX_SET_INTER_1 = 1  # all 16 types
TX_SET_INTER_2 = 2  # 12 types
TX_SET_INTER_3 = 3  # IDTX + DCT

# signaling order within each inter set (spec Tx_Type ordering, mirrors
# the intra orderings validated in round 1: IDTX leads)
TX_SET_INTER_1_TYPES = [IDTX, V_DCT, H_DCT, DCT_DCT, ADST_DCT, DCT_ADST,
                        FLIPADST_DCT, DCT_FLIPADST, ADST_ADST,
                        FLIPADST_FLIPADST, ADST_FLIPADST, FLIPADST_ADST,
                        V_ADST, H_ADST, V_FLIPADST, H_FLIPADST]
TX_SET_INTER_2_TYPES = TX_SET_INTER_1_TYPES[:12]
TX_SET_INTER_3_TYPES = [IDTX, DCT_DCT]


def get_tx_set_inter(tx_size: int, reduced_tx_set: int) -> int:
    """spec get_tx_set for inter blocks."""
    tx_sqr_up = TX_SIZE_SQR_UP[tx_size]
    if tx_sqr_up > TX_32X32:
        return TX_SET_DCTONLY
    if tx_sqr_up == TX_32X32:
        return TX_SET_INTER_3
    if reduced_tx_set:
        return TX_SET_INTER_3
    if TX_SIZE_SQR[tx_size] == TX_16X16:
        return TX_SET_INTER_2
    return TX_SET_INTER_1


# Size_Group[bSize] for the y_mode cdf context (spec Size_Group table)
SIZE_GROUP = [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3,
              1, 1, 2, 2, 3, 3]


def get_tx_set_intra(tx_size: int, reduced_tx_set: int) -> int:
    """spec get_tx_set for intra blocks."""
    tx_sqr_up = TX_SIZE_SQR_UP[tx_size]
    if tx_sqr_up > TX_32X32:
        return TX_SET_DCTONLY
    if tx_sqr_up == TX_32X32:
        return TX_SET_DCTONLY
    if reduced_tx_set:
        return TX_SET_INTRA_2
    tx_sqr = TX_SIZE_SQR[tx_size]
    if tx_sqr == TX_16X16:
        return TX_SET_INTRA_2
    return TX_SET_INTRA_1


# ---------------------------------------------------------------------------
# scan orders (generated; spec gives explicit tables following these patterns)
# ---------------------------------------------------------------------------


def _zigzag(w: int, h: int) -> np.ndarray:
    """Classic alternating diagonal scan (matches spec Default_Scan for
    square sizes; validated behaviorally for rectangles)."""
    order = []
    for d in range(w + h - 1):
        cells = []
        for r in range(h):
            c = d - r
            if 0 <= c < w:
                cells.append((r, c))
        if d % 2 == 0:
            cells.reverse()  # upward (toward row 0) on even diagonals
        order.extend(cells)
    # spec orientation: diag 1 of 4x4 is (0,1) then (1,0) -> downward on odd
    return np.array([r * w + c for r, c in order], dtype=np.int32)


_SCAN_CACHE: dict[tuple, np.ndarray] = {}


def default_scan(tx_size: int) -> np.ndarray:
    """Scan positions for the default (2D) transform scan, limited to the
    coded area (32x32 max: larger transforms zero out high frequencies).

    Uses the normative tables (extracted from the system decoder — see
    tools/extract_scans.py); positions are row * coded_width + col."""
    w = min(TX_W[tx_size], 32)
    h = min(TX_H[tx_size], 32)
    key = (w, h)
    if key not in _SCAN_CACHE:
        import os
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tables", "scans.npz")
        with np.load(path) as z:
            name = f"{w}x{h}"
            _SCAN_CACHE[key] = z[name] if name in z.files else _zigzag(w, h)
    return _SCAN_CACHE[key]


def tx_size_ctx(tx_size: int) -> int:
    """txSzCtx used to index coefficient cdfs: (TxSizeSqr + TxSizeSqrUp+1)>>1"""
    return (TX_SIZE_SQR[tx_size] + TX_SIZE_SQR_UP[tx_size] + 1) >> 1
