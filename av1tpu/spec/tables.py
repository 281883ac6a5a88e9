"""Loader for AV1 spec constant tables (extracted, see tools/extract_tables.py).

Tables are spec-mandated constants recovered structurally from the system's
conforming decoder libraries and validated behaviorally by decoding real
bitstreams (tests).  CDFs use the inverted (iCDF) convention: entries count
down from <32768 to a terminal 0; arity = number of symbols.

Shapes:
  quant:  dc_q_{8,10,12} / ac_q_{8,10,12}: (256,) dequant step per qindex
  coef:   coeff_base       (4 qctx, 5 txsz, 2 plane, 42 ctx, 4 syms)
          coeff_base_eob   (4, 5, 2, 4 ctx, 3 syms)
          coeff_br         (4, 5, 2, 21 ctx, 4 syms)
          txb_skip         (4, 5, 13 ctx, 2 syms)
          eob_pt_{16..1024} (4, 2 plane, 2 "is_1d+filter" ctx, N syms)
          eob_extra        (4, 5, 2, 9 ctx, 2 syms)
          dc_sign          (4, 2, 3 ctx, 2 syms)
  modes:  partition        (20 ctx, 10 syms max; arity 4 for w8 ctx 0-3,
                            10 for w16/w32/w64 ctx 4-15, 8 for w128 ctx 16-19)
          kf_y_mode        (5, 5, 13 syms)
"""

from __future__ import annotations

import functools
import os

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tables")


@functools.cache
def _load(name: str) -> dict[str, np.ndarray]:
    path = os.path.join(_DIR, name)
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


@functools.cache
def quant() -> dict[str, np.ndarray]:
    return _load("quant.npz")


@functools.cache
def coef_cdfs() -> dict[str, np.ndarray]:
    return _load("coef_cdfs.npz")


@functools.cache
def mode_cdfs() -> dict[str, np.ndarray]:
    return _load("mode_cdfs.npz")


@functools.cache
def inter_cdfs() -> dict[str, np.ndarray]:
    """Inter-frame mode/MV default CDFs (see extract_tables.py
    extract_inter_modes; ambiguous binary tables behaviorally identified by
    tools/find_inter_cdfs.py)."""
    return _load("inter_cdfs.npz")


def subpel_filters() -> dict[str, np.ndarray]:
    """Sub-pel interpolation filter banks (spec Subpel_Filters; 16
    positions x 8 taps, extracted from libaom by extract_tables.py
    extract_subpel): regular / smooth / sharp / bilinear."""
    return _load("subpel.npz")


def dc_q(qindex: int, bit_depth: int = 8) -> int:
    return int(quant()[f"dc_q_{bit_depth}"][qindex])


def ac_q(qindex: int, bit_depth: int = 8) -> int:
    return int(quant()[f"ac_q_{bit_depth}"][qindex])


def coef_qctx(base_q_idx: int) -> int:
    """Quality bucket selecting the default coefficient CDF set
    (spec init_coeff_cdfs)."""
    if base_q_idx <= 20:
        return 0
    if base_q_idx <= 60:
        return 1
    if base_q_idx <= 120:
        return 2
    return 3
