"""CDF-derived rate tables for device-side RDO.

Replaces the ``2 + log2(1+|x|)`` coefficient-rate proxy and the fixed
per-mode bit constants (round-2 review item 7) with expected bit costs
computed from the normative default CDFs (av1tpu/spec/tables): for each
quantized level magnitude L the table holds the cost of the coeff_base
symbol, the base-range chain, the sign bit, and the exp-golomb tail
(mirroring the tile engine's coefficient loop, av1tpu/spec/tile.py
`_code_coefs`), averaged uniformly over coding contexts.  Per-block
txb_skip costs make an all-zero block pay its (cheap) skip symbol and a
coded block its not-skipped symbol — so partition RDO sees the real
4-skip-flags-vs-1 trade-off.

Tables are stacked over the 4 coefficient quality buckets (spec
init_coeff_cdfs / `tables.coef_qctx`) so qindex stays a TRACED argument:
the device selects the bucket row arithmetically, keeping one compiled
executable for every q (the CQ-search probe loop depends on this).

The reference delegates rate estimation to SVT-AV1 inside av1an
(reference crates/daemon/src/encode/av1an.rs:14); this is the TPU-native
equivalent feeding the batched RDO pipelines.
"""

from __future__ import annotations

import functools

import numpy as np

from av1tpu.spec import tables

_MAX_LEVEL = 256  # table length; larger magnitudes clamp to the last entry


def _sym_bits(icdf_row: np.ndarray, s: int) -> float:
    """Bits to code symbol s from one 32768-scaled inverse CDF row."""
    row = np.asarray(icdf_row, np.int64)
    prev = 32768 if s == 0 else int(row[s - 1])
    p = max(prev - int(row[s]), 1) / 32768.0
    return -float(np.log2(p))


def _avg_sym_bits(cdf_rows: np.ndarray, s: int) -> float:
    """Mean bits for symbol s over a (ctx, vals) stack of CDF rows."""
    rows = cdf_rows.reshape(-1, cdf_rows.shape[-1])
    return float(np.mean([_sym_bits(r, s) for r in rows]))


def _golomb_bits(v: int) -> int:
    """Exp-golomb length for v (tile.py _write_golomb): 2*len(v+1)-1."""
    return 2 * int(v + 1).bit_length() - 1


@functools.cache
def coef_rate_tables(tx_ctx: int, ptype: int) -> np.ndarray:
    """(4, _MAX_LEVEL) float32: expected bits to code one coefficient of
    magnitude L (incl. sign) for each quality bucket.  tx_ctx: tx-size
    context (16x16 -> 2, 32x32 -> 3, 64x64 -> 4, 8x8 -> 1); ptype: 0
    luma, 1 chroma.

    Context selection is magnitude-consistent rather than uniform: the
    coeff_base/coeff_br contexts encode local neighborhood activity, and a
    coefficient of magnitude L typically sits in a neighborhood of similar
    magnitude, so symbol costs are read from the activity class matching L
    (averaged over the AC position classes — tile.py _base_ctx_offset
    {1, 6, 21}, br offsets {7, 14}).  Uniform context averaging would
    price zeros at the rare high-activity contexts' cost and overcharge
    every coded block."""
    c = tables.coef_cdfs()
    out = np.zeros((4, _MAX_LEVEL), np.float32)
    for qctx in range(4):
        base = c["coeff_base"][qctx][tx_ctx][ptype]       # (42, vals)
        br = c["coeff_br"][qctx][min(tx_ctx, 3)][ptype]   # (21, vals)

        def base_bits(lv_cls: int, s: int) -> float:
            rows = np.stack([base[min(lv_cls, 4) + off]
                             for off in (1, 6, 21)])
            return _avg_sym_bits(rows, s)

        def br_bits(lv_cls: int, s: int) -> float:
            rows = np.stack([br[min(lv_cls, 6) + off] for off in (7, 14)])
            return _avg_sym_bits(rows, s)

        for lv in range(_MAX_LEVEL):
            if lv == 0:
                out[qctx, lv] = base_bits(0, 0)
                continue
            bits = base_bits(lv, min(lv, 3)) + 1.0  # base symbol + sign
            if lv > 2:
                rem = min(lv, 15) - 3
                for _ in range(4):  # base-range chain, 0..3 increments
                    inc = min(rem, 3)
                    bits += br_bits(lv, inc)
                    rem -= inc
                    if inc < 3:
                        break
            if lv > 14:
                bits += _golomb_bits(lv - 15)
            out[qctx, lv] = bits
    return out


@functools.cache
def txb_skip_bits(tx_ctx: int) -> np.ndarray:
    """(4, 2) float32: [qctx][all_zero] expected txb_skip bits (symbol 0 =
    coded block, symbol 1 = all-zero block), context-averaged."""
    c = tables.coef_cdfs()
    out = np.zeros((4, 2), np.float32)
    for qctx in range(4):
        rows = c["txb_skip"][qctx][tx_ctx]
        out[qctx, 0] = _avg_sym_bits(rows, 0)
        out[qctx, 1] = _avg_sym_bits(rows, 1)
    return out


@functools.cache
def kf_mode_bits() -> np.ndarray:
    """(13,) float32: expected kf_y_mode bits per intra mode enum value,
    averaged over the 5x5 neighbor-mode context grid.  Replaces the
    hand-set _MODE_BITS constants in the wavefront keyframe RDO."""
    m = tables.mode_cdfs()["kf_y_mode"]  # (5, 5, vals)
    n_modes = 13
    rows = m.reshape(-1, m.shape[-1])
    return np.array(
        [float(np.mean([_sym_bits(r, s) for r in rows]))
         for s in range(n_modes)], np.float32)


@functools.cache
def scan_rank(n: int) -> np.ndarray:
    """(n, n) int32 grid: each coefficient's position in the default scan
    (positions beyond the coded 32x32 area of larger transforms get a
    sentinel past the end so they never extend the eob)."""
    from av1tpu.spec.enums import TX_W, default_scan

    tx = {4: 0, 8: 1, 16: 2, 32: 3, 64: 4}[n]
    cw = min(n, 32)
    scan = default_scan(tx)  # scan index -> position (row * cw + col)
    g = np.full((n, n), cw * cw, np.int32)
    rows, cols = np.divmod(np.asarray(scan, np.int64), cw)
    g[rows, cols] = np.arange(len(scan), dtype=np.int32)
    return g


@functools.cache
def eob_bits_tables(area: int, ptype: int) -> np.ndarray:
    """(4, area + 1) float32: expected bits to code an end-of-block
    position (eob_pt symbol + extra/raw low bits; spec 5.11.38) indexed by
    eob (1-based; index 0 = all-zero block, charged 0 here because
    txb_skip covers it)."""
    c = tables.coef_cdfs()
    pt = c[f"eob_pt_{min(area, 1024)}"]  # (qctx, ptype, tx-type ctx, vals)
    out = np.zeros((4, area + 1), np.float32)
    for qctx in range(4):
        rows = pt[qctx][ptype].reshape(-1, pt.shape[-1])
        for e in range(1, area + 1):
            t = (e - 1).bit_length()  # eob_pt symbol (eob in (2^(t-1), 2^t])
            sym = min(t, rows.shape[1] - 1)
            bits = float(np.mean([_sym_bits(r, sym) for r in rows]))
            if t >= 2:  # one cdf-coded high bit + t-2 raw low bits
                bits += float(t - 1)
            out[qctx, e] = bits
    return out


def qctx_index(q):
    """Traced quality-bucket index of a traced qindex (spec
    init_coeff_cdfs thresholds, tables.coef_qctx)."""
    import jax.numpy as jnp

    q = jnp.asarray(q)
    return ((q > 20).astype(jnp.int32) + (q > 60).astype(jnp.int32)
            + (q > 120).astype(jnp.int32))


class RateModel:
    """Bundle of device-side rate tables for one transform size/plane.

    Construct on host (static per tx shape), then call inside jit with a
    traced qctx: ``rm = RateModel(16, 0); bits = rm(levels, qctx)``.
    Models the tile engine's actual coefficient coding: txb_skip symbol,
    eob position cost, per-coded-coefficient base/br/sign/golomb cost —
    zeros past the end-of-block are free."""

    def __init__(self, n: int, ptype: int):
        import jax.numpy as jnp

        from av1tpu.spec.enums import tx_size_ctx

        tx = {4: 0, 8: 1, 16: 2, 32: 3, 64: 4}[n]
        cw = min(n, 32)
        self.tabs = jnp.asarray(coef_rate_tables(tx_size_ctx(tx), ptype))
        self.skip = jnp.asarray(txb_skip_bits(tx_size_ctx(tx)))
        # level grids hold only the coded area (<=32x32): TX_64X64 levels
        # arrive as (..., 32, 32), so the rank grid is the top-left corner
        self.rank = jnp.asarray(scan_rank(n)[:cw, :cw])
        self.eob = jnp.asarray(eob_bits_tables(cw * cw, ptype))

    def __call__(self, lv, qctx):
        """lv: (..., n, n) int levels -> (...,) float32 expected bits.

        The per-coefficient cost is read WITHOUT a table gather (a
        millions-of-elements gather runs on the TPU scalar path, ~50 ms
        per 1080p frame): magnitudes 0..15 resolve through a 16-way
        select chain (pure vector compares), and magnitudes > 15 use the
        closed form tab[15] - 1 + exp_golomb(a - 15) — exactly how the
        table rows themselves were built (coef_rate_tables: the base/br
        part is constant past 15, only the golomb tail grows)."""
        import jax.numpy as jnp

        tab = self.tabs[qctx]
        sk = self.skip[qctx]
        a = jnp.abs(lv)
        nz = lv != 0
        # eob = 1 + rank of the last nonzero in scan order (0 if none)
        eob = jnp.max(jnp.where(nz, self.rank + 1, 0), axis=(-2, -1))
        coded = self.rank < eob[..., None, None]
        small = jnp.zeros(a.shape, jnp.float32)
        for k in range(16):
            small = small + jnp.where(a == k, tab[k], 0.0)
        # exp-golomb length of (a - 15): 2 * bit_length(a - 14) - 1
        big = (tab[15] - 1.0
               + 2.0 * jnp.floor(jnp.log2(jnp.maximum(
                   a.astype(jnp.float32) - 14.0, 2.0))) + 1.0)
        bits = jnp.where(a > 15, big, small)
        coef = jnp.sum(jnp.where(coded, bits, 0.0), axis=(-2, -1))
        return jnp.where(eob == 0, sk[1],
                         sk[0] + self.eob[qctx][eob] + coef)
