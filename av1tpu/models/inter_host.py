"""Host (numpy) inter-frame RDO planner: full-pel motion search + mode
decision for the spec engine.

This is the correctness-path inter encoder (the TPU pipeline mirrors its
decisions; see av1tpu/models/inter_v.py once landed).  Scope: 16x16 blocks,
single LAST reference, even full-pel MVs (chroma stays full-pel so motion
compensation is an exact copy — subpel filters land later), modes
GLOBALMV/NEARESTMV/NEARMV/NEWMV with D + lambda*R decisions, intra (DC)
fallback for occlusions.

Replaces the reference's reliance on SVT-AV1 motion estimation
(reference crates/daemon/src/encode/av1an.rs --preset 3).
"""

from __future__ import annotations

import numpy as np

from av1tpu.spec import tables
from av1tpu.spec.enums import (
    DC_PRED, GLOBALMV, GOLDEN_FRAME, LAST_FRAME, NEARESTMV, NEARMV, NEWMV,
    PARTITION_NONE, PARTITION_SPLIT,
)
from av1tpu.spec.mv import find_mv_stack
from av1tpu.spec.tile import FixedPartitionPlanner, Planner


def _cheapest_inter_mode(stack, mv):
    """Cheapest signaling of `mv` against the MV stack (shared by the
    replay planners and mirrored by the C++ packer)."""
    if mv == tuple(stack.global_mv):
        return GLOBALMV, 0
    if stack.num_found >= 1 and mv == tuple(stack.stack[0]):
        return NEARESTMV, 0
    if stack.num_found >= 2 and mv == tuple(stack.stack[1]):
        return NEARMV, 0
    return NEWMV, 0


def _replay_ref(planner_o, tc, r, c, bsize, stack, mv):
    """Shared replay helper: resolve the block's reference from an
    optional per-16-block ref map ("ref_map", values LAST_FRAME /
    GOLDEN_FRAME), recompute the MV stack for a non-LAST ref, and pick
    the cheapest signaling mode for `mv`."""
    refmap = planner_o.get("ref_map")
    ref = LAST_FRAME if refmap is None else int(refmap[r // 4, c // 4])
    if ref != LAST_FRAME:
        stack = find_mv_stack(tc, r, c, bsize, ref)
    mode, idx = _cheapest_inter_mode(stack, mv)
    return ref, stack, mode, idx


class InterReplayPlanner(FixedPartitionPlanner):
    """Feeds precomputed TPU inter decisions (models/inter_v.py) through the
    spec engine: per-16x16 MV grid + level grids.  The signaling mode is
    chosen here per block as the cheapest way to code the TPU's MV against
    the (sequentially known) MV prediction stack."""

    def __init__(self, mv_grid: np.ndarray, levels_y: np.ndarray,
                 levels_u: np.ndarray, levels_v: np.ndarray,
                 ref_map: np.ndarray | None = None):
        super().__init__(leaf_bsize=6)
        self.mv_grid = np.asarray(mv_grid)
        self.grids = (np.asarray(levels_y), np.asarray(levels_u),
                      np.asarray(levels_v))
        self.o = {}
        if ref_map is not None:
            self.o["ref_map"] = np.asarray(ref_map)

    def inter_block(self, tc, r, c, bsize, stack):
        mv = tuple(int(x) for x in self.mv_grid[r // 4, c // 4])
        ref, stack, mode, idx = _replay_ref(self.o, tc, r, c, bsize,
                                            stack, mv)
        return {"is_inter": True, "mode": mode, "mv": mv, "ref": ref,
                "ref_mv_idx": idx, "stack": stack}

    def quantize(self, tc, coefs_f, plane, tx, dc_q, ac_q, shift, x=0, y=0):
        n = 16 if plane == 0 else 8
        return np.asarray(self.grids[plane][y // n, x // n]).astype(np.int64)


class InterPartReplayPlanner(Planner):
    """Replays the partitioned TPU inter decisions
    (models/inter_v.py encode_inter_part) through the spec engine.

    Optional 8x8 leaves: out may carry "split16" (r16, c16) nonzero where a
    16x16 block splits into four 8x8 sub-blocks, with "mv8" (r8, c8, 2) the
    per-8-block MV grid (1/8-pel), "lv8y" (r8, c8, 8, 8) luma TX_8X8
    levels, and "lu4"/"lv4" (r8, c8, 4, 4) chroma TX_4X4 levels."""

    def __init__(self, out: dict):
        self.o = {k: np.asarray(v) for k, v in out.items()}
        if "ref16" in self.o and "ref_map" not in self.o:
            # per-16-block LAST/GOLDEN choice from the TPU pipeline
            # (encode_inter_part gld_*); the engine must then be given
            # golden_recon (encode_frame.encode_interframe)
            self.o["ref_map"] = np.where(self.o["ref16"], GOLDEN_FRAME,
                                         LAST_FRAME)

    def partition_choice(self, tc, r, c, bsize):
        from av1tpu.spec.enums import BLOCK_16X16, BLOCK_32X32
        if bsize > BLOCK_32X32:
            return (PARTITION_SPLIT if self.o["split64"][r // 16, c // 16]
                    else PARTITION_NONE)
        if bsize == BLOCK_32X32:
            return (PARTITION_SPLIT if self.o["split32"][r // 8, c // 8]
                    else PARTITION_NONE)
        if bsize == BLOCK_16X16 and "split16" in self.o:
            return (PARTITION_SPLIT if self.o["split16"][r // 4, c // 4]
                    else PARTITION_NONE)
        return PARTITION_NONE

    def inter_block(self, tc, r, c, bsize, stack):
        from av1tpu.spec.enums import BLOCK_8X8
        if bsize == BLOCK_8X8:
            mv = tuple(int(x) for x in self.o["mv8"][r // 2, c // 2])
        else:
            mv = tuple(int(x) for x in self.o["mv"][r // 4, c // 4])
        ref, stack, mode, idx = _replay_ref(self.o, tc, r, c, bsize,
                                            stack, mv)
        return {"is_inter": True, "mode": mode, "mv": mv, "ref": ref,
                "ref_mv_idx": idx, "stack": stack}

    def quantize(self, tc, coefs_f, plane, tx, dc_q, ac_q, shift, x=0, y=0):
        n = coefs_f.shape[0]
        if plane == 0:
            grid = {8: "lv8y", 16: "lv16", 32: "lv32", 64: "lv64"}[n]
            if n == 64:
                grid, n = "lv64", 64
        else:
            grid = {(1, 4): "lu4", (2, 4): "lv4",
                    (1, 8): "lu8", (2, 8): "lv8", (1, 16): "lu16",
                    (2, 16): "lv16c", (1, 32): "lu32",
                    (2, 32): "lv32c"}[(plane, n)]
        lv = self.o[grid][y // n, x // n].astype(np.int64)
        if n == 64:  # coded 32x32 area scattered back into the 64x64 grid
            full = np.zeros((64, 64), np.int64)
            full[:32, :32] = lv[:32, :32] if lv.shape[0] == 64 else lv
            return full
        return lv


def _round_even_fullpel(mv):
    """Clamp a 1/8-pel MV to the even full-pel grid (2-px steps)."""
    return (int(np.round(mv[0] / 16.0)) * 16, int(np.round(mv[1] / 16.0)) * 16)


def _mv_bits_estimate(diff):
    """Rough rate (bits) of coding an MV difference: joint + per-component
    class/offset bits."""
    bits = 2.0  # joint
    for d in diff:
        m = abs(d)
        if m == 0:
            continue
        z = m - 1
        cls = 0 if z < 16 else (z >> 3).bit_length() - 1
        bits += 4.0 + cls  # sign + class + offset/fr bits
    return bits


class InterRdoPlanner(Planner):
    """Per-block inter decision for one frame (fixed 16x16 grid)."""

    def __init__(self, q: int, search_range: int = 24, bit_depth: int = 8):
        self.search_range = search_range
        ac = tables.ac_q(q, bit_depth)
        # lambda in SAD-per-bit units, scaled like the intra RDO tuning
        self.lam = 0.12 * (ac / 8.0) ** 2
        self.sad_lam = max(self.lam ** 0.5, 1.0)

    # -- partition: fixed 16x16 --
    def partition_choice(self, tc, r, c, bsize) -> int:
        return PARTITION_NONE if bsize <= 6 else PARTITION_SPLIT

    def modes(self, tc, r, c, bsize):
        return DC_PRED, DC_PRED

    # -- inter decision --
    def _sad(self, src, ref, y, x, h, w):
        fh, fw = ref.shape
        if 0 <= y and y + h <= fh and 0 <= x and x + w <= fw:
            blk = ref[y : y + h, x : x + w]
        else:
            rows = np.clip(np.arange(y, y + h), 0, fh - 1)
            cols = np.clip(np.arange(x, x + w), 0, fw - 1)
            blk = ref[np.ix_(rows, cols)]
        return int(np.abs(src.astype(np.int32) - blk).sum())

    def _search(self, src, ref, y0, x0, centers):
        """Two-stage even-full-pel search: coarse 4-px grid around each
        center, then 2-px refinement."""
        h, w = src.shape
        best = (1 << 60, (0, 0))
        seen = set()
        R = self.search_range

        def probe(dy, dx):
            key = (dy, dx)
            if key in seen:
                return
            seen.add(key)
            s = self._sad(src, ref, y0 + dy, x0 + dx, h, w)
            nonlocal best
            if s < best[0]:
                best = (s, (dy, dx))

        for cy, cx in centers:
            for dy in range(cy - R, cy + R + 1, 4):
                for dx in range(cx - R, cx + R + 1, 4):
                    probe(dy, dx)
        # refine on the 2-px grid around the winner
        by, bx = best[1]
        for dy in (by - 2, by, by + 2):
            for dx in (bx - 2, bx, bx + 2):
                probe(dy, dx)
        return best

    def inter_block(self, tc, r, c, bsize, stack) -> dict:
        y0, x0 = r * 4, c * 4
        h, w = 4 * (1 << (bsize // 3)), 0  # unused; compute directly
        from av1tpu.spec.enums import BLOCK_H, BLOCK_W
        h, w = BLOCK_H[bsize], BLOCK_W[bsize]
        src = tc.source[0][y0 : y0 + h, x0 : x0 + w]
        from av1tpu.spec.enums import LAST_FRAME
        ref = np.asarray(tc.ref_planes[LAST_FRAME][0])

        # candidate centers: zero MV + stack predictions (even fullpel)
        centers = {(0, 0)}
        for mv in stack.stack[: stack.num_found]:
            fy, fx = _round_even_fullpel(mv)
            centers.add((fy // 8, fx // 8))
        sad_best, (dy, dx) = self._search(src, ref, y0, x0, centers)
        mv = (dy * 8, dx * 8)

        # mode choice by rate: prefer the cheapest signaling for this MV
        sad_zero = self._sad(src, ref, y0, x0, h, w)
        nearest = stack.stack[0] if stack.num_found >= 1 else None
        near = stack.stack[1] if stack.num_found >= 2 else None

        options = []
        options.append((sad_zero + self.sad_lam * 2, GLOBALMV, (0, 0), 0))
        if nearest is not None and nearest[0] % 16 == 0 \
                and nearest[1] % 16 == 0:
            s = self._sad(src, ref, y0 + nearest[0] // 8,
                          x0 + nearest[1] // 8, h, w)
            options.append((s + self.sad_lam * 3, NEARESTMV, nearest, 0))
        if near is not None and near != nearest and near[0] % 16 == 0 \
                and near[1] % 16 == 0:
            s = self._sad(src, ref, y0 + near[0] // 8, x0 + near[1] // 8,
                          h, w)
            options.append((s + self.sad_lam * 4, NEARMV, near, 0))
        pred = stack.stack[0]
        diff = (mv[0] - pred[0], mv[1] - pred[1])
        options.append((sad_best
                        + self.sad_lam * (3 + _mv_bits_estimate(diff)),
                        NEWMV, mv, 0))
        options.sort(key=lambda o: o[0])
        cost, mode, mv, rmi = options[0]
        return {"is_inter": True, "mode": mode, "mv": mv,
                "ref_mv_idx": rmi, "stack": stack}
