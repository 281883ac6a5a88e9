"""Behaviorally identify the inter-frame binary default CDF tables that are
structurally ambiguous in libaom's .rodata: intra_inter [4], single_ref
[3][6], and the inter tx-type set-3 table [4].

Method (same as find_skip_cdf.py): encode a 2-frame stream (key + inter)
with candidate tables injected and check libdav1d reconstructs bit-exactly.
Stage 1 uses a COPY frame — every inter block is GLOBALMV with zero
residual (skip=1), so only skip/intra_inter/single_ref/newmv/zeromv are
read; the unknowns are intra_inter x single_ref, searched jointly over all
structurally valid windows in the mode region.  Stage 2 encodes a noisy
frame (residuals coded, 32x32 blocks -> inter tx set 3) to pin the set-3
table with the stage-1 results fixed.

On success the tables are merged into av1tpu/spec/tables/inter_cdfs.npz.
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from tablescan import LIBAOM, load_rodata_u16  # noqa: E402
from extract_tables import row_arity  # noqa: E402

from av1tpu.spec import cdf_state  # noqa: E402
from av1tpu.spec import encode_frame as ef  # noqa: E402
from av1tpu.spec.obu import write_ivf  # noqa: E402
from av1tpu.spec.tile import FixedPartitionPlanner  # noqa: E402
from av1tpu.utils import read_y4m, synthetic_clip  # noqa: E402

TOOL = os.path.join(REPO, "native", "build", "av1_tool")
OUT = os.path.join(REPO, "av1tpu", "spec", "tables", "inter_cdfs.npz")

REGION = (46000, 49600)


def binary_windows(A, rows):
    """All offsets of `rows` consecutive arity-2 width-3 cdf rows."""
    lo, hi = REGION
    out = []
    for o in range(lo, hi - rows * 3):
        if all(row_arity(A, o + r * 3, 3) == 2 for r in range(rows)):
            out.append(o)
    return out


def window_values(A, off, rows):
    return np.array([[int(A[off + 3 * r]), 0] for r in range(rows)],
                    np.int32)


def try_stream(clip, q, leaf, tmpdir="/tmp"):
    """Encode key+inter; return True iff dav1d reproduces the recon."""
    cfg = ef.EncoderConfig(base_q_idx=q)
    planner = FixedPartitionPlanner(leaf_bsize=leaf)
    try:
        s0, r0 = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                                    planner=FixedPartitionPlanner(
                                        leaf_bsize=6))
        s1, r1 = ef.encode_interframe(clip.y[1], clip.u[1], clip.v[1], r0,
                                      cfg, planner=planner)
    except Exception:
        return False
    ivf = os.path.join(tmpdir, "intersearch.ivf")
    y4m = os.path.join(tmpdir, "intersearch.y4m")
    write_ivf(ivf, [s0, s1], clip.width, clip.height)
    r = subprocess.run([TOOL, "decode", ivf, y4m], capture_output=True,
                       text=True)
    if r.returncode != 0:
        return False
    try:
        d = read_y4m(y4m)
    except Exception:
        return False
    if d.num_frames != 2:
        return False
    for ours, theirs in zip(r1, (d.y[1], d.u[1], d.v[1])):
        if not np.array_equal(ours[: theirs.shape[0], : theirs.shape[1]],
                              theirs.astype(np.int64)):
            return False
    return True


def main():
    A = load_rodata_u16(LIBAOM)[".rodata"]

    # stage 1: copy frame (all GLOBALMV + skip): unknowns intra_inter,
    # single_ref
    clip = synthetic_clip(64, 64, 2, seed=9)
    clip.y[1] = clip.y[0]
    clip.u[1] = clip.u[0]
    clip.v[1] = clip.v[0]

    w4 = binary_windows(A, 4)
    w18 = binary_windows(A, 18)
    print(f"{len(w4)} intra_inter candidates x {len(w18)} single_ref "
          f"candidates")

    found = None
    for i18 in w18:
        cdf_state.SINGLE_REF_OVERRIDE = window_values(A, i18, 18).reshape(
            3, 6, 2)
        for i4 in w4:
            cdf_state.INTRA_INTER_OVERRIDE = window_values(A, i4, 4)
            if try_stream(clip, 100, leaf=6):
                found = (i4, i18)
                print(f"stage1 HIT: intra_inter@{i4} single_ref@{i18}")
                break
        if found:
            break
    if not found:
        print("stage 1 failed: no candidate pair satisfies dav1d "
              "(MV stack/context bug more likely than missing tables)")
        return 1
    i4, i18 = found
    intra_inter = window_values(A, i4, 4)
    single_ref = window_values(A, i18, 18).reshape(3, 6, 2)

    # stage 2: noisy frame, 32x32 blocks -> non-skip residuals read the
    # inter tx-type set-3 cdf (TX_32X32 -> set 3 regardless of reduced)
    cdf_state.INTRA_INTER_OVERRIDE = intra_inter
    cdf_state.SINGLE_REF_OVERRIDE = single_ref
    clip2 = synthetic_clip(64, 64, 2, seed=11)
    hit3 = None
    for o in w4:
        cdf_state.INTER_TX3_OVERRIDE = window_values(A, o, 4)
        if try_stream(clip2, 100, leaf=9):
            hit3 = o
            print(f"stage2 HIT: inter_tx3@{o}")
            break
    if hit3 is None:
        print("stage 2 failed: inter tx set-3 table not found")
        return 1

    tables = dict(np.load(OUT)) if os.path.exists(OUT) else {}
    tables["intra_inter"] = intra_inter
    tables["single_ref"] = single_ref
    tables["inter_tx3"] = window_values(A, hit3, 4)
    np.savez(OUT, **tables)
    print("saved", OUT)
    return 0


if __name__ == "__main__":
    sys.exit(main())
