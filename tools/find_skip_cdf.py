"""Behaviorally identify the default skip CDF table.

The skip cdf ([3 contexts][2 symbols]) is too small to pin down structurally
among the dozens of boolean cdf tables in libaom's mode region.  Instead we
search: for each candidate window of 3 consecutive arity-2 cdf rows in the
region, encode a test frame with our spec encoder using that candidate and
check whether dav1d reconstructs it bit-exactly.  Only the true spec table
can satisfy the decoder (the skip symbol is read for every block, and a
wrong cdf desynchronizes the range decoder immediately).

On success the table is appended to av1tpu/spec/tables/mode_cdfs.npz.
"""

import json
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
from av1tpu.utils import read_y4m, synthetic_clip  # noqa: E402

TOOL = os.path.join(REPO, "native", "build", "av1_tool")


def try_candidate(cand, clip, tmpdir="/tmp"):
    cdf_state.SKIP_OVERRIDE = cand
    try:
        stream, recon = ef.encode_keyframe(
            clip.y[0], clip.u[0], clip.v[0],
            ef.EncoderConfig(base_q_idx=100))
    except Exception:
        return False
    finally:
        cdf_state.SKIP_OVERRIDE = None
    ivf = os.path.join(tmpdir, "skipsearch.ivf")
    y4m = os.path.join(tmpdir, "skipsearch.y4m")
    write_ivf(ivf, [stream], clip.width, clip.height)
    r = subprocess.run([TOOL, "decode", ivf, y4m], capture_output=True,
                       text=True)
    if r.returncode != 0:
        return False
    d = read_y4m(y4m)
    for ours, theirs in zip(recon, (d.y[0], d.u[0], d.v[0])):
        if not np.array_equal(ours[: theirs.shape[0], : theirs.shape[1]],
                              theirs.astype(np.int64)):
            return False
    return True


def main():
    A = load_rodata_u16(LIBAOM)[".rodata"]
    # content guaranteeing a mix of skip and non-skip blocks
    clip = synthetic_clip(width=64, height=64, frames=1, seed=3)

    cands = []
    for off in range(42280, 49200):
        if all(row_arity(A, off + i * 3, 3) == 2 for i in range(3)):
            vals = [[int(A[off + i * 3]), 0] for i in range(3)]
            cands.append((off, vals))
    print(f"{len(cands)} candidate windows")

    for off, cand in cands:
        if try_candidate(cand, clip):
            print(f"MATCH at aom rodata offset {off}: "
                  f"{[c[0] for c in cand]}")
            path = os.path.join(REPO, "av1tpu", "spec", "tables",
                                "mode_cdfs.npz")
            with np.load(path) as z:
                data = {k: z[k] for k in z.files}
            data["skip"] = np.array(cand, np.int32)
            np.savez(path, **data)
            print("skip table saved to mode_cdfs.npz")
            return
    print("no candidate matched")
    sys.exit(1)


if __name__ == "__main__":
    main()
