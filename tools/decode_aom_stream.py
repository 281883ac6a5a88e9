"""Decode a libaom-produced intra stream with the spec engine and compare
against the system decoder's output — the behavioral validator for extracted
CDF tables and context derivations.

Usage: python tools/decode_aom_stream.py <stream.ivf> [--skip-search]
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from av1tpu.spec import cdf_state  # noqa: E402
from av1tpu.spec.encode_frame import decode_keyframe_tile  # noqa: E402
from av1tpu.spec.headers import (  # noqa: E402
    parse_frame_header, parse_sequence_header,
)
from av1tpu.spec.obu import parse_obus, read_ivf  # noqa: E402
from av1tpu.utils import read_y4m  # noqa: E402

TOOL = os.path.join(REPO, "native", "build", "av1_tool")


def decode_with_engine(path):
    info, frames = read_ivf(path)
    outs = []
    seq = None
    for f in frames:
        for o in parse_obus(f):
            if o.type == 1:
                seq = parse_sequence_header(o.payload)
            elif o.type == 6:
                fh, bits = parse_frame_header(o.payload, seq)
                tile = o.payload[(bits + 7) // 8 :]
                recon = decode_keyframe_tile(tile, seq, fh)
                outs.append((fh, recon))
            elif o.type in (3, 4):
                raise NotImplementedError("separate frame-header/tile OBUs")
    return outs


def reference_decode(path):
    y4m = path + ".ref.y4m"
    subprocess.run([TOOL, "decode", path, y4m], check=True,
                   capture_output=True)
    return read_y4m(y4m)


def compare(outs, ref):
    ok = True
    for t, (fh, recon) in enumerate(outs):
        planes = (ref.y[t], ref.u[t], ref.v[t])
        for p, theirs in enumerate(planes):
            ours = recon[p][: theirs.shape[0], : theirs.shape[1]]
            if not np.array_equal(ours, theirs.astype(np.int64)):
                d = np.abs(ours - theirs.astype(np.int64))
                print(f"frame {t} plane {p}: MISMATCH maxdiff {d.max()} "
                      f"ndiff {(d > 0).sum()} first {np.argwhere(d > 0)[0]}")
                ok = False
            else:
                print(f"frame {t} plane {p}: exact match")
    return ok


def main():
    path = sys.argv[1]
    ref = reference_decode(path)
    if "--skip-search" in sys.argv:
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from tablescan import LIBAOM, load_rodata_u16
        from extract_tables import row_arity
        A = load_rodata_u16(LIBAOM)[".rodata"]
        cands = []
        for off in range(len(A) - 12):
            if all(row_arity(A, off + i * 3, 3) == 2 for i in range(3)):
                cands.append((off, [[int(A[off + i * 3]), 0]
                                    for i in range(3)]))
        print(f"{len(cands)} candidates")
        for off, cand in cands:
            cdf_state.SKIP_OVERRIDE = cand
            try:
                outs = decode_with_engine(path)
            except Exception:
                continue
            finally:
                cdf_state.SKIP_OVERRIDE = None
            match = all(
                np.array_equal(
                    recon[p][: pl.shape[0], : pl.shape[1]],
                    pl.astype(np.int64))
                for t, (fh, recon) in enumerate(outs)
                for p, pl in enumerate((ref.y[t], ref.u[t], ref.v[t])))
            if match:
                print(f"SKIP MATCH at offset {off}: {[c[0] for c in cand]}")
                tab = os.path.join(REPO, "av1tpu", "spec", "tables",
                                   "mode_cdfs.npz")
                with np.load(tab) as z:
                    data = {k: z[k] for k in z.files}
                data["skip"] = np.array(cand, np.int32)
                np.savez(tab, **data)
                return
        print("no skip candidate matched")
        sys.exit(1)
    else:
        outs = decode_with_engine(path)
        sys.exit(0 if compare(outs, ref) else 1)


if __name__ == "__main__":
    main()
