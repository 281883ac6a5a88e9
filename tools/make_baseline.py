"""Measure the CPU baseline: SVT-AV1 preset 6, 1080p, on this host.

The reference publishes no numbers (BASELINE.md), so this script creates the
anchor the TPU encoder is compared against.  Results go to
benchmarks/baseline.json, which bench.py reads for its vs_baseline field.

Usage: python tools/make_baseline.py [--frames N] [--crf N] [--quick]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from av1tpu.utils import read_y4m, synthetic_clip, write_y4m  # noqa: E402


def psnr(a, b, maxv=255.0):
    import numpy as np

    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.0
    return 10.0 * np.log10(maxv * maxv / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--crf", type=int, default=30)
    ap.add_argument("--preset", type=int, default=6)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    tool = os.path.join(REPO, "native", "build", "av1_tool")
    if not os.path.exists(tool):
        raise SystemExit("build native first: cmake -S native -B native/build && cmake --build native/build")

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src.y4m")
        ivf = os.path.join(td, "out.ivf")
        dec = os.path.join(td, "dec.y4m")

        clip = synthetic_clip(
            width=args.width, height=args.height, frames=args.frames, seed=11
        )
        write_y4m(src, clip)

        enc = json.loads(
            subprocess.run(
                [tool, "encode", src, ivf, "--codec", "libsvtav1",
                 "--preset", str(args.preset), "--crf", str(args.crf)],
                check=True, capture_output=True, text=True,
            ).stdout
        )
        decj = json.loads(
            subprocess.run(
                [tool, "decode", ivf, dec], check=True, capture_output=True, text=True
            ).stdout
        )
        dclip = read_y4m(dec)
        psnr_y = psnr(clip.y, dclip.y)

    result = {
        "svt_preset6_1080p_fps": round(enc["encode_fps"], 3),
        "svt_encode": enc,
        "svt_decode_md5": decj["md5"],
        "psnr_y": round(float(psnr_y), 3),
        "source_pixels_per_sec": enc["encode_fps"] * args.width * args.height,
        "host_cores": os.cpu_count(),
        "clip": {
            "width": args.width, "height": args.height,
            "frames": args.frames, "synthetic_seed": 11,
        },
        "note": (
            "SVT-AV1 v1.4.1 via libavcodec (FFmpeg 5.1), single-core host. "
            "Reference quality anchor is SVT preset 3 CRF 8 (reference "
            "crates/daemon/src/encode/av1an.rs:14); the driver north star is "
            "measured against preset 6 (BASELINE.md)."
        ),
    }
    out = os.path.join(REPO, "benchmarks", "baseline.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["svt_encode"]))
    print(f"baseline written to {out}: {result['svt_preset6_1080p_fps']} fps, "
          f"PSNR-Y {result['psnr_y']} dB")


if __name__ == "__main__":
    main()
