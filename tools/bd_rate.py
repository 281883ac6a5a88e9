"""BD-rate measurement: av1tpu intra encoder vs SVT-AV1 all-intra.

Encodes the same clip at several rate points with both encoders (SVT via the
system libsvtav1 with keyint=1, i.e. all-intra — the apples-to-apples anchor
for our intra-only pipeline), computes PSNR-Y per point, and reports the
Bjontegaard-Delta rate (piecewise-cubic integration over log-rate, the
standard formulation).  Results land in benchmarks/quality.json.

Usage: python tools/bd_rate.py [--width 640 --height 360 --frames 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
TOOL = os.path.join(REPO, "native", "build", "av1_tool")


def bd_rate(rate_a, psnr_a, rate_b, psnr_b) -> float:
    """BD-rate of B vs A in percent (negative = B needs fewer bits)."""
    la, lb = np.log10(rate_a), np.log10(rate_b)
    pa = np.polyfit(psnr_a, la, 3)
    pb = np.polyfit(psnr_b, lb, 3)
    lo = max(min(psnr_a), min(psnr_b))
    hi = min(max(psnr_a), max(psnr_b))
    if hi <= lo:
        raise ValueError("quality ranges do not overlap")
    ia = np.polyval(np.polyint(pa), [lo, hi])
    ib = np.polyval(np.polyint(pb), [lo, hi])
    avg_diff = ((ib[1] - ib[0]) - (ia[1] - ia[0])) / (hi - lo)
    return float((10 ** avg_diff - 1) * 100)


def psnr_y(src, dec) -> float:
    mse = np.mean((src.astype(np.float64) - dec.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / mse)


def run_svt_point(y4m, crf, tmp):
    out = os.path.join(tmp, f"svt_{crf}.ivf")
    r = subprocess.run(
        [TOOL, "encode", y4m, out, "--codec", "libsvtav1", "--preset", "6",
         "--crf", str(crf), "--keyint", "1"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    dec = os.path.join(tmp, "svt_dec.y4m")
    r = subprocess.run([TOOL, "decode", out, dec, "--codec", "libdav1d"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return stats["bytes"], dec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    from av1tpu.cli import encode_clip
    from av1tpu.utils import read_y4m, synthetic_clip, write_y4m

    clip = synthetic_clip(args.width, args.height, args.frames,
                          seed=args.seed)
    src_y = clip.y.astype(np.float64)
    fps = args.frames / 1.0  # nominal 1s clip for kbps math

    results = {"clip": {"width": args.width, "height": args.height,
                        "frames": args.frames, "seed": args.seed},
               "svt_allintra_preset6": [], "av1tpu_intra": []}

    with tempfile.TemporaryDirectory() as tmp:
        y4m = os.path.join(tmp, "src.y4m")
        write_y4m(y4m, clip)

        for crf in (25, 35, 45, 55):
            nbytes, dec = run_svt_point(y4m, crf, tmp)
            d = read_y4m(dec)
            p = np.mean([psnr_y(src_y[i], d.y[i])
                         for i in range(args.frames)])
            results["svt_allintra_preset6"].append(
                {"crf": crf, "bytes": nbytes, "psnr_y": round(float(p), 3)})
            print(f"svt crf={crf}: {nbytes} bytes psnr={p:.2f}", flush=True)

        for q in (60, 100, 150, 200):
            streams, stats = encode_clip(clip, q, metric="psnr", gop=False)
            nbytes = stats["bytes"]
            # decode through dav1d for honest numbers
            from av1tpu.spec.obu import write_ivf
            ivf = os.path.join(tmp, f"ours_{q}.ivf")
            dec = os.path.join(tmp, "ours_dec.y4m")
            write_ivf(ivf, streams, args.width, args.height)
            r = subprocess.run([TOOL, "decode", ivf, dec,
                                "--codec", "libdav1d"],
                               capture_output=True, text=True)
            assert r.returncode == 0, r.stderr
            d = read_y4m(dec)
            p = np.mean([psnr_y(src_y[i],
                                d.y[i][: args.height, : args.width])
                         for i in range(args.frames)])
            results["av1tpu_intra"].append(
                {"qindex": q, "bytes": nbytes, "psnr_y": round(float(p), 3)})
            print(f"ours q={q}: {nbytes} bytes psnr={p:.2f}", flush=True)

    ra = [pt["bytes"] * 8 * fps / args.frames / 1000
          for pt in results["svt_allintra_preset6"]]
    pa = [pt["psnr_y"] for pt in results["svt_allintra_preset6"]]
    rb = [pt["bytes"] * 8 * fps / args.frames / 1000
          for pt in results["av1tpu_intra"]]
    pb = [pt["psnr_y"] for pt in results["av1tpu_intra"]]
    bd = bd_rate(ra, pa, rb, pb)
    results["bd_rate_vs_svt_allintra_pct"] = round(bd, 2)
    print(f"BD-rate (av1tpu intra vs SVT all-intra preset 6): {bd:+.1f}%")

    out_path = os.path.join(REPO, "benchmarks", "quality.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
