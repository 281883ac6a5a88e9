"""Per-frame byte breakdown of the production GOP encode on the corpus:
keyframe vs inter bytes per clip/q, plus SVT's total at a comparable
point.  Answers 'where do the BD-rate bytes actually go?' so quality
work targets the dominant term (VERDICT: texture/synth drive the mean).

Usage: python tools/diag_bytes.py [--clips ...] [--qs 48,112]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.corpus import get_clip_y4m  # noqa: E402


def main():
    from av1tpu.cli import encode_clip
    from av1tpu.utils import read_y4m
    from av1tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", default="photo,texture,screen,synth")
    ap.add_argument("--qs", default="48,112")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()

    for name in args.clips.split(","):
        y4m = get_clip_y4m(name, args.width, args.height, args.frames)
        clip = read_y4m(y4m)
        for q in (int(x) for x in args.qs.split(",")):
            streams, stats = encode_clip(clip, q, chunk=8, metric="psnr",
                                         gop=True)
            sizes = np.array([len(s) for s in streams])
            # keyframes carry a sequence header; identify them by scene
            # boundaries: stats has scene count, keyframe = largest-per-
            # scene is unreliable — re-derive from the TU bytes (keyframe
            # TUs contain an OBU_SEQUENCE_HEADER, type 1, after the TD)
            iskey = np.array([(s[2] >> 3) & 0xF == 1 if len(s) > 3
                              else False for s in streams])
            kb = int(sizes[iskey].sum())
            ib = int(sizes[~iskey].sum())
            print(json.dumps({
                "clip": name, "q": q,
                "keyframe_bytes": kb, "inter_bytes": ib,
                "keyframes": int(iskey.sum()),
                "inter_frames": int((~iskey).sum()),
                "mean_inter_bytes": round(float(sizes[~iskey].mean()), 1)
                if (~iskey).any() else 0,
                "psnr_y": stats.get("psnr_y"),
            }), flush=True)


if __name__ == "__main__":
    main()
