"""Wavefront full-mode intra pipeline: TPU decisions replayed through the
spec engine must be bit-exact, streams must decode in both decoders, and
the C++ packer (uv DC variant) must be byte-identical."""

import os
import subprocess

import numpy as np
import pytest

from av1tpu.models.intra_wave import (
    WAVE_MODES, encode_intra_wave, encode_intra_wave_key_recon,
)
from av1tpu.models.intra_v import fuse_planes, split_compact
from av1tpu.spec import encode_frame as ef
from av1tpu.spec.cdf_state import EncCoder
from av1tpu.spec.enums import DC_PRED
from av1tpu.spec.obu import write_ivf
from av1tpu.spec.tile import FixedPartitionPlanner, TileCoder
from av1tpu.utils import read_y4m, synthetic_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")
LIB = os.path.join(REPO, "native", "build", "libav1pack.so")


class WavePlanner(FixedPartitionPlanner):
    def __init__(self, out):
        super().__init__(leaf_bsize=6, uv_mode=DC_PRED)
        self.out = {k: np.asarray(v) for k, v in out.items()}

    def modes(self, tc, r, c, bsize):
        return int(self.out["modes"][r // 4, c // 4]), DC_PRED

    def tx_type(self, tc, plane, tx, mode):
        from av1tpu.spec.enums import MODE_TO_TXFM
        return MODE_TO_TXFM[mode]  # the wave pipeline's derived tx

    def quantize(self, tc, coefs_f, plane, tx, dc_q, ac_q, shift, x=0, y=0):
        n = 16 if plane == 0 else 8
        g = self.out[("levels_y", "levels_u", "levels_v")[plane]]
        return g[y // n, x // n].astype(np.int64)


@pytest.mark.parametrize("seed,w,h,q", [(33, 96, 64, 100),
                                        (44, 192, 128, 60),
                                        (55, 128, 192, 160)])
def test_wave_matches_engine_and_decoders(tmp_path, seed, w, h, q):
    clip = synthetic_clip(w, h, 1, seed=seed)
    out = {k: np.asarray(v) for k, v in encode_intra_wave(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}
    s, recon = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0],
                                  ef.EncoderConfig(base_q_idx=q),
                                  planner=WavePlanner(out))
    for p, name in enumerate("yuv"):
        assert np.array_equal(np.asarray(out[f"recon_{name}"]), recon[p]), \
            name
    # the full mode set must actually be exercised over the corpus seeds
    used = set(np.asarray(out["modes"]).ravel().tolist())
    assert used & set(WAVE_MODES)

    if not os.path.exists(TOOL):
        pytest.skip("av1_tool not built")
    ivf = str(tmp_path / "t.ivf")
    y4m = str(tmp_path / "t.y4m")
    write_ivf(ivf, [s], w, h)
    for codec in ("libdav1d", "libaom-av1"):
        r = subprocess.run([TOOL, "decode", ivf, y4m, "--codec", codec],
                           capture_output=True, text=True)
        assert r.returncode == 0, (codec, r.stderr[:200])
        d = read_y4m(y4m)
        for p, theirs in enumerate((d.y[0], d.u[0], d.v[0])):
            assert np.array_equal(recon[p], theirs.astype(np.int64)), \
                (codec, p)


def test_wave_photo_crop_regression(tmp_path):
    """Real-photo content at a width where D45/D67 blocks have same-slope
    above-right neighbors — the case that exposed the r+c (non-WPP)
    wavefront schedule bug (above-right context must come from d-1)."""
    import sys
    sys.path.insert(0, REPO)
    from tools.corpus import get_clip_y4m
    full = read_y4m(get_clip_y4m("photo", 1280, 720, 16))
    y = full.y[0][:192, :320].astype(np.int32)
    u = full.u[0][:96, :160].astype(np.int32)
    v = full.v[0][:96, :160].astype(np.int32)
    q = 112
    out = {k: np.asarray(val) for k, val in
           encode_intra_wave(y, u, v, q).items()}
    s, recon = ef.encode_keyframe(y, u, v, ef.EncoderConfig(base_q_idx=q),
                                  planner=WavePlanner(out))
    for p, name in enumerate("yuv"):
        assert np.array_equal(np.asarray(out[f"recon_{name}"]), recon[p]), \
            name


@pytest.mark.skipif(not os.path.exists(LIB), reason="libav1pack not built")
def test_wave_packer_byte_identical():
    w, h, q = 128, 64, 110
    clip = synthetic_clip(w, h, 1, seed=66)
    out = {k: np.asarray(v) for k, v in encode_intra_wave(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}

    cfg = ef.EncoderConfig(base_q_idx=q)
    seq = ef.make_sequence_header(w, h, cfg)
    fh = ef.make_frame_header(seq, cfg)
    src = [clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
           clip.v[0].astype(np.int32)]
    recon = [np.zeros_like(p) for p in src]
    coder = EncCoder(disable_cdf_update=bool(fh.disable_cdf_update))
    TileCoder(seq, fh, coder, recon, source=src,
              planner=WavePlanner(out)).code_tile()
    py_tile = coder.done()

    from av1tpu.coding import Packer
    flat = np.concatenate([out["levels_y"].reshape(-1),
                           out["levels_u"].reshape(-1),
                           out["levels_v"].reshape(-1)]).astype(np.int16)
    sig = flat != 0
    bitmap = np.packbits(sig, bitorder="little").view(np.uint16)
    cpp = Packer().pack_tile_compact(
        bitmap, flat[sig], h, w, q,
        modes=out["modes"].reshape(-1).astype(np.int16), uv_mode=0,
        tx_from_mode=True)
    assert cpp == py_tile


def test_wave_key_recon_transport_roundtrip():
    w, h, q = 128, 64, 120
    clip = synthetic_clip(w, h, 1, seed=77)
    fused = fuse_planes(clip.y[0], clip.u[0], clip.v[0])
    buf, recon = encode_intra_wave_key_recon(fused, q, h, w)
    out = {k: np.asarray(v) for k, v in encode_intra_wave(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}
    count, bm, vals, modes = split_compact(np.asarray(buf), h, w)
    assert count <= len(vals)
    assert np.array_equal(modes.reshape(h // 16, w // 16), out["modes"])
    flat_ref = np.concatenate([out["levels_y"].reshape(-1),
                               out["levels_u"].reshape(-1),
                               out["levels_v"].reshape(-1)])
    sig = np.unpackbits(bm.view(np.uint8), bitorder="little")
    flat = np.zeros(sig.size, np.int16)
    flat[sig.astype(bool)] = vals[: int(sig.sum())]
    assert np.array_equal(flat, flat_ref)
    rec = np.asarray(recon)
    assert np.array_equal(rec[: h * w].reshape(h, w), out["recon_y"])
