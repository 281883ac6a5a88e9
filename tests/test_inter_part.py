"""Partitioned inter pipeline (32/64 merges): TPU decisions replayed
through the spec engine must be bit-exact and GOP streams must decode in
both system decoders.  Mirrors tests/test_partition.py for the inter
plane."""

import os

import numpy as np
import pytest

from av1tpu.models.inter_host import InterPartReplayPlanner
from av1tpu.models.inter_v import (
    encode_gop_chunk_part, encode_inter_part, split_compact_inter_part,
)
from av1tpu.models.intra_v import encode_intra_v, fuse_planes
from av1tpu.spec import encode_frame as ef
from tests.test_inter_pipeline import GridPlanner, check_decoders, moving_clip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")


def tpu_part_gop(clip, q):
    cfg = ef.EncoderConfig(base_q_idx=q)
    out0 = {k: np.asarray(v) for k, v in encode_intra_v(
        clip.y[0].astype(np.int32), clip.u[0].astype(np.int32),
        clip.v[0].astype(np.int32), q).items()}
    s0, recon = ef.encode_keyframe(clip.y[0], clip.u[0], clip.v[0], cfg,
                                   planner=GridPlanner(out0))
    streams, recons = [s0], [recon]
    tpu_recons = [(out0["recon_y"], out0["recon_u"], out0["recon_v"])]
    ref = tpu_recons[0]
    for k in range(1, clip.num_frames):
        o = {kk: np.asarray(v) for kk, v in encode_inter_part(
            clip.y[k].astype(np.int32), clip.u[k].astype(np.int32),
            clip.v[k].astype(np.int32), *ref, q).items()}
        s, recon = ef.encode_interframe(clip.y[k], clip.u[k], clip.v[k],
                                        recons[-1], cfg,
                                        planner=InterPartReplayPlanner(o))
        streams.append(s)
        recons.append(recon)
        tpu_recons.append((o["recon_y"], o["recon_u"], o["recon_v"]))
        ref = tpu_recons[-1]
    return streams, recons, tpu_recons


@pytest.mark.parametrize("seed,motion,q", [
    (61, (2, 4), 100),     # global even pan: 64-merges dominate
    (62, (0, 0), 140),     # static: all-skip large blocks
    (63, (-6, 10), 80),    # faster pan, finer q
])
def test_inter_part_matches_engine_and_decoders(tmp_path, seed, motion, q):
    clip = moving_clip(192, 128, 4, seed, *motion)
    streams, recons, tpu_recons = tpu_part_gop(clip, q)
    for k in range(clip.num_frames):
        for p in range(3):
            assert np.array_equal(tpu_recons[k][p], recons[k][p]), (k, p)
    if not os.path.exists(TOOL):
        pytest.skip("av1_tool not built")
    check_decoders(tmp_path, streams, recons, 192, 128, clip.num_frames)


def test_inter_part_actually_merges():
    """On a clean global pan the partition RDO must pick large blocks."""
    clip = moving_clip(192, 128, 2, seed=64, dy=2, dx=4)
    q = 140
    out0 = encode_intra_v(clip.y[0].astype(np.int32),
                          clip.u[0].astype(np.int32),
                          clip.v[0].astype(np.int32), q)
    o = {k: np.asarray(v) for k, v in encode_inter_part(
        clip.y[1].astype(np.int32), clip.u[1].astype(np.int32),
        clip.v[1].astype(np.int32), np.asarray(out0["recon_y"]),
        np.asarray(out0["recon_u"]), np.asarray(out0["recon_v"]),
        q).items()}
    merged64 = int((~o["split64"].astype(bool)).sum())
    merged32 = int((~o["split32"].astype(bool)).sum())
    assert merged64 + merged32 > 0, "no merges on a pure pan"


def test_gop_chunk_part_transport_roundtrip():
    """encode_gop_chunk_part buffers must round-trip the union layout."""
    from av1tpu.models.intra_part import part_sizes, split_compact_part

    clip = moving_clip(128, 64, 3, seed=65, dy=2, dx=2)
    q = 120
    out0 = encode_intra_v(clip.y[0].astype(np.int32),
                          clip.u[0].astype(np.int32),
                          clip.v[0].astype(np.int32), q)
    ref = np.concatenate([np.asarray(out0["recon_y"]).ravel(),
                          np.asarray(out0["recon_u"]).ravel(),
                          np.asarray(out0["recon_v"]).ravel()]).astype(
                              np.int32)
    frames = np.stack([fuse_planes(clip.y[k], clip.u[k], clip.v[k])
                       for k in (1, 2)])
    bufs, _, _mv = encode_gop_chunk_part(frames, ref, q, 64, 128)
    prev = (np.asarray(out0["recon_y"]), np.asarray(out0["recon_u"]),
            np.asarray(out0["recon_v"]))
    for k in range(2):
        o = {kk: np.asarray(v) for kk, v in encode_inter_part(
            clip.y[k + 1].astype(np.int32), clip.u[k + 1].astype(np.int32),
            clip.v[k + 1].astype(np.int32), *prev, q).items()}
        (count, bm, vals, sp16, sp32, sp64, rf16,
         mv) = split_compact_inter_part(np.asarray(bufs[k]), 64, 128)
        assert count <= len(vals)
        assert np.array_equal(sp16.astype(bool), o["split16"])
        assert np.array_equal(rf16.astype(bool), o["ref16"])
        assert np.array_equal(sp32.astype(bool), o["split32"])
        assert np.array_equal(sp64.astype(bool), o["split64"])
        assert np.array_equal(mv, o["mv8"])
        # union-layout expansion must match the merged grids
        from av1tpu.models.intra_part import _embed64, _merge_quads
        import jax.numpy as jnp
        y16 = np.asarray(_embed64(_merge_quads(
            jnp.asarray(o["lv16"]), jnp.asarray(o["lv32"]), 16),
            jnp.asarray(o["lv64"])))
        sig = np.unpackbits(bm.view(np.uint8), bitorder="little")
        ncoef_y = y16.size
        flat = np.zeros(sig.size, np.int16)
        flat[sig.astype(bool)] = vals[: int(sig.sum())]
        assert np.array_equal(flat[:ncoef_y].reshape(y16.shape), y16)
        prev = (o["recon_y"], o["recon_u"], o["recon_v"])
