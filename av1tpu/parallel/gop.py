"""Multi-device production GOP encode: scene-parallel over a device mesh.

The reference scales one job across N av1an workers, each encoding a
scene-aligned chunk (reference crates/daemon/src/encode/av1an.rs:100-101,
concurrency derivation crates/daemon/src/concurrency.rs:67-73).  The
TPU-native mapping keeps the same axis: scenes are independent (each
starts at a keyframe and its CDF/recon chains never cross a cut), so the
scene batch is sharded over a 1-D `jax.sharding.Mesh` and every pipeline
stage — wavefront keyframe, CDEF strength search, partitioned inter steps
— is vmapped over the scene axis.  XLA partitions the vmap along the
sharded axis with zero collectives; the only host traffic is the compact
level buffers, exactly as on one device.

The streams are packed by the same host code as the single-device path,
so per-scene output is byte-identical to encoding that scene alone.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from av1tpu.models.cdef_tpu import CDEF_PRESETS, cdef_fused, cdef_sse_fused
from av1tpu.models.inter_v import (
    _gop_step_body, _gop_step_part_body, fetch_inter_part_prefix,
)
from av1tpu.models.intra_wave import _wave_key_body


def scene_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[: n_devices]
    return Mesh(np.array(devs), ("scenes",))


def _shard(mesh: Mesh, arr, batch_axes: int = 1):
    spec = P(*(("scenes",) + (None,) * (np.ndim(arr) - 1)))
    return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap", "lam_scale"))
def _scenes_key(frames0, qs, lf3s, gates, height: int, width: int,
                cap: int, lam_scale: float = 1.0):
    """Batched wavefront keyframes: (S, n_pix) -> ((S, buf), (S, ref)).
    gates: (S,) float32 per-scene RDOQ noise floors (0 = off)."""
    return jax.vmap(
        lambda f, q, l, g: _wave_key_body(f, q, height, width, cap, l,
                                          lam_scale, g)
    )(frames0, qs, lf3s, gates)


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "bit_depth"))
def _scenes_cdef(refs, srcs, skip8s, height: int, width: int,
                 bit_depth: int = 8):
    """Batched per-scene CDEF strength search + apply: each scene tries
    every preset, keeps the least-distortion one (first minimum = weakest
    preset, matching the host search's tie-breaking)."""
    presets = jnp.asarray(CDEF_PRESETS)

    def one(ref, src, skip8):
        sses = jax.vmap(
            lambda p: cdef_sse_fused(ref, src, skip8, p, height, width,
                                     3, bit_depth))(presets)
        cs = presets[jnp.argmin(sses)]
        return cdef_fused(ref, skip8, cs, height, width, 3, bit_depth), cs

    return jax.vmap(one)(refs, srcs, skip8s)


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap", "part"))
def _scenes_step(frames, refs, qs, lf3s, cdefs, height: int, width: int,
                 cap: int, part: bool, glds=None, mvs=None, gates=None):
    """One batched inter step: (S, n_pix) frames against (S, n_pix) refs.
    glds: optional (S, n_pix) GOLDEN references (the filtered keyframes)
    for per-block two-ref coding; mvs: (S, rows, cols, 2) previous-frame
    full-pel MV fields (temporal search candidates); gates: (S,) float32
    per-scene RDOQ sensor-noise floors — all partitioned path only.
    Partitioned returns (bufs, refs, mvs)."""
    if part:
        assert glds is not None and mvs is not None
        if gates is None:
            gates = jnp.zeros(frames.shape[0], jnp.float32)
        return jax.vmap(
            lambda f, r, q, l, c, g, m, ng: _gop_step_part_body(
                f, r, q, height, width, cap, l, c, g, m, ng)
        )(frames, refs, qs, lf3s, cdefs, glds, mvs, gates)
    return jax.vmap(
        lambda f, r, q, l, c: _gop_step_body(f, r, q, height, width, cap,
                                             l, c)
    )(frames, refs, qs, lf3s, cdefs)


@jax.jit
def _freeze_final(final_refs, refs, lens, t):
    """Keep refs from steps past each scene's real length out of the
    reported final recon: adopt step t's ref only where t < len_s."""
    keep = (t < lens)[:, None]
    return jnp.where(keep, refs, final_refs)


class SceneBatchEncoder:
    """Host driver for one batch of scenes (the CLI's --workers path).

    scenes: list of per-scene dicts with
      frames: (L_s, n_pix) fused uint8/uint16 sources (keyframe first)
      q / key_q: scene and keyframe qindex
      key_lf / inter_lf: (3,) loop-filter levels
    The batch is padded to the mesh size with copies of scene 0 (their
    outputs are discarded) and shorter scenes repeat their last frame
    (padded steps keep shapes static; their buffers are never packed).
    """

    def __init__(self, scenes, mesh: Mesh, height: int, width: int,
                 bit_depth: int = 8):
        self.real = len(scenes)
        n = mesh.devices.size
        pad = (-len(scenes)) % n
        self.scenes = scenes + [scenes[0]] * pad
        self.mesh = mesh
        self.h, self.w = height, width
        self.bd = bit_depth
        self.lens = [s["frames"].shape[0] for s in self.scenes]
        self.lmax = max(self.lens)

    def _frame(self, s, t):
        """Scene s's frame t (clamped: padded steps repeat the last)."""
        fr = self.scenes[s]["frames"]
        return fr[min(t, fr.shape[0] - 1)]

    def encode(self, key_cap: int, inter_cap: int, part: bool = True,
               skip8_host_fn=None, key_lam_scale: float = 1.0):
        """Run the batch.  Returns per real scene: dict with key_buf,
        inter_bufs (L_s - 1 of them), cdef_s, and the final ref (device,
        per-scene) for PSNR.  skip8_host_fn(bitmap) -> (H/8, W/8) bool —
        the CLI's skip map extractor for the keyframe CDEF search."""
        S = len(self.scenes)
        f0 = np.stack([self._frame(s, 0) for s in range(S)])
        qs = jnp.asarray([s["key_q"] for s in self.scenes], jnp.int32)
        klf = jnp.asarray([s["key_lf"] for s in self.scenes], jnp.int32)
        f0d = _shard(self.mesh, f0)
        gates = jnp.asarray([s.get("key_gate", 0.0) for s in self.scenes],
                            jnp.float32)
        bufs, refs = _scenes_key(f0d, _shard(self.mesh, qs),
                                 _shard(self.mesh, klf),
                                 _shard(self.mesh, gates),
                                 self.h, self.w, key_cap,
                                 key_lam_scale)
        key_bufs = np.asarray(bufs)

        # keyframe CDEF: skip maps from the fetched bitmaps (host), then
        # one batched search+apply
        skip8s = np.stack([skip8_host_fn(key_bufs[s]) for s in range(S)])
        refs, cdefs = _scenes_cdef(refs, f0d, _shard(self.mesh, skip8s),
                                   self.h, self.w, self.bd)
        cdef_np = np.asarray(cdefs)
        glds = refs  # GOLDEN slot 1: the filtered keyframes, scene-constant

        iqs = jnp.asarray([s["q"] for s in self.scenes], jnp.int32)
        ilf = jnp.asarray([s["inter_lf"] for s in self.scenes], jnp.int32)
        iqs_d = _shard(self.mesh, iqs)
        ilf_d = _shard(self.mesh, ilf)
        inter_bufs = [[] for _ in range(S)]
        fstates = [{} for _ in range(S)]  # per-scene prefix predictors

        def collect(t, bufs):
            if part:
                # per-scene PREFIX fetch: only the used bytes cross the
                # device->host link (the production bottleneck)
                for s in range(S):
                    if t < self.lens[s]:
                        inter_bufs[s].append(fetch_inter_part_prefix(
                            bufs[s], self.h, self.w, fstates[s]))
                return
            bt = np.asarray(bufs)
            for s in range(S):
                if t < self.lens[s]:
                    inter_bufs[s].append(bt[s])

        # each scene's LAST real recon (shorter scenes keep stepping on
        # padded repeat frames to hold shapes static; those steps must not
        # leak into the reported per-scene recon)
        lens_d = _shard(self.mesh, jnp.asarray(self.lens, jnp.int32))
        final_refs = refs  # scenes of length 1: the CDEF'd keyframe
        mvs = _shard(self.mesh, jnp.zeros(
            (S, self.h // 16, self.w // 16, 2), jnp.int32)) if part \
            else None
        igates = _shard(self.mesh, jnp.asarray(
            [s.get("inter_gate", 0.0) for s in self.scenes], jnp.float32))
        pending = None  # one-step fetch window: step t's transfer + host
        for t in range(1, self.lmax):  # work overlap step t+1's compute
            ft = _shard(self.mesh,
                        np.stack([self._frame(s, t) for s in range(S)]))
            if part:
                bufs, refs, mvs = _scenes_step(
                    ft, refs, iqs_d, ilf_d, cdefs, self.h, self.w,
                    inter_cap, part, glds=glds, mvs=mvs, gates=igates)
            else:
                bufs, refs = _scenes_step(ft, refs, iqs_d, ilf_d, cdefs,
                                          self.h, self.w, inter_cap, part)
            final_refs = _freeze_final(final_refs, refs, lens_d, t)
            if pending is not None:
                collect(*pending)
            pending = (t, bufs)
        if pending is not None:
            collect(*pending)
        refs_np = np.asarray(final_refs)
        return [{"key_buf": key_bufs[s], "inter_bufs": inter_bufs[s],
                 "cdef_s": cdef_np[s], "ref": refs_np[s]}
                for s in range(self.real)]
