"""Multi-chip scaling: chunk-parallel encode over a device mesh.

The reference's only intra-job parallelism is av1an's chunk farm — N worker
processes each encoding a scene-cut-aligned chunk (SURVEY P1,
reference crates/daemon/src/encode/av1an.rs:100).  The TPU-native mapping is
the same axis, minus the processes: shard the chunk batch over a 1-D
`jax.sharding.Mesh` and jit the whole encode step once; XLA runs each
device's chunks locally with no cross-device communication (chunks are
keyframe-aligned and independent), so scaling is embarrassingly linear over
ICI and the only host traffic is the compact level buffers.

Works identically on one real chip (mesh of 1), a v5e slice, or the
8-device virtual CPU mesh the tests use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from av1tpu.models.intra_v import encode_intra_v_compact


def chunk_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("chunks",))


def shard_frames(frames: np.ndarray, mesh: Mesh):
    """Place a (K, n_pixels) fused-frame batch with K sharded over the mesh.
    K must be a multiple of the mesh size."""
    n = mesh.devices.size
    if frames.shape[0] % n:
        raise ValueError(
            f"frame batch {frames.shape[0]} not divisible by mesh size {n}")
    sharding = NamedSharding(mesh, P("chunks", None))
    return jax.device_put(jnp.asarray(frames), sharding)


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "cap"))
def encode_chunks_sharded(frames, qindex, height: int, width: int,
                          cap: int = 163840):
    """Encode a sharded (K, n_pixels) frame batch; each device encodes its
    own frames (vmap inside, sharding outside — XLA partitions the vmap over
    the batch axis with zero collectives).  Returns (K, compact_len) int16
    sharded the same way."""
    return jax.vmap(
        lambda f: encode_intra_v_compact(f, qindex, height, width, cap)
    )(frames)


def encode_batch(frames: np.ndarray, qindex: int, height: int, width: int,
                 mesh: Mesh | None = None, cap: int = 163840) -> np.ndarray:
    """Host convenience: shard, encode, fetch.  frames: (K, n_pixels) uint8
    or uint16 fused sources."""
    mesh = mesh or chunk_mesh()
    sharded = shard_frames(frames, mesh)
    out = encode_chunks_sharded(sharded, jnp.int32(qindex), height, width,
                                cap)
    return np.asarray(out)
