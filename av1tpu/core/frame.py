"""Device-side frame model.

Frames live in HBM as planar tensors padded to superblock multiples so every
downstream kernel sees static, MXU/VPU-aligned shapes.  Pixels are carried as
int32 lanes (fixed-point; 8- or 10-bit ranges) because TPU integer compute on
sub-32-bit types is emulated, while the transforms require exact integer
arithmetic (AV1 inverse transforms are normative integer ops — see
av1tpu.spec.transforms).

The reference framework never represents frames at all (pixels stay inside the
external av1an process; reference crates/daemon/src/encode/av1an.rs:126-139).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from av1tpu.utils.yuv import Clip

__all__ = ["FrameBatch", "pad_to_multiple", "from_clip"]


def pad_to_multiple(x: np.ndarray, multiple: int, axes=(-2, -1)) -> np.ndarray:
    """Edge-pad the trailing spatial axes up to a multiple (AV1 pads frame
    borders by pixel replication, matching decoder edge extension)."""
    pads = [(0, 0)] * x.ndim
    for ax in axes:
        size = x.shape[ax]
        pad = (-size) % multiple
        pads[ax % x.ndim] = (0, pad)
    if not any(p[1] for p in pads):
        return x
    return np.pad(x, pads, mode="edge")


@dataclasses.dataclass
class FrameBatch:
    """A batch of frames resident on device.

    y: (T, Hp, Wp) int32, u/v: (T, Hp/2, Wp/2) int32 — padded to ``sb_size``
    (luma) so that every superblock grid is complete.  ``height``/``width``
    are the true (unpadded) dimensions used for bitstream headers and for
    cropping reconstructions.
    """

    y: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    height: int
    width: int
    bit_depth: int = 8
    sb_size: int = 64

    @property
    def padded_height(self) -> int:
        return self.y.shape[-2]

    @property
    def padded_width(self) -> int:
        return self.y.shape[-1]

    @property
    def num_frames(self) -> int:
        return self.y.shape[0]


def from_clip(clip: Clip, sb_size: int = 64) -> FrameBatch:
    """Ingest a host clip: pad planes to superblock multiples and upload."""
    clip.validate()
    y = pad_to_multiple(clip.y.astype(np.int32), sb_size)
    u = pad_to_multiple(clip.u.astype(np.int32), sb_size // 2)
    v = pad_to_multiple(clip.v.astype(np.int32), sb_size // 2)
    return FrameBatch(
        y=jnp.asarray(y),
        u=jnp.asarray(u),
        v=jnp.asarray(v),
        height=clip.height,
        width=clip.width,
        bit_depth=clip.bit_depth,
        sb_size=sb_size,
    )
