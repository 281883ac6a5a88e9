"""Full-resolution global-motion regression test (av1tpu/models/inter_v).

Quarter-res box-pooled SAD aliases on periodic content: before the
full-resolution global stage, a tiled-texture pan coded most blocks with
a wrong MV (one texture period off), multiplying inter bitrate.  This
pins the fix: on periodic content panning by a non-multiple-of-4 shift,
the dominant coded MV must be the true shift.
"""

import numpy as np
import jax.numpy as jnp

from av1tpu.models.inter_v import _search_mv, encode_inter_v


def _periodic_pan_pair(h=128, w=192, shift=(3, 3), period=8, seed=5):
    """A tiled (periodic) canvas panned by `shift` px between frames, with
    a few aperiodic patches so the problem is well-posed."""
    rng = np.random.RandomState(seed)
    tile = rng.randint(0, 255, (period, period))
    canvas = np.tile(tile, ((h + 64) // period + 1, (w + 64) // period + 1))
    canvas = canvas[: h + 64, : w + 64].astype(np.int32)
    for _ in range(6):  # aperiodic anchors
        r, c = rng.randint(0, h), rng.randint(0, w)
        canvas[r : r + 16, c : c + 16] = rng.randint(0, 255, (16, 16))
    f0 = canvas[:h, :w]
    f1 = canvas[shift[0] : shift[0] + h, shift[1] : shift[1] + w]
    return f0, f1


def test_periodic_pan_true_mv():
    f0, f1 = _periodic_pan_pair()
    mv8, _, _, _ = _search_mv(jnp.asarray(f1), jnp.asarray(f0),
                           jnp.float32(10.0), 255)
    mv = np.asarray(mv8).reshape(-1, 2)
    frac_true = float((mv == [24, 24]).all(axis=1).mean())
    assert frac_true > 0.9, f"only {frac_true:.2f} of blocks at true MV"


def test_static_content_zero_mv():
    rng = np.random.RandomState(7)
    f = rng.randint(0, 255, (128, 192)).astype(np.int32)
    mv8, _, _, _ = _search_mv(jnp.asarray(f), jnp.asarray(f),
                           jnp.float32(10.0), 255)
    assert (np.asarray(mv8) == 0).all()


def test_inter_skip_on_pure_pan():
    """With the true MV found and skip RDO on, a losslessly-shifted frame
    codes no residual in the INTERIOR (the bottom/right strips reveal new
    content the reference cannot predict and must be coded)."""
    f0, f1 = _periodic_pan_pair()
    h, w = f0.shape
    u0 = np.full((h // 2, w // 2), 128, np.int32)
    o = encode_inter_v(jnp.asarray(f1), jnp.asarray(u0), jnp.asarray(u0),
                       jnp.asarray(f0), jnp.asarray(u0), jnp.asarray(u0),
                       jnp.int32(80))
    ly = np.asarray(o["levels_y"])[: h // 16 - 1, : w // 16 - 1]
    nz = int((ly != 0).sum())
    assert nz == 0, f"{nz} nonzero interior levels on pure pan"
