"""Quality metric sanity and monotonicity (the reference never computed
these; SURVEY §5 calls filling them a first-class improvement)."""

import numpy as np
import pytest

from av1tpu.metrics import msssim, psnr, ssim, tpu_vmaf, vif_features


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(128, 192)).astype(np.float64)
    # smooth it so it resembles an image rather than pure noise
    for _ in range(3):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                + np.roll(base, -1, 0) + np.roll(base, -1, 1)) / 5
    ref = np.clip(base, 0, 255).astype(np.uint8)
    def degrade(sigma):
        noisy = ref.astype(np.float64) + rng.normal(0, sigma, ref.shape)
        return np.clip(noisy, 0, 255).astype(np.uint8)
    return ref, degrade


def test_identity_is_perfect(frames):
    ref, _ = frames
    assert float(ssim(ref, ref)) == pytest.approx(1.0, abs=1e-5)
    assert float(msssim(ref, ref)) == pytest.approx(1.0, abs=1e-4)
    assert float(psnr(ref, ref)) > 90
    assert float(tpu_vmaf(ref, ref)) > 95
    vif = np.asarray(vif_features(ref, ref))
    assert vif.shape == (4,)
    assert np.all(vif > 0.99)


def test_monotone_in_distortion(frames):
    ref, degrade = frames
    scores = {name: [] for name in ("psnr", "ssim", "msssim", "vmaf")}
    for sigma in (2, 8, 24):
        dis = degrade(sigma)
        scores["psnr"].append(float(psnr(ref, dis)))
        scores["ssim"].append(float(ssim(ref, dis)))
        scores["msssim"].append(float(msssim(ref, dis)))
        scores["vmaf"].append(float(tpu_vmaf(ref, dis)))
    for name, vals in scores.items():
        assert vals[0] > vals[1] > vals[2], (name, vals)
    # plausible ranges for mild noise
    assert 30 < scores["psnr"][1] < 40
    assert 0.5 < scores["ssim"][1] < 1.0


def test_psnr_matches_direct_formula(frames):
    ref, degrade = frames
    dis = degrade(10)
    mse = np.mean((ref.astype(np.float64) - dis.astype(np.float64)) ** 2)
    expect = 10 * np.log10(255 ** 2 / mse)
    assert float(psnr(ref, dis)) == pytest.approx(expect, abs=1e-3)


def test_batched_and_monotone_in_q(frames):
    ref, degrade = frames
    stack_ref = np.stack([ref, ref, ref])
    stack_dis = np.stack([degrade(4), degrade(4), degrade(4)])
    s = float(ssim(stack_ref, stack_dis))
    assert 0 < s < 1
    v = np.asarray(vif_features(stack_ref, stack_dis))
    assert v.shape == (3, 4)


def test_encoder_quality_monotone_in_qindex():
    """Through the actual TPU encoder: lower qindex -> better metrics."""
    import jax

    from av1tpu.models.intra_v import encode_intra_v
    from av1tpu.utils import synthetic_clip

    clip = synthetic_clip(192, 128, 1, seed=9)
    y = clip.y[0].astype(np.int32)
    u = clip.u[0].astype(np.int32)
    v = clip.v[0].astype(np.int32)
    scores = []
    for q in (40, 120, 230):
        out = encode_intra_v(jax.numpy.asarray(y), jax.numpy.asarray(u),
                             jax.numpy.asarray(v), q)
        ry = np.asarray(out["recon_y"])
        scores.append((float(psnr(y, ry)), float(tpu_vmaf(y, ry))))
    assert scores[0][0] > scores[1][0] > scores[2][0]
    assert scores[0][1] >= scores[1][1] >= scores[2][1]
