from .quality import (  # noqa: F401
    msssim, psnr, ssim, tpu_vmaf, vif_features,
)
