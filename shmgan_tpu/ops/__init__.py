from shmgan_tpu.ops.color import rgb_to_yuv, yuv_to_rgb, rgb_to_lab  # noqa: F401
from shmgan_tpu.ops.standardize import (  # noqa: F401
    per_image_standardization, rescale_01,
)
from shmgan_tpu.ops.ssim import ssim, psnr  # noqa: F401
from shmgan_tpu.ops.polar import estimate_diffuse, calc_dop, gram_matrix  # noqa: F401
