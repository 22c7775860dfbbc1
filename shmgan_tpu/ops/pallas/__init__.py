from shmgan_tpu.ops.pallas.preprocess import fused_standardize_yuv  # noqa: F401
