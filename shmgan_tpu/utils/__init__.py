from shmgan_tpu.utils.logging import MetricsWriter, progress_bar  # noqa: F401
