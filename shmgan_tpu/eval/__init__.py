from shmgan_tpu.eval.metrics import evaluate_pair, MetricAccumulator  # noqa: F401
