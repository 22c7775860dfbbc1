"""Preemption handling: a SIGTERM mid-training checkpoints and exits cleanly."""

import dataclasses
import os
import signal
import threading

import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.data.synthetic import write_fixture_tree


def test_sigterm_checkpoints_and_exits(tmp_path):
    from shmgan_tpu.train.loop import train

    root = str(tmp_path)
    write_fixture_tree(os.path.join(root, "polar"), n_images=4, image_size=32,
                       seed=0)
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4)
    cfg.train = dataclasses.replace(
        cfg.train, batch_size=2, num_epochs=50, checkpoint_save_step=100,
        checkpoint_save_dir=os.path.join(root, "ckpt"),
        log_dir=os.path.join(root, "logs"),
        result_dir=os.path.join(root, "results"),
        model_save_dir=os.path.join(root, "models"))
    cfg.data = dataclasses.replace(cfg.data, data_dir=os.path.join(root, "polar"))
    cfg.mesh = dataclasses.replace(cfg.mesh, data_parallel=1, model_parallel=1)

    # fire SIGTERM shortly after training starts (the handler sets a flag; the
    # loop drains at the next step boundary)
    timer = threading.Timer(8.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        state = train(cfg, verbose=False)
    finally:
        timer.cancel()
    # training stopped far before the 50 configured epochs and saved a checkpoint
    assert int(state.step) < 50 * 2
    ckpts = [d for d in os.listdir(cfg.train.checkpoint_save_dir) if d.isdigit()]
    assert ckpts
