"""End-to-end smoke tests: the training driver and the CLI test path, on tiny
synthetic fixture trees (no real datasets, CPU backend)."""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.data.synthetic import write_fixture_tree


def tiny_config(tmp, n_epochs=1, run_name="run") -> Config:
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4)
    cfg.train = dataclasses.replace(
        cfg.train, batch_size=2, num_epochs=n_epochs, checkpoint_save_step=1,
        checkpoint_save_dir=os.path.join(tmp, run_name, "ckpt"),
        log_dir=os.path.join(tmp, run_name, "logs"),
        result_dir=os.path.join(tmp, run_name, "results"),
        model_save_dir=os.path.join(tmp, run_name, "models"))
    cfg.data = dataclasses.replace(cfg.data, data_dir=os.path.join(tmp, "polar"))
    cfg.mesh = dataclasses.replace(cfg.mesh, data_parallel=1, model_parallel=1)
    return cfg


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    write_fixture_tree(os.path.join(root, "polar"), n_images=4, image_size=32,
                       seed=0)
    write_fixture_tree(os.path.join(root, "testimgs"), n_images=2, image_size=32,
                       seed=1)
    return root


class TestTrainLoop:
    def test_train_saves_checkpoint_and_logs(self, fixture_root):
        from shmgan_tpu.train.loop import train
        cfg = tiny_config(fixture_root, run_name="first")
        state = train(cfg, max_steps=2, verbose=False)
        assert int(jax.device_get(state.step)) == 2
        # checkpoint written
        ckpts = [d for d in os.listdir(cfg.train.checkpoint_save_dir) if d.isdigit()]
        assert ckpts
        # metrics jsonl written
        lines = open(os.path.join(cfg.train.log_dir, "metrics.jsonl")).readlines()
        assert lines
        row = json.loads(lines[0])
        assert "total_G" in row and np.isfinite(row["total_G"])

    def test_resume_from_checkpoint(self, fixture_root):
        from shmgan_tpu.train.loop import train
        cfg = tiny_config(fixture_root, n_epochs=2, run_name="resume")
        state = train(cfg, max_steps=2, verbose=False)
        first = int(jax.device_get(state.step))
        # second run resumes from the saved step instead of restarting
        state2 = train(cfg, max_steps=1, verbose=False)
        assert int(jax.device_get(state2.step)) > first


class TestCliTestMode:
    def test_run_test_writes_results_and_metrics(self, fixture_root, capsys):
        from shmgan_tpu.cli import run_test
        cfg = tiny_config(fixture_root, run_name="cli")
        cfg.data = dataclasses.replace(
            cfg.data,
            test_dir=os.path.join(fixture_root, "testimgs", "I0"),
            diffuse_dir=os.path.join(fixture_root, "testimgs", "ED"))
        cfg.eval = dataclasses.replace(cfg.eval, calc_metrics=True)
        run_test(cfg)
        results = os.listdir(cfg.train.result_dir)
        assert any(f.startswith("result_") for f in results)
        assert "metrics.jsonl" in results
        out = capsys.readouterr().out
        assert "MEAN" in out


class TestSpatialLoopE2E:
    def test_train_with_spatial_sharding(self, fixture_root):
        # full driver path with dp=4 x mp=2 spatial sharding on the CPU mesh
        from shmgan_tpu.train.loop import train
        cfg = tiny_config(fixture_root, run_name="spatial")
        cfg.train = dataclasses.replace(cfg.train, batch_size=4)
        cfg.mesh = dataclasses.replace(cfg.mesh, data_parallel=4, model_parallel=2,
                                       spatial_sharding=True)
        state = train(cfg, max_steps=1, verbose=False)
        assert int(jax.device_get(state.step)) == 1


class TestPeriodicEval:
    def test_eval_metrics_logged(self, fixture_root):
        # BASELINE config 5: periodic PSNR/SSIM eval during training
        import numpy as np
        from shmgan_tpu.data.synthetic import synth_polar_scene
        from shmgan_tpu.train.loop import train
        cfg = tiny_config(fixture_root, n_epochs=1, run_name="periodic_eval")
        rng = np.random.default_rng(5)
        inputs, targets = [], []
        for _ in range(2):
            views, diffuse, _ = synth_polar_scene(rng, 32, 32)
            inputs.append(views[0]); targets.append(diffuse)
        train(cfg, max_steps=2, verbose=False,
              eval_inputs=np.stack(inputs), eval_targets=np.stack(targets),
              eval_every_epochs=1)
        rows = [json.loads(l) for l in
                open(os.path.join(cfg.train.log_dir, "metrics.jsonl"))]
        eval_rows = [r for r in rows if any(k.startswith("eval/") for k in r)]
        assert eval_rows, "no eval rows logged"
        assert "eval/ssim" in eval_rows[-1] and "eval/psnr" in eval_rows[-1]
        assert np.isfinite(eval_rows[-1]["eval/ssim"])
