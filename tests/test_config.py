"""Tests for the config surface (CLI flag parity with the reference main.py)."""

from shmgan_tpu.config import Config, _strtobool


class TestConfig:
    def test_defaults_match_reference(self):
        cfg = Config()
        # main.py:42-56 / ShmGANwithSSpecSeg.py:157-212 defaults
        assert cfg.model.image_size == 128
        assert cfg.model.filter_size == 64
        assert cfg.model.c_dim == 5
        assert cfg.train.batch_size == 1
        assert cfg.train.num_epochs == 200
        assert cfg.train.g_lr == 2e-5
        assert cfg.train.beta1 == 0.5
        assert cfg.train.beta2 == 0.99
        assert cfg.train.lr_decay_steps == 10000
        assert cfg.train.lr_decay_rate == 0.95
        assert cfg.train.seed == 25
        assert cfg.train.randomness == 0.5
        assert cfg.train.target_label == 0.9
        assert cfg.train.train_G_after == 0
        assert cfg.train.grad_clip == 1.0

    def test_from_args(self):
        cfg = Config.from_args([
            "--mode", "test", "--image_size", "64", "--batch_size", "4",
            "--g_lr", "1e-4", "--calc_metrics", "true",
            "--data_dir", "/tmp/x", "--compute_dtype", "bfloat16",
            "--data_parallel", "4", "--model_parallel", "2",
        ])
        assert cfg.mode == "test"
        assert cfg.model.image_size == 64
        assert cfg.train.batch_size == 4
        assert cfg.train.g_lr == 1e-4
        assert cfg.eval.calc_metrics is True
        assert cfg.data.data_dir == "/tmp/x"
        assert cfg.model.compute_dtype == "bfloat16"
        assert cfg.mesh.data_parallel == 4 and cfg.mesh.model_parallel == 2

    def test_strtobool(self):
        # The reference's `type=bool` flags were broken (any non-empty string ->
        # True, main.py:36-40); ours parse honestly.
        assert _strtobool("false") is False
        assert _strtobool("False") is False
        assert _strtobool("0") is False
        assert _strtobool("true") is True
        assert _strtobool("1") is True
        assert _strtobool(True) is True

    def test_describe_contains_options(self):
        text = Config().describe()
        assert "train.g_lr" in text and "model.image_size" in text

    def test_dead_reference_flags_kept(self):
        # parsed-but-dead reference flags stay on the CLI for compatibility
        cfg = Config.from_args(["--n_critic", "7", "--d_repeat_num", "4",
                                "--num_iteration", "9", "--num_iteration_decay", "3"])
        assert cfg.train.n_critic == 7
        assert cfg.model.d_repeat_num == 4
        assert cfg.train.num_iteration == 9
        assert cfg.train.num_iteration_decay == 3
