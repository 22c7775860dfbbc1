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


class TestServeConfig:
    def test_serve_flags_parse(self):
        cfg = Config.from_args([
            "--mode", "serve", "--serve_port", "9001", "--serve_host",
            "127.0.0.1", "--serve_batch_size", "4",
            "--serve_watch_dir", "/tmp/in"])
        assert cfg.mode == "serve"
        assert cfg.serve.port == 9001
        assert cfg.serve.host == "127.0.0.1"
        assert cfg.serve.batch_size == 4
        assert cfg.serve.watch_dir == "/tmp/in"

    def test_serve_defaults(self):
        cfg = Config.from_args(["--mode", "serve"])
        assert cfg.serve.port == 8000 and cfg.serve.watch_dir == ""

    def test_cli_dispatches_serve(self, monkeypatch, tmp_path):
        from shmgan_tpu import cli

        calls = {}
        monkeypatch.setattr(cli, "_restored_state",
                            lambda cfg: type("S", (), {"g_params": {},
                                                       "specseg_vars": {}})())

        def fake_serve_forever(cfg, g, s, host, port, batch_size, **kw):
            calls["http"] = (host, port, batch_size)
        import shmgan_tpu.serve_http as sh
        monkeypatch.setattr(sh, "serve_forever", fake_serve_forever)
        cli.main(["--mode", "serve", "--serve_port", "9002",
                  "--serve_host", "127.0.0.1"])
        assert calls["http"] == ("127.0.0.1", 9002, 1)


def test_checkpoint_step_flag_wires_to_eval_config():
    from shmgan_tpu.config import Config
    cfg = Config.from_args(["--mode", "export", "--checkpoint_step", "17500"])
    assert cfg.eval.checkpoint_step == 17500
    assert Config.from_args(["--mode", "export"]).eval.checkpoint_step == 0
