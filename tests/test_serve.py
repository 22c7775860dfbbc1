"""Tests for the batch inference engine (serving path)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.data.synthetic import write_fixture_tree
from shmgan_tpu.serve import BatchInferenceEngine
from shmgan_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def engine():
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    return BatchInferenceEngine(cfg, state.g_params, state.specseg_vars,
                                batch_size=4)


class TestEngine:
    def test_exact_batch(self, engine):
        rgb = np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
        out = engine.process_images(rgb)
        assert out["gen_rgb"].shape == (4, 32, 32, 3)
        assert out["mask"].shape == (4, 32, 32, 1)

    def test_padding_partial_batch(self, engine):
        rgb = np.random.default_rng(1).uniform(0, 1, (6, 32, 32, 3)).astype(np.float32)
        out = engine.process_images(rgb)
        assert out["gen_rgb"].shape == (6, 32, 32, 3)

    def test_padding_preserves_values(self, engine):
        rgb = np.random.default_rng(2).uniform(0, 1, (5, 32, 32, 3)).astype(np.float32)
        full = engine.process_images(rgb)
        solo = engine.process_images(rgb[4:5])
        np.testing.assert_allclose(full["gen_rgb"][4], solo["gen_rgb"][0],
                                   rtol=1e-4, atol=1e-5)

    def test_process_folder(self, engine, tmp_path):
        root = str(tmp_path / "in")
        write_fixture_tree(root, n_images=3, image_size=32, seed=0)
        out_dir = str(tmp_path / "out")
        n = engine.process_folder(os.path.join(root, "I0"), out_dir)
        assert n == 3
        files = os.listdir(out_dir)
        assert sum(f.endswith("_specfree.png") for f in files) == 3
        assert sum(f.endswith("_mask.png") for f in files) == 3

    def test_watch_folder_bounded(self, engine, tmp_path):
        root = str(tmp_path / "watch_in")
        write_fixture_tree(root, n_images=2, image_size=32, seed=1)
        out_dir = str(tmp_path / "watch_out")
        engine.watch_folder(os.path.join(root, "I0"), out_dir, poll_s=0.01,
                            max_iterations=3)
        assert sum(f.endswith("_specfree.png") for f in os.listdir(out_dir)) == 2


class TestProductOutput:
    """The saved *_specfree.png must be the CALIBRATED output — the exact inverse
    of the input standardization, in the input's [0,1] RGB domain (VERDICT r1 #8:
    the best output the framework computes must be the one users get)."""

    def test_saved_file_roundtrips_calibrated(self, engine, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(7)
        rgb = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
        os.makedirs(in_dir)
        for i in range(2):
            Image.fromarray((rgb[i] * 255).astype(np.uint8)).save(
                os.path.join(in_dir, f"img_{i}.png"))
        engine.process_folder(in_dir, out_dir)

        # recompute what the engine saw (decode of the 8-bit PNG)
        from shmgan_tpu.data.loader import decode_resize
        decoded = np.stack([decode_resize(os.path.join(in_dir, f"img_{i}.png"), 32)
                            for i in range(2)])
        expect = engine.process_images(decoded)["gen_rgb_calibrated"]
        for i in range(2):
            saved = np.asarray(Image.open(
                os.path.join(out_dir, f"img_{i}_specfree.png")),
                dtype=np.float32) / 255.0
            np.testing.assert_allclose(saved, np.clip(expect[i], 0, 1),
                                       atol=1.5 / 255.0)

    def test_corrupt_file_skipped_not_poisoned(self, engine, tmp_path):
        # a half-written/corrupt image must be skipped without being marked seen
        # (ADVICE.md round 1: failed decodes were permanently skipped)
        from PIL import Image

        in_dir, out_dir = str(tmp_path / "win"), str(tmp_path / "wout")
        os.makedirs(in_dir)
        rgb = (np.random.default_rng(8).uniform(0, 1, (32, 32, 3)) * 255
               ).astype(np.uint8)
        Image.fromarray(rgb).save(os.path.join(in_dir, "good.png"))
        with open(os.path.join(in_dir, "bad.png"), "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\n____truncated____")
        engine.watch_folder(in_dir, out_dir, poll_s=0.01, max_iterations=4)
        files = os.listdir(out_dir)
        assert "good_specfree.png" in files
        assert not any(f.startswith("bad") for f in files)

    def test_watch_requires_stable_stat(self, engine, tmp_path, monkeypatch):
        # a file whose size keeps changing between polls is never picked up
        import shmgan_tpu.serve as serve_mod
        from PIL import Image

        in_dir, out_dir = str(tmp_path / "sin"), str(tmp_path / "sout")
        os.makedirs(in_dir)
        growing = os.path.join(in_dir, "growing.png")
        rgb = (np.random.default_rng(9).uniform(0, 1, (32, 32, 3)) * 255
               ).astype(np.uint8)
        Image.fromarray(rgb).save(growing)

        real_sleep = serve_mod.time.sleep

        def grow(_):
            with open(growing, "ab") as f:
                f.write(b"x" * 16)
            real_sleep(0)

        monkeypatch.setattr(serve_mod.time, "sleep", grow)
        engine.watch_folder(in_dir, out_dir, poll_s=0.01, max_iterations=4)
        assert not os.path.exists(os.path.join(out_dir, "growing_specfree.png"))


def test_watch_folder_corrupt_file_does_not_spin(tmp_path, monkeypatch):
    """A persistently undecodable file must not disable the poll backoff
    (ADVICE-round-2 busy-spin finding): with only a corrupt file present the
    daemon sleeps every iteration."""
    import dataclasses as dc

    import jax

    from shmgan_tpu.config import Config
    from shmgan_tpu.serve import BatchInferenceEngine
    from shmgan_tpu.train.state import create_train_state

    cfg = Config()
    cfg.model = dc.replace(cfg.model, image_size=16, filter_size=8,
                           specseg_base_filters=4)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    eng = BatchInferenceEngine(cfg, state.g_params, state.specseg_vars,
                               batch_size=1)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "corrupt.png").write_bytes(b"not an image at all")

    sleeps = []
    monkeypatch.setattr("shmgan_tpu.serve.time.sleep",
                        lambda s: sleeps.append(s))
    eng.watch_folder(str(in_dir), str(tmp_path / "out"), poll_s=0.01,
                     max_iterations=5)
    # iterations 1.. see the stable-but-undecodable file; every one of them
    # must back off instead of spinning
    assert len(sleeps) == 5


class TestNativeResolutionServing:
    """Native-resolution serving (`--mode serve --native_resolution true`):
    each photo at its own size via reflect-pad-to-bucket + crop, instead of
    the reference's forced square resize (test.py:81-94)."""

    @pytest.fixture(scope="class")
    def native_engine(self):
        cfg = Config()
        cfg.model = dataclasses.replace(cfg.model, image_size=32,
                                        filter_size=8, specseg_base_filters=4)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        return BatchInferenceEngine(cfg, state.g_params, state.specseg_vars,
                                    batch_size=2, native_resolution=True)

    def test_mixed_sizes_keep_shapes_and_order(self, native_engine):
        rng = np.random.default_rng(3)
        sizes = [(40, 56), (32, 32), (40, 56), (24, 48), (40, 56)]
        imgs = [rng.uniform(0, 1, s + (3,)).astype(np.float32) for s in sizes]
        outs = native_engine.process_images_native(imgs)
        assert len(outs) == len(imgs)
        for img, out in zip(imgs, outs):
            assert out["gen_rgb_calibrated"].shape == img.shape
            assert out["mask"].shape == img.shape[:2] + (1,)

    def test_grouped_equals_solo(self, native_engine):
        """Group batching (pad to engine batch, trim) must not change any
        image's output vs running it alone."""
        rng = np.random.default_rng(4)
        imgs = [rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)
                for _ in range(3)]
        grouped = native_engine.process_images_native(imgs)
        solo = native_engine.process_images_native([imgs[2]])
        np.testing.assert_allclose(grouped[2]["gen_rgb"],
                                   solo[0]["gen_rgb"], rtol=1e-4, atol=1e-5)

    def test_folder_job_preserves_native_sizes(self, native_engine, tmp_path):
        from PIL import Image
        in_dir = tmp_path / "nat_in"
        in_dir.mkdir()
        rng = np.random.default_rng(5)
        sizes = {"a.png": (40, 56), "b.png": (32, 32)}
        for name, (h, w) in sizes.items():
            arr = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(in_dir / name)
        out_dir = str(tmp_path / "nat_out")
        n = native_engine.process_folder(str(in_dir), out_dir)
        assert n == 2
        for name, (h, w) in sizes.items():
            stem = os.path.splitext(name)[0]
            out = Image.open(os.path.join(out_dir, f"{stem}_specfree.png"))
            assert out.size == (w, h)  # PIL size is (w, h)
            mask = Image.open(os.path.join(out_dir, f"{stem}_mask.png"))
            assert mask.size == (w, h)

    def test_square_engine_rejects_native_call(self, engine):
        with pytest.raises(RuntimeError):
            engine.process_images_native([np.zeros((32, 32, 3), np.float32)])


class TestDataParallelServing:
    """data_parallel=N shards each compiled serving batch over a 1-D device
    mesh (conftest provides 8 virtual CPU devices). Inference is per-image, so
    DP must be numerically identical to single-device."""

    def test_dp_equals_single_device(self):
        cfg = Config()
        cfg.model = dataclasses.replace(cfg.model, image_size=32,
                                        filter_size=8, specseg_base_filters=4)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        rgb = np.asarray(jax.random.uniform(jax.random.PRNGKey(3),
                                            (4, 32, 32, 3)), np.float32)
        eng1 = BatchInferenceEngine(cfg, state.g_params, state.specseg_vars,
                                    batch_size=4)
        eng2 = BatchInferenceEngine(cfg, state.g_params, state.specseg_vars,
                                    batch_size=4, data_parallel=2)
        out1 = eng1.process_images(rgb)
        out2 = eng2.process_images(rgb)
        for k in out1:
            np.testing.assert_allclose(out2[k], out1[k], rtol=1e-5, atol=1e-6)

    def test_dp_must_divide_batch(self):
        cfg = Config()
        cfg.model = dataclasses.replace(cfg.model, image_size=32,
                                        filter_size=8, specseg_base_filters=4)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="must divide"):
            BatchInferenceEngine(cfg, state.g_params, state.specseg_vars,
                                 batch_size=3, data_parallel=2)
