"""CLI entry point mirroring the reference's main.py (train/test dispatch).

    python -m shmgan_tpu.cli --mode train --data_dir <polar-root> ...
    python -m shmgan_tpu.cli --mode test --test_dir <imgs> [--calc_metrics true
        --diffuse_dir <gt>] ...
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import jax
import numpy as np

from shmgan_tpu.checkpoint import CheckpointManager, load_specseg_weights
from shmgan_tpu.config import Config


def run_train(cfg: Config):
    from shmgan_tpu.train.loop import train
    print(cfg.describe())
    train(cfg)
    print(" [*] Training finished!")


def run_test(cfg: Config):
    """Single-RGB inference over a test folder, optional metric report
    (reference test.py:40-406)."""
    from shmgan_tpu.data.loader import SingleFolderDataset
    from shmgan_tpu.eval.metrics import MetricAccumulator, evaluate_pair
    from shmgan_tpu.infer import make_infer_fn, make_native_infer_fn

    print(cfg.describe())
    state = _restored_state(cfg)
    if cfg.eval.native_resolution:
        # each photo at its OWN resolution (reflect-pad to a bucketed shape,
        # crop back) — the reference force-resizes to a square (test.py:81-94).
        # Cyclic diagnostics are skipped here: 5 extra G passes per photo that
        # run_test never saves.
        infer = make_native_infer_fn(cfg)
        size = None
    else:
        infer = make_infer_fn(cfg, with_cyclic=True)
        size = cfg.model.image_size

    test_ds = SingleFolderDataset(cfg.data.test_dir, size,
                                  batch_size=cfg.train.batch_size)
    diffuse_ds = None
    if cfg.eval.calc_metrics:
        diffuse_ds = SingleFolderDataset(cfg.data.diffuse_dir, size,
                                         batch_size=cfg.train.batch_size)

    os.makedirs(cfg.train.result_dir, exist_ok=True)
    acc = MetricAccumulator()
    diffuse_iter = iter(diffuse_ds) if diffuse_ds is not None else None

    from PIL import Image
    for i, rgb in enumerate(test_ds):
        t0 = time.perf_counter()
        out = infer(state.g_params, state.specseg_vars, rgb)
        gen = np.asarray(out["gen_rgb_calibrated"])
        mask = np.asarray(out["mask"])
        wall = time.perf_counter() - t0

        # save the CALIBRATED specular-free image (exact inverse of the input
        # standardization — lives in the input's [0,1] RGB domain) plus the
        # predicted mask. The reference min-max-stretches for display
        # (test.py:413-415); that stretch is a debug view, not the product.
        comp = np.asarray(out["gen_rgb_composited"])
        for j in range(gen.shape[0]):
            idx = i * cfg.train.batch_size + j
            Image.fromarray((np.clip(gen[j], 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(cfg.train.result_dir, f"result_{idx:05d}.png"))
            Image.fromarray(
                (np.clip(mask[j, ..., 0], 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(cfg.train.result_dir, f"result_{idx:05d}_mask.png"))
            Image.fromarray((np.clip(comp[j], 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(cfg.train.result_dir,
                             f"result_{idx:05d}_composited.png"))

        if diffuse_iter is not None:
            target = next(diffuse_iter)
            acc.add(evaluate_pair(out["gen_rgb_calibrated"], target),
                    wall_time=wall)

    if cfg.eval.calc_metrics and acc.rows:
        print("\n --- CALCULATED METRICS --- ")
        print(acc.report())
        acc.dump_jsonl(os.path.join(cfg.train.result_dir, "metrics.jsonl"))


def _restored_state(cfg: Config):
    from shmgan_tpu.train.state import create_train_state

    specseg_vars = None
    if os.path.exists(cfg.eval.specseg_weights):
        specseg_vars = load_specseg_weights(
            cfg.eval.specseg_weights,
            base_filters=cfg.model.specseg_base_filters,
            image_size=cfg.model.image_size)
        # chroma-input nets carry 2 input channels; keep the graph in sync
        # (read off the already-loaded tree — no second parse of the file)
        from shmgan_tpu.checkpoint import specseg_in_channels_of
        in_ch = specseg_in_channels_of(specseg_vars)
        if in_ch != cfg.model.specseg_in_channels:
            import dataclasses
            cfg.model = dataclasses.replace(
                cfg.model, specseg_in_channels=in_ch)
    state = create_train_state(cfg, jax.random.PRNGKey(cfg.train.seed),
                               specseg_vars=specseg_vars)
    ckpt = CheckpointManager(cfg.train.checkpoint_save_dir,
                             max_to_keep=cfg.train.checkpoint_max_to_keep)
    restored = ckpt.restore(state, step=cfg.eval.checkpoint_step or None,
                            include_ema=cfg.eval.use_ema)
    if restored is not None:
        state = restored
        if cfg.eval.use_ema and state.ema_g_params is not None:
            # EMA-trained checkpoints are evaluated on the averaged tree
            # (examples/quality_eval.py); deploy those same weights here
            # instead of silently shipping the raw last-step params
            # (ADVICE r2 medium). --use_ema false opts out.
            state = state.replace(g_params=state.ema_g_params,
                                  ema_g_params=None)
            print(f"[ckpt] restored step {int(state.step)} (EMA generator)")
        else:
            print(f"[ckpt] restored step {int(state.step)}")
    else:
        print("[ckpt] WARNING: no checkpoint found — using random weights")
    return state


def _serving_weights(cfg: Config):
    """(g_params, specseg_vars) from the inference bundle when configured,
    else from the training checkpoint. A bundle's json header carries the
    model hyperparameters the params were built with — it OVERRIDES cfg.model
    so the serving graph always matches the weights."""
    if cfg.serve.weights_bundle:
        import dataclasses

        from shmgan_tpu.checkpoint import load_inference_bundle
        g_params, specseg_vars, header = load_inference_bundle(
            cfg.serve.weights_bundle)
        cfg.model = dataclasses.replace(
            cfg.model, image_size=header["image_size"],
            filter_size=header["filter_size"], c_dim=header["c_dim"],
            specseg_base_filters=header["specseg_base_filters"],
            specseg_in_channels=header.get("specseg_in_channels", 1),
            upsample_mode=header.get("upsample_mode", "conv_transpose"))
        print(f"[serve] loaded bundle step {header['step']} "
              f"({cfg.serve.weights_bundle}); model config from header: "
              f"{header}")
        return g_params, specseg_vars
    state = _restored_state(cfg)
    return state.g_params, state.specseg_vars


def run_serve(cfg: Config):
    """Serving mode: HTTP endpoint (default) or folder-watch daemon.

    HTTP:   python -m shmgan_tpu.cli --mode serve --serve_port 8000 ...
    watch:  python -m shmgan_tpu.cli --mode serve --serve_watch_dir in/ \
                --result_dir out/ ...
    """
    g_params, specseg_vars = _serving_weights(cfg)
    if cfg.serve.watch_dir:
        from shmgan_tpu.serve import BatchInferenceEngine
        eng = BatchInferenceEngine(
            cfg, g_params, specseg_vars, batch_size=cfg.serve.batch_size,
            native_resolution=cfg.eval.native_resolution,
            # the folder job writes exactly these two; the pruned graph skips
            # the denorm/composited HBM writes
            outputs=("gen_rgb_calibrated", "mask"),
            # --data_parallel N shards each serving batch over n devices
            data_parallel=cfg.mesh.data_parallel)
        print(f"[serve] watching {cfg.serve.watch_dir} -> {cfg.train.result_dir}")
        eng.watch_folder(cfg.serve.watch_dir, cfg.train.result_dir)
    else:
        from shmgan_tpu.serve_http import serve_forever
        serve_forever(cfg, g_params, specseg_vars,
                      host=cfg.serve.host, port=cfg.serve.port,
                      batch_size=cfg.serve.batch_size,
                      batch_window_ms=cfg.serve.batch_window_ms,
                      warm_sizes=cfg.serve.warm_sizes)


def run_export(cfg: Config):
    """Export the deployable inference bundle (generator + SpecSeg, no
    optimizer state) from the training checkpoint into model_save_dir —
    the purpose the reference's --model_save_dir flag never served."""
    from shmgan_tpu.checkpoint import export_inference_bundle

    state = _restored_state(cfg)
    path = os.path.join(cfg.train.model_save_dir, "shmgan_infer.msgpack")
    export_inference_bundle(state, cfg, path,
                            store_dtype=cfg.eval.export_dtype or None)
    size_mb = os.path.getsize(path) / 1e6
    print(f"[export] wrote {path} ({size_mb:.1f} MB, step {int(state.step)})")


def main(argv: Optional[list] = None):
    cfg = Config.from_args(argv)
    if cfg.mode == "train":
        run_train(cfg)
    elif cfg.mode == "test":
        run_test(cfg)
    elif cfg.mode == "serve":
        run_serve(cfg)
    elif cfg.mode == "export":
        run_export(cfg)
    elif cfg.mode == "bench":
        import runpy
        sys.argv = [sys.argv[0]]
        runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                       run_name="__main__")


if __name__ == "__main__":
    main()
