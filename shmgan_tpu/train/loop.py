"""Training driver — the epoch/batch loop around the fused step.

Capability parity with ShmGANwithSSpecSeg.train (:888-1139): dataset load, model
init, SpecSeg weight load, checkpoint restore-on-start, epoch x batch loop with
per-step RNG, periodic metric logging + progress bar + epoch timing, periodic and
final checkpoint saves. Differences (all TPU-first):
  - ONE jitted step (the reference runs eagerly, :79-80)
  - device feed via a background prefetcher (reference: iterator.get_next per step)
  - metrics to jsonl (+ optional TensorBoard) instead of the disabled Comet path
  - checkpoints are atomic Orbax saves of the full state
"""

from __future__ import annotations

import os
import signal
import time
from typing import Optional

import jax
import jax.numpy as jnp

from shmgan_tpu.checkpoint import CheckpointManager
from shmgan_tpu.config import Config
from shmgan_tpu.data.loader import PolarimetricDataset
from shmgan_tpu.data.pipeline import DevicePrefetcher
from shmgan_tpu.parallel.mesh import make_mesh, shard_train_state
from shmgan_tpu.train.state import TrainState, create_train_state, param_count
from shmgan_tpu.train.step import make_train_step
from shmgan_tpu.utils.logging import MetricsWriter, StepTimer, progress_bar


class PreemptionGuard:
    """Graceful-preemption handling (SURVEY.md §5 'failure detection': the reference
    has none beyond restart-and-restore). SIGTERM/SIGINT set a flag; the train loop
    checkpoints and exits cleanly at the next step boundary, so a preempted run
    loses at most one step. Auto-resume on restart completes the contract."""

    def __init__(self, install: bool = True):
        self.requested = False
        self._prev = {}
        if install:
            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    self._prev[sig] = signal.signal(sig, self._handler)
                except ValueError:  # non-main thread (tests)
                    pass

    def _handler(self, signum, frame):
        self.requested = True

    def restore(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)


def train(cfg: Config, dataset: Optional[PolarimetricDataset] = None,
          max_steps: Optional[int] = None, verbose: bool = True,
          handle_preemption: bool = True,
          eval_inputs=None, eval_targets=None,
          eval_every_epochs: int = 10) -> TrainState:
    """Run training; returns the final state. max_steps trims the run for tests.

    eval_inputs/eval_targets: optional held-out (N,H,W,3) RGB pairs (specular
    input, diffuse ground truth). When given, a PSNR/SSIM/MSE/deltaE eval runs
    every `eval_every_epochs` epochs on the calibrated single-RGB inference output
    and lands in the metrics jsonl under eval/* (BASELINE config 5: "data-parallel
    training with periodic PSNR/SSIM eval")."""
    log = print if verbose else (lambda *a, **k: None)
    guard = PreemptionGuard(install=handle_preemption)

    # ---- data
    if dataset is None:
        dataset = PolarimetricDataset(cfg.data, cfg.model.image_size,
                                      cfg.train.batch_size)
    log(f"[data] {len(dataset)} aligned 5-view images, "
        f"{dataset.batches_per_epoch} batches/epoch")

    # ---- mesh + state
    mesh = make_mesh(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)
    rng, init_rng = jax.random.split(rng)

    specseg_vars = None
    if os.path.exists(cfg.eval.specseg_weights):
        from shmgan_tpu.checkpoint import load_specseg_weights
        specseg_vars = load_specseg_weights(
            cfg.eval.specseg_weights,
            base_filters=cfg.model.specseg_base_filters,
            image_size=cfg.model.image_size)
        log(f"[specseg] loaded frozen weights from {cfg.eval.specseg_weights}")
    else:
        log(f"[specseg] {cfg.eval.specseg_weights} not found — random frozen init "
            "(the reference's pre-trained h5 is a separate artifact)")

    state = create_train_state(cfg, init_rng, specseg_vars=specseg_vars)
    log(f"[models] G params: {param_count(state.g_params):,}  "
        f"D params: {param_count(state.d_params):,}  "
        f"SpecSeg params: {param_count(state.specseg_vars):,} (frozen)")

    # architecture dumps, like the reference's per-run *_summary.txt
    # (ShmGANwithSSpecSeg.py:916-919,934-935). Written into a summaries/
    # subdirectory so runs never clobber artifacts already sitting in
    # model_save_dir (the repo's own models/*_summary.txt are full-width
    # dumps matching the goldens in tests/test_models.py).
    from shmgan_tpu.utils.viz import write_model_summaries
    write_model_summaries(state.g_params, state.d_params, state.specseg_vars,
                          out_dir=os.path.join(cfg.train.model_save_dir,
                                               "summaries"))

    # ---- checkpoint restore (reference restores whenever delete flag is off,
    # ShmGANwithSSpecSeg.py:949-951)
    ckpt = CheckpointManager(cfg.train.checkpoint_save_dir,
                             max_to_keep=cfg.train.checkpoint_max_to_keep)
    start_epoch = 0
    if cfg.train.auto_resume and not cfg.train.delete_old_checkpoints:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            steps_done = int(state.step)
            start_epoch = steps_done // max(dataset.batches_per_epoch, 1)
            # continue the augmentation/label-smoothing/noise RNG stream instead
            # of replaying the run's first epochs (ADVICE.md round 1)
            rng = jax.random.fold_in(rng, steps_done)
            log(f"[ckpt] restored step {steps_done} (epoch {start_epoch})")

    state = shard_train_state(state, mesh, spatial=cfg.mesh.spatial_sharding,
                              image_size=cfg.model.image_size,
                              min_channels=cfg.mesh.tp_min_channels)
    step_fn = jax.jit(make_train_step(cfg), donate_argnums=(0,))

    infer_fn = None
    if eval_inputs is not None and eval_targets is not None:
        from shmgan_tpu.eval.metrics import evaluate_pair
        from shmgan_tpu.infer import make_infer_fn
        infer_fn = make_infer_fn(cfg)
        eval_inputs = jnp.asarray(eval_inputs)
        eval_targets = jnp.asarray(eval_targets)

        def run_eval(state, epoch):
            out = infer_fn(state.g_params, state.specseg_vars, eval_inputs)
            m = evaluate_pair(out["gen_rgb_calibrated"], eval_targets)
            means = {k: float(jax.device_get(v).mean()) for k, v in m.items()}
            writer.write(int(jax.device_get(state.step)), means, prefix="eval/")
            log(f"[eval epoch {epoch}] " + "  ".join(
                f"{k}={v:.4f}" for k, v in means.items()))

    writer = MetricsWriter(cfg.train.log_dir)
    epoch_timer = StepTimer()
    total_steps = 0

    for epoch in range(start_epoch, cfg.train.num_epochs):
        epoch_arr = jnp.asarray(epoch, jnp.int32)
        # Every process walks the SAME global order — fixed file order by
        # default (the reference never shuffles; it relies on channel-dropout
        # randomness, ShmGANwithSSpecSeg.py:973-976). cfg.train.shuffle derives
        # a per-epoch order from (seed, epoch), identical on every host with no
        # coordination. Each process decodes only its slice of each global
        # batch (no-op at process_count=1).
        shuffle_seed = (cfg.train.seed * 100003 + epoch) if cfg.train.shuffle \
            else None
        feed = DevicePrefetcher(
            dataset.iter_epoch(shuffle_seed=shuffle_seed,
                               process_index=jax.process_index(),
                               process_count=jax.process_count()),
            mesh=mesh, depth=cfg.data.prefetch,
            spatial=cfg.mesh.spatial_sharding)
        t_epoch = time.perf_counter()
        for batch_idx, views in enumerate(feed):
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, views, step_rng, epoch_arr)
            total_steps += 1
            epoch_timer.tick(cfg.train.batch_size)

            if total_steps % 50 == 0 or batch_idx == 0:
                writer.write(int(jax.device_get(state.step)), metrics)
            if verbose:
                progress_bar(batch_idx + 1, dataset.batches_per_epoch,
                             prefix=f"epoch {epoch} ")
            if max_steps is not None and total_steps >= max_steps:
                break
            if guard.requested:
                break

        if guard.requested:
            log("\n[preempt] signal received — checkpointing and exiting")
            saved = ckpt.save(jax.device_get(state))
            log(f"[ckpt] saved step {saved}")
            break

        if (epoch + 1) % cfg.train.log_step == 0:
            dt = time.perf_counter() - t_epoch
            log(f"\n[epoch {epoch + 1}] {dt:.1f}s  "
                f"{epoch_timer.images_per_sec:.2f} img/s")

        if infer_fn is not None and (epoch + 1) % eval_every_epochs == 0:
            run_eval(state, epoch + 1)

        if (epoch + 1) % cfg.train.checkpoint_save_step == 0:
            saved = ckpt.save(jax.device_get(state))
            log(f"[ckpt] saved step {saved}")

        if max_steps is not None and total_steps >= max_steps:
            break

    ckpt.save(jax.device_get(state))
    ckpt.close()
    writer.close()
    guard.restore()
    return state
