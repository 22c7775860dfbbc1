"""Fail-fast device probe for the fused train step at a given config.

Runs the minimum possible program to exercise the compiled step on the real
backend: random-init state, one (or --scan N) fused step(s) on an in-graph
synthetic batch, hard value fetch. Exists to bisect device-side failures
(e.g. a TPU worker crash at a new image size) one knob at a time in ~2-minute
cycles, instead of relaunching the 10-minute quality trainer per attempt.

  python examples/step_probe.py --image_size 256 --batch 2 --remat models \
      --upsample_mode resize_conv --g_ema 0.999 --scan 0
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')} +{time.perf_counter() - T0:6.1f}s] {msg}",
          flush=True)


T0 = time.perf_counter()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--filter_size", type=int, default=64,
                   help="base conv width (reduce for CPU smokes)")
    p.add_argument("--specseg_base_filters", type=int, default=16)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--remat", choices=["none", "models"], default="models")
    p.add_argument("--upsample_mode", choices=["conv_transpose", "resize_conv"],
                   default="resize_conv")
    p.add_argument("--g_ema", type=float, default=0.0)
    p.add_argument("--scan", type=int, default=0,
                   help="0 = single un-scanned step; N = lax.scan chunk of N")
    p.add_argument("--init_from", type=str, default="",
                   help="replicate quality_train's resolution warm start from "
                        "this checkpoint dir")
    p.add_argument("--init_from_image_size", type=int, default=128)
    p.add_argument("--free_src", action="store_true",
                   help="with --init_from: drop the source-template state's "
                        "device buffers before compiling the chunk")
    p.add_argument("--quality", action="store_true", default=True,
                   help="quality-mode train flags (live_g1 etc.), like "
                        "examples/quality_train.py")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args(argv)

    if a.cpu:
        # sitecustomize imports jax at interpreter startup, so env vars alone
        # are too late — flip the platform through jax.config too
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from jax import lax

    from shmgan_tpu.config import Config
    from shmgan_tpu.data.synthetic_jax import synth_views_batch
    from shmgan_tpu.train.state import create_train_state
    from shmgan_tpu.train.step import make_train_step

    log(f"backend={jax.default_backend()} cfg: size={a.image_size} b={a.batch} "
        f"{a.dtype} remat={a.remat} up={a.upsample_mode} ema={a.g_ema} "
        f"scan={a.scan}")

    cfg = Config()
    cfg.model = dataclasses.replace(
        cfg.model, image_size=a.image_size, compute_dtype=a.dtype,
        upsample_mode=a.upsample_mode, filter_size=a.filter_size,
        specseg_base_filters=a.specseg_base_filters)
    cfg.train = dataclasses.replace(
        cfg.train, batch_size=a.batch, remat=a.remat, g_ema=a.g_ema,
        scalar_channel_dropout=False, live_g1=True, consistent_domains=True)

    rng = jax.random.PRNGKey(0)
    state = create_train_state(cfg, rng)
    jax.block_until_ready(state.g_params)
    log("state init done")

    if a.init_from:
        # mirror examples/quality_train.py's warm-start block exactly
        from shmgan_tpu.checkpoint import (CheckpointManager,
                                           transfer_matching_params)
        cfg_src = dataclasses.replace(cfg)
        cfg_src.model = dataclasses.replace(
            cfg.model, image_size=a.init_from_image_size)
        src = create_train_state(cfg_src, rng)
        src = CheckpointManager(a.init_from, max_to_keep=3).restore(src)
        if src is None:
            raise SystemExit(f"--init_from {a.init_from}: no checkpoint found")
        g_params, g_kept, g_fresh = transfer_matching_params(
            state.g_params, src.g_params)
        d_params, d_kept, d_fresh = transfer_matching_params(
            state.d_params, src.d_params)
        ema0 = (jax.tree_util.tree_map(jnp.copy, g_params)
                if state.ema_g_params is not None else None)
        state = state.replace(g_params=g_params, d_params=d_params,
                              ema_g_params=ema0)
        log(f"init_from {a.init_from}: {g_kept + d_kept} kept, "
            f"{g_fresh + d_fresh} fresh")
        if a.free_src:
            del src, cfg_src
            import gc
            gc.collect()
            log("src template freed")

    step_fn = make_train_step(cfg)
    epoch = jnp.ones((), jnp.int32)
    h = w = a.image_size

    if a.scan <= 0:
        @jax.jit
        def one(state, s):
            views = synth_views_batch(jax.random.fold_in(rng, s), a.batch, h, w,
                                      ed_mode="diffuse", camera_swap_prob=0.25)
            return step_fn(state, views, jax.random.fold_in(rng, s + 1), epoch)

        state, m = one(state, 0)
        log(f"single step dispatched; fetching… total_G={float(m['total_G']):.3f}")
        state, m = one(state, 2)
        log(f"second step ok; total_G={float(m['total_G']):.3f}")
    else:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk(state, steps):
            def body(carry, s):
                views = synth_views_batch(jax.random.fold_in(rng, s), a.batch,
                                          h, w, ed_mode="diffuse",
                                          camera_swap_prob=0.25)
                new_state, m = step_fn(carry, views,
                                       jax.random.fold_in(rng, s + 1), epoch)
                return new_state, m["total_G"]
            return lax.scan(body, state, steps)

        state, tg = chunk(state, jnp.arange(a.scan, dtype=jnp.int32))
        log(f"scan({a.scan}) dispatched; fetching… total_G[-1]="
            f"{float(tg[-1]):.3f}")

    log("PASS")


if __name__ == "__main__":
    main()
