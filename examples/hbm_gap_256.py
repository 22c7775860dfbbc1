"""Attribute the 256px trainer-vs-bench HBM gap (VERDICT r4 weak #3).

bench.py measures the bare 256px train step at b24 / 46.5 img/s, but the
FLAGSHIP trainer (examples/quality_train.py) only fits b10 / 19.8 img/s:
its chunk program adds an in-graph DR curriculum, in-graph EMA, and scan
chaining, and the r4 campaign measured the memory delta only as OOM error
margins (b24+disc-remat over by 8.2G, b12 over by 68M). This tool AOT-
compiles each graph variant and reads XLA's own memory analysis — no
execution, so the numbers are the compiler's peak-allocation plan, not OOM
bisection.

Variants (all 256px):
  bench_step_bN           the bench graph: one step, batch fed as argument
  scan_step_bN            K steps scanned, batches fed as scan inputs
  trainer_base_bN         trainer chunk: in-graph BASE curriculum, no EMA
  trainer_dr_bN           trainer chunk: in-graph DR curriculum, no EMA
  trainer_dr_ema_bN       the real flagship graph: DR curriculum + EMA
  trainer_dr_ema_hostcur_bN  round-5 fix candidate: curriculum generated in a
                          SEPARATE device program per segment (host-fed scan)

Writes per-variant {argument_size, output_size, temp_size, alias_size,
peak} in GiB. Run on the TPU (one allowed client):
  python examples/hbm_gap_256.py --batch 12 --seg 25 \
      --out benchmarks/trace_r5/hbm_gap_256.json
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--seg", type=int, default=25,
                   help="scan segment length (the trainer's relay-safe "
                        "program size at 256px)")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--filter_size", type=int, default=64)
    p.add_argument("--specseg_base_filters", type=int, default=16)
    p.add_argument("--variants", type=str, default="",
                   help="comma list to restrict (default: all)")
    p.add_argument("--out", type=str, default="benchmarks/trace_r5/hbm_gap_256.json")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args(argv)

    if a.cpu:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from jax import lax

    from shmgan_tpu.config import Config
    from shmgan_tpu.data.synthetic_dr import synth_views_batch_dr
    from shmgan_tpu.data.synthetic_jax import synth_views_batch
    from shmgan_tpu.train.state import create_train_state
    from shmgan_tpu.train.step import make_train_step

    b, h = a.batch, a.image_size
    log(f"backend: {jax.default_backend()} batch={b} size={h} seg={a.seg}")

    def build_cfg(g_ema: float, trainer_flags: bool = True):
        cfg = Config()
        cfg.model = dataclasses.replace(
            cfg.model, image_size=h, filter_size=a.filter_size,
            specseg_base_filters=a.specseg_base_filters,
            compute_dtype="bfloat16",
            use_pallas_instance_norm=not a.cpu)
        if trainer_flags:
            # the quality trainer's graph: live_g1 (G gets gradients through
            # the G1 pass -> its forward activations are STORED for the
            # backward, where the bench's stopped-params G1 stores nothing)
            # + the G1 L1/SSIM reconstruction objective
            cfg.train = dataclasses.replace(
                cfg.train, batch_size=b, scalar_channel_dropout=False,
                live_g1=True, g1_recon_weight=10.0, single_input_prob=0.5,
                consistent_domains=True, g_ema=g_ema)
        else:
            # bench.py's exact regime: Config() defaults (reference-parity
            # flags) + batch/dtype only
            cfg.train = dataclasses.replace(cfg.train, batch_size=b,
                                            remat="none")
        return cfg

    def abstract_state(cfg):
        return jax.eval_shape(lambda: create_train_state(cfg, jax.random.PRNGKey(0)))

    def mem_row(compiled):
        m = compiled.memory_analysis()
        gib = 1024 ** 3
        row = {}
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(m, k, None)
            if v is not None:
                row[k.replace("_in_bytes", "_gib")] = round(v / gib, 4)
        args = row.get("argument_size_gib", 0.0)
        temp = row.get("temp_size_gib", 0.0)
        out_sz = row.get("output_size_gib", 0.0)
        alias = row.get("alias_size_gib", 0.0)
        # peak live = arguments + temps + non-aliased outputs (donated state
        # aliases back into the arguments)
        row["peak_estimate_gib"] = round(args + temp + max(out_sz - alias, 0.0), 4)
        return row

    results = {"batch": b, "image_size": h, "seg": a.seg,
               "backend": jax.default_backend(), "variants": {}}
    want = set(a.variants.split(",")) if a.variants else None

    def run(name, builder):
        if want is not None and name not in want:
            return
        log(f"compiling {name} ...")
        t0 = time.time()
        try:
            row = mem_row(builder())
            row["compile_s"] = round(time.time() - t0, 1)
            results["variants"][name] = row
            log(f"  {name}: {row}")
        except Exception as e:
            results["variants"][name] = {"error": str(e)[:500]}
            log(f"  {name} FAILED: {str(e)[:200]}")
        # write incrementally — a later OOM/compile failure keeps earlier rows
        os.makedirs(os.path.dirname(a.out), exist_ok=True)
        with open(a.out, "w") as f:
            json.dump(results, f, indent=1)

    # ---- bench.py's EXACT graph: one step, Config() default train flags
    def bench_step_parity():
        cfg = build_cfg(0.0, trainer_flags=False)
        st = abstract_state(cfg)
        step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
        views = jax.ShapeDtypeStruct((cfg.model.c_dim, b, h, h, 3), jnp.float32)
        rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
        ep = jax.ShapeDtypeStruct((), jnp.int32)
        return step.lower(st, views, rng, ep).compile()

    # ---- one step with the TRAINER's flags, batch as argument
    def bench_step():
        cfg = build_cfg(0.0)
        st = abstract_state(cfg)
        step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
        views = jax.ShapeDtypeStruct((cfg.model.c_dim, b, h, h, 3), jnp.float32)
        rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
        ep = jax.ShapeDtypeStruct((), jnp.int32)
        return step.lower(st, views, rng, ep).compile()

    # ---- scan of plain steps, batches as scan inputs (isolates scan cost)
    def scan_step():
        cfg = build_cfg(0.0)
        st = abstract_state(cfg)
        step_fn = make_train_step(cfg)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk(state, batches, rngs, ep):
            def body(carry, xs):
                bt, rg = xs
                return step_fn(carry, bt, rg, ep)[0], ()
            return lax.scan(body, state, (batches, rngs))[0]

        batches = jax.ShapeDtypeStruct((a.seg, 5, b, h, h, 3), jnp.float32)
        rngs = jax.ShapeDtypeStruct((a.seg, 2), jnp.uint32)
        ep = jax.ShapeDtypeStruct((), jnp.int32)
        return chunk.lower(st, batches, rngs, ep).compile()

    # ---- trainer chunk: in-graph curriculum (+ optional EMA), steps as ints
    def trainer_chunk(curriculum: str, g_ema: float):
        cfg = build_cfg(g_ema)
        st = abstract_state(cfg)
        step_fn = make_train_step(cfg)
        k_data = jax.random.PRNGKey(1)
        k_step = jax.random.PRNGKey(2)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk(state, steps, ep):
            def body(carry, s):
                kd = jax.random.fold_in(k_data, s)
                ks = jax.random.fold_in(k_step, s)
                if curriculum == "dr":
                    views = synth_views_batch_dr(kd, b, h, h, ed_mode="diffuse",
                                                 camera_swap_prob=0.25)
                else:
                    views = synth_views_batch(kd, b, h, h, ed_mode="diffuse",
                                              camera_swap_prob=0.25)
                return step_fn(carry, views, ks, ep)[0], ()
            return lax.scan(body, state, steps)[0]

        steps = jax.ShapeDtypeStruct((a.seg,), jnp.int32)
        ep = jax.ShapeDtypeStruct((), jnp.int32)
        return chunk.lower(st, steps, ep).compile()

    run("bench_step_parity", bench_step_parity)
    run("bench_step", bench_step)
    run("scan_step", scan_step)
    run("trainer_base", lambda: trainer_chunk("base", 0.0))
    run("trainer_dr", lambda: trainer_chunk("dr", 0.0))
    run("trainer_dr_ema", lambda: trainer_chunk("dr", 0.999))
    # the fix candidate is scan_step + EMA: curriculum OUT of the train
    # program (generated by a separate device program per segment)
    def scan_step_ema():
        cfg = build_cfg(0.999)
        st = abstract_state(cfg)
        step_fn = make_train_step(cfg)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk(state, batches, rngs, ep):
            def body(carry, xs):
                bt, rg = xs
                return step_fn(carry, bt, rg, ep)[0], ()
            return lax.scan(body, state, (batches, rngs))[0]

        batches = jax.ShapeDtypeStruct((a.seg, 5, b, h, h, 3), jnp.float32)
        rngs = jax.ShapeDtypeStruct((a.seg, 2), jnp.uint32)
        ep = jax.ShapeDtypeStruct((), jnp.int32)
        return chunk.lower(st, batches, rngs, ep).compile()
    run("scan_step_ema_hostfed", scan_step_ema)

    log(f"wrote {a.out}")
    return results


if __name__ == "__main__":
    main()
