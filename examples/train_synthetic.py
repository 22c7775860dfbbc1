"""End-to-end demo: train SHMGAN on generated polarimetric scenes — no datasets.

    python examples/train_synthetic.py [--steps 200] [--image_size 64] [--cpu]

Writes a fixture tree under ./demo_data, trains for a few hundred steps with
checkpointing and jsonl metrics, then runs single-RGB inference on held-out scenes
and prints the PSNR/SSIM/MSE/deltaE report. This exercises the entire framework
surface the way a real user would.
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--out", type=str, default="./demo_run")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from shmgan_tpu.config import Config
    from shmgan_tpu.data.synthetic import write_fixture_tree
    from shmgan_tpu.train.loop import train

    os.makedirs(args.out, exist_ok=True)
    data_dir = os.path.join(args.out, "demo_data")
    test_dir = os.path.join(args.out, "demo_test")
    if not os.path.isdir(data_dir):
        print("[demo] generating synthetic polarimetric scenes ...")
        write_fixture_tree(data_dir, n_images=32, image_size=args.image_size, seed=0)
        write_fixture_tree(test_dir, n_images=4, image_size=args.image_size, seed=99)

    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=args.image_size,
                                    filter_size=32, specseg_base_filters=8)
    cfg.train = dataclasses.replace(
        cfg.train, batch_size=args.batch_size, num_epochs=10 ** 6,
        g_lr=2e-4, d_lr=2e-4, checkpoint_save_step=10 ** 6,
        checkpoint_save_dir=os.path.join(args.out, "ckpt"),
        log_dir=os.path.join(args.out, "logs"),
        result_dir=os.path.join(args.out, "results"))
    cfg.data = dataclasses.replace(cfg.data, data_dir=data_dir, test_dir=test_dir)
    cfg.mesh = dataclasses.replace(cfg.mesh, data_parallel=1, model_parallel=1)

    print(f"[demo] training {args.steps} steps ...")
    train(cfg, max_steps=args.steps, verbose=True)

    print("[demo] inference + metrics on held-out scenes ...")
    cfg.data = dataclasses.replace(cfg.data,
                                   test_dir=os.path.join(test_dir, "I0"),
                                   diffuse_dir=os.path.join(test_dir, "ED"))
    cfg.eval = dataclasses.replace(cfg.eval, calc_metrics=True)
    from shmgan_tpu.cli import run_test
    run_test(cfg)
    print(f"[demo] results in {cfg.train.result_dir}")


if __name__ == "__main__":
    main()
