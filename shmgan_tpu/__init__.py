"""shmgan_tpu — a TPU-native (JAX / Flax / pjit / Pallas) framework for specular
highlight detection and removal.

Re-designed from scratch with the capabilities of the reference SHMGAN codebase
(Atif-Anwer/SHMGAN): a frozen SpecSeg U-Net predicts a specular-highlight mask that
drives mask-attention branches in a CollaGAN-style generator and a PatchGAN
discriminator, trained on polarimetric image sets (four polarization angles + a
pseudo-diffuse view) and serving single-RGB specular-free inference.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  config      — one dataclass config surface (reference: main.py argparse)
  data        — polarimetric ingest + synthetic fixtures (reference: datasetLoader.py)
  ops         — color/standardize/ssim/polar numerics (+ Pallas kernels)
  models      — SpecSeg / Generator / Discriminator in Flax (reference: SpecSeg.py,
                ShmGANwithSSpecSeg.build_generator/build_discriminator)
  train       — loss zoo + ONE fused jitted train step + loop
                (reference: ShmGANwithSSpecSeg.train_step/train)
  parallel    — jax.sharding Mesh / NamedSharding placement (reference: ABSENT)
  eval        — PSNR/SSIM/MSE/deltaE harness (reference: test.py metrics)
  checkpoint  — Orbax train-state checkpointing + SpecSeg h5 converter
  infer       — fused single-RGB mask→generator inference graph (reference: test.py)
  runtime     — host-side executors: prefetching device feed, metrics writer
"""

__version__ = "0.1.0"

from shmgan_tpu.config import Config  # noqa: F401
